"""Real codec paths, exercised when the libraries exist (else skipped).

The multimodal kernels are honest about this container having no
image/audio codecs — decode_blob/resize_image raise NotImplementedError
when PIL/soundfile are absent. These tests pin BOTH branches:

- with the library installed, a real PNG decodes to the right ndarray
  shape, resize round-trips, and a real WAV decodes to samples;
- without it, the error is the documented NotImplementedError (not an
  AttributeError from a half-wired probe).
"""

from __future__ import annotations

import pytest

from weather_etl_pipeline_spark.operators import multimodal as mm


def _tiny_png() -> bytes:
    import io

    from PIL import Image

    img = Image.new("RGB", (4, 3), (10, 20, 30))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


@pytest.mark.skipif(mm._pil_image is None, reason="PIL not installed")
def test_decode_blob_real_png():
    arr = mm.decode_blob(_tiny_png())
    assert arr.shape == (3, 4, 3)
    assert int(arr[0, 0, 2]) == 30


@pytest.mark.skipif(mm._pil_image is None, reason="PIL not installed")
def test_resize_image_real_png():
    out = mm.resize_image(_tiny_png(), 8, 6)
    assert mm.sniff_format(out) == "png"
    assert mm.decode_blob(out).shape == (6, 8, 3)


@pytest.mark.skipif(mm._soundfile is None, reason="soundfile not installed")
def test_decode_blob_real_wav():
    import io

    import numpy as np

    buf = io.BytesIO()
    samples = np.zeros(160, dtype="float32")
    mm._soundfile.write(buf, samples, 16000, format="WAV")
    data = mm.decode_blob(buf.getvalue())
    assert len(data) == 160


@pytest.mark.skipif(
    mm._pil_image is not None, reason="PIL installed — stub branch inactive"
)
def test_decode_blob_stub_branch_raises_cleanly():
    with pytest.raises(NotImplementedError, match="PIL not available"):
        mm.decode_blob(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)
    with pytest.raises(NotImplementedError, match="image codecs"):
        mm.resize_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16, 2, 2)


@pytest.mark.skipif(
    mm._soundfile is not None, reason="soundfile installed — stub inactive"
)
def test_decode_blob_wav_stub_branch_raises_cleanly():
    with pytest.raises(NotImplementedError, match="soundfile not available"):
        mm.decode_blob(b"RIFF" + b"\x00" * 16)


def test_decode_blob_unknown_format_always_raises():
    with pytest.raises(NotImplementedError, match="no codec"):
        mm.decode_blob(b"\x00\x01\x02\x03garbage")
