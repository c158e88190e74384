"""Multimodal column plumbing (LLM-pipeline surface).

Real pipelines carry image/audio/video as opaque ``binary`` columns with
typed metadata structs and run decode / feature-extraction as
Arrow-batched pandas functions over ``mapInPandas``. The decode codecs
(PIL/ffmpeg/torchaudio) are NOT in this container, so the codec call is
stubbed behind ``decode_blob`` — but everything Spark-side is real and
tested: the binary column, the metadata struct, the mapInPandas batch
iteration, the output schema, and the partition-preserving plan shape.

The driver test corpus has no binary table, so blobs are synthesized
deterministically from ``documents.text`` (utf-8 encode). The
``multimodal_featurize`` query is fully oracle-verified: its features
(byte length, 16-byte header checksum, format sniff) are computable in
SQL on the DuckDB side, which differentially tests the entire
Arrow → pandas → Arrow round trip.

Scale notes: mapInPandas streams Arrow batches — memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of blob
sizes; no shuffle is introduced (narrow op); at 100 TB the binary
payload stays columnar end-to-end and never hits the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..registry import register

HEADER_BYTES = 16

# Import-time codec probes (the formats.py delta pattern): when the
# real libraries exist the decode paths below use them; when absent the
# calls stay honest NotImplementedError stubs and every byte-level
# plumbing path around them keeps working. tests/test_codecs.py
# exercises the real decode when a lib is present and skips otherwise.
try:  # pragma: no cover - environment-dependent
    from PIL import Image as _pil_image
except ImportError:
    _pil_image = None
try:  # pragma: no cover - environment-dependent
    import soundfile as _soundfile
except ImportError:
    _soundfile = None


def decode_blob(blob: bytes) -> object:
    """Decode a binary blob to an ndarray, dispatching on the sniffed
    format: png/jpeg via PIL, RIFF/WAV via soundfile. Raises
    NotImplementedError when the needed codec library is absent (this
    container ships neither) — callers treat that as "plumb the bytes,
    skip the decode"."""
    fmt = sniff_format(blob)
    if fmt in ("png", "jpeg"):
        if _pil_image is None:
            raise NotImplementedError("PIL not available in this environment")
        import io

        import numpy as np

        return np.asarray(_pil_image.open(io.BytesIO(blob)))
    if fmt == "riff":
        if _soundfile is None:
            raise NotImplementedError(
                "soundfile not available in this environment"
            )
        import io

        data, _rate = _soundfile.read(io.BytesIO(blob))
        return data
    raise NotImplementedError(f"no codec for sniffed format {fmt!r}")


def sniff_format(blob: bytes) -> str:
    """Magic-number sniff over the first bytes (deterministic, real)."""
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if blob[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if blob[:4] == b"RIFF":
        return "riff"
    return "bin"


def featurize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: blob → (n_bytes, header_sum, format_guess).

    header_sum is a toy stand-in for the decode+embed step (deterministic
    so the oracle can verify the plumbing); swap in decode_blob() +
    model inference in production.
    """
    for pdf in batches:
        blobs = pdf["blob"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": blobs.map(len),
                "header_sum": blobs.map(lambda b: int(sum(b[:HEADER_BYTES]))),
                "format_guess": blobs.map(sniff_format),
            }
        )


def resize_image(blob: bytes, width: int, height: int) -> bytes:
    """PIL decode → resize → re-encode (same format); raises
    NotImplementedError when PIL is absent (this container)."""
    if _pil_image is None:
        raise NotImplementedError(
            "image codecs not available in this environment"
        )
    import io

    img = _pil_image.open(io.BytesIO(blob))
    fmt = img.format or "PNG"
    out = io.BytesIO()
    img.resize((width, height)).save(out, format=fmt)
    return out.getvalue()


FRAME_BYTES = 64  # deterministic fake frame size for the sampling demo


def sample_frames_batches(every_k: int):
    """mapInPandas kernel factory: blob → every k-th fixed-size frame.

    The chunking stands in for a video demuxer (real pipelines call
    pyav here); the SAMPLING math, row fan-out, and per-frame checksum
    are the real distributed plumbing a frame-sampling stage needs —
    one input row explodes to ceil(n_frames/k) output rows, entirely
    inside the Arrow batch.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "frame_idx": [],
                "frame": [],
                "n_frame_bytes": [],
                "frame_sum": [],
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                # slice only the sampled frames — materializing every
                # frame first would allocate every_k× more for nothing
                step = FRAME_BYTES * every_k
                for off in range(0, len(blob), step):
                    frame = bytes(blob[off : off + FRAME_BYTES])
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(off // FRAME_BYTES)
                    out["frame"].append(frame)
                    out["n_frame_bytes"].append(len(frame))
                    out["frame_sum"].append(int(sum(frame)))
            yield pd.DataFrame(out)

    return kernel


_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("n_frame_bytes", T.LongType()),
        T.StructField("frame_sum", T.LongType()),
    ]
)

_FRAME_STEP = 4  # sample every 4th frame

# DuckDB twin of the SAMPLING math (same posture as the audio oracle):
# the text is ASCII so code point == byte value; frames start at every
# FRAME_BYTES*step offset and the last frame may be short. The binary
# frame payload itself stays Spark-side (codec stubbed) — the oracle
# checks offset, size, and checksum of every sampled frame, which pins
# the byte math end-to-end through the Arrow round trip.
_FRAMES_ORACLE = f"""
WITH b AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
),
starts AS (
  SELECT doc_id, text, n,
         UNNEST(generate_series(0, n - 1, {FRAME_BYTES * _FRAME_STEP})) AS off
  FROM b
)
SELECT doc_id,
       CAST(off / {FRAME_BYTES} AS BIGINT) AS frame_idx,
       CAST(LEAST(off + {FRAME_BYTES}, n) - off AS BIGINT) AS n_frame_bytes,
       CAST(list_sum(list_transform(
              range(off + 1, LEAST(off + {FRAME_BYTES}, n) + 1),
              i -> ascii(substr(text, CAST(i AS INTEGER), 1)))) AS BIGINT)
         AS frame_sum
FROM starts
"""


def multimodal_frame_sample_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full frame rows INCLUDING the binary frame payload (the
    production output; pytest verifies the bytes byte-for-byte)."""
    docs = load_table(spark, sf_dir, "documents")
    with_blob = docs.select("doc_id", F.encode("text", "utf-8").alias("blob"))
    return with_blob.mapInPandas(
        sample_frames_batches(_FRAME_STEP), schema=_FRAMES_SCHEMA
    )


@register("multimodal_frame_sample", oracle=_FRAMES_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 4th 64-byte frame of each synthesized blob — scalar frame
    metadata (offset math + checksum), fully oracle-verified; the raw
    binary frames live in multimodal_frame_sample_raw."""
    return multimodal_frame_sample_raw(spark, sf_dir).select(
        "doc_id", "frame_idx", "n_frame_bytes", "frame_sum"
    )


_FEATURIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("header_sum", T.LongType()),
        T.StructField("format_guess", T.StringType()),
    ]
)

# DuckDB twin: byte length + sum of the first 16 code points (the text is
# ASCII so code point == byte value) + the sniff (always 'bin' for text).
_FEATURIZE_ORACLE = f"""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(list_sum(list_transform(range(1, {HEADER_BYTES + 1}),
                                    i -> ascii(substr(text, CAST(i AS INTEGER), 1)))) AS BIGINT)
         AS header_sum,
       'bin' AS format_guess
FROM documents
"""


def ingest_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Real binary ingestion: Spark's built-in ``binaryFile`` source
    reads a directory of opaque files as (path, modificationTime,
    length, content) — the actual input shape for image/audio corpora.
    Output is normalized to the engine's multimodal layout (doc id from
    the file name, blob, metadata struct) so ``featurize_batches`` runs
    on it unchanged."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return raw.select(
        F.regexp_extract(F.col("path"), r"([^/]+)$", 1).alias("file_name"),
        F.col("content").alias("blob"),
        F.struct(
            F.col("length").alias("n_bytes"),
            F.col("modificationTime").alias("modified_at"),
            F.lit("binary/file").alias("content_type"),
        ).alias("meta"),
    )


@register("multimodal_featurize", oracle=_FEATURIZE_ORACLE, headline=True)
def multimodal_featurize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # string-twin projection (round 15): named_struct parses to the
    # identical struct(n_chars, content_type) the aliased F.struct built
    with_blob = docs.selectExpr(
        "doc_id",
        "encode(text, 'utf-8') AS blob",
        "named_struct('n_chars', length(text),"
        " 'content_type', 'synthetic/utf8') AS meta",
    )
    return with_blob.mapInPandas(featurize_batches, schema=_FEATURIZE_SCHEMA)


# --- audio chunking (fixed-duration windows with overlap) --------------------
# The audio twin of frame sampling: treat the blob as mono 8-bit PCM at
# 8 kHz (1 byte = 1 sample; real pipelines put a soundfile/ffmpeg
# decode here — stubbed like the other codecs, sandbox has no audio
# libs) and carve overlapping fixed-duration windows — the ASR/audio-
# tokenizer front-end shape. The kernel is a mapInPandas fan-out like
# frame_sample, but the output is all-scalar (chunk metadata + exact
# amplitude sum), so unlike frame_sample this Pandas-UDF path is fully
# ORACLE-VERIFIED: DuckDB replays the byte math over the same blobs.

AUDIO_RATE = 8000  # samples (bytes) per second
AUDIO_CHUNK = 256  # 32 ms window
AUDIO_STRIDE = 192  # 24 ms hop -> 8 ms overlap


def audio_chunk_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {
            "doc_id": [],
            "chunk_idx": [],
            "start_ms": [],
            "n_samples": [],
            "amp_sum": [],
        }
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            n = len(blob)
            for start in range(0, max(n - 1, 0) + 1, AUDIO_STRIDE):
                window = blob[start : start + AUDIO_CHUNK]
                out["doc_id"].append(doc_id)
                out["chunk_idx"].append(start // AUDIO_STRIDE)
                out["start_ms"].append(start * 1000 // AUDIO_RATE)
                out["n_samples"].append(len(window))
                out["amp_sum"].append(int(sum(window)))
        yield pd.DataFrame(out)


_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("chunk_idx", T.LongType()),
        T.StructField("start_ms", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("amp_sum", T.LongType()),
    ]
)

_AUDIO_ORACLE = f"""
WITH b AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
),
starts AS (
  SELECT doc_id, text, n,
         UNNEST(generate_series(0, GREATEST(n - 1, 0), {AUDIO_STRIDE})) AS start
  FROM b
)
SELECT doc_id,
       CAST(start / {AUDIO_STRIDE} AS BIGINT) AS chunk_idx,
       CAST((start * 1000) / {AUDIO_RATE} AS BIGINT) AS start_ms,
       CAST(LEAST(start + {AUDIO_CHUNK}, n) - start AS BIGINT) AS n_samples,
       CAST(list_sum(list_transform(
              range(start + 1, LEAST(start + {AUDIO_CHUNK}, n) + 1),
              i -> ascii(substr(text, CAST(i AS INTEGER), 1)))) AS BIGINT)
         AS amp_sum
FROM starts
"""


@register("multimodal_audio_chunks", oracle=_AUDIO_ORACLE)
def multimodal_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    with_blob = docs.select("doc_id", F.encode("text", "utf-8").alias("blob"))
    return with_blob.mapInPandas(audio_chunk_batches, schema=_AUDIO_SCHEMA)
