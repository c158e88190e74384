"""File-stream staging: the parquet file-stream source needs a
DIRECTORY (in production, the landing dir new files drop into). For the
demo/test harness we stage a copy of the source file.

When the caller provides a checkpoint dir, the stage is a SIBLING of
that exact dir (``<checkpoint>_stage``) — unique per streaming query,
so two jobs with checkpoints under the same parent can never serve each
other stale data, and the caller's cleanup (pytest tmp_path, a job's
workspace teardown) removes stage and checkpoint together. A restart
against the same checkpoint reuses its stage (same source by
contract). Checkpoint-less throwaway calls fall back to a mkdtemp the
OS tmp reaper owns.
"""

from __future__ import annotations

import os
import shutil
import tempfile


def stage_events_dir(
    src_file: str, checkpoint_dir: str | None, prefix: str
) -> str:
    if checkpoint_dir:
        stage = os.path.abspath(checkpoint_dir.rstrip("/")) + "_stage"
        os.makedirs(stage, exist_ok=True)
    else:
        stage = tempfile.mkdtemp(prefix=prefix)
    dst = os.path.join(stage, os.path.basename(src_file))
    if not os.path.exists(dst):
        shutil.copy(src_file, dst)
    return stage
