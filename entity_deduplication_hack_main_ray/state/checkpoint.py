"""Per-stage checkpointing with manifests (SURVEY.md §4 "Checkpoint/resume").

The reference reruns everything from scratch (its only cross-run state is
``runtimes.txt``, reference ``Run_TransE.py:70-72``); the north rule requires
the new engine to resume any stage mid-run. Design:

* Every stage writes its output as a DIRECTORY of Parquet part files plus a
  ``_manifest.json`` carrying: the ``PipelineConfig.config_hash()`` (semantic
  knobs only — manifests stay valid across parallelism levels), an input
  fingerprint, row count, wall time and rows/s.
* The write is atomic: parts land in ``<dir>.tmp`` and the directory is
  renamed into place only after the manifest is written — a killed run leaves
  either a complete stage or no stage, never a torn one.
* ``run_stage`` = read-manifest → skip-if-valid → else compute + write. A
  resumed run therefore skips every completed stage and recomputes only the
  frontier, which is what the kill/resume pytest asserts byte-equality on.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable

import ray.data


class StageManifest:
    def __init__(self, path: str):
        self.path = path

    def read(self) -> dict | None:
        try:
            with open(self.path) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def write(self, payload: dict) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=2, sort_keys=True)
        os.replace(tmp, self.path)


def stage_is_complete(
    ckpt_dir: str, stage: str, config_hash: str, input_fingerprint: str
) -> bool:
    m = StageManifest(os.path.join(ckpt_dir, stage, "_manifest.json")).read()
    return (
        m is not None
        and m.get("config_hash") == config_hash
        and m.get("input_fingerprint") == input_fingerprint
        and m.get("complete") is True
    )


def run_stage(
    ckpt_dir: str | None,
    stage: str,
    config_hash: str,
    input_fingerprint: str,
    compute: Callable[[], ray.data.Dataset],
    min_rows_per_file: int = 200_000,
) -> ray.data.Dataset:
    """Execute (or resume) one checkpointed stage.

    With ``ckpt_dir=None`` checkpointing is off and the lazy dataset is
    returned directly (streaming, no materialization). Otherwise the stage's
    dataset is written to ``<ckpt_dir>/<stage>/`` atomically and re-read —
    downstream stages then consume the files, so a crash later in the
    pipeline resumes from here for free.
    """
    if ckpt_dir is None:
        return compute()
    stage_dir = os.path.join(ckpt_dir, stage)
    if stage_is_complete(ckpt_dir, stage, config_hash, input_fingerprint):
        return ray.data.read_parquet(stage_dir)
    tmp_dir = stage_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    shutil.rmtree(stage_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    t0 = time.monotonic()
    ds = compute()
    ds.write_parquet(tmp_dir, min_rows_per_file=min_rows_per_file)
    elapsed = time.monotonic() - t0
    rows = sum(
        f.num_rows
        for f in _parquet_metadata(tmp_dir)
    )
    StageManifest(os.path.join(tmp_dir, "_manifest.json")).write(
        {
            "stage": stage,
            "config_hash": config_hash,
            "input_fingerprint": input_fingerprint,
            "rows": rows,
            "wall_sec": round(elapsed, 3),
            "rows_per_sec": round(rows / elapsed, 1) if elapsed > 0 else None,
            "complete": True,
        }
    )
    os.replace(tmp_dir, stage_dir)
    return ray.data.read_parquet(stage_dir)


def _parquet_metadata(d: str):
    import pyarrow.parquet as pq

    for name in sorted(os.listdir(d)):
        if name.endswith(".parquet"):
            yield pq.read_metadata(os.path.join(d, name))


def fingerprint_input(path: str) -> str:
    """Cheap input fingerprint: file names + sizes + mtimes folded. Good
    enough to invalidate checkpoints when the input actually changes."""
    import hashlib

    h = hashlib.sha256()
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            st = os.stat(os.path.join(path, name))
            h.update(f"{name}:{st.st_size}:{st.st_mtime_ns}".encode())
    elif os.path.exists(path):
        st = os.stat(path)
        h.update(f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]
