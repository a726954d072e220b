"""Per-stage checkpointing with manifests (SURVEY.md §4 "Checkpoint/resume").

The reference reruns everything from scratch (its only cross-run state is
``runtimes.txt``, reference ``Run_TransE.py:70-72``); the north rule requires
the new engine to resume any stage mid-run. Design:

* Every stage writes its output as a DIRECTORY of Parquet part files plus a
  ``_manifest.json`` carrying: the ``PipelineConfig.config_hash()`` (semantic
  knobs only — manifests stay valid across parallelism levels), an input
  fingerprint, row count, wall time and rows/s.
* Commit protocol is MANIFEST-LAST: part files land in the stage directory
  first and the manifest (with ``complete: true``) is written as the final
  single-object write. Object stores have no atomic directory rename, but a
  single small PUT is atomic — and on a local FS a torn manifest fails JSON
  parsing, which reads as "incomplete". Either way a killed run leaves a
  stage that is detected as incomplete and wiped before recompute, so resume
  semantics are identical on local disk, NFS, s3:// and gcs://.
* All metadata I/O goes through ``pyarrow.fs`` (``FileSystem.from_uri`` for
  URIs, ``LocalFileSystem`` for plain paths) so ``--ckpt s3://...`` works end
  to end; the Parquet data reads/writes already accept URIs natively via
  Ray Data.
* ``run_stage`` = read-manifest → skip-if-valid → else compute + write. A
  resumed run therefore skips every completed stage and recomputes only the
  frontier, which is what the kill/resume pytest asserts byte-equality on.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

import ray.data


def resolve_fs(path: str):
    """(FileSystem, fs-internal path) for a plain path or a URI.

    Plain paths map to ``LocalFileSystem`` (absolutized — pyarrow's local FS
    rejects relative paths); ``s3://`` / ``gcs://`` / ``file://`` URIs go
    through ``FileSystem.from_uri``. Callers keep using the ORIGINAL string
    with Ray Data (which accepts URIs natively) and use the returned pair
    only for metadata I/O.
    """
    from pyarrow import fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), os.path.abspath(path)


def join_path(base: str, *parts: str) -> str:
    """URI-safe path join (``os.path.join`` would mangle nothing on POSIX,
    but be explicit: checkpoint paths may be s3://... URIs)."""
    return "/".join([base.rstrip("/"), *parts])


def read_json(path: str) -> dict | None:
    """Parse a small JSON object through pyarrow.fs; None when the file is
    missing or torn (a torn manifest must read as 'stage incomplete')."""
    fs, p = resolve_fs(path)
    try:
        with fs.open_input_stream(p) as f:
            return json.loads(f.read().decode("utf-8"))
    except (FileNotFoundError, OSError, json.JSONDecodeError):
        return None


def write_json(path: str, payload: dict) -> None:
    """Single-object JSON write through pyarrow.fs — atomic on object
    stores (one PUT); a torn local write fails parsing on read, which the
    manifest-last protocol treats as incomplete."""
    fs, p = resolve_fs(path)
    data = json.dumps(payload, indent=2, sort_keys=True).encode("utf-8")
    with fs.open_output_stream(p) as f:
        f.write(data)


class StageManifest:
    def __init__(self, path: str):
        self.path = path

    def read(self) -> dict | None:
        return read_json(self.path)

    def write(self, payload: dict) -> None:
        write_json(self.path, payload)


def stage_is_complete(
    ckpt_dir: str, stage: str, config_hash: str, input_fingerprint: str
) -> bool:
    m = StageManifest(join_path(ckpt_dir, stage, "_manifest.json")).read()
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
    dataset is written to ``<ckpt_dir>/<stage>/`` (manifest-last commit) and
    re-read — downstream stages then consume the files, so a crash later in
    the pipeline resumes from here for free.
    """
    if ckpt_dir is None:
        return compute()
    stage_dir = join_path(ckpt_dir, stage)
    if stage_is_complete(ckpt_dir, stage, config_hash, input_fingerprint):
        return ray.data.read_parquet(stage_dir)
    fs, sd = resolve_fs(stage_dir)
    # wipe any torn previous attempt (no manifest == uncommitted, safe to
    # delete; part filenames differ across runs so stale parts MUST go)
    try:
        fs.delete_dir(sd)
    except (FileNotFoundError, OSError):
        pass
    fs.create_dir(sd, recursive=True)
    t0 = time.monotonic()
    ds = compute()
    ds.write_parquet(stage_dir, min_rows_per_file=min_rows_per_file)
    elapsed = time.monotonic() - t0
    rows = sum(f.num_rows for f in _parquet_metadata(stage_dir))
    StageManifest(join_path(stage_dir, "_manifest.json")).write(
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
    return ray.data.read_parquet(stage_dir)


def list_stage_manifests(ckpt_dir: str) -> dict[str, dict]:
    """stage name → manifest dict for every committed stage under a
    checkpoint dir (local or URI) — the per-partition lineage surface the
    job entrypoint folds into ``metrics.json``."""
    from pyarrow import fs as pafs

    fs, cd = resolve_fs(ckpt_dir)
    try:
        infos = fs.get_file_info(pafs.FileSelector(cd, recursive=False))
    except (FileNotFoundError, OSError):
        return {}
    out: dict[str, dict] = {}
    for info in sorted(infos, key=lambda i: i.path):
        if info.type != pafs.FileType.Directory:
            continue
        stage = info.base_name
        m = read_json(join_path(ckpt_dir, stage, "_manifest.json"))
        if m is not None:
            out[stage] = m
    return out


def _parquet_metadata(d: str):
    import pyarrow.parquet as pq
    from pyarrow import fs as pafs

    fs, p = resolve_fs(d)
    infos = fs.get_file_info(pafs.FileSelector(p, recursive=False))
    for info in sorted(infos, key=lambda i: i.path):
        if info.base_name.endswith(".parquet"):
            yield pq.read_metadata(info.path, filesystem=fs)


def fingerprint_input(path: str) -> str:
    """Cheap input fingerprint: file names + sizes + mtimes folded. Good
    enough to invalidate checkpoints when the input actually changes."""
    import hashlib

    from pyarrow import fs as pafs

    fs, p = resolve_fs(path)
    h = hashlib.sha256()
    info = fs.get_file_info(p)
    if info.type == pafs.FileType.Directory:
        for i in sorted(
            fs.get_file_info(pafs.FileSelector(p, recursive=False)),
            key=lambda i: i.path,
        ):
            h.update(f"{i.base_name}:{i.size}:{i.mtime_ns}".encode())
    elif info.type == pafs.FileType.File:
        h.update(f"{info.base_name}:{info.size}:{info.mtime_ns}".encode())
    return h.hexdigest()[:16]
