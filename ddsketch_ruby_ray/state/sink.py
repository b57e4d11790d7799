"""Resumable partitioned Parquet sink for row-transform outputs.

`state/checkpoint.py` makes SKETCH jobs resumable (per-shard partial states);
this is the same contract for ROW outputs — dedup survivors, PII-scrubbed
text, packed sequences: any ``Dataset -> Dataset`` transform whose output is
a pure function of each input shard.  One output directory per input shard,
a manifest committed atomically after each shard's files are durable, and a
resume path that skips committed shards — a 100 TB job killed at shard 7000
of 10000 re-processes only the remaining 3000 (never one giant file, per the
north-rule's resumable-output requirement).

Commit protocol (same hazard as checkpoint.py): Ray 2.49's ``write_parquet``
APPENDS into an existing directory, so each shard's part dir is cleared
before writing; the manifest is replaced via tmp + ``os.replace`` (atomic),
so a crash between write and commit leaves an orphan part dir that the retry
clears — output is exactly-once per shard.

Transforms must be per-shard pure (stateless map/filter stages — exactly the
stages this library builds); anything needing cross-shard state belongs in
the checkpointed sketch job instead.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
from typing import Callable, Sequence

__all__ = ["PartitionedParquetSink"]


class PartitionedParquetSink:
    """Resumable one-dir-per-input-shard Parquet writer.

    Layout under ``out_dir``::

        manifest.json          - committed shards: rows in/out, wall, files
        part-<shard_id>/*.parquet
    """

    def __init__(self, out_dir: str):
        self.dir = out_dir
        os.makedirs(self.dir, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.dir, "manifest.json")

    def manifest(self) -> dict:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                return json.load(f)
        return {"parts": []}

    def done_shards(self) -> set[str]:
        return {p["shard"] for p in self.manifest()["parts"]}

    def _commit(self, entry: dict) -> None:
        m = self.manifest()
        m["parts"].append(entry)
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=2)
        os.replace(tmp, self._manifest_path)  # atomic commit

    @staticmethod
    def _shard_id(path: str) -> str:
        """Stable shard id: basename stem + short hash of the FULL path.

        The stem alone collides when two input directories ship files with
        the same basename (e.g. shard-0000.parquet in two dirs) — the second
        would be silently skipped as already committed (ADVICE r2).  The
        path hash disambiguates while keeping the id readable; resuming
        therefore requires re-running with the same input paths, which the
        manifest's ``input`` field records per entry.
        """
        import hashlib

        stem = os.path.splitext(os.path.basename(path))[0]
        return f"{stem}-{hashlib.sha256(path.encode()).hexdigest()[:8]}"

    # -- processing --------------------------------------------------------
    def process(
        self,
        input_files: Sequence[str],
        transform: Callable,
        *,
        read_columns: Sequence[str] | None = None,
        max_shards: int | None = None,
    ) -> list[dict]:
        """Run ``transform(Dataset) -> Dataset`` over every not-yet-committed
        shard; write + commit each one independently.

        ``max_shards`` bounds one invocation (tests simulate a killed run).
        Returns the manifest entries committed by THIS call.
        """
        from ..pipelines.corpus import read_corpus

        done = self.done_shards()
        pending = [f for f in input_files if self._shard_id(f) not in done]
        if max_shards is not None:
            pending = pending[:max_shards]
        committed = []
        for path in pending:
            shard = self._shard_id(path)
            part_dir = os.path.join(self.dir, f"part-{shard}")
            # a crashed earlier attempt may have left files; write_parquet
            # appends, so clear before writing (exactly-once per shard)
            shutil.rmtree(part_dir, ignore_errors=True)
            t0 = time.perf_counter()
            ds = read_corpus([path], read_columns, num_blocks=1)
            out = transform(ds).materialize()
            rows_out = out.count()
            out.write_parquet(part_dir)
            wall = time.perf_counter() - t0
            entry = {
                "shard": shard,
                "input": path,
                "rows_out": rows_out,
                "wall_s": round(wall, 3),
                "committed_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
            }
            self._commit(entry)
            committed.append(entry)
        return committed

    # -- results -----------------------------------------------------------
    def output_dataset(self):
        """All committed output parts as one Dataset (orphan dirs excluded)."""
        import ray.data as rd

        files = [
            f
            for p in self.manifest()["parts"]
            for f in sorted(glob.glob(os.path.join(self.dir, f"part-{p['shard']}", "*.parquet")))
        ]
        if not files:
            raise FileNotFoundError(f"no committed output parts under {self.dir}")
        return rd.read_parquet(files)
