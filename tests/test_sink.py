"""Resumable partitioned Parquet sink (state/sink.py)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def shards(tmp_path):
    """Four input shards of a tiny corpus."""
    rng = np.random.default_rng(13)
    paths = []
    for i in range(4):
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(i * 100, (i + 1) * 100), pa.int64()),
                "n": pa.array(rng.integers(1, 50, 100), pa.int64()),
            }
        )
        p = tmp_path / f"shard-{i:02d}.parquet"
        pq.write_table(t, p)
        paths.append(str(p))
    return paths


def _transform(ds):
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda t: t.filter(pc.greater(t.column("n"), 25)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


class TestPartitionedSink:
    def test_resume_skips_committed_and_matches_oneshot(self, ray_session, shards, tmp_path):
        from ddsketch_ruby_ray.state.sink import PartitionedParquetSink

        out = str(tmp_path / "out")
        sink = PartitionedParquetSink(out)
        sid = sink._shard_id
        first = sink.process(shards, _transform, max_shards=2)  # "killed" run
        assert [e["shard"] for e in first] == [sid(shards[0]), sid(shards[1])]
        second = sink.process(shards, _transform)  # resume
        assert [e["shard"] for e in second] == [sid(shards[2]), sid(shards[3])]
        assert sink.process(shards, _transform) == []  # idempotent

        got = sink.output_dataset().to_pandas().sort_values("doc_id").reset_index(drop=True)
        import ray.data as rd

        want = (
            _transform(rd.read_parquet(shards))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert (got.values == want.values).all()

    def test_crash_between_write_and_commit_is_exactly_once(
        self, ray_session, shards, tmp_path
    ):
        from ddsketch_ruby_ray.state.sink import PartitionedParquetSink

        out = str(tmp_path / "out")
        sink = PartitionedParquetSink(out)
        sink.process(shards, _transform, max_shards=1)
        # simulate: shard-01's files were written but the manifest commit
        # never happened (crash) -> orphan part dir with stale content
        import ray.data as rd

        orphan = os.path.join(out, f"part-{sink._shard_id(shards[1])}")
        rd.read_parquet(shards[1]).write_parquet(orphan)  # stale full copy
        sink.process(shards, _transform)  # retry must clear + rewrite
        got = sink.output_dataset().to_pandas().sort_values("doc_id").reset_index(drop=True)
        want = (
            _transform(rd.read_parquet(shards))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert (got.values == want.values).all()  # no doubles, no stale rows

    def test_same_basename_in_two_dirs_both_process(self, ray_session, tmp_path):
        """Two inputs named shard-00.parquet in DIFFERENT dirs must get
        distinct shard ids (ADVICE r2: basename-only ids silently dropped
        the second file's rows as already-committed)."""
        from ddsketch_ruby_ray.state.sink import PartitionedParquetSink

        paths = []
        for d, lo in (("a", 0), ("b", 1000)):
            sub = tmp_path / d
            sub.mkdir()
            t = pa.table(
                {
                    "doc_id": pa.array(np.arange(lo, lo + 100), pa.int64()),
                    "n": pa.array(np.full(100, 40), pa.int64()),
                }
            )
            p = sub / "shard-00.parquet"
            pq.write_table(t, p)
            paths.append(str(p))

        sink = PartitionedParquetSink(str(tmp_path / "out"))
        entries = sink.process(paths, _transform)
        assert len(entries) == 2
        assert len({e["shard"] for e in entries}) == 2
        assert sink.output_dataset().count() == 200
