"""pipelines/fold.py — bounded-partition keyed aggregation vs native groupby."""

import numpy as np
import pyarrow as pa
import pytest

from ddsketch_ruby_ray.core.hashing import hash64_str_fast


class TestHash64StrFast:
    def test_equal_strings_collide_unequal_differ(self):
        a = pa.array(["", "abc", "abd", "abc", None, "x" * 5000])
        h = hash64_str_fast(a)
        assert h[1] == h[3]
        assert h[1] != h[2]
        assert h[4] == h[0]  # null hashes like ""

    def test_slice_and_chunk_invariant(self):
        a = pa.array(["alpha", "beta", "gamma", "delta", "epsilon"])
        h = hash64_str_fast(a)
        sliced = hash64_str_fast(a.slice(2, 2))
        assert sliced[0] == h[2] and sliced[1] == h[3]
        ch = pa.chunked_array([a.slice(0, 2), a.slice(2, 3)])
        assert (hash64_str_fast(ch) == h).all()

    def test_distribution_not_degenerate(self):
        vals = pa.array([f"token_{i}" for i in range(10_000)])
        h = hash64_str_fast(vals)
        assert len(np.unique(h)) == 10_000  # no accidental collisions here
        parts = h % np.uint64(64)
        counts = np.bincount(parts.astype(np.int64), minlength=64)
        assert counts.min() > 0 and counts.max() < 3 * counts.mean()

    def test_empty(self):
        assert hash64_str_fast(pa.array([], pa.string())).size == 0


class TestPartitionedGroupAgg:
    @pytest.fixture()
    def tbl(self):
        rng = np.random.default_rng(5)
        n = 20_000
        return pa.table(
            {
                "sk": pa.array([f"k{int(x)}" for x in rng.integers(0, 3000, n)]),
                "ik": pa.array(rng.integers(-500, 500, n, dtype=np.int64)),
                "v": pa.array(rng.integers(0, 1000, n, dtype=np.int64)),
                "w": pa.array(rng.integers(-50, 50, n, dtype=np.int64)),
            }
        )

    def _native(self, tbl, keys, aggs):
        out = tbl.group_by(keys).aggregate(aggs)
        return out.rename_columns(
            list(keys) + [f"{f}({c})" for c, f in aggs]
        ).sort_by([(k, "ascending") for k in keys])

    def _fold(self, ray_session, tbl, keys, aggs, **kw):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.fold import partitioned_group_agg

        ds = rd.from_arrow(tbl).repartition(7)
        got = partitioned_group_agg(ds, keys, aggs, **kw).to_pandas()
        return pa.Table.from_pandas(got, preserve_index=False).sort_by(
            [(k, "ascending") for k in keys]
        )

    def test_string_key_sum(self, ray_session, tbl):
        want = self._native(tbl, ["sk"], [("v", "sum")])
        got = self._fold(ray_session, tbl, ["sk"], [("v", "sum")])
        assert got.equals(want)

    def test_int_key_multi_agg(self, ray_session, tbl):
        aggs = [("v", "sum"), ("w", "min"), ("w", "max"), ("v", "count")]
        want = self._native(tbl, ["ik"], aggs)
        got = self._fold(ray_session, tbl, ["ik"], aggs)
        assert got.equals(want)

    def test_mixed_multi_key(self, ray_session, tbl):
        want = self._native(tbl, ["sk", "ik"], [("v", "sum")])
        got = self._fold(ray_session, tbl, ["sk", "ik"], [("v", "sum")])
        assert got.equals(want)

    def test_bad_func_raises(self, ray_session, tbl):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.fold import partitioned_group_agg

        with pytest.raises(ValueError):
            partitioned_group_agg(
                rd.from_arrow(tbl), "sk", [("v", "mean")]
            )
