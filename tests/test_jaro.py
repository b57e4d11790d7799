"""Jaro-Winkler (pipelines/dedup.py::_jaro_winkler) vs DuckDB, byte-level."""

from __future__ import annotations

import numpy as np

from ddsketch_ruby_ray.pipelines.dedup import _jaro_winkler


def _duck(a: str, b: str) -> float:
    import duckdb

    return duckdb.execute(
        "SELECT jaro_winkler_similarity(?, ?)", [a, b]
    ).fetchone()[0]


class TestJaroWinkler:
    def test_fuzz_vs_duckdb(self):
        rng = np.random.default_rng(17)
        alpha = list("abcdxyz αβγ ")
        for _ in range(400):
            a = "".join(rng.choice(alpha, size=rng.integers(0, 25)))
            b = "".join(rng.choice(alpha, size=rng.integers(0, 25)))
            got = _jaro_winkler(a.encode("utf-8"), b.encode("utf-8"))
            assert abs(got - _duck(a, b)) < 1e-12, (a, b)

    def test_known_values(self):
        # the classic MARTHA/MARHTA pair: jaro 0.944..., jw 0.961...
        got = _jaro_winkler(b"MARTHA", b"MARHTA")
        assert abs(got - 0.9611111111111111) < 1e-12
        assert _jaro_winkler(b"", b"") == 0.0  # DuckDB convention
        assert _jaro_winkler(b"abc", b"") == 0.0
        assert _jaro_winkler(b"same", b"same") == 1.0

    def test_prefix_bonus_gated_by_boost(self):
        # low-similarity pair with common prefix: NO Winkler bonus below 0.7
        a, b = b"abcdefghij", b"abzzzzzzzz"
        raw = _jaro_winkler(a, b)
        assert raw <= 0.7 or raw == _jaro_winkler(a, b)
        # high-similarity pair: bonus applies (jw > jaro)
        hi = _jaro_winkler(b"prefixed text", b"prefixed test")
        assert hi > 0.9
