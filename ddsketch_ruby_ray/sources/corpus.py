"""Deterministic synthetic source-code corpus (the input_hint table shape).

Schema per BASELINE.json.input_hint: (repo:string, path:string, commit:string,
lang:string, content:string).  Conceptually 10^12 rows; synthesized here at
small scale, fully determined by the row index (counter-based splitmix64, no
stateful RNG) so any shard/batch split yields identical rows - the property
that makes generation, checkpoint-resume and re-runs reproducible on any
cluster layout.

Characteristics per FIXTURES.md section 1: Zipf-skewed ``lang`` (top language
~40% of rows - exercises the hot-key path), lognormal line counts => long-tailed
content byte lengths, ~1% empty files (zero-band), Zipf-ish repo reuse.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = ["LANGS", "synthesize_corpus_batch", "corpus_dataset", "write_corpus"]

LANGS = [
    "python", "javascript", "java", "go", "c", "cpp", "ruby", "rust", "php",
    "csharp", "typescript", "swift", "kotlin", "scala", "shell", "perl",
    "lua", "haskell", "r", "julia",
]
_EXT = {
    "python": "py", "javascript": "js", "java": "java", "go": "go", "c": "c",
    "cpp": "cc", "ruby": "rb", "rust": "rs", "php": "php", "csharp": "cs",
    "typescript": "ts", "swift": "swift", "kotlin": "kt", "scala": "scala",
    "shell": "sh", "perl": "pl", "lua": "lua", "haskell": "hs", "r": "r",
    "julia": "jl",
}
_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)

# Zipf(s=1.5) over 20 languages -> top language ~40% of rows
_ZIPF_P = 1.0 / np.arange(1, len(LANGS) + 1) ** 1.5
_ZIPF_P /= _ZIPF_P.sum()
_ZIPF_CUM = np.cumsum(_ZIPF_P)

_WORDS = [
    "def", "return", "class", "import", "for", "while", "if", "else", "self",
    "value", "data", "result", "index", "count", "buffer", "stream", "batch",
    "shard", "merge", "sketch",
]


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Counter-based 64-bit mix (public splitmix64 constants)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _M64
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _M64
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _M64
    return x ^ (x >> np.uint64(31))


def _uniform(idx: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic U(0,1) per row index."""
    h = _splitmix64(idx.astype(np.uint64) ^ np.uint64(salt * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def synthesize_corpus_batch(batch: dict) -> pa.Table:
    """map_batches kernel: {'id': int64 ndarray} -> corpus rows (Arrow table)."""
    idx = np.asarray(batch["id"], dtype=np.int64)
    n = len(idx)

    lang_ix = np.searchsorted(_ZIPF_CUM, _uniform(idx, 1))
    langs = [LANGS[i] for i in lang_ix]

    # lognormal line count via Box-Muller on counter-based uniforms
    u1 = np.clip(_uniform(idx, 2), 1e-12, 1.0)
    u2 = _uniform(idx, 3)
    z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
    n_lines = np.maximum(1, np.exp(2.7 + 1.0 * z)).astype(np.int64)
    width = np.clip(np.round(40 + 12 * np.sqrt(-2.0 * np.log(np.clip(_uniform(idx, 4), 1e-12, 1))) * np.cos(2.0 * np.pi * _uniform(idx, 5))), 2, 120).astype(np.int64)
    empty = _uniform(idx, 6) < 0.01

    repos = [f"org{i % 101}/repo{i % 937}" for i in idx]
    paths = [f"src/dir{int(i) % 47}/file{int(i)}.{_EXT[l]}" for i, l in zip(idx, langs)]
    commits = [hashlib.sha1(str(int(i)).encode()).hexdigest() for i in idx]

    contents = []
    for j in range(n):
        if empty[j]:
            contents.append("")
            continue
        w = int(width[j])
        seed_word = _WORDS[int(idx[j]) % len(_WORDS)]
        line = (f"{seed_word} " * (w // (len(seed_word) + 1) + 1))[:w]
        contents.append("\n".join([line] * int(n_lines[j])))

    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.string()),
        }
    )


def corpus_dataset(n_rows: int, *, override_num_blocks: int | None = None):
    """Lazy Ray Dataset of ``n_rows`` deterministic corpus rows."""
    import ray.data as rd

    ds = rd.range(n_rows, override_num_blocks=override_num_blocks)
    # batch_size=None: one batch per block, so the requested block layout
    # survives (a fixed batch_size would coalesce small blocks into one file)
    return ds.map_batches(synthesize_corpus_batch, batch_format="numpy", batch_size=None)


def write_corpus(path: str, n_rows: int, num_blocks: int = 16) -> None:
    """Materialize a corpus to partitioned Parquet (bench/test input prep)."""
    corpus_dataset(n_rows, override_num_blocks=num_blocks).write_parquet(path)
