"""Flagship pipeline: per-group quantile sketches over a source-file corpus.

Shape (north_star): read -> map_batches(derive metric columns + accumulate
per-(batch, group) sketch states, zero-copy Arrow, actor pool) -> coalesce the
tiny state table -> groupby(keys).aggregate(state merge) -> finalize per group.

Two-level merge (SURVEY.md §4.2): raw rows NEVER cross a shuffle - each map
task emits at most ``num_groups`` KB-sized sketch states, the groupby then
merges O(num_batches x num_groups) states.  Hot-key skew (Zipf langs) costs
the hot key O(num_batches) states, not O(rows), and the wide step is
negligible at any scale.
"""

from __future__ import annotations

from typing import Sequence

from ..functions.specs import DDSketchSpec, SketchSpec, XorSigSpec
from ..functions.aggregates import SketchStateMergeAgg
from ..stages import derive_content_metrics, unnest
from ..stages.derive import add_sha64
from ..stages.accumulate import SketchStateAccumulator, coalesce_states

__all__ = [
    "sketch_states",
    "merge_sketch_states",
    "grouped_sketch_pipeline",
    "corpus_sketch_pipeline",
    "documents_sketch_pipeline",
]


def sketch_states(
    ds,
    specs: Sequence[SketchSpec],
    group_keys: Sequence[str] = (),
    *,
    derive=None,
    batch_size: int | None = None,
    concurrency=None,
):
    """Stage 1: rows -> per-(batch, group) sketch-state rows (no shuffle).

    ``concurrency=N`` runs the accumulator as an actor pool (setup once per
    actor); the default (None) uses stateless tasks, which Ray schedules
    more flexibly - both execute the identical vectorized kernel.

    NULL group keys: the accumulator groups them correctly (their own group,
    like SQL GROUP BY), and ``merge_sketch_states`` encodes them to
    (filled value, validity flag) pairs around the shuffle, since Ray's
    sort-shuffle cannot ORDER null keys.
    """
    acc = SketchStateAccumulator(specs, group_keys, derive=derive)
    kwargs = {}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    # batch_size=None -> whole blocks. Ray's default (1024 rows) would emit
    # one KB-sized state row per (1024-row batch x group x spec): a 1000x
    # state blow-up that turns the "tiny" state table into gigabytes.
    return ds.map_batches(
        acc, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size, **kwargs
    )


def _null_fill_value(ty):
    import pyarrow as pa

    if pa.types.is_string(ty) or pa.types.is_large_string(ty):
        return ""
    if pa.types.is_floating(ty):
        return 0.0
    if pa.types.is_integer(ty):
        return 0
    if pa.types.is_boolean(ty):
        return False
    return None  # unsupported type: leave nulls alone (Ray will raise as before)


def _encode_null_keys(states, group_keys):
    """Null group keys -> (filled value, validity flag) column pairs.

    Ray's sort-based shuffle cannot order null keys; SQL GROUP BY treats null
    as its own group.  Encoding each key as (fill_null(k, default),
    ``_isnull_k`` in {0,1}) and grouping by BOTH preserves exact SQL
    semantics (a null never collides with a real default value because the
    flag differs) through a null-free shuffle; ``_decode_null_keys``
    restores the nulls afterwards.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    keys = list(group_keys)

    def enc(t: pa.Table) -> pa.Table:
        for k in keys:
            col = t.column(k)
            fill = _null_fill_value(col.type)
            flag = pc.cast(pc.is_null(col), pa.int32())
            if fill is not None:
                idx = t.schema.get_field_index(k)
                t = t.set_column(idx, k, pc.fill_null(col, fill))
            t = t.append_column(f"_isnull_{k}", flag)
        return t

    return states.map_batches(enc, batch_format="pyarrow", zero_copy_batch=True)


def _decode_null_keys(out, group_keys):
    import pyarrow as pa
    import pyarrow.compute as pc

    keys = list(group_keys)

    def dec(t: pa.Table) -> pa.Table:
        for k in keys:
            mask = pc.cast(t.column(f"_isnull_{k}"), pa.bool_())
            col = t.column(k)
            idx = t.schema.get_field_index(k)
            t = t.set_column(idx, k, pc.if_else(mask, pa.scalar(None, type=col.type), col))
        return t.drop_columns([f"_isnull_{k}" for k in keys])

    return out.map_batches(dec, batch_format="pyarrow", zero_copy_batch=True)


def _auto_coalesce_blocks() -> int:
    """Coalesce target for the state table: ~one block per cluster CPU.

    The local-combiner stage (StateBlockMerger) runs one task per coalesced
    block; a FIXED target (the old default, 8) serializes that stage into an
    8-task tail whatever the cluster size — profiled at 1.6 s of the 16M-row
    flagship's 7.7 s wall on 32 cpus.  One block per CPU keeps the combiner
    a single fully-parallel wave at any cluster size while the downstream
    aggregate still sorts only O(cpus x groups) KB-sized rows.
    """
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:  # pragma: no cover - cluster introspection unavailable
        cpus = 0
    return max(8, cpus)


def merge_sketch_states(
    states,
    specs: Sequence[SketchSpec],
    group_keys: Sequence[str] = (),
    *,
    coalesce: int | str | None = "auto",
):
    """Stage 2: shuffle + merge the state table; finalize one row per group.

    Output: one struct column per spec (``spec.name``), flattened by callers
    via :func:`ddsketch_ruby_ray.stages.unnest`.

    NULL group keys are supported: keys are encoded to (filled value,
    validity flag) pairs around the shuffle - SQL GROUP BY semantics (null is
    its own group) at the cost of one int32 per key on the KB-sized state
    table.
    """
    if coalesce == "auto":
        coalesce = _auto_coalesce_blocks()
    if coalesce:
        states = coalesce_states(states, coalesce, specs=specs, group_keys=group_keys)
    aggs = [SketchStateMergeAgg(spec) for spec in specs]
    if group_keys:
        states = _encode_null_keys(states, group_keys)
        shuffle_keys = list(group_keys) + [f"_isnull_{k}" for k in group_keys]
        out = states.groupby(shuffle_keys).aggregate(*aggs)
        return _decode_null_keys(out, group_keys)
    return states.aggregate(*aggs)


def grouped_sketch_pipeline(
    ds,
    specs: Sequence[SketchSpec],
    group_keys: Sequence[str] = (),
    *,
    derive=None,
    batch_size: int | None = None,
    concurrency=None,
    coalesce: int | str | None = "auto",
    prefixes: dict | None = None,
    strategy: str = "states",
    salt: int = 0,
    num_partitions: int = 64,
):
    """rows -> per-group sketch results, flat columns.

    ``strategy`` picks the distribution plan:
      * ``"states"`` (default) - the two-level merge: per-(block, group)
        states inside the (fused) map stage, then a tiny state shuffle.
        Optimal when groups << rows-per-block (e.g. 20 languages): raw rows
        never shuffle and hot keys cost O(blocks) states.
      * ``"rows"`` - derive compact metric rows in the map stage, then
        ``groupby(keys).aggregate(SpecAgg)``: Ray's sort-shuffle moves the
        (pruned, ~tens of bytes) rows and ONE sketch per group is built.
        General (any spec), but Ray's aggregate machinery iterates groups in
        Python (~250 us/group).
      * ``"pairs"`` - the extreme-cardinality plan (DDSketch specs with the
        logarithmic mapping; dense AND collapsing stores, weighted or not):
        vectorized pair-table pre-aggregation + hash-partitioned vectorized
        finalize, no per-group Python in the hot path (pipelines/pairs.py;
        ~8x faster than "rows" at 10^6 groups).
    All strategies produce identical results (merge associativity).

    ``prefixes`` maps spec name -> output column prefix for the unnested
    result struct (default: no prefix).
    """
    if strategy == "pairs":
        from .pairs import ddsketch_pairs_pipeline

        return ddsketch_pairs_pipeline(
            ds, specs, group_keys, derive=derive, prefixes=prefixes,
            batch_size=batch_size, num_partitions=num_partitions,
        )
    if strategy == "rows":
        from ..functions.aggregates import SpecAgg

        if derive is not None:
            ds = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True,
                                batch_size=batch_size)
        if salt and group_keys:
            # Skewed hot keys: phase 1 aggregates per (keys, salt bucket) so a
            # 40%-of-rows key splits across `salt` reduce tasks; phase 2 merges
            # the <=salt KB-sized states per key (SURVEY.md §4.2).
            def add_salt(t):
                import numpy as np
                import pyarrow as pa

                # round-robin within each batch: splits any hot key across
                # `salt` phase-1 groups; merge associativity makes the final
                # result independent of the assignment
                s = (np.arange(t.num_rows) % salt).astype(np.int32)
                return t.append_column("_salt", pa.array(s))

            salted = ds.map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True)
            phase1 = salted.groupby(list(group_keys) + ["_salt"]).aggregate(
                *[SpecAgg(spec, emit_state=True) for spec in specs]
            )
            phase1 = phase1.drop_columns(["_salt"])
            out = merge_sketch_states(phase1, specs, group_keys, coalesce=None)
        else:
            aggs = [SpecAgg(spec) for spec in specs]
            out = (
                ds.groupby(list(group_keys)).aggregate(*aggs)
                if group_keys
                else ds.aggregate(*aggs)
            )
    elif strategy == "states":
        states = sketch_states(
            ds, specs, group_keys, derive=derive, batch_size=batch_size, concurrency=concurrency
        )
        out = merge_sketch_states(states, specs, group_keys, coalesce=coalesce)
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    for spec in specs:
        prefix = (prefixes or {}).get(spec.name)
        out = unnest(out, columns=[spec.name], prefix=prefix)
    return out


def corpus_sketch_pipeline(
    ds,
    *,
    group_keys=("lang",),
    alpha: float = 0.01,
    quantiles=(0.5, 0.9, 0.99),
    content_col: str = "content",
    batch_size: int | None = None,
    concurrency=None,
    verify_sha256: bool = False,
    strategy: str = "states",
    num_partitions: int = 64,
):
    """content corpus -> per-group sketch summary of byte length + line count.

    Returns a Dataset with columns: group keys + ``bytes_*`` / ``lines_*``
    (count/sum/min/max/avg + requested quantiles).  With ``verify_sha256`` the
    result also carries ``sig_count`` / ``sig_sig``: an order-independent
    XOR-fold of per-row sha256 hashes per group (the north-star per-row
    content invariant, provable against any reference copy of the corpus).

    NOTE on fusion: callers should prune columns AT THE READ
    (``read_parquet(..., columns=[...])``) and read with one block per file
    (``override_num_blocks=len(files)``) so Ray fuses
    ReadParquet->MapBatches(accumulator) into one task.  Fused, the wide
    ``content`` column never enters the object store - the read task itself
    emits only KB-sized sketch states.  (A ``select_columns`` here, or the
    SplitBlocks operator that appears when Ray re-splits read outputs, breaks
    that fusion and ships the full corpus through shared memory.)
    """
    specs = [
        DDSketchSpec(on="content_bytes", name="bytes", relative_accuracy=alpha, quantiles=quantiles),
        DDSketchSpec(on="n_lines", name="lines", relative_accuracy=alpha, quantiles=quantiles),
    ]
    prefixes = {"bytes": "bytes_", "lines": "lines_"}
    if verify_sha256:
        specs.append(XorSigSpec(on="sha64", name="sig"))
        prefixes["sig"] = "sig_"

    def derive(t):
        t = derive_content_metrics(t, content_col=content_col)
        if verify_sha256:
            t = add_sha64(t, content_col=content_col)
        return t.drop_columns([content_col])

    return grouped_sketch_pipeline(
        ds,
        specs,
        group_keys,
        derive=derive,
        batch_size=batch_size,
        concurrency=concurrency,
        prefixes=prefixes,
        strategy=strategy,
        num_partitions=num_partitions,
    )


def read_corpus(path, columns, num_blocks: int | None = None):
    """read_parquet tuned for fusion: one block per file unless told otherwise.

    With an explicit block count Ray skips the SplitBlocks re-split and fuses
    the read with the downstream accumulator (see corpus_sketch_pipeline).
    """
    import glob
    import os

    import ray.data as rd

    if num_blocks is None:
        if isinstance(path, (list, tuple)):
            num_blocks = len(path)
        elif os.path.isdir(path):
            num_blocks = len(glob.glob(os.path.join(path, "*.parquet"))) or None
        else:
            num_blocks = 1
    return rd.read_parquet(
        path, columns=list(columns) if columns else None, override_num_blocks=num_blocks
    )


def documents_sketch_pipeline(sf_dir: str, *, alpha: float = 0.01, quantiles=(0.5, 0.9, 0.99)):
    """Same pipeline over the driver testdata ``documents`` table (text docs)."""
    ds = read_corpus(f"{sf_dir}/documents.parquet", ["lang", "text"])
    return corpus_sketch_pipeline(ds, group_keys=("lang",), alpha=alpha, quantiles=quantiles, content_col="text")
