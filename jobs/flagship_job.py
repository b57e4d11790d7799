#!/usr/bin/env python
"""Flagship corpus job, packaged for ``ray job submit``.

Cluster usage (fixed-size N / 4N clusters per the north_rule)::

    ray job submit --address http://<head>:8265 \
        --working-dir /path/to/repo \
        -- python jobs/flagship_job.py \
           --input s3://bucket/corpus/ \
           --checkpoint-dir s3://bucket/checkpoints/run1 \
           --output s3://bucket/results/run1 \
           --group-keys lang repo --alpha 0.01

Local smoke run (auto-inits a local Ray)::

    python jobs/flagship_job.py --input /tmp/graft_scaling_corpus_16000000 \
        --checkpoint-dir /tmp/ck --output /tmp/out

The job is resumable: re-submitting with the same --checkpoint-dir skips
committed shards (see ddsketch_ruby_ray/state/checkpoint.py) and the final
merge is associativity-safe under any shard completion order.  Per-stage
throughput metrics land in the checkpoint manifest and in
``<output>/metrics.json``.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="parquet dir (repo,path,commit,lang,content)")
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--group-keys", nargs="+", default=["lang"])
    p.add_argument("--alpha", type=float, default=0.01)
    p.add_argument("--quantiles", nargs="+", type=float, default=[0.5, 0.9, 0.99])
    p.add_argument("--bin-limit", type=int, default=0, help=">0: collapsing-lowest stores")
    p.add_argument("--no-sha", action="store_true", help="skip the sha256 invariant column")
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"), ignore_reinit_error=True)

    from ddsketch_ruby_ray.functions.specs import DDSketchSpec, XorSigSpec
    from ddsketch_ruby_ray.stages import derive_content_metrics
    from ddsketch_ruby_ray.stages.derive import add_sha64
    from ddsketch_ruby_ray.state import CheckpointedRun

    store = "collapse_lowest" if args.bin_limit else "dense"
    kw = dict(
        relative_accuracy=args.alpha,
        quantiles=args.quantiles,
        store=store,
        bin_limit=args.bin_limit or 2048,
    )
    specs = [
        DDSketchSpec(on="content_bytes", name="bytes", **kw),
        DDSketchSpec(on="n_lines", name="lines", **kw),
    ]
    if not args.no_sha:
        specs.append(XorSigSpec(on="sha64", name="sig"))

    def derive(t):
        t = derive_content_metrics(t, content_col="content")
        if not args.no_sha:
            t = add_sha64(t, content_col="content")
        return t.drop_columns(["content"])

    files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    if not files:
        raise SystemExit(f"no parquet files under {args.input}")

    run = CheckpointedRun(
        args.checkpoint_dir,
        specs,
        tuple(args.group_keys),
        derive=derive,
        columns=list(args.group_keys) + ["content"],
    )
    entry = run.process(files)
    result = run.result()
    result.write_parquet(args.output)

    manifest = run.manifest()
    metrics = {
        "input_files": len(files),
        "runs": len(manifest["runs"]),
        "rows": sum(r["rows"] for r in manifest["runs"]),
        "this_run": {k: entry.get(k) for k in ("run_id", "rows", "wall_s", "rows_per_sec")}
        if entry
        else None,
    }
    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics))
    ray.shutdown()


if __name__ == "__main__":
    main()
