"""Per-stage throughput metrics from Ray Data's execution stats.

``ds.stats()`` is authoritative (it is how we found every bottleneck in this
repo); this module parses it into structured per-operator records so jobs can
EMIT them - into checkpoint lineage manifests, bench JSON, or logs - per the
north_rule ("lineage and throughput metrics emitted per stage").
"""

from __future__ import annotations

import json
import re
import time

__all__ = ["parse_stage_metrics", "run_with_metrics"]

_OP_RE = re.compile(r"Operator (\d+) ([^:\n]+): (?:.*?executed in ([0-9.]+)s|(\d+) tasks executed, (\d+) blocks produced in ([0-9.]+)s)")
_ROWS_RE = re.compile(r"Output num rows per block: .*?, (\d+) total")
_CPU_RE = re.compile(r"Remote cpu time: .*?, ([0-9.+e]+)(us|ms|s) total")


def _to_seconds(val: str, unit: str) -> float:
    return float(val) * {"us": 1e-6, "ms": 1e-3, "s": 1.0}[unit]


def parse_stage_metrics(stats: str) -> list[dict]:
    """Parse ``Dataset.stats()`` into one record per operator.

    Fields: op_index, name, wall_s, tasks, blocks, rows_out, rows_per_sec,
    cpu_s (when reported).  Wall times of streaming operators overlap - they
    are per-operator activity windows, not additive.
    """
    out = []
    chunks = re.split(r"(?=Operator \d+ )", stats)
    for ch in chunks:
        m = _OP_RE.match(ch)
        if not m:
            continue
        idx, name = int(m.group(1)), m.group(2).strip()
        if m.group(3) is not None:
            wall, tasks, blocks = float(m.group(3)), None, None
        else:
            tasks, blocks, wall = int(m.group(4)), int(m.group(5)), float(m.group(6))
        rows = None
        rm = _ROWS_RE.search(ch)
        if rm:
            rows = int(rm.group(1))
        cpu = None
        cm = _CPU_RE.search(ch)
        if cm:
            cpu = round(_to_seconds(cm.group(1), cm.group(2)), 4)
        out.append(
            {
                "op_index": idx,
                "name": name,
                "wall_s": wall,
                "tasks": tasks,
                "blocks": blocks,
                "rows_out": rows,
                "rows_per_sec": round(rows / wall, 1) if rows and wall else None,
                "cpu_s": cpu,
            }
        )
    return out


def run_with_metrics(ds, *, metrics_path: str | None = None):
    """Materialize ``ds``; return (materialized_ds, job_metrics dict).

    The metrics dict carries total wall time plus per-stage records; when
    ``metrics_path`` is given it is also written as JSON (the emit contract).
    """
    t0 = time.perf_counter()
    out = ds.materialize()
    wall = time.perf_counter() - t0
    metrics = {
        "wall_s": round(wall, 3),
        "rows": out.count(),
        "stages": parse_stage_metrics(out.stats()),
    }
    if metrics_path:
        with open(metrics_path, "w") as f:
            json.dump(metrics, f, indent=2)
    return out, metrics
