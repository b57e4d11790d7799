"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init(...)`` itself before importing this module:
nothing here (or in the library) initialises or shuts down Ray.

- ``entry()``: flagship pipeline on /root/testdata/sf0.001.
- ``queries()``: one callable per implemented operator/pipeline (SURVEY.md §2).
- ``oracle_sql()``: matching DuckDB SQL per query (column names identical).
  Sketch quantiles are mirrored in SQL deterministically (see
  ddsketch_ruby_ray/functions/oracle.py), so approximate operators still get
  full value-hash verification.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

# The driver may import this module by file path with an arbitrary cwd;
# make the sibling package importable regardless (idempotent, no other
# side effects at import time — the library imports stay lazy below).
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from ddsketch_ruby_ray.queries import flagship_docs_metrics

    return flagship_docs_metrics("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from ddsketch_ruby_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from ddsketch_ruby_ray.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
