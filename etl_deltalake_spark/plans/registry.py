"""Query registry: maps query names → Spark plan + DuckDB oracle.

``__spark_entry__.py`` re-exports these for the driver. Every
public ``q_*`` function in plans.queries (and the extension modules)
is registered here explicitly so the set is stable and reviewable.
"""

from __future__ import annotations

import inspect
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_deltalake_spark.plans import queries as _q
from etl_deltalake_spark.plans import queries_ext as _qx
from etl_deltalake_spark.plans.oracles import ORACLES

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = (_q, _qx)


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in _MODULES:
        for name, fn in inspect.getmembers(mod, inspect.isfunction):
            if name.startswith("q_"):
                out[name] = fn
    return out


def all_oracles() -> dict[str, str]:
    qs = all_queries()
    return {k: v.strip() for k, v in ORACLES.items() if k in qs}
