"""Central query registry.

Every implemented operator (SURVEY.md §2 plus the training-data
extensions) registers a named query here: a PySpark callable
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, the exact
ANSI-SQL oracle DuckDB runs over the same parquet tables. The driver's
correctness gate compares the two (row-count + schema + value-hash),
so column names and value semantics must match bit-for-bit — numeric
parity notes live next to each query.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None → non-SQL-expressible, rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator registering a query implementation."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or fn.__doc__ or "", tags=tags)
        return fn

    return wrap


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules on first use so the registry is filled.
    from data_pipeline_with_hdfs_sql_integration_spark.plans import load_all_plans

    load_all_plans()
    return dict(_REGISTRY)


def get(name: str) -> QuerySpec:
    return all_queries()[name]
