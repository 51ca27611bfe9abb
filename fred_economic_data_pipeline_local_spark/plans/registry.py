"""Named-query registry: the driver-facing queries()/oracle_sql() catalog.

Every implemented operator (SURVEY.md §2 + the LLM-data extensions) gets a
named entry: a PySpark callable ``(spark, sf_dir) -> DataFrame`` and, when
ANSI-SQL-expressible, an equivalent DuckDB oracle SQL string. Conventions
that keep the driver's order-insensitive value-hash stable across engines:

- every computed column is aliased identically in Spark and SQL;
- double-typed aggregates are rounded in BOTH engines (sum->2dp, avg/ratio
  ->6dp) so partial-aggregation order can't leak into the hash;
- timestamps/dates are formatted to strings at the query edge;
- int-width parity: DuckDB year()/month()/len() are cast to match Spark's
  int32/int64 output types;
- top-k queries carry a unique-key tiebreak in the ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None -> driver runs the weaker rows-only check
    description: str = ""


def query(name: str, oracle: str | None = None, description: str = ""):
    """Decorator registering a named query (and optional DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, description)
        return fn

    return deco


def get_query(name: str) -> QuerySpec:
    return _REGISTRY[name]


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {n: s.fn for n, s in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {n: s.oracle for n, s in _REGISTRY.items() if s.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every query-defining module exactly once."""
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        fred_queries,
        llm_queries,
        multimodal_queries,
        relational_queries,
        temporal_queries,
        similarity_queries,
        timeseries_queries,
    )

    _LOADED = True
