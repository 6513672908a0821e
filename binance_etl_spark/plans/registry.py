"""Central query registry — the driver-contract surface.

Every operator from SURVEY.md §2 lands here as a named query: a callable
`(spark, sf_dir) -> DataFrame` plus (when SQL-expressible) a DuckDB oracle
SQL string over the same parquet tables.  `__spark_entry__.py` re-exports
this registry verbatim.

Parity rules (hash-match against DuckDB):
- alias every computed column identically in Spark and SQL;
- sums/avgs over doubles go through DECIMAL casts so results are
  order-independent and bit-identical across engines;
- timestamps leave the query as epoch micros (unix_micros/epoch_us) or
  dates, never raw engine-native timestamps;
- every ORDER BY ... LIMIT has a unique tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under `name` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


def register_sql(name: str, sql: str, doc: str = "", tags: tuple[str, ...] = ()) -> None:
    """Register a shared-text SQL query: the SAME string runs verbatim on
    spark.sql (over catalog.register_all temp views) and as the DuckDB
    oracle — the strongest parity statement the harness can make."""
    from binance_etl_spark.catalog import register_all

    @register(name, oracle=sql, doc=doc, tags=tags)
    def run(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        # The driver's session may not be UTC; date/time expressions in
        # shared-text SQL must mean the same thing as DuckDB's naive
        # (UTC-equivalent) timestamps. Runtime-settable.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        register_all(spark, sf_dir)
        return spark.sql(_sql)

    run.__name__ = name


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every plan module for its registration side effects."""
    global _LOADED
    if _LOADED:
        return
    from binance_etl_spark.plans import (  # noqa: F401
        analytics,
        analytics2,
        analytics3,
        analytics4,
        analytics5,
        analytics6,
        analytics7,
        analytics8,
        ann_index,
        dedup_index,
        dq,
        formats,
        graph,
        ivm,
        lakehouse,
        llm_ops,
        llm_ops2,
        llm_ops3,
        llm_ops4,
        llm_ops5,
        llm_ops6,
        llm_ops7,
        llm_ops8,
        llm_ops9,
        llm_ops10,
        llm_ops11,
        llm_ops12,
        llm_ops13,
        llm_ops14,
        llm_ops15,
        microstructure,
        microstructure2,
        microstructure3,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        retrieval,
        risk,
        scalar,
        scalar2,
        scalar3,
        spans_index,
        stats2,
        stats3,
        streaming_analog,
        subqueries,
        text_index,
        timeseries,
        tpch,
    )

    _LOADED = True
