"""Frame parsing: raw JSON frames -> typed trade / depth rows.

The engine twin of the reference's deserializers
(spot_trades_etl.py:38-58, spot_depth_etl.py:56-76), expressed as
from_json + select so it runs identically in batch and streaming and
stays inside JVM codegen.  Corrupt frames are quarantined via the
corrupt-record column (reference warns+drops, spot_trades_etl.py:56-58).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from binance_etl_spark.schemas import (
    DECIMAL,
    DEPTH_JSON_SCHEMA,
    TRADE_JSON_SCHEMA,
)

_OPTS = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"}


def parse_trades(frames: DataFrame) -> DataFrame:
    """frames(frame, arrival_ms, seq) -> trades table rows
    (reference output schema, README.md:70-77)."""
    j = F.from_json("frame", TRADE_JSON_SCHEMA, _OPTS)
    df = frames.select(
        j.alias("j"),
        # 'E' parsed separately: clashes with 'e' case-insensitively.
        F.get_json_object("frame", "$.E").cast("bigint").alias("ev_ms"),
        "arrival_ms",
        "seq",
    )
    return df.where(F.col("j._corrupt").isNull() & (F.col("j.e") == "trade")).select(
        F.col("j.s").alias("symbol"),
        F.col("ev_ms").alias("timestamp"),
        F.col("arrival_ms").alias("local_timestamp"),
        F.col("j.t").alias("id"),
        F.when(F.col("j.m"), "sell").otherwise("buy").alias("side"),
        F.col("j.p").cast(DECIMAL).alias("price"),
        F.col("j.q").cast(DECIMAL).alias("quantity"),
    )


def parse_depth_updates(frames: DataFrame) -> DataFrame:
    """frames -> one row per diff-depth update, levels kept as JSON
    strings (flat schema: required for list-state buffering in the
    stateful sync operator)."""
    j = F.from_json("frame", DEPTH_JSON_SCHEMA, _OPTS)
    df = frames.select(
        j.alias("j"),
        F.get_json_object("frame", "$.E").cast("bigint").alias("ev_ms"),
        F.get_json_object("frame", "$.U").cast("bigint").alias("first_uid"),
        "arrival_ms",
        "seq",
    )
    return df.where(F.col("j._corrupt").isNull() & (F.col("j.e") == "depthUpdate")).select(
        F.col("j.s").alias("symbol"),
        F.col("ev_ms").alias("timestamp"),
        F.col("arrival_ms").alias("local_timestamp"),
        F.col("first_uid").alias("first_update_id"),
        F.col("j.u").alias("last_update_id"),
        F.to_json(F.col("j.b")).alias("bids_json"),
        F.to_json(F.col("j.a")).alias("asks_json"),
        "seq",
    )


def explode_depth_rows(updates: DataFrame) -> DataFrame:
    """Pre-sync flattening (the reference's _save_update explode,
    spot_depth_etl.py:92-112): one row per (side, price, quantity)."""
    lvl_schema = "array<array<string>>"
    with_arrays = updates.select(
        "symbol",
        "timestamp",
        "local_timestamp",
        "last_update_id",
        F.from_json("bids_json", lvl_schema).alias("bids"),
        F.from_json("asks_json", lvl_schema).alias("asks"),
    )
    sides = with_arrays.select(
        "symbol",
        "timestamp",
        "local_timestamp",
        "last_update_id",
        F.explode(
            F.array(
                F.struct(F.lit("bid").alias("side"), F.col("bids").alias("levels")),
                F.struct(F.lit("ask").alias("side"), F.col("asks").alias("levels")),
            )
        ).alias("s"),
    )
    return sides.select(
        "symbol",
        "timestamp",
        "local_timestamp",
        "last_update_id",
        F.col("s.side").alias("side"),
        F.explode("s.levels").alias("lvl"),
    ).select(
        "symbol",
        "timestamp",
        "local_timestamp",
        "side",
        F.element_at("lvl", 1).cast(DECIMAL).alias("price"),
        F.element_at("lvl", 2).cast(DECIMAL).alias("quantity"),
        "last_update_id",
    )
