"""Medallion architecture end-to-end: the table-format pieces compose
into the standard lakehouse pipeline with NO external system —

  raw stream --foreach_batch_snapshot--> BRONZE snapshot table
  BRONZE --stream_snapshot--> transform --snapshot sink--> SILVER
  SILVER --read_changes (CDC)--> signed-delta apply --> GOLD aggregate

and the gold aggregate equals a full recompute over the raw input
(the invariant every incremental lakehouse pipeline owes its users).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from binance_etl_spark.operators import snapshots as SNAP
from binance_etl_spark.sources.snapshot_stream import stream_snapshot


def test_bronze_silver_gold_roundtrip(spark, tmp_path):
    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    raw_dir = str(tmp_path / "raw")
    raw = spark.range(200).selectExpr(
        "id", "CAST(id % 7 AS LONG) AS grp", "id * 3 AS amount"
    )
    raw.coalesce(4).write.parquet(raw_dir)

    # --- bronze: stream the raw files into a versioned snapshot table
    q = (
        spark.readStream.schema("id BIGINT, grp BIGINT, amount BIGINT")
        .option("maxFilesPerTrigger", "2")
        .parquet(raw_dir)
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_bronze"))
        .foreachBatch(SNAP.foreach_batch_snapshot(bronze))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert SNAP.count_rows(bronze) == 200
    assert len(SNAP.versions(bronze)) >= 2, "multiple bronze commits"

    # --- silver: tail bronze, transform, land as another snapshot table
    def to_silver(batch_df, batch_id):
        out = batch_df.where(F.col("amount") % 2 == 0).select(
            "id", "grp", (F.col("amount") * 10).alias("scaled")
        )
        SNAP.foreach_batch_snapshot(silver)(out, batch_id)

    q2 = (
        stream_snapshot(spark, bronze)
        .writeStream.foreachBatch(to_silver)
        .option("checkpointLocation", str(tmp_path / "ckpt_silver"))
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    silver_v1 = SNAP.versions(silver)[-1]

    # --- gold: CDC-driven incremental aggregate over silver
    def gold_state():
        return SNAP.read_version(spark, silver, 1).limit(0).groupBy("grp").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("scaled").cast("bigint").alias("total"),
        )

    state = gold_state().localCheckpoint(eager=True)
    prev_v = None
    for v in SNAP.versions(silver):
        ch = (
            SNAP.read_changes(spark, silver, prev_v, v)
            if prev_v is not None
            else SNAP.read_version(spark, silver, v).withColumn(
                "change_type", F.lit("insert")
            )
        )
        sgn = F.when(F.col("change_type") == "insert", 1).otherwise(-1)
        delta = ch.groupBy("grp").agg(
            F.sum(sgn).cast("bigint").alias("n"),
            F.sum(sgn * F.col("scaled")).cast("bigint").alias("total"),
        )
        state = (
            state.unionByName(delta)
            .groupBy("grp")
            .agg(
                F.sum("n").cast("bigint").alias("n"),
                F.sum("total").cast("bigint").alias("total"),
            )
            .localCheckpoint(eager=True)
        )
        prev_v = v

    # late bronze data flows through BOTH hops incrementally
    more = spark.range(200, 230).selectExpr(
        "id", "CAST(id % 7 AS LONG) AS grp", "id * 3 AS amount"
    )
    SNAP.write_version(more, bronze)
    q3 = (
        stream_snapshot(spark, bronze)
        .writeStream.foreachBatch(to_silver)
        .option("checkpointLocation", str(tmp_path / "ckpt_silver"))
        .start()
    )
    q3.processAllAvailable()
    q3.stop()
    v_new = SNAP.versions(silver)[-1]
    assert v_new > silver_v1, "silver advanced from the bronze delta only"
    ch = SNAP.read_changes(spark, silver, silver_v1, v_new)
    assert ch.where("change_type = 'delete'").count() == 0
    sgn = F.when(F.col("change_type") == "insert", 1).otherwise(-1)
    delta = ch.groupBy("grp").agg(
        F.sum(sgn).cast("bigint").alias("n"),
        F.sum(sgn * F.col("scaled")).cast("bigint").alias("total"),
    )
    state = (
        state.unionByName(delta)
        .groupBy("grp")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("total").cast("bigint").alias("total"),
        )
    )

    # --- the invariant: incremental gold == full recompute from raw
    expected = {
        (r.grp, r.n, r.total)
        for r in raw.unionByName(more)
        .where(F.col("amount") % 2 == 0)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("amount") * 10).cast("bigint").alias("total"),
        )
        .collect()
    }
    got = {(r.grp, r.n, r.total) for r in state.collect()}
    assert got == expected
