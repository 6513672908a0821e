"""Resampling statistics at scale: Poisson-bootstrap confidence
intervals — the single-pass bootstrap (Chamandy et al., "Estimating
Uncertainty for Massive Data Streams", Google 2012): instead of
drawing n rows with replacement per replica (a shuffle per replica),
each row enters replica b with a Poisson(1) multiplicity, giving a
statistically equivalent bootstrap in ONE pass over the data with
map-side-combinable sums.

Cross-engine determinism: the multiplicity is the inverse-CDF of
Poisson(1) applied to a 16-bit uniform carved from md5(salt, row id,
replica) — the identical SQL text runs on both engines (the
corpus_shuffle_shards instr-nibble idiom), thresholds are hard-coded
integers, and all replica sums are floor-e2 integer partials, so the
oracle hash-matches exactly. CI bounds are DISCRETE quantiles of the
replica means (the agg_percentile_exact pairing — both engines CAST
the selected element to DOUBLE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_spark.catalog import load
from binance_etl_spark.plans.registry import register

_B = 64  # replicas; 64 * 0.025 = 1.6 -> disc CI bounds are the 2nd/63rd
_G = _B // 8  # md5 digests per row: each 32-nibble digest feeds 8 replicas

# Poisson(1) CDF * 65536, floored — P(X<=k) for k = 0..6; u >= the last
# threshold (prob ~1.5e-5) draws multiplicity 7.
_TH = [24109, 48218, 60273, 64291, 65296, 65497, 65530]

# 16-bit uniform carved from nibbles [4s+1 .. 4s+4] of the salted md5:
# one 128-bit digest yields EIGHT independent 16-bit uniforms, so 64
# replicas cost 8 md5 calls per row, not 64 (the hash dominates the
# fanout's CPU). The exact text runs verbatim on Spark AND DuckDB.
_U = (
    "((instr('0123456789abcdef', substr({hk}, s * 4 + 1, 1)) - 1) * 4096"
    " + (instr('0123456789abcdef', substr({hk}, s * 4 + 2, 1)) - 1) * 256"
    " + (instr('0123456789abcdef', substr({hk}, s * 4 + 3, 1)) - 1) * 16"
    " + (instr('0123456789abcdef', substr({hk}, s * 4 + 4, 1)) - 1))"
)
_HK = "md5(concat('bsci_', CAST(event_id AS STRING), '_', CAST(g AS STRING)))"
# the hash and the uniform are each computed ONCE per (row, group) /
# (row, replica) (hk -> u -> CASE) — inlining _U into every CASE branch
# would re-run the carve up to 28x per row-replica, and Spark's
# subexpression elimination does not reliably hoist duplicates out of
# conditional CASE branches
_MULT = (
    "CASE"
    + "".join(f" WHEN u < {t} THEN {k}" for k, t in enumerate(_TH))
    + " ELSE 7 END"
)


@register(
    "stats_bootstrap_ci",
    oracle=f"""
    WITH base AS (
      SELECT event_type, event_id,
             CAST(floor(value * 100) AS BIGINT) AS v_e2
      FROM events
    ), rep AS (
      SELECT event_type, v_e2, g * 8 + s AS b, {_MULT} AS mult
      FROM (
        SELECT event_type, v_e2, g, s, {_U.format(hk="hk")} AS u
        FROM (
          SELECT event_type, v_e2, g,
                 {_HK.replace("AS STRING", "AS VARCHAR")} AS hk
          FROM base
          CROSS JOIN (SELECT UNNEST(generate_series(0, {_G - 1})) AS g)
        )
        CROSS JOIN (SELECT UNNEST(generate_series(0, 7)) AS s)
      )
    ), means AS (
      SELECT event_type, b,
             CAST(SUM(mult * v_e2) AS DOUBLE) / 100 / NULLIF(SUM(mult), 0)
               AS m
      FROM rep GROUP BY event_type, b
    ), means_ok AS (
      SELECT event_type, m FROM means WHERE m IS NOT NULL
    ), tot AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(v_e2) AS DOUBLE) / 100 / COUNT(*) AS mean
      FROM base GROUP BY event_type
    )
    SELECT f.event_type, f.n, f.mean,
           CAST(quantile_disc(ms.m, 0.025) AS DOUBLE) AS ci_lo,
           CAST(quantile_disc(ms.m, 0.975) AS DOUBLE) AS ci_hi
    FROM means_ok ms JOIN tot f ON ms.event_type = f.event_type
    GROUP BY f.event_type, f.n, f.mean
    ORDER BY f.event_type
    """,
    doc="Poisson-bootstrap 95% CI for the per-event-type mean value: "
    "64 bootstrap replicas in ONE pass — each row enters replica b "
    "with a deterministic Poisson(1) multiplicity (inverse-CDF of a "
    "16-bit uniform; identical CASE text on both engines). Hashing is "
    "amortized 8x: one md5 per (row, group-of-8) and each 32-nibble "
    "digest is carved into eight 16-bit uniforms, so 64 replicas cost "
    "8 digests/row. Replica means are exact floor-e2 integer ratios "
    "guarded by NULLIF(SUM(mult),0) (an all-zero-multiplicity replica "
    "of a tiny group yields NULL and is filtered before the quantile "
    "on BOTH engines, pinning NULL placement out of existence); CI "
    "bounds are the discrete 2.5%/97.5% quantiles of the replica "
    "means. The MapReduce-era answer to bootstrapping 100 TB: no "
    "per-replica shuffle, one map-side-combinable (type, b) aggregate "
    "over the fanout, then a B-row-per-group quantile.",
    tags=("stats", "agg", "sampling"),
)
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    base = e.select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100).cast("bigint").alias("v_e2"),
    )
    # the 64x fanout is pure CPU: spread the (tiny, 3-column) base
    # across every core BEFORE exploding — a single parquet split
    # would otherwise serialize the whole hash/carve on one task
    fanout = base.repartition(spark.sparkContext.defaultParallelism)
    rep = (
        fanout.withColumn("g", F.explode(F.sequence(F.lit(0), F.lit(_G - 1))))
        .withColumn("hk", F.expr(_HK))
        .withColumn("s", F.explode(F.sequence(F.lit(0), F.lit(7))))
        # Spark-side carve uses conv(hex,16,10) — bit-identical to the
        # oracle's instr-nibble arithmetic (equivalence pinned in
        # tests/test_plans.py::test_bootstrap_conv_carve_equivalence)
        # but one JVM intrinsic instead of 4 instr+substr per replica
        .withColumn(
            "u", F.expr("CAST(conv(substr(hk, s * 4 + 1, 4), 16, 10) AS INT)")
        )
        .select(
            "event_type",
            "v_e2",
            (F.col("g") * 8 + F.col("s")).alias("b"),
            F.expr(_MULT).cast("bigint").alias("mult"),
        )
    )
    means = rep.groupBy("event_type", "b").agg(
        F.expr(
            "CAST(SUM(mult * v_e2) AS DOUBLE) / 100 / NULLIF(SUM(mult), 0)"
        ).alias("m")
    )
    means.where("m IS NOT NULL").createOrReplaceTempView("stats_boot_means")
    ci = spark.sql(
        """
        SELECT event_type,
               CAST(percentile_disc(0.025) WITHIN GROUP (ORDER BY m)
                    AS DOUBLE) AS ci_lo,
               CAST(percentile_disc(0.975) WITHIN GROUP (ORDER BY m)
                    AS DOUBLE) AS ci_hi
        FROM stats_boot_means GROUP BY event_type
        """
    )
    full = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("v_e2").cast("double") / 100 / F.count(F.lit(1))).alias("mean"),
    )
    return (
        full.join(ci, "event_type")
        .select("event_type", "n", "mean", "ci_lo", "ci_hi")
        .orderBy("event_type")
    )
