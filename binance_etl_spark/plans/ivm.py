"""Incremental view maintenance over JOINS — the bilinear delta rule.

`sink_cdc_incremental_agg` (llm_ops12.py) maintains a single-table
aggregate through CDC deltas. Real derived tables join: this module
maintains V = agg(A JOIN B) through versions of BOTH sides using the
standard signed-multiset expansion (DBSP / differential-dataflow /
materialized-view literature):

    (A + dA) JOIN (B + dB)
        = A JOIN B  +  dA JOIN B  +  A JOIN dB  +  dA JOIN dB

so the maintenance delta for one step is
    dV = dA JOIN B_old + A_old JOIN dB + dA JOIN dB
with every row carrying a sign (+1 insert / -1 delete from
read_changes) and each join product weighted by the PRODUCT of its
sides' signs. Updates are delete+insert pairs, so they net their
difference; a B-side dimension update retracts every joined fact row
at the old weight and re-asserts it at the new one.

Scale: each delta term joins a CHANGE SET (I/O proportional to the
delta — read_changes' contract) against a snapshot read of the other
side pinned AT THE OLD VERSION (time travel gives the exact operand
the algebra needs); the per-key aggregate keeps state lang-sized.
History is never rescanned. The oracle is the full recompute of the
final join — proving delta-apply == recompute across every step,
including the step where BOTH tables change at once (nonzero
dA JOIN dB cross term).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_spark.catalog import load
from binance_etl_spark.plans.registry import register


def _signed(changes: DataFrame, sgn_col: str) -> DataFrame:
    return changes.withColumn(
        sgn_col,
        F.when(F.col("change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        ),
    )


@register(
    "sink_cdc_incremental_join",
    oracle="""
    WITH fa AS (
      SELECT doc_id, lang,
             CASE WHEN doc_id % 10 = 0 THEN n_chars + 1000
                  ELSE n_chars END AS n_chars
      FROM documents WHERE doc_id % 10 <> 5
    ), fb AS (
      SELECT lang,
             CASE WHEN ascii(lang) % 2 = 0 THEN ascii(lang) + 7
                  ELSE ascii(lang) END AS w
      FROM (SELECT DISTINCT lang FROM documents)
    )
    SELECT fa.lang, COUNT(*) AS n_docs,
           CAST(SUM(fa.n_chars * fb.w) AS BIGINT) AS weighted_chars
    FROM fa JOIN fb ON fa.lang = fb.lang
    GROUP BY fa.lang ORDER BY fa.lang
    """,
    doc="Incremental maintenance of a JOIN view with retractions: "
    "V = per-lang agg of docs JOIN lang-weights, followed through an "
    "A-side append, then a SIMULTANEOUS A-side merge (updates + "
    "deletes) and B-side dimension update, via the bilinear rule "
    "dV = dA*B_old + A_old*dB + dA*dB (signs multiply; updates are "
    "delete+insert pairs). Each term joins a change set against the "
    "OTHER side time-traveled to the old version — I/O scales with "
    "the delta, state stays key-sized, history is never rescanned. "
    "Oracle = full recompute of the final join (delta-apply == "
    "recompute, cross term included).",
    tags=("sink", "versioning", "incremental", "join", "llm"),
)
def sink_cdc_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.operators import snapshots as SNAP

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    base = tempfile.mkdtemp(prefix="besk_ivmjoin_")
    ta, tb = base + "/docs_versioned", base + "/weights_versioned"

    dims = d.select("lang").distinct().select(
        "lang", F.ascii("lang").cast("bigint").alias("w")
    )

    def agg(df: DataFrame) -> DataFrame:
        # sgn_a/sgn_b default to literal 1 on full-snapshot operands
        sa = F.col("sgn_a") if "sgn_a" in df.columns else F.lit(1)
        sb = F.col("sgn_b") if "sgn_b" in df.columns else F.lit(1)
        return df.groupBy("lang").agg(
            F.sum(sa * sb).cast("bigint").alias("n_docs"),
            F.sum(sa * sb * F.col("n_chars") * F.col("w"))
            .cast("bigint")
            .alias("weighted_chars"),
        )

    # --- version timeline --------------------------------------------
    av1 = SNAP.write_version(
        d.where(F.col("doc_id") % 3 != 2).repartitionByRange(4, "doc_id"), ta
    )
    bv1 = SNAP.write_version(dims.repartition(2), tb)
    state = agg(
        SNAP.read_version(spark, ta, av1).join(
            SNAP.read_version(spark, tb, bv1), "lang"
        )
    ).localCheckpoint(eager=True)

    # step 1: A-side append only (dB empty -> two of three terms vanish)
    av2 = SNAP.write_version(
        d.where(F.col("doc_id") % 3 == 2).repartitionByRange(2, "doc_id"), ta
    )
    da = _signed(SNAP.read_changes(spark, ta, av1, av2), "sgn_a")
    delta = agg(da.join(SNAP.read_version(spark, tb, bv1), "lang"))
    state = (
        state.unionByName(delta)
        .groupBy("lang")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("weighted_chars").cast("bigint").alias("weighted_chars"),
        )
        .localCheckpoint(eager=True)
    )

    # step 2: BOTH sides change at once. A: merge (updates + deletes);
    # B: dimension re-weight where the current weight is even.
    src_a = (
        d.where(F.col("doc_id") % 10 == 0)
        .withColumn("n_chars", F.col("n_chars") + 1000)
        .unionByName(
            d.where(F.col("doc_id") % 10 == 5).withColumn(
                "n_chars", F.lit(-1).cast("bigint")
            )
        )
    )
    av3 = SNAP.merge_into(
        spark, ta, src_a, key_cols=["doc_id"], delete_condition="n_chars = -1",
        source_unique=True,  # disjoint %10 slices of unique doc_ids
    )
    src_b = dims.where(F.col("w") % 2 == 0).withColumn(
        "w", F.col("w") + 7
    )
    bv2 = SNAP.merge_into(
        spark, tb, src_b, key_cols=["lang"],
        source_unique=True,  # filtered distinct-lang dimension rows
    )

    da = _signed(SNAP.read_changes(spark, ta, av2, av3), "sgn_a")
    db = _signed(SNAP.read_changes(spark, tb, bv1, bv2), "sgn_b")
    a_old = SNAP.read_version(spark, ta, av2)
    b_old = SNAP.read_version(spark, tb, bv1)
    delta = (
        agg(da.join(b_old, "lang"))
        .unionByName(agg(a_old.join(db, "lang")))
        .unionByName(agg(da.join(db, "lang")))
    )
    state = (
        state.unionByName(delta)
        .groupBy("lang")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("weighted_chars").cast("bigint").alias("weighted_chars"),
        )
        .localCheckpoint(eager=True)
    )
    return state.where(F.col("n_docs") > 0).orderBy("lang")
