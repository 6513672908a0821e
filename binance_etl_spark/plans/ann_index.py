"""Persistent ANN index as a lakehouse table — build once, serve many,
refresh incrementally.

The inline ANN queries (plans/llm_ops11.py: sim_ann_pq / sim_ann_ivfpq)
re-encode every vector on every query. That is the right shape for a
one-shot scan, but production vector search amortizes the encode: the
index is BUILT once (PQ codes written as a table), QUERIES touch only
the 32x-compressed codes (never the raw floats), and corpus growth is
absorbed by encoding ONLY the newly-arrived vectors and appending them
as a new snapshot version — exactly how FAISS-on-object-store /
Milvus / LanceDB segment their indexes, re-expressed over this repo's
snapshot commit log (operators/snapshots.py).

Composition, nothing new invented:
- encode  = llm_ops11._pq_code_cols (the shared PQ encode half)
- storage = snapshots.write_version (append = incremental segment)
- serve   = snapshots.read_version + an ADC table lookup over the
            STORED codes column (no floats, no re-encode)

At 100 TB the split is the whole point: the encode pass is O(corpus)
ONCE (and O(delta) per refresh), while every query is a shuffle-free
scan of 8-byte codes ending in TakeOrderedAndProject — the serve path
never pays the encode again and never reads the 32x-larger raw
vectors. Reference parity note: the reference ETL (binance_etl,
~539 LoC) has no index structures; this is a north-star extension
operator per SURVEY.md §2.12.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_spark.catalog import fanout, load
from binance_etl_spark.plans.llm_ops11 import _M, _pq_code_cols, _pq_setup
from binance_etl_spark.plans.registry import REGISTRY, register


def pq_encode_arrow(
    vectors: DataFrame, codebook, id_col: str = "vec_id"
) -> DataFrame:
    """PQ encode as one vectorized Arrow pass — the bit-identical twin
    of the _pq_code_cols expression form (float32->float64 widening,
    (a-b)*(a-b)*1e12 double ops, floored int64 sums, argmin ties to
    the lower code): numpy does the n x K x dsub distance block per
    batch instead of interpreted per-row lambdas, and the driver never
    builds the K x M literal tree (measured ~2.4s of py4j column
    construction plus a codegen pass over 1,000+ literals per commit —
    the dominant cost of an index refresh micro-batch). Narrow: no
    shuffle; the codebook ships inside the function."""
    cb = [[[float(x) for x in code] for code in codebook[m]] for m in range(_M)]
    dsub = len(cb[0][0])

    def gen(batches):
        import numpy as np
        import pandas as pd

        cbm = np.asarray(cb, dtype=np.float64)  # M x K x dsub
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            out = {id_col: pdf[id_col].to_numpy(), "label": pdf["label"].to_numpy()}
            for m in range(_M):
                sub = x[:, m * dsub : (m + 1) * dsub]  # n x dsub
                d = sub[:, None, :] - cbm[m][None, :, :]  # n x K x dsub
                dist = np.floor(d * d * 1e12).astype(np.int64).sum(axis=2)
                out[f"c{m}"] = dist.argmin(axis=1).astype("int32")
            yield pd.DataFrame(out)

    code_cols = ", ".join(f"c{m} int" for m in range(_M))
    id_type = dict(vectors.dtypes)[id_col]
    label_type = dict(vectors.dtypes)["label"]
    return vectors.select(id_col, "label", "embedding").mapInPandas(
        gen, f"{id_col} {id_type}, label {label_type}, {code_cols}"
    )


def build_pq_index(
    vectors: DataFrame,
    codebook,
    table_dir: str,
    id_col: str = "vec_id",
    batch_id: int | None = None,
) -> int:
    """Encode `vectors` with `codebook` and commit the codes as the
    next snapshot version of `table_dir`. Called once for the initial
    corpus and once per refresh with ONLY the delta — each call is one
    narrow encode scan (no shuffle; vectorized, see pq_encode_arrow)
    plus one snapshot commit. `batch_id` is the streaming idempotency
    token (see foreach_batch_ann_index). Pure-APPEND refresh: no
    stored state is read, so concurrent appliers serialize and union
    — no snapshots.assert_serial_apply guard needed (contrast the
    read-modify-write dedup/cluster/spans index refreshes)."""
    from binance_etl_spark.operators import snapshots as SNAP

    codes = pq_encode_arrow(vectors, codebook, id_col)
    return SNAP.write_version(
        codes, table_dir, mode="append", stats_cols=[id_col], batch_id=batch_id
    )


def foreach_batch_ann_index(codebook, table_dir: str, id_col: str = "vec_id"):
    """writeStream.foreachBatch body keeping the PQ index CURRENT as
    vectors arrive: each micro-batch is encoded (O(batch), never
    O(corpus)) and appended as one snapshot version, exactly-once via
    the batch-id token — a checkpoint-replayed batch finds its id in a
    committed manifest and no-ops. Readers always serve a consistent
    index version mid-ingest (the atomic manifest swap), which is the
    Milvus/Lance "growing segment" story re-expressed over the
    snapshot log."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        build_pq_index(batch_df, codebook, table_dir, id_col, batch_id=batch_id)

    return apply


def adc_lookup_col(adc) -> Column:
    """Asymmetric-distance score from STORED code columns c0..c{M-1}:
    pure table lookup against the query's precomputed M x K ADC matrix
    (a ~KB literal/broadcast constant) — the serve path never touches
    raw floats and never re-runs the encode argmin."""
    from binance_etl_spark.plans.llm_ops11 import _sql_long_array

    total: Column = F.lit(0).cast("long")
    for m in range(_M):
        row = F.expr(_sql_long_array(adc[m]))
        total = total + F.element_at(row, (F.col(f"c{m}") + 1).cast("int"))
    return total


# Oracle: the PQ ADC ranking over the FULL corpus is by construction
# identical whether codes are recomputed inline (sim_ann_pq's oracle)
# or served from storage — same codebook, same argmin tie-break, same
# e-12 integer arithmetic. Reuse that oracle's WITH-chain verbatim and
# extend the final projection with the lifecycle evidence columns.
def _lifecycle_oracle() -> str:
    base = REGISTRY["sim_ann_pq"].oracle
    head = base.rsplit("SELECT s.vec_id", 1)[0]
    return (
        head
        + """SELECT s.vec_id, e.label, s.adc_dist,
           CAST(2 AS INT) AS n_versions,
           (SELECT COUNT(*) FROM embeddings) AS n_indexed
    FROM scored s JOIN embeddings e USING (vec_id)
    ORDER BY adc_dist, vec_id LIMIT 10
    """
    )


@register(
    "sim_ann_index_lifecycle",
    oracle=_lifecycle_oracle(),
    doc="Persistent PQ index lifecycle over the snapshot log: BUILD "
    "(encode the initial corpus — vec_id % 10 != 7 — and commit the "
    "8-byte codes as table v1), REFRESH (encode ONLY the late-arriving "
    "% 10 == 7 slice, one O(delta) scan, append as v2), SERVE (read "
    "the latest snapshot and rank by ADC lookup over the STORED codes "
    "— no floats, no re-encode, shuffle-free TakeOrderedAndProject). "
    "Returns the top-10 plus the lifecycle evidence: n_versions from "
    "the commit log and the metadata-only indexed-row count. The "
    "oracle is the inline-PQ oracle over the full corpus — served "
    "results must be bit-identical to recomputing, which is the "
    "index-consistency statement. At 100 TB the encode pass is paid "
    "once per vector ever (build + deltas), while every query scans "
    "only 32x-compressed codes; plan pinned in test_ann_index.py "
    "(serve scan reads NO embedding column).",
    tags=("similarity", "ann", "sink", "llm"),
)
def sim_ann_index_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from binance_etl_spark.operators import snapshots as SNAP

    e = fanout(load(spark, sf_dir, "embeddings"))
    setup = _pq_setup(e)
    if setup is None:  # schema-stable empty result on degenerate input
        return e.select(
            "vec_id",
            "label",
            F.lit(None).cast("long").alias("adc_dist"),
            F.lit(None).cast("int").alias("n_versions"),
            F.lit(None).cast("long").alias("n_indexed"),
        ).limit(0)
    codebook, adc = setup

    table = tempfile.mkdtemp(prefix="besk_annidx_") + "/pq_index"
    build_pq_index(e.where(F.col("vec_id") % 10 != 7), codebook, table)
    build_pq_index(e.where(F.col("vec_id") % 10 == 7), codebook, table)

    n_versions = len(SNAP.main_versions(table))
    n_indexed = SNAP.count_rows(table)  # manifest metadata, zero data I/O
    idx = SNAP.read_version(spark, table)
    return (
        idx.select(
            "vec_id",
            "label",
            adc_lookup_col(adc).alias("adc_dist"),
            F.lit(n_versions).cast("int").alias("n_versions"),
            F.lit(n_indexed).cast("long").alias("n_indexed"),
        )
        .orderBy("adc_dist", "vec_id")
        .limit(10)
    )
