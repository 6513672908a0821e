"""Similarity search over embedding columns (SURVEY.md §2.12).

- Brute-force cosine top-k: the correctness baseline. zip_with +
  aggregate keeps the dot product inside JVM codegen (no UDF, no
  explode): O(n·d) with a TakeOrderedAndProject top-k — at 100 TB this
  is one scan, no shuffle beyond the final k-merge.
- IVF (inverted-file) probing: centroids from a grouped aggregate;
  query probes the nearest `nprobe` centroids and scans only those
  partitions' vectors — the scale path (search cost / n_lists).
- All arithmetic is engine-portable-deterministic: elementwise double
  products are floored to e-12 integer units (IEEE ops only), so sums
  are order-independent bigint adds and DuckDB agrees bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

E12 = "1000000000000"


def dot_e12(a: str, b: str) -> Column:
    """Sum_i floor(a_i * b_i * 1e12) as bigint — order-independent."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * {E12}) AS BIGINT)), "
        f"CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def sq_norm_e12(a: str) -> Column:
    return dot_e12(a, a)


def cosine_from_e12(dot: Column, na: Column, nb: Column) -> Column:
    return dot.cast("double") / F.sqrt(na.cast("double") * nb.cast("double"))


def plane_weight(plane: int, dim: int) -> float:
    """Engine-portable pseudo-random hyperplane weight in [-7.5, 7.5]:
    the first md5-hex nibble of '<plane>_<dim>' — the same value the
    DuckDB oracles derive as
    instr('0123456789abcdef', substr(md5(plane || '_' || i), 1, 1)) - 8.5.
    """
    import hashlib

    return int(hashlib.md5(f"{plane}_{dim}".encode()).hexdigest()[0], 16) - 7.5


def hyperplane_bucket(
    emb_col: str, n_planes: int = 4, n_dims: int = 64, base: int = 0
) -> Column:
    """Sign-pattern LSH bucket as a PURE per-row expression — no joins,
    no shuffle, no broadcast of any per-vector table.

    The md5-derived plane weights are PRECOMPUTED on the driver and
    inlined as literal arrays (they are pure pseudo-randomness — the
    oracle derives the identical values in SQL), so runtime cost is
    n_planes x n_dims multiply-floor-adds per row with zero hashing.
    Each contribution floors to e-12 integer units so the sign vote is
    an order-free bigint sum DuckDB reproduces bit-for-bit. `base`
    offsets the global plane index so bands draw independent planes.
    """
    out = None
    for p in range(n_planes):
        ws = ", ".join(
            f"{plane_weight(base + p, i)!r}D" for i in range(1, n_dims + 1)
        )
        s = F.expr(
            f"aggregate(zip_with({emb_col}, array({ws}), (x, w) -> "
            f"CAST(floor(w * CAST(x AS DOUBLE) * {E12}) AS BIGINT)), "
            f"CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        )
        bit = F.when(s > 0, F.lit(1 << p)).otherwise(F.lit(0))
        out = bit if out is None else out + bit
    return out.cast("int")


def band_buckets(
    df: DataFrame,
    id_col: str,
    emb_col: str,
    n_bands: int = 4,
    planes_per_band: int = 4,
    n_dims: int = 64,
) -> DataFrame:
    """(id, band_no, bucket): multi-band hyperplane LSH for near-dup
    blocking. Band b uses global planes [b*planes_per_band, ...), so
    bands are independent; vectors sharing ANY band bucket become
    candidate pairs via an equi-join on (band_no, bucket) — the
    embedding analog of MinHash banding, O(vectors x bands) shuffle."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_no"),
                hyperplane_bucket(
                    emb_col, planes_per_band, n_dims, base=b * planes_per_band
                ).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    return df.select(id_col, F.explode(bands).alias("bd")).select(
        id_col, F.col("bd.band_no").alias("band_no"), F.col("bd.bucket").alias("bucket")
    )


def cosine_topk(vectors: DataFrame, query: DataFrame, k: int = 20) -> DataFrame:
    """Brute-force top-k: `vectors` (vec_id, embedding, ...) vs a
    one-row `query` (q_embedding). Broadcast the query; deterministic
    order (sim desc, vec_id)."""
    scored = vectors.crossJoin(F.broadcast(query)).select(
        "vec_id",
        cosine_from_e12(
            dot_e12("embedding", "q_embedding"),
            sq_norm_e12("embedding"),
            sq_norm_e12("q_embedding"),
        ).alias("sim"),
    )
    return scored.orderBy(F.col("sim").desc(), F.col("vec_id")).limit(k)


def ivf_centroids_e12(vectors: DataFrame, list_col: str = "label") -> DataFrame:
    """Per-list centroid as (list, pos, c_e12 bigint-sum, n): exact,
    order-independent 'mean' representation (divide at use time)."""
    exploded = vectors.select(
        list_col, F.posexplode("embedding").alias("pos", "val")
    ).withColumn("v_e12", F.expr(f"CAST(floor(CAST(val AS DOUBLE) * {E12}) AS BIGINT)"))
    return exploded.groupBy(list_col, "pos").agg(
        F.sum("v_e12").alias("c_e12"), F.count(F.lit(1)).alias("n")
    )


def ivf_top_lists(
    centroids: DataFrame,
    query: DataFrame,
    list_col: str = "label",
    nprobe: int = 2,
) -> DataFrame:
    """The coarse-quantizer half of IVF: score every list's centroid
    against the query and keep the nprobe best — the list-pruning step
    shared by exact-rescore IVF (ivf_probe) and compressed-rescore
    IVFPQ (plans/llm_ops11.sim_ann_ivfpq)."""
    q_exploded = query.select(F.posexplode("q_embedding").alias("pos", "qval"))
    list_scores = (
        centroids.join(F.broadcast(q_exploded), "pos")
        .withColumn(
            "contrib",
            F.expr("CAST(floor(CAST(qval AS DOUBLE) * CAST(c_e12 AS DOUBLE)) AS BIGINT)"),
        )
        .groupBy(list_col)
        .agg((F.sum("contrib").cast("double") / F.max("n")).alias("list_score"))
    )
    return list_scores.orderBy(F.col("list_score").desc(), F.col(list_col)).limit(nprobe)


def ivf_probe(
    vectors: DataFrame,
    centroids: DataFrame,
    query: DataFrame,
    list_col: str = "label",
    nprobe: int = 2,
    k: int = 10,
) -> DataFrame:
    """Score lists against the query, keep nprobe best, exact-search
    only vectors in those lists."""
    top_lists = ivf_top_lists(centroids, query, list_col, nprobe)
    candidates = vectors.join(F.broadcast(top_lists.select(list_col)), list_col)
    scored = candidates.crossJoin(F.broadcast(query)).select(
        "vec_id",
        list_col,
        cosine_from_e12(
            dot_e12("embedding", "q_embedding"),
            sq_norm_e12("embedding"),
            sq_norm_e12("q_embedding"),
        ).alias("sim"),
    )
    return scored.orderBy(F.col("sim").desc(), F.col("vec_id")).limit(k)
