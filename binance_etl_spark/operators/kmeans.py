"""Lloyd's k-means over an embedding column — DataFrame-native.

The iterative companion to the one-shot centroid query
(plans/llm_ops4.py::emb_centroid_label) and the clustering step of
embedding-space corpus curation (assign docs to semantic clusters,
balance / filter per cluster).

Spark-first shape (same as MLlib's implementation strategy):
- centroids live on the DRIVER (k x dim doubles — tiny by definition)
  and enter the plan as literal arrays, i.e. an implicit broadcast;
- the assignment step is a narrow map over the data (zip_with +
  aggregate distance, argmin via array_min over (dist, cid) structs)
  — no shuffle, no UDF, whole rows never leave their partition;
- the update step is one map-side-combinable groupBy producing
  k x dim partial sums in exact floor-e12 integer units (bit-identical
  across runs/partitionings, so the fitted model is deterministic).

Per iteration: ONE shuffle of k x dim x partitions tiny partials.
At 100 TB that is the optimal plan — data is scanned, never moved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNIT = 1e12


def _sq_dist_e12(vec_col: str, centroid: list[float]):
    """Squared L2 distance in floor-e12 BIGINT units.

    Each per-dimension term floors to integer units before summing, so
    the total is an order-free bigint add — bit-identical across
    partitionings AND across engines (a raw double fold depends on
    element order and on pow-vs-multiply rounding), which is what lets
    the DuckDB oracle reproduce assignments exactly.
    """
    c = F.array(*[F.lit(float(v)) for v in centroid])
    d = F.zip_with(
        F.col(vec_col),
        c,
        lambda a, b: F.floor(
            (a.cast("double") - b) * (a.cast("double") - b) * F.lit(_UNIT)
        ).cast("bigint"),
    )
    return F.aggregate(d, F.lit(0).cast("bigint"), lambda acc, v: acc + v)


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    n_iter: int = 3,
) -> tuple[list[list[float]], DataFrame]:
    """Fit k-means and return BOTH the fitted centroids (driver-side
    k x dim doubles — the coarse quantizer a learned-list IVF probes)
    and the assignment DataFrame (id_col, cluster, dist).

    Init: the k rows with the smallest ids (deterministic, no RNG).
    Ties in assignment break toward the lower cluster id via struct
    ordering, so the result is a pure function of the input set.
    """
    first = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    centroids: list[list[float]] = [[float(x) for x in r[1]] for r in first]

    for _ in range(n_iter):
        dists = F.array(
            *[
                F.struct(
                    _sq_dist_e12(vec_col, c).alias("dist"),
                    F.lit(i).alias("cid"),
                )
                for i, c in enumerate(centroids)
            ]
        )
        assigned = df.select(
            F.col(id_col),
            F.col(vec_col),
            F.array_min(dists)["cid"].alias("cluster"),
        )
        # Update: exact integer-unit means per (cluster, dimension).
        exploded = assigned.select(
            "cluster", F.posexplode(vec_col).alias("pos", "x")
        )
        units = F.floor(F.col("x").cast("double") * _UNIT).cast("bigint")
        stats = (
            exploded.groupBy("cluster", "pos")
            .agg(F.sum(units).alias("su"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = [list(c) for c in centroids]  # empty clusters keep position
        dims: dict[int, dict[int, float]] = {}
        for r in stats:
            dims.setdefault(r["cluster"], {})[r["pos"]] = (r["su"] / _UNIT) / r["n"]
        for cid, by_pos in dims.items():
            new[cid] = [by_pos[p] for p in sorted(by_pos)]
        centroids = new

    final = F.array(
        *[
            F.struct(_sq_dist_e12(vec_col, c).alias("dist"), F.lit(i).alias("cid"))
            for i, c in enumerate(centroids)
        ]
    )
    best = F.array_min(final)
    assign = df.select(
        F.col(id_col),
        best["cid"].alias("cluster"),
        (best["dist"].cast("double") / _UNIT).alias("dist"),
    )
    return centroids, assign


def kmeans_fit_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    n_iter: int = 3,
) -> DataFrame:
    """Fit k-means and return just the assignment (see kmeans_fit)."""
    return kmeans_fit(df, vec_col, id_col, k, n_iter)[1]
