"""Third batch: UDTF surface, partitioned-sink round trip, stratified
sampling — closing out SURVEY §2.11 (UDTF) and the partitioned-layout
prescription (§4.2) as oracle-checked queries."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_spark.catalog import fanout, load
from binance_etl_spark.plans.registry import register


@register(
    "udtf_explode_frames",
    oracle="""
    WITH frames(frame) AS (VALUES
      ('{"e":"depthUpdate","s":"BNBUSDT","u":103,"b":[["598.00","1.50"],["597.90","0.00"]],"a":[["598.10","2.00"]]}'),
      ('{"e":"depthUpdate","s":"BNBUSDT","u":106,"b":[["597.90","0.80"]],"a":[]}')
    ), sides AS (
      SELECT frame, 'bid' AS side, '$.b' AS p FROM frames
      UNION ALL SELECT frame, 'ask', '$.a' FROM frames
    ), ex AS (
      SELECT frame, side, p,
             UNNEST(generate_series(0, CAST(json_array_length(frame, p) AS INT) - 1)) AS i
      FROM sides
    )
    SELECT json_extract_string(frame, '$.s') AS symbol,
           CAST(json_extract(frame, '$.u') AS BIGINT) AS update_id,
           side,
           json_extract_string(frame, p || '[' || i || '][0]') AS price,
           json_extract_string(frame, p || '[' || i || '][1]') AS quantity
    FROM ex
    """,
    doc="Python UDTF (PySpark 4 @udtf) as the frame->levels exploder "
    "alternative (SURVEY §2.11): one frame row in, N level rows out. "
    "The built-in explode path (streaming/parse.py) is the production "
    "choice; the UDTF demonstrates the table-function extension "
    "surface with identical semantics.",
    tags=("udf", "udtf", "explode"),
)
def udtf_explode_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json

    from pyspark.sql.functions import udtf

    @udtf(returnType="symbol STRING, update_id BIGINT, side STRING, price STRING, quantity STRING")
    class ExplodeDepthFrame:
        def eval(self, frame: str):
            ev = json.loads(frame)
            for side, key in (("bid", "b"), ("ask", "a")):
                for price, qty in ev.get(key, []):
                    yield ev["s"], ev["u"], side, price, qty

    frames = [
        ('{"e":"depthUpdate","s":"BNBUSDT","u":103,"b":[["598.00","1.50"],["597.90","0.00"]],"a":[["598.10","2.00"]]}',),
        ('{"e":"depthUpdate","s":"BNBUSDT","u":106,"b":[["597.90","0.80"]],"a":[]}',),
    ]
    df = spark.createDataFrame(frames, "frame STRING")
    return df.lateralJoin(ExplodeDepthFrame(F.col("frame").outer())).select(
        "symbol", "update_id", "side", "price", "quantity"
    )


@register(
    "sink_partitioned_roundtrip",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value
    FROM events WHERE event_type IN ('click', 'purchase')
    GROUP BY event_type
    """,
    doc="Partitioned-layout round trip (SURVEY §4.2 prescription): "
    "events written partitioned by event_type, read back with a "
    "partition filter — the scan touches only 2 of 5 directories "
    "(partition pruning; asserted in tests/test_plans.py).",
    tags=("sink", "scan"),
)
def sink_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = tempfile.mkdtemp(prefix="besk_part_") + "/events_parted"
    e = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    e.write.mode("overwrite").partitionBy("event_type").parquet(out)
    back = spark.read.parquet(out).where(F.col("event_type").isin("click", "purchase"))
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(20,6)")).cast("double").alias("sum_value"),
    )


@register(
    "sample_stratified",
    oracle="""
    WITH sampled AS (
      SELECT lang, doc_id
      FROM documents
      WHERE instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 < 4
    )
    SELECT lang, COUNT(*) AS n_sampled, MIN(doc_id) AS min_id
    FROM sampled GROUP BY lang
    """,
    doc="Deterministic stratified sampling: ~25% per language stratum "
    "by md5 nibble of the id — reproducible across engines, runs and "
    "cluster sizes (df.sample/TABLESAMPLE are seeded per-partition and "
    "are NOT stable under repartitioning; hash-gating is). The "
    "training-data subsampling primitive.",
    tags=("llm", "sample"),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fanout(load(spark, sf_dir, "documents"))
    nibble = F.expr("instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 2, 1)) - 1")
    return (
        d.where(nibble < 4)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"), F.min("doc_id").alias("min_id"))
    )


# ---------------------------------------------------------------------------
# Dedup clustering: pairs -> connected components -> canonical doc
# ---------------------------------------------------------------------------

CAP_CC = 400

_SQL_CC_SHINGLES = (
    "list_distinct(list_transform(generate_series(1, len(toks) - 2), "
    "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"
)

_SQL_CC_JACC = (
    "CAST(len(list_filter({l}.sh, x -> list_contains({r}.sh, x))) AS DOUBLE)"
    " / (len({l}.sh) + len({r}.sh)"
    " - len(list_filter({l}.sh, x -> list_contains({r}.sh, x))))"
)


_SQL_CC_BODY = f"""
    WITH RECURSIVE
    a AS (SELECT doc_id AS id, {_SQL_CC_SHINGLES} AS sh
          FROM (SELECT doc_id, string_split(text, ' ') AS toks
                FROM documents WHERE doc_id < {CAP_CC})),
    b AS (SELECT doc_id + 1000000 AS id, {_SQL_CC_SHINGLES} AS sh
          FROM (SELECT doc_id, string_split(substr(text, instr(text, ' ') + 1), ' ') AS toks
                FROM documents WHERE doc_id < {CAP_CC})),
    c AS (SELECT doc_id + 2000000 AS id, {_SQL_CC_SHINGLES} AS sh
          FROM (SELECT doc_id, string_split(substr(t1, instr(t1, ' ') + 1), ' ') AS toks
                FROM (SELECT doc_id, substr(text, instr(text, ' ') + 1) AS t1
                      FROM documents WHERE doc_id < {CAP_CC}))),
    am AS (SELECT id, sh, list_aggregate(list_transform(sh, s -> md5(s)), 'min') AS msh FROM a),
    bm AS (SELECT id, sh, list_aggregate(list_transform(sh, s -> md5(s)), 'min') AS msh FROM b),
    cm AS (SELECT id, sh, list_aggregate(list_transform(sh, s -> md5(s)), 'min') AS msh FROM c),
    pab AS (SELECT am.id AS src, bm.id AS dst FROM am JOIN bm USING (msh)
            WHERE {_SQL_CC_JACC.format(l="am", r="bm")} >= 0.6),
    pbc AS (SELECT bm.id AS src, cm.id AS dst FROM bm JOIN cm USING (msh)
            WHERE {_SQL_CC_JACC.format(l="bm", r="cm")} >= 0.6),
    edges AS (
      SELECT src, dst FROM pab UNION SELECT dst, src FROM pab
      UNION SELECT src, dst FROM pbc UNION SELECT dst, src FROM pbc
    ),
    nodes AS (SELECT id FROM a UNION SELECT id FROM b UNION SELECT id FROM c),
    comp(node, lbl) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.dst, comp.lbl FROM comp JOIN edges e ON e.src = comp.node
    )
"""


def cc_edge_batches(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The dedup_cluster_cc fixture, split for incremental consumers:
    (a~b pair edges, b~c pair edges, all nodes). Shared by the inline
    op below and plans/dedup_index.py::dedup_cluster_index_incremental,
    which applies the two edge batches as successive index refreshes —
    one edge generation, one oracle (_SQL_CC_BODY)."""
    from binance_etl_spark.operators import dedup as D

    base = fanout(load(spark, sf_dir, "documents").where(F.col("doc_id") < CAP_CC))
    drop1 = F.expr("substr(text, instr(text, ' ') + 1)")

    def prepped(df: DataFrame, offset: int, tag: str) -> DataFrame:
        out = df.select(
            (F.col("doc_id") + offset).alias(f"{tag}_id"),
            D.shingles(F.col("text")).alias(f"{tag}_sh"),
        )
        return out.withColumn("msh", F.array_min(F.transform(f"{tag}_sh", F.md5))).cache()

    am = prepped(base, 0, "a")
    bm = prepped(base.withColumn("text", drop1), 1_000_000, "b")
    cm = prepped(base.withColumn("text", drop1).withColumn("text", drop1), 2_000_000, "c")

    def pairs(l: DataFrame, r: DataFrame, lt: str, rt: str) -> DataFrame:
        jacc = D.jaccard(F.col(f"{lt}_sh"), F.col(f"{rt}_sh"))
        return (
            l.join(r, "msh")
            .where(jacc >= 0.6)
            .select(F.col(f"{lt}_id").alias("src"), F.col(f"{rt}_id").alias("dst"))
        )

    # materialize the (small) edge/node outputs and drop the shingle
    # caches before returning: the caches exist only so bm's shingle
    # arrays compute once across the two pair joins — left cached,
    # each consumer (two registered queries, both benched) would pin
    # 3 fixture generations in executor storage for the session
    e_ab = pairs(am, bm, "a", "b").localCheckpoint(eager=True)
    e_bc = pairs(bm, cm, "b", "c").localCheckpoint(eager=True)
    nodes = (
        am.select(F.col("a_id").alias("node"))
        .union(bm.select("b_id"))
        .union(cm.select("c_id"))
    ).localCheckpoint(eager=True)
    for df in (am, bm, cm):
        df.unpersist()
    return e_ab, e_bc, nodes


@register(
    "dedup_cluster_cc",
    oracle=_SQL_CC_BODY
    + """
    SELECT node, MIN(lbl) AS cluster_id FROM comp GROUP BY node
    """,
    doc="Dedup-cluster assignment: near-dup PAIRS (min-md5-shingle "
    "blocking + exact Jaccard >= 0.6, over a corpus with drop-1-token "
    "and drop-2-token variants) collapsed into connected components by "
    "min-label propagation (operators/dedup.py::connected_components); "
    "cluster_id = min doc id = the canonical doc to keep. The variant "
    "chain a~b~c has NO direct a~c edge, so the result proves "
    "multi-hop propagation, which pair-level dedup cannot produce. "
    "Oracle: DuckDB recursive CTE over the same edges.",
    tags=("dedup", "iterative"),
)
def dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.operators.dedup import connected_components

    e_ab, e_bc, nodes = cc_edge_batches(spark, sf_dir)
    return connected_components(e_ab.union(e_bc), nodes=nodes)


_SQL_NIBBLE = "instr('0123456789abcdef', substr(md5(CAST({x} AS VARCHAR)), 1, 1)) - 1"


@register(
    "split_leakage_safe",
    oracle=_SQL_CC_BODY
    + f""",
    clusters AS (SELECT node, MIN(lbl) AS cluster_id FROM comp GROUP BY node),
    assigned AS (
      SELECT node, cluster_id,
             CASE WHEN {_SQL_NIBBLE.format(x="cluster_id")} < 12
                  THEN 'train' ELSE 'val' END AS split,
             CASE WHEN {_SQL_NIBBLE.format(x="node")} < 12
                  THEN 'train' ELSE 'val' END AS naive_split
      FROM clusters
    )
    SELECT split,
           COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
           CAST(SUM(CASE WHEN naive_split <> split THEN 1 ELSE 0 END) AS BIGINT)
             AS n_naive_leaks
    FROM assigned GROUP BY split
    """,
    doc="LEAKAGE-SAFE train/val split: the split key is the NEAR-DUP "
    "CLUSTER id (from the same shingle-block + Jaccard + connected-"
    "components pipeline as dedup_cluster_cc), so every member of a "
    "near-duplicate family lands on the same side — by construction, "
    "never by luck. Splitting on the document id instead (the naive "
    "rule, split_train_val's shape) would put n_naive_leaks documents "
    "on the opposite side from a near-duplicate of themselves — "
    "train/eval contamination that silently inflates benchmarks. The "
    "contrast count is part of the output so the pipeline can ALARM "
    "on how much leakage naive splitting would have caused. Cost on "
    "top of clustering: one map-side-combinable aggregate; the hash "
    "assignment is content-stable (reproducible across engines, runs "
    "and cluster sizes).",
    tags=("llm", "split", "dedup"),
)
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    clusters = dedup_cluster_cc(spark, sf_dir)
    nib = lambda c: F.expr(  # noqa: E731
        f"instr('0123456789abcdef', substr(md5(CAST({c} AS STRING)), 1, 1)) - 1"
    )
    assigned = clusters.select(
        "node",
        "cluster_id",
        F.when(nib("cluster_id") < 12, "train").otherwise("val").alias("split"),
        F.when(nib("node") < 12, "train").otherwise("val").alias("naive_split"),
    )
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("cluster_id").cast("bigint").alias("n_clusters"),
        F.sum((F.col("naive_split") != F.col("split")).cast("int"))
        .cast("bigint")
        .alias("n_naive_leaks"),
    )
