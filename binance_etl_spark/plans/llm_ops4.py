"""LLM training-data pipeline operators, round 2 (NS provenance,
SURVEY.md §2.12): PII-style redaction, repetition-based quality
scoring, per-domain weighted sampling, deterministic global shuffle,
and per-label embedding centroids.

All batch paths are built-in expressions (codegen'd or Arrow-free HOFs)
— no Python in the hot path. Cross-engine determinism follows the
parity rules: integer/decimal exact sums, floor-e12 units for float
vector math, md5 hex for portable hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from binance_etl_spark.catalog import fanout, load
from binance_etl_spark.plans.registry import register

_REDACT_PAT = r"\b(customer|user|key)\b"
_NUM_PAT = "[0-9]+"


@register(
    "text_redact_pii",
    oracle=f"""
    SELECT doc_id,
           length(regexp_replace(regexp_replace(text, '{_REDACT_PAT}', '<REDACTED>', 'g'),
                                 '{_NUM_PAT}', '<NUM>', 'g')) AS redacted_len,
           len(regexp_extract_all(text, '{_REDACT_PAT}')) AS n_terms,
           len(regexp_extract_all(text, '{_NUM_PAT}')) AS n_nums
    FROM documents
    WHERE len(regexp_extract_all(text, '{_REDACT_PAT}')) > 0
    """,
    doc="Sensitive-term redaction pass: regexp_replace of a term "
    "denylist and digit runs with placeholder tags, plus per-doc match "
    "counts (regexp_count). Patterns restricted to the syntax Java "
    "regex and RE2 interpret identically (literal alternation, \\b, "
    "digit runs). Pure codegen'd string expressions — the scrub is a "
    "single map stage at any scale.",
    tags=("text", "llm", "quality"),
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    red = F.regexp_replace(
        F.regexp_replace("text", _REDACT_PAT, "<REDACTED>"), _NUM_PAT, "<NUM>"
    )
    return (
        d.select(
            "doc_id",
            F.length(red).alias("redacted_len"),
            F.regexp_count("text", F.lit(_REDACT_PAT)).alias("n_terms"),
            F.regexp_count("text", F.lit(_NUM_PAT)).alias("n_nums"),
        )
        .where(F.col("n_terms") > 0)
    )


@register(
    "text_repetition_ratio",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           len(toks) AS n_tok,
           CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS uniq_ratio,
           CAST(len(list_distinct(list_transform(generate_series(1, len(toks) - 1),
                    i -> concat_ws(' ', toks[i], toks[i+1])))) AS DOUBLE)
             / (len(toks) - 1) AS bigram_uniq_ratio
    FROM t
    WHERE len(toks) > 1
    """,
    doc="Repetition-based quality signal: distinct-token and "
    "distinct-bigram ratios per document — low ratios flag boilerplate/"
    "looped text for corpus filtering. Array HOFs (transform over an "
    "index sequence) build bigrams without exploding; the int->double "
    "division is exact on both engines. Per-row map stage, "
    "embarrassingly parallel at 100 TB.",
    tags=("text", "llm", "quality"),
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fanout(load(spark, sf_dir, "documents"))
    toks = F.split("text", " ")
    d = d.select("doc_id", toks.alias("toks")).where(F.size("toks") > 1)
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 1),
        lambda i: F.concat_ws(" ", F.element_at("toks", i), F.element_at("toks", i + 1)),
    )
    return d.select(
        "doc_id",
        F.size("toks").alias("n_tok"),
        (F.size(F.array_distinct("toks")).cast("double") / F.size("toks")).alias(
            "uniq_ratio"
        ),
        (
            F.size(F.array_distinct(bigrams)).cast("double") / (F.size("toks") - 1)
        ).alias("bigram_uniq_ratio"),
    )


@register(
    "sample_weighted_domains",
    oracle="""
    WITH h AS (
      SELECT source, doc_id,
             (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
             + instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS hv,
             CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN 60 ELSE 25 END AS rate
      FROM documents
    )
    SELECT source, COUNT(*) AS n_kept, MIN(doc_id) AS min_kept_id
    FROM h WHERE hv % 100 < rate
    GROUP BY source
    """,
    doc="Per-domain weighted sampling (corpus mixing): each source gets "
    "a target rate (even-numbered sources 60%, odd 25%), rows kept by a "
    "deterministic md5-byte hash of the stable doc key — reproducible "
    "across runs/engines, no RNG state, and re-running on new data "
    "keeps prior decisions (the property CRFM-style data recipes need). "
    "Pure map-side filter: no shuffle until the audit count.",
    tags=("sampling", "llm"),
)
def sample_weighted_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    hv = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    rate = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 0, F.lit(60)
    ).otherwise(F.lit(25))
    return (
        d.where((hv % 100) < rate)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.min("doc_id").alias("min_kept_id"))
    )


@register(
    "shuffle_deterministic",
    oracle="""
    SELECT doc_id, md5('s42:' || CAST(doc_id AS VARCHAR)) AS skey
    FROM documents
    ORDER BY skey LIMIT 100
    """,
    doc="Deterministic global shuffle for training-order assignment: "
    "sort key = md5(seed || stable id). Seeded, engine-independent, and "
    "resumable — the same corpus always shuffles identically. Locally "
    "verified via the top-100 prefix (TakeOrderedAndProject: per-"
    "partition top-k + merge, no global sort). At 100 TB the full "
    "shuffle materializes with repartitionByRange(skey) + "
    "sortWithinPartitions — total order across output files without a "
    "single-reducer sort.",
    tags=("sampling", "llm", "sort"),
)
def shuffle_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    skey = F.md5(
        F.concat(F.lit("s42:"), F.col("doc_id").cast("string")).cast("binary")
    )
    return d.select("doc_id", skey.alias("skey")).orderBy("skey").limit(100)


def _kmeans_iter_sql(j: int) -> str:
    """One unrolled Lloyd iteration: assign under c{j-1}, update to c{j}.

    Mirrors operators/kmeans.py exactly: floor-e12 bigint distance
    units (order-free sums), ties toward the lower cid, centroid value
    = CAST(su AS DOUBLE) / 1e12 / n, empty clusters keep their previous
    centroid.
    """
    return f"""
    a{j} AS (
      SELECT vec_id, emb, cid, d,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
      FROM (
        SELECT e.vec_id, e.emb, c.cid,
               list_sum(list_transform(generate_series(1, len(e.emb)), i ->
                 CAST(floor((CAST(e.emb[i] AS DOUBLE) - c.c[i])
                            * (CAST(e.emb[i] AS DOUBLE) - c.c[i]) * 1e12) AS BIGINT))) AS d
        FROM e CROSS JOIN c{j - 1} c
      )
    ), asn{j} AS (
      SELECT vec_id, emb, cid AS cluster FROM a{j} WHERE rn = 1
    ), u{j} AS (
      SELECT cluster, i.i AS pos,
             SUM(CAST(floor(CAST(emb[i.i] AS DOUBLE) * 1e12) AS BIGINT)) AS su,
             COUNT(*) AS n
      FROM asn{j} CROSS JOIN (SELECT UNNEST(generate_series(1, 64)) AS i) i
      GROUP BY cluster, i.i
    ), c{j} AS (
      SELECT c_prev.cid, COALESCE(nc.c, c_prev.c) AS c
      FROM c{j - 1} c_prev LEFT JOIN (
        SELECT cluster AS cid, list(CAST(su AS DOUBLE) / 1e12 / n ORDER BY pos) AS c
        FROM u{j} GROUP BY cluster
      ) nc ON nc.cid = c_prev.cid
    )"""


_KMEANS_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, embedding AS emb FROM embeddings
    ), c0 AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
             list_transform(emb, x -> CAST(x AS DOUBLE)) AS c
      FROM e ORDER BY vec_id LIMIT 8
    ), {_kmeans_iter_sql(1)}, {_kmeans_iter_sql(2)}, {_kmeans_iter_sql(3)},
    afinal AS (
      SELECT vec_id, cid, d,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
      FROM (
        SELECT e.vec_id, c.cid,
               list_sum(list_transform(generate_series(1, len(e.emb)), i ->
                 CAST(floor((CAST(e.emb[i] AS DOUBLE) - c.c[i])
                            * (CAST(e.emb[i] AS DOUBLE) - c.c[i]) * 1e12) AS BIGINT))) AS d
        FROM e CROSS JOIN c3 c
      )
    )
    SELECT CAST(cid AS INT) AS cluster, COUNT(*) AS n_members,
           MIN(vec_id) AS exemplar_id
    FROM afinal WHERE rn = 1 GROUP BY cid
"""


@register(
    "sim_kmeans_lloyd",
    oracle=_KMEANS_ORACLE,
    doc="Lloyd's k-means over the embedding column "
    "(operators/kmeans.py): deterministic smallest-id init, 3 fixed "
    "iterations, k=8. Centroids are driver-side literals (implicit "
    "broadcast, the MLlib strategy); assignment is a narrow shuffle-"
    "free map (zip_with/aggregate distances, argmin via array_min on "
    "(dist, cid) structs); the update is one map-side-combinable "
    "groupBy of floor-e12 integer units — bit-deterministic across "
    "partitionings. Returns per-cluster size + exemplar.",
    tags=("similarity", "llm", "iterative"),
)
def sim_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.operators.kmeans import kmeans_fit_assign

    # persist: the fit's per-iteration actions otherwise re-scan AND
    # re-shuffle (fanout is a repartition) the corpus every pass;
    # width 8 keeps per-task scheduling overhead off the tiny table
    e = fanout(load(spark, sf_dir, "embeddings"), 8).persist()
    try:
        assign = kmeans_fit_assign(e, "embedding", "vec_id", k=8, n_iter=3)
    finally:
        # release the cache once the iterative fit's driver actions are
        # done — a leaked entry per invocation starves the block
        # manager in long sessions; the returned single-pass plan
        # re-reads the bounded table once instead
        e.unpersist(False)
    return assign.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("vec_id").alias("exemplar_id"),
    )


@register(
    "emb_centroid_label",
    oracle="""
    SELECT label, i - 1 AS pos, COUNT(*) AS n,
           CAST(SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e12) AS BIGINT)) AS DOUBLE)
             / 1e12 / COUNT(*) AS centroid
    FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
    GROUP BY label, i
    """,
    doc="Per-label embedding centroids (the k-means update step / class "
    "prototypes for embedding-space dedup and clustering): posexplode "
    "the vector, group by (label, dimension), exact floor-e12 integer-"
    "unit mean (float->double widening and IEEE multiply are bit-"
    "identical across engines; bigint partial sums are map-side "
    "combinable). One shuffle of labels x dims rows regardless of "
    "corpus size — the 100 TB centroid plan.",
    tags=("similarity", "llm", "agg"),
)
def emb_centroid_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = fanout(load(spark, sf_dir, "embeddings"))
    x = e.select("label", F.posexplode("embedding").alias("pos", "x"))
    units = F.floor(F.col("x").cast("double") * 1e12).cast("bigint")
    return x.groupBy("label", "pos").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(units).cast("double") / 1e12 / F.count(F.lit(1))).alias("centroid"),
    )


@register(
    "mm_image_resize",
    oracle="""
    SELECT doc_id AS asset_id,
           64 + (ord(substr(text, 1, 1)) % 128) * 3 AS w,
           64 + (ord(substr(text, 3, 1)) % 128) * 2 AS h,
           CAST(floor((64 + (ord(substr(text, 1, 1)) % 128) * 3)
                * CASE WHEN greatest(64 + (ord(substr(text, 1, 1)) % 128) * 3,
                                     64 + (ord(substr(text, 3, 1)) % 128) * 2) > 128
                       THEN 128.0 / greatest(64 + (ord(substr(text, 1, 1)) % 128) * 3,
                                             64 + (ord(substr(text, 3, 1)) % 128) * 2)
                       ELSE 1.0 END) AS INT) AS out_w,
           CAST(floor((64 + (ord(substr(text, 3, 1)) % 128) * 2)
                * CASE WHEN greatest(64 + (ord(substr(text, 1, 1)) % 128) * 3,
                                     64 + (ord(substr(text, 3, 1)) % 128) * 2) > 128
                       THEN 128.0 / greatest(64 + (ord(substr(text, 1, 1)) % 128) * 3,
                                             64 + (ord(substr(text, 3, 1)) % 128) * 2)
                       ELSE 1.0 END) AS INT) AS out_h
    FROM documents WHERE doc_id < 200
    """,
    doc="Image resize pipeline over a binary column: documents.text "
    "encoded to binary payloads (the multimodal column), header parse "
    "(width/height from the leading payload bytes — the stand-in for a "
    "real image header decode) runs in Python over Arrow batches via "
    "mapInPandas; the resize-to-fit geometry (scale to max side 128, "
    "aspect preserved) is JVM-side codegen'd math. The oracle recomputes "
    "the identical bytes via ord(substr(text,...)), proving the binary "
    "round-trip is faithful. Swapping the header stub for PIL changes "
    "NOTHING outside the mapInPandas body.",
    tags=("multimodal", "udf"),
)
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    assets = d.select(
        F.col("doc_id").alias("asset_id"), F.encode("text", "UTF-8").alias("payload")
    )

    def parse_header(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    # stand-in for an image header decode: dims from the
                    # leading payload bytes (deterministic, oracle-able)
                    "w": [64 + (bytes(p)[0] % 128) * 3 for p in payloads],
                    "h": [64 + (bytes(p)[2] % 128) * 2 for p in payloads],
                }
            )

    dims = assets.mapInPandas(parse_header, "asset_id BIGINT, w INT, h INT")
    scale = F.when(
        F.greatest("w", "h") > 128, F.lit(128.0) / F.greatest("w", "h")
    ).otherwise(F.lit(1.0))
    return dims.select(
        "asset_id",
        "w",
        "h",
        F.floor(F.col("w") * scale).cast("int").alias("out_w"),
        F.floor(F.col("h") * scale).cast("int").alias("out_h"),
    )


@register(
    "mm_audio_decode",
    oracle="""
    WITH clips AS (SELECT UNNEST(generate_series(0, 31)) AS clip_id),
    samples AS (
      SELECT clip_id, ((clip_id * 7919 + t.i * 31) % 2003) - 1001 AS s
      FROM clips, UNNEST(generate_series(0, 255 + 16 * clip_id)) AS t(i)
    )
    SELECT clip_id, 8000 AS sample_rate, 1 AS n_channels,
           COUNT(*) AS n_samples,
           CAST(SUM(s) AS BIGINT) AS sum_amp,
           CAST(MIN(s) AS INT) AS min_amp,
           CAST(MAX(s) AS INT) AS max_amp
    FROM samples GROUP BY clip_id
    """,
    doc="REAL audio decode over a binary column: 32 deterministic PCM16 "
    "WAV clips (sample i of clip c = ((c*7919 + i*31) % 2003) - 1001) "
    "are synthesized as genuine RIFF/WAVE bytes, then parsed BACK from "
    "the binary — header fields and PCM frames — with stdlib wave/"
    "struct inside Arrow-batched mapInPandas "
    "(operators/multimodal.py::decode_wav). The oracle recomputes the "
    "stats from the generative formula, so a single corrupted byte in "
    "synthesis, transport, or decode breaks the hash. The video member "
    "of the triad is mm_frame_sample (real RIFF/AVI container walk).",
    tags=("multimodal", "udf"),
)
def mm_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    import io
    import struct
    import wave

    from binance_etl_spark.operators.multimodal import decode_wav

    def make_wav(c: int) -> bytearray:
        n = 256 + 16 * c
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(
                struct.pack(
                    f"<{n}h", *[((c * 7919 + i * 31) % 2003) - 1001 for i in range(n)]
                )
            )
        return bytearray(buf.getvalue())

    clips = spark.createDataFrame(
        [(c, make_wav(c)) for c in range(32)], "clip_id BIGINT, payload BINARY"
    )
    return decode_wav(clips)


@register(
    "mm_image_decode",
    oracle="""
    WITH imgs AS (SELECT UNNEST(generate_series(0, 23)) AS img_id),
    px AS (
      SELECT img_id, x.x AS x, y.y AS y
      FROM imgs,
           UNNEST(generate_series(0, 16)) AS x(x),
           UNNEST(generate_series(0, 7 + (img_id % 5))) AS y(y)
    )
    SELECT img_id, 17 AS width, CAST(8 + (img_id % 5) AS INT) AS height,
           CAST(SUM((img_id * 31 + x * 7 + y * 13) % 256) AS BIGINT) AS sum_b,
           CAST(SUM((img_id * 17 + x * 5 + y * 11) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((img_id * 23 + x * 3 + y * 19) % 256) AS BIGINT) AS sum_r
    FROM px GROUP BY img_id
    """,
    doc="REAL image decode over a binary column: 24 deterministic "
    "24-bit BMPs (pixel (x,y) of image i has B/G/R = linear formulas "
    "mod 256; width 17 exercises the 4-byte row padding, bottom-up row "
    "storage exercised by construction) are synthesized as genuine BMP "
    "bytes and parsed BACK — file header, info header, padded "
    "bottom-up pixel array — with stdlib struct inside mapInPandas "
    "(operators/multimodal.py::decode_bmp). Oracle recomputes the "
    "channel sums from the generative formula; any byte-layout error "
    "in synthesis or decode breaks the hash.",
    tags=("multimodal", "udf"),
)
def mm_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    import struct

    from binance_etl_spark.operators.multimodal import decode_bmp

    def make_bmp(img: int) -> bytearray:
        w, h = 17, 8 + (img % 5)
        row_size = (w * 3 + 3) // 4 * 4
        pixels = bytearray()
        for y in range(h - 1, -1, -1):  # BMP rows are stored bottom-up
            row = bytearray()
            for x in range(w):
                row += bytes(
                    [
                        (img * 31 + x * 7 + y * 13) % 256,
                        (img * 17 + x * 5 + y * 11) % 256,
                        (img * 23 + x * 3 + y * 19) % 256,
                    ]
                )
            row += b"\x00" * (row_size - len(row))
            pixels += row
        data_size = row_size * h
        header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0
        )
        return bytearray(header + info + pixels)

    imgs = spark.createDataFrame(
        [(i, make_bmp(i)) for i in range(24)], "img_id BIGINT, payload BINARY"
    )
    return decode_bmp(imgs)


_CUR_SH = (
    "list_distinct(list_transform(generate_series(1, len(t) - 2), "
    "i -> concat_ws(' ', t[i], t[i+1], t[i+2])))"
)
_CUR_JACC = (
    "CAST(len(list_filter(a.s, x -> list_contains(b.s, x))) AS DOUBLE)"
    " / (len(a.s) + len(b.s) - len(list_filter(a.s, x -> list_contains(b.s, x))))"
)
_CUR_HV = (
    "((instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16"
    " + instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)"
)


@register(
    "curate_corpus_e2e",
    oracle=f"""
    WITH toks AS (SELECT doc_id, source, text, string_split(text, ' ') AS t
                  FROM documents),
    q AS (SELECT * FROM toks
          WHERE len(t) >= 20
            AND CAST(len(list_distinct(t)) AS DOUBLE) / len(t) >= 0.5),
    ex AS (SELECT * FROM (
             SELECT *, row_number() OVER (PARTITION BY md5(text)
                                          ORDER BY doc_id) AS rn FROM q)
           WHERE rn = 1),
    sh AS (SELECT doc_id, source, {_CUR_SH} AS s FROM ex),
    shm AS (SELECT *, list_aggregate(list_transform(s, x -> md5(x)), 'min') AS msh
            FROM sh),
    drops AS (SELECT DISTINCT b.doc_id
              FROM shm a JOIN shm b ON a.msh = b.msh AND a.doc_id < b.doc_id
              WHERE {_CUR_JACC} >= 0.8),
    kept AS (SELECT * FROM shm
             WHERE doc_id NOT IN (SELECT doc_id FROM drops)),
    sampled AS (SELECT * FROM kept
                WHERE {_CUR_HV} % 100 <
                      CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                           THEN 60 ELSE 25 END)
    SELECT source, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc_id
    FROM sampled GROUP BY source
    """,
    doc="END-TO-END corpus curation recipe — the composition the "
    "individual LLM ops exist for, as ONE oracle-checked plan: "
    "(1) quality gate (>=20 tokens, distinct-token ratio >= 0.5); "
    "(2) exact dedup (md5 content hash, keep smallest doc_id); "
    "(3) near-dup removal (3-token shingles, min-md5-shingle blocking, "
    "exact Jaccard >= 0.8, drop the larger id — left_anti join); "
    "(4) per-domain weighted sampling (deterministic md5-byte hash). "
    "Every stage is codegen'd built-ins; the chain is ONE Catalyst "
    "plan — filters fuse into the scan, the anti-join sees only the "
    "already-filtered survivors, and nothing materializes in between. "
    "At 100 TB each stage keeps its individual op's scale shape "
    "(map-side filters, O(docs x blocks) candidate join).",
    tags=("llm", "dedup", "sampling", "pipeline"),
)
def curate_corpus_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.operators import dedup as D

    d = fanout(load(spark, sf_dir, "documents"))
    toks = F.split("text", " ")
    q = d.select("doc_id", "source", "text", toks.alias("t")).where(
        (F.size("t") >= 20)
        & (F.size(F.array_distinct("t")).cast("double") / F.size("t") >= 0.5)
    )
    w_ex = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    ex = q.withColumn("rn", F.row_number().over(w_ex)).where(F.col("rn") == 1)
    shm = ex.select(
        "doc_id",
        "source",
        D.shingles(F.col("text")).alias("s"),
    ).withColumn("msh", F.array_min(F.transform("s", F.md5))).localCheckpoint(eager=True)

    a = shm.select(
        F.col("doc_id").alias("a_id"), F.col("s").alias("a_s"), "msh"
    )
    b = shm.select(
        F.col("doc_id").alias("b_id"), F.col("s").alias("b_s"), "msh"
    )
    drops = (
        a.join(b, "msh")
        .where(
            (F.col("a_id") < F.col("b_id"))
            & (D.jaccard(F.col("a_s"), F.col("b_s")) >= 0.8)
        )
        .select(F.col("b_id").alias("doc_id"))
        .distinct()
    )
    kept = shm.join(drops, "doc_id", "left_anti")
    hv = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2), 16, 10
    ).cast("int")
    rate = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 0, F.lit(60)
    ).otherwise(F.lit(25))
    sampled = kept.where((hv % 100) < rate)
    return sampled.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id")
    )
