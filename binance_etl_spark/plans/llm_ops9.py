"""Tenth LLM-pipeline batch: multimodal perceptual-hash dedup.

mm_phash_dedup composes the three multimodal stories into one
pipeline: REAL binary decode (genuine BMP bytes parsed in
mapInPandas), a perceptual average-hash sketch (64 block-vs-mean
bits), and banded LSH pairing (four 16-bit bands, equi-join, hamming
verify) — the image near-dup path of a multimodal training corpus,
with the exact same banding scale shape as MinHash-LSH for text.

The 40-image fixture is generative (pixel (x, y) of image i has
B/G/R = linear formulas mod 256), with every img_id % 8 == 5 a
near-duplicate of its predecessor (two pixels perturbed by +3 per
channel) — known positives at hamming <= a few bits. The DuckDB
oracle re-derives every stage from the formula: any byte-layout error
in BMP synthesis or decode, any off-by-one in the block/bit/band
math, breaks parity.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_spark.operators.multimodal import ahash_blocks_bmp
from binance_etl_spark.plans.registry import register

_N_IMG = 40
_HAM_MAX = 6

# B/G/R generative formulas (shared with mm_image_decode's style):
# channel c of pixel (x, y) in effective image e.
_CH = ((31, 7, 13), (17, 5, 11), (23, 3, 19))


def _pix(e: int, x: int, y: int, perturb: bool) -> tuple[int, int, int]:
    vals = [(e * a + x * b + y * c) % 256 for a, b, c in _CH]
    if perturb:
        vals = [(v + 3) % 256 for v in vals]
    return tuple(vals)


def _make_bmp(img: int) -> bytearray:
    w = h = 16
    e = img - 1 if img % 8 == 5 else img
    pixels = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up rows; width 16 -> no padding
        for x in range(w):
            perturb = img % 8 == 5 and ((x, y) in ((0, 0), (7, 7)))
            pixels += bytes(_pix(e, x, y, perturb))
    data_size = w * 3 * h
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    return bytearray(header + info + pixels)


_SQL_GRAY = " + ".join(
    f"(e * {a} + x * {b} + y * {c}) % 256" for a, b, c in _CH
)
_SQL_GRAY_P = " + ".join(
    f"((e * {a} + x * {b} + y * {c}) % 256 + 3) % 256" for a, b, c in _CH
)


@register(
    "mm_phash_dedup",
    oracle=f"""
    WITH imgs AS (SELECT UNNEST(generate_series(0, {_N_IMG - 1})) AS img_id),
    eff AS (
      SELECT img_id,
             CASE WHEN img_id % 8 = 5 THEN img_id - 1 ELSE img_id END AS e
      FROM imgs
    ), px AS (
      SELECT img_id, e, x.x AS x, y.y AS y
      FROM eff, UNNEST(generate_series(0, 15)) AS x(x),
                UNNEST(generate_series(0, 15)) AS y(y)
    ), g AS (
      SELECT img_id, x, y,
             (CASE WHEN img_id % 8 = 5 AND ((x = 0 AND y = 0) OR (x = 7 AND y = 7))
                   THEN {_SQL_GRAY_P}
                   ELSE {_SQL_GRAY} END) // 3 AS gray
      FROM px
    ), blk AS (
      SELECT img_id, x // 2 AS bx, y // 2 AS by, SUM(gray) // 4 AS bv
      FROM g GROUP BY img_id, x // 2, y // 2
    ), mean AS (
      SELECT img_id, SUM(bv) // 64 AS m FROM blk GROUP BY img_id
    ), bits AS (
      SELECT img_id, (by * 8 + bx) AS idx,
             CASE WHEN bv > m THEN 1 ELSE 0 END AS bit
      FROM blk JOIN mean USING (img_id)
    ), bands AS (
      SELECT img_id, idx // 16 AS band_no,
             CAST(SUM(bit * (1 << (idx % 16))) AS BIGINT) AS band_v
      FROM bits GROUP BY img_id, idx // 16
    ), shared AS (
      SELECT a.img_id AS a_id, b.img_id AS b_id,
             CAST(COUNT(*) AS BIGINT) AS n_shared_bands
      FROM bands a JOIN bands b
        ON a.band_no = b.band_no AND a.band_v = b.band_v AND a.img_id < b.img_id
      GROUP BY a.img_id, b.img_id
    )
    SELECT s.a_id, s.b_id, s.n_shared_bands,
           (SELECT CAST(SUM(bit_count(xor(ba.band_v, bb.band_v))) AS BIGINT)
            FROM bands ba JOIN bands bb ON ba.band_no = bb.band_no
            WHERE ba.img_id = s.a_id AND bb.img_id = s.b_id) AS hamming
    FROM shared s
    WHERE (SELECT SUM(bit_count(xor(ba.band_v, bb.band_v)))
           FROM bands ba JOIN bands bb ON ba.band_no = bb.band_no
           WHERE ba.img_id = s.a_id AND bb.img_id = s.b_id) <= {_HAM_MAX}
    """,
    doc="Multimodal NEAR-DUP dedup via perceptual average-hash: "
    "genuine BMP bytes decoded in mapInPandas (real header + "
    "bottom-up pixel parsing), 64 block-vs-mean hash bits computed "
    "JVM-side from the decoded blocks, split into four 16-bit bands, "
    "candidate pairs from a band equi-join (identical scale shape to "
    f"MinHash-LSH — never all-pairs), hamming <= {_HAM_MAX} verify on "
    "candidates only. Fixture injects perturbed-copy images "
    "(img_id %% 8 == 5) as known positives; the oracle re-derives "
    "decode + hash + banding from the generative pixel formula.",
    tags=("multimodal", "dedup", "udf"),
)
def mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    imgs = spark.createDataFrame(
        [(i, _make_bmp(i)) for i in range(_N_IMG)], "img_id BIGINT, payload BINARY"
    )
    blocks = ahash_blocks_bmp(imgs)
    # hash bits -> four 16-bit band values, all JVM-side array math
    bands4 = F.expr(
        "transform(sequence(0, 3), b -> aggregate(sequence(0, 15), CAST(0 AS BIGINT), "
        "(acc, j) -> acc + IF(element_at(blocks, b * 16 + j + 1) > "
        "aggregate(blocks, CAST(0 AS BIGINT), (a, v) -> a + v) div 64, "
        "shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT))))"
    )
    e = blocks.select("img_id", bands4.alias("bands"))
    ex = e.select(
        "img_id", "bands", F.posexplode("bands").alias("band_no", "band_v")
    )
    a = ex.select(
        F.col("img_id").alias("a_id"),
        F.col("bands").alias("a_bands"),
        "band_no",
        "band_v",
    )
    b = ex.select(
        F.col("img_id").alias("b_id"),
        F.col("bands").alias("b_bands"),
        "band_no",
        "band_v",
    )
    pairs = (
        a.join(b, ["band_no", "band_v"])
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(
            F.count("*").cast("bigint").alias("n_shared_bands"),
            F.first("a_bands").alias("a_bands"),
            F.first("b_bands").alias("b_bands"),
        )
    )
    hamming = F.expr(
        "aggregate(sequence(0, 3), CAST(0 AS BIGINT), (acc, i) -> acc + "
        "bit_count(element_at(a_bands, i + 1) ^ element_at(b_bands, i + 1)))"
    )
    return (
        pairs.withColumn("hamming", hamming.cast("bigint"))
        .where(F.col("hamming") <= _HAM_MAX)
        .select("a_id", "b_id", "n_shared_bands", "hamming")
    )


# --- text_lm_bigram_score --------------------------------------------


@register(
    "text_lm_bigram_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), bg AS (
      SELECT doc_id, UNNEST(list_transform(generate_series(1, len(t) - 1),
                                           i -> t[i] || ' ' || t[i+1])) AS bigram
      FROM toks WHERE len(t) >= 2
    ), bgc AS (
      SELECT bigram, COUNT(*) AS n_bg FROM bg GROUP BY bigram
    ), pfx AS (
      SELECT string_split(bigram, ' ')[1] AS w1, SUM(n_bg) AS n_pfx
      FROM bgc GROUP BY string_split(bigram, ' ')[1]
    )
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(c.n_bg * 1000000 // p.n_pfx) AS BIGINT) // COUNT(*)
             AS mean_cond_p_e6,
           CAST(SUM(CASE WHEN c.n_bg <= 1 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS hapax_bigram_ppm
    FROM bg b JOIN bgc c USING (bigram)
    JOIN pfx p ON p.w1 = string_split(b.bigram, ' ')[1]
    GROUP BY b.doc_id
    """,
    doc="Bigram language-model document scoring: conditional "
    "probability p(w2 | w1) = count(w1 w2) / count(w1 ·) in exact e6 "
    "fixed point (integer div — no log(), whose libm rounding differs "
    "across engines; probability order equals log-prob order for "
    "filtering), averaged per doc, plus the hapax-bigram rate (the "
    "fluency/novelty split unigram frequency cannot see). Three "
    "map-side-combinable count shuffles + equi-joins back onto the "
    "bigram stream; the bigram table is Zipf-small next to the "
    "corpus, so AQE broadcasts the join-backs at scale.",
    tags=("text", "llm", "quality"),
)
def text_lm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.catalog import fanout, load
    from binance_etl_spark.operators.dedup import tokenize

    d = fanout(load(spark, sf_dir, "documents"))
    toks = tokenize(F.col("text"))
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1)
        ),
    )
    bg = d.where(F.size(toks) >= 2).select(
        "doc_id", F.explode(bigrams).alias("bigram")
    )
    bgc = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("n_bg"))
    w1 = F.split(F.col("bigram"), " ").getItem(0)
    pfx = bgc.groupBy(w1.alias("w1")).agg(F.sum("n_bg").alias("n_pfx"))
    joined = (
        bg.join(bgc, "bigram")
        .withColumn("w1", w1)
        .join(pfx, "w1")
        .withColumn("p_e6", F.expr("n_bg * 1000000 div n_pfx"))
    )
    n = F.count(F.lit(1))
    return joined.groupBy("doc_id").agg(
        n.cast("bigint").alias("n_bigrams"),
        F.expr("CAST(SUM(p_e6) AS BIGINT) div COUNT(1)").alias("mean_cond_p_e6"),
        F.expr(
            "CAST(SUM(CASE WHEN n_bg <= 1 THEN 1 ELSE 0 END) * 1000000"
            " div COUNT(1) AS BIGINT)"
        ).alias("hapax_bigram_ppm"),
    )


# --- ft_hash_features ------------------------------------------------

_FH_DIM = 64


@register(
    "ft_hash_features",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ), hashed AS (
      SELECT doc_id,
             ((instr('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16
              + instr('0123456789abcdef', substr(md5(tok), 2, 1)) - 1)
               % {_FH_DIM} AS idx
      FROM tok WHERE tok <> ''
    )
    SELECT doc_id, CAST(idx AS BIGINT) AS idx, CAST(COUNT(*) AS BIGINT) AS v,
           CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS nnz
    FROM hashed GROUP BY doc_id, idx
    """,
    doc=f"HASHING-TRICK featurization (the classical-ML quality-"
    "classifier front end): every token maps to one of "
    f"{_FH_DIM} feature indices via its first md5 byte — no vocabulary "
    "table, no fit step, stateless and identical on any shard, which "
    "is WHY the hashing trick scales (a vocab join needs a corpus "
    "pass first; the hash needs nothing). Output is the sparse "
    "(doc, idx, count) triple form plus the per-doc nnz; one explode "
    "+ one map-side-combinable count shuffle.",
    tags=("llm", "features"),
)
def ft_hash_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.catalog import fanout, load

    d = fanout(load(spark, sf_dir, "documents"))
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok")).where(
        F.col("tok") != ""
    )
    first_byte = (
        (F.expr("instr('0123456789abcdef', substr(md5(tok), 1, 1))") - 1) * 16
        + F.expr("instr('0123456789abcdef', substr(md5(tok), 2, 1))")
        - 1
    )
    hashed = tok.select("doc_id", (first_byte % _FH_DIM).cast("bigint").alias("idx"))
    counts = hashed.groupBy("doc_id", "idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("v")
    )
    from pyspark.sql.window import Window as W

    return counts.select(
        "doc_id",
        "idx",
        "v",
        F.count(F.lit(1)).over(W.partitionBy("doc_id")).cast("bigint").alias("nnz"),
    )


# --- mm_audio_fingerprint_dedup --------------------------------------

_N_CLIP = 32
_AFP_SAMPLES = 260  # 65 blocks of 4 -> 64 energy-delta bits
_AFP_HAM_MAX = 6


def _sample(e: int, t: int, perturb: bool) -> int:
    v = ((e * 13 + t * 7) % 199) - 99
    return v + 5 if perturb else v


def _make_wav(clip: int) -> bytes:
    import io
    import struct
    import wave

    e = clip - 1 if clip % 8 == 5 else clip
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        frames = b"".join(
            struct.pack(
                "<h", _sample(e, t, clip % 8 == 5 and t < 4)
            )
            for t in range(_AFP_SAMPLES)
        )
        w.writeframes(frames)
    return buf.getvalue()


@register(
    "mm_audio_fingerprint_dedup",
    oracle=f"""
    WITH clips AS (SELECT UNNEST(generate_series(0, {_N_CLIP - 1})) AS clip_id),
    eff AS (
      SELECT clip_id,
             CASE WHEN clip_id % 8 = 5 THEN clip_id - 1 ELSE clip_id END AS e
      FROM clips
    ), smp AS (
      SELECT clip_id, e, t.t AS t,
             abs(((e * 13 + t.t * 7) % 199) - 99
                 + CASE WHEN clip_id % 8 = 5 AND t.t < 4 THEN 5 ELSE 0 END) AS a
      FROM eff, UNNEST(generate_series(0, {_AFP_SAMPLES - 1})) AS t(t)
    ), blk AS (
      SELECT clip_id, t // 4 AS b, SUM(a) AS eng
      FROM smp GROUP BY clip_id, t // 4
    ), bits AS (
      SELECT cur.clip_id, cur.b - 1 AS idx,
             CASE WHEN cur.eng > prv.eng THEN 1 ELSE 0 END AS bit
      FROM blk cur JOIN blk prv
        ON cur.clip_id = prv.clip_id AND cur.b = prv.b + 1
    ), bands AS (
      SELECT clip_id, idx // 16 AS band_no,
             CAST(SUM(bit * (1 << (idx % 16))) AS BIGINT) AS band_v
      FROM bits GROUP BY clip_id, idx // 16
    ), shared AS (
      SELECT a.clip_id AS a_id, b.clip_id AS b_id,
             CAST(COUNT(*) AS BIGINT) AS n_shared_bands
      FROM bands a JOIN bands b
        ON a.band_no = b.band_no AND a.band_v = b.band_v AND a.clip_id < b.clip_id
      GROUP BY a.clip_id, b.clip_id
    )
    SELECT s.a_id, s.b_id, s.n_shared_bands,
           (SELECT CAST(SUM(bit_count(xor(ba.band_v, bb.band_v))) AS BIGINT)
            FROM bands ba JOIN bands bb ON ba.band_no = bb.band_no
            WHERE ba.clip_id = s.a_id AND bb.clip_id = s.b_id) AS hamming
    FROM shared s
    WHERE (SELECT SUM(bit_count(xor(ba.band_v, bb.band_v)))
           FROM bands ba JOIN bands bb ON ba.band_no = bb.band_no
           WHERE ba.clip_id = s.a_id AND bb.clip_id = s.b_id) <= {_AFP_HAM_MAX}
    """,
    doc="AUDIO near-dup dedup via a Haitsma-Kalker-style fingerprint: "
    "genuine PCM16 WAV bytes decoded in mapInPandas (real RIFF "
    "parsing), 64 sign-of-energy-delta bits (consecutive 4-sample "
    "block energies) computed JVM-side, four 16-bit bands, candidate "
    f"pairs via band equi-join, hamming <= {_AFP_HAM_MAX} verify on "
    "candidates only — the audio member of the text/image/audio "
    "near-dup triad (minhash-LSH / phash / this), all sharing the "
    "banded-blocking scale shape. Perturbed-copy clips "
    "(clip_id %% 8 == 5) are known positives; the oracle re-derives "
    "decode + energies + bits from the generative sample formula.",
    tags=("multimodal", "dedup", "udf"),
)
def mm_audio_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.operators.multimodal import fingerprint_wav_energies

    clips = spark.createDataFrame(
        [(i, _make_wav(i)) for i in range(_N_CLIP)], "clip_id BIGINT, payload BINARY"
    )
    eng = fingerprint_wav_energies(clips)
    bands4 = F.expr(
        "transform(sequence(0, 3), b -> aggregate(sequence(0, 15), CAST(0 AS BIGINT), "
        "(acc, j) -> acc + IF(element_at(energies, b * 16 + j + 2) > "
        "element_at(energies, b * 16 + j + 1), "
        "shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT))))"
    )
    e = eng.select(F.col("clip_id").alias("img_id"), bands4.alias("bands"))
    ex = e.select("img_id", "bands", F.posexplode("bands").alias("band_no", "band_v"))
    a = ex.select(
        F.col("img_id").alias("a_id"), F.col("bands").alias("a_bands"),
        "band_no", "band_v",
    )
    b = ex.select(
        F.col("img_id").alias("b_id"), F.col("bands").alias("b_bands"),
        "band_no", "band_v",
    )
    pairs = (
        a.join(b, ["band_no", "band_v"])
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(
            F.count("*").cast("bigint").alias("n_shared_bands"),
            F.first("a_bands").alias("a_bands"),
            F.first("b_bands").alias("b_bands"),
        )
    )
    hamming = F.expr(
        "aggregate(sequence(0, 3), CAST(0 AS BIGINT), (acc, i) -> acc + "
        "bit_count(element_at(a_bands, i + 1) ^ element_at(b_bands, i + 1)))"
    )
    return (
        pairs.withColumn("hamming", hamming.cast("bigint"))
        .where(F.col("hamming") <= _AFP_HAM_MAX)
        .select("a_id", "b_id", "n_shared_bands", "hamming")
    )


# --- mm_image_resize_px ----------------------------------------------


@register(
    "mm_image_resize_px",
    oracle=f"""
    WITH imgs AS (SELECT UNNEST(generate_series(0, {_N_IMG - 1})) AS img_id),
    eff AS (
      SELECT img_id,
             CASE WHEN img_id % 8 = 5 THEN img_id - 1 ELSE img_id END AS e
      FROM imgs
    ), o AS (
      SELECT img_id, e, oy.oy AS oy, ox.ox AS ox
      FROM eff, UNNEST(generate_series(0, 3)) AS oy(oy),
                UNNEST(generate_series(0, 3)) AS ox(ox)
    )
    SELECT img_id, oy, ox,
           (e * {_CH[2][0]} + (ox * 4) * {_CH[2][1]} + (15 - oy * 4) * {_CH[2][2]}) % 256 AS r,
           (e * {_CH[1][0]} + (ox * 4) * {_CH[1][1]} + (15 - oy * 4) * {_CH[1][2]}) % 256 AS g,
           (e * {_CH[0][0]} + (ox * 4) * {_CH[0][1]} + (15 - oy * 4) * {_CH[0][2]}) % 256 AS b
    FROM o
    """,
    doc="REAL pixel-level image resize (completes the decode / "
    "feature-extract / RESIZE / frame-sample multimodal quartet with "
    "actual pixel math): genuine BMP payloads are decoded in "
    "Arrow-batched mapInPandas (header offset + bottom-up BGR rows "
    "via numpy frombuffer/reshape/flip), then nearest-neighbor "
    "downsampled 16x16 -> 4x4 by strided slicing, emitting every "
    "output pixel's RGB. The oracle recomputes the sampled "
    "coordinates from the generative pixel formula (output row oy "
    "samples source y = 15 - 4*oy: BMP's bottom-up row order IS the "
    "verified mapping, as is the BGR->RGB byte swap). Perturbed-copy "
    "pixels are never on the sample "
    "grid, so effective-image equality is also exercised. Scale "
    "shape: one Python stage, O(pixels) per image, no shuffle at "
    "all until a consumer aggregates.",
    tags=("multimodal", "udf"),
)
def mm_image_resize_px(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    imgs = spark.createDataFrame(
        [(i, _make_bmp(i)) for i in range(_N_IMG)], "img_id BIGINT, payload BINARY"
    ).repartition(8)

    def resize(it):
        import struct

        import numpy as np

        for pdf in it:
            out = {"img_id": [], "oy": [], "ox": [], "r": [], "g": [], "b": []}
            for img_id, payload in zip(pdf["img_id"], pdf["payload"]):
                buf = bytes(payload)
                off = struct.unpack_from("<I", buf, 10)[0]
                w, h = struct.unpack_from("<ii", buf, 18)
                # BMP rows are stored bottom-up: file row r carries
                # image row y = h-1-r (BGR byte order). The writer
                # emits y descending, so the raw reshape already has
                # row r = y = h-1-r — no flip needed for the formula
                # coordinates the oracle uses.
                arr = np.frombuffer(buf, np.uint8, w * h * 3, off).reshape(h, w, 3)
                small = arr[:: h // 4, :: w // 4][:4, :4]
                for oy in range(4):
                    for ox in range(4):
                        bb, gg, rr = (int(v) for v in small[oy, ox])
                        out["img_id"].append(int(img_id))
                        out["oy"].append(oy)
                        out["ox"].append(ox)
                        out["r"].append(rr)
                        out["g"].append(gg)
                        out["b"].append(bb)
            yield pd.DataFrame(out)

    return imgs.mapInPandas(
        resize,
        "img_id BIGINT, oy BIGINT, ox BIGINT, r BIGINT, g BIGINT, b BIGINT",
    )
