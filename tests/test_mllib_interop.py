"""MLlib interop: the library variants of the hand-rolled dedup path.

The engine's scale path is the hand-rolled banded minhash
(operators/dedup.py — oracle-checkable, every step a visible
DataFrame op). This pins that the MLlib estimator stack
(CountVectorizer -> MinHashLSH approxSimilarityJoin; HashingTF ->
IDF) interoperates on the same corpus, with the invariants that
matter for trusting a library LSH:

- candidates returned by approxSimilarityJoin carry EXACT distances
  (the approximation is recall, not precision);
- pairs with identical token sets (distance 0, identical signatures
  under every hash) are ALWAYS recalled;
- fixed seed => deterministic result set.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.ml.feature import CountVectorizer, HashingTF, IDF, MinHashLSH, Tokenizer

SF = "/root/testdata/sf0.01"
THRESH = 0.3  # max Jaccard DISTANCE (= min similarity 0.7)


def _vectorized_docs(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(300)
    tok = Tokenizer(inputCol="text", outputCol="words").transform(docs)
    cv = CountVectorizer(inputCol="words", outputCol="feat", binary=True).fit(tok)
    return cv.transform(tok).select("doc_id", "words", "feat")


def test_minhash_lsh_recalls_identical_docs_deterministically(spark):
    v = _vectorized_docs(spark)
    model = MinHashLSH(
        inputCol="feat", outputCol="hashes", numHashTables=3, seed=42
    ).fit(v)

    def pairs():
        j = model.approxSimilarityJoin(v, v, THRESH, distCol="jdist").where(
            "datasetA.doc_id < datasetB.doc_id"
        )
        return {
            (r["datasetA"]["doc_id"], r["datasetB"]["doc_id"], round(r["jdist"], 9))
            for r in j.collect()
        }

    got = pairs()
    # precision: every returned pair's distance is exact and under the cap
    assert all(d <= THRESH for (_, _, d) in got)
    # recall floor: identical token SETS (distance 0) are always found
    sets = v.select(
        "doc_id", F.array_sort(F.array_distinct("words")).alias("ws")
    )
    a, b = sets.alias("a"), sets.alias("b")
    dup_pairs = {
        (r["aid"], r["bid"])
        for r in a.join(b, F.col("a.ws") == F.col("b.ws"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("aid"), F.col("b.doc_id").alias("bid"))
        .collect()
    }
    found = {(x, y) for (x, y, _) in got}
    assert dup_pairs <= found
    assert len(dup_pairs) > 0, "corpus should contain exact-dup token sets"
    # determinism under a fixed seed
    assert pairs() == got


def test_hashing_tf_idf_pipeline_shapes(spark):
    v = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
    tok = Tokenizer(inputCol="text", outputCol="words").transform(v)
    tf = HashingTF(inputCol="words", outputCol="tf", numFeatures=1024).transform(tok)
    out = IDF(inputCol="tf", outputCol="tfidf").fit(tf).transform(tf)
    rows = out.select("doc_id", "tfidf").collect()
    assert len(rows) == 200
    assert all(r["tfidf"].size == 1024 for r in rows)
    assert all(r["tfidf"].numNonzeros() > 0 for r in rows)
