"""Declarative data-quality expectations — the audit gate every
production ingest runs between "landed" and "trusted" (the reference
trusts its websocket frames implicitly; binance_etl/base.py:47-60
writes whatever parses — this suite is what a 100 TB lake puts in
front of that firehose; same shape as Deequ constraint suites and
Delta Live Tables expectations).

Two surfaces:
- dq_expectations — a constraint REPORT: one row per declared
  expectation (completeness, range, domain, warn-threshold, key
  uniqueness, referential integrity) with exact violation counts.
- dq_quarantine — the row-level SPLIT: every row that trips a
  row-level rule, with the comma-joined reason list (the DLT
  "expect_or_drop ... quarantine" pattern).

Scale posture: the report is ONE full scan with map-side-combinable
CASE-WHEN sums; key uniqueness adds one count-distinct exchange on
the composite key; referential integrity is a key-partitioned LEFT
ANTI join (broadcast-able when the dimension fits). The quarantine
is a pure filter+project (the trailing sort exists only for
deterministic oracle output). Nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_spark.catalog import load
from binance_etl_spark.plans.registry import register

# Row-level rule set shared by both surfaces: (name, violation predicate
# as a Column factory). Order fixes the reasons-string layout.
_HARD_RULES = [
    ("quantity_not_null", lambda: F.col("l_quantity").isNull()),
    (
        "quantity_in_range",
        lambda: F.col("l_quantity").isNull()
        | (F.col("l_quantity") < 1)
        | (F.col("l_quantity") > 50),
    ),
    (
        "discount_in_range",
        lambda: F.col("l_discount").isNull()
        | (F.col("l_discount") < 0)
        | (F.col("l_discount") > 0.1),
    ),
    (
        "returnflag_domain",
        lambda: F.col("l_returnflag").isNull()
        | ~F.col("l_returnflag").isin("A", "N", "R"),
    ),
    ("warn_high_discount", lambda: F.col("l_discount") > 0.05),
]


@register(
    "dq_expectations",
    oracle="""
    WITH m AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS v0,
             SUM(CASE WHEN l_quantity IS NULL OR l_quantity < 1
                       OR l_quantity > 50 THEN 1 ELSE 0 END) AS v1,
             SUM(CASE WHEN l_discount IS NULL OR l_discount < 0
                       OR l_discount > 0.1 THEN 1 ELSE 0 END) AS v2,
             SUM(CASE WHEN l_returnflag IS NULL
                       OR l_returnflag NOT IN ('A','N','R')
                  THEN 1 ELSE 0 END) AS v3,
             SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS v4,
             COUNT(*) - COUNT(DISTINCT concat(l_orderkey, '#', l_linenumber))
               AS v5
      FROM lineitem
    ), r AS (
      SELECT COUNT(*) AS v6 FROM lineitem
      WHERE l_orderkey IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_orderkey = lineitem.l_orderkey)
    ), rows_out AS (
      SELECT 'quantity_not_null' AS constraint_name, n AS n_rows,
             v0 AS violations FROM m
      UNION ALL SELECT 'quantity_in_range', n, v1 FROM m
      UNION ALL SELECT 'discount_in_range', n, v2 FROM m
      UNION ALL SELECT 'returnflag_domain', n, v3 FROM m
      UNION ALL SELECT 'warn_high_discount', n, v4 FROM m
      UNION ALL SELECT 'unique_line_key', n, v5 FROM m
      UNION ALL SELECT 'orderkey_references_orders', m.n, r.v6 FROM m, r
    )
    SELECT constraint_name, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(violations AS BIGINT) AS violations,
           violations = 0 AS passed,
           CAST(violations AS DOUBLE) / n_rows AS violation_rate
    FROM rows_out ORDER BY constraint_name
    """,
    doc="Declarative expectation suite over lineitem (Deequ/DLT "
    "shape): completeness, range, domain, warn-threshold, composite-"
    "key uniqueness, and referential integrity against orders — one "
    "row per constraint with exact violation counts, pass flag, and "
    "violation rate. Scale: one full scan computes every CASE-WHEN "
    "counter map-side-combined; uniqueness adds a single count-"
    "distinct exchange on the composite key; the referential check "
    "is a LEFT ANTI join on the order key (key-partitioned, "
    "broadcast-able when orders is dimension-sized). No collects — "
    "the report is 7 rows however big the table is.",
    tags=("quality", "agg", "join"),
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select("o_orderkey")

    cnt = lambda pred: F.sum(F.when(pred, 1).otherwise(0))  # noqa: E731
    agg = li.agg(
        F.count(F.lit(1)).alias("n"),
        *[cnt(pred()).alias(f"v{i}") for i, (_, pred) in enumerate(_HARD_RULES)],
        (
            F.count(F.lit(1))
            - F.countDistinct(F.concat(F.col("l_orderkey"), F.lit("#"), F.col("l_linenumber")))
        ).alias("v5"),
    )
    orphans = (
        li.where(F.col("l_orderkey").isNotNull())
        .join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("v6"))
    )
    names = [name for name, _ in _HARD_RULES] + [
        "unique_line_key",
        "orderkey_references_orders",
    ]
    one = agg.crossJoin(F.broadcast(orphans))
    stacked = one.select(
        F.col("n"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("constraint_name"),
                        F.col(f"v{i}").cast("bigint").alias("violations"),
                    )
                    for i, name in enumerate(names)
                ]
            )
        ).alias("c"),
    )
    return stacked.select(
        F.col("c.constraint_name").alias("constraint_name"),
        F.col("n").cast("bigint").alias("n_rows"),
        F.col("c.violations").alias("violations"),
        (F.col("c.violations") == 0).alias("passed"),
        (F.col("c.violations").cast("double") / F.col("n")).alias("violation_rate"),
    ).orderBy("constraint_name")


@register(
    "dq_quarantine",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           concat_ws(',',
             CASE WHEN l_discount > 0.05 THEN 'high_discount' END,
             CASE WHEN l_quantity > 45 THEN 'bulk_quantity' END,
             CASE WHEN l_tax > 0.06 THEN 'high_tax' END) AS reasons,
           CAST(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END
              + CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END
              + CASE WHEN l_tax > 0.06 THEN 1 ELSE 0 END AS INT) AS n_reasons
    FROM lineitem
    WHERE l_discount > 0.05 OR l_quantity > 45 OR l_tax > 0.06
    ORDER BY l_orderkey, l_linenumber, reasons, n_reasons
    """,
    doc="Row-level quarantine split (the DLT expect-or-quarantine "
    "pattern): every lineitem row tripping a warn rule routes out "
    "with the comma-joined reason list in fixed rule order, so the "
    "downstream triage table is self-describing. Scale: a pure "
    "filter+project over the scan — predicate pushdown applies, no "
    "UDF, and the only exchange is the trailing parity-only sort "
    "(production drops it); the complementary keep-side is the same "
    "scan with the negated predicate.",
    tags=("quality", "filter"),
)
def dq_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    rules = [
        ("high_discount", F.col("l_discount") > 0.05),
        ("bulk_quantity", F.col("l_quantity") > 45),
        ("high_tax", F.col("l_tax") > 0.06),
    ]
    any_hit = rules[0][1] | rules[1][1] | rules[2][1]
    return (
        li.where(any_hit)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.concat_ws(
                ",", *[F.when(pred, F.lit(name)) for name, pred in rules]
            ).alias("reasons"),
            sum(
                [F.when(pred, 1).otherwise(0) for _, pred in rules],
                F.lit(0),
            ).cast("int").alias("n_reasons"),
        )
        # the synthetic lineitem carries duplicate (orderkey, linenumber)
        # pairs (see the unique_line_key expectation), so the sort must
        # tie-break on every output column to be engine-stable
        .orderBy("l_orderkey", "l_linenumber", "reasons", "n_reasons")
    )


@register(
    "dq_referential_integrity",
    oracle="""
    SELECT 'customer.c_nationkey -> nation.n_nationkey' AS check_name,
           (SELECT COUNT(*) FROM customer) AS n_checked,
           (SELECT COUNT(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey))
             AS n_violations
    UNION ALL
    SELECT 'events.event_id unique',
           (SELECT COUNT(*) FROM events),
           (SELECT CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT) FROM (
              SELECT COUNT(*) AS cnt FROM events GROUP BY event_id
            ) WHERE cnt > 1)
    UNION ALL
    SELECT 'lineitem.l_orderkey -> orders.o_orderkey',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'orders.o_custkey -> customer.c_custkey',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    ORDER BY check_name
    """,
    doc="Referential-integrity and key-uniqueness census — the DQ "
    "gate a warehouse runs before publishing a snapshot: orphan "
    "counts for the three foreign-key relationships (child rows whose "
    "key has no parent — each an ANTI JOIN, planned broadcast where "
    "the parent is dimension-sized) and the duplicate-surplus count "
    "for the events primary key (a map-side-combinable key census). "
    "Output is one row per check with checked/violation counts — all "
    "BIGINT, exact. At 100 TB each check is one scan + one anti-join "
    "against a parent KEY projection (never the parent's payload); "
    "the four checks are independent and union into a 4-row result.",
    tags=("dq", "join", "agg"),
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    events = load(spark, sf_dir, "events")

    def fk(child, ckey, parent, pkey, name):
        # ONE pass: left join against the broadcast parent-key
        # projection yields checked and orphan counts together (no
        # separate count jobs, no driver-side assembly)
        parent_keys = parent.select(
            F.col(pkey).alias(ckey), F.lit(1).alias("__hit")
        ).distinct()
        return (
            child.select(ckey)
            .join(F.broadcast(parent_keys), ckey, "left")
            .agg(
                F.lit(name).alias("check_name"),
                F.count(F.lit(1)).alias("n_checked"),
                F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_violations"),
            )
        )

    uniq = (
        events.groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.lit("events.event_id unique").alias("check_name"),
            F.sum("cnt").cast("bigint").alias("n_checked"),
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt") - 1).otherwise(0))
            .cast("bigint")
            .alias("n_violations"),
        )
    )
    out = (
        fk(cust, "c_nationkey", nat, "n_nationkey",
           "customer.c_nationkey -> nation.n_nationkey")
        .unionByName(uniq)
        .unionByName(
            fk(li, "l_orderkey", orders, "o_orderkey",
               "lineitem.l_orderkey -> orders.o_orderkey")
        )
        .unionByName(
            fk(orders, "o_custkey", cust, "c_custkey",
               "orders.o_custkey -> customer.c_custkey")
        )
    )
    return out.orderBy("check_name")


@register(
    "dq_outlier_iqr",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v_e2
      FROM events
    ), fences AS (
      SELECT event_type,
             CAST(quantile_disc(v_e2, 0.25) AS BIGINT) AS q1_e2,
             CAST(quantile_disc(v_e2, 0.75) AS BIGINT) AS q3_e2
      FROM v GROUP BY event_type
    )
    SELECT v.event_type, f.q1_e2, f.q3_e2,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN v.v_e2 < f.q1_e2
                          - (3 * (f.q3_e2 - f.q1_e2)) // 2
                      OR v.v_e2 > f.q3_e2
                          + (3 * (f.q3_e2 - f.q1_e2)) // 2
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM v JOIN fences f ON f.event_type = v.event_type
    GROUP BY v.event_type, f.q1_e2, f.q3_e2
    ORDER BY v.event_type
    """,
    doc="Tukey-fence outlier screen per event type: exact DISCRETE "
    "quartiles of the floor-e2 values (element selection, no "
    "interpolation drift), integer 1.5*IQR fences (floor(3*IQR/2) — "
    "all BIGINT arithmetic), and the out-of-fence census. The "
    "anomaly-rate DQ gate that pairs with dq_expectations' fixed "
    "rules: fences adapt to each group's own distribution. Shape: "
    "one keyed quantile aggregate produces a GROUP-COUNT-sized fence "
    "table that broadcast-joins back onto the scan for a single "
    "counting pass — two scans total, nothing data-sized shuffles "
    "beyond the keyed partials.",
    tags=("dq", "stats", "agg"),
)
def dq_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = load(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("v_e2"),
    )
    v.createOrReplaceTempView("dq_iqr_v")
    fences = spark.sql(
        """
        SELECT event_type,
               CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY v_e2)
                    AS BIGINT) AS q1_e2,
               CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY v_e2)
                    AS BIGINT) AS q3_e2
        FROM dq_iqr_v GROUP BY event_type
        """
    )
    half = F.expr("(3 * (q3_e2 - q1_e2)) div 2")
    out = (
        v.join(F.broadcast(fences), "event_type")
        .groupBy("event_type", "q1_e2", "q3_e2")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    (F.col("v_e2") < F.col("q1_e2") - half)
                    | (F.col("v_e2") > F.col("q3_e2") + half),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )
    return out.orderBy("event_type")


# --- dq_schema_drift -----------------------------------------------------


@register(
    "dq_schema_drift",
    oracle="""
    WITH v1 AS (
      SELECT doc_id, lang, n_chars FROM documents
    ), v2 AS (
      SELECT doc_id, lang, n_chars FROM documents
      UNION ALL
      SELECT doc_id + 1000000000, 'xx', n_chars * 2
      FROM documents WHERE source = 'src_0'
    ), s1 AS (
      SELECT COUNT(*) AS n_rows, MIN(n_chars) AS min_chars,
             MAX(n_chars) AS max_chars,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             COUNT(DISTINCT lang) AS n_langs
      FROM v1
    ), s2 AS (
      SELECT COUNT(*) AS n_rows, MIN(n_chars) AS min_chars,
             MAX(n_chars) AS max_chars,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             COUNT(DISTINCT lang) AS n_langs
      FROM v2
    )
    SELECT m.metric,
           CASE m.metric
             WHEN 'n_rows' THEN s1.n_rows
             WHEN 'min_chars' THEN s1.min_chars
             WHEN 'max_chars' THEN s1.max_chars
             WHEN 'sum_chars' THEN s1.sum_chars
             ELSE s1.n_langs END AS v1_val,
           CASE m.metric
             WHEN 'n_rows' THEN s2.n_rows
             WHEN 'min_chars' THEN s2.min_chars
             WHEN 'max_chars' THEN s2.max_chars
             WHEN 'sum_chars' THEN s2.sum_chars
             ELSE s2.n_langs END AS v2_val,
           CASE m.metric
             WHEN 'n_rows' THEN s2.n_rows - s1.n_rows
             WHEN 'min_chars' THEN s2.min_chars - s1.min_chars
             WHEN 'max_chars' THEN s2.max_chars - s1.max_chars
             WHEN 'sum_chars' THEN s2.sum_chars - s1.sum_chars
             ELSE s2.n_langs - s1.n_langs END AS delta
    FROM (SELECT UNNEST(['n_rows', 'min_chars', 'max_chars',
                         'sum_chars', 'n_langs']) AS metric) m, s1, s2
    ORDER BY m.metric
    """,
    doc="Cross-version distribution-drift report over the snapshot "
    "log: commit the corpus as v1, append a drifted batch (new lang "
    "domain value, doubled n_chars) as v2, then diff the two "
    "committed versions' column statistics (row count, min/max/sum of "
    "the numeric column, language-domain cardinality) by TIME TRAVEL "
    "— read_version(v1) vs the head — into a long-format metric/"
    "v1/v2/delta report, the check a lakehouse ingest gate runs "
    "before publishing a new version (catches the silent unit change "
    "or domain explosion an append can smuggle in). All-integer "
    "stats. Scale shape: each version is one combinable stats pass "
    "(count-distinct on the tiny domain column only); the diff is a "
    "1-row cross join, and time travel costs a manifest read, not a "
    "data copy.",
    tags=("dq", "sink", "versioning"),
)
def dq_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from binance_etl_spark.operators import snapshots as SNAP

    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", "source"
    )
    tdir = tempfile.mkdtemp(prefix="besk_drift_") + "/docs"
    v1 = SNAP.write_version(
        d.select("doc_id", "lang", "n_chars"), tdir
    )
    drifted = d.where(F.col("source") == "src_0").select(
        (F.col("doc_id") + 1_000_000_000).alias("doc_id"),
        F.lit("xx").alias("lang"),
        (F.col("n_chars") * 2).alias("n_chars"),
    )
    SNAP.write_version(drifted, tdir, mode="append")

    def stats(df: DataFrame, tag: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias(f"{tag}n_rows"),
            F.min("n_chars").alias(f"{tag}min_chars"),
            F.max("n_chars").alias(f"{tag}max_chars"),
            F.sum("n_chars").cast("bigint").alias(f"{tag}sum_chars"),
            F.countDistinct("lang").alias(f"{tag}n_langs"),
        )

    s1 = stats(SNAP.read_version(spark, tdir, v1), "a_")
    s2 = stats(SNAP.read_version(spark, tdir), "b_")
    joined = s1.crossJoin(s2)
    metrics = ["max_chars", "min_chars", "n_langs", "n_rows", "sum_chars"]
    rows = None
    for m in metrics:
        r = joined.select(
            F.lit(m).alias("metric"),
            F.col(f"a_{m}").cast("bigint").alias("v1_val"),
            F.col(f"b_{m}").cast("bigint").alias("v2_val"),
            (F.col(f"b_{m}") - F.col(f"a_{m}")).cast("bigint").alias("delta"),
        )
        rows = r if rows is None else rows.unionAll(r)
    return rows.orderBy("metric")
