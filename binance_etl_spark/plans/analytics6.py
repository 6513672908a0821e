"""Round-9 analytics wave: k-sample rank tests, rank correlation, SAX
symbolization, and a one-pass completeness matrix.

Exactness disciplines carried from the round-8 stats battery
(plans/stats3.py, analytics5.py): all cross-row sums are INTEGER
(floor-scaled values, 2x-scaled midranks), per-group double assembly
is PIVOTED into one fixed textual expression (a grouped SUM of
doubles would let either engine reassociate the last ulp), quantile
breakpoints use percentile_disc/quantile_disc (element selection,
never interpolation), and sqrt (correctly rounded per IEEE-754) is
the only transcendental — never pow/ln.

Reference parity note: the reference ETL (anselumana/binance-etl,
~539 LoC of websocket->CSV plumbing) has no analytics engine; these
are north-star extensions per SURVEY.md §2.19.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from binance_etl_spark.catalog import load
from binance_etl_spark.plans.registry import register

_TYPES = ["click", "error", "purchase", "signup", "view"]


# --- stats_kruskal_wallis --------------------------------------------------

# Pivot per-type 2x-scaled rank sums + counts into one row, then
# assemble H in a FIXED textual order. With 2R ranks, R_g = r2_g/2 and
# H = 12/(N(N+1)) * sum_g R_g^2/n_g - 3(N+1)
#   = 3/(N(N+1)) * sum_g r2_g^2/n_g - 3(N+1).
# Tie correction divides by 1 - sum(c^3-c)/(N^3-N).
_KW_PIVOT = ", ".join(
    f"MAX(CASE WHEN event_type = '{t}' THEN {c} END) AS {c}_{t}"
    for t in _TYPES
    for c in ("n", "r2")
)
# empty groups contribute NOTHING (textbook H sums over PRESENT
# groups); without the guard an absent type makes its term 0/0 ->
# NULL and nulls the whole statistic on both engines
_KW_RSUM = " + ".join(
    f"(CASE WHEN n_{t} > 0 THEN (CAST(r2_{t} AS DOUBLE) * r2_{t}) / n_{t} "
    f"ELSE 0e0 END)"
    for t in _TYPES
)
_KW_N = " + ".join(f"n_{t}" for t in _TYPES)

# Tie-correction factor 1 - tie_sum/(N^3-N). When ALL values tie the
# factor is exactly 0 (tie_sum = N^3-N) and the corrected H is 0/0:
# Spark (ANSI off) yields NULL, DuckDB yields Inf/NaN — a latent
# cross-engine divergence, so the degenerate case is guarded to NULL
# explicitly in the SAME text on both engines.
_KW_TIEFAC = (
    "(1e0 - CAST({tie} AS DOUBLE)"
    " / ((CAST({n} AS DOUBLE) * ({n}) * ({n})) - ({n})))"
)


@register(
    "stats_kruskal_wallis",
    oracle=f"""
    WITH v AS (
      SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v
      FROM events
    ), hist AS (
      SELECT v,
             {", ".join(
                 f"COUNT(*) FILTER (WHERE event_type = '{t}') AS c_{t}"
                 for t in _TYPES
             )},
             COUNT(*) AS c
      FROM v GROUP BY v
    ), cum AS (
      SELECT *, COALESCE(SUM(c) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) AS before
      FROM hist
    ), ranks AS (
      {" UNION ALL ".join(
          f"SELECT '{t}' AS event_type, SUM(c_{t}) AS n, "
          f"SUM(c_{t} * (2 * before + c + 1)) AS r2 FROM cum"
          for t in _TYPES
      )}
    ), tie AS (
      SELECT SUM(c * c * c - c) AS t FROM hist
    ), p AS (
      SELECT {_KW_PIVOT} FROM ranks
    )
    SELECT CAST({_KW_N} AS BIGINT) AS n_total,
           CAST((SELECT t FROM tie) AS BIGINT) AS tie_sum,
           CAST(3e0 / (({_KW_N}) * (CAST({_KW_N} AS DOUBLE) + 1))
                * ({_KW_RSUM})
                - 3e0 * (({_KW_N}) + 1) AS DOUBLE) AS h_stat,
           CAST(CASE WHEN {_KW_TIEFAC.format(
                    tie="(SELECT t FROM tie)", n=_KW_N)} = 0e0 THEN NULL
                ELSE (3e0 / (({_KW_N}) * (CAST({_KW_N} AS DOUBLE) + 1))
                * ({_KW_RSUM})
                - 3e0 * (({_KW_N}) + 1))
                / {_KW_TIEFAC.format(tie="(SELECT t FROM tie)", n=_KW_N)}
                END AS DOUBLE) AS h_tie_corrected
    FROM p
    """,
    doc="Kruskal-Wallis H test for equal value distributions across "
    "the five event types — the k-sample generalization of "
    "stats_mann_whitney, built on the same scalable midrank machine: "
    "ONE distinct-value histogram (combinable aggregate over floor-e2 "
    "integers), a cumulative count over DISTINCT values only, and "
    "algebraic tie-group midranks 2x-scaled so every rank sum stays "
    "integer. Per-type (n, 2R-sum) pairs are PIVOTED to one row and "
    "H is assembled in one fixed textual order (grouped double sums "
    "would reassociate); the tie-corrected variant divides by "
    "1 - sum(c^3-c)/(N^3-N) in the same tree. 100 TB shape: the only "
    "data-sized op is the histogram aggregate; the rank window runs "
    "over |distinct values| rows and the output is one row.",
    tags=("stats", "agg", "window"),
)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("v"),
    )
    hist = e.groupBy("v").agg(
        *[
            F.count_if(F.col("event_type") == t).alias(f"c_{t}")
            for t in _TYPES
        ],
        F.count(F.lit(1)).alias("c"),
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    cum = hist.select(
        *[f"c_{t}" for t in _TYPES],
        "c",
        F.coalesce(F.sum("c").over(w), F.lit(0)).alias("before"),
    )
    sums = cum.agg(
        *[F.sum(f"c_{t}").alias(f"n_{t}") for t in _TYPES],
        *[
            F.sum(
                F.col(f"c_{t}") * (2 * F.col("before") + F.col("c") + 1)
            ).alias(f"r2_{t}")
            for t in _TYPES
        ],
        F.sum(
            F.col("c") * F.col("c") * F.col("c") - F.col("c")
        ).alias("tie_sum"),
    )
    return sums.selectExpr(
        f"CAST({_KW_N} AS BIGINT) AS n_total",
        "CAST(tie_sum AS BIGINT) AS tie_sum",
        f"CAST(3e0 / (({_KW_N}) * (CAST({_KW_N} AS DOUBLE) + 1))"
        f" * ({_KW_RSUM})"
        f" - 3e0 * (({_KW_N}) + 1) AS DOUBLE) AS h_stat",
        f"CAST(CASE WHEN "
        f"{_KW_TIEFAC.format(tie='tie_sum', n=_KW_N)} = 0e0 THEN NULL"
        f" ELSE (3e0 / (({_KW_N}) * (CAST({_KW_N} AS DOUBLE) + 1))"
        f" * ({_KW_RSUM})"
        f" - 3e0 * (({_KW_N}) + 1))"
        f" / {_KW_TIEFAC.format(tie='tie_sum', n=_KW_N)}"
        f" END AS DOUBLE) AS h_tie_corrected",
    )


# --- stats_spearman --------------------------------------------------------

# Shared-text Pearson over 2x-scaled midranks; all sums integral.
_SP_DERIVE = """
    (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
    / sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
    / sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
"""


@register(
    "stats_spearman",
    oracle=f"""
    WITH base AS (
      SELECT event_type,
             CAST(floor(value * 100) AS BIGINT) AS x,
             CAST(epoch_us(ts) // 1000000 AS BIGINT) AS y
      FROM events
    ), hx AS (
      SELECT event_type, x, COUNT(*) AS c FROM base GROUP BY 1, 2
    ), rx AS (
      SELECT event_type, x,
             2 * COALESCE(SUM(c) OVER (PARTITION BY event_type ORDER BY x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + c + 1 AS r2x
      FROM hx
    ), hy AS (
      SELECT event_type, y, COUNT(*) AS c FROM base GROUP BY 1, 2
    ), ry AS (
      SELECT event_type, y,
             2 * COALESCE(SUM(c) OVER (PARTITION BY event_type ORDER BY y
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + c + 1 AS r2y
      FROM hy
    ), joined AS (
      SELECT b.event_type, rx.r2x, ry.r2y
      FROM base b
      JOIN rx ON rx.event_type = b.event_type AND rx.x = b.x
      JOIN ry ON ry.event_type = b.event_type AND ry.y = b.y
    ), s AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(r2x) AS sx, SUM(r2y) AS sy, SUM(r2x * r2y) AS sxy,
             SUM(r2x * r2x) AS sxx, SUM(r2y * r2y) AS syy
      FROM joined GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(sxy AS BIGINT) AS srank_prod,
           CAST({_SP_DERIVE} AS DOUBLE) AS rho
    FROM s ORDER BY event_type
    """,
    doc="Spearman rank correlation between value and event time per "
    "event type: midranks (2x-scaled, tie-safe, every sum integral) "
    "come from per-type DISTINCT-VALUE histograms — never a global "
    "row sort — joined back to rows by (type, value), then rho is "
    "Pearson over the rank pairs from one grouped integer-moment "
    "pass, derived in shared text (sqrt only — correctly rounded). "
    "Midrank invariant sum(2R) = n(n+1) held by construction. 100 TB "
    "shape: two combinable histograms + two equi-joins keyed "
    "(type, value) + one moment aggregate; rank windows run over "
    "distinct values per type. Integer headroom: products stay in "
    "int64 to ~1e6 rows/type (beyond, rescale to e1 values — same "
    "note as stats_ols_group).",
    tags=("stats", "agg", "window", "join"),
)
def stats_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("x"),
        # integer floor division (DIV), matching the oracle's `//`
        # textually — double-divide-then-cast truncates toward zero and
        # diverges for pre-1970 timestamps (round-8 notes, DIV class)
        F.expr("unix_micros(ts) DIV 1000000").alias("y"),
    )

    def ranks(col: str) -> DataFrame:
        h = base.groupBy("event_type", col).agg(F.count(F.lit(1)).alias("c"))
        w = (
            W.partitionBy("event_type")
            .orderBy(col)
            .rowsBetween(W.unboundedPreceding, -1)
        )
        return h.select(
            "event_type",
            col,
            (
                2 * F.coalesce(F.sum("c").over(w), F.lit(0))
                + F.col("c")
                + 1
            ).alias(f"r2{col}"),
        )

    joined = base.join(ranks("x"), ["event_type", "x"]).join(
        ranks("y"), ["event_type", "y"]
    )
    s = joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r2x").alias("sx"),
        F.sum("r2y").alias("sy"),
        F.sum(F.expr("r2x * r2y")).alias("sxy"),
        F.sum(F.expr("r2x * r2x")).alias("sxx"),
        F.sum(F.expr("r2y * r2y")).alias("syy"),
    )
    return s.selectExpr(
        "event_type",
        "CAST(n AS BIGINT) AS n",
        "CAST(sxy AS BIGINT) AS srank_prod",
        f"CAST({_SP_DERIVE} AS DOUBLE) AS rho",
    ).orderBy("event_type")


# --- ts_sax_symbols --------------------------------------------------------

_SAX_CHUNK = 8


@register(
    "ts_sax_symbols",
    oracle=f"""
    WITH seq AS (
      SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), paa AS (
      SELECT event_type, (rn - 1) // {_SAX_CHUNK} AS chunk,
             SUM(v) AS s, COUNT(*) AS n
      FROM seq GROUP BY 1, 2
    ), full_chunks AS (
      SELECT event_type, chunk, s FROM paa WHERE n = {_SAX_CHUNK}
    ), brk AS (
      SELECT event_type,
             quantile_disc(s, 0.25) AS q1,
             quantile_disc(s, 0.50) AS q2,
             quantile_disc(s, 0.75) AS q3
      FROM full_chunks GROUP BY event_type
    ), sym AS (
      SELECT f.event_type,
             CASE WHEN f.s <= b.q1 THEN 'a'
                  WHEN f.s <= b.q2 THEN 'b'
                  WHEN f.s <= b.q3 THEN 'c'
                  ELSE 'd' END AS symbol
      FROM full_chunks f JOIN brk b ON b.event_type = f.event_type
    )
    SELECT event_type, symbol, COUNT(*) AS n_chunks
    FROM sym GROUP BY 1, 2 ORDER BY event_type, symbol
    """,
    doc=f"SAX symbolization of each event-type value series: PAA over "
    f"fixed {_SAX_CHUNK}-row chunks (integer chunk SUMS at e2 — same "
    "discretization power as means, no division), per-series quartile "
    "breakpoints via DISCRETE quantiles (element selection, exact on "
    "both engines), chunks lettered a-d by exact integer comparison, "
    "then the symbol histogram — the standard pre-step for "
    "distance-bounded motif search over huge series. Incomplete tail "
    "chunks drop. 100 TB shape: every stage (row-number window, chunk "
    "rollup, breakpoint quantiles, symbol count) clusters on the "
    "series key — no wider shuffle anywhere; the static plan carries "
    "the type-keyed exchange twice because the breakpoint build "
    "references the chunk table a second time, and the 20-row "
    "breakpoint table joins back broadcast.",
    tags=("timeseries", "window", "agg"),
)
def ts_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    wo = W.partitionBy("event_type").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("v"),
        F.row_number().over(wo).alias("rn"),
    )
    paa = (
        seq.select(
            "event_type",
            F.expr(f"(rn - 1) DIV {_SAX_CHUNK}").alias("chunk"),
            "v",
        )
        .groupBy("event_type", "chunk")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .where(F.col("n") == _SAX_CHUNK)
    )
    brk = paa.groupBy("event_type").agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY s)").alias("q1"),
        F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY s)").alias("q2"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY s)").alias("q3"),
    )
    sym = paa.join(F.broadcast(brk), "event_type").select(
        "event_type",
        F.when(F.col("s") <= F.col("q1"), "a")
        .when(F.col("s") <= F.col("q2"), "b")
        .when(F.col("s") <= F.col("q3"), "c")
        .otherwise("d")
        .alias("symbol"),
    )
    return (
        sym.groupBy("event_type", "symbol")
        .agg(F.count(F.lit(1)).alias("n_chunks"))
        .orderBy("event_type", "symbol")
    )


# --- dq_completeness_matrix ------------------------------------------------

_DQC_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]
_DQC_STR = {"event_type", "props"}


@register(
    "dq_completeness_matrix",
    oracle=f"""
    WITH agg AS (
      SELECT COUNT(*) AS n,
             {", ".join(f"COUNT({c}) AS nn_{c}" for c in _DQC_COLS)},
             {", ".join(
                 f"COUNT(*) FILTER (WHERE trim({c}) = '') AS ne_{c}"
                 if c in _DQC_STR
                 else f"CAST(0 AS BIGINT) AS ne_{c}"
                 for c in _DQC_COLS
             )}
      FROM events
    )
    {" UNION ALL ".join(
        f"SELECT '{c}' AS column_name, CAST(n AS BIGINT) AS n_rows, "
        f"CAST(n - nn_{c} AS BIGINT) AS n_null, "
        f"CAST((n - nn_{c}) * 1000000 // n AS BIGINT) AS null_ppm, "
        f"CAST(ne_{c} AS BIGINT) AS n_empty FROM agg"
        for c in _DQC_COLS
    )}
    ORDER BY column_name
    """,
    doc="Per-column completeness matrix over events in ONE pass: row "
    "count, null count, exact integer null-ppm, and (for string "
    "columns) empty-after-trim count — the table-health report a "
    "quality dashboard polls before anything trusts a crawl batch. "
    "All counts come from a single combinable aggregate (COUNT(col) "
    "skips NULLs; the per-column fan-out is a 1-row-input union, not "
    "a second scan). Complements profile_columns_hll (distinct "
    "cardinalities) and dq_expectations (CHECK rules). 100 TB shape: "
    "one scan, one 1-row aggregate, 6-row output — the scan reads "
    "every column by contract (completeness IS the full-width "
    "question).",
    tags=("dq", "agg"),
)
def dq_completeness_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    agg = e.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.count(c).alias(f"nn_{c}") for c in _DQC_COLS],
        *[
            (
                F.count_if(F.trim(F.col(c)) == "").alias(f"ne_{c}")
                if c in _DQC_STR
                else F.lit(0).cast("bigint").alias(f"ne_{c}")
            )
            for c in _DQC_COLS
        ],
    )
    stacked = agg.selectExpr(
        "stack("
        + str(len(_DQC_COLS))
        + ", "
        + ", ".join(
            f"'{c}', n, n - nn_{c}, (n - nn_{c}) * 1000000 DIV n, ne_{c}"
            for c in _DQC_COLS
        )
        + ") AS (column_name, n_rows, n_null, null_ppm, n_empty)"
    )
    return stacked.selectExpr(
        "column_name",
        "CAST(n_rows AS BIGINT) AS n_rows",
        "CAST(n_null AS BIGINT) AS n_null",
        "CAST(null_ppm AS BIGINT) AS null_ppm",
        "CAST(n_empty AS BIGINT) AS n_empty",
    ).orderBy("column_name")
