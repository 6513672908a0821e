

def test_pit_join_never_leaks_future_features(spark):
    """The leakage property point-in-time joins exist for: every
    attached feature version must be at or before the fact's own
    timestamp (feat_age_us >= 0), and facts with no prior version get
    NULL, not the earliest later one."""
    from pyspark.sql import functions as F

    from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    df = REGISTRY["join_pit_features"].fn(spark, "/root/testdata/sf0.01")
    leaked = df.where(F.col("feat_age_us") < 0).count()
    assert leaked == 0, "a feature version from after the fact leaked in"
    rows = df.count()
    matched = df.where(F.col("feat_value").isNotNull()).count()
    assert 0 < matched <= rows
    # consistency: age is defined exactly where a version matched
    assert df.where(
        F.col("feat_value").isNotNull() != F.col("feat_age_us").isNotNull()
    ).count() == 0
