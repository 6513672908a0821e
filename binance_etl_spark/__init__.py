"""binance_etl_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
ETL (anselumana/binance-etl, surveyed in SURVEY.md) Spark-first:

- batch relational/analytics operators over DataFrames (Catalyst-planned),
- streaming ingestion (replay + websocket-shaped sources, stateful
  order-book synchronization) via Structured Streaming,
- LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal plumbing) designed for 100 TB scale.

Nothing here is a translation of the reference's row-at-a-time Python
pipeline; plans are declared with the DataFrame/SQL API so Catalyst +
Tungsten pick the physical strategy.
"""

__version__ = "0.1.0"
