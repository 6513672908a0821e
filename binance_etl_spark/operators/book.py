"""Order-book reconstruction (batch): apply snapshot + diff semantics.

The reference's depth table is a stream of (side, price, quantity) rows
where quantity == 0 deletes the level and `is_snapshot` marks the initial
full book (reference spot_depth_etl.py:92-123, README.md:53-60).  The
consumer-side query "current book at the end of the stream" is:
last quantity per (side, price) in event order, drop zero levels.

Two implementations with identical semantics:
- `rebuild_book` — pure window functions (Catalyst-planned, preferred);
- `rebuild_book_pandas` — groupBy().applyInPandas grouped-map UDF, the
  template for per-key imperative logic Spark built-ins can't express
  (exercises SURVEY.md §2.11's grouped-map surface).

Scale: both shuffle once on the (key, side, price) grouping columns;
state per group is O(1) for the window variant. Works per-symbol on a
1000-executor cluster because price levels within a symbol are
independent groups.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rebuild_book(
    updates: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    qty_col: str = "quantity",
) -> DataFrame:
    """Last-write-wins per key; rows whose final qty is 0 are deleted."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
        .where(F.col(qty_col) > 0)
    )


def rebuild_book_pandas(
    updates: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    qty_col: str = "quantity",
) -> DataFrame:
    """Same semantics via grouped-map Pandas UDF (Arrow-batched)."""
    out_cols = updates.columns
    schema = updates.schema

    def take_last(pdf):
        pdf = pdf.sort_values(list(order_cols))
        last = pdf.iloc[[-1]]
        return last[last[qty_col] > 0][out_cols]

    return updates.groupBy(*key_cols).applyInPandas(take_last, schema=schema)
