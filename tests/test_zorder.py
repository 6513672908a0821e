"""Z-order layout: files must be prunable on BOTH clustering columns."""

from __future__ import annotations

import glob
import tempfile

import pyarrow.parquet as pq

from binance_etl_spark.catalog import load
from binance_etl_spark.operators.zorder import write_zordered

SF_DIR = "/root/testdata/sf0.01"
COLS = ("o_custkey", "o_totalprice")


def _file_bounds(path):
    out = []
    for f in glob.glob(path + "/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        b = {}
        for c in COLS:
            st = [md.row_group(g).column(idx[c]).statistics for g in range(md.num_row_groups)]
            b[c] = (min(s.min for s in st), max(s.max for s in st))
        out.append(b)
    return out


def _files_overlapping(bounds, col, lo, hi):
    return sum(1 for b in bounds if not (b[col][1] < lo or b[col][0] > hi))


def test_zorder_prunes_on_both_dimensions(spark):
    o = load(spark, SF_DIR, "orders")
    path = tempfile.mkdtemp(prefix="besk_z_") + "/orders_z"
    write_zordered(o, path, COLS, n_files=8)
    bounds = _file_bounds(path)
    assert len(bounds) == 8

    stats = o.selectExpr(
        *[f"min({c}) AS lo_{c}" for c in COLS], *[f"max({c}) AS hi_{c}" for c in COLS]
    ).first()
    for c in COLS:
        lo, hi = stats[f"lo_{c}"], stats[f"hi_{c}"]
        q_lo, q_hi = lo, lo + (hi - lo) * 0.25  # bottom-quarter predicate
        n = _files_overlapping(bounds, c, q_lo, q_hi)
        assert n < 8, f"no file skipping on {c}: all 8 files overlap"

    # value correctness under the clustered layout
    assert spark.read.parquet(path).count() == o.count()
    c = COLS[0]
    lo, hi = stats[f"lo_{c}"], stats[f"hi_{c}"]
    cut = lo + (hi - lo) * 0.25
    got = spark.read.parquet(path).where(f"{c} <= {cut}").count()
    want = o.where(f"{c} <= {cut}").count()
    assert got == want
