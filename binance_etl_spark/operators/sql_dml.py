"""ANSI DML text front end for snapshot tables.

The lakehouse DML operators (operators/snapshots.py: delete_where,
update_where, merge_into) are Python APIs; this module lets the same
operations be DRIVEN BY SHARED SQL TEXT, the way the 22 TPC-H query
shapes are — one string executes on this engine AND (for UPDATE /
DELETE verbatim; MERGE via its standard DELETE+INSERT rewrite) on the
DuckDB oracle, so the DML rows get the exact-parity treatment of the
relational surface.

Supported grammar (case-insensitive keywords; expressions pass through
to Spark SQL / the snapshot operators unparsed):

    DELETE FROM <table> WHERE <condition>
    UPDATE <table> SET col = expr [, ...] [WHERE <condition>]
    MERGE INTO <table> [AS] [t] USING <view> [AS] [s]
      ON t.k = s.k [AND t.k2 = s.k2 ...]
      [WHEN MATCHED AND <cond> THEN DELETE]
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *

MERGE is the Delta/DLT CDC-apply shape (`SET *` / `INSERT *` whole-row
semantics): the ON clause must be a conjunction of `t.col = s.col`
equalities (the merge keys), the optional MATCHED-AND-DELETE branch's
condition is evaluated against SOURCE columns (CDC tombstones), and
the source is a registered temp view carrying exactly the target's
columns. That is precisely `snapshots.merge_into`'s contract, so the
text lowers losslessly; anything outside the grammar raises rather
than guessing.

Reference parity note: the reference (anselumana/binance-etl) has no
SQL surface at all — this front door exists so a user can drive the
engine's table maintenance with the same ANSI text their warehouse
uses (reference scope: websocket->CSV, storage/csv_storage.py).
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

from binance_etl_spark.operators import snapshots as SNAP

_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<table>[\w.]+)\s+WHERE\s+(?P<cond>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(?P<table>[\w.]+)\s+SET\s+(?P<sets>.+?)"
    r"(?:\s+WHERE\s+(?P<cond>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_MERGE_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<table>[\w.]+)(?:\s+AS)?(?:\s+(?P<talias>\w+))?"
    r"\s+USING\s+(?P<source>[\w.]+)(?:\s+AS)?(?:\s+(?P<salias>\w+))?"
    r"\s+ON\s+(?P<on>.+?)"
    r"(?P<whens>\s+WHEN\s+.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_WHEN_RE = re.compile(
    r"WHEN\s+(?P<not>NOT\s+)?MATCHED(?:\s+AND\s+(?P<cond>.+?))?\s+THEN\s+"
    r"(?P<action>UPDATE\s+SET\s+\*|INSERT\s+\*|DELETE)",
    re.IGNORECASE | re.DOTALL,
)


def _split_assignments(sets: str) -> dict[str, str]:
    """`a = x + 1, b = 'v'` -> {a: 'x + 1', b: "'v'"} — splits on
    top-level commas only (parens and quotes protected)."""
    out: dict[str, str] = {}
    depth = 0
    quote: str | None = None
    part = ""
    parts = []
    for ch in sets:
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(part)
            part = ""
            continue
        part += ch
    parts.append(part)
    for p in parts:
        col, eq, rhs = p.partition("=")
        if not eq or not col.strip().replace(".", "").isidentifier():
            raise ValueError(f"cannot parse SET assignment: {p.strip()!r}")
        out[col.strip()] = rhs.strip()
    return out


def _merge_keys(on: str, talias: str, salias: str) -> list[str]:
    """ON must be `t.k = s.k [AND ...]` equality pairs on the SAME
    column name each side — the merge keys."""
    keys = []
    for clause in re.split(r"\s+AND\s+", on.strip(), flags=re.IGNORECASE):
        m = re.match(
            rf"^\s*(?:{talias}|{salias})\.(\w+)\s*=\s*"
            rf"(?:{talias}|{salias})\.(\w+)\s*$",
            clause,
            re.IGNORECASE,
        )
        if not m or m.group(1).lower() != m.group(2).lower():
            raise ValueError(
                f"MERGE ON clause must be t.col = s.col equality pairs; "
                f"got {clause.strip()!r}"
            )
        keys.append(m.group(1))
    return keys


def execute_dml(
    spark: SparkSession, sql_text: str, tables: dict[str, str]
) -> int:
    """Execute one ANSI DML statement against a snapshot table and
    return the committed version. ``tables`` maps statement table
    names to snapshot table directories; a MERGE source resolves as a
    Spark temp view by its statement name."""

    m = _DELETE_RE.match(sql_text)
    if m:
        return SNAP.delete_where(
            spark, tables[m.group("table")], m.group("cond")
        )

    mm = _MERGE_RE.match(sql_text)
    if mm:
        talias = mm.group("talias") or mm.group("table")
        salias = mm.group("salias") or mm.group("source")
        keys = _merge_keys(mm.group("on"), talias, salias)
        delete_condition = None
        saw_update = saw_insert = False
        for w in _WHEN_RE.finditer(mm.group("whens")):
            action = re.sub(r"\s+", " ", w.group("action")).upper()
            if w.group("not"):
                if action != "INSERT *":
                    raise ValueError("WHEN NOT MATCHED supports INSERT * only")
                saw_insert = True
            elif action == "DELETE":
                delete_condition = w.group("cond") or "TRUE"
            elif action == "UPDATE SET *":
                if w.group("cond"):
                    raise ValueError(
                        "WHEN MATCHED AND <cond> THEN UPDATE is not "
                        "supported — only the DELETE branch takes a guard"
                    )
                saw_update = True
        if not (saw_update and saw_insert):
            raise ValueError(
                "MERGE must carry WHEN MATCHED THEN UPDATE SET * and "
                "WHEN NOT MATCHED THEN INSERT * (the CDC-apply shape)"
            )
        # delete guard references source columns, optionally qualified
        if delete_condition:
            delete_condition = re.sub(
                rf"\b{salias}\.", "", delete_condition, flags=re.IGNORECASE
            )
        return SNAP.merge_into(
            spark,
            tables[mm.group("table")],
            spark.table(mm.group("source")),
            key_cols=keys,
            delete_condition=delete_condition,
        )

    mu = _UPDATE_RE.match(sql_text)
    if mu:
        return SNAP.update_where(
            spark,
            tables[mu.group("table")],
            mu.group("cond") or "TRUE",
            _split_assignments(mu.group("sets")),
        )

    raise ValueError(f"unsupported DML statement: {sql_text[:120]!r}")
