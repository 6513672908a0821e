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
    TRUNCATE TABLE <table>
    ALTER TABLE <table> RENAME COLUMN <old> TO <new>
    ALTER TABLE <table> DROP COLUMN <col>
    ALTER TABLE <table> ADD COLUMN[S] <name> <type> [, ...]
    ALTER TABLE <table> ADD CONSTRAINT <name> CHECK (<predicate>)
    ALTER TABLE <table> DROP CONSTRAINT <name>
    INSERT INTO <table> SELECT ... | VALUES (...), (...)
    UPDATE <table> SET col = expr [, ...] [WHERE <condition>]
    MERGE INTO <table> [AS] [t] USING <view> [AS] [s]
      ON t.k = s.k [AND t.k2 = s.k2 ...]
      -- star mode (the Delta/DLT CDC-apply shape):
      [WHEN MATCHED AND <cond> THEN DELETE]
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
      -- or column mode (the warehouse shape; source schema is free):
      WHEN MATCHED THEN UPDATE SET col = expr [, ...]
      WHEN NOT MATCHED THEN INSERT (cols) VALUES (exprs)

STAR mode (`SET *` / `INSERT *` whole-row semantics): the ON clause
must be a conjunction of `t.col = s.col` equalities (the merge keys),
the optional MATCHED-AND-DELETE branch's condition is evaluated
against SOURCE columns (CDC tombstones), and the source is a
registered temp view carrying exactly the target's columns — exactly
`snapshots.merge_into`'s contract, so the text lowers losslessly.
COLUMN mode lets assignments and insert values reference t.<col> /
s.<col> with any source schema; see _execute_merge for the lowering.
Anything outside the grammar raises rather than guessing.

Reference parity note: the reference (anselumana/binance-etl) has no
SQL surface at all — this front door exists so a user can drive the
engine's table maintenance with the same ANSI text their warehouse
uses (reference scope: websocket->CSV, storage/csv_storage.py).
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from binance_etl_spark.operators import snapshots as SNAP

_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<table>[\w.]+)\s+WHERE\s+(?P<cond>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_TRUNCATE_RE = re.compile(
    r"^\s*TRUNCATE\s+TABLE\s+(?P<table>[\w.]+)\s*;?\s*$", re.IGNORECASE
)

_ALTER_RENAME_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<table>[\w.]+)\s+RENAME\s+COLUMN\s+"
    r"(?P<old>\w+)\s+TO\s+(?P<new>\w+)\s*;?\s*$",
    re.IGNORECASE,
)

_ALTER_DROP_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<table>[\w.]+)\s+DROP\s+COLUMN\s+"
    r"(?P<col>\w+)\s*;?\s*$",
    re.IGNORECASE,
)

_ALTER_ADD_CK_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<table>[\w.]+)\s+ADD\s+CONSTRAINT\s+"
    r"(?P<name>\w+)\s+CHECK\s*\(\s*(?P<pred>.+?)\s*\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_ALTER_DROP_CK_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<table>[\w.]+)\s+DROP\s+CONSTRAINT\s+"
    r"(?P<name>\w+)\s*;?\s*$",
    re.IGNORECASE,
)

_ALTER_ADD_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<table>[\w.]+)\s+ADD\s+COLUMNS?\s*"
    r"\(?\s*(?P<fields>[\w\s,()<>]+?)\s*\)?\s*;?\s*$",
    re.IGNORECASE,
)

_INSERT_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+(?P<table>[\w.]+)\s+(?P<body>(?:SELECT|VALUES)\s+.+?)\s*;?\s*$",
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

# the clause boundary is `WHEN [NOT] MATCHED`, not bare WHEN — SET
# expressions are free to contain CASE WHEN ... THEN ... END
_WHEN_RE = re.compile(
    r"WHEN\s+(?P<not>NOT\s+)?MATCHED(?:\s+AND\s+(?P<cond>.+?))?\s+THEN\s+"
    r"(?P<action>UPDATE\s+SET\s+\*|INSERT\s+\*|DELETE"
    r"|UPDATE\s+SET\s+.+?|INSERT\s*\([^)]*\)\s*VALUES\s*\(.*?\))"
    r"(?=\s+WHEN\s+(?:NOT\s+)?MATCHED\b|\s*;?\s*$)",
    re.IGNORECASE | re.DOTALL,
)


def _split_assignments(sets: str) -> dict[str, str]:
    """`a = x + 1, b = 'v'` -> {a: 'x + 1', b: "'v'"} — splits on
    top-level commas only (parens and quotes protected)."""
    out: dict[str, str] = {}
    for p in _split_top_level_commas(sets):
        col, eq, rhs = p.partition("=")
        if not eq or not col.strip().replace(".", "").isidentifier():
            raise ValueError(f"cannot parse SET assignment: {p.strip()!r}")
        out[col.strip()] = rhs.strip()
    return out


def _merge_keys(on: str, talias: str, salias: str) -> list[str]:
    """ON must be `t.k = s.k [AND ...]` equality pairs on the SAME
    column name each side, one alias per side (either order) — the
    merge keys. Same-alias comparisons like `t.k = t.k` are rejected:
    in SQL that is an always-true predicate (a cross join), not a key."""
    keys = []
    for clause in re.split(r"\s+AND\s+", on.strip(), flags=re.IGNORECASE):
        m = re.match(
            rf"^\s*({talias}|{salias})\.(\w+)\s*=\s*"
            rf"({talias}|{salias})\.(\w+)\s*$",
            clause,
            re.IGNORECASE,
        )
        if (
            not m
            or m.group(2).lower() != m.group(4).lower()
            or m.group(1).lower() == m.group(3).lower()
        ):
            raise ValueError(
                f"MERGE ON clause must be t.col = s.col equality pairs "
                f"(one alias per side); got {clause.strip()!r}"
            )
        keys.append(m.group(2))
    return keys


def _execute_merge(spark: SparkSession, mm, tables: dict[str, str]) -> int:
    """Lower a parsed MERGE. Two modes:

    STAR mode (`UPDATE SET *` / `INSERT *`, optional guarded DELETE) —
    the CDC-apply shape — maps 1:1 onto snapshots.merge_into (whole-row
    replace / insert / tombstone).

    COLUMN mode (`UPDATE SET col = expr` and/or `INSERT (cols) VALUES
    (exprs)`, expressions free to reference t.<col> and s.<col>) lowers
    by CONSTRUCTING the effective whole-row source: matched rows
    evaluate each target column as its assignment (unassigned columns
    keep the target value — SQL UPDATE semantics), unmatched source
    rows evaluate the INSERT list (unlisted columns NULL), and the
    union feeds the same whole-row merge_into. One extra key join
    against the current snapshot — broadcast when the source is small,
    the same shape merge_into's own affected-file scan uses. The
    guarded DELETE branch is star-mode only (a column-mode tombstone
    would need the merge commit to see the guard, not a precomputed
    row)."""
    talias = mm.group("talias") or mm.group("table")
    salias = mm.group("salias") or mm.group("source")
    # a dotted table/source name used as its own implicit alias would
    # need schema-qualified column resolution (and would break the
    # alias regexes) — require an explicit alias instead
    for a in (talias, salias):
        if "." in a:
            raise ValueError(
                f"dotted name {a!r} needs an explicit alias in MERGE "
                "(e.g. MERGE INTO db.tbl AS t ...)"
            )
    keys = _merge_keys(mm.group("on"), talias, salias)
    table_dir = tables[mm.group("table")]

    delete_condition = None
    upd_sets: dict[str, str] | None = None
    ins_cols: list[str] | None = None
    ins_vals: list[str] | None = None
    ins_cond: str | None = None
    saw_star_update = saw_star_insert = False
    matched_order: list[tuple[str, bool]] = []  # (kind, has_guard) in text order
    whens_text = mm.group("whens")
    cursor = 0
    for w in _WHEN_RE.finditer(whens_text):
        if whens_text[cursor : w.start()].strip():
            raise ValueError(
                "cannot parse MERGE clause fragment: "
                f"{whens_text[cursor : w.start()].strip()!r}"
            )
        cursor = w.end()
        action = w.group("action").strip()
        action_norm = re.sub(r"\s+", " ", action).upper()
        # one clause per kind: a second INSERT / UPDATE / DELETE branch
        # would silently overwrite the first (multi-branch same-kind
        # MERGE is outside the grammar — raise, never guess)
        if w.group("not"):
            if not action_norm.startswith("INSERT"):
                raise ValueError("WHEN NOT MATCHED supports INSERT only")
            if saw_star_insert or ins_cols is not None:
                raise ValueError(
                    "only one WHEN NOT MATCHED ... INSERT clause is supported"
                )
            if action_norm == "INSERT *":
                if w.group("cond"):
                    raise ValueError(
                        "WHEN NOT MATCHED AND <cond> THEN INSERT * is not "
                        "supported in star mode — guards are column-mode only"
                    )
                saw_star_insert = True
            else:
                ins_cond = w.group("cond")
                am = re.match(
                    r"INSERT\s*\((?P<cols>[^)]*)\)\s*VALUES\s*\((?P<vals>.*)\)\s*$",
                    action,
                    re.IGNORECASE | re.DOTALL,
                )
                if not am:
                    raise ValueError(f"cannot parse INSERT clause: {action!r}")
                ins_cols = [c.strip() for c in am.group("cols").split(",")]
                ins_vals = [
                    v.strip() for v in _split_top_level_commas(am.group("vals"))
                ]
                if len(ins_cols) != len(ins_vals):
                    raise ValueError("INSERT column/value count mismatch")
        elif action_norm == "DELETE":
            if delete_condition is not None:
                raise ValueError(
                    "only one WHEN MATCHED ... DELETE clause is supported"
                )
            delete_condition = w.group("cond") or "TRUE"
            matched_order.append(("DELETE", w.group("cond") is not None))
        elif action_norm == "UPDATE SET *":
            if w.group("cond"):
                raise ValueError(
                    "WHEN MATCHED AND <cond> THEN UPDATE is not "
                    "supported — only the DELETE branch takes a guard"
                )
            if saw_star_update or upd_sets is not None:
                raise ValueError(
                    "only one WHEN MATCHED ... UPDATE clause is supported"
                )
            saw_star_update = True
            matched_order.append(("UPDATE", False))
        elif action_norm.startswith("UPDATE SET "):
            if w.group("cond"):
                raise ValueError(
                    "WHEN MATCHED AND <cond> THEN UPDATE is not "
                    "supported — only the DELETE branch takes a guard"
                )
            if saw_star_update or upd_sets is not None:
                raise ValueError(
                    "only one WHEN MATCHED ... UPDATE clause is supported"
                )
            upd_sets = _split_assignments(action[len("UPDATE SET ") :])
        else:
            # e.g. WHEN MATCHED THEN INSERT — matched by the action
            # regex but meaningless in the matched branch
            raise ValueError(
                f"unsupported WHEN MATCHED action: {action!r}"
            )

    if whens_text[cursor:].strip(" \t\n;"):
        raise ValueError(
            "cannot parse MERGE clause fragment: "
            f"{whens_text[cursor:].strip()!r}"
        )
    star_mode = saw_star_update or saw_star_insert
    if star_mode and (upd_sets or ins_cols):
        raise ValueError("cannot mix SET */INSERT * with column-level clauses")

    if star_mode:
        if not (saw_star_update and saw_star_insert):
            raise ValueError(
                "star-mode MERGE must carry WHEN MATCHED THEN UPDATE SET * "
                "and WHEN NOT MATCHED THEN INSERT * (the CDC-apply shape)"
            )
        # ANSI/Delta evaluate WHEN MATCHED clauses in textual order and
        # require every clause but the LAST to carry a condition. This
        # engine executes the DELETE branch before UPDATE SET *, so the
        # only text both engines agree on is `WHEN MATCHED AND cond
        # THEN DELETE` FOLLOWED by the unconditioned UPDATE. Silently
        # accepting the other orders would execute semantics a
        # warehouse engine rejects outright — raise instead.
        if len(matched_order) == 2:
            first = matched_order[0]
            if first == ("UPDATE", False):
                raise ValueError(
                    "star-mode MERGE: unconditioned UPDATE SET * before a "
                    "DELETE clause — matched clauses evaluate in order, so "
                    "the DELETE would be unreachable; put `WHEN MATCHED AND "
                    "<cond> THEN DELETE` first"
                )
            if first == ("DELETE", False):
                raise ValueError(
                    "star-mode MERGE: unconditioned DELETE before UPDATE "
                    "SET * — only the last WHEN MATCHED clause may omit its "
                    "condition; guard the DELETE"
                )
        if delete_condition:
            delete_condition = _strip_alias_outside_quotes(
                delete_condition, salias
            )
        # ANSI MERGE semantics for the DELETE guard: WHEN MATCHED AND
        # cond THEN DELETE affects matched rows only — an unmatched
        # delete-marked source row falls through to INSERT * (the
        # CDC-apply rule, where tombstones never insert, stays the
        # default for the Python merge_into / APPLY CHANGES callers)
        return SNAP.merge_into(
            spark, table_dir, spark.table(mm.group("source")), key_cols=keys,
            delete_condition=delete_condition,
            delete_matched_only=True,
        )

    if upd_sets is None and ins_cols is None:
        raise ValueError(
            "MERGE needs UPDATE SET and/or INSERT clauses"
        )
    if delete_condition:
        raise ValueError("guarded DELETE is star-mode only")
    source = spark.table(mm.group("source"))
    tgt = SNAP.read_version(spark, table_dir)
    target_cols = tgt.columns
    unknown = sorted(
        {re.sub(rf"^{talias}\.", "", c, flags=re.IGNORECASE) for c in (upd_sets or {})}
        - set(target_cols)
    )
    if unknown:
        raise ValueError(f"UPDATE SET references unknown columns: {unknown}")
    key_set = {k.lower() for k in keys}
    key_updates = sorted(
        c
        for c in (upd_sets or {})
        if re.sub(rf"^{talias}\.", "", c, flags=re.IGNORECASE).lower()
        in key_set
    )
    if key_updates:
        # the whole-row lowering matches on the NEW key, so a key
        # rewrite would leave the old row AND append a new one —
        # reject, as warehouses do (merge keys are immutable in MERGE)
        raise ValueError(
            f"UPDATE SET cannot assign merge-key columns: {key_updates}"
        )
    t = tgt.alias(talias)
    s = source.alias(salias)
    on = [F.col(f"{talias}.{k}") == F.col(f"{salias}.{k}") for k in keys]
    sets = {
        re.sub(rf"^{talias}\.", "", c, flags=re.IGNORECASE): e
        for c, e in (upd_sets or {}).items()
    }
    if upd_sets is not None:
        upd_rows = s.join(t, on, "inner").select(
            *[
                F.expr(sets.get(c, f"{talias}.{c}")).alias(c)
                for c in target_cols
            ]
        )
    else:
        # INSERT-only MERGE: matched rows are untouched — feeding them
        # through the whole-row path would rewrite every file holding
        # a matched key just to re-emit identical rows; skipping them
        # makes merge_into a pure append of the unmatched inserts
        upd_rows = None
    if ins_cols is not None:
        ins_map = dict(zip(ins_cols, ins_vals))
        bad = sorted(set(ins_map) - set(target_cols))
        if bad:
            raise ValueError(f"INSERT references unknown columns: {bad}")
        unmatched = s.join(t, on, "left_anti")
        if ins_cond:
            # the NOT MATCHED guard sees source columns (s.<col>)
            unmatched = unmatched.where(F.expr(ins_cond))
        ins_rows = (
            unmatched
            .select(
                *[
                    F.expr(ins_map[c]).alias(c)
                    if c in ins_map
                    else F.lit(None).alias(c)
                    for c in target_cols
                ]
            )
        )
    else:  # no INSERT branch: unmatched source rows are ignored
        ins_rows = None
    if upd_rows is None:
        eff = ins_rows  # never None: upd_sets/ins_cols can't both be absent
    elif ins_rows is None:
        eff = upd_rows
    else:
        eff = upd_rows.unionByName(ins_rows)
    # cast each column to the target's dtype so the whole-row merge
    # appends schema-identical rows (expressions may widen types)
    dtypes = dict(tgt.dtypes)
    eff = eff.select(
        *[F.col(c).cast(dtypes[c]).alias(c) for c in target_cols]
    )
    return SNAP.merge_into(spark, table_dir, eff, key_cols=keys)


def _strip_alias_outside_quotes(cond: str, alias: str) -> str:
    """Remove `alias.` prefixes from a condition WITHOUT touching the
    inside of string literals (re.sub would rewrite `'see s.3'`)."""
    pat = re.compile(rf"\b{alias}\.", re.IGNORECASE)
    out = []
    i, n = 0, len(cond)
    while i < n:
        ch = cond[i]
        if ch in "'\"":
            j = i + 1
            while j < n and cond[j] != ch:
                j += 1
            out.append(cond[i : j + 1])
            i = j + 1
            continue
        m = pat.match(cond, i)
        if m and (i == 0 or not (cond[i - 1].isalnum() or cond[i - 1] in "_.")):
            i = m.end()  # drop the alias prefix
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _split_top_level_commas(text: str) -> list[str]:
    parts, part, depth, quote = [], "", 0, None
    for ch in text:
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
    return parts


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

    mt = _TRUNCATE_RE.match(sql_text)
    if mt:
        # SQL TRUNCATE: all rows gone, schema and table history kept —
        # one zero-row overwrite commit (prior versions still
        # time-travel; no file rewrite of the old data)
        table_dir = tables[mt.group("table")]
        empty = SNAP.read_version(spark, table_dir).limit(0)
        return SNAP.write_version(empty, table_dir, mode="overwrite")

    ma = _ALTER_RENAME_RE.match(sql_text)
    if ma:
        # metadata-only column mapping (FORMAT.md): zero bytes move
        return SNAP.rename_column(
            tables[ma.group("table")], ma.group("old"), ma.group("new")
        )

    md = _ALTER_DROP_RE.match(sql_text)
    if md:
        return SNAP.drop_column(tables[md.group("table")], md.group("col"))

    mk = _ALTER_ADD_CK_RE.match(sql_text)
    if mk:
        # validates the CURRENT snapshot before committing (Delta
        # ADD CONSTRAINT contract); later appends re-enforce it
        return SNAP.add_constraint(
            spark, tables[mk.group("table")], mk.group("name"), mk.group("pred")
        )

    mdk = _ALTER_DROP_CK_RE.match(sql_text)
    if mdk:
        return SNAP.drop_constraint(
            tables[mdk.group("table")], mdk.group("name")
        )

    mc = _ALTER_ADD_RE.match(sql_text)
    if mc:
        fields: dict[str, str] = {}
        for part in _split_top_level_commas(mc.group("fields")):
            toks = part.strip().split(None, 1)
            if len(toks) != 2:
                raise ValueError(f"ALTER ADD COLUMNS: bad field {part!r}")
            fields[toks[0]] = toks[1]
        return SNAP.add_columns(tables[mc.group("table")], fields)

    mi = _INSERT_RE.match(sql_text)
    if mi:
        df = spark.sql(mi.group("body"))
        tgt = SNAP.read_version(spark, tables[mi.group("table")])
        if len(df.columns) != len(tgt.columns):
            raise ValueError(
                f"INSERT arity mismatch: {len(df.columns)} values for "
                f"{len(tgt.columns)} target columns"
            )
        # SQL INSERT binds by POSITION: rename to the target's columns
        # and cast to its dtypes (VALUES literals type narrowly)
        df = df.toDF(*tgt.columns).select(
            *[F.col(c).cast(t).alias(c) for c, t in tgt.dtypes]
        )
        return SNAP.write_version(
            df, tables[mi.group("table")], mode="append"
        )

    mm = _MERGE_RE.match(sql_text)
    if mm:
        return _execute_merge(spark, mm, tables)

    mu = _UPDATE_RE.match(sql_text)
    if mu:
        return SNAP.update_where(
            spark,
            tables[mu.group("table")],
            mu.group("cond") or "TRUE",
            _split_assignments(mu.group("sets")),
        )

    raise ValueError(f"unsupported DML statement: {sql_text[:120]!r}")
