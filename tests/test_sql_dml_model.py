"""Model-based randomized testing of the ANSI DML front end
(operators/sql_dml.py): seeded random sequences of DELETE / UPDATE /
INSERT / TRUNCATE / star- and column-mode MERGE statements run against
BOTH the real snapshot table and a trivial in-memory dict model; after
every statement the table must equal the model exactly.

This is the artillery behind the parser contracts: the round-7
reviews found six silent-wrong-data holes one at a time (dropped
guards, overwritten duplicate clauses, truncated actions) — this
harness exercises the statement space systematically so the next hole
shows up as a value diff at the exact statement that introduced it."""

from __future__ import annotations

import random

import pytest

from binance_etl_spark.operators import snapshots as SNAP
from binance_etl_spark.operators.sql_dml import execute_dml


def _read(spark, table) -> dict[int, tuple[int, int]]:
    return {
        r["id"]: (r["a"], r["b"])
        for r in SNAP.read_version(spark, table).collect()
    }


def _mk_df(spark, rows: dict[int, tuple[int, int]]):
    data = [(k, a, b) for k, (a, b) in sorted(rows.items())]
    return spark.createDataFrame(data, "id long, a long, b long").repartition(2)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_random_dml_sequences_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    table = str(tmp_path / f"dml{seed}")
    model: dict[int, tuple[int, int]] = {
        i: (i * 3, i % 5) for i in range(30)
    }
    SNAP.write_version(_mk_df(spark, model), table)
    next_id = 30
    stmts: list[str] = []

    def check() -> None:
        got = _read(spark, table)
        assert got == model, f"seed {seed} after: {stmts[-1]!r}"

    for step in range(12):
        op = rng.choice(
            [
                "delete",
                "update",
                "update_all",
                "insert",
                "insert_select",
                "merge_star",
                "merge_cols",
            ]
            + (["truncate"] if step == 7 else [])
        )
        if op == "truncate":
            stmt = "TRUNCATE TABLE tbl"
            model = {}
        elif op == "update_all":
            add = rng.randrange(1, 9)
            stmt = f"UPDATE tbl SET a = a + {add}"
            model = {k: (a + add, b) for k, (a, b) in model.items()}
        elif op == "insert_select":
            lo, cnt = next_id, rng.randrange(1, 4)
            next_id += cnt
            stmt = (
                f"INSERT INTO tbl SELECT id + {lo}, id * 7, id % 6 "
                f"FROM range({cnt})"
            )
            for i in range(cnt):
                model[lo + i] = (i * 7, i % 6)
        elif op == "delete":
            cut = rng.randrange(0, 6)
            stmt = f"DELETE FROM tbl WHERE b = {cut}"
            model = {k: v for k, v in model.items() if v[1] != cut}
        elif op == "update":
            cut = rng.randrange(0, 6)
            add = rng.randrange(1, 9)
            stmt = f"UPDATE tbl SET a = a + {add}, b = b + 1 WHERE b = {cut}"
            model = {
                k: (a + add, b + 1) if b == cut else (a, b)
                for k, (a, b) in model.items()
            }
        elif op == "insert":
            vals = [(next_id + i, rng.randrange(100), rng.randrange(6))
                    for i in range(rng.randrange(1, 4))]
            next_id += len(vals)
            body = ", ".join(f"({k}, {a}, {b})" for k, a, b in vals)
            stmt = f"INSERT INTO tbl VALUES {body}"
            for k, a, b in vals:
                model[k] = (a, b)
        else:
            # a source mixing existing keys, new keys, and (for star
            # mode) tombstone markers in b
            src_rows = []
            for _ in range(rng.randrange(2, 6)):
                if model and rng.random() < 0.6:
                    k = rng.choice(sorted(model))
                else:
                    k, next_id = next_id, next_id + 1
                src_rows.append((k, rng.randrange(100), rng.randrange(-1, 6)))
            # last write wins per key in the model; merge_into requires
            # unique source keys, so dedupe keeping the last
            dedup = {k: (a, b) for k, a, b in src_rows}
            src_rows = [(k, a, b) for k, (a, b) in dedup.items()]
            spark.createDataFrame(
                src_rows, "id long, a long, b long"
            ).createOrReplaceTempView(f"src_{seed}_{step}")
            view = f"src_{seed}_{step}"
            if op == "merge_star":
                guarded = rng.random() < 0.5
                guard = "WHEN MATCHED AND s.b = -1 THEN DELETE " if guarded else ""
                stmt = (
                    f"MERGE INTO tbl t USING {view} s ON t.id = s.id "
                    f"{guard}"
                    "WHEN MATCHED THEN UPDATE SET * "
                    "WHEN NOT MATCHED THEN INSERT *"
                )
                for k, a, b in src_rows:
                    if k in model and guarded and b == -1:
                        del model[k]
                    else:
                        model[k] = (a, b)
            else:
                add = rng.randrange(1, 9)
                with_ins = rng.random() < 0.7
                with_guard = with_ins and rng.random() < 0.5
                guard = "AND s.b >= 2 " if with_guard else ""
                ins = (
                    f"WHEN NOT MATCHED {guard}THEN "
                    "INSERT (id, a, b) VALUES (s.id, s.a * 2, s.b)"
                    if with_ins
                    else ""
                )
                stmt = (
                    f"MERGE INTO tbl t USING {view} s ON t.id = s.id "
                    f"WHEN MATCHED THEN UPDATE SET "
                    f"a = t.a + s.a + {add}, "
                    f"b = CASE WHEN s.b >= 0 THEN s.b ELSE t.b END "
                    f"{ins}"
                )
                for k, a, b in src_rows:
                    if k in model:
                        ta, tb = model[k]
                        model[k] = (ta + a + add, b if b >= 0 else tb)
                    elif with_ins and (not with_guard or b >= 2):
                        model[k] = (a * 2, b)
        stmts.append(stmt)
        execute_dml(spark, stmt, {"tbl": table})
        check()

    # close with TRUNCATE: rows gone, schema + history survive
    execute_dml(spark, "TRUNCATE TABLE tbl", {"tbl": table})
    assert _read(spark, table) == {}
    assert len(SNAP.main_versions(table)) >= 13


@pytest.mark.parametrize("seed", [100, 101, 102])
def test_concurrent_two_writer_dml_serializes(spark, tmp_path, seed):
    """Two REAL threads fire random DML statements at ONE snapshot
    table concurrently. The serializable-commit layer promises commit
    order == claim order, every rewrite retries against the new head,
    and no statement is lost — so the final table must equal the
    in-memory model produced by applying each committed statement's
    transformation IN COMMIT-VERSION ORDER (the serial schedule the
    log actually chose). Composes the threaded snapshot race tests
    with the single-writer DML model fuzz."""
    import threading

    table = str(tmp_path / f"cdml{seed}")
    init = {i: (i * 3, i % 5) for i in range(40)}
    SNAP.write_version(_mk_df(spark, init), table)

    committed: list[tuple[int, object]] = []  # (version, transform)
    aborted: list[str] = []
    lock = threading.Lock()
    errors: list[str] = []

    def writer(tid: int) -> None:
        rng = random.Random(seed * 10 + tid)
        next_id = 1000 * (tid + 1)
        for step in range(6):
            op = rng.choice(["delete", "update", "insert", "merge_star"])
            if op == "delete":
                cut = rng.randrange(0, 6)
                stmt = f"DELETE FROM tbl WHERE b = {cut}"

                def tf(m, cut=cut):
                    return {k: v for k, v in m.items() if v[1] != cut}

            elif op == "update":
                cut = rng.randrange(0, 6)
                add = rng.randrange(1, 9)
                stmt = (
                    f"UPDATE tbl SET a = a + {add}, b = b + 1 "
                    f"WHERE b = {cut}"
                )

                def tf(m, cut=cut, add=add):
                    return {
                        k: (a + add, b + 1) if b == cut else (a, b)
                        for k, (a, b) in m.items()
                    }

            elif op == "insert":
                vals = [
                    (next_id + i, rng.randrange(100), rng.randrange(6))
                    for i in range(rng.randrange(1, 4))
                ]
                next_id += len(vals)
                body = ", ".join(f"({k}, {a}, {b})" for k, a, b in vals)
                stmt = f"INSERT INTO tbl VALUES {body}"

                def tf(m, vals=tuple(vals)):
                    m = dict(m)
                    for k, a, b in vals:
                        m[k] = (a, b)
                    return m

            else:
                src_rows = [
                    (rng.randrange(0, 40), rng.randrange(100), rng.randrange(6))
                    for _ in range(rng.randrange(2, 5))
                ]
                src_rows += [(next_id, rng.randrange(100), rng.randrange(6))]
                next_id += 1
                dedup = {k: (a, b) for k, a, b in src_rows}
                src_rows = [(k, a, b) for k, (a, b) in dedup.items()]
                view = f"csrc_{seed}_{tid}_{step}"
                spark.createDataFrame(
                    src_rows, "id long, a long, b long"
                ).createOrReplaceTempView(view)
                stmt = (
                    f"MERGE INTO tbl t USING {view} s ON t.id = s.id "
                    "WHEN MATCHED THEN UPDATE SET * "
                    "WHEN NOT MATCHED THEN INSERT *"
                )

                def tf(m, rows=tuple(src_rows)):
                    m = dict(m)
                    for k, a, b in rows:
                        m[k] = (a, b)
                    return m

            try:
                v = execute_dml(spark, stmt, {"tbl": table})
            except RuntimeError as exc:
                # losing the bounded optimistic-conflict race (4
                # retries) is a LEGAL outcome under a two-writer
                # barrage — the statement aborts BEFORE its manifest
                # commit (raise precedes _commit_manifest), so it must
                # leave no trace; anything else is a real failure
                if "optimistic-conflict race" not in str(exc):
                    errors.append(f"writer {tid} step {step} {stmt!r}: {exc}")
                    return
                with lock:
                    aborted.append(stmt)
                continue
            except Exception as exc:  # no statement may be refused
                errors.append(f"writer {tid} step {step} {stmt!r}: {exc}")
                return
            with lock:
                committed.append((v, tf))

    threads = [threading.Thread(target=writer, args=(t,)) for t in (0, 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert len(committed) + len(aborted) == 12
    # the retry loop must absorb most contention: a barrage where half
    # the statements abort would gut the test (and the engine)
    assert len(committed) >= 9, f"only {len(committed)} committed: {aborted}"
    versions = [v for v, _ in committed]
    assert len(set(versions)) == len(versions), "duplicate commit versions"

    model = dict(init)
    for _, tf in sorted(committed, key=lambda p: p[0]):
        model = tf(model)
    assert _read(spark, table) == model


@pytest.mark.parametrize("seed", [20, 21])
def test_concurrent_alter_vs_dml_serializes(spark, tmp_path, seed):
    """One thread fires DML (UPDATE/DELETE/INSERT through the text
    front end) while another fires ALTER TABLE RENAME COLUMN — the
    composition of the 2-writer DML fuzz with the schema-edit
    artillery, generalizing the deterministic append-vs-rename race
    pin (test_column_mapping.py). Contract: every statement either
    COMMITS (and the final state equals the in-memory model replayed
    in commit-version order, under whatever logical name won) or
    aborts CLEANLY through one of the classified conflict channels
    (optimistic-conflict retry exhaustion, concurrent column-mapping
    change, stale-name resolution failure) leaving no trace — never a
    mixed-name file, a lost statement, or silent wrong data."""
    import threading

    table = str(tmp_path / f"adml{seed}")
    init = {i: i * 3 for i in range(40)}
    spark.createDataFrame(
        sorted(init.items()), "id long, v long"
    ).repartition(2).write.mode("overwrite").parquet(str(tmp_path / "seed"))
    SNAP.write_version(
        spark.read.parquet(str(tmp_path / "seed")), table
    )

    committed: list[tuple[int, str, object]] = []  # (version, kind, arg)
    aborted: list[str] = []
    errors: list[str] = []
    lock = threading.Lock()

    _LEGAL = (
        "optimistic-conflict race",
        "concurrent column-mapping",
        "UNRESOLVED_COLUMN",
        "cannot be resolved",
        "unknown column",
        "no column",
    )

    def current_value_col() -> str:
        m = SNAP._load_manifest(table, SNAP.main_versions(table)[-1])
        return [
            f["name"] for f in m["schema"]["fields"] if f["name"] != "id"
        ][0]

    def run_stmt(stmt: str, kind: str, arg, tid: int, step: int) -> None:
        try:
            v = execute_dml(spark, stmt, {"tbl": table})
        except Exception as exc:
            if any(tok in str(exc) for tok in _LEGAL):
                with lock:
                    aborted.append(f"{stmt!r}: {type(exc).__name__}")
                return
            with lock:
                errors.append(f"writer {tid} step {step} {stmt!r}: {exc}")
            return
        with lock:
            committed.append((v, kind, arg))

    def dml_writer() -> None:
        rng = random.Random(seed * 100)
        next_id = 5000
        for step in range(8):
            op = rng.choice(["update", "delete", "insert"])
            col = current_value_col()
            if op == "update":
                mod, res = rng.randint(2, 6), 0
                res = rng.randrange(mod)
                add = rng.randrange(1, 9)
                run_stmt(
                    f"UPDATE tbl SET {col} = {col} + {add} "
                    f"WHERE id % {mod} = {res}",
                    "update",
                    (mod, res, add),
                    0,
                    step,
                )
            elif op == "delete":
                mod = rng.randint(3, 7)
                res = rng.randrange(mod)
                run_stmt(
                    f"DELETE FROM tbl WHERE id % {mod} = {res}",
                    "delete",
                    (mod, res),
                    0,
                    step,
                )
            else:
                vals = [
                    (next_id + i, rng.randrange(1000))
                    for i in range(rng.randrange(1, 3))
                ]
                next_id += len(vals)
                body = ", ".join(str(t) for t in vals)
                run_stmt(
                    f"INSERT INTO tbl VALUES {body}",
                    "insert",
                    tuple(vals),
                    0,
                    step,
                )

    def alter_writer() -> None:
        for step in range(4):
            col = current_value_col()
            new = f"r{seed}_{step}"
            run_stmt(
                f"ALTER TABLE tbl RENAME COLUMN {col} TO {new}",
                "rename",
                new,
                1,
                step,
            )

    threads = [
        threading.Thread(target=dml_writer),
        threading.Thread(target=alter_writer),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert len(committed) + len(aborted) == 12
    versions = [v for v, _, _ in committed]
    assert len(set(versions)) == len(versions), "duplicate commit versions"
    # the conflict channels must not gut the campaign — but the bound
    # is deliberately loose: thread interleaving is not seeded, and an
    # unlucky schedule can legally abort several statements
    assert len(committed) >= 6, f"only {len(committed)} committed: {aborted}"

    model = dict(init)
    name = "v"
    for _, kind, arg in sorted(committed, key=lambda p: p[0]):
        if kind == "rename":
            name = arg
        elif kind == "update":
            mod, res, add = arg
            model = {
                k: (x + add if k % mod == res else x)
                for k, x in model.items()
            }
        elif kind == "delete":
            mod, res = arg
            model = {k: x for k, x in model.items() if k % mod != res}
        else:
            model.update(dict(arg))
    got_df = SNAP.read_version(spark, table)
    assert got_df.columns == ["id", name]
    got = {r["id"]: r[name] for r in got_df.collect()}
    assert got == model


@pytest.mark.parametrize("seed", list(range(30, 40)))
def test_concurrent_maintenance_vs_dml_serializes(spark, tmp_path, seed):
    """Round-10 widening of the concurrent campaign (r9 verdict item
    6): a MAINTENANCE thread interleaves vacuum, RESTORE, and branch
    write-audit-publish with the DML thread and the ALTER-RENAME
    thread — 10 seeds. Contract: every operation either COMMITS (and
    the final table equals the in-memory model replayed in
    commit-version order, with RESTORE rewinding the model to the
    recorded state of its target version and PUBLISH appending the
    staged rows) or aborts CLEANLY through a classified channel
    (optimistic-conflict exhaustion, concurrent column-mapping change,
    stale-name resolution, fast-forward refusal, target expired by
    vacuum) — never lost rows, mixed-name files, or silent wrong data.
    Vacuum itself is model-invisible: keep_last=10 over a <=20-commit
    campaign keeps every version a concurrent statement can base on."""
    import threading

    table = str(tmp_path / f"mnt{seed}")
    init = {i: i * 3 for i in range(40)}
    spark.createDataFrame(
        sorted(init.items()), "id long, v long"
    ).repartition(2).write.mode("overwrite").parquet(str(tmp_path / "seed"))
    v0 = SNAP.write_version(spark.read.parquet(str(tmp_path / "seed")), table)

    committed: list[tuple[int, str, object]] = []
    aborted: list[str] = []
    errors: list[str] = []
    lock = threading.Lock()

    # ANCHORED abort channels — each token is the distinctive phrase of
    # ONE known raise site, so an unrelated regression whose message
    # merely contains e.g. 'no column' cannot masquerade as a clean
    # abort (review r10 finding).
    _LEGAL = (
        "lost the optimistic-conflict race",   # *_into/where retry exhaustion
        "concurrent column-mapping change",    # append vs rename race
        "UNRESOLVED_COLUMN",                   # Spark: stale name in DML text
        "cannot be resolved",                  # Spark analyzer twin of above
        "references unknown columns",          # sql_dml SET/INSERT validation
        "update_where: unknown columns",       # stale name raced by RENAME
        "update_where_mor: unknown columns",   # MOR twin of above
        "rename_column: no column",            # stale rename src (RESTORE/race)
        "fast-forward publish would drop",     # publish vs advanced main
        "not committed in",                    # restore target vacuumed away
    )

    def legal(exc: Exception) -> bool:
        return any(tok in str(exc) for tok in _LEGAL)

    def head_manifest() -> dict:
        return SNAP._load_manifest(table, SNAP.main_versions(table)[-1])

    def value_col(m: dict) -> str:
        return [
            f["name"] for f in m["schema"]["fields"] if f["name"] != "id"
        ][0]

    def run_stmt(stmt: str, kind: str, arg, tid: int, step: int) -> None:
        try:
            v = execute_dml(spark, stmt, {"tbl": table})
        except Exception as exc:
            if legal(exc):
                with lock:
                    aborted.append(f"{stmt!r}: {type(exc).__name__}")
                return
            with lock:
                errors.append(f"writer {tid} step {step} {stmt!r}: {exc}")
            return
        with lock:
            committed.append((v, kind, arg))

    def dml_writer() -> None:
        rng = random.Random(seed * 1000)
        next_id = 5000
        for step in range(8):
            op = rng.choice(["update", "delete", "insert"])
            col = value_col(head_manifest())
            if op == "update":
                mod = rng.randint(2, 6)
                res = rng.randrange(mod)
                add = rng.randrange(1, 9)
                run_stmt(
                    f"UPDATE tbl SET {col} = {col} + {add} "
                    f"WHERE id % {mod} = {res}",
                    "update", (mod, res, add), 0, step,
                )
            elif op == "delete":
                mod = rng.randint(3, 7)
                res = rng.randrange(mod)
                run_stmt(
                    f"DELETE FROM tbl WHERE id % {mod} = {res}",
                    "delete", (mod, res), 0, step,
                )
            else:
                vals = [
                    (next_id + i, rng.randrange(1000))
                    for i in range(rng.randrange(1, 3))
                ]
                next_id += len(vals)
                body = ", ".join(str(t) for t in vals)
                run_stmt(
                    f"INSERT INTO tbl VALUES {body}",
                    "insert", tuple(vals), 0, step,
                )

    def alter_writer() -> None:
        for step in range(3):
            col = value_col(head_manifest())
            new = f"m{seed}_{step}"
            run_stmt(
                f"ALTER TABLE tbl RENAME COLUMN {col} TO {new}",
                "rename", new, 1, step,
            )

    def maintenance_writer() -> None:
        rng = random.Random(seed * 7 + 1)
        branch_n = 0
        next_id = 9000 + seed
        for step in range(6):
            op = rng.choice(["vacuum", "restore", "publish"])
            try:
                if op == "vacuum":
                    SNAP.vacuum(table, keep_last=10)
                    with lock:
                        aborted.append("vacuum: model-invisible")  # bookkeeping
                elif op == "restore":
                    mains = SNAP.main_versions(table)
                    target = rng.choice(mains[-3:])
                    v = SNAP.restore(table, target)
                    with lock:
                        committed.append((v, "restore", target))
                else:
                    branch_n += 1
                    name = f"wap{seed}_{branch_n}"
                    base = SNAP.create_branch(table, name)
                    bm = SNAP._load_manifest(table, base)
                    col = value_col(bm)
                    rows = [(next_id, rng.randrange(1000))]
                    next_id += 1
                    bdf = spark.createDataFrame(
                        rows, f"id long, {col} long"
                    )
                    SNAP.write_branch(bdf, table, name, mode="append")
                    v = SNAP.publish_branch(table, name)
                    SNAP.drop_ref(table, name)
                    with lock:
                        committed.append((v, "publish", tuple(rows)))
            except Exception as exc:
                if legal(exc):
                    with lock:
                        aborted.append(f"{op}: {type(exc).__name__}")
                else:
                    with lock:
                        errors.append(f"maintenance step {step} {op}: {exc}")

    threads = [
        threading.Thread(target=dml_writer),
        threading.Thread(target=alter_writer),
        threading.Thread(target=maintenance_writer),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert len(committed) + len(aborted) == 17
    vs = [v for v, _, _ in committed]
    assert len(set(vs)) == len(vs), "duplicate commit versions"
    assert len(committed) >= 8, f"only {len(committed)} committed: {aborted}"

    # replay in commit-version order; states[v] lets RESTORE rewind
    model = dict(init)
    name = "v"
    states: dict[int, tuple[dict, str]] = {v0: (dict(model), name)}
    for v, kind, arg in sorted(committed, key=lambda p: p[0]):
        if kind == "rename":
            name = arg
        elif kind == "update":
            mod, res, add = arg
            model = {
                k: (x + add if k % mod == res else x)
                for k, x in model.items()
            }
        elif kind == "delete":
            mod, res = arg
            model = {k: x for k, x in model.items() if k % mod != res}
        elif kind == "insert":
            model.update(dict(arg))
        elif kind == "publish":
            model.update(dict(arg))
        elif kind == "restore":
            m, n = states[arg]
            model, name = dict(m), n
        states[v] = (dict(model), name)
    got_df = SNAP.read_version(spark, table)
    assert got_df.columns == ["id", name]
    got = {r["id"]: r[name] for r in got_df.collect()}
    assert got == model
