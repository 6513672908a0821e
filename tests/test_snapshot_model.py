"""Model-based randomized testing of the snapshot log: a seeded random
sequence of table operations (append / CoW + MOR delete / CoW + MOR
update / merge / compact / restore / vacuum) runs against BOTH the real
log and a trivial in-memory model; after every step the latest
snapshot must equal the model exactly (full row multiset), and
metadata-only count_rows must agree.

This is the artillery behind the individual contracts: any
interaction bug between the features (a deletion vector resurrecting
rows through a compact, an update double-applying after a restore, a
carried bloom index breaking a read) shows up as a value diff at the
exact step that introduced it."""

from __future__ import annotations

import random

import pytest

from binance_etl_spark.operators import snapshots as SNAP


def _read_rows(spark, table) -> dict[int, int]:
    return {
        r["id"]: r["v"] for r in SNAP.read_version(spark, table).collect()
    }


def _mk_df(spark, rows: dict[int, int]):
    data = [(k, v) for k, v in sorted(rows.items())]
    return spark.createDataFrame(data, "id long, v long").repartition(2)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_random_op_sequences_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    table = str(tmp_path / f"tbl{seed}")

    model: dict[int, int] = {i: i * 2 for i in range(40)}
    SNAP.write_version(_mk_df(spark, model), table)
    next_id = 40
    history: list[dict[int, int]] = [dict(model)]  # per committed version

    def check(step: str) -> None:
        got = _read_rows(spark, table)
        assert got == model, f"seed {seed} step {step}: snapshot != model"
        assert SNAP.count_rows(table) == len(model), (
            f"seed {seed} step {step}: metadata count drift"
        )

    ops = []
    for _ in range(16):
        op = rng.choice(
            [
                "append",
                "delete_cow",
                "delete_mor",
                "update_cow",
                "update_mor",
                "merge",
                "compact",
                "restore",
                "wap_append",
                "clone_check",
            ]
        )
        ops.append(op)
        if op == "append":
            n = rng.randint(1, 15)
            batch = {next_id + i: (next_id + i) * 2 for i in range(n)}
            next_id += n
            SNAP.write_version(_mk_df(spark, batch), table)
            model.update(batch)
            history.append(dict(model))
        elif op in ("delete_cow", "delete_mor"):
            mod = rng.randint(2, 7)
            res = rng.randrange(mod)
            cond = f"id % {mod} = {res}"
            fn = SNAP.delete_where if op == "delete_cow" else SNAP.delete_where_mor
            fn(spark, table, cond)
            model = {k: v for k, v in model.items() if k % mod != res}
            history.append(dict(model))
        elif op in ("update_cow", "update_mor"):
            mod = rng.randint(2, 7)
            res = rng.randrange(mod)
            delta = rng.randint(1, 1000)
            cond = f"id % {mod} = {res}"
            fn = SNAP.update_where if op == "update_cow" else SNAP.update_where_mor
            fn(spark, table, cond, {"v": f"v + {delta}"})
            model = {
                k: (v + delta if k % mod == res else v) for k, v in model.items()
            }
            history.append(dict(model))
        elif op == "merge":
            # upsert a mix of existing and new keys
            keys = rng.sample(sorted(model) or [0], min(3, max(1, len(model))))
            src_rows = {k: rng.randint(0, 10_000) for k in keys}
            for i in range(2):
                src_rows[next_id] = next_id * 2
                next_id += 1
            if not model:
                continue  # merge needs a committed non-empty read path
            SNAP.merge_into(
                spark, table, _mk_df(spark, src_rows), ["id"]
            )
            model.update(src_rows)
            history.append(dict(model))
        elif op == "compact":
            mode_full = rng.random() < 0.5
            before = SNAP.main_versions(table)[-1]
            v = (
                SNAP.compact(spark, table, target_files=2)
                if mode_full
                else SNAP.compact(spark, table, min_file_bytes=50_000)
            )
            if v != before:  # incremental compact may no-op
                history.append(dict(model))
        elif op == "restore":
            # restore to a random earlier MAIN version; model rewinds
            mains = SNAP.main_versions(table)
            idx = rng.randrange(len(mains))
            SNAP.restore(table, mains[idx])
            model = dict(history[idx])
            history.append(dict(model))
        elif op == "wap_append":
            # stage on a branch, verify invisibility, publish, drop —
            # the WAP cycle against whatever state came before (DVs,
            # restores, clones all included)
            n = rng.randint(1, 10)
            batch = {next_id + i: (next_id + i) * 2 for i in range(n)}
            next_id += n
            name = f"b{len(ops)}"
            SNAP.create_branch(table, name)
            SNAP.write_branch(_mk_df(spark, batch), table, name)
            check(f"{len(ops)}:wap-staged-invisible")  # model unchanged
            SNAP.publish_branch(table, name)
            SNAP.drop_ref(table, name)
            model.update(batch)
            history.append(dict(model))
        elif op == "clone_check":
            # a shallow clone of the CURRENT state must read the model
            # exactly (borrowed files, vectors, and bloom sidecars)
            import shutil
            import uuid

            cdir = str(tmp_path / f"clone_{uuid.uuid4().hex[:8]}")
            SNAP.shallow_clone(table, cdir)
            got = {
                r["id"]: r["v"]
                for r in SNAP.read_version(spark, cdir).collect()
            }
            assert got == model, f"seed {seed} step {len(ops)}: clone != model"
            shutil.rmtree(cdir)
        check(f"{len(ops)}:{op}")

    # end-of-sequence maintenance must preserve the final state
    SNAP.compact(spark, table, target_files=2)
    check("final-compact")
    SNAP.vacuum(table, keep_last=1)
    check("post-vacuum")


@pytest.mark.parametrize("seed", [10, 11, 12, 13, 14])
def test_random_op_sequences_with_schema_edits(spark, tmp_path, seed):
    """The artillery with COLUMN MAPPING in the loop: random RENAME
    COLUMN commits interleave with appends, CoW/MOR deletes and
    updates, merges, compacts, restores, WAP publishes, and clone
    reads — the current logical column name is part of the model, and
    restore must rewind it (each version reads under its OWN name).
    `clone_edit` additionally RENAMES INSIDE a shallow clone and runs
    a MOR delete there (borrowed absolute files + clone-local mapping
    through _read_physical), asserting the source stays untouched."""
    rng = random.Random(seed)
    table = str(tmp_path / f"sch{seed}")

    col = "v"
    model: dict[int, int] = {i: i * 2 for i in range(30)}

    def mk_df(rows: dict[int, int], name: str):
        data = [(k, v) for k, v in sorted(rows.items())]
        return spark.createDataFrame(
            data, f"id long, {name} long"
        ).repartition(2)

    SNAP.write_version(mk_df(model, col), table)
    next_id = 30
    next_col = 0
    history: list[tuple[dict[int, int], str]] = [(dict(model), col)]

    def read_rows() -> dict[int, int]:
        df = SNAP.read_version(spark, table)
        assert df.columns == ["id", col], f"seed {seed}: schema drift"
        return {r["id"]: r[col] for r in df.collect()}

    def check(step: str) -> None:
        assert read_rows() == model, f"seed {seed} step {step}"
        assert SNAP.count_rows(table) == len(model), step

    ops = []
    for _ in range(14):
        op = rng.choice(
            [
                "append",
                "rename",
                "delete_mor",
                "update_cow",
                "update_mor",
                "merge",
                "compact",
                "restore",
                "wap_append",
                "clone_check",
                "clone_edit",
            ]
        )
        ops.append(op)
        step = f"{len(ops)}:{op}"
        if op == "append":
            n = rng.randint(1, 10)
            batch = {next_id + i: (next_id + i) * 2 for i in range(n)}
            next_id += n
            SNAP.write_version(mk_df(batch, col), table)
            model.update(batch)
            history.append((dict(model), col))
        elif op == "rename":
            new = f"c{next_col}"
            next_col += 1
            SNAP.rename_column(table, col, new)
            col = new
            history.append((dict(model), col))
        elif op == "delete_mor":
            mod = rng.randint(2, 7)
            res = rng.randrange(mod)
            SNAP.delete_where_mor(spark, table, f"id % {mod} = {res}")
            model = {k: v for k, v in model.items() if k % mod != res}
            history.append((dict(model), col))
        elif op in ("update_cow", "update_mor"):
            mod = rng.randint(2, 7)
            res = rng.randrange(mod)
            delta = rng.randint(1, 1000)
            fn = (
                SNAP.update_where
                if op == "update_cow"
                else SNAP.update_where_mor
            )
            fn(spark, table, f"id % {mod} = {res}", {col: f"{col} + {delta}"})
            model = {
                k: (v + delta if k % mod == res else v)
                for k, v in model.items()
            }
            history.append((dict(model), col))
        elif op == "merge":
            if not model:
                continue
            keys = rng.sample(sorted(model), min(3, len(model)))
            src = {k: rng.randint(0, 10_000) for k in keys}
            src[next_id] = next_id * 2
            next_id += 1
            SNAP.merge_into(spark, table, mk_df(src, col), ["id"])
            model.update(src)
            history.append((dict(model), col))
        elif op == "compact":
            before = SNAP.main_versions(table)[-1]
            v = SNAP.compact(spark, table, target_files=2)
            if v != before:
                history.append((dict(model), col))
        elif op == "restore":
            mains = SNAP.main_versions(table)
            idx = rng.randrange(len(mains))
            SNAP.restore(table, mains[idx])
            model, col = dict(history[idx][0]), history[idx][1]
            history.append((dict(model), col))
        elif op == "wap_append":
            n = rng.randint(1, 8)
            batch = {next_id + i: (next_id + i) * 2 for i in range(n)}
            next_id += n
            name = f"b{len(ops)}"
            SNAP.create_branch(table, name)
            SNAP.write_branch(mk_df(batch, col), table, name)
            check(f"{step}-staged-invisible")
            SNAP.publish_branch(table, name)
            SNAP.drop_ref(table, name)
            model.update(batch)
            history.append((dict(model), col))
        elif op == "clone_check":
            import shutil
            import uuid

            cdir = str(tmp_path / f"clone_{uuid.uuid4().hex[:8]}")
            SNAP.shallow_clone(table, cdir)
            cdf = SNAP.read_version(spark, cdir)
            assert cdf.columns == ["id", col], step
            got = {r["id"]: r[col] for r in cdf.collect()}
            assert got == model, step
            shutil.rmtree(cdir)
        elif op == "clone_edit":
            import shutil
            import uuid

            cdir = str(tmp_path / f"cedit_{uuid.uuid4().hex[:8]}")
            SNAP.shallow_clone(table, cdir)
            ccol = f"k{next_col}"
            next_col += 1
            SNAP.rename_column(cdir, col, ccol)
            mod = rng.randint(2, 7)
            res = rng.randrange(mod)
            SNAP.delete_where_mor(spark, cdir, f"id % {mod} = {res}")
            delta = rng.randint(1, 1000)
            SNAP.update_where_mor(
                spark, cdir, f"id % {mod} = {(res + 1) % mod}",
                {ccol: f"{ccol} + {delta}"},
            )
            cdf = SNAP.read_version(spark, cdir)
            assert cdf.columns == ["id", ccol], step
            got = {r["id"]: r[ccol] for r in cdf.collect()}
            want = {
                k: (v + delta if k % mod == (res + 1) % mod else v)
                for k, v in model.items()
                if k % mod != res
            }
            assert got == want, step
            shutil.rmtree(cdir)
        check(step)

    SNAP.compact(spark, table, target_files=2)
    check("final-compact")
    SNAP.vacuum(table, keep_last=1)
    check("post-vacuum")
