"""Shard the test suite across parallel pytest worker processes.

The full suite is ~30 min sequential — the round's dominant iteration
cost (round-9 verdict item 2). pytest-xdist is not installed in this
container, so this is the same idea from first principles: N worker
SUBPROCESSES, each a plain `python -m pytest` over a disjoint set of
test files, each with its OWN SparkSession (per-process — the
conftest fixture is session-scoped, i.e. process-scoped), its own
scratch cwd (so `spark-warehouse/`, `.pytest_cache`, and every
relative write is isolated), and its own TMPDIR (checkpoint dirs,
RocksDB state stores, snapshot tables).

Scheduling is longest-processing-time-first over per-file durations
observed on previous runs (scripts/test_durations.json — written back
after every run, so the schedule self-tunes). The one file too big to
schedule whole — tests/test_oracle_parity.py, the ~330-oracle DuckDB
sweep — is split into one md5-bucket shard per worker via the
BESK_PARITY_SHARD env hook in the test module itself. A worker that
draws both a parity shard and plain files runs them as SEQUENTIAL
pytest processes (parity shards need a private env var), so the
machine never hosts more than N JVMs.

Usage:
    python scripts/shard_tests.py              # 8 workers, 4 cores each
    python scripts/shard_tests.py -n 6 -c 5
    python scripts/shard_tests.py --files tests/test_plans.py ...

Exit code 0 iff every worker's pytest exited 0. Per-worker logs land
under the scratch root (printed at the end) for failure archaeology.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import tempfile
import threading
import time
import xml.etree.ElementTree as ET

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DURATIONS_PATH = os.path.join(REPO, "scripts", "test_durations.json")
PARITY_FILE = "tests/test_oracle_parity.py"
DEFAULT_UNIT_SEC = 60.0  # scheduling guess for a never-seen file


def _work_units(files: list[str], n_workers: int, durations: dict) -> list[dict]:
    """One unit per test file; the parity sweep becomes n_workers
    md5-bucket shards (its sequential wall is ~1/3 of the suite)."""
    units = []
    for f in sorted(files):
        if f == PARITY_FILE and n_workers > 1:
            total = durations.get(f, 8 * 60.0)
            for i in range(n_workers):
                units.append(
                    {
                        "key": f"{f}::shard{i}of{n_workers}",
                        "paths": [os.path.join(REPO, f)],
                        "env": {"BESK_PARITY_SHARD": f"{i}/{n_workers}"},
                        "est": durations.get(
                            f"{f}::shard{i}of{n_workers}", total / n_workers
                        ),
                    }
                )
        else:
            units.append(
                {
                    "key": f,
                    "paths": [os.path.join(REPO, f)],
                    "env": {},
                    "est": durations.get(f, DEFAULT_UNIT_SEC),
                }
            )
    return units


def _lpt_assign(units: list[dict], n_workers: int) -> list[list[dict]]:
    """Longest-processing-time greedy: biggest unit to the least-loaded
    worker. Classic 4/3-approx of the optimal makespan — plenty here."""
    buckets: list[list[dict]] = [[] for _ in range(n_workers)]
    loads = [0.0] * n_workers
    for u in sorted(units, key=lambda u: -u["est"]):
        i = loads.index(min(loads))
        buckets[i].append(u)
        loads[i] += u["est"]
    return buckets


def _parse_junit(path: str) -> tuple[int, int, int, dict[str, float]]:
    """(passed, failed+errors, skipped, per-test-module seconds).

    pytest's xunit2 testcase carries `classname` (dotted module path,
    e.g. tests.test_plans[.TestClass]) — the module segment starting
    with `test_` keys the per-file duration map.
    """
    per_mod: dict[str, float] = {}
    passed = failed = skipped = 0
    try:
        root = ET.parse(path).getroot()
    except (ET.ParseError, FileNotFoundError):
        return 0, 0, 0, {}
    for case in root.iter("testcase"):
        mod = next(
            (
                seg
                for seg in (case.get("classname") or "").split(".")
                if seg.startswith("test_")
            ),
            "",
        )
        per_mod[mod] = per_mod.get(mod, 0.0) + float(case.get("time", 0))
        if case.find("failure") is not None or case.find("error") is not None:
            failed += 1
        elif case.find("skipped") is not None:
            skipped += 1
        else:
            passed += 1
    return passed, failed, skipped, per_mod


def _run_worker(i: int, bucket: list[dict], scratch: str, cpus: int, results: list):
    """One worker thread: its pytest processes run SEQUENTIALLY (one
    JVM at a time per worker slot), grouped by required env vars."""
    wdir = os.path.join(scratch, f"w{i}")
    wtmp = os.path.join(wdir, "tmp")
    try:
        os.makedirs(wtmp, exist_ok=True)
    except OSError as exc:
        results.append(
            {
                "worker": i,
                "keys": [u["key"] for u in bucket],
                "junit": "",
                "log": "",
                "rc": 97,
                "wall": 0.0,
                "infra_error": repr(exc),
            }
        )
        return
    base_env = dict(os.environ)
    base_env["SPARK_GRAFT_CPUS"] = str(cpus)
    base_env["TMPDIR"] = wtmp
    # the sharded runner IS the full-suite tool: disable the default
    # fast profile (tests/conftest.py) unless the caller already chose
    base_env.setdefault("BESK_FULL_SUITE", "1")

    groups: dict[tuple, list[dict]] = {}
    for u in bucket:
        groups.setdefault(tuple(sorted(u["env"].items())), []).append(u)

    for gi, (genv, gunits) in enumerate(sorted(groups.items())):
        junit = os.path.join(wdir, f"junit_{gi}.xml")
        log = os.path.join(wdir, f"pytest_{gi}.log")
        t0 = time.perf_counter()
        # a worker must NEVER silently drop its units: any infra
        # failure (scratch disk full, spawn error) records a failed
        # result so main()'s unit reconciliation and exit code see it
        try:
            cmd = [
                sys.executable,
                "-m",
                "pytest",
                *sorted({p for u in gunits for p in u["paths"]}),
                "-q",
                "-p",
                "no:cacheprovider",
                f"--junitxml={junit}",
            ]
            env = dict(base_env)
            env.update(dict(genv))
            with open(log, "w") as logf:
                rc = subprocess.call(
                    cmd, cwd=wdir, env=env, stdout=logf, stderr=subprocess.STDOUT
                )
        except Exception as exc:  # noqa: BLE001 — report, don't vanish
            with open(log, "a") as logf:
                logf.write(f"\nworker infrastructure failure: {exc!r}\n")
            rc = 98
        results.append(
            {
                "worker": i,
                "keys": [u["key"] for u in gunits],
                "junit": junit,
                "log": log,
                "rc": rc,
                "wall": time.perf_counter() - t0,
            }
        )


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("-n", "--workers", type=int, default=8)
    ap.add_argument(
        "-c",
        "--cpus-per-worker",
        type=int,
        default=0,
        help="SPARK_GRAFT_CPUS per worker (0 = max(2, 32 // workers))",
    )
    ap.add_argument(
        "--files",
        nargs="*",
        default=None,
        help="test files to run (default: all tests/test_*.py)",
    )
    ap.add_argument(
        "--scratch", default=None, help="scratch root (default: mkdtemp)"
    )
    args = ap.parse_args()

    files = args.files or [
        os.path.relpath(p, REPO)
        for p in glob.glob(os.path.join(REPO, "tests", "test_*.py"))
    ]
    durations: dict[str, float] = {}
    if os.path.exists(DURATIONS_PATH):
        with open(DURATIONS_PATH) as f:
            durations = json.load(f)

    n = max(1, args.workers)
    cpus = args.cpus_per_worker or max(2, 32 // n)
    units = _work_units(files, n, durations)
    buckets = _lpt_assign(units, n)
    scratch = args.scratch or tempfile.mkdtemp(prefix="besk_shard_")

    print(
        f"# sharding {len(units)} units over {n} workers "
        f"({cpus} cores each), scratch={scratch}",
        flush=True,
    )

    results: list[dict] = []
    threads = []
    t0 = time.perf_counter()
    for i, bucket in enumerate(buckets):
        if not bucket:
            continue
        t = threading.Thread(
            target=_run_worker, args=(i, bucket, scratch, cpus, results)
        )
        t.start()
        threads.append(t)
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    total_pass = total_fail = total_skip = 0
    failed_units: list[str] = []
    observed: dict[str, float] = {}
    # reconcile: every SCHEDULED unit must have produced a result —
    # a worker thread that died without reporting (or a bucket that
    # never ran) must fail the run, never read as green
    ran = {k for r in results for k in r["keys"]}
    missing = sorted(u["key"] for u in units if u["key"] not in ran)
    if missing:
        failed_units.extend(missing)
        print(f"# MISSING (never ran): {missing}", flush=True)
    for r in sorted(results, key=lambda r: r["worker"]):
        ok, bad, skip, per_mod = _parse_junit(r["junit"])
        total_pass += ok
        total_fail += bad
        total_skip += skip
        # self-tuned estimates must include the per-PROCESS overhead
        # (SparkSession boot + fixtures, ~30s) that junit testcase
        # times exclude — otherwise every estimate is systematically
        # low and LPT degrades for buckets of many small files
        # (round-10 ADVICE). The group's wall minus its junit total is
        # that overhead; amortize it equally over the group's units,
        # matching what a unit costs when co-scheduled.
        keyed = [
            (key, os.path.basename(key.split("::")[0]).removesuffix(".py"))
            for key in r["keys"]
        ]
        hit = [(key, mod) for key, mod in keyed if mod in per_mod]
        overhead = max(
            0.0, r["wall"] - sum(per_mod[mod] for _, mod in hit)
        ) / max(1, len(hit))
        for key, mod in hit:
            observed[key] = round(per_mod[mod] + overhead, 2)
        status = "ok" if r["rc"] == 0 else f"EXIT {r['rc']}"
        print(
            f"# w{r['worker']}: {status} {ok}p/{bad}f/{skip}s "
            f"{r['wall']:.0f}s  {', '.join(r['keys'])[:140]}",
            flush=True,
        )
        if r["rc"] != 0:
            failed_units.extend(r["keys"])
            tail = r.get("infra_error", "")
            if r["log"] and os.path.exists(r["log"]):
                with open(r["log"]) as f:
                    tail = f.read()[-2000:]
            print(f"--- w{r['worker']} log tail ---\n{tail}\n---", flush=True)

    # self-tune the schedule: fold observed durations back in (keep
    # old entries for files not run this time)
    durations.update(observed)
    # refresh the whole-parity-file total for future shard sizing
    shard_secs = [v for k, v in observed.items() if k.startswith(PARITY_FILE)]
    if shard_secs:
        durations[PARITY_FILE] = round(sum(shard_secs), 2)
    with open(DURATIONS_PATH, "w") as f:
        json.dump(durations, f, indent=1, sort_keys=True)

    print(
        json.dumps(
            {
                "metric": "sharded_suite",
                "workers": n,
                "cpus_per_worker": cpus,
                "wall_sec": round(wall, 1),
                "passed": total_pass,
                "failed": total_fail,
                "skipped": total_skip,
                "failed_units": failed_units,
                "scratch": scratch,
            }
        ),
        flush=True,
    )
    return 1 if (total_fail or failed_units) else 0


if __name__ == "__main__":
    sys.exit(main())
