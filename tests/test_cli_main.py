"""The CLI front door (python -m binance_etl_spark) — the user-visible
boot command the reference ships (main.py:25-33): config in, streams
started, SIGTERM handled gracefully, drain mode exits on its own.
Runs in a REAL subprocess: signal delivery, stdout contract, and exit
codes are process-level behaviors a same-process test cannot see."""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

from binance_etl_spark.sources import fixtures as FX

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _config(d: str) -> str:
    paths = FX.write_fixtures(d)
    sym = FX.SYMBOL.lower()
    cfg = {
        "events": [f"binance.spot.{sym}.trade", f"binance.spot.{sym}.depth"],
        "storage": {"format": "parquet", "output_path": d + "/out"},
        "sources": {
            f"{sym}.trade": paths["trades"],
            f"{sym}.depth": paths["depth"],
        },
        "snapshots": {FX.SYMBOL: FX.snapshot()},
    }
    cpath = os.path.join(d, "config.json")
    with open(cpath, "w") as f:
        json.dump(cfg, f)
    return cpath


def _read_counts(spark, d: str) -> tuple[int, int]:
    sym = FX.SYMBOL.lower()
    t = spark.read.parquet(f"{d}/out/spot/{sym}/trades").count()
    dp = spark.read.parquet(f"{d}/out/spot/{sym}/depth").count()
    return t, dp


def test_cli_drain_mode_processes_and_exits(spark):
    d = tempfile.mkdtemp(prefix="besk_cli_")
    cpath = _config(d)
    proc = subprocess.run(
        [sys.executable, "-m", "binance_etl_spark", "--config", cpath, "--drain"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "started 2 streaming queries" in proc.stdout
    assert "exiting binance-etl-spark" in proc.stdout
    assert _read_counts(spark, d) == (10, 16)


def test_cli_sigterm_stops_gracefully(spark):
    d = tempfile.mkdtemp(prefix="besk_cli_sig_")
    cpath = _config(d)
    proc = subprocess.Popen(
        [sys.executable, "-m", "binance_etl_spark", "--config", cpath],
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )
    try:
        # wait for boot (the "started" line), then signal — the
        # reference's Ctrl+C/kill flow (main.py:12-23)
        deadline = time.monotonic() + 240
        sym = FX.SYMBOL.lower()
        markers = [
            f"{d}/out/spot/{sym}/{t}/_spark_metadata" for t in ("trades", "depth")
        ]

        def committed(m: str) -> bool:
            # require a COMMITTED batch AND a real data file: under a
            # loaded machine the first trigger can fire before the
            # spool has frames, committing an EMPTY batch 0 — metadata
            # exists, zero part files, and the post-stop read cannot
            # infer a schema (observed flake, sharded run 2026-08-16)
            if not (os.path.isdir(m) and len(os.listdir(m)) > 0):
                return False
            return any(
                f.startswith("part-") and f.endswith(".parquet")
                for f in os.listdir(os.path.dirname(m))
            )

        while time.monotonic() < deadline and not all(map(committed, markers)):
            if proc.poll() is not None:
                raise AssertionError(proc.stderr.read()[-2000:])
            time.sleep(0.5)
        proc.send_signal(signal.SIGTERM)
        out, err = proc.communicate(timeout=120)
    except subprocess.TimeoutExpired:
        proc.kill()
        raise
    assert proc.returncode == 0, err[-2000:]
    assert "intercepted signal" in out
    assert "exiting binance-etl-spark" in out
    t, dp = _read_counts(spark, d)
    assert t > 0 and dp > 0  # committed micro-batches survived the stop


def test_cli_run_query_prints_json_lines():
    import json as _json

    proc = subprocess.run(
        [
            sys.executable, "-m", "binance_etl_spark",
            "--run-query", "ms_microprice",
            "--sf-dir", "/root/testdata/sf0.001",
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rows = [_json.loads(l) for l in proc.stdout.splitlines() if l.startswith("{")]
    assert rows and all("sym" in r and "n_quotes" in r for r in rows)


def test_cli_list_queries_and_unknown_name():
    proc = subprocess.run(
        [sys.executable, "-m", "binance_etl_spark", "--list-queries"],
        cwd=REPO, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0
    names = proc.stdout.split()
    assert "assemble_training_run" in names and len(names) >= 260

    bad = subprocess.run(
        [sys.executable, "-m", "binance_etl_spark", "--run-query", "nope"],
        cwd=REPO, capture_output=True, text=True, timeout=120,
    )
    assert bad.returncode == 2 and "unknown query" in bad.stdout


def test_cli_config_path_env_var_and_dotenv(spark):
    """Reference parity (utils.py:5-8 + main.py:3-4): with no --config
    flag, CONFIG_PATH resolves the config; and a `.env` in the working
    directory can define CONFIG_PATH itself. Explicit env wins over
    .env (python-dotenv default)."""
    # leg 1: CONFIG_PATH in the environment, no --config
    d = tempfile.mkdtemp(prefix="besk_cli_env_")
    cpath = _config(d)
    proc = subprocess.run(
        [sys.executable, "-m", "binance_etl_spark", "--drain"],
        cwd=REPO,
        env={**os.environ, "CONFIG_PATH": cpath},
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "started 2 streaming queries" in proc.stdout
    assert _read_counts(spark, d) == (10, 16)

    # leg 2: CONFIG_PATH comes from a .env file next to the process cwd
    d2 = tempfile.mkdtemp(prefix="besk_cli_dotenv_")
    cpath2 = _config(d2)
    with open(os.path.join(d2, ".env"), "w") as f:
        f.write(f"# deployment env\nexport CONFIG_PATH='{cpath2}'\n")
    env2 = {k: v for k, v in os.environ.items() if k != "CONFIG_PATH"}
    proc2 = subprocess.run(
        [sys.executable, "-m", "binance_etl_spark", "--drain"],
        cwd=d2,
        env={**env2, "PYTHONPATH": REPO},
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    assert _read_counts(spark, d2) == (10, 16)


def test_dotenv_strips_inline_comments_unquoted_only(tmp_path, monkeypatch):
    """python-dotenv default parity: unquoted values lose ` # ...`
    inline comments; quoted values keep their # characters."""
    import os

    from binance_etl_spark.__main__ import _load_dotenv

    env = tmp_path / ".env"
    env.write_text(
        'A=/etc/app/config.json  # prod\n'
        'B="hash # kept"\n'
        "C=plain#notcomment\n"
    )
    for k in ("A", "B", "C"):
        monkeypatch.delenv(k, raising=False)
    _load_dotenv(str(env))
    assert os.environ.pop("A") == "/etc/app/config.json"
    assert os.environ.pop("B") == "hash # kept"
    # '#' without preceding whitespace is part of the value
    assert os.environ.pop("C") == "plain#notcomment"
