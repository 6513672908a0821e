"""CLI front door: ``python -m binance_etl_spark --config config.json``.

The engine twin of the reference's boot script (main.py:25-33: load
config, build the ETLs, register SIGINT/SIGTERM handlers, start, block
until stopped). Differences are Spark-native, not cosmetic:

- one supervised Structured Streaming query per event id instead of
  one websocket thread per ETL (reference factory.py:9-17) — restart
  recovery comes from checkpoints, not process memory;
- a signal stops queries through `pipelines.stop_all` (the handler
  twin of main.py:12-23), so in-flight micro-batches commit and the
  sinks stay exactly-once;
- `--duration` bounds the run for replay/backfill jobs (the reference
  runs until killed; a batch backfill over a finite replay log should
  exit on its own once sources drain).

Config shape is `runner.start_jobs`'s (mirrors reference config.json,
with `sources` pointing at replay logs / live spool directories).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import signal
import sys
import time


def _load_dotenv(path: str = ".env") -> None:
    """Tiny dotenv: KEY=VALUE lines into os.environ (existing vars
    win, matching python-dotenv's default). The reference boots with
    `load_dotenv()` before anything else (main.py:3-4) so deployments
    keep CONFIG_PATH and credentials out of the unit file; no new
    dependency — comments/blank lines skipped, optional quotes and an
    `export ` prefix stripped."""
    try:
        with open(path) as f:
            lines = f.readlines()
    except OSError:
        return
    for line in lines:
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        if line.startswith("export "):
            line = line[len("export "):]
        key, _, val = line.partition("=")
        key, val = key.strip(), val.strip()
        if len(val) >= 2 and val[0] == val[-1] and val[0] in "\"'":
            val = val[1:-1]
        else:
            # unquoted values lose inline comments (` # prod`), the
            # python-dotenv default the docstring promises — quoted
            # values keep their # characters
            cut = re.search(r"\s#", val)
            if cut:
                val = val[: cut.start()].rstrip()
        if key and key not in os.environ:
            os.environ[key] = val


def _run_query_mode(args) -> int:
    """Ad-hoc query runner: the 264-query registered surface as a
    shell command — list names, or run one and print JSON lines (the
    engine-as-a-tool ergonomics the per-query oracles already verify)."""
    from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    if args.list_queries:
        for name in sorted(REGISTRY):
            print(name)
        return 0
    if args.run_query not in REGISTRY:
        print(f"unknown query {args.run_query!r}; try --list-queries", flush=True)
        return 2

    from binance_etl_spark.session import get_spark

    spark = get_spark("binance-etl-spark-query")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        df = REGISTRY[args.run_query].fn(spark, args.sf_dir)
        for row in df.toJSON().toLocalIterator():
            print(row, flush=True)
    finally:
        spark.stop()
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m binance_etl_spark",
        description="Run configured market-data ETL streams until "
        "stopped (SIGINT/SIGTERM) or --duration elapses.",
    )
    ap.add_argument(
        "--config",
        default=None,
        help="config JSON path (default: $CONFIG_PATH, else config.json "
        "— the reference's resolution order, utils.py:5-8)",
    )
    ap.add_argument(
        "--duration",
        type=float,
        default=None,
        help="seconds to run before a graceful stop (default: until signal)",
    )
    ap.add_argument(
        "--drain",
        action="store_true",
        help="process everything currently available in the sources, "
        "then stop (replay/backfill mode)",
    )
    ap.add_argument(
        "--run-query",
        metavar="NAME",
        default=None,
        help="instead of streaming: run one registered query by name "
        "(see QUERIES.md) and print its rows as JSON lines",
    )
    ap.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.01",
        help="table directory for --run-query (default sf0.01)",
    )
    ap.add_argument(
        "--list-queries",
        action="store_true",
        help="print every registered query name and exit",
    )
    args = ap.parse_args(argv)

    if args.list_queries or args.run_query:
        return _run_query_mode(args)

    _load_dotenv()  # may define CONFIG_PATH (reference main.py:3-4)
    config_path = args.config or os.getenv("CONFIG_PATH", "config.json")
    with open(config_path) as f:
        config = json.load(f)

    from binance_etl_spark.runner import start_jobs
    from binance_etl_spark.session import get_spark
    from binance_etl_spark.streaming.pipelines import stop_all

    spark = get_spark("binance-etl-spark")
    spark.sparkContext.setLogLevel("ERROR")
    queries = start_jobs(spark, config)
    print(f"started {len(queries)} streaming queries", flush=True)

    stopping = {"flag": False}

    def handle(signum, frame):  # main.py:12-23 twin
        print(f"intercepted signal {signum}, stopping queries...", flush=True)
        stopping["flag"] = True

    signal.signal(signal.SIGINT, handle)
    signal.signal(signal.SIGTERM, handle)

    try:
        if args.drain:
            for q in queries:
                q.processAllAvailable()
        else:
            deadline = time.monotonic() + args.duration if args.duration else None
            # Poll rather than awaitAnyTermination: a JVM-blocked await
            # cannot observe the Python signal flag until it returns.
            while not stopping["flag"]:
                if deadline is not None and time.monotonic() >= deadline:
                    break
                if not spark.streams.active:
                    break
                time.sleep(0.2)
    finally:
        stop_all(spark)
        spark.stop()
    print("exiting binance-etl-spark", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
