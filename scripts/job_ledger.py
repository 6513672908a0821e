"""Per-JOB attribution ledger for one or more registry entries.

Runs each entry bench-style (same materialize + job-group protocol as
bench.py), then pulls the per-job name/description from the Spark UI
REST API — each Spark job's callsite (`collect at snapshots.py:531`,
`parquet at ...`) names the code line that launched it. This is the
measurement the r11 verdict's sink-family job-creep item asks for:
attribute every +1 job to its call site before folding or gating it.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/job_ledger.py \
        sink_unique_key_guard sink_snapshot_timetravel
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _warmup, materialize
from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded
from binance_etl_spark.session import get_spark


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _ensure_loaded()
    spark = get_spark(
        "besk-job-ledger", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    _warmup(spark)
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    tracker = spark.sparkContext.statusTracker

    for name in names:
        fn = REGISTRY[name].fn
        group = f"ledger:{name}"
        spark.sparkContext.setJobGroup(group, name)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = materialize(df)
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobGroup("", "")
        job_ids = sorted(tracker().getJobIdsForGroup(group))
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs") as r:
            all_jobs = {j["jobId"]: j for j in json.load(r)}
        print(f"\n=== {name}: {wall:.3f}s, {len(job_ids)} jobs, {n} rows ===")
        for jid in job_ids:
            j = all_jobs.get(jid, {})
            dur = ""
            if j.get("submissionTime") and j.get("completionTime"):
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                try:
                    t1 = datetime.strptime(j["submissionTime"], fmt)
                    t2 = datetime.strptime(j["completionTime"], fmt)
                    dur = f"{(t2 - t1).total_seconds():7.3f}s"
                except ValueError:
                    dur = "       ?"
            print(
                f"  job {jid:4d} {dur} tasks={j.get('numTasks', '?'):>4} "
                f"{j.get('name', '?')[:110]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
