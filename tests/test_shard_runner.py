"""Pure-function pins for the sharded test runner (scripts/
shard_tests.py): LPT scheduling balance, parity-shard unit expansion,
and junit aggregation — no Spark, milliseconds."""

from __future__ import annotations

import importlib.util
import os

_SPEC = importlib.util.spec_from_file_location(
    "shard_tests",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "shard_tests.py",
    ),
)
shard_tests = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(shard_tests)


def test_lpt_assign_balances_makespan():
    units = [{"key": f"u{i}", "est": e} for i, e in enumerate(
        [300, 120, 100, 90, 80, 60, 50, 40, 30, 20, 10, 10]
    )]
    buckets = shard_tests._lpt_assign(units, 4)
    loads = [sum(u["est"] for u in b) for b in buckets]
    assert sum(loads) == sum(u["est"] for u in units)
    # LPT guarantee: makespan <= 4/3 OPT; OPT >= max(total/4, biggest)
    opt_lb = max(sum(loads) / 4, 300)
    assert max(loads) <= 4 / 3 * opt_lb + 1e-9
    # every unit lands exactly once
    keys = sorted(u["key"] for b in buckets for u in b)
    assert keys == sorted(u["key"] for u in units)


def test_parity_file_expands_to_one_shard_per_worker():
    units = shard_tests._work_units(
        ["tests/test_oracle_parity.py", "tests/test_plans.py"],
        6,
        {"tests/test_oracle_parity.py": 600.0},
    )
    parity = [u for u in units if "shard" in u["key"]]
    assert len(parity) == 6
    assert {u["env"]["BESK_PARITY_SHARD"] for u in parity} == {
        f"{i}/6" for i in range(6)
    }
    assert all(abs(u["est"] - 100.0) < 1e-9 for u in parity)
    plain = [u for u in units if u["key"] == "tests/test_plans.py"]
    assert len(plain) == 1 and plain[0]["env"] == {}


def test_junit_parse_counts_and_module_times(tmp_path):
    x = tmp_path / "j.xml"
    x.write_text(
        '<testsuites><testsuite>'
        '<testcase classname="tests.test_a" name="t1" time="1.5"/>'
        '<testcase classname="tests.test_a" name="t2" time="0.5">'
        "<failure>boom</failure></testcase>"
        '<testcase classname="tests.test_b.TestK" name="t3" time="2.0">'
        "<skipped/></testcase>"
        "</testsuite></testsuites>"
    )
    ok, bad, skip, per_mod = shard_tests._parse_junit(str(x))
    assert (ok, bad, skip) == (1, 1, 1)
    assert per_mod["test_a"] == 2.0
    assert per_mod["test_b"] == 2.0
    # unreadable/missing file degrades to zeros, never raises
    assert shard_tests._parse_junit(str(tmp_path / "nope.xml")) == (
        0,
        0,
        0,
        {},
    )
