"""Generate QUERIES.md: the full registered-query inventory (name,
tags, oracle kind, first doc sentence) — the line-by-line index of the
engine's verified surface. Regenerate after adding queries:
    python scripts/gen_inventory.py
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded


def first_sentence(doc: str) -> str:
    doc = " ".join((doc or "").split())
    for stop in [". ", " — ", ": "]:
        i = doc.find(stop)
        if 30 <= i <= 220:
            return doc[: i + (1 if stop == ". " else 0)]
    return doc[:200]


def main() -> None:
    _ensure_loaded()
    groups: dict[str, list] = defaultdict(list)
    for name, q in sorted(REGISTRY.items()):
        groups[name.split("_")[0]].append(q)
    n_oracle = sum(1 for q in REGISTRY.values() if q.oracle is not None)
    out = [
        "# QUERIES — registered operator inventory",
        "",
        f"{len(REGISTRY)} queries, {n_oracle} with exact DuckDB value oracles",
        "(the rest are rows-only by design: genuinely approximate ops with",
        "error-bound tests instead). Every row is driver-runnable via",
        "`__spark_entry__.queries()[name](spark, sf_dir)`; regenerate this",
        "file with `python scripts/gen_inventory.py`.",
        "",
    ]
    for g in sorted(groups):
        out.append(f"## {g} ({len(groups[g])})")
        out.append("")
        out.append("| query | oracle | tags | what it is |")
        out.append("|---|---|---|---|")
        for q in groups[g]:
            kind = "exact" if q.oracle is not None else "rows-only"
            tags = " ".join(q.tags)
            out.append(
                f"| `{q.name}` | {kind} | {tags} | {first_sentence(q.doc)} |"
            )
        out.append("")
    # driver-hash rotation record (tests/test_driver_hash_rotation.py):
    # regenerated with the inventory so it always reflects the keys the
    # rotation test will actually run this round
    from binance_etl_spark.plans.rotation import rotation_keys

    keys = rotation_keys()
    out.append("## Driver-hash rotation (current round)")
    out.append("")
    out.append(f"The {len(keys)} least-recently-driver-sampled oracle keys,")
    out.append("run through the driver-twin typed-hash comparison (columns")
    out.append("sorted by name, repr-rendered floats, NULL token in the row")
    out.append("sort) each round by tests/test_driver_hash_rotation.py:")
    out.append("")
    for i in range(0, len(keys), 4):
        out.append("  " + ", ".join(keys[i : i + 4]))
    out.append("")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "QUERIES.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"QUERIES.md: {len(REGISTRY)} queries, {n_oracle} oracled")


if __name__ == "__main__":
    main()
