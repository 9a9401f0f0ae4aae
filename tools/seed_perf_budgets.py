"""Seed tests/perf_budgets.json: run the full oracle differential at
sf0.01 (the same sweep the driver and tests/test_oracle_differential.py
perform), record each key's Spark-side wall time, and write
max(FLOOR, time × MARGIN) as its budget.

Usage:  python tools/seed_perf_budgets.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLOOR = 2.0
MARGIN = 2.5
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from ex_aws_firehose_spark import testing
    from ex_aws_firehose_spark.registry import REGISTRY, load_all_operators
    from ex_aws_firehose_spark.session import get_spark

    load_all_operators()
    spark = get_spark(app_name="seed-perf-budgets", shuffle_partitions=8)
    fails = []
    for key in sorted(REGISTRY):
        q = REGISTRY[key]
        if not q.oracle:
            continue
        res = testing.run_differential(spark, SF_DIR, key, q.fn, q.oracle)
        if not res.ok:
            fails.append((key, res.detail))
        print(
            f"{key}: {testing.SPARK_TIMINGS[key]:.2f}s"
            + ("" if res.ok else f"  FAIL {res.detail}"),
            flush=True,
        )
    budgets = {
        k: round(max(FLOOR, t * MARGIN), 2)
        for k, t in sorted(testing.SPARK_TIMINGS.items())
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "perf_budgets.json",
    )
    with open(out, "w") as f:
        json.dump(
            {
                "sf_dir": SF_DIR,
                "margin": MARGIN,
                "floor_sec": FLOOR,
                "budgets_sec": budgets,
            },
            f,
            indent=1,
            sort_keys=True,
        )
        f.write("\n")
    print(f"wrote {len(budgets)} budgets -> {out}")
    if fails:
        print(f"{len(fails)} keys FAILED the differential: {fails[:5]}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
