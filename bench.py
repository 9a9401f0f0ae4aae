"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line:  {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {key: sec, ...}, "sf": ...}

Each query is timed as a full materialization through the ``noop``
batch sink — unlike ``count()``, which lets Catalyst prune every
projected expression and would time map-only queries as bare row
counts, the noop write evaluates every output column and row without
driver-side transfer. A warm-up pass primes the JVM/code-cache before
the timed pass.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ex_aws_firehose_spark.registry import REGISTRY, load_all_operators
from ex_aws_firehose_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    load_all_operators()
    spark = get_spark(app_name="ex-aws-firehose-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # Warm up the JVM / whole-stage-codegen compiler on a cheap query.
    try:
        materialize(REGISTRY["q_scan_project"].fn(spark, sf_dir))
    except Exception as exc:
        print(f"bench: warm-up failed: {exc}", file=sys.stderr)

    timings: dict[str, float] = {}
    for key in sorted(REGISTRY):
        fn = REGISTRY[key].fn
        t0 = time.perf_counter()
        try:
            materialize(fn(spark, sf_dir))
            timings[key] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # never let one query sink the bench
            timings[key] = -1.0
            print(f"bench: {key} failed: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
