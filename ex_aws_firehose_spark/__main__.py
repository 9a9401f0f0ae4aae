"""Command-line entry point — the "switch from the reference" UX:

    python -m ex_aws_firehose_spark list [--tag TAG]
    python -m ex_aws_firehose_spark run KEY [--sf-dir DIR] [--limit N]
    python -m ex_aws_firehose_spark explain KEY [--sf-dir DIR]
    python -m ex_aws_firehose_spark verify KEY [--sf-dir DIR]

`list` prints every registered query key (optionally filtered by tag),
`run` executes one and shows the result, `explain` prints the formatted
physical plan — the same plan surface the plan gates in
tests/test_plans.py assert on — and `verify` diffs one query against
its DuckDB oracle (the same comparison the driver's correctness gate
performs), exiting non-zero on mismatch.
"""

from __future__ import annotations

import argparse
import os
import sys

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ex_aws_firehose_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered query keys")
    p_list.add_argument("--tag", help="filter by tag (e.g. tpch, dedup)")

    p_run = sub.add_parser("run", help="run one query and print rows")
    p_run.add_argument("key")
    p_run.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    p_run.add_argument("--limit", type=int, default=20)

    p_exp = sub.add_parser("explain", help="print the formatted plan")
    p_exp.add_argument("key")
    p_exp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)

    p_ver = sub.add_parser("verify", help="diff one query vs its DuckDB oracle")
    p_ver.add_argument("key")
    p_ver.add_argument("--sf-dir", default=DEFAULT_SF_DIR)

    args = p.parse_args(argv)

    from ex_aws_firehose_spark.registry import REGISTRY, load_all_operators

    load_all_operators()

    if args.cmd == "list":
        for key in sorted(REGISTRY):
            q = REGISTRY[key]
            if args.tag and args.tag not in q.tags:
                continue
            mark = "oracle" if q.oracle else "rows-only"
            print(f"{key:36s} [{', '.join(q.tags)}] ({mark})")
        return 0

    if args.key not in REGISTRY:
        print(f"unknown query key: {args.key!r} (see `list`)", file=sys.stderr)
        return 2

    from ex_aws_firehose_spark.session import get_spark

    spark = get_spark(app_name=f"ex-aws-firehose-spark-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")
    if args.cmd == "verify":
        q = REGISTRY[args.key]
        if not q.oracle:
            print(f"{args.key}: rows-only query (no oracle); running it")
            n = q.fn(spark, args.sf_dir).count()
            print(f"{args.key}: OK ({n} rows)")
            spark.stop()
            return 0
        from ex_aws_firehose_spark.testing import run_differential

        res = run_differential(spark, args.sf_dir, args.key, q.fn, q.oracle)
        print(f"{args.key}: {'OK' if res.ok else 'MISMATCH'} — {res.detail}")
        spark.stop()
        return 0 if res.ok else 1
    df = REGISTRY[args.key].fn(spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=False)
        print(f"({df.count()} rows total)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
