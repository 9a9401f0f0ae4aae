"""120-bit span-hash production mode (SCALE.md §16, VERDICT r6 ask #6).

SPARK_GRAFT_SPAN_HASH_BITS switches the span family's shingle key from
a 60-bit BIGINT to a (hi, lo) two-BIGINT struct at import time (the
registered oracles embed the hash SQL). The differential must stay
green under BOTH widths; the default-width run is covered by
tests/test_oracle_differential.py, so this file runs the batch span
keys' differential in a 120-bit subprocess."""

from __future__ import annotations

import os
import subprocess
import sys

SPAN_KEYS = (
    "q_dedup_spans",
    "q_dedup_span_stats",
    "q_dedup_span_pairs",
    "q_dedup_span_strip",
    "q_curate_span_cascade",
    "q_stream_dedup_spans",  # struct keys through the parquet index too
)

_SCRIPT = """
import os, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
from ex_aws_firehose_spark.operators import llm
assert llm.SPAN_HASH_BITS == 120, llm.SPAN_HASH_BITS
from ex_aws_firehose_spark.registry import REGISTRY, load_all_operators
from ex_aws_firehose_spark.session import get_spark
from ex_aws_firehose_spark.testing import run_differential
load_all_operators()
assert "struct_pack" in REGISTRY["q_dedup_spans"].oracle
spark = get_spark(app_name="span-120", shuffle_partitions=8)
sf = "/root/testdata/sf0.001"
for key in {keys!r}:
    q = REGISTRY[key]
    res = run_differential(spark, sf, key, q.fn, q.oracle)
    assert res.ok, (key, res.detail)
    print("OK", key, flush=True)
"""


def test_span_family_green_at_120_bits():
    env = dict(os.environ, SPARK_GRAFT_SPAN_HASH_BITS="120")
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(keys=SPAN_KEYS)],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    for key in SPAN_KEYS:
        assert f"OK {key}" in proc.stdout


def test_rejects_unsupported_width():
    env = dict(os.environ, SPARK_GRAFT_SPAN_HASH_BITS="64")
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys; sys.path.insert(0, '/root/repo'); "
            "from ex_aws_firehose_spark.operators import llm",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode != 0
    assert "SPARK_GRAFT_SPAN_HASH_BITS" in proc.stderr
