"""Candidate-volume linearity gates (docs/SCALE.md §15): the dedup
candidate generators must produce O(rows) candidates under INDEPENDENT
corpus growth — the 64× probe caught a 1600:1 amplification the small
SF hid, and these tests pin the linear shape in CI with a cheap 4×
replica of the sf0.01 documents."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ex_aws_firehose_spark.functions.text import shingles, tokens
from ex_aws_firehose_spark.tables import load_table

R = 4
SHIFT = 100_000_000


@pytest.fixture(scope="module")
def replica_dir(spark, sf_dir):
    """4× independent replica of documents: every token suffixed per
    replica so cross-replica docs share no shingles."""
    out = os.path.join(tempfile.mkdtemp(prefix="scale_shape_"), "4x")
    docs = load_table(spark, sf_dir, "documents")
    parts = []
    for i in range(R):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * SHIFT))
        if i > 0:
            d = d.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", rf"$1r{i}")
            ).withColumn("n_chars", F.length("text"))
        parts.append(d)
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    allp.coalesce(8).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    return out


def _minhash_candidates(spark, sf_dir) -> int:
    from ex_aws_firehose_spark.operators.llm import minhash_bands

    bands = minhash_bands(load_table(spark, sf_dir, "documents"))
    a, b = bands.alias("a"), bands.alias("b")
    return a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bsig") == F.col("b.bsig"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).count()


def _prefix_candidates(spark, sf_dir) -> int:
    d = load_table(spark, sf_dir, "documents")
    dtok = d.filter(F.size(tokens("text")) >= 3).select(
        "doc_id", shingles(tokens("text")).alias("toks")
    )
    tok = dtok.select("doc_id", F.explode("toks").alias("tok"))
    freq = tok.groupBy("tok").agg(F.count("*").alias("df"))
    wrank = Window.partitionBy("doc_id").orderBy("df", "tok")
    wcnt = Window.partitionBy("doc_id")
    ranked = (
        tok.join(freq, "tok")
        .withColumn("pos", F.row_number().over(wrank))
        .withColumn("nd", F.count("*").over(wcnt))
    )
    prefix = ranked.filter(
        F.col("pos") <= F.col("nd") - F.ceil(F.col("nd") * 0.5) + 1
    ).select("doc_id", "tok", "pos", "nd")
    a, b = prefix.alias("a"), prefix.alias("b")
    pos_ub = F.lit(1) + F.least(
        F.col("a.nd") - F.col("a.pos"), F.col("b.nd") - F.col("b.pos")
    )
    return (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                2 * F.least(F.col("a.nd"), F.col("b.nd"))
                >= F.greatest(F.col("a.nd"), F.col("b.nd"))
            )
            & (3 * pos_ub >= F.col("a.nd") + F.col("b.nd")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )


def test_minhash_candidates_scale_linearly(spark, sf_dir, replica_dir):
    c1 = _minhash_candidates(spark, sf_dir)
    c4 = _minhash_candidates(spark, replica_dir)
    assert c1 > 0
    # independent replicas: exactly R× within-replica candidates, plus
    # nothing cross-replica; allow 25% slack for hash coincidences
    assert c4 <= R * c1 * 1.25, (c1, c4)


def test_prefix_filter_candidates_scale_linearly(spark, sf_dir, replica_dir):
    c1 = _prefix_candidates(spark, sf_dir)
    c4 = _prefix_candidates(spark, replica_dir)
    assert c1 > 0
    assert c4 <= R * c1 * 1.25, (c1, c4)
