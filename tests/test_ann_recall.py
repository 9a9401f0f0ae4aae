"""ANN quality contract (SURVEY.md §2.6): the trained-IVF approximate
top-k must recover a pinned fraction of the brute-force ground truth.

The synthetic embedding table is nearly isotropic (intra-label cosine
tops out ≈ 0.47 — see operators/llm.py), so clustering structure is
weak and recall is bounded well below 1.0 by construction; the contract
asserts the trained codebook beats the nprobe/ncells ≈ 0.3 random-scan
floor with margin. Measured: 0.45 @ sf0.01, 0.55 @ sf0.1.
"""

from __future__ import annotations

from ex_aws_firehose_spark.operators.llm import (
    ANN_NPROBE,
    q_dedup_clusters,
    q_dedup_clusters_star,
    q_sim_ann_ivf,
    q_sim_cosine_topk,
    star_components,
)

MIN_RECALL = 0.4


def test_ivf_recall(spark, sf_dir):
    truth = {r.vec_id for r in q_sim_cosine_topk(spark, sf_dir).collect()}
    ann = {r.vec_id for r in q_sim_ann_ivf(spark, sf_dir).collect()}
    assert truth, "brute-force baseline returned no rows"
    recall = len(truth & ann) / len(truth)
    assert recall >= MIN_RECALL, (
        f"IVF recall@{len(truth)} = {recall:.2f} < {MIN_RECALL} "
        f"at nprobe={ANN_NPROBE}"
    )


def test_star_components_match_label_propagation(spark, sf_dir):
    """Both CC implementations must produce the identical clustering."""
    a = {
        (r.cluster_id, r.cluster_size)
        for r in q_dedup_clusters(spark, sf_dir).collect()
    }
    b = {
        (r.cluster_id, r.cluster_size)
        for r in q_dedup_clusters_star(spark, sf_dir).collect()
    }
    assert a == b


def test_star_components_round_bound(spark, sf_dir):
    """large-star/small-star converges in O(log n) rounds — on the test
    pair graph (components of at most a few dozen docs) that means a
    small constant, nowhere near the safety bound."""
    _, rounds = star_components(spark, sf_dir)
    assert rounds <= 6, f"star CC took {rounds} rounds"
