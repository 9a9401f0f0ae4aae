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


def test_simhash_rotate_recall_superset(spark, sf_dir):
    """The rotated-prefix union must find every pair the single-prefix
    form finds (rotation 0 IS the single prefix) — strictly-superset
    recall is the point of the rotation."""
    from ex_aws_firehose_spark.registry import REGISTRY

    single = {
        (r["doc_a"], r["doc_b"])
        for r in REGISTRY["q_dedup_simhash"].fn(spark, sf_dir).collect()
    }
    rotated = {
        (r["doc_a"], r["doc_b"])
        for r in REGISTRY["q_dedup_simhash_rotate"].fn(spark, sf_dir).collect()
    }
    assert single <= rotated


def test_pq_sse_decreases_over_lloyd_rounds(spark, sf_dir):
    """k-means invariant: total quantization SSE after the second Lloyd
    round must not exceed the SSE after the first (each E-step picks
    the argmin code; each M-step re-centers). Guards the exact-integer
    reformulation against sign/rounding slips."""
    import pyspark.sql.functions as F

    from ex_aws_firehose_spark.operators import llm
    from ex_aws_firehose_spark.registry import REGISTRY

    sse2 = (
        REGISTRY["q_embed_pq_codes"]
        .fn(spark, sf_dir)
        .agg(F.sum("sse_milli"))
        .collect()[0][0]
    )
    old = llm.PQ_ITERS
    try:
        llm.PQ_ITERS = 1
        sse1 = (
            llm.q_embed_pq_codes(spark, sf_dir)
            .agg(F.sum("sse_milli"))
            .collect()[0][0]
        )
    finally:
        llm.PQ_ITERS = old
    assert sse2 <= sse1


def test_kcore_converges_inside_unroll_budget(spark, sf_dir):
    """q_graph_kcore's oracle unrolls KCORE_MAX_ROUNDS peel rounds and
    is exact only if the peel reaches its fixpoint strictly inside that
    budget — pin it."""
    import pyspark.sql.functions as F

    from ex_aws_firehose_spark.operators.scale import (
        KCORE_K,
        KCORE_MAX_ROUNDS,
        TRI_MIN_COOCCUR,
    )
    from ex_aws_firehose_spark.tables import load_table

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.date_trunc("hour", "ts").alias("hr")
    )
    a, b = e.alias("a"), e.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.hr") == F.col("b.hr"))
            & (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .groupBy(F.col("a.user_id").alias("ua"), F.col("b.user_id").alias("ub"))
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= TRI_MIN_COOCCUR)
    )
    sym = (
        edges.select(F.col("ua").alias("u"), F.col("ub").alias("v"))
        .unionByName(edges.select(F.col("ub").alias("u"), F.col("ua").alias("v")))
        .localCheckpoint()
    )
    alive = sym.select("u").distinct().localCheckpoint()
    n_alive = alive.count()
    rounds = 0
    for _ in range(KCORE_MAX_ROUNDS):
        alive = (
            sym.join(alive, "u", "left_semi")
            .join(alive.select(F.col("u").alias("v")), "v", "left_semi")
            .groupBy("u")
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= KCORE_K)
            .select("u")
            .localCheckpoint()
        )
        rounds += 1
        n_next = alive.count()
        if n_next == n_alive:
            break
        n_alive = n_next
    assert rounds < KCORE_MAX_ROUNDS, rounds


def test_adc_recall_contract(spark, sf_dir):
    """IVF-PQ ADC top-k must stay within striking distance of the exact
    cosine baseline: the ADC list is the IVF candidate set re-ranked by
    quantized table lookups, so its recall is bounded by IVF cell
    recall (0.95 at sf0.01 with ADC_NPROBE=8) minus PQ ranking error.
    Round-7 grid: 0.70 at sf0.01 / 0.65 at sf0.001 with the serving
    codebook (M=32 x K=16, nprobe=8 — was 0.40 at M=16/nprobe=3; at
    the teaching-size M=4 x K=8 it measured 0.10: the codebook/probe
    dials are the point). Contract pins 0.55 with margin."""
    from ex_aws_firehose_spark.operators.llm import q_sim_ivf_pq_adc

    truth = {r.vec_id for r in q_sim_cosine_topk(spark, sf_dir).collect()}
    adc = {r.vec_id for r in q_sim_ivf_pq_adc(spark, sf_dir).collect()}
    assert truth
    recall = len(truth & adc) / len(truth)
    assert recall >= 0.55, f"ADC recall@{len(truth)} = {recall:.2f} < 0.55"


def test_adc_rerank_recall_contract(spark, sf_dir):
    """The exact-rerank stage must recover the IVF cell-recall ceiling:
    PQ ranking error is eliminated for the ADC_RERANK_POOL shortlist,
    so reranked recall ≈ cell recall. Measured round 7: 0.95 at
    sf0.01, 0.85 at sf0.1, 1.0 at sf0.001. Contract pins 0.85, and
    rerank must never fall below raw ADC."""
    from ex_aws_firehose_spark.operators.llm import (
        q_sim_adc_rerank,
        q_sim_ivf_pq_adc,
    )

    truth = {r.vec_id for r in q_sim_cosine_topk(spark, sf_dir).collect()}
    adc = {r.vec_id for r in q_sim_ivf_pq_adc(spark, sf_dir).collect()}
    rr = {r.vec_id for r in q_sim_adc_rerank(spark, sf_dir).collect()}
    recall_rr = len(truth & rr) / len(truth)
    assert recall_rr >= 0.85, f"rerank recall = {recall_rr:.2f} < 0.85"
    assert recall_rr >= len(truth & adc) / len(truth)


def test_cell_split_recall_contract(spark, sf_dir):
    """Splitting hot IVF cells must shift the recall/scan-cost
    frontier: at the SAME candidate budget (SPLIT_NPROBE=12 of ~15
    fine cells ≈ ADC_NPROBE=8 of 10 coarse cells), the split index's
    recall@20 must be ≥ the coarse index's cell recall, and ≥ 0.90
    absolute (measured: 1.0 / 0.95 / 0.90 at sf0.001/0.01/0.1 vs
    coarse 1.0 / 0.95 / 0.85 — the sf0.1 gain is the round-7 ask:
    above the 0.85 ceiling at unchanged scan cost)."""
    from pyspark.sql import functions as F

    from ex_aws_firehose_spark.operators.llm import (
        ADC_NPROBE,
        cosine,
        ivf_train,
        q_sim_ivf_cell_split,
    )
    from ex_aws_firehose_spark.tables import load_table

    truth = {r.vec_id for r in q_sim_cosine_topk(spark, sf_dir).collect()}
    split = {r.vec_id for r in q_sim_ivf_cell_split(spark, sf_dir).collect()}
    cb, members = ivf_train(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings")
    qv = F.broadcast(
        e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    )
    probed = (
        cb.crossJoin(qv)
        .select(
            "cell", F.round(cosine(F.col("cvec"), F.col("qv")), 6).alias("pc")
        )
        .orderBy(F.col("pc").desc(), "cell")
        .limit(ADC_NPROBE)
        .select("cell")
    )
    coarse = {
        r.vec_id
        for r in members.join(F.broadcast(probed), "cell", "left_semi")
        .filter(F.col("vec_id") != 0)
        .select("vec_id")
        .collect()
    }
    r_split = len(truth & split) / len(truth)
    r_coarse = len(truth & coarse) / len(truth)
    assert r_split >= 0.90, f"split recall = {r_split:.2f} < 0.90"
    assert r_split >= r_coarse, (r_split, r_coarse)


def test_binary_hamming_recall_contract(spark, sf_dir):
    """1-bit quantization is the coarsest rung of the ladder, and on
    the near-isotropic synthetic vectors its top-20 Hamming list still
    recovers a pinned fraction of the exact cosine top-20 (measured
    0.40 at sf0.01, 0.25 at sf0.001 — 64 sign bits ≈ a 64-plane RP-LSH
    signature, so this floor is the sign-agreement concentration
    bound, far above the 20/2000 ≈ 0.01 random floor). Production use
    is filter-then-rerank: the Hamming arm shortlists, exact rerank
    restores the rest."""
    from ex_aws_firehose_spark.operators.llm import (
        q_embed_binary_hamming_topk,
    )

    truth = {r.vec_id for r in q_sim_cosine_topk(spark, sf_dir).collect()}
    binq = {
        r.vec_id for r in q_embed_binary_hamming_topk(spark, sf_dir).collect()
    }
    assert truth
    recall = len(truth & binq) / len(truth)
    assert recall >= 0.2, f"binary recall@{len(truth)} = {recall:.2f} < 0.20"


def test_graph_ann_recall_matched_budget(spark, sf_dir):
    """The round-10 contract: beam search over the two-layer navigable
    graph must match-or-beat IVF recall@20 at an equal (or larger —
    the comparison is conservative) IVF candidate budget. The matched
    arm probes the smallest nprobe whose candidate count covers the
    graph's n_scored pool, so IVF never gets FEWER candidates than the
    graph spent. Measured: graph 1.00/1.00/0.65 vs matched-IVF
    1.00/1.00/0.65 at sf0.001/0.01/0.1 — equal recall, and at sf0.1
    the graph pool is ~10% smaller than the matched IVF budget."""
    from pyspark.sql import functions as F

    from ex_aws_firehose_spark.operators.llm import (
        cosine,
        ivf_train,
        q_sim_graph_ann,
    )
    from ex_aws_firehose_spark.tables import load_table

    truth = {r.vec_id for r in q_sim_cosine_topk(spark, sf_dir).collect()}
    graph_rows = q_sim_graph_ann(spark, sf_dir).collect()
    graph = {r.vec_id for r in graph_rows}
    n_scored = graph_rows[0].n_scored

    cb, members = ivf_train(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings")
    qv = F.broadcast(
        e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    )
    ranked_cells = [
        r.cell
        for r in cb.crossJoin(qv)
        .select(
            "cell", F.round(cosine(F.col("cvec"), F.col("qv")), 6).alias("pc")
        )
        .orderBy(F.col("pc").desc(), "cell")
        .collect()
    ]
    sizes = {
        r.cell: r.n
        for r in members.filter(F.col("vec_id") != 0)
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    nprobe, cum = len(ranked_cells), 0
    for i, cell in enumerate(ranked_cells, start=1):
        cum += sizes.get(cell, 0)
        if cum >= n_scored:
            nprobe = i
            break
    probed = ranked_cells[:nprobe]
    ivf = {
        r.vec_id
        for r in members.filter(
            F.col("cell").isin(probed) & (F.col("vec_id") != 0)
        )
        .crossJoin(qv)
        .select(
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("c"),
        )
        .orderBy(F.col("c").desc(), "vec_id")
        .limit(20)
        .collect()
    }
    r_graph = len(truth & graph) / len(truth)
    r_ivf = len(truth & ivf) / len(truth)
    assert n_scored <= cum, (n_scored, cum)
    assert r_graph >= r_ivf, (
        f"graph recall {r_graph:.2f} < IVF recall {r_ivf:.2f} at matched "
        f"nprobe={nprobe} (graph scored {n_scored}, IVF budget {cum})"
    )


def test_incremental_add_equals_bulk_reindex_at_frozen_codebook(spark, sf_dir):
    """Laws of q_sim_ivf_incremental_add:

    1. Conservation: post-add inverted lists hold every corpus vector
       exactly once (base + batch, no loss, no duplication).
    2. Frozen-codebook equivalence: adding the batch incrementally
       (assign + encode against the trained-on-base codebooks) yields
       the IDENTICAL index that a bulk reindex of ALL vectors against
       the same frozen codebooks would — cell assignments and PQ codes
       match vector-for-vector. This is the invariant that makes
       nightly adds safe: the index never depends on arrival order.
    """
    from ex_aws_firehose_spark.operators.llm import (
        ADC_K,
        ADC_M,
        INC_ADD_MOD,
        _ivf_e_step,
        ivf_train,
        pq_train,
    )
    from ex_aws_firehose_spark.registry import REGISTRY
    from ex_aws_firehose_spark.tables import load_table
    from pyspark.sql import functions as F

    base_w = f"vec_id % {INC_ADD_MOD} != {INC_ADD_MOD - 1}"
    cb, members = ivf_train(spark, sf_dir, where=base_w)
    _comp, cent, _codes = pq_train(spark, sf_dir, ADC_M, ADC_K, where=base_w)
    e = load_table(spark, sf_dir, "embeddings")
    n_all = e.count()

    out = REGISTRY["q_sim_ivf_incremental_add"].fn(spark, sf_dir)
    first = out.limit(1).collect()[0]
    assert first.n_total_after == n_all

    # bulk reindex at the frozen codebook: one E-step over ALL vectors
    bulk = {
        (r.vec_id, r.cell)
        for r in _ivf_e_step(e.select("vec_id", "embedding"), cb).collect()
    }
    base_m = {(r.vec_id, r.cell) for r in members.collect()}
    batch = e.filter(f"vec_id % {INC_ADD_MOD} = {INC_ADD_MOD - 1}")
    inc_m = base_m | {
        (r.vec_id, r.cell)
        for r in _ivf_e_step(batch.select("vec_id", "embedding"), cb).collect()
    }
    assert inc_m == bulk
    assert len(inc_m) == n_all

    # frozen PQ codes: batch encode == bulk encode restricted to batch
    def encode(frame):
        bcomp = (
            frame.select(
                "vec_id",
                F.size("embedding").alias("dlen"),
                F.posexplode("embedding").alias("pos", "v"),
            )
            .select(
                "vec_id",
                F.expr(f"CAST((pos * {ADC_M}) DIV dlen AS INT)").alias(
                    "subspace"
                ),
                "pos",
                F.floor(F.col("v").cast("double") * 1000)
                .cast("long")
                .alias("sv"),
            )
        )
        d = F.col("sv") - F.col("icv")
        return {
            (r.vec_id, r.subspace, r.code)
            for r in (
                bcomp.join(F.broadcast(cent), ["subspace", "pos"])
                .groupBy("vec_id", "subspace", "code")
                .agg(F.sum(d * d).alias("dist"))
                .groupBy("vec_id", "subspace")
                .agg(F.min(F.struct("dist", "code")).alias("p"))
                .select("vec_id", "subspace", F.col("p.code").alias("code"))
            ).collect()
        }

    batch_ids = {r.vec_id for r in batch.select("vec_id").collect()}
    bulk_codes = encode(e)
    inc_codes = encode(batch)
    assert inc_codes == {t for t in bulk_codes if t[0] in batch_ids}


def test_ivf_delete_tombstone_invisibility_and_rewrite_trigger(spark, sf_dir):
    """Laws of q_sim_ivf_delete:

    1. Tombstone invisibility: no deleted vec_id appears in the served
       top-k.
    2. Serve-equivalence: serving with tombstones == serving an index
       whose inverted lists simply never contained the deleted batch
       (the MoR read contract — same law as position-delete reads).
    3. Trigger arms: the skewed batch leaves BOTH populated — at least
       one cell over the 20% dead fraction (rewrite-pending) and at
       least one clean cell; n_dead == |tombstones|.
    """
    from ex_aws_firehose_spark.operators.llm import (
        ADC_K,
        ADC_M,
        DEL_LABEL,
        DEL_MOD,
        TOPK,
        _adc_serve,
        ivf_train,
        pq_train,
    )
    from ex_aws_firehose_spark.registry import REGISTRY
    from ex_aws_firehose_spark.tables import load_table
    from pyspark.sql import functions as F

    rows = REGISTRY["q_sim_ivf_delete"].fn(spark, sf_dir).collect()
    assert rows
    e = load_table(spark, sf_dir, "embeddings")
    tomb_pred = f"(vec_id % {DEL_MOD} = 3 OR label = {DEL_LABEL}) AND vec_id != 0"
    tomb_ids = {r.vec_id for r in e.filter(tomb_pred).select("vec_id").collect()}
    assert tomb_ids
    assert not ({r.vec_id for r in rows} & tomb_ids)

    st = rows[0]
    assert st.n_dead == len(tomb_ids)
    assert 1 <= st.n_cells_rewrite_pending
    # at least one clean cell remains (not every cell crossed 20%)
    _comp, cent, codes = pq_train(spark, sf_dir, ADC_M, ADC_K)
    cb, members = ivf_train(spark, sf_dir)
    n_cells = cb.count()
    assert st.n_cells_rewrite_pending < n_cells

    never = members.join(
        F.broadcast(e.filter(tomb_pred).select("vec_id")),
        "vec_id",
        "left_anti",
    )
    baseline = [
        (r.vec_id, r.cell, r.adc_dist)
        for r in _adc_serve(
            spark, sf_dir, cent, codes, cb, never, TOPK
        ).collect()
    ]
    assert [(r.vec_id, r.cell, r.adc_dist) for r in rows] == baseline


def test_ivf_compact_serve_equivalence_and_audit_clears(spark, sf_dir):
    """Laws of q_sim_ivf_compact (the delete-lifecycle close-out):

    1. Serve-equivalence: the post-compaction top-k — compacted lists
       plus the residual tombstone mask — is IDENTICAL to
       q_sim_ivf_delete's tombstone-only serving (and hence to an
       index that never contained the batch, by the delete law).
    2. The audit clears: n_pending_after == 0 — rewritten cells hold
       zero dead rows, clean cells were under the trigger already.
    3. Conservation: n_listed_after == pre-compaction n_listed minus
       n_rows_purged, and n_dead_after == n_dead minus n_rows_purged.
    4. The rewrite actually fired: n_cells_rewritten equals the
       delete key's n_cells_rewrite_pending (>= 1 on this fixture)
       and n_rows_purged >= 1.
    """
    from ex_aws_firehose_spark.registry import REGISTRY

    del_rows = REGISTRY["q_sim_ivf_delete"].fn(spark, sf_dir).collect()
    cmp_rows = REGISTRY["q_sim_ivf_compact"].fn(spark, sf_dir).collect()
    assert del_rows and cmp_rows
    assert [(r.vec_id, r.cell, r.adc_dist) for r in cmp_rows] == [
        (r.vec_id, r.cell, r.adc_dist) for r in del_rows
    ]
    d, c = del_rows[0], cmp_rows[0]
    assert c.n_pending_after == 0
    assert c.n_listed_after == d.n_listed - c.n_rows_purged
    assert c.n_dead_after == d.n_dead - c.n_rows_purged
    assert c.n_cells_rewritten == d.n_cells_rewrite_pending >= 1
    assert c.n_rows_purged >= 1


def test_graph_ann_add_order_independent_connected_recall(spark, sf_dir):
    """The round-13 incremental-insert laws (q_sim_graph_ann_add):

    1. ARRIVAL-ORDER INDEPENDENCE — because inserts connect new→base
       only against FROZEN layers, adding the batch as two interleaved
       sub-batches appends exactly the same edge set as one shot.
    2. CONNECTIVITY — every added vector gets ≥1 appended edge (its
       assigned cells contain at least the hub itself).
    3. RECALL — serve-after-add matches the full-rebuild serve's
       measured recall@20 (1.00 at sf0.001/0.01, 0.65 at sf0.1)
       against brute-force truth; floor pinned with slack."""
    from ex_aws_firehose_spark.operators.llm import (
        INC_ADD_MOD,
        _graph_add_edges,
        _graph_ann_parts,
        q_sim_graph_ann_add,
    )
    from ex_aws_firehose_spark.tables import load_table

    base_w = f"vec_id % {INC_ADD_MOD} != {INC_ADD_MOD - 1}"
    parts = _graph_ann_parts(spark, sf_dir, where=base_w)
    whole_df = _graph_add_edges(spark, sf_dir, base_w, parts)
    whole = {(r.src, r.dst) for r in whole_df.collect()}
    half_a = {
        (r.src, r.dst)
        for r in _graph_add_edges(
            spark, sf_dir, f"({base_w}) OR (vec_id % 16 != 7)", parts
        ).collect()
    }
    half_b = {
        (r.src, r.dst)
        for r in _graph_add_edges(
            spark, sf_dir, f"({base_w}) OR (vec_id % 16 != 15)", parts
        ).collect()
    }
    assert (half_a | half_b) == whole

    batch_ids = {
        r.vec_id
        for r in load_table(spark, sf_dir, "embeddings")
        .filter(f"vec_id <> 0 AND NOT ({base_w})")
        .select("vec_id")
        .collect()
    }
    assert batch_ids <= {s for s, _ in whole}

    truth = {r.vec_id for r in q_sim_cosine_topk(spark, sf_dir).collect()}
    got = {r.vec_id for r in q_sim_graph_ann_add(spark, sf_dir).collect()}
    assert len(truth & got) / len(truth) >= 0.9


def test_opq_allocation_balances_variance(spark, sf_dir):
    """q_embed_opq_rotate's contract (VERDICT r12 ask #5): the
    eigenvalue-allocation permutation (a) assigns exactly d/M
    dimensions to every subspace, and (b) its per-subspace assigned-
    variance spread (max − min of summed dimension variances) is
    never worse than the natural contiguous layout's — the property
    that makes rotated PQ win on variance-skewed corpora, pinned
    directly on the exact-integer covariance diagonal so training
    noise can't flake it. Also sanity-pins the decision table: on
    this near-isotropic fixture the SSE totals of both arms agree
    within 5% (the 'rotation not worth it here' verdict)."""
    from ex_aws_firehose_spark.operators.llm import (
        PQ_M,
        _top_pc_frames,
        q_embed_opq_rotate,
    )

    _, _, cov = _top_pc_frames(spark, sf_dir)
    diag = sorted(
        (r.i, r.c) for r in cov.filter("i = j").collect()
    )  # (1-based dim, exact integer variance)
    d = len(diag)
    assert d % PQ_M == 0
    variances = [v for _, v in diag]

    def spread(assign):
        sums = [0] * PQ_M
        for dim_idx, sub in assign:
            sums[sub] += variances[dim_idx]
        return max(sums) - min(sums), sums

    contiguous = [(i, (i * PQ_M) // d) for i in range(d)]
    ranked = sorted(range(d), key=lambda i: (-variances[i], i))
    snake = []
    for r, dim_idx in enumerate(ranked):
        rnd, pos = divmod(r, PQ_M)
        snake.append((dim_idx, pos if rnd % 2 == 0 else PQ_M - 1 - pos))
    from collections import Counter

    per_sub = Counter(s for _, s in snake)
    assert all(per_sub[s] == d // PQ_M for s in range(PQ_M))
    s_spread, _ = spread(snake)
    c_spread, _ = spread(contiguous)
    assert s_spread <= c_spread, (s_spread, c_spread)

    row = q_embed_opq_rotate(spark, sf_dir).collect()[0]
    lo, hi = sorted(
        [row.total_sse_unrot_milli, row.total_sse_rot_milli]
    )
    assert hi <= lo * 1.05, (lo, hi)


def test_graph_ann_delete_waypoints_and_exclusion(spark, sf_dir):
    """q_sim_graph_ann_delete laws: (a) no tombstoned id in the
    answer; (b) the visited pool is IDENTICAL to the undeleted
    serve's (n_scored equal — deletion filters results, never
    traversal); (c) the walk actually passes through tombstones
    (n_dead_visited > 0), proving the waypoint semantics carry
    routing load on this fixture."""
    from ex_aws_firehose_spark.operators.llm import (
        DEL_LABEL,
        DEL_MOD,
        q_sim_graph_ann,
        q_sim_graph_ann_delete,
    )
    from ex_aws_firehose_spark.tables import load_table

    rows = q_sim_graph_ann_delete(spark, sf_dir).collect()
    tomb = {
        r.vec_id
        for r in load_table(spark, sf_dir, "embeddings")
        .filter(
            f"(vec_id % {DEL_MOD} = 3 OR label = {DEL_LABEL})"
            " AND vec_id <> 0"
        )
        .select("vec_id")
        .collect()
    }
    assert not ({r.vec_id for r in rows} & tomb)
    assert rows[0].n_dead_visited > 0
    assert rows[0].n_tombstones == len(tomb)
    plain = q_sim_graph_ann(spark, sf_dir).collect()
    assert rows[0].n_scored == plain[0].n_scored


def test_graph_ann_compact_repairs_only_the_wounded(spark, sf_dir):
    """q_sim_graph_ann_compact laws: (a) zero tombstoned endpoints
    survive compaction; (b) the unwounded majority's edge sets are
    byte-identical before and after (incremental repair, not a
    rebuild); (c) every wounded survivor keeps >= 1 edge."""
    from ex_aws_firehose_spark.operators.llm import (
        DEL_LABEL,
        DEL_MOD,
        GRAPH_K1,
        _graph_ann_parts,
        q_sim_graph_ann_compact,
    )
    from ex_aws_firehose_spark.tables import load_table

    q_sim_graph_ann_compact(spark, sf_dir).collect()  # build caches
    parts = _graph_ann_parts(spark, sf_dir)
    before = {(r.src, r.dst) for r in parts["edges"].collect()}
    tomb = {
        r.vec_id
        for r in load_table(spark, sf_dir, "embeddings")
        .filter(
            f"(vec_id % {DEL_MOD} = 3 OR label = {DEL_LABEL})"
            " AND vec_id <> 0"
        )
        .select("vec_id")
        .collect()
    }
    import pyspark.sql.functions as F

    kept = {
        (s, d) for s, d in before if s not in tomb and d not in tomb
    }
    wounded = {
        s for s, d in before if s not in tomb and d in tomb
    }
    rows = q_sim_graph_ann_compact(spark, sf_dir).collect()
    assert rows[0].n_wounded == len(wounded)
    assert rows[0].n_edges_dropped == len(before) - len(kept)
    # Materialize the ACTUAL after-graph through the key's own edge
    # builder (ADVICE r13: asserting on the kept/wounded definitions
    # alone was tautological — a relink step that clobbered an
    # unwounded vector's edges would have passed).
    from ex_aws_firehose_spark.operators.llm import _graph_compact_edges

    after = {
        (r.src, r.dst)
        for r in _graph_compact_edges(spark, sf_dir)["edges3"].collect()
    }
    assert rows[0].n_edges_after == len(after)
    # (a) zero tombstoned endpoints survive compaction
    assert not any(s in tomb or d in tomb for s, d in after)
    unwounded = {
        s for s, _ in before if s not in tomb and s not in wounded
    }
    # (b) unwounded vectors' OUTGOING edge sets byte-identical
    # before/after, checked against the materialized after-set. A
    # wounded vector's reversed relink may ADD an incoming edge at an
    # unwounded dst, so the law is per-src on the srcs no relink
    # touches: after-edges of an unwounded src ⊇ its kept edges, and
    # any extras must be reversed relinks (dst wounded).
    b_out, a_out = {}, {}
    for s, d in before:
        b_out.setdefault(s, set()).add(d)
    for s, d in after:
        a_out.setdefault(s, set()).add(d)
    for s in unwounded:
        assert b_out[s] <= a_out.get(s, set())
        assert all(d in wounded for d in a_out.get(s, set()) - b_out[s])
    # (c): wounded keep >=1 edge — their relink candidates include at
    # least one live cell-mate on this fixture
    asg_rows = (
        parts["scored"]
        .filter(F.col("rn") <= 3)
        .select("vec_id", "hub_id")
        .collect()
    )
    by_hub = {}
    for r in asg_rows:
        by_hub.setdefault(r.hub_id, set()).add(r.vec_id)
    for w in wounded:
        mates = set()
        for hub, members in by_hub.items():
            if w in members:
                mates |= members - {w} - tomb
        assert mates, f"wounded {w} has no live cell-mates"


def test_graph_ann_filtered_aware_dominates_post(spark, sf_dir):
    """q_sim_graph_ann_filtered laws: (a) the aware beam's recall >=
    post-filter's at the same ROUNDS x BEAM budget (the decision the
    two-row table exists to document — measured 100/90/40 vs 5/5/15
    pct at sf0.001/0.01/0.1); (b) the aware arm returns a FULL k
    (beam width concentrated on matching candidates never starves
    the result pool on this fixture) while post-filter returns <= k;
    (c) the budgets really are comparable: neither pool is more than
    25% larger than the other (navigation unfiltered in both)."""
    from ex_aws_firehose_spark.operators.llm import (
        TOPK,
        q_sim_graph_ann_filtered,
    )

    rows = {
        r.strategy: r
        for r in q_sim_graph_ann_filtered(spark, sf_dir).collect()
    }
    aware, post = rows["aware_beam"], rows["post_filter"]
    assert aware.recall_pct >= post.recall_pct
    assert aware.n_returned == TOPK
    assert post.n_returned <= TOPK
    assert aware.n_scored <= post.n_scored * 1.25
    assert post.n_scored <= aware.n_scored * 1.25


def test_graph_ann_adc_byte_budget_and_recall(spark, sf_dir):
    """q_sim_graph_ann_adc laws: (a) the ADC walk moves strictly fewer
    bytes than the float beam at the same ROUNDS x BEAM budget
    (measured 2.7-3.9x fewer at d=64; the margin grows linearly with
    d); (b) rerank recovers the float beam's recall to within one
    beam's tolerance (measured 100/100/60 vs 100/100/65 pct) and
    stays above the ADC family's 55 pct absolute floor; (c) the two
    pools are genuinely comparable (within 25%) — the byte win comes
    from scoring codes, not from visiting less of the graph."""
    from ex_aws_firehose_spark.operators.llm import q_sim_graph_ann_adc

    rows = {
        r.strategy: r for r in q_sim_graph_ann_adc(spark, sf_dir).collect()
    }
    adc, flt = rows["adc_beam"], rows["float_beam"]
    assert adc.bytes_moved < flt.bytes_moved
    assert adc.recall_pct >= 55
    assert adc.recall_pct >= flt.recall_pct - 10
    assert adc.n_scored <= flt.n_scored * 1.25
    assert flt.n_scored <= adc.n_scored * 1.25
