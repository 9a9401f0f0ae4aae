"""Degenerate-oracle sweep — the generalized round-9 lesson as a CI
gate: a differential test proves Spark == DuckDB, but if an oracle
returns ZERO rows (a probe that misses the fixture) or a signal
column that is ALL-ZERO (a detector arm that never fires), both
engines "agree" on nothing and the key validates nothing. This sweep
runs every registered oracle in DuckDB ONLY (no Spark session — ~40 s
for the whole registry) and fails on new instances of either smell.

Allow-lists are curated, not silenced: every entry names WHY the
exception is sound (spec-fixed selectivity, a firing canary twin, or
arms pinned on planted rows elsewhere in the suite)."""

from __future__ import annotations

import re

import duckdb
import pytest

from ex_aws_firehose_spark.registry import REGISTRY, load_all_operators

load_all_operators()

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# Keys whose oracle is legitimately EMPTY at sf0.01:
ZERO_ROW_OK = {
    # TPC-H selectivity is fixed by the public spec; these are known
    # to produce rows only at larger SFs (same exemption as
    # tests/test_new_key_invariants.py NON_TRIVIAL_KEYS).
    "q_tpch_q2",
    "q_tpch_q8",
    "q_tpch_q11",
    "q_tpch_q22",
    # Sparse cross-source / cross-modality duplicates exist at sf0.1
    # but not sf0.01; non-triviality at sf0.1 is pinned by
    # test_sparse_dup_keys_non_trivial_at_sf0_1.
    "q_dedup_cross_source",
    "q_multimodal_dedup",
}

# (key, column) signal columns allowed to be all-zero on the fixture:
ALL_ZERO_OK = {
    # clean-arm columns whose CANARY twin fires in the same row set
    ("q_multimodal_pair_audit", "n_orphan_vectors"),
    # the corpus vocabulary contains no symbol/non-alpha tokens; both
    # arms are pinned on planted rows by
    # test_gopher_symbol_alpha_arms_on_planted_rows
    ("q_quality_gopher_rules", "fail_symbol"),
    ("q_quality_gopher_rules", "fail_alpha"),
}

SIG = re.compile(
    r"(^|_)(flag|is|passed|outlier|anomal|violat|orphan|stale|bot|dead"
    r"|fail|hit|removed|affected|fired|alert)(s|_|$)"
)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def test_no_oracle_is_degenerate(duck):
    zero_rows, all_zero = [], []
    for key, q in sorted(REGISTRY.items()):
        oracle = getattr(q, "oracle", None)
        if not oracle:
            continue
        cur = duck.execute(oracle)
        cols = [d[0] for d in cur.description]
        res = cur.fetchall()
        if not res:
            if key not in ZERO_ROW_OK:
                zero_rows.append(key)
            continue
        for i, c in enumerate(cols):
            if SIG.search(c.lower()) and (key, c) not in ALL_ZERO_OK:
                if {r[i] for r in res} == {0}:
                    all_zero.append((key, c))
    assert not zero_rows, (
        f"oracles returning ZERO rows (probe misses the fixture — the "
        f"differential validates nothing): {zero_rows}"
    )
    assert not all_zero, (
        f"signal columns that never fire on the fixture (detector arm "
        f"dead — fix the threshold or add a canary/planted pin, then "
        f"allow-list with the reason): {all_zero}"
    )


def test_allow_lists_stay_minimal(duck):
    """Every allow-list entry must still be NEEDED — a fixed key must
    leave the list, or the list rots into a mute button."""
    for key in ZERO_ROW_OK:
        res = duck.execute(REGISTRY[key].oracle).fetchall()
        assert not res, f"{key} now returns rows — remove from ZERO_ROW_OK"
    for key, col in ALL_ZERO_OK:
        cur = duck.execute(REGISTRY[key].oracle)
        cols = [d[0] for d in cur.description]
        res = cur.fetchall()
        vals = {r[cols.index(col)] for r in res}
        assert vals == {0}, (
            f"{key}.{col} now fires — remove from ALL_ZERO_OK"
        )
