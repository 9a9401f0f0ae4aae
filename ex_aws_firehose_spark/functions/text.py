"""Text-analysis primitives shared by the dedup / text-quality operators.

Everything here is a Catalyst expression builder (no UDFs): tokenize,
shingle, and hash. The common hash is "first 8 hex digits of md5 as a
64-bit int" — chosen because it is (a) stable across Spark versions and
machines, (b) exactly reproducible in DuckDB
(``CAST('0x' || substr(md5(x),1,8) AS BIGINT)``), unlike xxhash64/hash
whose seeds/algorithms differ per engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Modulus for minhash permutations: smallest prime > 2^32, so a*h+b
# stays well under 2^63 for 8-hex-digit hashes (< 2^32).
MINHASH_PRIME = 4294967311

# Tiny fixed stopword lists for the heuristic language scorer. These are
# differential-test vocabularies over the synthetic corpus, not real
# linguistics — the operator shape (per-lang token-overlap scoring +
# argmax) is what carries to a real stopword/n-gram table at scale.
STOPWORDS = {
    "en": ["the", "a", "and", "order", "table"],
    "fr": ["le", "la", "scan", "query", "batch"],
    "de": ["der", "die", "hash", "join", "row"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of lowercased text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(c), " ")


def hex_hash(col: Column) -> Column:
    """First 8 hex digits of md5 → BIGINT (see module docstring)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def duck_hex_hash(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 8)) AS BIGINT)"


def shingles(tok_col: Column, k: int = 3) -> Column:
    """Distinct k-token shingles (word k-grams) as strings; empty array
    for docs shorter than k tokens.

    Formulated as slice + zip_with, NOT element_at over an index
    sequence: element_at(tok_col, i) re-evaluates the (usually
    unmaterialized split()) token expression per element, which turns
    O(tokens) into O(tokens²) whenever the expression lands in an
    interpreted context — e.g. the size>0 filter Spark pushes below an
    explode. The slice form touches tok_col k times per ROW."""
    n = F.size(tok_col)
    parts = [F.slice(tok_col, j + 1, n - (k - 1)) for j in range(k)]
    z = parts[0]
    for p in parts[1:]:
        z = F.zip_with(z, p, lambda x, y: F.concat_ws(" ", x, y))
    return F.when(n >= k, F.array_distinct(z)).otherwise(
        F.array().cast("array<string>")
    )


def duck_shingles(toks: str, k: int = 3) -> str:
    parts = " || ' ' || ".join(f"{toks}[i + {j}]" for j in range(k))
    return (
        f"list_distinct(list_transform(range(1, len({toks}) - {k - 2}), "
        f"i -> {parts}))"
    )


def hex_hash60(col: Column) -> Column:
    """First 15 hex digits of md5 -> BIGINT (60 bits, sign-safe).

    The wide form of :func:`hex_hash` for content keys whose DISTINCT
    cardinality reaches the 32-bit birthday zone (~10⁵ distinct values
    already yields collisions; ~10⁷ makes them routine). The round-6
    64× probe measured the span-dedup family going 2.4× super-linear
    purely from 32-bit shingle-hash coincidences — width is the
    capacity dial, exactly as with SimHash 32→63."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def duck_hex_hash60(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def hex_hash120(col: Column) -> Column:
    """md5 hex digits 1-15 and 16-30 as a (hi, lo) BIGINT struct —
    120 bits, sign-safe in both engines. The production dial SCALE.md
    §16 names for span dedup beyond ~10¹⁰ distinct shingles, where even
    60 bits re-enters the birthday zone. A struct key keeps every
    downstream join/group single-column in the code while shuffling and
    comparing two 8-byte values — "same plan, two join keys"."""
    return F.struct(
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10)
        .cast("long")
        .alias("hi"),
        F.conv(F.substring(F.md5(col), 16, 15), 16, 10)
        .cast("long")
        .alias("lo"),
    )


def duck_hex_hash120(expr: str) -> str:
    return (
        "struct_pack("
        f"hi := CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT), "
        f"lo := CAST(concat('0x', substr(md5({expr}), 16, 15)) AS BIGINT))"
    )
