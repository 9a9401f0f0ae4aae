"""Vector math over ``ArrayType(FloatType)`` embedding columns — pure
Catalyst expressions (zip_with/aggregate), no UDF, so similarity search
stays JVM-side and whole-stage-codegen'd.

Cross-engine determinism: every element is cast to double *before*
multiplication and the fold is a sequential left fold with 0.0 init —
bit-identical to DuckDB's ``list_reduce`` (no-init fold over the same
products), because 0.0 + x == x exactly in IEEE 754.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold double dot product of two float arrays."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; expression shape (d / (na * nb)) is mirrored
    exactly in the DuckDB oracle so both engines emit identical bits."""
    return dot(a, b) / (norm(a) * norm(b))


# --- DuckDB oracle fragments (same math, same fold order) -----------------


def duck_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE)), (x, y) -> x + y)"
    )


def duck_cosine(a: str, b: str) -> str:
    return f"({duck_dot(a, b)} / (sqrt({duck_dot(a, a)}) * sqrt({duck_dot(b, b)})))"
