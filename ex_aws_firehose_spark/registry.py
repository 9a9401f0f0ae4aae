"""Central query registry — the single source of truth for the engine's
operator inventory (SURVEY.md §2).

Every operator module registers its queries here via the :func:`query`
decorator.  ``__spark_entry__.py`` (the driver contract) and ``bench.py``
both read :data:`REGISTRY`, so an operator is "done" exactly when it has
a registry entry — with a DuckDB ``oracle`` SQL string whenever the
semantics are ANSI-SQL-expressible (the driver's differential-correctness
gate), and ``oracle=None`` for approximate / iterative / streaming-only
operators (driver falls back to a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    key: str
    fn: QueryFn
    oracle: str | None
    doc: str
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, RegisteredQuery] = {}


def query(
    key: str, *, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn(spark, sf_dir) -> DataFrame`` under ``key``.

    ``oracle`` is the equivalent ANSI SQL for DuckDB over the same parquet
    tables (pre-registered views). Column names/aliases MUST match the
    Spark result exactly — the driver sorts columns by name before
    hashing values.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if key in REGISTRY:
            raise ValueError(f"duplicate query key {key!r}")
        REGISTRY[key] = RegisteredQuery(
            key=key, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip(), tags=tags
        )
        return fn

    return deco


def load_all_operators() -> None:
    """Import every operator module so decorators populate REGISTRY."""
    # Imports are deferred so `import ex_aws_firehose_spark` stays cheap
    # and circular imports are impossible.
    from ex_aws_firehose_spark.operators import (  # noqa: F401
        analytics,
        firehose,
        llm,
        multimodal,
        relational,
        scale,
        tpch,
    )
    from ex_aws_firehose_spark.sources import formats  # noqa: F401
    from ex_aws_firehose_spark.streaming import (  # noqa: F401
        queries as streaming_queries,
    )
