"""Session-scoped side-effect caches.

Several modules memoize expensive per-(session, sf_dir) work — persisted
DataFrames (decoded record batches, shingle frames) and staged temp-dir
fixtures. Keys lead with ``applicationId`` (stable for a session's
lifetime, never recycled the way ``id()`` can be). Exactly one
SparkContext is live per JVM, so any cache entry keyed by a different
applicationId belongs to a *stopped* session: its DataFrames are
unusable and its temp dirs are reclaimed at interpreter exit. Dropping
those references on access keeps long-lived multi-session processes from
accumulating dead entries.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


class SessionCache(dict):
    """dict keyed by tuples that lead with an applicationId; entries of
    other (necessarily stopped) sessions are evicted on each scoped
    lookup."""

    def scoped_key(self, spark: SparkSession, *rest: str) -> tuple:
        app_id = spark.sparkContext.applicationId
        for stale in [k for k in self if k[0] != app_id]:
            del self[stale]
        return (app_id, *rest)
