"""Env-gated memoized persist for shared intermediate frames.

`cached_persist(df, *key)` returns `df` untouched unless
MNEMO_CACHE_TABLES=1 (the bench harness sets it). When enabled, the
frame is persisted ONCE per (session, input-plan semantic hash, key)
and every later semantically-equal request returns the same persisted
frame — so repeated queries over the same corpus reuse one
materialization instead of leaking a fresh `persist()` per call
(which evicts useful blocks and adds GC pressure as a long session
accumulates them).

The key includes the SparkSession's applicationId: after a session
restart in the same process a stale entry would hand back a DataFrame
bound to a stopped session. `clear()` unpersists and empties the
cache — the bench harness calls it between runs so persisted blocks
don't accumulate unboundedly.

At cluster scale the equivalent is materializing the shared
intermediate (shingle table, term-frequency table) once per corpus
snapshot and reading it from storage.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_CACHE: dict[tuple, DataFrame] = {}


def cached_persist(
    df: DataFrame, *key_parts, key_plan: DataFrame | None = None
) -> DataFrame:
    """key_plan: hash THIS frame's plan instead of df's own. Needed
    when df's lineage contains a Spark ML transform — every
    Transformer instance wraps a fresh ScalaUDF whose canonical form
    is NOT stable across rebuilds, so df.semanticHash() differs for
    identical programs and the cache both misses and leaks a persisted
    copy per call. Callers pass the pre-ML input projection (a stable
    plan) plus key_parts that pin the transform's own parameters."""
    if os.environ.get("MNEMO_CACHE_TABLES", "") != "1":
        return df
    try:
        app_id = df.sparkSession.sparkContext.applicationId
        src = key_plan if key_plan is not None else df
        plan_hash = src._jdf.queryExecution().analyzed().semanticHash()
    except Exception:  # noqa: BLE001 - cache is best-effort
        return df
    key = (app_id, plan_hash, *key_parts)
    if key not in _CACHE:
        _CACHE[key] = df.persist()
    return _CACHE[key]


def clear() -> None:
    """Unpersist every cached frame and reset. Safe to call with a
    stopped session (unpersist failures are swallowed — the JVM-side
    blocks die with the session anyway)."""
    global _CACHE
    for frame in _CACHE.values():
        try:
            frame.unpersist()
        except Exception:  # noqa: BLE001 - session may be gone
            pass
    _CACHE = {}
