"""Cache-lifetime plumbing for operators that persist() an intermediate.

Several operators cache an intermediate DataFrame that feeds multiple
branches of the returned plan (shingle indexes, per-doc term counts,
segment streams, rollup partials): without the cache the corpus would be
re-scanned once per consumer (up to 8x, measured in the round-5 plan
audit). But ``persist()`` entries live in the session's CacheManager
until explicitly unpersisted — a long-lived session cycling many corpora
would pin one entry per distinct input plan forever (ADVICE r5).

:func:`register_cached` bounds that growth with an LRU of live entries:
each operator registers its persisted intermediates, and once more than
``MAX_LIVE_CACHED`` are alive the oldest are unpersisted. Eviction is
correctness-neutral — a plan whose cache entry was evicted silently
recomputes (Spark re-resolves identical plans against the CacheManager,
so a re-persisted twin re-caches) — and it only bites in the scenario it
exists for: a session cycling through many distinct corpora/term sets,
where the oldest entries belong to finished work.

A finalizer-based design (release when the caller drops the result) was
tried first and rejected: callers routinely derive further
transformations from the returned DataFrame and drop the intermediate
Python object immediately, which fired the release BEFORE the job ran
and silently restored the multi-scan plan (caught by
``tests/test_plans.py::test_no_redundant_corpus_scans``).

**Build-many-then-execute caveat (ADVICE r6):** eviction happens at
plan-CONSTRUCTION time, not execution time. A caller that constructs
more than ``MAX_LIVE_CACHED`` operator plans before executing any will
have the earliest intermediates unpersisted pre-execution, restoring
their multi-scan plans (perf-only; results stay correct). This is a
deliberate trade: the only driver-side signal for "has this plan-keyed
cache entry materialized?" lives in CacheManager/InMemoryRelation
internals (``isCachedColumnBuffersLoaded`` behind a py4j plan-tree
walk), which is version-fragile, and an UNmaterialized ``persist()``
pins no storage — so deferring eviction would trade a bounded perf edge
case for unbounded bookkeeping keyed to Spark internals. Callers
batching >16 operator plans should execute in batches (each backed by
its own registration refresh) or call :func:`release_cached` /
:func:`clear_operator_caches` at their own batch boundaries.

``clear_operator_caches()`` releases everything now — the explicit
batch-boundary hook for pipelines that want deterministic cleanup.
"""

from __future__ import annotations

import threading
from collections import OrderedDict

from pyspark.sql import DataFrame

# Upper bound on live operator-cache entries. Each entry is
# MEMORY_AND_DISK and potentially corpus-token-scale; 16 comfortably
# covers every concurrent query shape in this engine while keeping a
# many-corpora session's footprint bounded.
MAX_LIVE_CACHED = 16

_lock = threading.Lock()
# semanticHash -> jdf handle, in LRU order (oldest first). Keyed by the
# plan's semantic hash because Spark's CacheManager is plan-keyed: two
# register calls for the same logical plan share ONE cache entry, and a
# duplicate deque handle would both waste an LRU slot and — worse —
# unpersist the shared entry when the STALE duplicate aged out while
# the newer registration still counted as live.
_live: OrderedDict = OrderedDict()


def _unpersist_quietly(jdf) -> None:
    try:
        jdf.unpersist(False)
    except Exception:
        # interpreter shutdown / stopped SparkContext: nothing to release
        pass


def register_cached(*cached: DataFrame) -> None:
    """Track persisted intermediates; evict (unpersist) the oldest past
    ``MAX_LIVE_CACHED``. Re-registering a semantically identical plan
    refreshes its LRU position instead of adding a duplicate handle.
    Holds only JVM-side handles."""
    evicted = []
    with _lock:
        for c in cached:
            key = c.semanticHash()
            if key in _live:
                _live.move_to_end(key)
            else:
                _live[key] = c._jdf
        while len(_live) > MAX_LIVE_CACHED:
            _, jdf = _live.popitem(last=False)
            evicted.append(jdf)
    for jdf in evicted:
        _unpersist_quietly(jdf)


def release_cached(*cached: DataFrame) -> None:
    """Unpersist specific entries now — the targeted hook for callers
    that know an intermediate is dead (e.g. after an eager checkpoint
    materialized everything downstream of it). Removes the LRU slot so
    dead data doesn't age out still-live entries of other operators."""
    with _lock:
        for c in cached:
            _live.pop(c.semanticHash(), None)
    for c in cached:
        _unpersist_quietly(c._jdf)


def clear_operator_caches() -> None:
    """Unpersist every tracked operator cache entry now."""
    with _lock:
        entries = list(_live.values())
        _live.clear()
    for jdf in entries:
        _unpersist_quietly(jdf)
