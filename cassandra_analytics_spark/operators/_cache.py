"""Cache-lifetime plumbing for operators that persist() an intermediate.

Several operators cache an intermediate DataFrame that feeds multiple
branches of the returned plan (shingle indexes, per-doc term counts,
segment streams): without the cache the corpus would be re-scanned once
per consumer. But ``persist()`` entries live in the session's
CacheManager until explicitly unpersisted — a long-lived session cycling
many corpora would pin one entry per distinct input plan forever.

:func:`release_cache_with` ties each cached intermediate's lifetime to
the RESULT DataFrame the operator returns: when the caller's last
reference to the result is garbage-collected, the intermediates are
unpersisted. The contract is correctness-neutral — unpersist never
changes results, only whether a later re-execution recomputes — and the
timing is safe: while any action on the result is running, the caller
necessarily holds a reference, so the finalizer cannot fire mid-job.
Callers that keep the result around keep the cache (they may well
re-execute); callers that drop it release the memory/disk immediately
at the next GC instead of at session end.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame


def release_cache_with(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Unpersist ``cached`` when ``result`` is garbage-collected.

    Holds only the JVM-side handles (not the Python DataFrames, which
    would create a reference cycle keeping everything alive). Unpersist
    failures are swallowed: at interpreter shutdown the py4j gateway may
    already be gone, and a dead SparkContext has nothing to release.
    """
    jdfs = [c._jdf for c in cached]

    def _release() -> None:
        for j in jdfs:
            try:
                j.unpersist(False)
            except Exception:
                pass

    weakref.finalize(result, _release)
    return result
