"""Shared registry for persisted intermediates whose cache must outlive
the function that created them (lazy plans returned to the caller).

The curation pipelines and the prefix-filter pre-collapse both persist
frames that several downstream subtrees read; the plans they return are
LAZY, so the creating function cannot unpersist. This registry gives
callers one lifecycle surface (r9 ADVICE: the previous module-global
list was unbounded and unsynchronized):

- :func:`track` — register a persisted frame (thread-safe; warns once
  past a soft threshold so a long-lived session that never releases is
  visibly leaking instead of silently accumulating executor memory);
- :func:`release_all` — unpersist everything tracked since the last
  release (bench.py's between-query ``spark.catalog.clearCache()``
  subsumes it for the bench loop);
- :func:`cache_scope` — context manager releasing exactly the frames
  tracked inside the ``with`` body, for composing callers that
  materialize a pipeline's result and want its intermediates dropped
  without touching caches owned by an outer scope.
"""

from __future__ import annotations

import threading
import warnings
from contextlib import contextmanager

from pyspark.sql import DataFrame

_LOCK = threading.RLock()
_LIVE: list[DataFrame] = []

#: soft bound: past this many live tracked caches a warning fires (once
#: per crossing) — the session is accumulating persisted frames without
#: releasing them
WARN_THRESHOLD = 32


def track(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for a later release."""
    df = df.persist()
    with _LOCK:
        _LIVE.append(df)
        if len(_LIVE) == WARN_THRESHOLD + 1:
            warnings.warn(
                f"llm.cachereg: {len(_LIVE)} persisted intermediates are "
                "live — call release_all() (or wrap pipeline construction "
                "in cache_scope()) after materializing results",
                ResourceWarning,
                stacklevel=3,
            )
    return df


def stage(df: DataFrame) -> DataFrame:
    """Persist ``df`` AND truncate its logical plan (r16 optimization):
    ``track`` + a lazy ``localCheckpoint``, for multi-consumer PHASE
    BOUNDARIES in composed pipelines.

    Why both: ``persist`` alone dedupes *execution* (the cache
    substitutes at physical planning) but every downstream reuse still
    embeds the full ANALYZED tree — measured at r16 open, the
    training-shards manifest reached 10,682 analyzed nodes (e 178 ->
    minhash pairs 1,135 -> final 10,682 by doubling at each reuse), and
    a 3.5k-row manifest paid ~7 s of driver-side plan construction plus
    seconds of optimizer/AQE orchestration PER ACTION (guide §3.3:
    very large plans make planning itself the bottleneck; materialize to
    truncate). The lazy localCheckpoint turns the frame into a leaf
    (LogicalRDD) for every consumer, so downstream plans stay a few
    dozen nodes.

    The persist stays underneath so a REBUILT identical pipeline (the
    bench runs each entry fn several times) re-materializes the
    checkpoint FROM the still-live cache instead of recomputing the
    phase — checkpoint blocks themselves are freed by the
    ContextCleaner when the frame is garbage-collected, not by
    ``release_all`` (they are a copy of a small, bounded frame: every
    call site stages a survivors/manifest-grade table, not a corpus).
    Rows/schema are byte-identical to the plain persist — checkpointing
    stores exactly what the plan computes."""
    return track(df).localCheckpoint(eager=False)


def release_all() -> None:
    """Unpersist every tracked intermediate. Safe at any time — a
    consumer that re-reads a released plan just recomputes it."""
    with _LOCK:
        live, _LIVE[:] = _LIVE[:], []
    for df in live:
        df.unpersist()


@contextmanager
def cache_scope():
    """Release exactly the caches tracked inside the scope on exit,
    leaving caches tracked by outer scopes (or other threads that
    happened to interleave) live. Snapshot-diff rather than index-based
    so concurrent track/release from other threads stays safe."""
    with _LOCK:
        before = {id(df) for df in _LIVE}
    try:
        yield
    finally:
        with _LOCK:
            mine = [df for df in _LIVE if id(df) not in before]
            _LIVE[:] = [df for df in _LIVE if id(df) in before]
        for df in mine:
            df.unpersist()
