"""Persisted-intermediate tracking for library entry points.

dedup/ann entry points persist() intermediates because both sides of
their fan-out joins would otherwise recompute the dominant subtree
(minhash signatures, flattened vectors — the round-1 CTE-recompute
defect). But persist is lazy and the LIBRARY cannot unpersist before the
CALLER materializes the result — so round 2 leaked cached blocks for the
session lifetime (ADVICE r2 #4). The contract now:

- every entry point that persists an intermediate attaches it to the
  returned DataFrame via ``track(result, *frames)``;
- callers that run many library calls in one session call
  ``release(df)`` after materializing ``df`` to unpersist everything the
  call pinned (bench.py and the battery's repeated-call paths do);
- tracking composes: frames that themselves carry tracked intermediates
  propagate them, so ``release`` on the outermost result releases the
  whole chain.

One-shot jobs can ignore release() entirely — MEMORY_AND_DISK blocks die
with the session, and Spark evicts under pressure either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_webextract_persisted"


def track(result: DataFrame, *frames: DataFrame | None) -> DataFrame:
    """Attach persisted intermediate ``frames`` (and anything they track)
    to ``result`` so a later ``release(result)`` can unpersist them."""
    tracked = list(getattr(result, _ATTR, []))
    seen = {id(t) for t in tracked}
    for f in frames:
        if f is None:
            continue
        for g in [*getattr(f, _ATTR, []), f]:
            if id(g) not in seen:
                tracked.append(g)
                seen.add(id(g))
    object.__setattr__(result, _ATTR, tracked)
    return result


def release(df: DataFrame) -> int:
    """Unpersist every intermediate tracked on ``df``; returns how many.
    Safe on untracked frames (no-op) and idempotent."""
    frames = getattr(df, _ATTR, [])
    n = 0
    for f in frames:
        try:
            f.unpersist()
            n += 1
        except Exception:
            pass  # session gone / already unpersisted — nothing to leak
    object.__setattr__(df, _ATTR, [])
    return n
