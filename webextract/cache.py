"""Persisted-intermediate tracking for library entry points.

dedup/ann entry points persist() intermediates because both sides of
their fan-out joins would otherwise recompute the dominant subtree
(minhash signatures, flattened vectors — the round-1 CTE-recompute
defect). But persist is lazy and the LIBRARY cannot unpersist before the
CALLER materializes the result — so round 2 leaked cached blocks for the
session lifetime (ADVICE r2 #4). The contract:

- every entry point that persists an intermediate attaches it to the
  returned DataFrame via ``track(result, *frames)`` AND registers it in
  a session-global live set;
- ``release(df)`` unpersists what ``df`` carries. CAVEAT: the tracking
  attribute lives on one specific DataFrame object — any further
  transformation (``.select``, ``.filter``, ``.join``) returns a NEW
  object without it, so ``release`` on a derived frame is a no-op.
  Harness loops that run many queries (bench.py, scripts/check_entry.py)
  therefore call ``release_all()`` between queries — it unpersists every
  frame any library call pinned since the last sweep, regardless of what
  the caller did to the returned object;
- tracking composes: frames that themselves carry tracked intermediates
  propagate them, so ``release`` on the outermost result releases the
  whole chain.

One-shot jobs can ignore release entirely — MEMORY_AND_DISK blocks die
with the session, and Spark evicts under pressure either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_webextract_persisted"

# session-global registry of frames persisted by library entry points —
# the release_all() sweep target (attribute tracking can't survive the
# caller's own .select()/.filter() on the returned frame)
_LIVE: dict[int, DataFrame] = {}


def track(result: DataFrame, *frames: DataFrame | None) -> DataFrame:
    """Attach persisted intermediate ``frames`` (and anything they track)
    to ``result`` so a later ``release(result)`` can unpersist them; also
    register them for ``release_all()``."""
    tracked = list(getattr(result, _ATTR, []))
    seen = {id(t) for t in tracked}
    for f in frames:
        if f is None:
            continue
        for g in [*getattr(f, _ATTR, []), f]:
            if id(g) not in seen:
                tracked.append(g)
                seen.add(id(g))
            _LIVE.setdefault(id(g), g)
    object.__setattr__(result, _ATTR, tracked)
    return result


def release(df: DataFrame) -> int:
    """Unpersist every intermediate tracked on ``df``; returns how many.
    Safe on untracked frames (no-op) and idempotent. See module caveat:
    only works on the exact object a library entry point returned."""
    frames = getattr(df, _ATTR, [])
    n = 0
    for f in frames:
        try:
            f.unpersist()
            n += 1
        except Exception:
            pass  # session gone / already unpersisted — nothing to leak
        _LIVE.pop(id(f), None)
    object.__setattr__(df, _ATTR, [])
    return n


def release_all() -> int:
    """Unpersist EVERY frame any library entry point persisted since the
    last sweep — the between-queries hygiene call for long-lived harness
    sessions. Returns how many frames were released."""
    n = 0
    for f in list(_LIVE.values()):
        try:
            f.unpersist()
            n += 1
        except Exception:
            pass
    _LIVE.clear()
    return n
