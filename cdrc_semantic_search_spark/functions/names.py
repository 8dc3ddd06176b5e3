"""Internal-column naming that cannot collide with user data.

Operators that add helper columns (salt lanes, window ranks) must not
assume names like ``__lane`` are free — a caller's frame may already
carry them (e.g. a lakehouse table that was itself written by a salting
job), which yields a duplicate-column error or, worse, silently joins on
the wrong lane.
"""

from __future__ import annotations

from collections.abc import Iterable


def internal_col(existing: Iterable[str], base: str) -> str:
    """First of ``base``, ``base_2``, ``base_3``, … not in ``existing``.

    Deterministic (no randomness — plans must be stable across runs) and
    total: some suffix is always free because ``existing`` is finite.
    """
    cols = set(existing)
    if base not in cols:
        return base
    i = 2
    while f"{base}_{i}" in cols:
        i += 1
    return f"{base}_{i}"
