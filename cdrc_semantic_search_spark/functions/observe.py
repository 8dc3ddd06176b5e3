"""Lazy, bounded drop-count logging for capped operators.

The dedup/graph scale guards (``max_shingle_df``, ``max_bucket_size``,
``max_center_degree``) must never be silent, but they must also never
add an eager job at DataFrame-construction time (ADVICE r4). The drop
count therefore rides the caller's FIRST action as an ``Observation``;
``Observation.get`` blocks until the observed plan runs, so the wait
lives on a daemon thread.

A plan that is never executed parks its thread forever, holding the
Observation (and through it the full plan) plus a py4j connection.
With caps default-on, every capped-operator construction spawns one —
a driver service that builds plans speculatively would leak without
bound. The registry below bounds the number of concurrently-parked
logger threads; past the limit the guard still FILTERS (it is part of
the plan), only the best-effort drop LOGGING is skipped, with a single
saturation notice.
"""

from __future__ import annotations

import logging
import threading
import uuid

from pyspark.sql import Observation

log = logging.getLogger("cdrc_semantic_search_spark")

#: max logger threads parked on never-executed plans before new capped
#: constructions skip spawning (filtering is unaffected)
MAX_PARKED_LOGGERS = 32

_lock = threading.Lock()
_parked = 0
_saturation_warned = False


def unique_observation(who: str) -> Observation:
    """A uniquely-named Observation (Spark requires distinct names per
    session; loops and repeated operator calls need a fresh one each
    time). Shared by the capdrop loggers and the graph operators'
    convergence probes."""
    return Observation(f"{who}-{uuid.uuid4().hex[:8]}")


def drop_observation(who: str) -> Observation:
    """A uniquely-named Observation for a capped operator's drop count."""
    return unique_observation(f"{who}-capdrop")


def _dropped_metric(obs: Observation) -> int | None:
    """The single ``dropped`` metric of ``obs``; ``None`` when AQE lost it.

    Two plan-shape hazards, both hit by the capped operators (measured,
    r5): (1) ``Observation.get`` round-trips the metrics row through
    ``PythonSQLUtils.toPyRow``, which asserts the row carries a schema —
    rows merged out of adaptive subplans can arrive schema-less, so
    ``obs.get`` raises ``Py4JJavaError``. Every capdrop observation
    declares exactly ONE metric, so fall back to reading the JVM row
    positionally, bypassing ``toPyRow`` (the blocking wait already
    happened inside the failed ``obs.get``, so the fallback ``getRow()``
    returns the cached row immediately). (2) When the query stage
    containing the observed node finishes with ZERO output rows — i.e.
    the cap dropped everything, the most interesting case — AQE's
    empty-relation propagation replaces the whole subtree, the
    CollectMetrics node included, and the metrics row arrives EMPTY.
    The count is genuinely unrecoverable then; return ``None`` so the
    caller logs an explicit unavailable notice instead of silence.
    """
    try:
        metrics = obs.get
    except Exception:
        jrow = obs._jo.getRow()  # cached after the failed obs.get
        if jrow.size() == 0:
            return None
        return int(jrow.get(0) or 0)
    if "dropped" not in metrics:
        return None
    return int(metrics["dropped"] or 0)


def log_dropped_on_first_action(
    obs: Observation, who: str, cap: int, what: str
) -> "threading.Thread | None":
    """Log ``obs``'s ``dropped`` metric as soon as the observed plan first
    executes; spawn nothing when the parked-thread registry is full.
    Returns the logger thread (tests join it); ``None`` when saturated."""
    global _parked, _saturation_warned
    with _lock:
        if _parked >= MAX_PARKED_LOGGERS:
            if not _saturation_warned:
                log.info(
                    "capdrop logging saturated: %d logger threads parked on "
                    "never-executed capped plans; further drop counts will "
                    "not be logged until those plans run (capping itself is "
                    "unaffected)",
                    MAX_PARKED_LOGGERS,
                )
                _saturation_warned = True
            return None
        _parked += 1

    def run() -> None:
        global _parked, _saturation_warned
        try:
            dropped = _dropped_metric(obs)
        except Exception:
            # session torn down before any action ran this plan
            log.debug("capdrop observation for %s unavailable", who, exc_info=True)
            return
        finally:
            with _lock:
                _parked -= 1
                _saturation_warned = False
        if dropped is None:
            log.info(
                "%s: %s drop count unavailable — the capped branch finished "
                "empty and AQE pruned the observed node (cap %d applied; an "
                "empty capped branch usually means the cap dropped "
                "everything it saw)",
                who, what, cap,
            )
        elif dropped:
            log.info(
                "%s: dropped %d %s from candidate generation (cap %d)",
                who, dropped, what, cap,
            )

    t = threading.Thread(target=run, daemon=True, name=f"capdrop-{who}")
    t.start()
    return t
