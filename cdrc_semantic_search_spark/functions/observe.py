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


def drop_observation(who: str) -> Observation:
    """A uniquely-named Observation for a capped operator's drop count."""
    return Observation(f"{who}-capdrop-{uuid.uuid4().hex[:8]}")


def log_dropped_on_first_action(
    obs: Observation, who: str, cap: int, what: str
) -> None:
    """Log ``obs``'s ``dropped`` metric as soon as the observed plan first
    executes; spawn nothing when the parked-thread registry is full."""
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
            return
        _parked += 1

    def run() -> None:
        global _parked, _saturation_warned
        try:
            metrics = obs.get
        except Exception:  # session torn down before any action
            return
        finally:
            with _lock:
                _parked -= 1
                _saturation_warned = False
        dropped = metrics.get("dropped", 0)
        if dropped:
            log.info(
                "%s: dropped %d %s from candidate generation (cap %d)",
                who, dropped, what, cap,
            )

    threading.Thread(target=run, daemon=True, name=f"capdrop-{who}").start()
