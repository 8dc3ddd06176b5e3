"""Custom stateful streaming operator: conversation sessionization.

``applyInPandasWithState`` over the turn stream, keyed by ``conv_id``:
state accumulates (turn count, first/last event time, mention-bearing
turn count); a conversation "session" is emitted when the group times out
(no new turns within ``gap``) — the streaming analog of per-conversation
assembly (SURVEY §2.6 W5) for unbounded transcript streams.

At 10^12-turn scale this is the shape that replaces any batch groupBy on
conv_id for live ingest: state is per-key and bounded, the watermark
bounds retention, and emission is incremental.
"""

from __future__ import annotations

from collections.abc import Iterator


import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "conv_id string, n_turns long, n_entity_turns long, "
    "first_ts timestamp, last_ts timestamp"
)
STATE_SCHEMA = "n_turns long, n_entity_turns long, first_ts long, last_ts long"


def sessionize_turns(
    stream_df: DataFrame,
    gap_minutes: float = 30.0,
    watermark: str = "1 hour",
    entity_marker: str = " relates to ",
) -> DataFrame:
    """turn stream → closed conversation sessions (emitted on gap timeout)."""

    def update(
        key: tuple[str],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            n_turns, n_ent, first_us, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [conv_id],
                    "n_turns": [n_turns],
                    "n_entity_turns": [n_ent],
                    "first_ts": [pd.Timestamp(first_us, unit="us")],
                    "last_ts": [pd.Timestamp(last_us, unit="us")],
                }
            )
            return

        n_turns, n_ent, first_us, last_us = (
            state.get if state.exists else (0, 0, None, None)
        )
        for pdf in batches:
            n_turns += len(pdf)
            n_ent += int(pdf["text"].str.contains(entity_marker, regex=False).sum())
            ts_us = (
                pd.to_datetime(pdf["ts"]).astype("datetime64[ns]").astype("int64")
                // 1000
            )
            lo, hi = int(ts_us.min()), int(ts_us.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        state.update((n_turns, n_ent, first_us, last_us))
        # timeout fires when the watermark passes last event time + gap
        state.setTimeoutTimestamp(last_us // 1000 + int(gap_minutes * 60_000))
        return
        yield  # pragma: no cover — makes this a generator in the emit-less path

    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
