"""Custom stateful streaming operators (applyInPandasWithState).

Two ops a continuously-fed training-data pipeline needs that plain windowed
aggregates can't express:

- :func:`stream_first_seen` — streaming exact dedup: emit only the FIRST
  row per content fingerprint, across triggers and restarts. State is one
  marker per key, partitioned by the fingerprint (Spark shuffles each key's
  rows to its state partition — at 10^12 docs the state store shards across
  executors; RocksDB state store on a real cluster keeps it off-heap).
  Built-in ``dropDuplicates`` on a stream needs a watermark and evicts state
  at the horizon — first-seen dedup must remember keys forever (or until an
  explicit TTL), which is exactly what GroupState gives.

- :func:`stream_sessions` — gap-based sessions over event time via the
  built-in ``session_window`` (preferred over hand-rolled state when the
  semantics fit: JVM-side, watermark-integrated, merges across triggers).

Both are exercised end-to-end (file-source stream -> availableNow -> memory
sink) in tests/test_streaming_stateful.py.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_FIRST_SEEN_OUT = StructType(
    [
        StructField("fingerprint", StringType()),
        StructField("url", StringType()),
        StructField("n_duplicates", LongType()),
    ]
)
# state: (emitted flag is implicit in existence, running duplicate count)
_FIRST_SEEN_STATE = StructType(
    [StructField("first_url", StringType()), StructField("dups", LongType())]
)


def _first_seen_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit the first row of this fingerprint ever seen; count the rest.

    Deterministic across partition orderings within a trigger: the winner is
    the lexicographically smallest url in the first batch that sees the key
    (input splits land in one group here, but file order is not guaranteed).
    """
    rows = pd.concat(list(pdfs), ignore_index=True)
    n = len(rows)
    if state.exists:
        first_url, dups = state.get
        state.update((first_url, dups + n))
        return iter(())  # already emitted; swallow duplicates
    winner = rows["url"].min()
    state.update((winner, n - 1))
    return iter(
        [
            pd.DataFrame(
                {
                    "fingerprint": [key[0]],
                    "url": [winner],
                    "n_duplicates": [n - 1],
                }
            )
        ]
    )


def stream_first_seen(pages_stream: DataFrame) -> DataFrame:
    """(fingerprint, url, n_duplicates): first occurrence per content hash.

    Input: the pages stream (url, text, ...). The fingerprint is
    ``md5(text)`` — the same exact-dedup key as the batch path
    (spark/dedup.py exact_duplicates), so batch and stream agree on what
    "duplicate" means. Output mode must be ``append``.

    ``n_duplicates`` counts duplicates that arrived in the SAME trigger as
    the first occurrence — append mode emits each key exactly once, so
    later-trigger duplicates cannot be re-emitted. They ARE still
    accumulated in the keyed state (readable with the state-store reader,
    ``spark.read.format("statestore")``), which is where a running total
    lives; treating the emitted column as an all-time count would
    undercount any key whose duplicates span triggers.
    """
    keyed = pages_stream.select(
        F.md5(F.col("text")).alias("fingerprint"), "url"
    )
    return keyed.groupBy("fingerprint").applyInPandasWithState(
        _first_seen_fn,
        outputStructType=_FIRST_SEEN_OUT,
        stateStructType=_FIRST_SEEN_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_sessions(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user gap sessions: (user_id, session_start, session_end, n_events).

    ``session_window`` merges windows across triggers until the watermark
    closes them — the streaming form of the batch q_sessionize_events
    (which uses lag() over a static table).
    """
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(
            F.session_window(F.col("ts"), gap).alias("w"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
