"""Streaming analytics over event streams (SURVEY section 2.9 extension).

The reference has no window aggregations; these are the Spark-native
extensions a timeseries engine needs at scale:

- ``windowed_event_stats``: tumbling event-time windows with a watermark —
  late data inside the watermark updates its window, older data drops.
- ``session_event_stats``: built-in ``session_window`` (gap-based).
- ``running_user_counts``: custom stateful operator via
  ``applyInPandasWithState`` — the escape hatch for semantics the built-in
  windows can't express (cumulative per-key counters here; the same shape
  carries sessionization-with-side-outputs, CEP, etc.). State is
  per-key and partitioned by the grouping key, so it scales horizontally.

All three take a *streaming or batch* DataFrame with (ts, user_id,
event_type, value) — same lineage either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_event_stats(events: DataFrame, *, window: str = "1 hour",
                         watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts + decimal sums per event type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"))
        .select(F.col("win.start").alias("window_start"),
                F.col("win.end").alias("window_end"),
                "event_type", "n_events", "sum_value")
    )


def session_event_stats(events: DataFrame, *, gap: str = "30 minutes",
                        watermark: str = "2 hours") -> DataFrame:
    """Per-user session windows (gap-based) with event counts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("sess.start").alias("session_start"),
                F.col("sess.end").alias("session_end"),
                "user_id", "n_events")
    )


def windowed_term_counts(docs: DataFrame, *, window: str = "1 hour",
                         watermark: str = "2 hours",
                         ts_col: str = "ts",
                         text_col: str = "text") -> DataFrame:
    """Per-window TERM counts over a document stream — the corpus-drift
    monitor's streaming half (the batch half is
    ``llm.text.composition_drift``): watch what vocabulary a crawl is
    suddenly full of, window by window.

    One map-side tokenize+explode, then a watermarked tumbling-window
    aggregate on (window, term) — partial aggregation applies, state
    per window is vocabulary-bounded, and late docs inside the
    watermark update their window. Same lineage batch or streaming.
    Top-k-per-window RANKING is a rank window: run it on the sink
    table (or foreachBatch) — a global rank inside one streaming query
    would need unsupported chained stateful ops.
    """
    from ..llm.text import tokens

    return (
        docs.withWatermark(ts_col, watermark)
        .select(ts_col, F.explode(tokens(text_col)).alias("term"))
        .groupBy(F.window(ts_col, window).alias("win"), "term")
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("window_start"),
                F.col("win.end").alias("window_end"), "term", "n")
    )


def dedup_within_watermark(events: DataFrame, keys: list[str],
                           *, watermark: str = "1 hour") -> DataFrame:
    """Streaming duplicate drop bounded by the watermark
    (``dropDuplicatesWithinWatermark``): state for a key is held only
    until the watermark passes — the streaming twin of the batch
    keep-latest dedup, with bounded state instead of a bounded DELETE."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def correlate_streams(left: DataFrame, right: DataFrame, *,
                      key: str = "user_id", within: str = "1 hour",
                      watermark: str = "2 hours") -> DataFrame:
    """Stream-stream inner join bounded by event time: pair left/right
    events on the same key whose timestamps are within ``within`` of
    each other (right at-or-after left).

    Both sides are watermarked, and the time-range condition is what
    lets Spark BOUND the join state: a buffered left row can be dropped
    once the right watermark passes left.ts + within (and vice versa) —
    without the range predicate the state store grows forever. This is
    the streaming twin of :func:`operators.rangejoin.overlap_join`'s
    batch formulation. Works on batch frames too (same lineage, the
    watermarks are no-ops there).
    """
    l_w = left.withWatermark("ts", watermark).select(
        F.col(key), F.col("ts").alias("l_ts"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns
          if c not in (key, "ts")])
    r_w = right.withWatermark("ts", watermark).select(
        F.col(key).alias("__rk"), F.col("ts").alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns
          if c not in (key, "ts")])
    cond = ((F.col(key) == F.col("__rk"))
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}")))
    return l_w.join(r_w, cond).drop("__rk")


_STATE_SCHEMA = "total long"
_OUTPUT_SCHEMA = "user_id long, batch_events long, total_events long"


def _count_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    batch = sum(len(pdf) for pdf in pdfs)
    total = (state.get[0] if state.exists else 0) + batch
    state.update((total,))
    yield pd.DataFrame({"user_id": [key[0]], "batch_events": [batch],
                        "total_events": [total]})


def running_user_counts(events: DataFrame) -> DataFrame:
    """Custom stateful operator: cumulative per-user event totals across
    micro-batches. Arrow-batched state updates, keyed state store."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _count_fn,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
