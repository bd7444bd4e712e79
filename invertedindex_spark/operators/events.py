"""Event-stream operators: tumbling-window aggregation, gap-based
sessionization, and a custom stateful sessionizer.

The reference engine is batch-only over a document collection; a
continuously-arriving event/telemetry stream is the other input shape a
large-scale training-data pipeline ingests (the driver testdata ships
an ``events`` table for exactly this). All operators here are written
against the *unbounded* model and work identically on batch frames:

* :func:`windowed_event_counts` — tumbling ``F.window`` aggregation;
  on a streaming DataFrame pass ``watermark`` so state is bounded and
  late rows beyond the watermark are dropped (tested).
* :func:`sessionize` — gap-based sessions via ``F.session_window``
  (state merges as events arrive inside the gap).
* :func:`sessionize_stateful` — the same semantics hand-built on
  ``applyInPandasWithState``: the pattern for stateful logic
  ``session_window`` can't express (custom timeout/eviction policies,
  per-session derived features). Batch twin asserted equal in tests.

Scale shape: every operator is one shuffle on its grouping key
(window/event_type or user). Timestamps are TIMESTAMP_NTZ end-to-end —
no session-timezone dependence, and the DuckDB oracles reproduce the
bucketing bit-for-bit (time_bucket / lag-gap chaining).
"""

from __future__ import annotations

SESSION_SCHEMA = ("user_id long, session_start timestamp_ntz, "
                  "session_end timestamp_ntz, n_events long, "
                  "value_sum double")


def _event_time(df, ts_col: str):
    """Spark watermarks require TIMESTAMP (not NTZ); an NTZ event-time
    column is interpreted in the session timezone — run streaming jobs
    with spark.sql.session.timeZone=UTC so wall clocks are stable."""
    from pyspark.sql import functions as F

    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def windowed_event_counts(df, window: str = "1 hour",
                          ts_col: str = "ts",
                          watermark: str | None = None):
    """(window_start, window_end, event_type, n, value_sum) per
    tumbling window. ``watermark`` (e.g. "2 hours") bounds streaming
    state: aggregates older than max(event time) - watermark finalize
    and late rows beyond it are dropped."""
    from pyspark.sql import functions as F

    if watermark is not None:
        df = _event_time(df, ts_col).withWatermark(ts_col, watermark)
    return (df.groupBy(F.window(ts_col, window).alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum("value").alias("value_sum"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n", "value_sum"))


def sessionize(df, gap: str = "30 minutes", ts_col: str = "ts",
               key_col: str = "user_id",
               watermark: str | None = None):
    """Gap-based sessions per key: events within ``gap`` of the
    previous event chain into one session; session_end = last event +
    gap (Spark session_window semantics, mirrored by the lag-gap
    oracle)."""
    from pyspark.sql import functions as F

    if watermark is not None:
        df = _event_time(df, ts_col).withWatermark(ts_col, watermark)
    return (df.groupBy(F.session_window(ts_col, gap).alias("w"),
                       F.col(key_col))
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("value_sum"))
            .select(key_col,
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events", "value_sum"))


def sessionize_stateful(df, gap_seconds: int = 1800,
                        ts_col: str = "ts", key_col: str = "user_id",
                        watermark: str = "2 hours"):
    """Custom stateful sessionizer on ``applyInPandasWithState`` — the
    escape hatch for session logic the built-in operator can't express.
    State per user = the open session (start, last_ts, n, value_sum);
    an event past the gap closes it (emitted) and opens a new one; the
    event-time timeout flushes idle sessions once the watermark passes
    last_ts + gap. Streaming DataFrames only (Spark restriction);
    the batch twin is :func:`sessionize` (asserted equal in tests).
    """
    import datetime as dt

    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout,
    )

    gap = dt.timedelta(seconds=gap_seconds)

    def us_ts(us):
        return pd.Timestamp(int(us), unit="us")  # naive (NTZ) round-trip

    def fn(key, pdfs, state: GroupState):
        user = key[0]
        out = []
        if state.hasTimedOut:
            start_us, last_us, n, vs = state.get
            out.append((user, us_ts(start_us), us_ts(last_us) + gap,
                        n, vs))
            state.remove()
        else:
            cur = state.get if state.exists else None
            rows = pd.concat(list(pdfs)).sort_values(ts_col)
            for ts, val in zip(rows[ts_col], rows["value"]):
                ts_us = int(pd.Timestamp(ts).value // 1000)
                if cur is not None and \
                        ts_us - cur[1] > gap_seconds * 1_000_000:
                    out.append((user, us_ts(cur[0]), us_ts(cur[1]) + gap,
                                cur[2], cur[3]))
                    cur = None
                if cur is None:
                    cur = (ts_us, ts_us, 1, float(val))
                else:
                    cur = (cur[0], max(cur[1], ts_us), cur[2] + 1,
                           cur[3] + float(val))
            if cur is not None:
                state.update(cur)
                state.setTimeoutTimestamp(cur[1] // 1000
                                          + gap_seconds * 1000)
        if out:
            yield pd.DataFrame(out, columns=[
                "user_id", "session_start", "session_end", "n_events",
                "value_sum"])

    return (_event_time(df, ts_col).withWatermark(ts_col, watermark)
            .groupBy(key_col)
            .applyInPandasWithState(
                fn, SESSION_SCHEMA,
                "start_us long, last_us long, n_events long, "
                "value_sum double",
                "append", GroupStateTimeout.EventTimeTimeout))
