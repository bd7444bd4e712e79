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
                        watermark: str = "2 hours",
                        max_buffered_events: int | None = 100_000):
    """Custom stateful sessionizer on ``applyInPandasWithState`` — the
    escape hatch for session logic the built-in operator can't express.

    State per user = the BUFFER of not-yet-final events (timestamps +
    values), not a pre-aggregated open session: events may arrive out
    of order across micro-batches (anything newer than the watermark
    is legal), and only buffering makes a late-but-in-watermark event
    land in its true session. Each invocation re-chains the buffer
    with the gap rule (inclusive boundary — exactly
    :func:`sessionize`'s semantics) and emits every session whose
    ``last + gap < watermark``: no admissible future event can merge
    into those. Remaining events stay buffered; an event-time timeout
    flushes them once the watermark passes. Rows older than the
    watermark are dropped (Spark does not pre-filter them for this
    operator). Streaming DataFrames only (Spark restriction); the
    batch twin is :func:`sessionize` (asserted equal in tests,
    including cross-batch out-of-order arrivals and NULL values — an
    all-NULL session emits SQL NULL). One documented domain edge: a
    literal NaN event value is treated as NULL (skipped from
    ``value_sum``) because the pandas state boundary converts SQL NULL
    to NaN and the two become indistinguishable here, while the batch
    twin's ``F.sum`` would propagate a genuine NaN; metric streams
    carrying meaningful NaN should encode it explicitly.

    ``max_buffered_events`` bounds per-key state: a single
    pathological key (bot traffic) whose events keep arriving inside
    the watermark window would otherwise buffer without limit. When a
    key's buffer would exceed the cap, every chained session is
    force-flushed (emitted with its gap-rule end even though the
    watermark has not passed it) and the buffer clears — an explicit
    evict-with-flush degradation: a late event that would have merged
    into a flushed session starts a new one instead. Normal keys never
    hit the cap and keep exact batch parity; ``None`` disables the
    guard.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout,
    )

    gap_us = gap_seconds * 1_000_000

    def us_ts(us):
        return pd.Timestamp(int(us), unit="us")  # naive (NTZ) round-trip

    def fn(key, pdfs, state: GroupState):
        user = key[0]
        wm_us = state.getCurrentWatermarkMs() * 1000
        buf = list(zip(*state.get)) if state.exists else []
        if not state.hasTimedOut:
            for pdf in pdfs:
                for ts, val in zip(pdf[ts_col], pdf["value"]):
                    ts_us = int(pd.Timestamp(ts).value // 1000)
                    if ts_us >= wm_us:   # late-beyond-watermark dropped
                        buf.append((ts_us, float(val)))
        buf.sort()
        # chain into sessions (event at exactly last+gap merges)
        sessions = []   # [start_idx, end_idx) into buf
        start = 0
        for i in range(1, len(buf)):
            if buf[i][0] - buf[i - 1][0] > gap_us:
                sessions.append((start, i))
                start = i
        if buf:
            sessions.append((start, len(buf)))
        # state-cap guard: force-flush every session when the buffer
        # exceeds the cap (see docstring) — state stays bounded under
        # a hot key at the cost of possibly splitting its sessions
        force = (max_buffered_events is not None
                 and len(buf) > max_buffered_events)
        out, keep, first_close_us = [], [], None
        for s, e in sessions:
            last = buf[e - 1][0]
            if force or last + gap_us < wm_us:  # closed (or forced)
                # value_sum skips NULLs exactly like the batch twin's
                # F.sum (all-null session -> NULL, never NaN/0)
                vals = [v for _, v in buf[s:e] if v == v]  # drop NaN
                out.append((user, us_ts(buf[s][0]), us_ts(last + gap_us),
                            e - s, sum(vals) if vals else None))
            else:
                if first_close_us is None:
                    # sessions iterate in time order — this is the
                    # EARLIEST still-open session's close time
                    first_close_us = last + gap_us
                keep.extend(buf[s:e])
        if keep:
            state.update(([t for t, _ in keep], [v for _, v in keep]))
            # fire once the watermark can close the EARLIEST kept
            # session (keying the timeout to the newest one would
            # delay older idle-key sessions unboundedly)
            state.setTimeoutTimestamp(
                max(first_close_us // 1000 + 1, wm_us // 1000 + 1))
        elif state.exists:
            state.remove()
        if out:
            odf = pd.DataFrame(out, columns=[
                "user_id", "session_start", "session_end", "n_events",
                "value_sum"])
            # nullable float so an all-null session round-trips as SQL
            # NULL (a plain float64 column would coerce None to NaN)
            odf["value_sum"] = pd.array(
                [r[4] for r in out], dtype="Float64")
            yield odf

    return (_event_time(df, ts_col).withWatermark(ts_col, watermark)
            .groupBy(key_col)
            .applyInPandasWithState(
                fn, SESSION_SCHEMA,
                "ts_us array<long>, vals array<double>",
                "append", GroupStateTimeout.EventTimeTimeout))


def event_funnel(df, steps, within_seconds: int = 3600,
                 ts_col: str = "ts", user_col: str = "user_id",
                 type_col: str = "event_type"):
    """Funnel analysis — the product-analytics sequence-conversion
    query (Amplitude/Mixpanel-style: "of users who VIEWED, how many
    then CLICKED, then PURCHASED, all within the window?"): for each
    funnel step k, the number of distinct users having SOME step-1
    event followed by in-order occurrences of steps 2..k with the
    whole chain inside ``within_seconds`` of that start.

    Kernel: per (user, start) greedy chaining — each next step takes
    its EARLIEST event strictly after the running chain time. Greedy
    minimizes every chain time (induction), so greedy-within-window ⇔
    some-chain-within-window — the same minimal-window lemma as the
    sloppy-phrase kernel (operators/query._phrase_docs_df), applied
    to event time instead of token positions. Every step-1 event is a
    candidate start (a later start can succeed where the earliest
    fails the window), exactly like phrase chaining tries every
    anchor position.

    Window arithmetic runs on integer MICROSECONDS (unix_micros ↔
    DuckDB epoch_us) — no float seconds, no truncation-direction
    divergence between engines. Strict ``>`` ordering: a same-
    timestamp pair never chains (simultaneous events have no order).

    Returns DataFrame(step_index, step, n_users) in funnel order —
    n_users is non-increasing by construction.

    Scale shape: one equality join per funnel step on the user key,
    each followed by a map-side-combinable min-aggregation on
    (user, start); candidate starts are bounded by the user's step-1
    event count. No windows over the corpus, nothing all-pairs;
    repeated steps re-filter the same narrow typed slice of one
    cached scan."""
    from pyspark.sql import functions as F

    steps = list(steps)
    if len(steps) < 2:
        raise ValueError(
            f"event_funnel needs >= 2 steps (got {steps})")
    within_us = int(within_seconds) * 1_000_000
    if within_us < 0:
        raise ValueError(
            f"within_seconds must be >= 0 (got {within_seconds})")
    e = df.select(F.col(user_col).alias("user_id"),
                  F.col(type_col).alias("event_type"),
                  F.unix_micros(F.col(ts_col).cast("timestamp"))
                  .alias("t_us"))
    chain = (e.where(F.col("event_type") == steps[0])
             .select("user_id", F.col("t_us").alias("t1"))
             .distinct()
             .withColumn("tprev", F.col("t1")))
    levels = [chain]
    for s in steps[1:]:
        nxt = (e.where(F.col("event_type") == s)
               .select("user_id", F.col("t_us").alias("tn")))
        chain = (chain.join(nxt, "user_id")
                 .where(F.col("tn") > F.col("tprev"))
                 .groupBy("user_id", "t1")
                 .agg(F.min("tn").alias("tprev"))
                 .where(F.col("tprev") - F.col("t1")
                        <= F.lit(within_us)))
        levels.append(chain)
    parts = []
    for i, (s, ch) in enumerate(zip(steps, levels), 1):
        parts.append(ch.agg(
            F.count_distinct("user_id").alias("n_users"))
            .select(F.lit(i).alias("step_index"),
                    F.lit(s).alias("step"), "n_users"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("step_index")


def cohort_retention(df, bucket: str = "1 week", max_offset: int = 8,
                     ts_col: str = "ts", user_col: str = "user_id"):
    """Cohort retention — the other classic product-analytics table
    (funnel's sibling): users are cohorted by the time bucket of
    their FIRST event; ``retained[k]`` counts the cohort's distinct
    users with ANY event in cohort-bucket + k. Row (cohort_start,
    offset, n_users) for offsets 0..``max_offset`` that have at
    least one retained user — offset 0 is the cohort size by
    construction (every user is active in their first bucket), so
    rates are ``n_users(k) / n_users(0)`` caller-side (a stored rate
    would be float-division fragile across engines; counts are
    exact).

    Buckets are fixed-width tumbling windows of ``bucket`` (a Spark
    interval string, e.g. "1 week" / "1 day") anchored at the epoch —
    the `windowed_event_counts` convention, reproduced in DuckDB by
    integer-microsecond floor division (epoch-anchored, so both
    engines bucket identically with no calendar arithmetic).

    Scale shape: one min-aggregation per user (the cohort
    assignment), one equality join back on the user key, one
    (cohort, offset) keyed count — map-side combinable throughout;
    nothing all-pairs, no windows over the corpus."""
    from pyspark.sql import functions as F

    max_offset = int(max_offset)
    if max_offset < 0:
        raise ValueError(
            f"max_offset must be >= 0 (got {max_offset})")
    width_us = _interval_us(df.sparkSession, bucket)
    e = df.select(F.col(user_col).alias("user_id"),
                  F.unix_micros(F.col(ts_col).cast("timestamp"))
                  .alias("t_us"))
    b = e.select("user_id",
                 F.floor(F.col("t_us") / F.lit(width_us))
                 .alias("bk")).distinct()
    cohort = b.groupBy("user_id").agg(F.min("bk").alias("cb"))
    j = (b.join(cohort, "user_id")
         .withColumn("offset", (F.col("bk") - F.col("cb"))
                     .cast("long"))
         .where(F.col("offset") <= F.lit(max_offset)))
    return (j.groupBy("cb", "offset")
            .agg(F.count_distinct("user_id").alias("n_users"))
            .select((F.col("cb") * F.lit(width_us)).cast("long")
                    .alias("cohort_us"),
                    "offset", "n_users")
            .orderBy("cohort_us", "offset"))


def _interval_us(spark, bucket: str) -> int:
    """A Spark interval string's fixed width in microseconds —
    evaluated by Spark itself (one tiny literal query, no parsing
    drift), restricted to day-time intervals (calendar months vary
    in width and cannot anchor fixed tumbling buckets)."""
    from pyspark.sql import functions as F

    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp")
    row = spark.range(1).select(
        (F.unix_micros(epoch + F.expr(f"INTERVAL '{bucket}'"))
         - F.unix_micros(epoch)).alias("us")).collect()
    us = int(row[0]["us"])
    if us <= 0:
        raise ValueError(
            f"bucket must be a positive day-time interval "
            f"(got {bucket!r})")
    return us
