"""Event-stream operators: batch/stream parity of the windowed
aggregation (with watermark late-data drop) and the
applyInPandasWithState sessionizer vs the session_window batch twin."""

import datetime as dt
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from invertedindex_spark.operators import events as E

T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _write(path, rows):
    """rows: [(ts, user_id, event_type, value)] -> one parquet file."""
    tbl = pa.table({
        "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
    })
    pq.write_table(tbl, path)


EVENT_SCHEMA = ("ts timestamp_ntz, user_id long, event_type string, "
                "value double")


@pytest.fixture()
def utc(spark):
    """Streaming watermarks force TIMESTAMP; pin the session tz so the
    NTZ wall clocks survive the round-trip deterministically."""
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    yield
    spark.conf.set("spark.sql.session.timeZone", old)


def _stream(spark, src_dir):
    return (spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1).parquet(src_dir))


def _run_to_memory(df, name):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    return q


def test_windowed_watermark_drops_late_rows(spark, tmp_path, utc):
    src = str(tmp_path / "src")
    os.makedirs(src)
    mins = lambda m: T0 + dt.timedelta(minutes=m)
    # file 0: two rows in the 10:00 window, one at 13:05 that advances
    # the watermark (1h) to 12:05 for the next batch
    _write(f"{src}/0.parquet", [(mins(5), 1, "click", 1.0),
                                (mins(20), 2, "click", 1.0),
                                (mins(185), 3, "click", 1.0)])
    time.sleep(1.1)  # distinct mtimes -> one file per micro-batch
    # file 1: on-time row; at this batch's end the 10:00 window
    # (end 11:00 < wm 12:05) finalizes and its state is evicted
    _write(f"{src}/1.parquet", [(mins(190), 4, "click", 1.0)])
    time.sleep(1.1)
    # file 2: a LATE row back in the 10:00 window — dropped (Spark
    # drops late rows once the window is finalized, i.e. from the
    # batch after the watermark passed its end) — plus an on-time row
    _write(f"{src}/2.parquet", [(mins(40), 5, "click", 1.0),
                                (mins(210), 6, "click", 1.0)])
    from pyspark.sql import functions as F
    out = (E.windowed_event_counts(_stream(spark, src), "1 hour",
                                   watermark="1 hour")
           .select(F.date_format("window_start",
                                 "yyyy-MM-dd HH:mm:ss").alias("ws"),
                   "event_type", "n"))
    _run_to_memory(out, "win_drop")
    rows = {(r["ws"], r["event_type"]): r["n"]
            for r in spark.sql("select * from win_drop").collect()}
    # the 10:00 window finalized with only the two on-time rows —
    # the 10:40 row arrived after the watermark passed and was dropped
    assert rows[("2024-01-01 10:00:00", "click")] == 2


def test_stateful_sessionizer_matches_batch_twin(spark, tmp_path, utc):
    src = str(tmp_path / "src")
    os.makedirs(src)
    mins = lambda m: T0 + dt.timedelta(minutes=m)
    # user 1: two sessions (gap 45 min > 30); user 2: one session.
    # batch 2 also delivers OUT-OF-ORDER events older than batch 1's
    # newest (legal: watermark is 1h) — they must land in their true
    # sessions, not merge into whatever was open (regression guard).
    batch1 = [(mins(0), 1, "click", 1.0), (mins(10), 1, "view", 2.5),
              (mins(2), 2, "click", 4.0)]
    batch2 = [(mins(55), 1, "click", 3.0), (mins(70), 1, "view", 1.25),
              (mins(15), 1, "view", 0.25),   # out-of-order: session 1
              (mins(20), 2, "view", 0.5),
              (mins(5), 2, "click", 0.75),   # out-of-order: session 1
              (mins(21), 2, "view", None),   # NULL value: F.sum skips
              (mins(4), 3, "view", None),    # all-NULL session → NULL
              (mins(6), 3, "view", None)]
    # sentinel file far in the future: advances the watermark so every
    # real session times out and is emitted
    sentinel = [(mins(60 * 24 * 10), 99, "click", 0.0)]
    _write(f"{src}/0.parquet", batch1)
    time.sleep(1.1)
    _write(f"{src}/1.parquet", batch2)
    time.sleep(1.1)
    _write(f"{src}/2.parquet", sentinel)

    out = E.sessionize_stateful(_stream(spark, src), gap_seconds=1800,
                                watermark="1 hour")
    _run_to_memory(out, "sessions_stateful")
    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"],
         r["n_events"], r["value_sum"])
        for r in spark.sql("select * from sessions_stateful").collect())

    real = batch1 + batch2
    bdf = spark.createDataFrame(
        [(ts, u, t, v) for ts, u, t, v in real], EVENT_SCHEMA)
    want = sorted(
        (r["user_id"], r["session_start"], r["session_end"],
         r["n_events"], r["value_sum"])
        for r in E.sessionize(bdf, gap="30 minutes").collect())
    assert got == want
    # sanity on the shape itself: user 1 split into two sessions
    assert [u for u, *_ in want].count(1) == 2


def test_sessionize_gap_boundary_is_inclusive(spark):
    """An event at exactly last + gap still MERGES into the session
    (measured Spark session_window behavior) — pinned because the SQL
    oracle mirrors it with a strict > in the lag condition and the
    stateful sessionizer with a strict > on the microsecond delta."""
    rows = [(T0, 1, "click", 1.0),
            (T0 + dt.timedelta(minutes=30), 1, "click", 1.0),
            (T0 + dt.timedelta(minutes=60, seconds=0, microseconds=1),
             1, "click", 1.0)]
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    out = E.sessionize(df, gap="30 minutes").collect()
    # rows 1+2 merge (exactly at gap); row 3 is 1 us past -> new session
    assert sorted(r["n_events"] for r in out) == [1, 2]


def test_stateful_sessionizer_hot_key_state_cap(spark, tmp_path, utc):
    """A bot key whose events keep arriving inside the watermark must
    not buffer unboundedly: with max_buffered_events exceeded, chained
    sessions force-flush (split sessions, bounded state) and no event
    is lost or double-counted."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    mins = lambda m: T0 + dt.timedelta(minutes=m)
    # 35 events 1 min apart (gap 30 min -> ONE true session), split
    # into 3 arrival batches; cap of 10 forces a flush in each of the
    # first two batches
    ev = [(mins(i), 7, "click", 1.0) for i in range(35)]
    _write(f"{src}/0.parquet", ev[:15])
    time.sleep(1.1)
    _write(f"{src}/1.parquet", ev[15:30])
    time.sleep(1.1)
    _write(f"{src}/2.parquet", ev[30:])
    time.sleep(1.1)
    _write(f"{src}/3.parquet",
           [(mins(60 * 24 * 10), 99, "click", 0.0)])  # sentinel

    out = E.sessionize_stateful(_stream(spark, src), gap_seconds=1800,
                                watermark="1 hour",
                                max_buffered_events=10)
    _run_to_memory(out, "sessions_hotkey")
    rows = [r for r in spark.sql(
        "select * from sessions_hotkey").collect() if r["user_id"] == 7]
    # forced flushes split the one true session; every event accounted
    assert len(rows) >= 2
    assert sum(r["n_events"] for r in rows) == 35
    assert sum(r["value_sum"] for r in rows) == 35.0
    # sessions are disjoint, ordered segments of the true session
    spans = sorted((r["session_start"], r["session_end"]) for r in rows)
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert s2 > s1


def test_event_funnel_semantics(spark):
    """Funnel kernel edges: every step-1 event is a candidate start
    (a later start can convert where the earliest start's window
    fails); tied timestamps never chain (strict >); counts are
    non-increasing; guards."""
    import datetime as dt

    from invertedindex_spark.operators.events import event_funnel

    t0 = dt.datetime(2024, 3, 1)

    def ev(uid, secs, typ):
        return (uid, t0 + dt.timedelta(seconds=secs), typ)

    rows = [
        # user 1: earliest view at 0 has no click within 100s, but
        # the view at 500 does — every-start semantics must convert
        ev(1, 0, "view"), ev(1, 500, "view"), ev(1, 550, "click"),
        ev(1, 560, "buy"),
        # user 2: full chain but click is AT the same instant as the
        # view — strict > breaks the chain
        ev(2, 0, "view"), ev(2, 0, "click"), ev(2, 10, "buy"),
        # user 3: chain in order but buy lands outside the window
        # from ITS start
        ev(3, 0, "view"), ev(3, 50, "click"), ev(3, 400, "buy"),
        # user 4: steps out of order
        ev(4, 0, "click"), ev(4, 10, "view"), ev(4, 20, "buy"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    got = [tuple(r) for r in
           event_funnel(df, ["view", "click", "buy"],
                        within_seconds=100).collect()]
    # step1: users 1,2,3,4 viewed; step2: user 1 (late start) and
    # user 3 (click at 50); user 2 blocked by the tie, user 4 has no
    # click after its view; step3: user 1 only (user 3's buy at 400
    # exceeds the window, user 4's buy follows no click-after-view)
    assert got == [(1, "view", 4), (2, "click", 2), (3, "buy", 1)]
    ns = [n for _i, _s, n in got]
    assert ns == sorted(ns, reverse=True)
    with pytest.raises(ValueError, match=">= 2 steps"):
        event_funnel(df, ["view"])
    with pytest.raises(ValueError, match="within_seconds"):
        event_funnel(df, ["view", "click"], within_seconds=-1)


def test_cohort_retention_semantics(spark):
    """Cohort assignment = first-event bucket; offset k counts
    distinct returners; buckets are epoch-anchored fixed-width;
    max_offset caps the table; one-event users appear at offset 0
    only."""
    import datetime as dt

    from invertedindex_spark.operators.events import cohort_retention

    day = dt.timedelta(days=1)
    d0 = dt.datetime(1970, 1, 1)          # epoch-anchored on purpose

    def ev(uid, d, h=0):
        return (uid, d0 + d * day + dt.timedelta(hours=h), "x")

    rows = [
        ev(1, 0), ev(1, 1), ev(1, 2),     # cohort day0, back d1 d2
        ev(2, 0, 23), ev(2, 2),           # cohort day0, back d2 only
        ev(3, 1), ev(3, 1, 5),            # cohort day1, never back
        ev(4, 0), ev(4, 9),               # d9 beyond max_offset=2
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    got = [tuple(r) for r in
           cohort_retention(df, "1 day", max_offset=2).collect()]
    us = 86400 * 1_000_000
    assert got == [(0, 0, 3), (0, 1, 1), (0, 2, 2),
                   (1 * us, 0, 1)]
    with pytest.raises(ValueError, match="max_offset"):
        cohort_retention(df, "1 day", max_offset=-1)
    with pytest.raises(Exception):
        cohort_retention(df, "not an interval")
