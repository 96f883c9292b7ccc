"""Stateful sessionization (applyInPandasWithState) vs a Python oracle."""

from pyspark.sql import functions as F

from cli_p_spark.streaming.sessions import sessionize


def _oracle_sessions(rows, gap_s):
    """rows: (user_id, ts_epoch_s, value) -> closed sessions per user."""
    by_user = {}
    for u, t, v in rows:
        by_user.setdefault(u, []).append((t, v))
    out = []
    for u, evs in by_user.items():
        evs.sort()
        start = last = None
        n, vsum = 0, 0.0
        for t, v in evs:
            if n > 0 and t - last > gap_s:
                out.append((u, start, last, n, vsum))
                n, vsum = 0, 0.0
            if n == 0:
                start = t
            last = t
            n += 1
            vsum += v
        if n > 0:
            out.append((u, start, last, n, vsum))
    return sorted(out)


def test_sessionize_matches_oracle(spark, tmp_path):
    base = 1_700_000_000
    rows = []
    # user 1: two sessions split by a 3600s gap; user 2: one session
    for dt in (0, 60, 120, 4000, 4030):
        rows.append((1, base + dt, 1.0))
    for dt in (10, 20, 1790):
        rows.append((2, base + dt, 2.0))
    # a final far-future event per user advances the watermark so the
    # event-time timeout closes every earlier session
    rows.append((1, base + 100_000, 0.5))
    rows.append((2, base + 100_000, 0.5))

    in_dir = str(tmp_path / "sess_in")
    spark.createDataFrame(
        rows, "user_id long, epoch long, value double"
    ).withColumn("ts", F.col("epoch").cast("timestamp")).drop(
        "epoch"
    ).coalesce(1).write.parquet(in_dir)

    stream = spark.readStream.schema(
        "user_id long, value double, ts timestamp"
    ).parquet(in_dir)
    q = (
        sessionize(stream, gap_seconds=1800, watermark="10 seconds")
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (
            r["user_id"],
            int(r["session_start"].timestamp()),
            int(r["session_end"].timestamp()),
            r["n_events"],
            r["value_sum"],
        )
        for r in spark.sql("select * from sessions_out").collect()
    )
    oracle = _oracle_sessions(rows, 1800)
    # the streaming query closes sessions whose (last + gap) precedes the
    # final watermark; the trailing future events' own sessions stay open
    expected = [
        s for s in oracle
        if s[2] + 1800 < base + 100_000 - 10  # watermark = max ts - 10s
    ]
    assert got == sorted(expected), (got, expected)


def test_late_event_does_not_bridge_a_gap(spark, tmp_path):
    """A late event older than the open session must NOT merge across a
    silence wider than the gap (the round-2 buffered-state fix): an open
    session at 12:00 plus a late 11:15 arrival (gap 30 min) is TWO
    sessions, exactly as the batch sessionizer splits them."""
    base = 1_700_000_000
    in_dir = str(tmp_path / "late_in")
    schema = "user_id long, value double, ts timestamp"

    def drop(rows, name):
        spark.createDataFrame(
            rows, "user_id long, epoch long, value double"
        ).withColumn("ts", F.col("epoch").cast("timestamp")).drop(
            "epoch"
        ).select("user_id", "value", "ts").coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

    drop([(1, base + 2700, 1.0)], "b1")              # 12:00-ish event
    drop([(1, base, 1.0),                            # late 11:15 event
          (1, base + 100_000, 0.5)], "b2")           # watermark advancer

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)              # one drop per batch
        .parquet(in_dir)
    )
    q = (
        sessionize(stream, gap_seconds=1800, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("late_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["user_id"], int(r["session_start"].timestamp()),
         int(r["session_end"].timestamp()), r["n_events"])
        for r in spark.sql("select * from late_sessions").collect()
    )
    assert (1, base, base, 1) in got, got            # the late lone event
    assert (1, base + 2700, base + 2700, 1) in got, got
    # and nothing merged them
    assert all(not (s <= base and e >= base + 2700) for _, s, e, _ in got)
