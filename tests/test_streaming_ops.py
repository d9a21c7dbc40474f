"""Streaming rollup (watermark semantics) + stateful streaming dedup
(SURVEY.md §2.10 widening: windowed aggs for late data,
applyInPandasWithState custom stateful operator)."""

import datetime as dt
import hashlib


def _ev(i, hour, minute, value):
    return (
        i,
        dt.datetime(2026, 1, 1, hour, minute, 0),
        i % 7,
        "t",
        float(value),
        "{}",
    )


EV_DDL = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def _run(df_stream_fn, out, ck):
    q = (
        df_stream_fn()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_windowed_rollup_watermark(spark, tmp_path):
    from pyramidscheme_jl_spark.streaming.aggregate import stream_windowed_rollup

    src = tmp_path / "ev_src"
    src.mkdir()
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")
    # batch 0: on-time rows for hours 0-4 (hour h has h+1 rows of value h)
    rows0 = []
    i = 0
    for h in range(5):
        for k in range(h + 1):
            rows0.append(_ev(i, h, 5 + k, h))
            i += 1
    spark.createDataFrame(rows0, EV_DDL).coalesce(1).write.parquet(str(src / "b0"))

    def mk():
        return stream_windowed_rollup(
            spark.readStream.schema(EV_DDL).parquet(f"{src}/*"), "1 hour", "2 hours"
        )

    _run(mk, out, ck)
    got = {
        r["window_start"].hour: (r["n"], r["sum_cents"])
        for r in spark.read.parquet(out).collect()
    }
    # final watermark = max ts (04:09) - 2h = 02:09 => only windows ending
    # <= 02:09 are finalized: hours 0 and 1 (window end 01:00, 02:00)
    assert got == {0: (1, 0), 1: (2, 200)}

    # batch 1: a late row for hour 1 (below the 02:09 watermark) is dropped
    # (its window already emitted); a row at 05:09 advances the watermark to
    # 03:09, finalizing exactly the hour-2 window (end 03:00 <= 03:09)
    rows1 = [_ev(100, 1, 30, 9), _ev(101, 5, 9, 5)]
    spark.createDataFrame(rows1, EV_DDL).coalesce(1).write.parquet(str(src / "b1"))
    _run(mk, out, ck)
    got2 = {
        r["window_start"].hour: (r["n"], r["sum_cents"])
        for r in spark.read.parquet(out).collect()
    }
    # cumulative sink: hours 0,1 from run 1 + hour 2 from run 2; the late
    # hour-1 row did NOT mutate the already-emitted hour-1 window, and hour
    # 3 (window end 04:00 > watermark 03:09) stays open in state
    assert got2 == {0: (1, 0), 1: (2, 200), 2: (3, 600)}


def test_stream_dedup_stateful(spark, tmp_path):
    from pyramidscheme_jl_spark.streaming.aggregate import stream_dedup_stateful

    src = tmp_path / "doc_src"
    src.mkdir()
    ck, out = str(tmp_path / "dck"), str(tmp_path / "dout")
    h = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731

    b0 = [(5, "alpha"), (9, "alpha"), (7, "beta")]
    spark.createDataFrame(b0, "doc_id long, text string").coalesce(1).write.parquet(
        str(src / "b0")
    )

    def mk():
        return stream_dedup_stateful(
            spark.readStream.schema("doc_id long, text string").parquet(f"{src}/*")
        )

    _run(mk, out, ck)
    got = {r["text_hash"]: r["keep_id"] for r in spark.read.parquet(out).collect()}
    assert got == {h("alpha"): 5, h("beta"): 7}

    # batch 1: 'alpha' repeats (cross-batch dup -> suppressed by state),
    # 'gamma' is new -> exactly one new output row
    b1 = [(1, "alpha"), (3, "gamma")]
    spark.createDataFrame(b1, "doc_id long, text string").coalesce(1).write.parquet(
        str(src / "b1")
    )
    _run(mk, out, ck)
    got2 = {r["text_hash"]: r["keep_id"] for r in spark.read.parquet(out).collect()}
    assert got2 == {h("alpha"): 5, h("beta"): 7, h("gamma"): 3}
