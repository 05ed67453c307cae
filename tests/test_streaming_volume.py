"""Streaming volume monitor + silent-feed detector (streaming.py).

Fit-on-batch / score-on-stream mirrors StreamingDriftMonitor; the fitted
baseline comes from the SAME dense-count frame the batch volume_report
scores (volume._dense_counts), so the zero-bucket guard is shared by
construction.  feed_silence_stream is the only timeout-based stateful
operator in the repo — the tests pin the episode semantics (one silent
emission per episode, recovery row, final no-data-batch firing).
"""

import os
import shutil
import tempfile
import uuid
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from driftspark.streaming import feed_silence_stream, volume_anomaly_stream
from driftspark.volume import fit_volume_stats

T0 = datetime(2024, 3, 1)


def _mk(spark, rows):
    data = [
        (g, T0 + timedelta(hours=h, minutes=i % 60))
        for g, h, n in rows
        for i in range(n)
    ]
    return spark.createDataFrame(data, "grp string, ts timestamp")


def _run_batches(spark, batches, build, mode):
    """Write ts-ordered micro-batch files, run the stream availableNow,
    return the collected sink rows."""
    work = tempfile.mkdtemp(prefix="volstream_test_")
    try:
        for i, df in enumerate(batches):
            df.coalesce(1).write.parquet(f"{work}/in/b{i}")
            os.utime(f"{work}/in/b{i}", (1_700_000_000 + i, 1_700_000_000 + i))
            for f in os.listdir(f"{work}/in/b{i}"):
                os.utime(
                    f"{work}/in/b{i}/{f}",
                    (1_700_000_000 + i, 1_700_000_000 + i),
                )
        stream = (
            spark.readStream.schema("grp string, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{work}/in/b*")
        )
        name = f"t_{uuid.uuid4().hex[:10]}"
        q = (
            build(stream).writeStream.format("memory").queryName(name)
            .outputMode(mode).trigger(availableNow=True).start()
        )
        assert q.awaitTermination(180), "stream timed out"
        return spark.table(name).collect()
    finally:
        shutil.rmtree(work, ignore_errors=True)


@pytest.fixture(scope="module")
def fitted(spark):
    # steady 5/hour for 48h, both groups; std == 0 (constant history)
    fit_df = _mk(
        spark, [("a", h, 5) for h in range(48)] + [("b", h, 5) for h in range(48)]
    )
    return fit_volume_stats(fit_df, "ts", "grp")


def test_fit_volume_stats_dense(spark):
    # a group that stops early still averages over the GLOBAL grid:
    # b sends 4/hour for 10 of 20 hours -> mean 2.0, not 4.0
    df = _mk(spark, [("a", h, 2) for h in range(20)] + [("b", h, 4) for h in range(10)])
    stats = fit_volume_stats(df, "ts", "grp")
    assert stats["a"][0] == pytest.approx(2.0) and stats["a"][2] == 20
    assert stats["b"][0] == pytest.approx(2.0) and stats["b"][2] == 20


def test_volume_stream_verdicts_and_closure(spark, fitted):
    # stream hours 48..77: a steady with a 40-row spike at hour 60,
    # unknown group c appears once
    batches = [
        _mk(spark, [("a", h, 5) for h in range(48, 58)] + [("c", 50, 3)]),
        _mk(spark, [("a", h, 5 if h != 60 else 40) for h in range(58, 68)]),
        _mk(spark, [("a", h, 5) for h in range(68, 78)]),
    ]
    rows = _run_batches(
        spark,
        batches,
        lambda s: volume_anomaly_stream(
            s, "ts", fitted, "grp", bucket="hour", watermark="2 hours",
            z_threshold=3.0, min_history=6,
        ),
        "append",
    )
    by = {(r["group"], r["window_start"]): r for r in rows}
    spike = by[("a", "2024-03-03 12:00:00")]
    assert spike["verdict"] == "anomalous" and spike["rows"] == 40
    assert by[("c", "2024-03-03 02:00:00")]["verdict"] == "unknown_group"
    assert by[("a", "2024-03-03 00:00:00")]["verdict"] == "ok"
    # append-mode closure: last ts = hour 77 min 4, watermark 2h ->
    # windows ending after 75:04 are withheld
    starts = sorted(r["window_start"] for r in rows if r["group"] == "a")
    assert starts[-1] == "2024-03-04 02:00:00"  # hour 74, end 75:00
    assert len(starts) == 27  # hours 48..74, each emitted exactly once


def test_volume_stream_matches_batch_counts(spark, fitted):
    # emitted window counts == plain batch groupBy on the same rows
    batches = [
        _mk(spark, [("a", h, (h * 3) % 6 + 1) for h in range(48, 60)]),
        _mk(spark, [("a", h, (h * 5) % 4 + 2) for h in range(60, 72)]),
    ]
    rows = _run_batches(
        spark,
        batches,
        lambda s: volume_anomaly_stream(
            s, "ts", fitted, "grp", watermark="2 hours"
        ),
        "append",
    )
    got = {r["window_start"]: r["rows"] for r in rows}
    expect = {
        r["ws"]: r["c"]
        for r in batches[0].unionByName(batches[1])
        .groupBy(F.date_format(F.date_trunc("hour", "ts"),
                               "yyyy-MM-dd HH:mm:ss").alias("ws"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    for ws, c in got.items():
        assert expect[ws] == c
    # every emitted count is correct AND all closed windows emitted
    last_emitted_end = "2024-03-03 22:00:00"  # hour 71 min 3 - 2h -> 69:03
    assert max(got) == "2024-03-03 20:00:00" and len(got) == 21


def test_volume_stream_param_validation(spark, fitted):
    df = _mk(spark, [("a", 0, 1)])
    with pytest.raises(ValueError, match="fitted_stats"):
        volume_anomaly_stream(df, "ts", {}, "grp")
    with pytest.raises(ValueError, match="bucket"):
        volume_anomaly_stream(df, "ts", fitted, "grp", bucket="eon")
    with pytest.raises(ValueError, match="min_history"):
        volume_anomaly_stream(df, "ts", fitted, "grp", min_history=1)


def test_silence_episode_and_recovery(spark):
    # b goes silent after batch 0, recovers in batch 3
    batches = [
        _mk(spark, [("a", h, 5) for h in range(0, 10)]
            + [("b", h, 5) for h in range(0, 10)]),
        _mk(spark, [("a", h, 5) for h in range(10, 20)]),
        _mk(spark, [("a", h, 5) for h in range(20, 30)]),
        _mk(spark, [("a", h, 5) for h in range(30, 35)] + [("b", 32, 4)]),
    ]
    rows = _run_batches(
        spark,
        batches,
        lambda s: feed_silence_stream(
            s, "ts", "grp", silence_seconds=3 * 3600, watermark="10 minutes"
        ),
        "update",
    )
    b_rows = sorted(
        ((r["last_ts"], r["status"]) for r in rows if r["group"] == "b")
    )
    # exactly ONE silent emission for the episode, then the recovery row
    assert [s for _, s in b_rows].count("silent") == 1
    assert b_rows[-1][1] == "active"
    recov = [r for r in rows if r["group"] == "b" and r["rows_total"] == 54]
    assert len(recov) == 1 and recov[0]["status"] == "active"
    assert all(r["status"] == "active" for r in rows if r["group"] == "a")


def test_silence_fires_on_final_no_data_batch(spark):
    # b's deadline is crossed ONLY by the final batch's watermark — the
    # trailing no-data micro-batch must fire the timeout
    batches = [
        _mk(spark, [("a", h, 5) for h in range(0, 10)]
            + [("b", h, 5) for h in range(0, 10)]),
        _mk(spark, [("a", h, 5) for h in range(10, 29)]),
        _mk(spark, [("a", 29, 5), ("b", 28, 5)]),
    ]
    rows = _run_batches(
        spark,
        batches,
        lambda s: feed_silence_stream(
            s, "ts", "grp", silence_seconds=1800, watermark="10 minutes"
        ),
        "update",
    )
    b_final = [r for r in rows if r["group"] == "b" and r["status"] == "silent"]
    assert len(b_final) == 1
    assert b_final[0]["rows_total"] == 55
    with pytest.raises(ValueError, match="silence_seconds"):
        feed_silence_stream(_mk(spark, [("a", 0, 1)]), "ts", "grp",
                            silence_seconds=0)
