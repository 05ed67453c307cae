"""Volume-anomaly + freshness reports (driftspark/volume.py).

The load-bearing case is the DENSE grid: a partition that STOPS sending
rows produces no groupBy output at all, so a naive report can never flag
it — volume_report must materialize its zero-count buckets and score the
crater like any other value.
"""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from driftspark.volume import (
    VERDICT_ANOMALOUS,
    VERDICT_INSUFFICIENT,
    VERDICT_OK,
    freshness_report,
    volume_report,
)

T0 = datetime(2024, 3, 1, 0, 0, 0)


def _events(spark, rows):
    """rows: [(group, hour_offset, n_rows)] -> events frame with n_rows
    timestamps inside that hour."""
    data = []
    for grp, off, n in rows:
        for i in range(n):
            data.append((grp, T0 + timedelta(hours=off, minutes=i % 60)))
    return spark.createDataFrame(data, "grp string, ts timestamp")


def test_volume_dense_grid_scores_silent_group(spark):
    # "a" sends 5 rows/hour for 30h; "b" sends 5/hour then goes SILENT
    # after hour 19 — its zero buckets must exist and be anomalous
    rows = [("a", h, 5) for h in range(30)]
    rows += [("b", h, 5) for h in range(20)]
    out = volume_report(
        _events(spark, rows), "ts", "grp", trailing=12, min_history=6
    ).collect()
    assert len(out) == 2 * 30  # dense: both groups span the GLOBAL grid
    by = {(r["group"], r["bucket_ts"]): r for r in out}
    crater = by[("b", "2024-03-01 20:00:00")]
    assert crater["rows"] == 0
    # constant trailing history (all 5s): std == 0, count moved -> anomalous
    assert crater["trailing_std"] == 0.0 and crater["z"] is None
    assert crater["verdict"] == VERDICT_ANOMALOUS
    # the healthy group's same bucket is ok
    assert by[("a", "2024-03-01 20:00:00")]["verdict"] == VERDICT_OK


def test_volume_spike_z_score_and_history(spark):
    # noisy-ish history (alternating 4/6), then a 100-row spike
    rows = [("a", h, 4 if h % 2 else 6) for h in range(24)] + [("a", 24, 100)]
    out = volume_report(
        _events(spark, rows), "ts", "grp", trailing=24, min_history=6
    ).collect()
    by = {r["bucket_ts"]: r for r in out}
    spike = by["2024-03-02 00:00:00"]
    assert spike["verdict"] == VERDICT_ANOMALOUS and spike["z"] > 3
    assert spike["history"] == 24
    # the first min_history buckets are labeled, never silently scored
    for h in range(6):
        assert by[f"2024-03-01 {h:02d}:00:00"]["verdict"] == VERDICT_INSUFFICIENT
    # steady buckets after warmup are ok
    assert by["2024-03-01 12:00:00"]["verdict"] == VERDICT_OK


def test_volume_global_group_and_null_ts(spark):
    rows = [("a", h, 3) for h in range(8)]
    df = _events(spark, rows).unionByName(
        spark.createDataFrame([("a", None)], "grp string, ts timestamp")
    )
    out = volume_report(df, "ts", group_col=None, trailing=4, min_history=2)
    got = out.collect()
    assert {r["group"] for r in got} == {"__all__"}
    assert sum(r["rows"] for r in got) == 24  # NULL ts excluded


def test_volume_layout_invariance(spark):
    rows = [("a", h, (h * 7) % 5 + 1) for h in range(20)]
    rows += [("b", h, (h * 3) % 4 + 2) for h in range(15)]
    df = _events(spark, rows)
    base = sorted(map(tuple, volume_report(df, "ts", "grp").collect()))
    relaid = sorted(
        map(tuple, volume_report(df.repartition(13), "ts", "grp").collect())
    )
    assert relaid == base


def test_volume_param_validation(spark):
    df = _events(spark, [("a", 0, 1)])
    with pytest.raises(ValueError, match="bucket"):
        volume_report(df, "ts", "grp", bucket="fortnight")
    with pytest.raises(ValueError, match="trailing"):
        volume_report(df, "ts", "grp", trailing=1)
    with pytest.raises(ValueError, match="min_history"):
        volume_report(df, "ts", "grp", min_history=1)


def test_freshness_verdicts_and_missing(spark):
    rows = [("a", 23, 2), ("b", 10, 3)]  # b last sent 13h before a
    out = freshness_report(
        _events(spark, rows), "ts", "grp", max_lag_seconds=3600.0,
        expected_groups=["a", "b", "c"],
    ).collect()
    by = {r["group"]: r for r in out}
    assert set(by) == {"a", "b", "c"}
    assert by["a"]["verdict"] == "fresh" and by["a"]["lag_seconds"] == 0.0
    assert by["b"]["verdict"] == "stale"
    # b's last row: hour 10 + 2 minutes; anchor: hour 23 + 1 minute
    assert by["b"]["lag_seconds"] == pytest.approx(13 * 3600 - 60)
    assert by["c"]["verdict"] == "missing"
    assert by["c"]["rows"] == 0 and by["c"]["last_ts"] is None
    assert by["c"]["lag_seconds"] is None


def test_freshness_pinned_as_of_and_unexpected_group(spark):
    # groups in the data but not in expected_groups still appear (full join)
    rows = [("a", 0, 1), ("zz", 0, 1)]
    out = freshness_report(
        _events(spark, rows), "ts", "grp",
        max_lag_seconds=60.0, as_of="2024-03-01 02:00:00",
        expected_groups=["a"],
    ).collect()
    by = {r["group"]: r for r in out}
    assert set(by) == {"a", "zz"}
    assert by["a"]["lag_seconds"] == pytest.approx(2 * 3600)
    assert by["a"]["verdict"] == "stale"


def test_freshness_plan_is_broadcast(spark):
    # the anchor is a 1-row aggregate: its join must broadcast, never shuffle
    rows = [("a", h, 2) for h in range(5)]
    plan = freshness_report(
        _events(spark, rows), "ts", "grp"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
