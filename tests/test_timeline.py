"""Timeline analytics vs a pandas mirror of the reference loader
(examples/dashboard/data_loader.py) over the committed pipeline output."""

import json

import pandas as pd
import pytest

from driftspark.timeline import DriftResultsTimeline

RESULTS = "/root/repo/outputs/drift_sequence_results.json"


@pytest.fixture(scope="module")
def raw():
    with open(RESULTS) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def tl(spark):
    return DriftResultsTimeline(spark, RESULTS)


def _years(raw):
    data = raw.get("yearly_results", raw)
    return {y: d for y, d in data.items() if y.isdigit()}


def test_detector_timeline_matches_loader(tl, raw):
    got = tl.detector_timeline("ks_test").toPandas()
    exp = []
    for y, yd in sorted(_years(raw).items()):
        det = yd.get("detectors", {})
        if not det:
            for pd_ in yd.get("pipelines", {}).values():
                d = pd_.get("detection", {})
                if d.get("detector_name") == "ks_test":
                    det = {"ks_test": d}
                    break
        if "ks_test" in det:
            d = det["ks_test"]
            exp.append(
                (
                    int(y),
                    d.get("drift_detected", False),
                    d.get("severity", "none"),
                    d.get("score", 0.0),
                    d.get("p_value"),
                    d.get("threshold"),
                )
            )
    assert [tuple(r) for r in got.itertuples(index=False)] == exp
    assert len(exp) > 0


def test_all_detectors_timeline_matches_loader(tl, raw):
    got = tl.all_detectors_timeline().toPandas()
    exp = []
    for y, yd in _years(raw).items():
        det = yd.get("detectors", {})
        if det:
            items = det.items()
        else:
            items = [
                (p["detection"]["detector_name"], p["detection"])
                for p in yd.get("pipelines", {}).values()
                if p.get("detection", {}).get("detector_name")
            ]
        for name, d in items:
            exp.append(
                (
                    int(y),
                    name.replace("_", " ").title(),
                    d.get("drift_detected", False),
                    d.get("severity", "none"),
                    d.get("score", 0.0),
                )
            )
    exp.sort(key=lambda t: (t[0], t[1]))
    assert [tuple(r) for r in got.itertuples(index=False)] == exp


def test_feature_drift_timeline_matches_loader(tl, raw):
    got = (
        tl.feature_drift_timeline()
        .toPandas()
        .sort_values(["year", "feature"])
        .reset_index(drop=True)
    )
    exp = []
    for y, yd in _years(raw).items():
        loc = yd.get("localization")
        if not loc:
            for p in yd.get("pipelines", {}).values():
                if "localization" in p:
                    loc = p["localization"]
                    break
        if loc and loc.get("feature_drifts"):
            for fd in loc["feature_drifts"]:
                exp.append(
                    (
                        int(y),
                        fd["feature_name"],
                        fd["score"],
                        fd["drift_detected"],
                        fd.get("severity", "none"),
                    )
                )
    exp.sort(key=lambda t: (t[0], t[1]))
    assert [tuple(r) for r in got.itertuples(index=False)] == exp
    assert len(exp) > 0


def test_performance_metrics_matches_loader(tl, raw):
    got = tl.performance_metrics().toPandas()
    exp = []
    for y, yd in sorted(_years(raw).items()):
        meta = yd.get("metadata", {})
        acc = meta.get("test_accuracy") or yd.get("actual_accuracy", 0.0)
        delta = meta.get("accuracy_delta") or yd.get("accuracy_drop", 0.0)
        exp.append((int(y), acc, delta))
    assert [
        (r.year, pytest.approx(r.accuracy), pytest.approx(r.accuracy_delta))
        for r in got.itertuples(index=False)
    ] == exp


def test_summary_stats_matches_loader(tl, raw):
    s = tl.summary_stats()
    years = _years(raw)
    assert s["total_years"] == len(years)
    assert s["detectors_count"] == 4
    # count drift events across all detectors/years
    n_events = sum(
        1
        for yd in years.values()
        for p in yd.get("pipelines", {}).values()
        if p.get("detection", {}).get("drift_detected")
    )
    assert s["total_drift_events"] == n_events
    accs = [yd["actual_accuracy"] for yd in years.values()]
    assert s["avg_accuracy"] == pytest.approx(sum(accs) / len(accs))
    assert s["accuracy_range"] == (
        pytest.approx(min(accs)),
        pytest.approx(max(accs)),
    )


def test_rca_results_matches_loader(tl, raw):
    got = tl.rca_results().toPandas().sort_values("year").reset_index(drop=True)
    exp = []
    for y, yd in sorted(_years(raw).items()):
        for p in yd.get("pipelines", {}).values():
            rca = p.get("rca")
            if rca:
                exp.append(
                    (
                        int(y),
                        p.get("detection", {}).get("detector_name", "unknown"),
                        rca.get("analyzer_name", "unknown"),
                        len(rca.get("recommendations", [])),
                        rca.get("feature_importances", {}),
                    )
                )
    assert len(got) == len(exp) > 0
    for row, (y, det, an, nrec, imps) in zip(got.itertuples(index=False), exp):
        assert (row.year, row.detector, row.analyzer) == (y, det, an)
        assert row.n_recommendations == nrec
        assert dict(row.feature_importances) == pytest.approx(imps)


def test_feature_importance_changes_reference_defaults(tl, raw):
    """Our emitted distribution_changes carry moment shifts, not
    ref/test_importance keys — the reference loader maps those to 0.0
    defaults, and the parity frame must do the same."""
    got = tl.feature_importance_changes().toPandas()
    n_expected = sum(
        len(p["rca"].get("distribution_changes", {}))
        for yd in _years(raw).values()
        for p in yd.get("pipelines", {}).values()
        if p.get("rca")
    )
    assert len(got) == n_expected > 0
    assert (got["ref_importance"] == 0.0).all()
    assert (got["change"] == 0.0).all()


def test_distribution_shift_timeline_own_format(tl, raw):
    got = (
        tl.distribution_shift_timeline()
        .toPandas()
        .set_index(["year", "feature"])
    )
    checked = 0
    for y, yd in _years(raw).items():
        for p in yd.get("pipelines", {}).values():
            rca = p.get("rca")
            if rca:
                for feat, v in rca["distribution_changes"].items():
                    row = got.loc[(int(y), feat)]
                    assert row["mean_shift"] == pytest.approx(v["mean_shift"])
                    assert row["separability_importance"] == pytest.approx(
                        v["separability_importance"]
                    )
                    checked += 1
    assert checked == len(got) > 0


def test_timeline_demo_runs(spark, capsys):
    """examples/timeline_demo.py (the dashboard-data walkthrough) runs
    against the committed golden results and yields non-empty frames."""
    from examples.timeline_demo import main

    frames = main(RESULTS, spark=spark)
    assert not frames["all_detectors"].empty
    assert not frames["feature_drift"].empty
    assert frames["summary"]["total_years"] == 3
    assert not frames["recommendations"].empty
    out = capsys.readouterr().out
    assert "== summary ==" in out and "top drifted features" in out


def test_chart_data_frames_match_visualization_transforms(tl):
    """The dashboard chart builders' data reshapes
    (examples/dashboard/visualizations.py) vs pandas mirrors of each
    transform over the committed results."""
    feat = tl.feature_drift_timeline().toPandas()

    # create_feature_heatmap pivot (feature x year mean drift_score) —
    # column set must be exactly the years present in the frame (pandas
    # pivot_table semantics: no phantom all-null columns for other years)
    got = tl.feature_drift_pivot().toPandas().set_index("feature")
    exp = feat.pivot_table(
        index="feature", columns="year", values="drift_score", aggfunc="mean"
    )
    assert list(got.index) == sorted(exp.index)
    assert sorted(got.columns) == sorted(str(y) for y in exp.columns)
    for y in exp.columns:
        for f in exp.index:
            assert got.loc[f, str(y)] == pytest.approx(exp.loc[f, y])

    # create_severity_distribution value_counts
    got = tl.severity_distribution().toPandas()
    exp_counts = (
        tl.all_detectors_timeline().toPandas()["severity"].value_counts()
    )
    assert dict(zip(got["severity"], got["count"])) == exp_counts.to_dict()
    assert list(got["count"]) == sorted(got["count"], reverse=True)

    # create_top_drifted_features top-N mean over drifted rows
    got = tl.top_drifted_features(top_n=3).toPandas()
    exp_top = (
        feat[feat["drift_detected"]]
        .groupby("feature")["drift_score"]
        .mean()
        .sort_values(ascending=False)
        .head(3)
    )
    assert list(got["feature"]) == list(exp_top.index)
    assert list(got["drift_score"]) == pytest.approx(list(exp_top.values))

    # create_importance_change_timeline top-feature filter
    changes = tl.feature_importance_changes().toPandas()
    got = tl.importance_change_series(top_features=2).toPandas()
    exp_feats = set(
        changes.groupby("feature")["abs_change"].mean().nlargest(2).index
    )
    assert set(got["feature"]) == exp_feats
    assert len(got) == len(changes[changes["feature"].isin(exp_feats)])

    # create_feature_importance_heatmap pivot — our emitted changes are
    # all 0.0 under the reference's key mapping, so assert shape + zeros
    got = tl.importance_change_pivot().toPandas()
    assert (got.drop(columns="feature").fillna(0.0) == 0.0).all().all()

    # create_rca_recommendations_table expansion (top 3 per rca row,
    # ORIGINAL list order within a run — the reference enumerates the
    # list, it does not alphabetize)
    got = tl.rca_recommendations_table().toPandas()
    exp_rows = []
    for _, r in (
        tl.rca_results().toPandas().sort_values(["year", "detector"]).iterrows()
    ):
        recs = r["recommendations"]
        for rec in (list(recs) if recs is not None else [])[:3]:
            exp_rows.append(
                (r["year"], r["detector"].replace("_", " ").title(), rec)
            )
    assert [tuple(t) for t in got.itertuples(index=False)] == exp_rows
    assert len(exp_rows) > 0


def test_reference_selection_quirks(spark, tmp_path):
    """The loader's exact selection rules on adversarial shapes:

    - feature_drift: pipeline loop breaks on localization KEY PRESENCE
      (data_loader.py:160-165) — a first pipeline with an explicit null
      localization wins the break and the year emits nothing; a falsy
      DIRECT localization ({}) falls through to the pipelines.
    - detector_timeline: first matching pipeline only (break,
      data_loader.py:60-65); falsy detectors-dict entries skipped
      (``if detector_result:``).  all_detectors_timeline has neither rule.
    - available_detectors: detectors-dict keys UNION pipeline names per
      year (data_loader.py:266-280) — not either/or."""
    loc = {
        "feature_drifts": [
            {
                "feature_name": "px",
                "drift_detected": True,
                "score": 0.9,
                "p_value": 0.01,
                "severity": "high",
            }
        ]
    }
    det = lambda name, score: {  # noqa: E731
        "detector_name": name,
        "drift_detected": False,
        "severity": "none",
        "score": score,
    }
    doc = {
        # null-localization first pipeline wins the break -> year silent
        "2020": {
            "pipelines": {
                "A": {"detection": det("ks_test", 0.1), "localization": None},
                "B": {"detection": det("ks_test", 0.2), "localization": loc},
            }
        },
        # falsy DIRECT localization falls through to the pipeline's
        "2021": {
            "localization": {},
            "pipelines": {"C": {"detection": det("psi", 0.3), "localization": loc}},
        },
        # falsy detectors-dict entry + union-visibility pipeline detector
        "2022": {
            "detectors": {"ks_test": {}, "chi2": {"score": 0.4}},
            "pipelines": {"D": {"detection": det("mmd", 0.5)}},
        },
    }
    (tmp_path / "r.json").write_text(json.dumps(doc))
    tl = DriftResultsTimeline(spark, str(tmp_path))

    feat = tl.feature_drift_timeline().toPandas()
    assert list(feat["year"]) == [2021] and list(feat["feature"]) == ["px"]

    ks = tl.detector_timeline("ks_test").toPandas()
    # 2020: first matching pipeline only (score 0.1); 2022: {} entry skipped
    assert [(r.year, r.score) for r in ks.itertuples(index=False)] == [
        (2020, 0.1)
    ]
    chi2 = tl.detector_timeline("chi2").toPandas()
    assert [(r.year, r.score) for r in chi2.itertuples(index=False)] == [
        (2022, 0.4)
    ]
    # 2022 routed to the detectors branch: the mmd pipeline is invisible
    # to the timeline frames...
    assert tl.detector_timeline("mmd").toPandas().empty
    # ...all_detectors keeps every 2020 pipeline row AND the falsy entry
    # (sorted by score too — the frame's (year, detector) sort leaves the
    # two 2020 Ks Test rows in a plan-dependent tie order)
    alltl = (
        tl.all_detectors_timeline()
        .toPandas()
        .sort_values(["year", "detector", "score"])
    )
    assert [
        (r.year, r.detector, r.score) for r in alltl.itertuples(index=False)
    ] == [
        (2020, "Ks Test", 0.1),
        (2020, "Ks Test", 0.2),
        (2021, "Psi", 0.3),
        (2022, "Chi2", 0.4),
        (2022, "Ks Test", 0.0),
    ]
    # ...but available_detectors unions both sources within 2022
    assert tl.available_detectors() == ["chi2", "ks_test", "mmd", "psi"]


def test_detectors_dict_format_and_yearly_results_wrapper(spark, tmp_path):
    """The alternate JSON shapes the reference loader accepts: a
    ``yearly_results`` wrapper, a ``detectors`` dict (no pipelines), and
    non-year keys to skip — plus multi-file distributed reads."""
    doc1 = {
        "yearly_results": {
            "2018": {
                "detectors": {
                    "psi": {
                        "drift_detected": True,
                        "severity": "high",
                        "score": 0.31,
                    }
                },
                "metadata": {"test_accuracy": 0.9, "accuracy_delta": -0.02},
            },
            "config": {"ignored": True},
        }
    }
    doc2 = {
        "2019": {
            "pipelines": {
                "PSI": {
                    "detection": {
                        "detector_name": "psi",
                        "drift_detected": False,
                        "severity": "none",
                        "score": 0.05,
                        "p_value": None,
                    }
                }
            },
            "actual_accuracy": 0.88,
        },
        "not_a_year": {"foo": 1},
    }
    (tmp_path / "r1.json").write_text(json.dumps(doc1))
    (tmp_path / "r2.json").write_text(json.dumps(doc2))
    tl = DriftResultsTimeline(spark, str(tmp_path))
    assert tl.available_years() == [2018, 2019]
    assert tl.available_detectors() == ["psi"]
    got = tl.detector_timeline("psi").toPandas()
    assert [tuple(r)[:4] for r in got.itertuples(index=False)] == [
        (2018, True, "high", 0.31),
        (2019, False, "none", 0.05),
    ]
    assert got["p_value"].isna().all() and got["threshold"].isna().all()
    perf = tl.performance_metrics().toPandas()
    assert [
        (r.year, pytest.approx(r.accuracy), pytest.approx(r.accuracy_delta))
        for r in perf.itertuples(index=False)
    ] == [(2018, 0.9, -0.02), (2019, 0.88, 0.0)]
    all_df = tl.all_detectors_timeline().toPandas()
    assert list(all_df["detector"]) == ["Psi", "Psi"]
