"""Randomized timeline parity: many generated results-JSON documents vs a
compact pandas mirror of the reference loader's exact loops
(examples/dashboard/data_loader.py).  One distributed read over the whole
directory; the mirror runs per-file and concatenates — any divergence in
the selection quirks (either/or routing, truthiness skips, first-match
breaks, key-presence breaks, or-fallbacks) surfaces as a multiset diff."""

import json
import random

import pandas as pd

from driftspark.timeline import DriftResultsTimeline

# digit-bearing names exercise the str.title() vs initcap divergence:
# 'ks_2samp'.replace('_',' ').title() == 'Ks 2Samp' but initcap('ks 2samp')
# == 'Ks 2samp' (title capitalizes after ANY non-letter, not just spaces)
DETECTORS = ["ks_test", "psi", "mmd", "cbpe", "ks_2samp", "l2_norm3d"]
FEATURES = ["age", "income", "hours"]


def _maybe(rng, p):
    return rng.random() < p


def _detection(rng, name):
    d = {"detector_name": name}
    if _maybe(rng, 0.8):
        d["drift_detected"] = rng.random() < 0.5
    if _maybe(rng, 0.8):
        d["severity"] = rng.choice(["none", "low", "high"])
    if _maybe(rng, 0.8):
        d["score"] = round(rng.random(), 3)
    if _maybe(rng, 0.5):
        d["p_value"] = round(rng.random(), 3)
    return d


def _localization(rng):
    r = rng.random()
    if r < 0.25:
        return None
    if r < 0.4:
        return {}
    if r < 0.55:
        return {"feature_drifts": []}
    return {
        "feature_drifts": [
            {
                "feature_name": f,
                "drift_detected": rng.random() < 0.5,
                "score": round(rng.random(), 3),
                "p_value": round(rng.random(), 3),
                **({"severity": rng.choice(["low", "high"])} if _maybe(rng, 0.7) else {}),
            }
            for f in rng.sample(FEATURES, rng.randint(1, len(FEATURES)))
        ]
    }


def _rca(rng):
    r = rng.random()
    if r < 0.25:
        return None
    if r < 0.4:
        return {}
    rca = {}
    if _maybe(rng, 0.7):
        rca["analyzer_name"] = rng.choice(["shap", "perm"])
    if _maybe(rng, 0.7):
        rca["feature_importances"] = {
            f: round(rng.random(), 3)
            for f in rng.sample(FEATURES, rng.randint(0, 2))
        }
    if _maybe(rng, 0.7):
        rca["recommendations"] = ["check " + f for f in rng.sample(FEATURES, rng.randint(0, 2))]
    if _maybe(rng, 0.7):
        rca["distribution_changes"] = {
            f: rng.choice(
                [
                    0.5,  # non-dict value: reference's isinstance skips it
                    # a STRING whose content looks like a JSON object must
                    # also be skipped (variant type test, not text sniffing)
                    '{"ref_importance": 9.0}',
                    {"ref_importance": round(rng.random(), 3)},
                    {
                        "ref_importance": round(rng.random(), 3),
                        "test_importance": round(rng.random(), 3),
                        "change": round(rng.random(), 3),
                    },
                    {"other_key": 1.0},
                ]
            )
            for f in rng.sample(FEATURES, rng.randint(0, 3))
        }
    return rca


def _year_data(rng):
    yd = {}
    if _maybe(rng, 0.5):  # detectors-dict format (sometimes empty)
        yd["detectors"] = {
            n: ({} if _maybe(rng, 0.2) else _detection(rng, n))
            for n in rng.sample(DETECTORS, rng.randint(0, 3))
        }
    if _maybe(rng, 0.8):  # pipelines format (may coexist)
        pipelines = {}
        for i in range(rng.randint(0, 3)):
            p = {}
            if _maybe(rng, 0.9):
                p["detection"] = _detection(rng, rng.choice(DETECTORS))
            if _maybe(rng, 0.6):
                p["localization"] = _localization(rng)
            if _maybe(rng, 0.6):
                p["rca"] = _rca(rng)
            pipelines[f"P{i}"] = p
        yd["pipelines"] = pipelines
    if _maybe(rng, 0.4):
        yd["localization"] = _localization(rng)
    if _maybe(rng, 0.6):
        # 0.0 must fall through the reference's Python-`or` to year level
        yd["metadata"] = {
            "test_accuracy": rng.choice([0.0, round(rng.random(), 3)]),
            "accuracy_delta": rng.choice([0.0, -0.01]),
        }
    if _maybe(rng, 0.7):
        yd["actual_accuracy"] = round(rng.random(), 3)
        yd["accuracy_drop"] = round(rng.random() / 10, 3)
    return yd


def _document(rng):
    years = {str(y): _year_data(rng) for y in rng.sample(range(2010, 2020), rng.randint(1, 4))}
    if _maybe(rng, 0.3):
        years["run_config"] = {"note": "skip me"}
    return {"yearly_results": years} if _maybe(rng, 0.5) else years


# -- compact mirror of the reference loader's loops -----------------------

def _years(doc):
    data = doc.get("yearly_results", doc)
    return [(y, d) for y, d in data.items() if y.isdigit()]


def _mirror_detector_timeline(doc, name):
    rows = []
    for y, yd in _years(doc):
        det = dict(yd.get("detectors", {}))
        if not det:
            for p in yd.get("pipelines", {}).values():
                d = p.get("detection", {})
                if d.get("detector_name") == name:
                    det[name] = d
                    break
        r = det.get(name)
        if r:
            rows.append((int(y), r.get("drift_detected", False),
                         r.get("severity", "none"), r.get("score", 0.0),
                         r.get("p_value")))
    return rows


def _mirror_all_detectors(doc):
    rows = []
    for y, yd in _years(doc):
        det = yd.get("detectors", {})
        items = (
            det.items()
            if det
            else [
                (p["detection"]["detector_name"], p["detection"])
                for p in yd.get("pipelines", {}).values()
                if p.get("detection", {}).get("detector_name")
            ]
        )
        for n, r in items:
            rows.append((int(y), n.replace("_", " ").title(),
                         r.get("drift_detected", False),
                         r.get("severity", "none"), r.get("score", 0.0)))
    return rows


def _mirror_feature_drift(doc):
    rows = []
    for y, yd in _years(doc):
        loc = yd.get("localization")
        if not loc:
            for p in yd.get("pipelines", {}).values():
                if "localization" in p:
                    loc = p["localization"]
                    break
        if loc and loc.get("feature_drifts"):
            for fd in loc["feature_drifts"]:
                rows.append((int(y), fd["feature_name"], fd["score"],
                             fd["drift_detected"], fd.get("severity", "none")))
    return rows


def _mirror_perf(doc):
    rows = []
    for y, yd in _years(doc):
        meta = yd.get("metadata", {})
        rows.append((int(y),
                     meta.get("test_accuracy") or yd.get("actual_accuracy", 0.0),
                     meta.get("accuracy_delta") or yd.get("accuracy_drop", 0.0)))
    return rows


def _mirror_rca(doc):
    rows = []
    for y, yd in _years(doc):
        for p in yd.get("pipelines", {}).values():
            rca = p.get("rca")
            if rca:
                rows.append(
                    (
                        int(y),
                        p.get("detection", {}).get("detector_name", "unknown"),
                        rca.get("analyzer_name", "unknown"),
                        tuple(sorted(rca.get("feature_importances", {}).items())),
                        tuple(rca.get("recommendations", [])),
                        len(rca.get("recommendations", [])),
                    )
                )
    return rows


def _mirror_rca_recommendations(doc, per_run=3):
    rows = []
    for y, yd in _years(doc):
        for p in yd.get("pipelines", {}).values():
            rca = p.get("rca")
            if rca and rca.get("recommendations"):
                det = p.get("detection", {}).get("detector_name", "unknown")
                for rec in rca["recommendations"][:per_run]:
                    rows.append((int(y), det.replace("_", " ").title(), rec))
    return rows


def _mirror_importance_changes(doc):
    rows = []
    for y, yd in _years(doc):
        for p in yd.get("pipelines", {}).values():
            rca = p.get("rca")
            if rca and rca.get("distribution_changes"):
                for f, v in rca["distribution_changes"].items():
                    if isinstance(v, dict):
                        ref = v.get("ref_importance", 0.0)
                        test = v.get("test_importance", 0.0)
                        change = v.get("change", test - ref)
                        rows.append((int(y), f, ref, test, change, abs(change)))
    return rows


def _mirror_available_detectors(doc):
    names = set()
    for _, yd in _years(doc):
        names.update(yd.get("detectors", {}).keys())
        for p in yd.get("pipelines", {}).values():
            n = p.get("detection", {}).get("detector_name")
            if n:
                names.add(n)
    return names


import pytest as _pytest


@_pytest.mark.parametrize("seed", [20260817, 911])
def test_random_documents_match_reference_mirror(spark, tmp_path, seed):
    rng = random.Random(seed)
    docs = [_document(rng) for _ in range(40)]
    for i, doc in enumerate(docs):
        (tmp_path / f"r{i:02d}.json").write_text(json.dumps(doc))
    tl = DriftResultsTimeline(spark, str(tmp_path))
    assert_timeline_matches_mirror(tl, docs, DETECTORS)


GOLDEN = "/root/reference/outputs/folktables_drift_results.json"


def test_reference_golden_file_matches_mirror(spark):
    """The de-facto golden record: the reference pipeline's committed
    3,016-line output (SURVEY §5.1).  Every timeline frame over it must
    equal the pandas mirror of the reference loader — real detector
    names, real RCA payloads, real float formats, not synthetic fixtures."""
    with open(GOLDEN) as f:
        doc = json.load(f)
    tl = DriftResultsTimeline(spark, GOLDEN)
    names = sorted(_mirror_available_detectors(doc))
    assert names  # the golden doc is non-trivial
    assert_timeline_matches_mirror(tl, [doc], names)


def assert_timeline_matches_mirror(tl, docs, detector_names):
    def multiset(rows):
        # Counter, not sorted: None (absent p_value) doesn't order vs float
        from collections import Counter

        return Counter(
            tuple(None if isinstance(v, float) and pd.isna(v) else v for v in r)
            for r in rows
        )

    for name in detector_names:
        got = tl.detector_timeline(name).drop("threshold").toPandas()
        exp = [r for d in docs for r in _mirror_detector_timeline(d, name)]
        assert multiset(got.itertuples(index=False)) == multiset(exp), name

    got = tl.all_detectors_timeline().toPandas()
    exp = [r for d in docs for r in _mirror_all_detectors(d)]
    assert multiset(got.itertuples(index=False)) == multiset(exp)

    got = tl.feature_drift_timeline().toPandas()
    exp = [r for d in docs for r in _mirror_feature_drift(d)]
    assert multiset(got.itertuples(index=False)) == multiset(exp)

    got = tl.performance_metrics().toPandas()
    exp = [r for d in docs for r in _mirror_perf(d)]
    # both sides parse the same JSON decimal literals to IEEE doubles, so
    # exact equality holds (values are 3-decimal literals, no arithmetic)
    assert multiset(
        (r.year, float(r.accuracy), float(r.accuracy_delta))
        for r in got.itertuples(index=False)
    ) == multiset((y, float(a), float(d)) for y, a, d in exp)

    got = tl.rca_results().toPandas()
    got_rows = [
        (
            r.year,
            r.detector,
            r.analyzer,
            tuple(sorted((r.feature_importances or {}).items())),
            tuple(r.recommendations if r.recommendations is not None else ()),
            r.n_recommendations,
        )
        for r in got.itertuples(index=False)
    ]
    exp = [r for d in docs for r in _mirror_rca(d)]
    # reference defaults absent importances/recommendations to {} / [];
    # the Spark frame carries nulls — normalized above to the same tuples
    assert multiset(got_rows) == multiset(exp)

    got = tl.rca_recommendations_table().toPandas()
    exp = [r for d in docs for r in _mirror_rca_recommendations(d)]
    assert multiset(got.itertuples(index=False)) == multiset(exp)

    got = tl.feature_importance_changes().toPandas()
    exp = [r for d in docs for r in _mirror_importance_changes(d)]
    assert multiset(
        (r.year, r.feature, float(r.ref_importance), float(r.test_importance),
         float(r.change), float(r.abs_change))
        for r in got.itertuples(index=False)
    ) == multiset(
        (y, f, float(a), float(b), float(c), float(ab))
        for y, f, a, b, c, ab in exp
    )

    exp_names = set().union(*(_mirror_available_detectors(d) for d in docs))
    assert tl.available_detectors() == sorted(exp_names)

    exp_years = sorted({int(y) for d in docs for y, _ in _years(d)})
    assert tl.available_years() == exp_years

    # summary_stats: reference derives it from the same three frames
    # (data_loader.py:220-247) — year count, distinct detectors, drift
    # events, accuracy mean/range, distinct drifted features
    import pytest

    s = tl.summary_stats()
    all_rows = [r for d in docs for r in _mirror_all_detectors(d)]
    perf_rows = [r for d in docs for r in _mirror_perf(d)]
    feat_rows = [r for d in docs for r in _mirror_feature_drift(d)]
    accs = [a for _, a, _ in perf_rows]
    # multi-file generalization: distinct years across the lake (the
    # coherent extension of the reference's single-document key count,
    # matching available_years)
    assert s["total_years"] == len(exp_years)
    assert s["detectors_count"] == len({r[1] for r in all_rows})
    assert s["total_drift_events"] == sum(1 for r in all_rows if r[2])
    assert s["avg_accuracy"] == pytest.approx(sum(accs) / len(accs))
    assert s["accuracy_range"] == (
        pytest.approx(min(accs)),
        pytest.approx(max(accs)),
    )
    assert s["unique_drifted_features"] == len(
        {r[1] for r in feat_rows if r[3]}
    )
