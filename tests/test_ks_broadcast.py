"""Broadcast-ECDF per-partition KS == numpy oracle and window variant."""

import numpy as np
import pytest

from driftspark import numerics as nm
from driftspark.synth import synth_image_table
from driftspark.verdicts import ks_d_by_partition, ks_d_by_partition_broadcast


def test_broadcast_ks_matches_oracle_and_window(spark):
    t = synth_image_table(spark, 8000, n_parts=4, drift=True, with_bytes=False).cache()
    ref = t.where("split='ref'")
    test = t.where("split='test'")
    cols = ["w", "phash"]
    bc = {
        (r["part"], r["feature"]): (r["d"], r["n"], r["m"])
        for r in ks_d_by_partition_broadcast(ref, test, cols).collect()
    }
    win = {
        (r["part"], r["feature"]): (r["d"], r["n"], r["m"])
        for r in ks_d_by_partition(ref, test, cols).collect()
    }
    assert set(bc) == set(win)
    ref_pdf = ref.select(*cols).toPandas()
    test_pdf = test.select("part", *cols).toPandas()
    for (part, feat), (d, n, m) in bc.items():
        tv = test_pdf[test_pdf["part"] == part][feat].values.astype(float)
        rv = ref_pdf[feat].values.astype(float)
        oracle = nm.ks_2samp_d(rv, tv)
        assert d == pytest.approx(oracle, abs=1e-12), (part, feat)
        assert win[(part, feat)][0] == pytest.approx(oracle, abs=1e-12)
        assert (n, m) == (len(rv), len(tv))


def test_broadcast_ks_with_ties_and_duplicates(spark):
    # heavy ties: w/h take only 3 values — ECDF step logic must be exact
    t = synth_image_table(spark, 3000, n_parts=2, drift=False, with_bytes=False).cache()
    ref = t.where("split='ref'")
    test = t.where("split='test'")
    bc = {
        (r["part"], r["feature"]): r["d"]
        for r in ks_d_by_partition_broadcast(ref, test, ["w", "h"]).collect()
    }
    ref_pdf = ref.select("w", "h").toPandas()
    test_pdf = test.select("part", "w", "h").toPandas()
    for (part, feat), d in bc.items():
        oracle = nm.ks_2samp_d(
            ref_pdf[feat].values.astype(float),
            test_pdf[test_pdf["part"] == part][feat].values.astype(float),
        )
        assert d == pytest.approx(oracle, abs=1e-12)


def test_distributed_ecdf_thinning(spark):
    """_ref_ecdf_points thins features above the cap WITHOUT collecting
    the full distinct set: retained points stay <= cap (+ exact last
    point), every retained cumulative count equals the exact ECDF at that
    value, and features under the cap come back bit-exact."""
    import pandas as pd
    from pyspark.sql import functions as F

    from driftspark.verdicts import _ref_ecdf_points

    rng = np.random.RandomState(3)
    big_vals = rng.normal(0, 1, 5000)           # ~5000 distinct > cap
    small_vals = rng.randint(0, 50, 5000)       # 50 distinct < cap
    pdf = pd.concat([
        pd.DataFrame({"feature": "big", "value": big_vals}),
        pd.DataFrame({"feature": "small", "value": small_vals.astype(float)}),
    ])
    ref_g = (
        spark.createDataFrame(pdf)
        .groupBy("feature", "value")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cap = 500
    ecdf = _ref_ecdf_points(ref_g, cap, n_buckets=8)

    # exact oracle
    def exact(vals):
        v, c = np.unique(vals, return_counts=True)
        return v, np.cumsum(c)

    ev, ec = exact(small_vals.astype(float))
    assert np.array_equal(ecdf["small"][0], ev)
    assert np.array_equal(ecdf["small"][1], ec)
    assert ecdf["small"][2] == 5000

    bv, bc = exact(big_vals)
    tv, tc, n = ecdf["big"]
    assert n == 5000
    assert len(tv) <= cap + 1
    assert tv[-1] == bv[-1] and tc[-1] == 5000
    assert np.all(np.diff(tv) > 0)
    # every retained point carries the EXACT cumulative count
    idx = np.searchsorted(bv, tv)
    assert np.array_equal(bc[idx], tc)
    # thinning is uniform in rank: gaps bounded by the stride
    stride = len(bv) // cap + 1
    assert np.max(np.diff(np.concatenate([[0], idx]))) <= stride


def test_broadcast_ks_exact_under_cap_and_close_when_thinned(spark):
    """KS D with a thinned reference ECDF stays within the documented
    resolution bound of the exact D."""
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.RandomState(11)
    ref = rng.normal(0, 1, 8000)
    test = rng.normal(0.3, 1, 4000)
    rows = pd.concat([
        pd.DataFrame({"split": "ref", "part": 0, "x": ref}),
        pd.DataFrame({"split": "test", "part": 0, "x": test}),
    ])
    df = spark.createDataFrame(rows)
    rdf = df.where(F.col("split") == "ref")
    tdf = df.where(F.col("split") == "test")

    exact_d = ks_d_by_partition_broadcast(rdf, tdf, ["x"]).first()["d"]
    # numpy oracle
    allv = np.sort(np.concatenate([ref, test]))
    d_np = np.max(np.abs(
        np.searchsorted(np.sort(ref), allv, side="right") / len(ref)
        - np.searchsorted(np.sort(test), allv, side="right") / len(test)
    ))
    assert exact_d == pytest.approx(d_np, abs=1e-12)

    thin_d = ks_d_by_partition_broadcast(
        rdf, tdf, ["x"], max_ref_ecdf_points=400
    ).first()["d"]
    stride = len(np.unique(ref)) // 400 + 1
    assert abs(thin_d - exact_d) <= stride / len(ref) + 1e-12


def test_thinned_ecdf_mass_aware_zero_inflated(spark):
    """Retention is uniform in MASS: a zero-inflated feature (one value
    holding 50% of rows) keeps its heavy head point, so the thinned KS-D
    error stays within 1/max_points even under frequency skew."""
    import pandas as pd
    from pyspark.sql import functions as F

    from driftspark.verdicts import _ref_ecdf_points

    rng = np.random.RandomState(7)
    vals = np.concatenate([np.zeros(5000), rng.uniform(1, 2, 5000)])
    ref_g = (
        spark.createDataFrame(pd.DataFrame({"feature": "z", "value": vals}))
        .groupBy("feature", "value")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cap = 100
    tv, tc, n = _ref_ecdf_points(ref_g, cap, n_buckets=8)["z"]
    assert n == 10000
    assert len(tv) <= cap + 1
    assert tv[0] == 0.0 and tc[0] == 5000  # the heavy head IS retained
    # exact cum at every retained point + mass gaps below one quantum
    uv, uc = np.unique(vals, return_counts=True)
    exact_cum = np.cumsum(uc)
    idx = np.searchsorted(uv, tv)
    assert np.array_equal(exact_cum[idx], tc)
    gaps = np.diff(np.concatenate([[0], tc]))
    assert gaps.max() <= -(-n // cap) + uc.max() - 1  # quantum + own mass


def test_preagg_and_raw_paths_bit_identical(spark):
    """ks_d_against_ecdf with preaggregate True/False returns bit-identical
    (d, n, m) per group — the weighted-unique math equals sorting raw."""
    import pandas as pd

    from driftspark.verdicts import fit_ks_reference_ecdf, ks_d_against_ecdf

    rng = np.random.RandomState(31)
    ref = spark.createDataFrame(pd.DataFrame({
        "x": rng.normal(0, 1, 3000),
        "q": rng.randint(0, 5, 3000).astype(float),  # heavily quantized
    }))
    test = spark.createDataFrame(pd.DataFrame({
        "x": rng.normal(0.5, 1, 3000),
        "q": rng.randint(0, 5, 3000).astype(float),
        "part": rng.randint(0, 3, 3000),
    }))
    ecdf = fit_ks_reference_ecdf(ref, ["x", "q"])
    a = {(r["part"], r["feature"]): (r["d"], r["n"], r["m"])
         for r in ks_d_against_ecdf(test, ["x", "q"], ecdf, preaggregate=True).collect()}
    b = {(r["part"], r["feature"]): (r["d"], r["n"], r["m"])
         for r in ks_d_against_ecdf(test, ["x", "q"], ecdf, preaggregate=False).collect()}
    assert a == b and len(a) == 6
