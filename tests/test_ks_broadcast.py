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
