"""Driver-side numerics vs independent oracles (no Spark needed)."""

import math
from itertools import combinations

import numpy as np
import pytest

from driftspark import numerics as nm


def brute_ks_pvalue(n, m, d):
    """P(D >= d) by exhaustive enumeration of pooled orderings (no ties)."""
    total = ge = 0
    for refpos in combinations(range(n + m), n):
        refset = set(refpos)
        i = j = 0
        mx = 0.0
        for k in range(n + m):
            if k in refset:
                i += 1
            else:
                j += 1
            mx = max(mx, abs(i / n - j / m))
        total += 1
        if mx >= d - 1e-12:
            ge += 1
    return ge / total


@pytest.mark.parametrize(
    "n,m,d", [(5, 4, 0.55), (6, 6, 0.5), (4, 7, 0.6071428571428571), (3, 8, 0.625)]
)
def test_ks_exact_matches_bruteforce(n, m, d):
    assert nm.ks_2samp_pvalue_exact(d, n, m) == pytest.approx(
        brute_ks_pvalue(n, m, d), abs=1e-9
    )


def test_ks_d_matches_definition():
    rng = np.random.RandomState(42)
    a = rng.normal(0, 1, 237)
    b = rng.normal(0.3, 1.2, 181)
    # direct definition: max over all x of |F_a(x) - F_b(x)|
    xs = np.concatenate([a, b])
    d_def = max(
        abs((a <= x).mean() - (b <= x).mean()) for x in xs
    )
    assert nm.ks_2samp_d(a, b) == pytest.approx(d_def, abs=1e-12)


def test_ks_exact_vs_asymptotic_converge():
    # at n=m=5000 exact and asymptotic should agree to ~1e-2 for moderate d
    d = 0.03
    pe = nm.ks_2samp_pvalue_exact(d, 5000, 5000)
    pa = nm.ks_2samp_pvalue_asymp(d, 5000, 5000)
    assert pe == pytest.approx(pa, abs=0.02)


def test_ks_auto_dispatch():
    assert nm.ks_2samp_pvalue(0.5, 20, 20) == nm.ks_2samp_pvalue_exact(0.5, 20, 20)
    assert nm.ks_2samp_pvalue(0.01, 20000, 20000) == nm.ks_2samp_pvalue_asymp(
        0.01, 20000, 20000
    )


def test_chi2_sf_known_values():
    # classic critical values: P(X2_1 > 3.8415) = .05, P(X2_2 > 5.9915) = .05
    assert nm.chi2_sf(3.841458820694124, 1) == pytest.approx(0.05, abs=1e-12)
    assert nm.chi2_sf(5.991464547107979, 2) == pytest.approx(0.05, abs=1e-12)
    assert nm.chi2_sf(18.307038053275146, 10) == pytest.approx(0.05, abs=1e-12)
    # closed form for df=3: sf(x) = erfc(sqrt(x/2)) + sqrt(2x/pi) * exp(-x/2)
    for x in (0.5, 2.0, 7.81):
        closed = math.erfc(math.sqrt(x / 2)) + math.sqrt(2 * x / math.pi) * math.exp(
            -x / 2
        )
        assert nm.chi2_sf(x, 3) == pytest.approx(closed, abs=1e-12)
    # closed form for df=2: sf(x) = exp(-x/2)
    assert nm.chi2_sf(1.7, 2) == pytest.approx(math.exp(-0.85), abs=1e-13)
    # closed form for df=4: sf(x) = (1 + x/2) exp(-x/2)
    assert nm.chi2_sf(3.3, 4) == pytest.approx((1 + 1.65) * math.exp(-1.65), abs=1e-13)


def test_chi2_sf_monte_carlo():
    rng = np.random.RandomState(42)
    for df in (1, 4, 9):
        sample = rng.chisquare(df, 400_000)
        for stat in (0.5, 2.0, df, 2.0 * df):
            emp = (sample > stat).mean()
            assert nm.chi2_sf(stat, df) == pytest.approx(emp, abs=3e-3)


def test_chisquare_statistic():
    obs = np.array([10, 20, 30, 40], dtype=float)
    exp = np.array([25, 25, 25, 25], dtype=float)
    stat, p = nm.chisquare(obs, exp)
    assert stat == pytest.approx(((obs - exp) ** 2 / exp).sum(), abs=1e-12)
    assert 0 <= p <= 1


def test_psi_hand_computed():
    e = np.array([0.5, 0.5])
    a = np.array([0.8, 0.2])
    expected = (0.8 - 0.5) * math.log(0.8 / 0.5) + (0.2 - 0.5) * math.log(0.2 / 0.5)
    assert nm.psi_from_proportions(e, a) == pytest.approx(expected, abs=1e-15)


def test_psi_clamp_and_renorm():
    # zero bins must be clamped to min_bin_size then renormalized (psi.py:102-107)
    e = np.array([1.0, 0.0])
    a = np.array([0.0, 1.0])
    ec = np.array([1.0, 0.001]) / 1.001
    ac = np.array([0.001, 1.0]) / 1.001
    expected = np.sum((ac - ec) * np.log(ac / ec))
    assert nm.psi_from_proportions(e, a) == pytest.approx(expected, abs=1e-15)


def test_severity_ladders():
    assert nm.severity_from_pvalue(0.06, 0.05) == "none"
    assert nm.severity_from_pvalue(0.03, 0.05) == "low"
    assert nm.severity_from_pvalue(0.01, 0.05) == "medium"
    assert nm.severity_from_pvalue(0.001, 0.05) == "high"
    assert nm.severity_from_pvalue(0.0001, 0.05) == "critical"
    # ladder boundary: detector uses strict >, so p == t/2 is MEDIUM
    assert nm.severity_from_pvalue(0.025, 0.05) == "medium"
    # localizer uses >=, so p == t/2 is LOW
    assert nm.severity_from_pvalue_ge(0.025, 0.05) == "low"
    assert [nm.severity_from_psi(x) for x in (0.05, 0.15, 0.25, 0.4, 0.6)] == [
        "none",
        "low",
        "medium",
        "high",
        "critical",
    ]
    assert [nm.severity_from_auc(x) for x in (0.5, 0.6, 0.7, 0.8, 0.9)] == [
        "none",
        "low",
        "medium",
        "high",
        "critical",
    ]
    assert [nm.severity_from_flag_rate(x) for x in (0.01, 0.07, 0.15, 0.3, 0.5)] == [
        "none",
        "low",
        "medium",
        "high",
        "critical",
    ]


def test_qcut_edges_matches_pandas():
    import pandas as pd

    rng = np.random.RandomState(42)
    values = rng.lognormal(0, 1, 5000)
    _, pd_edges = pd.qcut(pd.Series(values), q=10, retbins=True, duplicates="drop")
    ours = nm.qcut_edges(values, 10)
    assert np.allclose(ours, pd_edges, rtol=1e-12)


def test_roundhu_matches_duckdb_round():
    """Driver-side oracle rounding (_roundhu) must agree with DuckDB's
    round(double, n) — HALF_UP on the shortest decimal repr — including
    the tie values where Python's built-in half-even round diverges
    (CLAUDE.md: round floats identically on the Spark AND DuckDB side)."""
    import sys
    from pathlib import Path

    import duckdb

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from __spark_entry__ import _roundhu

    con = duckdb.connect()
    vals = [
        0.1234565, -0.1234565, 0.1234575, 0.0625, 2.675, 0.5, 1.5,
        0.00048828125, 3.0517578125e-05, 0.1, 1 / 3, math.pi, 1e-12, 0.0,
    ] + list(np.random.default_rng(7).uniform(-2, 2, 200))
    for v in vals:
        for n in (4, 6, 9):
            duck = con.execute(
                f"select round(cast({v!r} as double), {n})"
            ).fetchone()[0]
            assert _roundhu(v, n) == duck, (v, n)
    # the divergence this guards against: Python round is half-even
    assert round(0.1234565, 6) != _roundhu(0.1234565, 6)
    assert _roundhu(None, 6) is None
