"""Property-based tests (hypothesis) for the scalar numerics core."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from driftspark import numerics as nm

floats = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64)


@given(st.lists(floats, min_size=2, max_size=200))
@settings(max_examples=50, deadline=None)
def test_psi_identity_is_zero(xs):
    p = np.abs(np.array(xs)) + 1e-6
    p = p / p.sum()
    assert abs(nm.psi_from_proportions(p, p)) < 1e-12


@given(
    st.lists(st.floats(min_value=1e-6, max_value=1.0), min_size=2, max_size=50),
    st.lists(st.floats(min_value=1e-6, max_value=1.0), min_size=2, max_size=50),
)
@settings(max_examples=50, deadline=None)
def test_psi_nonnegative(a, b):
    n = min(len(a), len(b))
    pa, pb = np.array(a[:n]), np.array(b[:n])
    # PSI is a J-divergence: strictly nonnegative after clamp+renormalize
    assert nm.psi_from_proportions(pa, pb) >= -1e-12


@given(st.integers(min_value=1, max_value=60), st.floats(min_value=0.001, max_value=200))
@settings(max_examples=100, deadline=None)
def test_chi2_sf_bounds_and_monotone(df, x):
    p = nm.chi2_sf(x, df)
    assert 0.0 <= p <= 1.0
    assert nm.chi2_sf(x + 1.0, df) <= p + 1e-12


@given(
    st.integers(min_value=2, max_value=60),
    st.integers(min_value=2, max_value=60),
    st.floats(min_value=0.0, max_value=1.0),
)
@settings(max_examples=80, deadline=None)
def test_ks_exact_pvalue_bounds_and_monotone(n, m, d):
    p = nm.ks_2samp_pvalue_exact(d, n, m)
    assert 0.0 <= p <= 1.0
    p2 = nm.ks_2samp_pvalue_exact(min(d + 0.1, 1.0), n, m)
    assert p2 <= p + 1e-9


@given(
    st.lists(floats, min_size=3, max_size=300),
    st.lists(floats, min_size=3, max_size=300),
)
@settings(max_examples=50, deadline=None)
def test_ks_d_definition_and_range(a, b):
    av, bv = np.array(a), np.array(b)
    d = nm.ks_2samp_d(av, bv)
    assert 0.0 <= d <= 1.0
    # direct-definition oracle on the pooled points
    xs = np.concatenate([av, bv])
    oracle = max(abs((av <= x).mean() - (bv <= x).mean()) for x in xs)
    assert d == np.float64(oracle) or abs(d - oracle) < 1e-12


@given(st.lists(floats, min_size=20, max_size=500), st.integers(min_value=2, max_value=10))
@settings(max_examples=40, deadline=None)
def test_qcut_edges_property(xs, q):
    import pandas as pd

    values = np.array(xs)
    ours = nm.qcut_edges(values, q)
    try:
        _, pd_edges = pd.qcut(pd.Series(values), q=q, retbins=True, duplicates="drop")
    except ValueError:
        return  # degenerate (all-equal) input — reference falls back too
    assert np.allclose(ours, pd_edges, rtol=1e-9, atol=1e-12)


@given(st.lists(floats, min_size=2, max_size=400))
@settings(max_examples=40, deadline=None)
def test_severity_total_order(xs):
    # every p-value maps to exactly one severity and the ladder is monotone
    order = ["critical", "high", "medium", "low", "none"]
    last = 0
    for p in sorted(abs(x) % 1.0 for x in xs):
        s = nm.severity_from_pvalue(p, 0.05)
        idx = order.index(s)
        assert idx >= last
        last = idx


# ---------------------------------------------------------------------------
# Codec properties (pure-python paths — no Spark session needed)
# ---------------------------------------------------------------------------


@given(
    st.integers(min_value=1, max_value=400),   # n samples
    st.sampled_from([8000, 16000, 44100]),
    st.sampled_from([16, 32]),
    st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_property(n, sr, bits, seed):
    from driftspark.multimodal import decode_wav, encode_wav

    rng = np.random.RandomState(seed % 2**31)
    x = rng.uniform(-1, 1, n)
    y, sr_out = decode_wav(encode_wav(x, sr, bits=bits))
    assert sr_out == sr and len(y) == n
    tol = 1.5 / 32768 if bits == 16 else 1e-7
    assert np.max(np.abs(y - x)) <= tol


@given(
    st.integers(min_value=1, max_value=5),     # frames
    st.integers(min_value=1, max_value=12),    # h
    st.integers(min_value=1, max_value=13),    # w (odd widths hit padding)
    st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=40, deadline=None)
def test_avi_roundtrip_property(f, h, w, seed):
    from driftspark.multimodal import decode_avi_frame, encode_avi

    rng = np.random.RandomState(seed % 2**31)
    frames = rng.randint(0, 256, (f, h, w, 3)).astype(np.uint8)
    avi = encode_avi(frames)
    for k in range(f):
        assert np.array_equal(decode_avi_frame(avi, k), frames[k])


@given(
    st.integers(min_value=2, max_value=30),    # h
    st.integers(min_value=2, max_value=30),    # w
    st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(h, w, seed):
    from driftspark.imageops import decode_png, encode_png

    rng = np.random.RandomState(seed % 2**31)
    px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)
