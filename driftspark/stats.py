"""Distributed statistical primitives (the engine's physical operators).

Each primitive is a declarative DataFrame composition — Catalyst gets the
whole plan (column pruning, partial aggregation, AQE) — and returns tiny
driver-side arrays that feed the scalar math in ``driftspark.numerics``.

Semantics parity notes (reference = /root/reference/src/drift_autopsy):

* quantile bin edges == ``pd.qcut(values, q, retbins=True,
  duplicates='drop')`` (psi.py:70-77): exact linear-interpolated
  percentiles (Spark ``percentile`` aggregate) with duplicate edges dropped,
  falling back to uniform ``linspace(min, max, q+1)`` edges (psi.py:80-82).
* bucketization == ``pd.cut(values, bins=edges, include_lowest=True)``
  (psi.py:149-150): right-closed intervals, first bin closed on both ends,
  values outside [edges[0], edges[-1]] excluded from both the counts and
  the normalization denominator (pandas leaves them NaN and
  ``value_counts(normalize=True)`` drops them).
* confidence binning == ``np.digitize(conf, linspace(0,1,11)[:-1]) - 1``
  then clip to [0, n_bins-1] (cbpe.py:80-87): left-closed decile bins using
  the exact ``np.linspace`` doubles as cutoffs.
* KS D == the max |ECDF_ref - ECDF_test| over pooled sample points, i.e.
  exactly scipy.stats.ks_2samp's statistic: computed distributed via
  per-value pre-aggregation + a per-feature cumulative window (§2.4 A10 in
  SURVEY.md).  The groupBy(feature, value) partial aggregation shrinks the
  window input to distinct values, so the single-reducer-per-feature window
  only ever sees the value domain, not the row count.
"""

from __future__ import annotations

import logging
import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)

MIN_BIN_SIZE_DEFAULT = 0.001


# ---------------------------------------------------------------------------
# Null/NaN handling — pandas `.dropna()` parity for double columns
# ---------------------------------------------------------------------------


def nn(col: str) -> Column:
    """NULL out NaNs so Spark aggregates skip them like pandas dropna
    (reference drops NaN before every statistic, e.g. ks_test.py:96-97)."""
    c = F.col(col).cast("double")
    return F.when(~F.isnan(c), c)


# ---------------------------------------------------------------------------
# Quantile bin edges (PSI fit)
# ---------------------------------------------------------------------------


def quantile_edges(
    df: DataFrame, cols: Sequence[str], q: int
) -> Dict[str, np.ndarray]:
    """Exact per-column quantile edges in ONE aggregation pass.

    ``percentile`` is Spark's exact linear-interpolation percentile
    aggregate — same interpolation as numpy/pandas quantile, so edges match
    ``pd.qcut`` retbins (up to float associativity).  Nulls/NaNs excluded.

    ONE direct aggregation per column, submitted as CONCURRENT jobs: the
    percentile aggregate's partial state is a distinct-value counts map
    whose final merge is single-threaded per aggregate — a multi-column
    global agg serializes every column's merge into one task, which
    dominated the exact-edges fit.  Per-column jobs keep each merge in
    its own job (overlapping scheduling and merges, guide-§2.6 style)
    and, with a columnar source, read DISJOINT column chunks — total
    scan bytes stay ~constant while the merges parallelize (interleaved
    best-of-3 at sf0.1: 2.26 s → 1.56 s for 4 columns).  Values are
    bit-identical (same per-column aggregate expression; locked by the
    pd.qcut parity tests).
    """
    if not cols:
        return {}
    from concurrent.futures import ThreadPoolExecutor

    probs = F.array(*[F.lit(i / q) for i in range(q + 1)])

    def one(c: str):
        return c, df.agg(
            F.percentile(nn(c), probs).alias("pct"),
            F.min(nn(c)).alias("mn"),
            F.max(nn(c)).alias("mx"),
        ).first()

    # these are tiny driver .first() collects over the py4j socket, NOT
    # Arrow streams — the box's ~8-concurrent-Arrow-stream knee
    # (CLAUDE.md) does not apply, so nesting inside the verdict/runner
    # pools is safe
    if len(cols) == 1:
        rows = dict([one(cols[0])])
    else:
        with ThreadPoolExecutor(max_workers=min(len(cols), 8)) as pool:
            rows = dict(pool.map(one, cols))
    out: Dict[str, np.ndarray] = {}
    for c in cols:
        row = rows[c]
        if row["pct"] is None:  # all-null column
            continue
        edges = np.unique(np.asarray(row["pct"], dtype=np.float64))
        if len(edges) < 2:
            # constant column → reference falls back to uniform edges
            edges = np.linspace(row["mn"], row["mx"], q + 1)
        out[c] = edges
    return out


def approx_quantile_edges(
    df: DataFrame, cols: Sequence[str], q: int, relative_error: float = 1e-4
) -> Dict[str, np.ndarray]:
    """Greenwald-Khanna approximate quantile edges — the scale path.

    ONE pass, map-side mergeable sketches, no melt/shuffle of values: at
    10^12 rows an exact percentile sort is not realistic, and PSI is
    insensitive to edge placement at relative_error=1e-4 (a bin boundary
    moves by <=0.01% of the mass).  Exact pd.qcut-parity edges remain
    available via ``quantile_edges`` (detector flag ``exact_edges``).

    Same post-processing as the exact path: duplicate edges dropped,
    constant columns fall back to uniform linspace edges (GK summaries keep
    exact min/max, so edges[0]/edges[-1] are the true extremes).
    """
    if not cols:
        return {}
    probs = [i / q for i in range(q + 1)]
    raw = df.approxQuantile(list(cols), probs, relative_error)
    out: Dict[str, np.ndarray] = {}
    for c, e in zip(cols, raw):
        if len(e) == 0:  # all-null column
            continue
        edges = np.unique(np.asarray(e, dtype=np.float64))
        if len(edges) < 2:
            edges = np.linspace(e[0], e[-1], q + 1)
        out[c] = edges
    return out


# ---------------------------------------------------------------------------
# Bucketization expressions
# ---------------------------------------------------------------------------


def bucket_expr(col: str, edges: np.ndarray) -> Column:
    """pd.cut(values, bins=edges, include_lowest=True) as a Column.

    Right-closed bins (e_{i}, e_{i+1}], first bin [e_0, e_1].  Returns NULL
    for out-of-range or null/NaN values.  Bin index = number of interior
    edges strictly below the value — a whole-stage-codegen'd sum of
    comparisons, no UDF.
    """
    v = nn(col)
    e = [float(x) for x in edges]
    bin_idx = F.lit(0)
    for interior in e[1:-1]:
        bin_idx = bin_idx + (v > F.lit(interior)).cast("int")
    in_range = (v >= F.lit(e[0])) & (v <= F.lit(e[-1]))
    return F.when(in_range, bin_idx)


def digitize_clip_expr(col: str, edges: np.ndarray, n_bins: int) -> Column:
    """np.digitize(x, edges[:-1]) - 1, clipped to [0, n_bins-1]
    (CBPE confidence binning, cbpe.py:83-84, 127-128).

    digitize(x, bins) - 1 == (# of cutoffs <= x) - 1; uses the exact
    linspace doubles as cutoffs so float-boundary behavior matches numpy.
    NULL in → NULL out (NaN confidence is not meaningful).
    """
    v = nn(col)
    cnt = F.lit(0)
    for cutoff in [float(x) for x in edges[:-1]]:
        cnt = cnt + (v >= F.lit(cutoff)).cast("int")
    idx = cnt - F.lit(1)
    clipped = F.least(F.greatest(idx, F.lit(0)), F.lit(n_bins - 1))
    return F.when(v.isNotNull(), clipped)


# ---------------------------------------------------------------------------
# Histograms (PSI detect) — one scan for all features x bins x both sides
# ---------------------------------------------------------------------------


def histogram_proportions_one(
    df: DataFrame, edges_map: Dict[str, np.ndarray]
) -> Dict[str, np.ndarray]:
    """Single-side variant of :func:`histogram_proportions` — identical
    bin/denominator semantics, but ONE global aggregation over one frame
    (no union, no group key): half the scan of passing the same frame as
    both sides, which matters when the frame is every streaming
    micro-batch.  An empty frame yields all-zero proportions."""
    if not edges_map:
        return {}
    cols = list(edges_map)
    aggs = []
    for c in cols:
        b = bucket_expr(c, edges_map[c])
        for i in range(len(edges_map[c]) - 1):
            aggs.append(
                F.sum(F.when(b == i, F.lit(1)).otherwise(F.lit(0))).alias(f"{c}||{i}")
            )
        aggs.append(F.count(b).alias(f"{c}||total"))
    r = df.select(*cols).agg(*aggs).first()
    out: Dict[str, np.ndarray] = {}
    for c in cols:
        total = r[f"{c}||total"] or 0
        counts = np.array(
            [r[f"{c}||{i}"] or 0 for i in range(len(edges_map[c]) - 1)],
            dtype=np.float64,
        )
        out[c] = counts / total if total > 0 else counts
    return out


def histogram_proportions(
    ref_df: DataFrame,
    test_df: DataFrame,
    edges_map: Dict[str, np.ndarray],
) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """Per-feature in-range bin proportions for both sides.

    ONE job over union(ref, test): conditional-sum aggregation produces
    n_features x n_bins count columns with map-side partial aggregation —
    no shuffle of row data, only of the tiny aggregate state.

    Matches ``value_counts(normalize=True, sort=False)`` over the pd.cut
    categorical (psi.py:153-154): every fitted bin present (0.0 when
    empty), denominator = in-range non-null count.
    """
    if not edges_map:
        return {}
    cols = list(edges_map)
    aggs = []
    for c in cols:
        b = bucket_expr(c, edges_map[c])
        n_bins = len(edges_map[c]) - 1
        for i in range(n_bins):
            aggs.append(
                F.sum(F.when(b == i, F.lit(1)).otherwise(F.lit(0))).alias(f"{c}||{i}")
            )
        aggs.append(F.count(b).alias(f"{c}||total"))
    u = ref_df.select(*cols).withColumn("__side", F.lit("ref")).unionByName(
        test_df.select(*cols).withColumn("__side", F.lit("test"))
    )
    rows = {r["__side"]: r for r in u.groupBy("__side").agg(*aggs).collect()}
    out: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    for c in cols:
        n_bins = len(edges_map[c]) - 1
        props = []
        for side in ("ref", "test"):
            r = rows[side]
            total = r[f"{c}||total"] or 0
            counts = np.array(
                [r[f"{c}||{i}"] or 0 for i in range(n_bins)], dtype=np.float64
            )
            props.append(counts / total if total > 0 else counts)
        out[c] = (props[0], props[1])
    return out


def psi_counts_fused(
    ref_df: DataFrame,
    test_df: DataFrame,
    edges_map: Dict[str, np.ndarray],
    cat_cols: Sequence[str] = (),
) -> Tuple[
    Dict[str, Tuple[np.ndarray, np.ndarray]], Dict[str, Tuple[np.ndarray, np.ndarray]]
]:
    """Numeric bin proportions AND categorical side-counts in ONE job.

    Each row explodes into (feature, key) pairs — numeric features emit the
    pd.cut bucket index, categoricals their raw value — and a single
    groupBy(feature, key) with conditional side-sums aggregates everything.
    Map-side partial aggregation shrinks the shuffle to O(features x
    (bins+categories)) state per task regardless of row count; versus one
    wide-aggregation job for numerics plus one groupBy job PER categorical
    column, this runs the whole detect() phase as one scan + one tiny
    shuffle.

    Returns ``(numeric_props, cat_counts)``: numeric_props matches
    ``histogram_proportions`` exactly (every fitted bin present, in-range
    denominator); cat_counts is {col: (ref_counts, test_counts)} over the
    sorted union of observed categories (``categorical_counts`` alignment).
    """
    num_cols = list(edges_map)
    if not num_cols and not cat_cols:
        return {}, {}
    # "#c:" namespace keeps a categorical named like a numeric distinct
    structs = [
        F.struct(
            F.lit("#n:" + c).alias("feature"),
            bucket_expr(c, edges_map[c]).cast("string").alias("key"),
        )
        for c in num_cols
    ] + [
        F.struct(F.lit("#c:" + c).alias("feature"), F.col(c).cast("string").alias("key"))
        for c in cat_cols
    ]

    def melt_side(df: DataFrame, is_ref: bool) -> DataFrame:
        return (
            df.select(F.explode(F.array(*structs)).alias("fk"))
            .select("fk.feature", "fk.key")
            .where(F.col("key").isNotNull())
            .withColumn("r", F.lit(1 if is_ref else 0))
            .withColumn("t", F.lit(0 if is_ref else 1))
        )

    cols_needed = list(dict.fromkeys(list(num_cols) + list(cat_cols)))
    agg = (
        melt_side(ref_df.select(*cols_needed), True)
        .unionByName(melt_side(test_df.select(*cols_needed), False))
        .groupBy("feature", "key")
        .agg(F.sum("r").alias("r"), F.sum("t").alias("t"))
        .collect()
    )
    num_rows: Dict[str, Dict[int, Tuple[int, int]]] = {c: {} for c in num_cols}
    cat_rows: Dict[str, Dict[str, Tuple[int, int]]] = {c: {} for c in cat_cols}
    for row in agg:
        kind, name = row["feature"][:3], row["feature"][3:]
        if kind == "#n:":
            num_rows[name][int(row["key"])] = (row["r"], row["t"])
        else:
            cat_rows[name][row["key"]] = (row["r"], row["t"])

    numeric_props: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    for c in num_cols:
        n_bins = len(edges_map[c]) - 1
        rc = np.array([num_rows[c].get(i, (0, 0))[0] for i in range(n_bins)], float)
        tc = np.array([num_rows[c].get(i, (0, 0))[1] for i in range(n_bins)], float)
        rn, tn = rc.sum(), tc.sum()
        numeric_props[c] = (rc / rn if rn > 0 else rc, tc / tn if tn > 0 else tc)
    cat_counts: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    for c in cat_cols:
        cats = sorted(cat_rows[c])
        cat_counts[c] = (
            np.array([cat_rows[c][k][0] for k in cats], dtype=np.float64),
            np.array([cat_rows[c][k][1] for k in cats], dtype=np.float64),
        )
    return numeric_props, cat_counts


# ---------------------------------------------------------------------------
# Categorical frequencies (PSI categorical / chi-square alignment)
# ---------------------------------------------------------------------------


def categorical_counts(
    ref_df: DataFrame, test_df: DataFrame, col: str
) -> Tuple[List, np.ndarray, np.ndarray]:
    """Aligned raw value counts over the union of observed categories,
    missing side filled with 0 (univariate.py:84-91 alignment), categories
    sorted ascending (reference sorts the union, univariate.py:88).

    groupBy(col) keeps the shuffle at category cardinality; assumes the
    categorical domain fits on the driver (true for fmt/lang-style enums).
    """
    u = (
        ref_df.select(F.col(col).alias("v")).where(F.col(col).isNotNull())
        .withColumn("__side", F.lit("ref"))
        .unionByName(
            test_df.select(F.col(col).alias("v")).where(F.col(col).isNotNull())
            .withColumn("__side", F.lit("test"))
        )
    )
    agg = (
        u.groupBy("v")
        .agg(
            F.sum(F.when(F.col("__side") == "ref", 1).otherwise(0)).alias("r"),
            F.sum(F.when(F.col("__side") == "test", 1).otherwise(0)).alias("t"),
        )
        .collect()
    )
    cats = sorted(r["v"] for r in agg)
    by_v = {r["v"]: r for r in agg}
    ref_counts = np.array([by_v[c]["r"] for c in cats], dtype=np.float64)
    test_counts = np.array([by_v[c]["t"] for c in cats], dtype=np.float64)
    return cats, ref_counts, test_counts


def categorical_proportions(
    ref_df: DataFrame,
    test_df: DataFrame,
    col: str,
    min_bin_size: float = MIN_BIN_SIZE_DEFAULT,
) -> Tuple[np.ndarray, np.ndarray]:
    """Aligned normalized frequencies with missing categories filled with
    ``min_bin_size`` — exact `.align(fill_value=min_bin_size)` semantics of
    psi.py:182-186."""
    cats, ref_counts, test_counts = categorical_counts(ref_df, test_df, col)
    rn, tn = ref_counts.sum(), test_counts.sum()
    ref_p = np.where(ref_counts > 0, ref_counts / (rn if rn else 1.0), min_bin_size)
    test_p = np.where(test_counts > 0, test_counts / (tn if tn else 1.0), min_bin_size)
    return ref_p, test_p


# ---------------------------------------------------------------------------
# Distributed two-sample KS statistic
# ---------------------------------------------------------------------------


def _melt(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(feature, value) long form; NaN/null dropped (pandas dropna parity).

    Deliberately NOT spread_input-guarded: an interleaved A/B at sf0.1
    showed the extra round-robin exchange costs more than the explode
    saves (the heavy work here happens after the groupBy exchange, which
    already parallelizes it) — unlike the per-token md5/n-gram paths in
    driftspark.dedup where the guard wins 3x."""
    structs = [
        F.struct(F.lit(c).alias("feature"), F.col(c).cast("double").alias("value"))
        for c in cols
    ]
    return (
        df.select(F.explode(F.array(*structs)).alias("fv"))
        .select("fv.feature", "fv.value")
        .where(F.col("value").isNotNull() & ~F.isnan("value"))
    )


#: fused-path load-balance targets: aim for ~this many distinct values per
#: (feature, bucket) window group, with at most this many buckets per
#: feature (the per-bucket offsets frame stays a tiny broadcast)
_CDF_ROWS_PER_BUCKET = 16_000
_CDF_MAX_BUCKETS = 1024


def _cdf_prescan(
    ref_df: DataFrame,
    test_df: DataFrame,
    cols: Sequence[str],
    bucketed_threshold: int = 0,
) -> Dict[str, tuple]:
    """{col: (n, m, lo, hi, nd_approx)} from ONE light union scan — no
    explode, no shuffle (global aggregate ships only sketch state).

    ``n``/``m`` are the EXACT per-side non-null non-NaN counts (the same
    rows :func:`_melt` keeps, so they are the KS/W1/CvM sample sizes);
    ``lo``/``hi`` the pooled exact min/max (uniform bucket bounds for the
    fused path — bucket PLACEMENT affects only load balance, never the
    statistic); ``nd_approx`` a distinct-count bound used solely to route
    to the percentile-bucketed decomposition and to size the bucket
    count.  This replaces the former build-then-count totals pass over
    the persisted melt aggregate: the routing signal no longer costs a
    full explode + (feature, value) shuffle + cache materialization.

    The HLL distinct sketch only matters when a feature COULD exceed
    ``bucketed_threshold`` — and nd <= n + m always, so when every
    feature's pooled count is under the threshold the sketch is provably
    routing-neutral and is skipped (its per-row update was ~30% of this
    scan); otherwise a second pass measures it for the over-bound
    features only.
    """
    # positional aliases: a feature column literally named like the side
    # tag (or like another alias) must not collide with the injected
    # ``__s`` — every feature is renamed to __f{i} before the union
    alias = {c: f"__f{i}" for i, c in enumerate(cols)}
    aggs = []
    for c in cols:
        v = F.col(alias[c]).cast("double")
        nnv = F.when(~F.isnan(v), v)
        aggs.append(F.count(nnv).alias(f"{alias[c]}__n"))
        aggs.append(F.min(nnv).alias(f"{alias[c]}__mn"))
        aggs.append(F.max(nnv).alias(f"{alias[c]}__mx"))
    sel = [F.col(c).alias(alias[c]) for c in cols]
    u = ref_df.select(*sel).withColumn("__s", F.lit(0)).unionByName(
        test_df.select(*sel).withColumn("__s", F.lit(1))
    )
    rows = {r["__s"]: r for r in u.groupBy("__s").agg(*aggs).collect()}
    out: Dict[str, tuple] = {}
    for c in cols:
        a = alias[c]
        n = int(rows[0][f"{a}__n"]) if 0 in rows else 0
        m = int(rows[1][f"{a}__n"]) if 1 in rows else 0
        mns = [rows[s][f"{a}__mn"] for s in rows if rows[s][f"{a}__mn"] is not None]
        mxs = [rows[s][f"{a}__mx"] for s in rows if rows[s][f"{a}__mx"] is not None]
        out[c] = (
            n, m,
            min(mns) if mns else None,
            max(mxs) if mxs else None,
            n + m,  # nd bound; refined below only where it matters
        )
    over = [c for c in cols if out[c][0] + out[c][1] > bucketed_threshold]
    if over:
        nd_row = u.agg(*[
            F.approx_count_distinct(
                F.when(
                    ~F.isnan(F.col(alias[c]).cast("double")),
                    F.col(alias[c]).cast("double"),
                )
            ).alias(alias[c])
            for c in over
        ]).first()
        for c in over:
            n, m, lo, hi, _ = out[c]
            out[c] = (n, m, lo, hi, int(nd_row[alias[c]]))
    return out


def _cdf_route(
    fn_name: str,
    prescan: Dict[str, tuple],
    bucketed_threshold: int,
) -> Tuple[Dict[str, Tuple[int, int]], list, list]:
    """(nm, fused_features, percentile_features) from the prescan: drops
    one-sided-empty features with the KS-convention warning, and routes
    features whose approximate distinct count exceeds
    ``bucketed_threshold`` to the equal-mass percentile decomposition
    (robust to value-skew at the scale where uniform buckets could leave
    one bucket hot).  Either route is exact — the statistics are
    bucket-layout-invariant by construction — so the approximate routing
    signal cannot change a result."""
    nm = {c: (v[0], v[1]) for c, v in prescan.items()}
    degenerate = [c for c, (n, m) in nm.items() if n == 0 or m == 0]
    if degenerate:
        logger.warning(
            "%s: no non-null values on one side for %s — skipped",
            fn_name, sorted(degenerate),
        )
    ok = [c for c in prescan if c not in set(degenerate)]
    fused = [c for c in ok if prescan[c][4] <= bucketed_threshold]
    big = [c for c in ok if prescan[c][4] > bucketed_threshold]
    return nm, fused, big


def _cdf_cum_frame(
    g: DataFrame,
    prescan: Dict[str, tuple],
    feats: Sequence[str],
    with_gap: bool = False,
) -> DataFrame:
    """The fused exact-cumulative frame over the per-value counts ``g``:
    one action computes, for every (feature, value), the exact global
    cumulative side counts and side totals — with the per-feature
    cumulative window split into value-ordered UNIFORM buckets so the
    sort/window/term work runs bucket-parallel instead of one task per
    feature.

    Shape: bucket id = floor((value - lo) / (hi - lo) * nb) (a flat
    arithmetic expression from the prescan bounds — deterministic and
    order-preserving, so within-bucket running sums + exact cross-bucket
    prefix offsets reconstruct the EXACT global cumulative counts) →
    running window per (feature, bkt) → the per-bucket totals aggregate
    re-reads the same shuffled exchange (ReuseExchange; the offsets frame
    is O(features x buckets) and broadcasts) → prefix offsets, per-feature
    totals (and, for W1, the next non-empty bucket's minimum — the
    boundary gap) come from tiny windows over that aggregate.

    Returns columns: feature, value, r, t, cr, ct, n, m (+ nxt when
    ``with_gap`` — NULL at the last distinct value of a feature).
    Uniform buckets are a LOAD-BALANCE choice only; any deterministic
    monotone bucketing yields identical statistics (locked by the
    layout/bucketed bit-parity tests)."""
    bucket = F.lit(0)
    for c in feats:
        n, m, lo, hi, nd = prescan[c]
        nb = max(1, min(
            -(-min(nd, n + m) // _CDF_ROWS_PER_BUCKET), _CDF_MAX_BUCKETS
        ))
        if (
            nb > 1
            and lo is not None and hi is not None
            and math.isfinite(lo) and math.isfinite(hi) and hi > lo
        ):
            bc = F.least(
                F.greatest(
                    F.floor(
                        (F.col("value") - F.lit(float(lo)))
                        / F.lit(float(hi - lo)) * F.lit(nb)
                    ).cast("int"),
                    F.lit(0),
                ),
                F.lit(nb - 1),
            )
        else:
            bc = F.lit(0)
        bucket = F.when(F.col("feature") == c, bc).otherwise(bucket)
    gb = g.withColumn("bkt", bucket)

    bt_aggs = [F.sum("r").alias("rs"), F.sum("t").alias("ts")]
    if with_gap:
        bt_aggs.append(F.min("value").alias("mn"))
    bt = gb.groupBy("feature", "bkt").agg(*bt_aggs)
    w_off = (
        Window.partitionBy("feature")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy("feature")
    off_cols = [
        F.col("feature"), F.col("bkt"),
        F.coalesce(F.sum("rs").over(w_off), F.lit(0)).alias("roff"),
        F.coalesce(F.sum("ts").over(w_off), F.lit(0)).alias("toff"),
        F.sum("rs").over(w_tot).alias("n"),
        F.sum("ts").over(w_tot).alias("m"),
    ]
    if with_gap:
        off_cols.append(
            F.lead("mn").over(Window.partitionBy("feature").orderBy("bkt"))
            .alias("nxt_bkt")
        )
    offs = bt.select(*off_cols)

    w_loc = (
        Window.partitionBy("feature", "bkt")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre_cols = [
        F.col("feature"), F.col("bkt"), F.col("value"),
        F.col("r"), F.col("t"),
        F.sum("r").over(w_loc).alias("lcr"),
        F.sum("t").over(w_loc).alias("lct"),
    ]
    if with_gap:
        pre_cols.append(
            F.lead("value")
            .over(Window.partitionBy("feature", "bkt").orderBy("value"))
            .alias("nxt_in")
        )
    pre = gb.select(*pre_cols)

    sel = [
        F.col("feature"), F.col("value"), F.col("r"), F.col("t"),
        (F.col("lcr") + F.col("roff")).alias("cr"),
        (F.col("lct") + F.col("toff")).alias("ct"),
        F.col("n"), F.col("m"),
    ]
    if with_gap:
        sel.append(F.coalesce("nxt_in", "nxt_bkt").alias("nxt"))
    return pre.join(F.broadcast(offs), ["feature", "bkt"]).select(*sel)


def ks_d_all(
    ref_df: DataFrame,
    test_df: DataFrame,
    cols: Sequence[str],
    bucketed_threshold: int = 4_000_000,
    n_buckets: int = 64,
) -> Dict[str, Tuple[float, int, int]]:
    """Exact KS D per feature, fully distributed.

    Plan: ONE light prescan (per-column counts/min/max/HLL — no explode,
    no shuffle) for sample sizes and routing, then ONE fused job: melt
    both sides → union → groupBy(feature, value) pre-aggregate side
    counts (partial agg map-side) → bucket-parallel cumulative windows
    (:func:`_cdf_cum_frame`) → max |cdf_ref - cdf_test|.  D is attained
    at sample points, and the cumulative count at a distinct value equals
    searchsorted(..., side='right'), so this is exactly scipy's
    statistic.

    Features whose approximate distinct count exceeds
    ``bucketed_threshold`` switch to the equal-mass percentile
    decomposition (:func:`_ks_d_bucketed`) — same exact D, robust to
    value-skew where the fused path's uniform buckets could run hot.

    Returns {feature: (d, n_ref, m_test)}.
    """
    if not cols:
        return {}
    prescan = _cdf_prescan(ref_df, test_df, cols, bucketed_threshold)
    nm, fused, big = _cdf_route("ks_d_all", prescan, bucketed_threshold)
    if not fused and not big:
        return {}
    u = _melt(ref_df, cols).withColumn("r", F.lit(1)).withColumn("t", F.lit(0)).unionByName(
        _melt(test_df, cols).withColumn("r", F.lit(0)).withColumn("t", F.lit(1))
    )
    g = u.groupBy("feature", "value").agg(
        F.sum("r").alias("r"), F.sum("t").alias("t")
    )
    out: Dict[str, Tuple[float, int, int]] = {}
    if big:
        # the percentile path runs 3 actions over g — persist it
        g = g.persist()
    try:
        if fused:
            cum = _cdf_cum_frame(
                g.where(F.col("feature").isin(fused)), prescan, fused
            )
            scored = cum.select(
                "feature",
                F.abs(
                    F.col("cr") / F.col("n") - F.col("ct") / F.col("m")
                ).alias("diff"),
            )
            rows = scored.groupBy("feature").agg(F.max("diff").alias("d")).collect()
            out.update(
                {r["feature"]: (float(r["d"]), *nm[r["feature"]]) for r in rows}
            )
        if big:
            out.update(
                _ks_d_bucketed(g.where(F.col("feature").isin(big)), nm, n_buckets)
            )
        return out
    finally:
        if big:
            g.unpersist()


def _ks_d_bucketed(
    g: DataFrame, nm: Dict[str, Tuple[int, int]], n_buckets: int
) -> Dict:
    """Exact D via coarse value-buckets: within-bucket cumulative windows
    run ``n_buckets``-way parallel per feature; exact prefix offsets of
    earlier buckets are added through a broadcast join."""
    import pandas as pd

    spark = g.sparkSession
    probs = [i / n_buckets for i in range(1, n_buckets)]
    edge_rows = g.groupBy("feature").agg(
        F.percentile_approx(
            "value", F.array(*[F.lit(p) for p in probs]), 10_000
        ).alias("edges")
    ).collect()
    bucket = F.lit(0)
    for r in edge_rows:
        b = F.lit(0)
        for e in r["edges"]:
            b = b + (F.col("value") > F.lit(float(e))).cast("int")
        bucket = F.when(F.col("feature") == r["feature"], b).otherwise(bucket)
    bucketed = g.withColumn("bkt", bucket)

    offs_rows = bucketed.groupBy("feature", "bkt").agg(
        F.sum("r").alias("rs"), F.sum("t").alias("ts")
    ).collect()
    per_feat: Dict[str, list] = {}
    for r in offs_rows:
        per_feat.setdefault(r["feature"], []).append(r)
    offs = []
    for feat, rows in per_feat.items():
        roff = toff = 0
        for r in sorted(rows, key=lambda x: x["bkt"]):
            offs.append((feat, int(r["bkt"]), roff, toff))
            roff += int(r["rs"])
            toff += int(r["ts"])
    offs_df = spark.createDataFrame(
        pd.DataFrame(offs, columns=["feature", "bkt", "roff", "toff"])
    )
    nm_df = spark.createDataFrame(
        pd.DataFrame(
            [(f, n, m) for f, (n, m) in nm.items()], columns=["feature", "n", "m"]
        )
    )
    w_cum = (
        Window.partitionBy("feature", "bkt")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = (
        bucketed.select(
            "feature", "bkt",
            F.sum("r").over(w_cum).alias("lcr"),
            F.sum("t").over(w_cum).alias("lct"),
        )
        .join(F.broadcast(offs_df), ["feature", "bkt"])
        .join(F.broadcast(nm_df), "feature")
        .select(
            "feature",
            F.abs(
                (F.col("lcr") + F.col("roff")) / F.col("n")
                - (F.col("lct") + F.col("toff")) / F.col("m")
            ).alias("diff"),
        )
    )
    rows = scored.groupBy("feature").agg(F.max("diff").alias("d")).collect()
    return {r["feature"]: (float(r["d"]), *nm[r["feature"]]) for r in rows}


# ---------------------------------------------------------------------------
# Distributed two-sample Wasserstein-1 (earth-mover) distance
# ---------------------------------------------------------------------------


def wasserstein_all(
    ref_df: DataFrame,
    test_df: DataFrame,
    cols: Sequence[str],
    bucketed_threshold: int = 4_000_000,
    n_buckets: int = 64,
    quantize: int = 9,
) -> Dict[str, Tuple[float, int, int]]:
    """Exact two-sample Wasserstein-1 distance per feature (beyond the
    reference's detector set — W1 is the scale-bearing complement to KS:
    D saturates at 1 while W1 keeps growing with how FAR the mass moved).

    W1 = sum_i |F_ref(v_i) - F_test(v_i)| * (v_{i+1} - v_i) over the
    pooled sorted distinct values — scipy.stats.wasserstein_distance's
    quantile-integral identity on empirical CDFs.

    Same distributed shape as :func:`ks_d_all`: light prescan, then melt
    -> per-value pre-aggregated side counts (map-side combine; the
    shuffle carries only distinct values) -> bucket-parallel cumulative
    windows (:func:`_cdf_cum_frame`, which also carries the cross-bucket
    boundary gap from the next non-empty bucket's minimum), routed to
    the equal-mass percentile decomposition above ``bucketed_threshold``
    distinct values.

    Determinism: each term is rounded to ``quantize`` decimals and summed
    as decimal(38, quantize) — an EXACT, order-independent sum, so the
    result is bit-identical under any layout/parallelism and any
    window-vs-bucketed routing, and engine-portable (DuckDB reproduces
    every rounded term from the same doubles; the float-sum-order flake
    class is structurally impossible).  The <= 0.5e-9 per-term quantum is
    immaterial for a drift statistic.

    Returns {feature: (w1, n_ref, m_test)}; features with no non-null
    values on either side are skipped with a warning (KS convention).
    """
    if not cols:
        return {}
    prescan = _cdf_prescan(ref_df, test_df, cols, bucketed_threshold)
    nm, fused, big = _cdf_route("wasserstein_all", prescan, bucketed_threshold)
    ok = set(fused) | set(big)
    if not ok:
        return {}
    u = _melt(ref_df, cols).withColumn("r", F.lit(1)).withColumn("t", F.lit(0)).unionByName(
        _melt(test_df, cols).withColumn("r", F.lit(0)).withColumn("t", F.lit(1))
    )
    g = u.groupBy("feature", "value").agg(
        F.sum("r").alias("r"), F.sum("t").alias("t")
    )
    out: Dict[str, Tuple[float, int, int]] = {}
    if big:
        g = g.persist()
    try:
        if fused:
            cum = _cdf_cum_frame(
                g.where(F.col("feature").isin(fused)), prescan, fused,
                with_gap=True,
            )
            term = F.abs(
                F.col("cr") / F.col("n") - F.col("ct") / F.col("m")
            ) * (F.col("nxt") - F.col("value"))
            scored = cum.select(
                "feature", _w1_term_quantized(term, quantize).alias("term")
            ).where(F.col("term").isNotNull())
            rows = scored.groupBy("feature").agg(
                F.sum("term").cast("double").alias("w1")
            ).collect()
            out.update(
                {r["feature"]: (float(r["w1"]), *nm[r["feature"]]) for r in rows}
            )
        if big:
            out.update(
                _w1_bucketed(
                    g.where(F.col("feature").isin(big)), nm, n_buckets, quantize
                )
            )
        # a feature whose pooled support is ONE distinct value has no gap
        # rows at all (every lead is null): both samples are the same
        # constant, W1 = 0 by definition
        for f in ok - set(out):
            out[f] = (0.0, *nm[f])
        return out
    finally:
        if big:
            g.unpersist()


def _w1_term_quantized(term, quantize: int):
    """round(term, q) :: decimal(38, q) — the order-independent summand."""
    return F.round(term, quantize).cast(f"decimal(38,{quantize})")


def _w1_bucketed(
    g: DataFrame, nm: Dict[str, Tuple[int, int]], n_buckets: int, quantize: int
) -> Dict:
    """Exact W1 via coarse value-buckets (same decomposition as
    :func:`_ks_d_bucketed`): within-bucket cumulative windows run
    ``n_buckets``-way parallel; exact prefix offsets AND the next
    non-empty bucket's minimum value (the boundary gap) broadcast-join
    back from one tiny per-bucket aggregate."""
    import pandas as pd

    spark = g.sparkSession
    probs = [i / n_buckets for i in range(1, n_buckets)]
    edge_rows = g.groupBy("feature").agg(
        F.percentile_approx(
            "value", F.array(*[F.lit(p) for p in probs]), 10_000
        ).alias("edges")
    ).collect()
    bucket = F.lit(0)
    for r in edge_rows:
        b = F.lit(0)
        for e in r["edges"]:
            b = b + (F.col("value") > F.lit(float(e))).cast("int")
        bucket = F.when(F.col("feature") == r["feature"], b).otherwise(bucket)
    bucketed = g.withColumn("bkt", bucket)

    offs_rows = bucketed.groupBy("feature", "bkt").agg(
        F.sum("r").alias("rs"),
        F.sum("t").alias("ts"),
        F.min("value").alias("mn"),
    ).collect()
    per_feat: Dict[str, list] = {}
    for r in offs_rows:
        per_feat.setdefault(r["feature"], []).append(r)
    offs = []
    for feat, rows in per_feat.items():
        rows = sorted(rows, key=lambda x: x["bkt"])
        roff = toff = 0
        for i, r in enumerate(rows):
            nxt = float(rows[i + 1]["mn"]) if i + 1 < len(rows) else None
            offs.append((feat, int(r["bkt"]), roff, toff, nxt))
            roff += int(r["rs"])
            toff += int(r["ts"])
    # explicit schema (NOT via pandas): the last bucket's next_v must be a
    # real SQL NULL for coalesce(), not the NaN a float ndarray would carry
    offs_df = spark.createDataFrame(
        offs, "feature string, bkt int, roff long, toff long, next_v double"
    )
    nm_df = spark.createDataFrame(
        pd.DataFrame(
            [(f, n, m) for f, (n, m) in nm.items()], columns=["feature", "n", "m"]
        )
    )
    w_cum = (
        Window.partitionBy("feature", "bkt")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_ord = Window.partitionBy("feature", "bkt").orderBy("value")
    pre = bucketed.select(
        "feature", "bkt", "value",
        F.sum("r").over(w_cum).alias("lcr"),
        F.sum("t").over(w_cum).alias("lct"),
        F.lead("value").over(w_ord).alias("nxt_in"),
    )
    term = F.abs(
        (F.col("lcr") + F.col("roff")) / F.col("n")
        - (F.col("lct") + F.col("toff")) / F.col("m")
    ) * (F.coalesce("nxt_in", "next_v") - F.col("value"))
    scored = (
        pre.join(F.broadcast(offs_df), ["feature", "bkt"])
        .join(F.broadcast(nm_df), "feature")
        .select("feature", _w1_term_quantized(term, quantize).alias("term"))
        .where(F.col("term").isNotNull())
    )
    rows = scored.groupBy("feature").agg(
        F.sum("term").cast("double").alias("w1")
    ).collect()
    return {r["feature"]: (float(r["w1"]), *nm[r["feature"]]) for r in rows}


# ---------------------------------------------------------------------------
# Distributed two-sample Cramér–von Mises + Anderson–Darling (one fused job)
# ---------------------------------------------------------------------------


def cvm_ad_all(
    ref_df: DataFrame,
    test_df: DataFrame,
    cols: Sequence[str],
    bucketed_threshold: int = 4_000_000,
    n_buckets: int = 64,
    quantize: int = 18,
) -> Dict[str, Tuple[float, float, int, int]]:
    """Exact two-sample Cramér–von Mises T and Anderson–Darling A² per
    feature, fused in ONE job (beyond the reference's detector set — both
    are CDF functionals that weight the WHOLE curve where KS takes only
    the max gap; AD additionally up-weights the tails, catching
    tail-drift KS and PSI dilute away).

    Tie-aware definitions over the pooled distinct values v_j with side
    multiplicities (r_j, t_j), l_j = r_j + t_j, cumulative (cr_j, ct_j),
    B_j = cr_j + ct_j, d_j = cr_j/n - ct_j/m, N = n + m:

        T  = (n*m/N^2) * sum_j l_j * d_j^2
        A² = n*m * sum_{j: B_j < N} l_j * d_j^2 / (B_j * (N - B_j))

    T equals Anderson's (1962) rank identity U/(nmN) - (4nm-1)/(6N) and
    A² equals Pettitt's (1976) two-sample statistic on tie-free data
    (both verified numerically in tests/test_divergences.py); with ties
    they are the Scholz–Stephens (1987) k=2 discrete forms.  Note
    A²'s per-term factor n*m*d_j² is used instead of the textbook
    (N*cr_j - n*B_j)² — algebraically identical, but free of the giant-
    integer cancellation that would overflow/lose precision at 10^12
    rows.

    Same distributed shape and determinism contract as
    :func:`wasserstein_all`: light prescan -> melt -> per-value pre-agg
    -> bucket-parallel cumulative windows (:func:`_cdf_cum_frame`;
    equal-mass percentile decomposition above ``bucketed_threshold``
    distinct values — no boundary gap needed here, only exact prefix
    offsets), every term rounded to ``quantize`` decimals and summed as
    decimal(38, quantize) — order-independent, bit-identical under any
    layout/routing, engine-portable to DuckDB.

    ``quantize`` defaults to 18 (not W1's 9): these terms SQUARE the CDF
    gap, so on tie-free continuous data the null per-term magnitude is
    ~1/(4N) — a 9-decimal quantum zeroes every term past N ~ 5e8, the
    exact scale this path exists for.  At 18 decimals terms survive to
    N ~ 5e17 and decimal(38,18)'s 1e20 integer headroom still holds the
    bounded totals (T <= nm/N <= N/4, A² similar); worst-case absolute
    quantization error stays 0.5e-18 per pooled distinct value.

    Returns {feature: (cvm, ad, n_ref, m_test)}; features empty on either
    side are skipped with a warning (KS convention).
    """
    if not cols:
        return {}
    prescan = _cdf_prescan(ref_df, test_df, cols, bucketed_threshold)
    nm, fused, big = _cdf_route("cvm_ad_all", prescan, bucketed_threshold)
    if not fused and not big:
        return {}
    u = _melt(ref_df, cols).withColumn("r", F.lit(1)).withColumn("t", F.lit(0)).unionByName(
        _melt(test_df, cols).withColumn("r", F.lit(0)).withColumn("t", F.lit(1))
    )
    g = u.groupBy("feature", "value").agg(
        F.sum("r").alias("r"), F.sum("t").alias("t")
    )
    out: Dict[str, Tuple[float, float, int, int]] = {}
    if big:
        g = g.persist()
    try:
        if fused:
            cum = _cdf_cum_frame(
                g.where(F.col("feature").isin(fused)), prescan, fused
            )
            cvm, ad = _cvm_ad_terms(
                F.col("cr"), F.col("ct"),
                F.col("r"), F.col("t"),
                F.col("n"), F.col("m"),
                quantize,
            )
            rows = (
                cum.select("feature", cvm.alias("cvm"), ad.alias("ad"))
                .groupBy("feature")
                .agg(
                    F.sum("cvm").cast("double").alias("cvm"),
                    F.sum("ad").cast("double").alias("ad"),
                )
                .collect()
            )
            out.update({
                r["feature"]: (float(r["cvm"]), float(r["ad"]), *nm[r["feature"]])
                for r in rows
            })
        if big:
            out.update(
                _cvm_ad_bucketed(
                    g.where(F.col("feature").isin(big)), nm, n_buckets, quantize
                )
            )
        return out
    finally:
        if big:
            g.unpersist()


def _cvm_ad_terms(cr, ct, rl, tl, n, m, quantize: int):
    """The two quantized summands from cumulative/side columns.

    Expression shape is mirrored VERBATIM by the DuckDB oracle
    (__spark_entry__._cvm_ad_sql): same operand order, all double ops —
    IEEE doubles make identical trees bit-identical across engines, and
    the decimal sum makes the total order-independent.  Giant products
    (n*m, B*(N-B), N*N at 10^12 rows overflow BIGINT under ANSI) are
    defused by an explicit double cast on the left operand.
    """
    l = rl + tl
    big_n = n + m
    b = cr + ct
    d = cr / n - ct / m
    ld2 = l * d * d
    cvm = ld2 * n.cast("double") * m / (big_n.cast("double") * big_n)
    ad = F.when(
        b < big_n,
        ld2 * n.cast("double") * m / (b.cast("double") * (big_n - b)),
    ).otherwise(F.lit(0.0))
    return (
        _w1_term_quantized(cvm, quantize),
        _w1_term_quantized(ad, quantize),
    )


def _cvm_ad_bucketed(
    g: DataFrame, nm: Dict[str, Tuple[int, int]], n_buckets: int, quantize: int
) -> Dict:
    """Exact CvM/AD via the :func:`_w1_bucketed` decomposition, minus the
    boundary gap (these statistics have no value-gap factor): within-
    bucket cumulative windows run ``n_buckets``-way parallel and the
    exact prefix offsets broadcast back from one tiny per-bucket
    aggregate."""
    import pandas as pd

    spark = g.sparkSession
    probs = [i / n_buckets for i in range(1, n_buckets)]
    edge_rows = g.groupBy("feature").agg(
        F.percentile_approx(
            "value", F.array(*[F.lit(p) for p in probs]), 10_000
        ).alias("edges")
    ).collect()
    bucket = F.lit(0)
    for r in edge_rows:
        b = F.lit(0)
        for e in r["edges"]:
            b = b + (F.col("value") > F.lit(float(e))).cast("int")
        bucket = F.when(F.col("feature") == r["feature"], b).otherwise(bucket)
    bucketed = g.withColumn("bkt", bucket)

    offs_rows = bucketed.groupBy("feature", "bkt").agg(
        F.sum("r").alias("rs"), F.sum("t").alias("ts")
    ).collect()
    per_feat: Dict[str, list] = {}
    for r in offs_rows:
        per_feat.setdefault(r["feature"], []).append(r)
    offs = []
    for feat, rows in per_feat.items():
        rows = sorted(rows, key=lambda x: x["bkt"])
        roff = toff = 0
        for r in rows:
            offs.append((feat, int(r["bkt"]), roff, toff))
            roff += int(r["rs"])
            toff += int(r["ts"])
    offs_df = spark.createDataFrame(
        offs, "feature string, bkt int, roff long, toff long"
    )
    nm_df = spark.createDataFrame(
        pd.DataFrame(
            [(f, n, m) for f, (n, m) in nm.items()], columns=["feature", "n", "m"]
        )
    )
    w_cum = (
        Window.partitionBy("feature", "bkt")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = bucketed.select(
        "feature", "bkt", "r", "t",
        F.sum("r").over(w_cum).alias("lcr"),
        F.sum("t").over(w_cum).alias("lct"),
    )
    cvm, ad = _cvm_ad_terms(
        F.col("lcr") + F.col("roff"), F.col("lct") + F.col("toff"),
        F.col("r"), F.col("t"),
        F.col("n"), F.col("m"),
        quantize,
    )
    rows = (
        pre.join(F.broadcast(offs_df), ["feature", "bkt"])
        .join(F.broadcast(nm_df), "feature")
        .select("feature", cvm.alias("cvm"), ad.alias("ad"))
        .groupBy("feature")
        .agg(
            F.sum("cvm").cast("double").alias("cvm"),
            F.sum("ad").cast("double").alias("ad"),
        )
        .collect()
    )
    return {
        r["feature"]: (float(r["cvm"]), float(r["ad"]), *nm[r["feature"]])
        for r in rows
    }


# ---------------------------------------------------------------------------
# Quantile-shift report (where did the distribution move, and by how much)
# ---------------------------------------------------------------------------

DEFAULT_SHIFT_PROBS = (0.01, 0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99)


def percentiles_by_column(
    df: DataFrame, cols: Sequence[str], probs: Sequence[float], exact: bool = True
) -> Dict[str, Optional[list]]:
    """One aggregation pass of per-column percentiles at ``probs`` —
    exact pandas-parity interpolation (``F.percentile``, the
    quantile_edges contract) or the Greenwald-Khanna sketch for the
    scale where an exact distributed percentile is unrealistic (GK
    returns true DATA POINTS, never interpolated values).  All-null
    columns map to None.  Shared by quantile_shift_report and
    profile.outlier_report — one definition of the exact/sketch switch.
    """
    if exact:
        arr = F.array(*[F.lit(float(p)) for p in probs])
        row = df.agg(*[F.percentile(nn(c), arr).alias(c) for c in cols]).first()
        return {c: (list(row[c]) if row[c] is not None else None) for c in cols}
    raw = df.approxQuantile(list(cols), [float(p) for p in probs], 1e-4)
    return {c: (list(v) if len(v) else None) for c, v in zip(cols, raw)}


def quantile_shift_report(
    ref_df: DataFrame,
    test_df: DataFrame,
    cols: Sequence[str],
    probs: Sequence[float] = DEFAULT_SHIFT_PROBS,
    exact: bool = True,
) -> Dict[str, list]:
    """Per-feature quantile table: WHERE the distribution moved and by how
    much — the human-legible companion to the scalar drift statistics
    (a KS D or CvM T says "drifted"; this says "the upper tail moved
    +12% of an IQR while the median held").

    ONE exact-percentile aggregation per side for ALL features and probs
    (same pandas-parity linear interpolation as :func:`quantile_edges` —
    engine-portable to DuckDB's ``quantile_cont``); ``exact=False``
    switches to the Greenwald-Khanna sketch path for the 100 TB scale,
    where an exact distributed sort per feature is not realistic.

    Returns ``{feature: [(prob, ref_q, test_q, shift, shift_iqr), ...]}``
    with ``shift = test_q - ref_q`` and ``shift_iqr = shift / ref IQR``
    (None when the reference IQR is 0 — the explicit degenerate semantic,
    never a division error under ANSI).  The reference IQR uses the exact
    0.25/0.75 percentiles regardless of ``probs``.  Features empty on
    either side are skipped with a warning (KS convention).
    """
    probs = [float(p) for p in probs]
    if not cols or not probs:
        return {}
    if any(p < 0 or p > 1 for p in probs):
        raise ValueError(f"probs must lie in [0, 1], got {probs}")
    want = sorted(set(probs) | {0.25, 0.75})
    ref_q = percentiles_by_column(ref_df, cols, want, exact)
    test_q = percentiles_by_column(test_df, cols, want, exact)
    idx = {p: i for i, p in enumerate(want)}
    out: Dict[str, list] = {}
    skipped = []
    for c in cols:
        r, t = ref_q.get(c), test_q.get(c)
        if r is None or t is None:
            skipped.append(c)
            continue
        iqr = float(r[idx[0.75]]) - float(r[idx[0.25]])
        rows = []
        for p in probs:
            rq, tq = float(r[idx[p]]), float(t[idx[p]])
            shift = tq - rq
            rows.append(
                (p, rq, tq, shift, (shift / iqr) if iqr > 0 else None)
            )
        out[c] = rows
    if skipped:
        logger.warning(
            "quantile_shift_report: no non-null values on one side for %s "
            "— skipped", sorted(skipped),
        )
    return out


def category_shift_report(
    ref_df: DataFrame,
    test_df: DataFrame,
    cols: Sequence[str],
    top_k: Optional[int] = None,
    max_categories: int = 10_000,
) -> DataFrame:
    """Per-category proportion shift — the categorical companion to
    :func:`quantile_shift_report` (a chi2 says "composition drifted";
    this says "category X gained 4 points, Y lost 3").

    ONE scan: both sides melt with a side tag into one groupBy(feature,
    category) — categories absent from a side get proportion 0 via the
    fused conditional sums, so appearing/disappearing categories are
    first-class rows.  NULL category is kept as an explicit row (a null
    surge IS composition drift).  Cardinality guard: features whose
    category count exceeds ``max_categories`` are dropped with a warning
    (the chi2_by_partition convention — a free-text column is not a
    categorical feature).  ``top_k`` keeps the largest absolute deltas
    per feature.

    Returns (feature, category string, n_ref, n_test, ref_prop,
    test_prop, delta) — proportions over each side's TOTAL rows for the
    feature (nulls included in the denominator, matching the explicit
    null rows).
    """
    if not cols:
        return ref_df.sparkSession.createDataFrame(
            [], "feature string, category string, n_ref long, n_test long, "
                "ref_prop double, test_prop double, delta double",
        )

    def melt(df, tag):
        structs = [
            F.struct(
                F.lit(c).alias("feature"),
                F.col(c).cast("string").alias("category"),
            )
            for c in cols
        ]
        return df.select(F.explode(F.array(*structs)).alias("fc")).select(
            "fc.feature", "fc.category", F.lit(tag).alias("is_ref")
        )

    u = melt(ref_df, 1).unionByName(melt(test_df, 0))
    g = u.groupBy("feature", "category").agg(
        F.sum("is_ref").alias("n_ref"),
        F.sum(1 - F.col("is_ref")).alias("n_test"),
    )
    # cardinality guard BEFORE any window: one partial-agg count
    card = g.groupBy("feature").agg(F.count(F.lit(1)).alias("nc"))
    over = [r["feature"] for r in card.where(F.col("nc") > max_categories).collect()]
    if over:
        logger.warning(
            "category_shift_report: dropping %s — category count exceeds "
            "max_categories=%d (not a categorical feature)",
            sorted(over), max_categories,
        )
        g = g.where(~F.col("feature").isin(over))

    w = Window.partitionBy("feature")
    ref_prop = F.try_divide(F.col("n_ref"), F.sum("n_ref").over(w))
    test_prop = F.try_divide(F.col("n_test"), F.sum("n_test").over(w))
    out = g.select(
        "feature",
        "category",
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_test").cast("long").alias("n_test"),
        ref_prop.alias("ref_prop"),
        test_prop.alias("test_prop"),
        (F.coalesce(test_prop, F.lit(0.0)) - F.coalesce(ref_prop, F.lit(0.0))
         ).alias("delta"),
    )
    if top_k is not None:
        wk = Window.partitionBy("feature").orderBy(
            F.abs(F.col("delta")).desc(), F.col("category").asc_nulls_last()
        )
        out = (
            out.withColumn("__rk", F.row_number().over(wk))
            .where(F.col("__rk") <= top_k)
            .drop("__rk")
        )
    return out


def correlation_drift(
    ref_df: DataFrame, test_df: DataFrame, cols: Sequence[str]
) -> Dict[Tuple[str, str], Tuple[Optional[float], Optional[float], Optional[float]]]:
    """Pairwise Pearson-correlation shift between reference and test —
    the drift mode every univariate statistic is blind to (two features
    whose marginals hold but whose RELATIONSHIP flips).

    ONE aggregation per side computes all d*(d-1)/2 pair correlations as
    fused ``corr`` expressions (sample correlation, pairwise NULL/NaN
    deletion — the SQL semantic on both engines).  O(d²) expressions in
    one scan: fine to a few dozen columns; wider matrices belong to
    pyspark.ml.stat.Correlation's vector path.

    Returns ``{(col_a, col_b): (ref_r, test_r, delta)}`` with None where
    a correlation is undefined (constant column) — and delta None if
    either side is.
    """
    cols = list(cols)
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    if not pairs:
        return {}

    def side(df):
        # ANSI guard (Spark 4 default): F.corr aborts with DIVIDE_BY_ZERO
        # whenever the PAIRWISE-non-null overlap has zero variance — a
        # marginal-stddev probe cannot see that (x varies overall but is
        # constant exactly where y is non-null), so corr is computed
        # manually: centered conditional sums + try_divide.  Centering at
        # the marginal means (one tiny probe agg) keeps the two-pass
        # formula well-conditioned; Pearson r is shift-invariant, so any
        # constant center gives the identical value.
        probe = df.agg(
            *[F.stddev(nn(c)).alias(f"s\x00{c}") for c in cols],
            *[F.avg(nn(c)).alias(f"m\x00{c}") for c in cols],
        ).first()
        live = [
            p for p in pairs
            if (probe[f"s\x00{p[0]}"] or 0) > 0
            and (probe[f"s\x00{p[1]}"] or 0) > 0
        ]
        out = {p: None for p in pairs}
        if not live:
            return out
        aggs = []
        for a, b in live:
            va, vb = nn(a), nn(b)
            valid = va.isNotNull() & vb.isNotNull()
            ca = F.when(valid, va - F.lit(float(probe[f"m\x00{a}"])))
            cb = F.when(valid, vb - F.lit(float(probe[f"m\x00{b}"])))
            k = f"{a}\x00{b}"
            aggs += [
                F.sum(valid.cast("long")).alias(f"n\x00{k}"),
                F.sum(ca).alias(f"sa\x00{k}"),
                F.sum(cb).alias(f"sb\x00{k}"),
                F.sum(ca * ca).alias(f"saa\x00{k}"),
                F.sum(cb * cb).alias(f"sbb\x00{k}"),
                F.sum(ca * cb).alias(f"sab\x00{k}"),
            ]
        row = df.agg(*aggs).first()
        for a, b in live:
            k = f"{a}\x00{b}"
            n = row[f"n\x00{k}"]
            if not n:
                continue  # no pairwise overlap: undefined, stays None
            sa, sb = row[f"sa\x00{k}"], row[f"sb\x00{k}"]
            num = row[f"sab\x00{k}"] - sa * sb / n
            vara = max(row[f"saa\x00{k}"] - sa * sa / n, 0.0)
            varb = max(row[f"sbb\x00{k}"] - sb * sb / n, 0.0)
            den = math.sqrt(vara * varb)
            # zero-variance OVERLAP (or n == 1): undefined, stays None —
            # the explicit degenerate semantic, never an ANSI abort
            if den > 0:
                out[(a, b)] = num / den
        return out

    r, t = side(ref_df), side(test_df)
    out = {}
    for p in pairs:
        rr, tt = r[p], t[p]
        delta = (tt - rr) if (rr is not None and tt is not None) else None
        out[p] = (rr, tt, delta)
    return out


# ---------------------------------------------------------------------------
# Moment statistics (localizer dist_info; population std == np.std ddof=0)
# ---------------------------------------------------------------------------


def moment_stats(df: DataFrame, cols: Sequence[str]) -> Dict[str, Tuple[float, float]]:
    """{col: (mean, population_std)} in one pass — matches np.mean/np.std
    on dropna'd values (univariate.py:59-67)."""
    if not cols:
        return {}
    aggs = []
    for c in cols:
        aggs.append(F.mean(nn(c)).alias(f"{c}__mean"))
        aggs.append(F.stddev_pop(nn(c)).alias(f"{c}__std"))
    row = df.agg(*aggs).first()
    return {
        c: (
            float(row[f"{c}__mean"]) if row[f"{c}__mean"] is not None else float("nan"),
            float(row[f"{c}__std"]) if row[f"{c}__std"] is not None else float("nan"),
        )
        for c in cols
    }


def mode_of(df: DataFrame, col: str) -> Optional[str]:
    """Most frequent non-null value; ties broken by smallest value
    (pandas ``mode()[0]`` parity, univariate.py:115-116)."""
    r = (
        df.where(F.col(col).isNotNull())
        .groupBy(col)
        .count()
        .orderBy(F.desc("count"), F.asc(col))
        .first()
    )
    return r[col] if r else None
