"""content_keyed_top_n: exact equality with the naive plan, bounded merge."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from driftspark.sampling import _MIN_LONG, content_keyed_top_n


@pytest.fixture(scope="module")
def table(spark):
    pdf = pd.DataFrame(
        {"k": range(20000), "v": [i * 7 % 1000 / 3.0 for i in range(20000)]}
    )
    return spark.createDataFrame(pdf).repartition(16).cache()


def _naive(df, n):
    return [
        tuple(r)
        for r in df.orderBy(F.xxhash64("k", "v"), "k", "v").limit(n).collect()
    ]


def test_equals_naive_plan(table):
    got = [
        tuple(r)
        for r in content_keyed_top_n(
            table, 100, F.xxhash64("k", "v"), ["k", "v"]
        ).collect()
    ]
    assert got == _naive(table, 100)


def test_merge_input_is_bounded(table):
    """The pre-filter must cut candidates to ~margin*n (the whole point:
    the naive TakeOrdered merge sees n_partitions*n rows; ours sees the
    filter's survivors only)."""
    n, margin, total = 100, 8.0, table.count()
    threshold = _MIN_LONG + int(margin * n / total * float(1 << 64))
    survivors = table.where(F.xxhash64("k", "v") < F.lit(threshold)).count()
    assert n <= survivors <= 4 * margin * n  # uniform hash: ~margin*n
    # and the bounded plan actually contains that filter
    df = content_keyed_top_n(table, n, F.xxhash64("k", "v"), ["k", "v"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan and "Filter" in plan


def test_undershoot_falls_back_to_full_scan(table):
    """A margin too small to keep n survivors must not lose rows — the
    verified-count guard falls back to the unfiltered scan."""
    got = [
        tuple(r)
        for r in content_keyed_top_n(
            table, 100, F.xxhash64("k", "v"), ["k", "v"], margin=1e-7
        ).collect()
    ]
    assert got == _naive(table, 100)


def test_small_table_passes_through_ordered(table):
    small = table.limit(50)
    got = [
        tuple(r)
        for r in content_keyed_top_n(
            small, 100, F.xxhash64("k", "v"), ["k", "v"]
        ).collect()
    ]
    assert len(got) == 50
    assert got == _naive(small, 100)


def test_layout_invariance(table):
    a = content_keyed_top_n(
        table.repartition(3), 64, F.xxhash64("k", "v"), ["k", "v"]
    ).collect()
    b = content_keyed_top_n(
        table.repartition(29), 64, F.xxhash64("k", "v"), ["k", "v"]
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def _naive_per_group(df, n, group_cols):
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(
        F.xxhash64("k", "v"), F.col("k"), F.col("v")
    )
    return sorted(
        tuple(r)
        for r in df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
        .collect()
    )


def test_per_group_equals_naive_window(spark):
    from driftspark.sampling import content_keyed_top_n_per_group

    rows = []
    # one hot group (3000 rows), two medium, one smaller than n
    for i in range(3000):
        rows.append(("hot", i, float(i % 97)))
    for g in ("m1", "m2"):
        for i in range(400):
            rows.append((g, 10_000 + i, float(i)))
    for i in range(7):
        rows.append(("tiny", 50_000 + i, float(i)))
    df = spark.createDataFrame(rows, "g string, k long, v double")

    got = sorted(
        tuple(r)
        for r in content_keyed_top_n_per_group(
            df, 25, F.xxhash64("k", "v"), ["g"],
            tiebreaks=[F.col("k"), F.col("v")],
        ).collect()
    )
    assert got == _naive_per_group(df, 25, ["g"])
    # per-group sizes: min(n, group size)
    from collections import Counter

    sizes = Counter(g for g, _, _ in got)
    assert sizes == {"hot": 25, "m1": 25, "m2": 25, "tiny": 7}

    # layout invariance
    got2 = sorted(
        tuple(r)
        for r in content_keyed_top_n_per_group(
            df.repartition(17), 25, F.xxhash64("k", "v"), ["g"],
            tiebreaks=[F.col("k"), F.col("v")],
        ).collect()
    )
    assert got2 == got


def test_per_group_undershoot_fallback_exact(spark):
    """A degenerate hash range (all hashes at the top of the range) makes
    every group undershoot the threshold pre-filter; the fallback must
    still return exactly the naive per-group top-n."""
    from pyspark.sql import Window

    from driftspark.sampling import content_keyed_top_n_per_group

    rows = [("a", i) for i in range(200)] + [("b", i) for i in range(300, 450)]
    df = spark.createDataFrame(rows, "g string, k long")
    # constant-ish positive hash (top of the declared range): pre-filter
    # keeps nothing, the rescue path restores each group's full rows
    h = (F.col("k") % 5).cast("long") + F.lit((1 << 40))
    got = sorted(
        tuple(r)
        for r in content_keyed_top_n_per_group(
            df, 10, h, ["g"], tiebreaks=[F.col("k")],
            hash_range=(0, (1 << 41)),
        ).collect()
    )
    w = Window.partitionBy("g").orderBy(h, F.col("k"))
    exp = sorted(
        tuple(r)
        for r in df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 10)
        .drop("__rn")
        .collect()
    )
    assert got == exp and len(got) == 20
