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
