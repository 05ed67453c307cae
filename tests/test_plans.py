"""Physical-plan assertions: the optimizations the engine relies on at
10^12-row scale must actually appear in the plans (predicate pushdown,
column pruning, broadcast joins, map-side partial aggregation,
whole-stage codegen)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from driftspark.constraints import referential_violations, uniqueness_violations
from driftspark.profile import profile_columns
from driftspark.stats import bucket_expr, histogram_proportions, ks_d_all


@pytest.fixture(scope="module")
def li(spark):
    return spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_parquet_scan(li):
    df = li.where(F.col("l_quantity") > 30).select("l_quantity")
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "GreaterThan(l_quantity" in plan


def test_column_pruning_in_profile(li):
    prof = profile_columns(li, columns=["l_quantity"], group_cols=["l_returnflag"])
    plan = _plan(prof)
    # ReadSchema carries only the needed columns, not all 11
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_quantity" in read_schema and "l_returnflag" in read_schema
    assert "l_extendedprice" not in read_schema
    assert "l_comment" not in read_schema


def test_histogram_single_scan_partial_agg(spark, li):
    ref = li.where("l_orderkey % 2 = 0")
    test = li.where("l_orderkey % 2 = 1")
    u = ref.select("l_quantity").withColumn("__side", F.lit("ref")).unionByName(
        test.select("l_quantity").withColumn("__side", F.lit("test"))
    )
    edges = np.array([1.0, 10.0, 25.0, 50.0])
    b = bucket_expr("l_quantity", edges)
    agg = u.groupBy("__side").agg(
        F.sum(F.when(b == 0, 1).otherwise(0)).alias("b0"), F.count(b).alias("t")
    )
    plan = _plan(agg)
    # hash aggregation runs partial then final (map-side combine): only the
    # tiny aggregate state crosses the exchange, never row data
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan
    assert "Exchange hashpartitioning" in plan
    # after execution the finalized plan runs inside whole-stage codegen
    # (the "*(n)" prefix marks codegen stages in the plan string)
    agg.collect()
    final = _plan(agg)
    assert "isFinalPlan=true" in final
    assert "*(" in final


def test_referential_join_broadcasts_small_parent(spark, li):
    part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    v = referential_violations(li, "l_partkey", part, "p_partkey")
    plan = _plan(v)
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan


def test_uniqueness_violation_join_broadcasts_dup_keys(li):
    v = uniqueness_violations(li.select("l_orderkey"), ["l_orderkey"])
    plan = _plan(v)
    assert "BroadcastHashJoin" in plan  # dup-key set is broadcast


def test_ks_window_partitioned_not_global(spark, li):
    ref = li.where("l_orderkey % 2 = 0")
    test = li.where("l_orderkey % 2 = 1")
    # construct the lazy plan only (no action) and inspect
    from driftspark.stats import _melt
    from pyspark.sql import Window

    u = _melt(ref, ["l_quantity", "l_tax"]).withColumn("r", F.lit(1)).withColumn(
        "t", F.lit(0)
    )
    g = u.groupBy("feature", "value").agg(F.sum("r").alias("r"))
    w = (
        Window.partitionBy("feature")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = g.select("feature", F.sum("r").over(w).alias("c"))
    plan = _plan(scored)
    # the cumulative window is partitioned by feature — no single-partition
    # global window (which would serialize the whole table through one task)
    assert "Window" in plan
    assert "SinglePartition" not in plan


def test_detectors_never_use_row_udfs(spark, li):
    """No BatchEvalPython (row-at-a-time Python UDF) in any detector plan;
    only ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas allowed."""
    ref = li.where("l_orderkey % 2 = 0").select("l_quantity", "l_tax")
    test = li.where("l_orderkey % 2 = 1").select("l_quantity", "l_tax")
    from driftspark.stats import quantile_edges

    edges = quantile_edges(ref, ["l_quantity"], 5)
    # PSI histogram plan
    u = ref.withColumn("__side", F.lit("r")).unionByName(
        test.withColumn("__side", F.lit("t"))
    )
    b = bucket_expr("l_quantity", edges["l_quantity"])
    agg = u.groupBy("__side").agg(F.sum(F.when(b == 0, 1).otherwise(0)).alias("x"))
    assert "BatchEvalPython" not in _plan(agg)

    # hallucination Mahalanobis scoring plan is Arrow-vectorized
    import pandas as pd

    from driftspark import SparkDataset
    from driftspark.detectors.hallucination import HallucinationRiskDetector

    det = HallucinationRiskDetector()
    det.fit(SparkDataset(ref))
    tds = SparkDataset(
        test.withColumn("proba", F.lit(0.9)), feature_cols=["l_quantity", "l_tax"], proba_col="proba"
    )
    res = det.detect(tds)
    plan = _plan(res.rows)
    assert "BatchEvalPython" not in plan
    assert ("ArrowEvalPython" in plan) or ("MapInPandas" in plan)


def test_fused_psi_melt_single_scan_partial_agg(spark, li):
    """The fused detect plan (numeric bins + categoricals in one
    explode-melt aggregation) keeps map-side partial aggregation and
    never leaves whole-stage codegen for a Python UDF."""
    from driftspark.stats import bucket_expr as be  # noqa: F401

    ref = li.where(F.col("l_orderkey") % 2 == 0)
    test = li.where(F.col("l_orderkey") % 2 == 1)
    edges = {"l_quantity": np.linspace(1, 50, 11)}
    structs = [
        F.struct(F.lit("#n:l_quantity").alias("feature"),
                 be("l_quantity", edges["l_quantity"]).cast("string").alias("key")),
        F.struct(F.lit("#c:l_returnflag").alias("feature"),
                 F.col("l_returnflag").cast("string").alias("key")),
    ]

    def melt(df, is_ref):
        return (df.select(F.explode(F.array(*structs)).alias("fk"))
                .select("fk.feature", "fk.key")
                .where(F.col("key").isNotNull())
                .withColumn("r", F.lit(1 if is_ref else 0))
                .withColumn("t", F.lit(0 if is_ref else 1)))

    agg = (melt(ref, True).unionByName(melt(test, False))
           .groupBy("feature", "key")
           .agg(F.sum("r").alias("r"), F.sum("t").alias("t")))
    plan = _plan(agg)
    # partial aggregation before the exchange, final after
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan or "partial" in plan.lower()
    assert "BatchEvalPython" not in plan  # AQE wraps codegen pre-execution


def test_supplier_rollup_broadcasts_dimensions(spark):
    s = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
    n = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    r = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    j = (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
         .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
         .groupBy("r_name").agg(F.count(F.lit(1)).alias("c")))
    plan = _plan(j)
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_thinned_ecdf_offsets_join_broadcasts(spark):
    """The over-cap branch of _ref_ecdf_points joins tiny offset frames
    in broadcast — the distinct-value side must never shuffle for them."""
    import pandas as pd

    from driftspark.verdicts import _ref_ecdf_points

    rng = np.random.RandomState(1)
    pdf = pd.DataFrame({"feature": "f", "value": rng.normal(size=3000)})
    ref_g = (spark.createDataFrame(pdf)
             .groupBy("feature", "value").agg(F.count(F.lit(1)).alias("c")))
    # run it (over-cap) — correctness covered elsewhere; here we only
    # assert it completes with the bounded driver collect
    ecdf = _ref_ecdf_points(ref_g, 200, n_buckets=8)
    assert len(ecdf["f"][0]) <= 201


def test_constraint_broadcast_probes_never_move_rows(spark, li):
    """Broadcast-vs-shuffle probes must not funnel rows through one task
    (a limit(n+1).count() probe's GlobalLimit does exactly that — measured
    ~10% regression on the 10M-row validation job):

    - uniqueness_check decides from the report row it computes anyway
      (zero extra probe jobs; report returns as a local one-row frame);
    - referential_violations sizes the parent with approx_count_distinct —
      the probe plan is a partial/final HLL agg, no Limit, no distinct
      Exchange of the key rows."""
    from driftspark.constraints import uniqueness_check

    report, violations = uniqueness_check(li.select("l_orderkey"), ["l_orderkey"])
    row = report.first()
    assert row["n_dup_keys"] > 0 and not row["unique_ok"]
    assert "BroadcastHashJoin" in _plan(violations)
    # the returned report is already-materialized local data: no exchange
    assert "Exchange" not in _plan(report)

    probe = li.agg(F.approx_count_distinct("l_orderkey").alias("n"))
    probe_plan = _plan(probe)
    assert "approx_count_distinct" in probe_plan
    assert "Limit" not in probe_plan


def test_ivf_probe_prunes_partitions(spark, tmp_path):
    """The IVF 100TB story: persist the assigned table PARTITIONED BY
    centroid_id — a probe of n_probe cells then reads only those
    partitions (PartitionFilters on centroid_id in the parquet scan, no
    full-table scan)."""
    import numpy as np
    import pandas as pd

    from driftspark.ann import IVFIndex, seed_centroids

    rng = np.random.RandomState(3)
    pdf = pd.DataFrame({
        "vec_id": np.arange(400),
        "embedding": [rng.normal(size=8).tolist() for _ in range(400)],
    })
    df = spark.createDataFrame(pdf)
    idx = IVFIndex(n_centroids=8, seed=42)
    idx.centroids = seed_centroids(8, 8, 42)
    path = str(tmp_path / "ivf")
    idx.assign(df, "embedding").write.partitionBy("centroid_id").parquet(path)

    assigned = spark.read.parquet(path)
    q = rng.normal(size=8).tolist()
    top = idx.search(assigned, "vec_id", "embedding", q, k=5, n_probe=2)
    plan = _plan(top)
    cells = idx.probe_cells(q, 2)
    # the isin filter must reach the scan as a partition filter
    assert "PartitionFilters" in plan
    import re
    pf = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert pf and "centroid_id" in pf.group(1), plan[:2000]
    got = top.collect()
    assert 0 < len(got) <= 5
    assert all(r["centroid_id"] in cells for r in got)


def test_embedding_drift_agg_no_explode_partial_agg(spark):
    """The per-dimension moment aggregation is one scan with map-side
    partial aggregation — no Generate (posexplode) of n x dim element
    rows ever appears in the plan."""
    from driftspark.ann import _embedding_moment_frame

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    tagged = (
        emb.where(F.col("vec_id") % 2 == 0)
        .select(F.lit(0).alias("__side"), F.col("embedding").alias("__v"))
        .unionByName(
            emb.where(F.col("vec_id") % 2 == 1).select(
                F.lit(1).alias("__side"), F.col("embedding").alias("__v")
            )
        )
        .where(F.size("__v") == 64)
    )
    agg = _embedding_moment_frame(tagged, 64)
    plan = _plan(agg)
    assert "Generate" not in plan  # no explode
    assert "partial_count" in plan or "partial" in plan.lower()
    # only the embedding (and vec_id filter) columns are read
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "label" not in read_schema


def test_lsh_cap_filters_have_no_window_sort(spark):
    """The hot-bucket caps in all three LSH paths are partial-aggregated
    groupBy + anti-join, never count(*) OVER (PARTITION BY bucket): a
    window would SORT the full n*bands exploded table once per self-join
    consumer.  'Window' must not appear anywhere in these plans (the only
    window left in dedup is the bounded star pass over the hot subset,
    which partitions by full signature, not by bucket — and only sorts
    rows that an over-cap bucket already admitted)."""
    import numpy as np

    from driftspark.ann import embedding_near_duplicates
    from driftspark.dedup import minhash_signatures, simhash64
    from driftspark.dedup import lsh_candidate_pairs, simhash_near_duplicates

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i} gamma{i % 5} delta{i}") for i in range(40)],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(docs, "doc_id", "text", n_hashes=16)
    lsh_plan = _plan(lsh_candidate_pairs(sigs, 16, 4, max_bucket_size=10))
    # the star pass's full-signature window IS allowed; bucket-cap windows
    # are not — so assert on the window spec, not mere presence
    assert "windowspecdefinition(band" not in lsh_plan.lower(), lsh_plan[:2000]
    assert "windowspecdefinition(bucket" not in lsh_plan.lower()

    sim_plan = _plan(
        simhash_near_duplicates(
            simhash64(docs, "doc_id", "text"), max_hamming=3, max_bucket_size=10
        )
    )
    assert "Window" not in sim_plan, sim_plan[:2000]

    rng = np.random.RandomState(5)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(0, 1, 8)]) for i in range(40)],
        "id long, vec array<double>",
    )
    emb_plan = _plan(
        embedding_near_duplicates(emb, "id", "vec", min_cosine=0.9, dim=8)
    )
    assert "Window" not in emb_plan, emb_plan[:2000]


def test_volume_report_single_count_shuffle_and_broadcast_grid(spark):
    from driftspark.volume import volume_report

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = _plan(volume_report(ev, "ts", "event_type"))
    # the dense grid (1-row sequence explode) must broadcast to the counts,
    # never shuffle them; the trailing window partitions by group
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Window" in plan


def test_cvm_ad_window_partitioned_not_global(spark):
    # the fused CvM/AD cumulative window is per-feature, never a global
    # single-partition sort (the W1/KS scale contract)
    from driftspark.stats import _melt
    from pyspark.sql import Window

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    u = (
        _melt(li.where("l_orderkey % 2 = 0"), ["l_quantity", "l_tax"])
        .withColumn("r", F.lit(1)).withColumn("t", F.lit(0))
    )
    g = u.groupBy("feature", "value").agg(
        F.sum("r").alias("r"), F.sum("t").alias("t")
    )
    from driftspark.stats import _cvm_ad_terms

    w_cum = (
        Window.partitionBy("feature").orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("feature")
    cvm, ad = _cvm_ad_terms(
        F.sum("r").over(w_cum), F.sum("t").over(w_cum),
        F.col("r"), F.col("t"),
        F.sum("r").over(w_all), F.sum("t").over(w_all), 9,
    )
    scored = g.select("feature", cvm.alias("cvm"), ad.alias("ad"))
    plan = _plan(scored)
    assert "Window" in plan and "SinglePartition" not in plan
