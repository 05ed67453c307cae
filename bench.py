"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "images_per_sec": ...}

The image-validation throughput (validated images/sec: constraint +
payload + drift pass over a synthetic image table, north-rule metric) is
measured on a pre-materialized parquet table so generation cost is not
billed to the engine.  tools/scaling.py runs the same job at two
parallelism levels for the scaling-efficiency evidence.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
IMAGE_ROWS = int(os.environ.get("SPARK_GRAFT_IMAGE_ROWS", "60000"))
BENCH_REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))


def _timed(queries, name, fn, repeats: int = BENCH_REPEATS):
    """Best-of-N timing (steady-state estimator): single-shot numbers on
    this box swing ±30% with background load, and the reference baseline
    is itself a steady-state figure (BASELINE.md excludes its cold year).
    SPARK_GRAFT_BENCH_REPEATS raises N on a noisy box."""
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    queries[name] = round(best, 3)


def main():
    from driftspark.session import get_spark

    spark = get_spark(app_name="driftspark-bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    t_all = time.time()
    q = {}

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")

    # session warmup (JVM/codegen/scan init) so the first timed query is
    # charged for its own work, not Spark cold start: one tiny query per
    # physical-operator family (scan, explode, hash-agg, window, sketch)
    # initializes Janino/whole-stage-codegen — baseline numbers are
    # steady-state, so cold-JVM cost must not bias the first timed query
    li.count()
    docs.count()
    # materialize the benchmark columns once (page cache + parquet footers):
    # the reference's numbers time detect() on an ALREADY-LOADED pandas
    # frame, so the first cold columnar read must not bias one query
    li.select(
        *[F.count(c) for c in
          ["l_quantity", "l_extendedprice", "l_discount", "l_tax",
           "l_returnflag", "l_orderkey", "l_linenumber"]]
    ).collect()
    warm = spark.range(1000).withColumn("v", (F.col("id") % 7).cast("double"))
    warm.select(F.explode(F.array(F.struct(F.lit("a").alias("f"), F.col("v").alias("x")))).alias("s")) \
        .groupBy("s.f").agg(F.sum("s.x")).collect()
    from pyspark.sql import Window as _W
    warm.select(F.sum("v").over(_W.partitionBy(F.col("id") % 3).orderBy("id"))).collect()
    warm.approxQuantile("v", [0.5], 0.01)

    ref = li.where(F.col("l_orderkey") % 2 == 0)
    test = li.where(F.col("l_orderkey") % 2 == 1)
    num_feats = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

    # --- drift detectors over the TPC-H splits -------------------------
    from driftspark.dataset import SparkDataset
    from driftspark.detectors import KSTest, PSI

    # steady-state warmup: one tiny run through each detector compiles its
    # generated code paths.  The reference baseline does the same — its
    # published numbers are the 2016-2018 steady-state years, explicitly
    # excluding the 11.9 s cold-start 2015 run (BASELINE.md).
    tiny = li.limit(2000).cache()
    tiny.count()
    tref = SparkDataset(tiny.where(F.col("l_orderkey") % 2 == 0).select(*num_feats, "l_returnflag"))
    ttest = SparkDataset(tiny.where(F.col("l_orderkey") % 2 == 1).select(*num_feats, "l_returnflag"))
    PSI().fit_detect(tref, ttest)
    KSTest().fit_detect(tref, ttest)
    tiny.unpersist()

    sref = SparkDataset(ref.select(*num_feats, "l_returnflag"))
    stest = SparkDataset(test.select(*num_feats, "l_returnflag"))
    _timed(q, "psi_detector", lambda: PSI().fit_detect(sref, stest))
    _timed(q, "ks_detector", lambda: KSTest().fit_detect(sref, stest))

    from driftspark.detectors import CvMAndersonDarling

    # both CDF functionals (CvM + tail-weighted AD) for all features in
    # ONE fused window job — comparable work shape to ks_detector
    _timed(q, "cvm_ad_detector", lambda: CvMAndersonDarling().fit_detect(sref, stest))

    from driftspark.detectors import MMD, DomainClassifier, HallucinationRiskDetector

    _timed(
        q,
        "mmd_detector",
        lambda: MMD(n_permutations=20, max_samples=3000).fit_detect(sref, stest),
    )
    _timed(
        q,
        "domain_classifier",
        lambda: DomainClassifier(
            n_estimators=50, use_cross_val=False, max_samples_per_side=100_000
        ).fit_detect(sref, stest),
    )
    from driftspark.detectors import CBPE

    conf = F.least(F.col("l_discount") * 9 + F.lit(0.5), F.lit(0.99))
    cbpe_ref = SparkDataset(
        ref.select(*num_feats).withColumn("proba", conf),
        feature_cols=num_feats,
        proba_col="proba",
    )
    cbpe_test = SparkDataset(
        test.select(*num_feats).withColumn("proba", conf),
        feature_cols=num_feats,
        proba_col="proba",
    )
    _timed(q, "cbpe", lambda: CBPE().fit_detect(cbpe_ref, cbpe_test))

    halluc_test = SparkDataset(
        test.select(*num_feats).withColumn(
            "proba", F.least(F.col("l_discount") * 9 + F.lit(0.5), F.lit(0.99))
        ),
        feature_cols=num_feats,
        proba_col="proba",
    )
    _timed(
        q,
        "hallucination_mahalanobis",
        lambda: HallucinationRiskDetector().fit_detect(
            SparkDataset(ref.select(*num_feats)), halluc_test
        ),
    )

    # --- per-partition verdict suite -----------------------------------
    from driftspark.verdicts import partition_verdicts

    tagged = li.withColumn(
        "split", F.when(F.col("l_orderkey") % 2 == 0, "ref").otherwise("test")
    ).withColumn("part", F.col("l_linenumber"))
    _timed(
        q,
        "partition_verdicts",
        lambda: partition_verdicts(
            tagged, numeric_cols=num_feats, cat_cols=["l_returnflag"]
        ).count(),
    )

    # --- profiling + constraints ---------------------------------------
    from driftspark.constraints import referential_violations, uniqueness_violations
    from driftspark.profile import profile_columns

    _timed(
        q,
        "profile",
        lambda: profile_columns(
            li, columns=num_feats + ["l_returnflag"], group_cols=["l_returnflag"]
        ).count(),
    )
    _timed(
        q,
        "uniqueness",
        lambda: uniqueness_violations(
            li.select("l_orderkey", "l_linenumber"), ["l_orderkey", "l_linenumber"]
        ).count(),
    )
    _timed(
        q,
        "referential",
        lambda: referential_violations(
            orders,
            "o_custkey",
            customer.where(F.col("c_mktsegment") == "BUILDING"),
            "c_custkey",
        ).count(),
    )

    # --- training-data ops ----------------------------------------------
    from driftspark.ann import cosine_topk
    from driftspark.dedup import exact_duplicates, minhash_near_duplicates, simhash64
    from driftspark.textops import detect_language, quality_score

    _timed(
        q,
        "dedup_exact",
        lambda: exact_duplicates(
            docs.withColumn("p", F.substring("text", 1, 50)), ["p"]
        ).count(),
    )
    _timed(
        q,
        "minhash_lsh",
        lambda: minhash_near_duplicates(docs, "doc_id", "text").count(),
    )
    _timed(q, "simhash", lambda: simhash64(docs, "doc_id", "text").count())
    _timed(
        q,
        "text_quality",
        lambda: quality_score(docs, "text").agg(F.avg("quality_score")).collect(),
    )
    _timed(
        q,
        "langid",
        lambda: detect_language(docs, "text").groupBy("lang_pred").count().collect(),
    )
    qvec = emb.where(F.col("vec_id") == 0).first()["embedding"]
    _timed(
        q,
        "ann_cosine_topk",
        lambda: cosine_topk(emb, "vec_id", "embedding", qvec, 10).collect(),
    )

    from driftspark.dedup import contamination_report
    from driftspark.volume import freshness_report, volume_report

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    events.count()  # scan warmup (same treatment as the other tables)
    _timed(
        q,
        "contamination",
        lambda: contamination_report(
            docs.where(F.col("doc_id") % 2 == 1),
            docs.where(F.col("doc_id") % 2 == 0),
            "doc_id", "text", n=8,
        ).where("contaminated").count(),
    )
    _timed(
        q,
        "volume_freshness",
        # collect(), not count(): Catalyst would prune the max-ts/lag
        # aggregates under a bare count (CLAUDE.md profiling rule); the
        # volume filter is count-safe because it reads the window columns
        lambda: (
            volume_report(events, "ts", "event_type").where(
                "verdict = 'anomalous'"
            ).count(),
            freshness_report(events, "ts", "event_type").collect(),
        ),
    )

    # --- north-rule metric: validated images/sec -------------------------
    from driftspark.constraints import uniqueness_report
    from driftspark.imageops import validate_image_payloads_paired
    from driftspark.synth import synth_image_pairs_wide, synth_image_table
    from driftspark.verdicts import partition_verdicts as pv

    tmp = tempfile.mkdtemp(prefix="driftspark_bench_")
    try:
        synth_image_table(
            spark, IMAGE_ROWS, n_parts=16, drift=True, with_bytes=False,
            num_partitions=min(int(CPUS) * 2, 64),
        ).write.mode("overwrite").parquet(f"{tmp}/images")
        synth_image_pairs_wide(
            spark, IMAGE_ROWS // 10, num_partitions=min(int(CPUS) * 2, 64)
        ).write.mode("overwrite").parquet(f"{tmp}/pairs")
        img = spark.read.parquet(f"{tmp}/images")
        pairs = spark.read.parquet(f"{tmp}/pairs")

        n_pairs = 0

        def validation_pass():
            nonlocal n_pairs
            # constraint pass (collect, NOT count — Catalyst prunes agg
            # expressions under count(), under-measuring the real work)
            uniqueness_report(img, ["image_id", "split"]).collect()
            # drift pass (per-partition verdicts on all drift axes)
            # mirror the packaged job (runner.run_validation): image
            # dims are heavily quantized, so the broadcast-KS test-side
            # pre-aggregation pays for itself (interleaved A/B: ~4%
            # faster than the continuous-column default here)
            pv(
                img,
                numeric_cols=["w", "h", "phash"],
                cat_cols=["fmt"],
                ks_cols=["w", "h"],
                ks_preaggregate=True,
            ).count()
            # payload pass (decode + PSNR + captions), co-located layout;
            # cap concurrent Arrow streams at this box's measured knee
            # (interleaved best-of-3: 0.351s at 8 streams vs 0.514s at
            # 32 on the 6k-pair table)
            n_pairs = validate_image_payloads_paired(
                pairs, max_parallelism=min(int(CPUS), 8)
            ).count()

        _timed(q, "image_validation", validation_pass)
        images_per_sec = round((IMAGE_ROWS + n_pairs) / q["image_validation"], 1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    wall = round(time.time() - t_all, 3)
    total = round(sum(q.values()), 3)  # sum of best-of-2 query times
    print(
        json.dumps(
            {
                "metric": "bench_total",
                "value": total,
                "unit": "sec",
                "wall_sec": wall,
                "queries": q,
                "sf": SF_DIR,
                "cpus": int(CPUS),
                "images_per_sec": images_per_sec,
                "image_rows": IMAGE_ROWS,
            }
        )
    )


if __name__ == "__main__":
    main()
