"""Data-quality walkthrough: the round-6 validation-tier surface in one
script — volume anomalies, feed freshness, quantile-shift drift
explanation, CDF-family detectors (KS vs CvM/AD vs W1), and test-set
contamination — all over the driver-generated testdata tables.

Each section prints what a pipeline operator would actually look at:
which hour a feed cratered, which feed went stale, WHERE a drifted
distribution moved, and which eval documents leak into training data.

Run:  python examples/data_quality_demo.py [sf_dir]
      (default sf_dir: /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from driftspark.dataset import SparkDataset  # noqa: E402
from driftspark.dedup import contamination_report  # noqa: E402
from driftspark.detectors import CvMAndersonDarling, KSTest  # noqa: E402
from driftspark.session import get_spark  # noqa: E402
from driftspark.stats import quantile_shift_report  # noqa: E402
from driftspark.volume import freshness_report, volume_report  # noqa: E402


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="data-quality-demo", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    print("== 1. partition volume anomalies (dense hourly grid) ==")
    vol = volume_report(events, "ts", "event_type", bucket="hour",
                        trailing=24, min_history=6).cache()
    anom = vol.where("verdict = 'anomalous'")
    print(f"buckets scored: {vol.count()}, anomalous: {anom.count()}")
    anom.orderBy(F.desc(F.abs("z"))).show(5, truncate=False)

    print("== 2. feed freshness (vs deterministic global-max anchor) ==")
    freshness_report(
        events, "ts", "event_type", max_lag_seconds=900.0,
        expected_groups=["click", "view", "purchase", "signup", "error",
                         "heartbeat"],
    ).orderBy("group").show(truncate=False)

    print("== 3. drift: scalar verdicts, then WHERE the distribution moved ==")
    ref = li.where("l_orderkey % 2 = 0")
    test = li.where("l_orderkey % 2 = 1").withColumn(
        "l_extendedprice", F.col("l_extendedprice") * 1.15
    )
    feats = ["l_quantity", "l_extendedprice"]
    sref, stest = SparkDataset(ref.select(*feats)), SparkDataset(test.select(*feats))
    ks = KSTest().fit_detect(sref, stest)
    cvm = CvMAndersonDarling().fit_detect(sref, stest)
    print(f"KS: drift={ks.drift_detected} severity={ks.severity.value}")
    print(f"CvM/AD: drift={cvm.drift_detected} severity={cvm.severity.value} "
          f"per-feature={ {k: round(v['cvm'], 2) for k, v in cvm.metadata['feature_results'].items()} }")
    shifts = quantile_shift_report(ref, test, feats)
    for feat, rows in shifts.items():
        moved = [f"p{int(p * 100):02d}:{si:+.2f}iqr"
                 for p, _, _, _, si in rows if si is not None and abs(si) > 0.05]
        print(f"  {feat}: {' '.join(moved) if moved else 'no quantile moved >5% IQR'}")

    print("== 3b. dependency drift + outliers + PII ==")
    from pyspark.sql import Window

    from driftspark.detectors import CorrelationDrift
    from driftspark.profile import outlier_report
    from driftspark.textops import pii_scan

    # the synthetic columns are independent, so construct a dependent
    # pair: gross tracks price in ref, anti-tracks it in test — the
    # marginal-blind failure mode CorrelationDrift exists for
    gross = F.col("l_extendedprice") * (1 + F.col("l_tax"))
    cref = ref.withColumn("gross", gross)
    cflip = test.withColumn(
        "gross", F.max(gross).over(Window.partitionBy()) - gross
    )
    pair = ["l_extendedprice", "gross"]
    corr = CorrelationDrift().fit_detect(
        SparkDataset(cref.select(*pair)), SparkDataset(cflip.select(*pair))
    )
    print(f"correlation drift: {corr.drift_detected} "
          f"(max |delta r| = {corr.score:.3f})")
    # inject a 100x price corruption on a thin slice — Tukey fences catch it
    corrupted = li.withColumn(
        "l_extendedprice",
        F.when(F.col("l_orderkey") % 997 == 0,
               F.col("l_extendedprice") * 100).otherwise(F.col("l_extendedprice")),
    )
    out = outlier_report(corrupted, ["l_extendedprice"], ["l_returnflag"]).collect()
    print("outlier rates by returnflag:",
          {r["l_returnflag"]: round(r["outlier_rate"] or 0, 5) for r in out})
    pii = pii_scan(
        docs.withColumn("text", F.when(F.col("doc_id") % 50 == 0,
            F.concat(F.col("text"), F.lit(" mail x@y.io"))).otherwise(F.col("text"))),
        "text",
    )
    print("docs with PII:", pii.where("has_pii").count())

    print("== 3c. rolling temporal drift (each day vs its trailing week) ==")
    import numpy as np

    from driftspark.verdicts import rolling_psi

    roll = rolling_psi(
        events, "ts",
        {"value": np.array([0.0, 10.0, 25.0, 50.0, 100.0, 200.0, 600.0])},
        bucket="day", trailing=7, min_history=3,
    ).orderBy("bucket_ts")
    roll.where("severity <> 'insufficient_history'").orderBy(
        F.desc("psi")
    ).show(3, truncate=False)

    print("== 4. test-set contamination (8-gram overlap) ==")
    rep = contamination_report(
        docs.where("doc_id % 2 = 1"), docs.where("doc_id % 2 = 0"),
        "doc_id", "text", n=8, threshold=0.5,
    ).cache()
    flagged = rep.where("contaminated")
    print(f"docs checked: {rep.count()}, contaminated: {flagged.count()}")
    flagged.orderBy(F.desc("rate"), "id").show(5)

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
