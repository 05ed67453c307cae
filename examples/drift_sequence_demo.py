"""End-to-end golden-sequence demo: the reference's yearly drift loop
(reference examples/quickstart/folktables_demo.py:119-196, producing
outputs/folktables_drift_results.json) replicated Spark-first on the
ACS-shaped synthetic workload.

Reference batch = synthetic "2014"; test batches = successive years with
progressively drifted covariates (driftspark.synth.synth_acs_table).  The
"model" is a fixed linear-logistic scorer (deterministic column math — no
sklearn in this environment), giving real accuracy-drop numbers and a
proba column for CBPE.  Pipeline configs mirror the reference demo
(folktables_demo.py:84-111); the KS pipeline's RCA uses the Spark-native
``distribution_change`` analyzer because the shap library is absent (the
reference-parity ``shap`` analyzer would emit its documented degraded
result).

Output layout matches the reference golden JSON exactly:
``{year: {actual_accuracy, accuracy_drop, pipelines: {name: result}}}``.

Run:  python examples/drift_sequence_demo.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from driftspark import DriftPipeline, SparkDataset  # noqa: E402
from driftspark.detectors import CBPE, MMD, PSI, KSTest  # noqa: E402
from driftspark.synth import ACS_FEATURES, synth_acs_table  # noqa: E402

REF_YEAR = 2014


def _score(df: DataFrame) -> DataFrame:
    """Fixed linear-logistic 'model' fitted on the 2014 relationship:
    proba = sigmoid(z) with the label-generating coefficients (noise-free),
    prediction = proba > 0.5."""
    z = (
        0.06 * F.col("AGEP") + 0.22 * F.col("SCHL") + 0.09 * F.col("WKHP")
        - 0.45 * F.col("MAR") - 9.2
    )
    return df.withColumn("proba", F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).withColumn(
        "prediction", (F.col("proba") > 0.5).cast("int")
    )


def _accuracy(scored: DataFrame) -> float:
    row = scored.agg(
        F.avg((F.col("prediction") == F.col("label")).cast("double")).alias("acc")
    ).first()
    return float(row["acc"])


def build_pipelines() -> dict:
    """Mirror of reference folktables_demo.py:84-111."""
    return {
        "KS Test": DriftPipeline(
            detector=KSTest(threshold=0.05, correction="bonferroni"),
            localizer="univariate",
            rca="distribution_change",  # shap lib absent; Spark-native RCA
            enable_localization=True,
            enable_rca=True,
        ),
        "PSI": DriftPipeline(
            detector=PSI(threshold=0.2, n_bins=10),
            localizer="univariate",
            enable_localization=True,
            enable_rca=False,
        ),
        "MMD": DriftPipeline(
            detector=MMD(threshold=0.1, kernel="rbf", n_permutations=20,
                         max_samples=3000),
            localizer="univariate",
            enable_localization=True,
            enable_rca=False,
        ),
        "CBPE": DriftPipeline(
            detector=CBPE(threshold=0.05, n_bins=10),
            localizer="univariate",
            enable_localization=True,
            enable_rca=False,
        ),
    }


def run_demo(
    spark: SparkSession,
    out_path: str,
    n_rows: int = 20000,
    years=(2015, 2016, 2017),
) -> dict:
    ref_scored = _score(synth_acs_table(spark, n_rows, REF_YEAR)).cache()
    train_acc = _accuracy(ref_scored)
    ref_plain = SparkDataset(ref_scored.select(*ACS_FEATURES))
    ref_with_preds = SparkDataset(
        ref_scored.select(*ACS_FEATURES, "proba"),
        feature_cols=list(ACS_FEATURES),
        proba_col="proba",
    )

    pipelines = build_pipelines()
    all_results: dict = {}
    for year in years:
        test_scored = _score(synth_acs_table(spark, n_rows, year)).cache()
        test_acc = _accuracy(test_scored)
        test_plain = SparkDataset(test_scored.select(*ACS_FEATURES))
        test_with_preds = SparkDataset(
            test_scored.select(*ACS_FEATURES, "proba"),
            feature_cols=list(ACS_FEATURES),
            proba_col="proba",
        )
        year_results = {}
        for name, pipeline in pipelines.items():
            # CBPE consumes the prediction-carrying datasets (demo:158-162)
            if name == "CBPE":
                result = pipeline.run(ref_with_preds, test_with_preds)
            else:
                result = pipeline.run(ref_plain, test_plain)
            year_results[name] = result.to_dict()
        all_results[str(year)] = {
            "actual_accuracy": test_acc,
            "accuracy_drop": test_acc - train_acc,
            "pipelines": year_results,
        }
        test_scored.unpersist()
    ref_scored.unpersist()

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(all_results, f, indent=2, default=str)
    return all_results


if __name__ == "__main__":
    from driftspark.session import get_spark

    out = sys.argv[1] if len(sys.argv) > 1 else "outputs/drift_sequence_results.json"
    spark = get_spark(app_name="drift-sequence-demo", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    results = run_demo(spark, out)
    for year, block in results.items():
        dets = {
            n: (r["detection"]["drift_detected"], r["detection"]["severity"])
            for n, r in block["pipelines"].items()
        }
        print(year, f"acc={block['actual_accuracy']:.4f}",
              f"drop={block['accuracy_drop']:+.4f}", dets)
    print(f"wrote {out}")
