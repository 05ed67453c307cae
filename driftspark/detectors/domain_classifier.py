"""Domain-classifier drift detector — distributed pyspark.ml edition.

Semantics parity with
/root/reference/src/drift_autopsy/detectors/model_based/domain_classifier.py:
label reference rows 0 and test rows 1 (domain_classifier.py:96-104),
random forest (100 trees, depth 5) (:107-112), 3-fold cross-validated
ROC-AUC (:114-127), top-10 feature importances (:141-154), AUC severity
ladder .55/.65/.75/.85 (:159-170), drift when auc >= threshold (:157).

Spark execution: where the reference trains sklearn in-process, this
trains pyspark.ml RandomForestClassifier DISTRIBUTED, by default on a
deterministic content-keyed sample of <=100k rows per side (a shallow
forest's AUC saturates well below that; ``max_samples_per_side=None``
trains on the full union).  Cross-validation folds are assigned
by a deterministic row hash (content-keyed, partitioning-invariant), AUC
via BinaryClassificationEvaluator (areaUnderROC).  Model family and
hyperparameters match; tree-level randomness necessarily differs from
sklearn, so parity tests assert behavior (AUC ~ 0.5 on identical
distributions, AUC -> 1 on separated ones, severity cutoffs) rather than
bit equality."""

from __future__ import annotations

import logging

import numpy as np
from pyspark.sql import functions as F

from driftspark.dataset import SparkDataset
from driftspark.detectors.base import BaseDriftDetector
from driftspark.numerics import severity_from_auc
from driftspark.registry import DetectorRegistry
from driftspark.results import DetectionResult, DriftSeverity
from driftspark.sampling import content_keyed_top_n

logger = logging.getLogger(__name__)


@DetectorRegistry.register("domain_classifier")
class DomainClassifier(BaseDriftDetector):
    """Classifier two-sample test (args mirror domain_classifier.py:37-53)."""

    def __init__(
        self,
        threshold: float = 0.6,
        n_estimators: int = 100,
        max_depth: int = 5,
        use_cross_val: bool = True,
        cv_folds: int = 3,
        random_state: int = 42,
        max_samples_per_side: int | None = 100_000,
    ):
        super().__init__(name="domain_classifier")
        self.threshold = threshold
        self.n_estimators = n_estimators
        self.max_depth = max_depth
        self.use_cross_val = use_cross_val
        self.cv_folds = cv_folds
        self.random_state = random_state
        # default cap: deterministic content-keyed per-side sample — at
        # 10^12 rows a shallow forest's AUC saturates at ~10^5 rows per
        # class, so training on the full union is a scale-killer for zero
        # statistical gain; None trains on everything (explicit opt-in)
        self.max_samples_per_side = max_samples_per_side
        self._classifier = None

    def detect(self, test_data: SparkDataset) -> DetectionResult:
        self._require_fitted()
        from pyspark.ml.classification import RandomForestClassifier
        from pyspark.ml.evaluation import BinaryClassificationEvaluator
        from pyspark.ml.feature import VectorAssembler

        ref = self._reference_data
        cols = [c for c in ref.numeric_features if c in test_data.df.columns]
        if not cols:
            return DetectionResult(
                detector_name=self.name,
                drift_detected=False,
                severity=DriftSeverity.NONE,
                score=0.5,
                threshold=self.threshold,
            )

        # union with domain labels (J3), fillna(0) parity (:97-98)
        sel = [F.nanvl(F.col(c).cast("double"), F.lit(None)).alias(c) for c in cols]
        ref_side = ref.df.select(*sel)
        test_side = test_data.df.select(*sel)
        if self.max_samples_per_side is not None:
            cap = self.max_samples_per_side
            # only sample when a side actually exceeds the cap — a global
            # orderBy+limit with an over-sized limit materializes a
            # limit-sized top-k heap and OOMs.  Both side counts come from
            # ONE column-pruned job instead of a count() job per side.
            counted = (
                ref_side.select(F.lit(0).alias("__side"))
                .unionByName(test_side.select(F.lit(1).alias("__side")))
                .groupBy("__side")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            n_by_side = {r["__side"]: r["n"] for r in counted}
            capped = False
            if n_by_side.get(0, 0) > cap:
                ref_side = content_keyed_top_n(
                    ref_side, cap, F.xxhash64(*cols), cols,
                    total=n_by_side[0],
                )
                capped = True
            if n_by_side.get(1, 0) > cap:
                test_side = content_keyed_top_n(
                    test_side, cap, F.xxhash64(*cols), cols,
                    total=n_by_side[1],
                )
                capped = True
        else:
            capped = False
        u = (
            ref_side.withColumn("label", F.lit(0.0))
            .unionByName(test_side.withColumn("label", F.lit(1.0)))
            .na.fill(0.0)
        )
        if capped:
            # a global orderBy+limit collapses each capped side to ONE
            # partition, which serializes every RF split-finding pass (each
            # tree-depth iteration becomes a 1-task job).  Spread the
            # bounded sample back across the cluster before fitting.
            u = u.repartition(u.sparkSession.sparkContext.defaultParallelism)
        assembler = VectorAssembler(inputCols=cols, outputCol="features")
        # cached: the CV fits + the final importance fit all iterate this
        data = assembler.transform(u).select("features", "label").cache()

        rf = RandomForestClassifier(
            numTrees=self.n_estimators,
            maxDepth=self.max_depth,
            seed=self.random_state,
            featuresCol="features",
            labelCol="label",
        )
        evaluator = BinaryClassificationEvaluator(
            labelCol="label", metricName="areaUnderROC"
        )

        auc_std = None
        if self.use_cross_val:
            from concurrent.futures import ThreadPoolExecutor

            # deterministic content-keyed folds (partitioning-invariant)
            folded = data.withColumn(
                "fold",
                F.pmod(F.xxhash64("features", F.lit(self.random_state)), self.cv_folds),
            ).cache()
            # materialize ONCE so the concurrent fits below share the
            # cached blocks instead of racing to compute them
            folded.count()

            def fit_fold(k: int) -> float:
                est = rf.copy()
                model = est.fit(folded.where(F.col("fold") != k))
                return float(
                    evaluator.evaluate(model.transform(folded.where(F.col("fold") == k)))
                )

            def fit_full():
                # importance fit (:141-147) — RF ignores the extra fold
                # column, so reuse the cached folded table directly
                return rf.copy().fit(folded)

            # the k fold fits and the full-data importance fit are
            # independent Spark jobs — submit them concurrently (all
            # JVM-side pyspark.ml work, same pattern as
            # verdicts.partition_verdicts); wall time drops from 4 serial
            # fits to ~max(one fit)
            with ThreadPoolExecutor(max_workers=self.cv_folds + 1) as pool:
                fold_futs = [pool.submit(fit_fold, k) for k in range(self.cv_folds)]
                full_fut = pool.submit(fit_full)
                scores = [f.result() for f in fold_futs]
                self._classifier = full_fut.result()
            folded.unpersist()
            auc = float(np.mean(scores))
            auc_std = float(np.std(scores))
        else:
            # the AUC model already IS the full-data fit, reuse it
            self._classifier = rf.fit(data)
            auc = float(evaluator.evaluate(self._classifier.transform(data)))
        data.unpersist()
        importances = dict(zip(cols, self._classifier.featureImportances.toArray()))
        sorted_features = sorted(importances.items(), key=lambda x: x[1], reverse=True)[:10]
        sorted_features = [(f, float(v)) for f, v in sorted_features]

        drift_detected = auc >= self.threshold
        severity = DriftSeverity(severity_from_auc(auc))
        return DetectionResult(
            detector_name=self.name,
            drift_detected=drift_detected,
            severity=severity,
            score=auc,
            threshold=self.threshold,
            statistic=auc,
            metadata={
                "auc": auc,
                "auc_std": auc_std,
                "n_features": len(cols),
                "top_features": sorted_features,
                "use_cross_val": self.use_cross_val,
            },
        )
