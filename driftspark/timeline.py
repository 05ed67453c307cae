"""Results-timeline analytics — the dashboard data layer.

Reference parity: examples/dashboard/data_loader.py:33-351
(DriftResultsLoader.get_detector_timeline / get_all_detectors_timeline /
get_feature_drift_timeline / get_performance_metrics / get_summary_stats /
get_available_years / get_available_detectors / get_rca_results /
get_feature_importance_changes).  The reference loads ONE results JSON
into pandas frames on the driver; this module parses the same JSON
surface DISTRIBUTED — ``spark.read.text(wholetext)`` over any number of
results files (a fleet of monitored pipelines each appending run results)
with every frame derived through JVM-side ``from_json`` /
``get_json_object`` expressions (map types absorb the dynamic year /
pipeline / feature keys); no Python row UDF anywhere, so a million-file
results lake scans in parallel and Catalyst prunes whatever frame a
dashboard asks for.

Format quirks mirrored from the reference loader:
- years live either under ``yearly_results`` or at the top level; non-year
  keys are skipped (``isdigit`` → rlike '^[0-9]+$').
- per-year detector results live either in a ``detectors`` dict or inside
  ``pipelines.*.detection``.
- ``get_performance_metrics`` uses Python ``or`` fallbacks, so a 0.0 in
  metadata falls through to the year-level value — mirrored exactly.
- ``get_feature_drift_timeline`` takes the FIRST pipeline whose dict
  CONTAINS a ``localization`` key (dict insertion order, even when the
  value is null) — mirrored via posexplode order + map_contains_key.
- ``get_detector_timeline`` skips falsy detectors-dict entries and breaks
  at the first matching pipeline; ``get_available_detectors`` unions
  detectors-dict keys and pipeline names per year (no either/or).
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

_MAP = "map<string,string>"
_DETECTION_SCHEMA = (
    "detector_name string, drift_detected boolean, severity string, "
    "score double, threshold double, p_value double"
)
_FEATURE_DRIFT_SCHEMA = (
    "array<struct<feature_name string, drift_detected boolean, "
    "score double, p_value double, severity string>>"
)
_RCA_SCHEMA = (
    "analyzer_name string, feature_importances map<string,double>, "
    "recommendations array<string>"
)


def _json_obj_truthy(col) -> "F.Column":
    """Python truthiness of a JSON value that must be a dict to count:
    non-null AND a non-empty object — null, ``{}``, and non-object values
    are all falsy (the reference loader's ``if localization:`` /
    ``if detector_result:`` / ``if rca:`` checks)."""
    return F.coalesce(
        F.size(F.map_keys(F.from_json(col, _MAP))) > 0, F.lit(False)
    )


def _py_title(col) -> "F.Column":
    """Python ``str.title()`` parity for ``'_'``-to-space detector names.

    ``F.initcap`` only capitalizes after WHITESPACE, but ``str.title()``
    capitalizes a letter after ANY non-letter: ``'ks_2samp'`` must render
    ``'Ks 2Samp'``, not initcap's ``'Ks 2samp'``.  Mirror it by inserting
    a ``\\x01 + space`` marker after every non-letter (so initcap sees a
    word boundary there too), then stripping the markers.  ASCII-letter
    boundaries only — detector names are ASCII identifiers."""
    spaced = F.replace(col, F.lit("_"), F.lit(" "))
    marked = F.regexp_replace(spaced, "([^A-Za-z])", "$1\x01 ")
    return F.regexp_replace(F.initcap(marked), "\x01 ", "")


class DriftResultsTimeline:
    """Timeline frames over drift-results JSON files.

    ``path`` accepts anything ``spark.read.text`` does: one file, a glob,
    or a directory of per-run results (each file one JSON document, the
    shape ``sinks.write_results_json`` emits).  Every accessor returns a
    DataFrame; ``summary_stats`` aggregates one small dict on the driver.
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._years: Optional[DataFrame] = None

    def unpersist(self) -> None:
        """Release the cached base frame.  Spark's CacheManager does not
        garbage-collect Dataset caches with the Python object, so a
        long-lived session constructing many timelines (one per dashboard
        request/path) must release each — use this, or the instance as a
        context manager."""
        if self._years is not None:
            self._years.unpersist()
            self._years = None

    def __enter__(self) -> "DriftResultsTimeline":
        return self

    def __exit__(self, *exc) -> None:
        self.unpersist()

    # -- base frames --------------------------------------------------

    def years_df(self) -> DataFrame:
        """(source, year int, ydata json-string) — one row per year per
        results file; the shared base every frame derives from."""
        if self._years is None:
            raw = (
                self.spark.read.text(self.path, wholetext=True)
                .select(
                    F.input_file_name().alias("source"),
                    # years either under yearly_results or at top level
                    F.coalesce(
                        F.get_json_object("value", "$.yearly_results"),
                        F.col("value"),
                    ).alias("doc"),
                )
                .select(
                    "source",
                    F.explode(F.from_json("doc", _MAP)).alias("year_key", "ydata"),
                )
                .where(F.col("year_key").rlike("^[0-9]+$"))
                .select(
                    "source",
                    F.col("year_key").cast("int").alias("year"),
                    "ydata",
                )
            )
            # every accessor derives from this frame and summary_stats
            # touches it four times — persist the parsed (source, year,
            # ydata) rows so a results lake is read + JSON-split once,
            # spilling to disk rather than re-scanning.
            self._years = raw.persist(StorageLevel.MEMORY_AND_DISK)
        return self._years

    def _pipelines_df(self) -> DataFrame:
        """(source, year, pos, pipeline, pdata) — pipelines exploded in
        JSON insertion order (pos mirrors the reference's dict order)."""
        return self.years_df().select(
            "source",
            "year",
            F.posexplode(
                F.from_json(F.get_json_object("ydata", "$.pipelines"), _MAP)
            ).alias("pos", "pipeline", "pdata"),
        )

    def _detections_df(self) -> DataFrame:
        """(source, year, detector_name, det, branch, pos, entry_truthy)
        from BOTH formats: the ``detectors`` dict when present, else
        ``pipelines.*.detection`` (data_loader.py:100-128).

        ``branch``/``pos``/``entry_truthy`` let each accessor apply the
        reference's exact selection rules: ``detector_timeline`` keeps only
        Python-truthy detectors-dict entries (``if detector_result:``) and
        BREAKS at the first matching pipeline (pos order), while
        ``all_detectors_timeline`` emits every row of both branches."""
        years = self.years_df().withColumn(
            "dmap", F.from_json(F.get_json_object("ydata", "$.detectors"), _MAP)
        ).withColumn("n_det", F.coalesce(F.size("dmap"), F.lit(0)))
        from_detectors = (
            years.where(F.col("n_det") > 0)
            .select(
                "source",
                "year",
                F.explode("dmap").alias("detector_name", "djson"),
            )
            .withColumn("det", F.from_json("djson", _DETECTION_SCHEMA))
            .withColumn("branch", F.lit("detectors"))
            .withColumn("pos", F.lit(None).cast("int"))
            .withColumn("entry_truthy", _json_obj_truthy("djson"))
        )
        from_pipelines = (
            years.where(F.col("n_det") <= 0)
            .select(
                "source",
                "year",
                F.posexplode(
                    F.from_json(F.get_json_object("ydata", "$.pipelines"), _MAP)
                ).alias("pos", "pipeline", "pdata"),
            )
            .withColumn(
                "det",
                F.from_json(
                    F.get_json_object("pdata", "$.detection"), _DETECTION_SCHEMA
                ),
            )
            .where(
                F.col("det.detector_name").isNotNull()
                & (F.col("det.detector_name") != "")
            )
            .withColumn("detector_name", F.col("det.detector_name"))
            .withColumn("branch", F.lit("pipelines"))
            .withColumn("entry_truthy", F.lit(True))
        )
        cols = [
            "source", "year", "detector_name", "det",
            "branch", "pos", "entry_truthy",
        ]
        return from_detectors.select(cols).unionByName(
            from_pipelines.select(cols)
        )

    # -- reference-parity frames --------------------------------------

    def detector_timeline(self, detector_name: str) -> DataFrame:
        """year, drift_detected, severity, score, p_value, threshold for
        one detector (data_loader.py:33-81; defaults False/'none'/0.0).

        Mirrors the reference's selection exactly: a falsy detectors-dict
        entry is skipped (``if detector_result:``), and the pipelines
        fallback takes only the FIRST pipeline whose detection matches
        (the loop ``break``s, data_loader.py:60-65)."""
        d = self._detections_df().where(F.col("detector_name") == detector_name)
        from_det = d.where(
            (F.col("branch") == "detectors") & F.col("entry_truthy")
        )
        w = Window.partitionBy("source", "year").orderBy("pos")
        from_pipe = (
            d.where(F.col("branch") == "pipelines")
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .drop("rn")
        )
        return (
            from_det.unionByName(from_pipe)
            .select(
                "year",
                F.coalesce("det.drift_detected", F.lit(False)).alias(
                    "drift_detected"
                ),
                F.coalesce("det.severity", F.lit("none")).alias("severity"),
                F.coalesce("det.score", F.lit(0.0)).alias("score"),
                F.col("det.p_value").alias("p_value"),
                F.col("det.threshold").alias("threshold"),
            )
            .orderBy("year")
        )

    def all_detectors_timeline(self) -> DataFrame:
        """year, detector (title-cased), drift_detected, severity, score
        for every detector (data_loader.py:83-135)."""
        return (
            self._detections_df()
            .select(
                "year",
                _py_title(F.col("detector_name")).alias("detector"),
                F.coalesce("det.drift_detected", F.lit(False)).alias(
                    "drift_detected"
                ),
                F.coalesce("det.severity", F.lit("none")).alias("severity"),
                F.coalesce("det.score", F.lit(0.0)).alias("score"),
            )
            .orderBy("year", "detector")
        )

    def feature_drift_timeline(self) -> DataFrame:
        """year, feature, drift_score, drift_detected, severity — from the
        year's direct localization if TRUTHY, else the FIRST pipeline whose
        dict CONTAINS the ``localization`` key (data_loader.py:137-180).

        Two reference quirks mirrored exactly: the direct value falls
        through only when Python-falsy (null OR empty object), and the
        pipeline loop breaks on key PRESENCE — a first pipeline carrying
        an explicit ``"localization": null`` wins the break and the year
        then emits nothing."""
        direct = self.years_df().select(
            "source",
            "year",
            F.get_json_object("ydata", "$.localization").alias("ljson"),
        ).withColumn("direct_ok", _json_obj_truthy("ljson"))
        w = Window.partitionBy("source", "year").orderBy("pos")
        first_pipeline = (
            self._pipelines_df()
            .withColumn("pmap", F.from_json("pdata", _MAP))
            .where(F.map_contains_key("pmap", "localization"))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(
                "source",
                "year",
                F.element_at("pmap", F.lit("localization")).alias("ljson"),
            )
        )
        loc = (
            direct.where(F.col("direct_ok")).select("source", "year", "ljson")
            .unionByName(
                direct.where(~F.col("direct_ok"))
                .select("source", "year")
                .join(first_pipeline, ["source", "year"], "inner")
            )
            .withColumn(
                "fd",
                F.from_json(
                    F.get_json_object("ljson", "$.feature_drifts"),
                    _FEATURE_DRIFT_SCHEMA,
                ),
            )
            .where(F.size("fd") > 0)
        )
        return loc.select(
            "year",
            F.explode("fd").alias("f"),
        ).select(
            "year",
            F.col("f.feature_name").alias("feature"),
            F.col("f.score").alias("drift_score"),
            F.col("f.drift_detected").alias("drift_detected"),
            F.coalesce("f.severity", F.lit("none")).alias("severity"),
        )

    def performance_metrics(self) -> DataFrame:
        """year, accuracy, accuracy_delta (data_loader.py:182-215).
        Python-``or`` fallback semantics: a metadata value that is null OR
        0.0 falls through to the year-level field, then to 0.0."""
        y = self.years_df()

        def _or(meta_path: str, year_path: str):
            meta = F.get_json_object("ydata", meta_path).cast("double")
            year_level = F.get_json_object("ydata", year_path).cast("double")
            return F.coalesce(
                F.nullif(meta, F.lit(0.0)), year_level, F.lit(0.0)
            )

        return y.select(
            "year",
            _or("$.metadata.test_accuracy", "$.actual_accuracy").alias("accuracy"),
            _or("$.metadata.accuracy_delta", "$.accuracy_drop").alias(
                "accuracy_delta"
            ),
        ).orderBy("year")

    def summary_stats(self) -> Dict:
        """Cross-year summary dict (data_loader.py:217-247)."""
        det = self.all_detectors_timeline()
        perf = self.performance_metrics()
        feat = self.feature_drift_timeline()
        d = det.agg(
            F.countDistinct("detector").alias("detectors_count"),
            F.sum(F.col("drift_detected").cast("long")).alias(
                "total_drift_events"
            ),
        ).first()
        p = perf.agg(
            F.avg("accuracy").alias("avg"),
            F.min("accuracy").alias("lo"),
            F.max("accuracy").alias("hi"),
        ).first()
        n_years = self.years_df().select("year").distinct().count()
        n_feat = (
            feat.where("drift_detected").select("feature").distinct().count()
        )
        return {
            "total_years": n_years,
            "detectors_count": int(d["detectors_count"] or 0),
            "total_drift_events": int(d["total_drift_events"] or 0),
            "avg_accuracy": float(p["avg"]) if p["avg"] is not None else 0.0,
            "accuracy_range": (
                (float(p["lo"]), float(p["hi"]))
                if p["lo"] is not None
                else (0.0, 0.0)
            ),
            "unique_drifted_features": n_feat,
        }

    def available_years(self) -> List[int]:
        return [
            r["year"]
            for r in self.years_df()
            .select("year")
            .distinct()
            .orderBy("year")
            .collect()
        ]

    def available_detectors(self) -> List[str]:
        """Sorted distinct detector names (data_loader.py:259-282).

        The reference UNIONS detectors-dict keys AND pipeline detection
        names within every year (no either/or routing, unlike the timeline
        frames) — so a year carrying both contributes both sets."""
        from_keys = self.years_df().select(
            F.explode(
                F.map_keys(
                    F.from_json(F.get_json_object("ydata", "$.detectors"), _MAP)
                )
            ).alias("detector_name")
        )
        from_pipes = (
            self._pipelines_df()
            .select(
                F.get_json_object("pdata", "$.detection.detector_name").alias(
                    "detector_name"
                )
            )
            .where(
                F.col("detector_name").isNotNull()
                & (F.col("detector_name") != "")
            )
        )
        return [
            r["detector_name"]
            for r in from_keys.unionByName(from_pipes)
            .distinct()
            .orderBy("detector_name")
            .collect()
        ]

    def rca_results(self) -> DataFrame:
        """year, detector, analyzer, feature_importances,
        recommendations, n_recommendations (data_loader.py:262-300).

        The reference keeps a pipeline only when its rca is Python-truthy
        (``if rca:``) — an explicit null OR empty-object rca is skipped,
        mirrored with the same non-empty-map check as the localization
        truthiness rule."""
        pl = (
            self._pipelines_df()
            .withColumn("rjson", F.get_json_object("pdata", "$.rca"))
            .where(_json_obj_truthy("rjson"))
            .withColumn("rca", F.from_json("rjson", _RCA_SCHEMA))
            .withColumn(
                "det",
                F.from_json(
                    F.get_json_object("pdata", "$.detection"), _DETECTION_SCHEMA
                ),
            )
        )
        return pl.select(
            "year",
            F.coalesce("det.detector_name", F.lit("unknown")).alias("detector"),
            F.coalesce("rca.analyzer_name", F.lit("unknown")).alias("analyzer"),
            F.col("rca.feature_importances").alias("feature_importances"),
            F.col("rca.recommendations").alias("recommendations"),
            F.coalesce(F.size("rca.recommendations"), F.lit(0)).alias(
                "n_recommendations"
            ),
        )

    def feature_importance_changes(self) -> DataFrame:
        """year, feature, ref_importance, test_importance, change,
        abs_change from rca.distribution_changes (data_loader.py:302-351;
        .get defaults 0.0, change defaults test - ref)."""
        pl = (
            self._pipelines_df()
            .withColumn(
                "dcm",
                F.from_json(
                    F.get_json_object("pdata", "$.rca.distribution_changes"),
                    "map<string,variant>",
                ),
            )
            .where(F.size(F.map_keys("dcm")) > 0)
            .select("year", F.explode("dcm").alias("feature", "vv"))
            # reference keeps only dict feature values (isinstance check,
            # data_loader.py:341); a struct-typed from_json can't tell a
            # scalar from an object with other keys (both parse to a null
            # struct), and a map<string,string> parse unquotes JSON strings
            # (a STRING value "{...}" would masquerade as an object) — the
            # variant type carries the true JSON type, so the object test
            # is exact for every value shape
            .where(F.schema_of_variant("vv").startswith("OBJECT"))
        )

        def _get(field):
            return F.try_variant_get("vv", f"$.{field}", "double")

        ref_imp = F.coalesce(_get("ref_importance"), F.lit(0.0))
        test_imp = F.coalesce(_get("test_importance"), F.lit(0.0))
        change = F.coalesce(_get("change"), test_imp - ref_imp)
        return pl.select(
            "year",
            "feature",
            ref_imp.alias("ref_importance"),
            test_imp.alias("test_importance"),
            change.alias("change"),
            F.abs(change).alias("abs_change"),
        )

    # -- chart-data frames (visualizations.py transforms) --------------
    # The reference dashboard's chart builders
    # (examples/dashboard/visualizations.py) are plotly figures — plotting
    # itself is out of engine scope (no plotly in env), but each builder
    # first reshapes its input frame; those transforms are the remaining
    # data surface, reproduced here as DataFrame accessors a user can feed
    # to any chart library.

    def feature_drift_pivot(self) -> DataFrame:
        """feature × year mean drift_score matrix
        (visualizations.py:118-136 create_feature_heatmap pivot_table).
        One column per year PRESENT IN THE FRAME (pandas pivot_table
        semantics — a year with no feature drift contributes no column,
        unlike available_years()), rows sorted by feature."""
        return (
            self.feature_drift_timeline()
            .groupBy("feature")
            .pivot("year")
            .avg("drift_score")
            .orderBy("feature")
        )

    def severity_distribution(self) -> DataFrame:
        """severity, count over the all-detectors timeline
        (visualizations.py:213-224 create_severity_distribution
        value_counts), count-descending with a severity tiebreak."""
        return (
            self.all_detectors_timeline()
            .groupBy("severity")
            .agg(F.count(F.lit(1)).alias("count"))
            .orderBy(F.desc("count"), "severity")
        )

    def top_drifted_features(self, top_n: int = 10) -> DataFrame:
        """feature, drift_score — mean score of DRIFTED rows per feature,
        top ``top_n`` by score (visualizations.py:286-299
        create_top_drifted_features), feature tiebreak for determinism."""
        return (
            self.feature_drift_timeline()
            .where("drift_detected")
            .groupBy("feature")
            .agg(F.avg("drift_score").alias("drift_score"))
            .orderBy(F.desc("drift_score"), "feature")
            .limit(top_n)
        )

    def importance_change_series(self, top_features: int = 5) -> DataFrame:
        """year, feature, change — restricted to the ``top_features``
        features with the largest mean |change|
        (visualizations.py:374-394 create_importance_change_timeline)."""
        changes = self.feature_importance_changes()
        top = (
            changes.groupBy("feature")
            .agg(F.avg("abs_change").alias("__avg"))
            .orderBy(F.desc("__avg"), "feature")
            .limit(top_features)
            .select("feature")
        )
        return (
            changes.join(F.broadcast(top), "feature")
            .select("year", "feature", "change")
            .orderBy("year", "feature")
        )

    def importance_change_pivot(self) -> DataFrame:
        """feature × year mean importance-change matrix
        (visualizations.py:448-468 create_feature_importance_heatmap);
        like feature_drift_pivot, columns are only the years the changes
        frame carries."""
        return (
            self.feature_importance_changes()
            .groupBy("feature")
            .pivot("year")
            .avg("change")
            .orderBy("feature")
        )

    def rca_recommendations_table(self, per_run: int = 3) -> DataFrame:
        """year, detector (title-cased), recommendation — the first
        ``per_run`` recommendations of each rca row, kept in their
        original list order within a run
        (visualizations.py:419-446 create_rca_recommendations_table)."""
        return (
            self.rca_results()
            .where(F.size("recommendations") > 0)
            .select(
                "year",
                _py_title(F.col("detector")).alias("detector"),
                F.posexplode(F.slice("recommendations", 1, per_run)).alias(
                    "rec_rank", "recommendation"
                ),
            )
            .orderBy("year", "detector", "rec_rank")
            .select("year", "detector", "recommendation")
        )

    def distribution_shift_timeline(self) -> DataFrame:
        """year, feature, ref_mean, test_mean, mean_shift, std_shift,
        separability_importance — the engine's OWN rca distribution_changes
        shape (rca.py DistributionChangeAnalyzer), which the reference
        frame above maps to zeros by design.  Beyond-reference surface."""
        schema = (
            "map<string,struct<ref_mean double, test_mean double, "
            "mean_shift double, ref_std double, test_std double, "
            "std_shift double, separability_importance double>>"
        )
        pl = (
            self._pipelines_df()
            .withColumn(
                "dc",
                F.from_json(
                    F.get_json_object("pdata", "$.rca.distribution_changes"),
                    schema,
                ),
            )
            .where(F.size(F.map_keys("dc")) > 0)
            .select("year", F.explode("dc").alias("feature", "v"))
        )
        return pl.select(
            "year",
            "feature",
            F.col("v.ref_mean").alias("ref_mean"),
            F.col("v.test_mean").alias("test_mean"),
            F.col("v.mean_shift").alias("mean_shift"),
            F.col("v.std_shift").alias("std_shift"),
            F.col("v.separability_importance").alias("separability_importance"),
        )
