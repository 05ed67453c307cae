"""Results-timeline walkthrough: the reference dashboard's data layer
(reference examples/dashboard/app.py:28-335 loads one results JSON with
DriftResultsLoader and renders plotly charts) replicated Spark-first over
any number of results files.  Rendering is out of engine scope (no
plotly/streamlit in this environment); this demo prints every frame a
dashboard would bind — run it against the golden sequence output:

    python examples/drift_sequence_demo.py          # writes outputs/...
    python examples/timeline_demo.py [results.json]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from driftspark.session import get_spark  # noqa: E402
from driftspark.timeline import DriftResultsTimeline  # noqa: E402


def main(results_path: str, spark=None) -> dict:
    """Print (and return) every dashboard frame for ``results_path``."""
    spark = spark or get_spark(master="local[4]", shuffle_partitions=8)
    frames = {}
    with DriftResultsTimeline(spark, results_path) as tl:
        print(f"== results: {results_path}")
        print(f"years: {tl.available_years()}")
        print(f"detectors: {tl.available_detectors()}")

        frames["all_detectors"] = tl.all_detectors_timeline().toPandas()
        print("\n== all-detectors timeline ==")
        print(frames["all_detectors"].to_string(index=False))

        for name in tl.available_detectors():
            frames[f"detector:{name}"] = tl.detector_timeline(name).toPandas()

        frames["feature_drift"] = tl.feature_drift_timeline().toPandas()
        print("\n== per-feature drift ==")
        print(frames["feature_drift"].to_string(index=False))

        frames["performance"] = tl.performance_metrics().toPandas()
        print("\n== performance ==")
        print(frames["performance"].to_string(index=False))

        frames["summary"] = tl.summary_stats()
        print("\n== summary ==")
        for k, v in frames["summary"].items():
            print(f"  {k}: {v}")

        # chart-data frames (the visualizations.py transforms)
        frames["feature_pivot"] = tl.feature_drift_pivot().toPandas()
        print("\n== feature x year drift heatmap data ==")
        print(frames["feature_pivot"].to_string(index=False))

        frames["severity"] = tl.severity_distribution().toPandas()
        print("\n== severity distribution ==")
        print(frames["severity"].to_string(index=False))

        frames["top_features"] = tl.top_drifted_features().toPandas()
        print("\n== top drifted features ==")
        print(frames["top_features"].to_string(index=False))

        frames["rca"] = tl.rca_results().drop("feature_importances").toPandas()
        print("\n== rca runs ==")
        print(frames["rca"].drop(columns="recommendations").to_string(index=False))

        frames["recommendations"] = tl.rca_recommendations_table().toPandas()
        print("\n== recommendations ==")
        print(frames["recommendations"].to_string(index=False))

        frames["shifts"] = tl.distribution_shift_timeline().toPandas()
        print("\n== distribution shifts (engine-native rca shape) ==")
        print(frames["shifts"].to_string(index=False))
    return frames


if __name__ == "__main__":
    default = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "outputs",
        "drift_sequence_results.json",
    )
    main(sys.argv[1] if len(sys.argv) > 1 else default)
