"""Schema + expectation validation — the "schema" half of the north rule's
"schema + constraint validation engine".

Schema conformance is a metadata-only check (no jobs): declared columns
present with the declared types, extras reported, optional strict mode.
Row-level expectations (not-null, value ranges, regex formats, set
membership) compile to ONE conditional-sum aggregation job for the counts
plus lazily-built violation-row DataFrames — the Deequ-style check layer
the reference lacks (its DataValidator only warns on nulls/inf/variance,
data/validators.py:20-140).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

IMAGE_TABLE_DDL = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash bigint"
)


@dataclass
class SchemaCheckResult:
    ok: bool
    missing: List[str] = field(default_factory=list)
    extra: List[str] = field(default_factory=list)
    type_mismatches: Dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> Dict[str, Any]:
        return {
            "ok": self.ok,
            "missing": self.missing,
            "extra": self.extra,
            "type_mismatches": self.type_mismatches,
        }


def check_schema(
    df: DataFrame,
    expected: Union[str, StructType],
    strict: bool = False,
) -> SchemaCheckResult:
    """Validate df's schema against a DDL string or StructType.

    Non-strict (default): extra columns are reported but allowed (the
    north-rule image table carries part/split/fk columns beyond the core
    seven).  Strict: extras fail too.  Metadata only — no Spark jobs."""
    if isinstance(expected, str):
        expected = StructType.fromDDL(expected)
    actual = {f.name: f.dataType for f in df.schema.fields}
    exp = {f.name: f.dataType for f in expected.fields}
    missing = [c for c in exp if c not in actual]
    extra = [c for c in actual if c not in exp]
    mism = {
        c: {"expected": str(exp[c]), "actual": str(actual[c])}
        for c in exp
        if c in actual and actual[c] != exp[c]
    }
    ok = not missing and not mism and (not strict or not extra)
    return SchemaCheckResult(ok=ok, missing=missing, extra=extra, type_mismatches=mism)


# ---------------------------------------------------------------------------
# Row-level expectations
# ---------------------------------------------------------------------------


@dataclass
class Expectation:
    """A named boolean predicate over a row; violation = predicate false."""

    name: str
    predicate: Column

    def violation(self) -> Column:
        # null predicate (e.g. comparison against NULL) counts as violation
        return ~F.coalesce(self.predicate, F.lit(False))


def expect_not_null(col: str) -> Expectation:
    return Expectation(f"not_null({col})", F.col(col).isNotNull())


def expect_range(col: str, lo=None, hi=None) -> Expectation:
    pred = F.lit(True)
    if lo is not None:
        pred = pred & (F.col(col) >= lo)
    if hi is not None:
        pred = pred & (F.col(col) <= hi)
    return Expectation(f"range({col},[{lo},{hi}])", pred)


def expect_regex(col: str, pattern: str) -> Expectation:
    return Expectation(f"regex({col})", F.col(col).rlike(pattern))


def expect_in(col: str, values: Sequence) -> Expectation:
    return Expectation(f"in({col})", F.col(col).isin(list(values)))


def expect_positive_dims(w_col: str = "w", h_col: str = "h", max_side: int = 65536) -> List[Expectation]:
    """Image-table convenience: sane width/height."""
    return [expect_range(w_col, 1, max_side), expect_range(h_col, 1, max_side)]


def run_expectations(
    df: DataFrame,
    expectations: Sequence[Expectation],
    group_col: Optional[str] = None,
) -> DataFrame:
    """Violation COUNTS for all expectations in ONE aggregation job
    (conditional sums, map-side combined).  Output: [group_col,]
    expectation, n_rows, n_violations, violation_rate, passed."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, e in enumerate(expectations):
        # positional aliases: expectation names may contain dots/brackets
        # that F.col would parse as struct paths
        aggs.append(F.sum(e.violation().cast("long")).alias(f"__v{i}"))
    gcols = [group_col] if group_col else []
    wide = df.groupBy(*gcols).agg(*aggs) if gcols else df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(e.name).alias("expectation"),
            F.col("__n").alias("n_rows"),
            F.col(f"__v{i}").alias("n_violations"),
            # try_divide: an empty frame has __n = 0 (ANSI abort)
            F.try_divide(F.col(f"__v{i}"), F.col("__n")).alias("violation_rate"),
            (F.col(f"__v{i}") == 0).alias("passed"),
        )
        for i, e in enumerate(expectations)
    ]
    return wide.select(*gcols, F.explode(F.array(*structs)).alias("s")).select(
        *gcols, "s.*"
    )


def expectation_violations(
    df: DataFrame, expectations: Sequence[Expectation], id_cols: Sequence[str]
) -> DataFrame:
    """Violation ROWS: (id_cols..., failed_expectations array) for every
    row breaking at least one expectation — written next to the verdict
    table at scale, never collected."""
    flags = [
        F.when(e.violation(), F.lit(e.name)) for e in expectations
    ]
    failed = F.array_compact(F.array(*flags))
    return (
        df.withColumn("failed_expectations", failed)
        .where(F.size("failed_expectations") > 0)
        .select(*id_cols, "failed_expectations")
    )


def image_table_expectations() -> List[Expectation]:
    """The north-rule image table's standing expectations."""
    return [
        expect_not_null("image_id"),
        expect_not_null("bytes"),
        expect_regex("image_id", r"^img_[0-9]+$"),
        expect_in("fmt", ["png", "jpeg"]),
        *expect_positive_dims(),
        expect_not_null("caption"),
    ]
