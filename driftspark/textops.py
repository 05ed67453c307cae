"""Text analysis operators for training-data pipelines.

Language ID (stopword-hit heuristic), quality scoring (length / punctuation
/ stopword / casing ratios), token counting (whitespace + a BPE-ish regex
subword estimate), and document fingerprinting.  Pure column expressions —
regexp/length/split are JVM intrinsics inside whole-stage codegen; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from driftspark.partitioning import spread_input


def _spread_text(df: DataFrame) -> DataFrame:
    """spread_input for the column-APPENDING text ops: these return the
    full input frame plus new columns, so the guard would shuffle every
    payload byte, not just the text.  Skip the spread when the frame
    carries binary/array payload columns (image bytes, embeddings — the
    shuffle would cost more than the regex work it parallelizes); plain
    string/numeric frames spread as usual."""
    from pyspark.sql.types import ArrayType, BinaryType

    if any(isinstance(f.dataType, (BinaryType, ArrayType)) for f in df.schema.fields):
        return df
    return spread_input(df)

# small public stopword profiles (top function words) per language
LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "sich", "auf"],
    "fr": ["le", "la", "et", "les", "des", "est", "dans", "que", "une", "pour"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "un", "por", "con"],
}


def _word_hits(text: Column, words) -> Column:
    """Count of profile-word occurrences as standalone tokens."""
    pattern = r"(?i)\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(1)))


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", 0).otherwise(F.size(F.split(trimmed, r"\s+")))


def subword_count(text: Column) -> Column:
    """BPE-ish subword-unit estimate: alphanumeric runs + standalone
    punctuation marks each count as a token (a cheap proxy for byte-pair
    tokenizer output used for corpus token accounting)."""
    return F.size(
        F.regexp_extract_all(text, F.lit(r"([A-Za-z0-9]{1,4}|[^\sA-Za-z0-9])"), F.lit(1))
    )


def with_text_stats(df: DataFrame, text_col: str) -> DataFrame:
    """Append n_chars / n_tokens / n_subwords / avg_token_len /
    punct_ratio / digit_ratio / upper_ratio columns."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    safe = F.greatest(n_chars, F.lit(1))
    return (
        df.withColumn("n_chars", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn("n_subwords", subword_count(t))
        .withColumn(
            "avg_token_len",
            F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0)),
        )
        .withColumn("punct_ratio", n_punct / safe)
        .withColumn("digit_ratio", n_digit / safe)
        .withColumn("upper_ratio", n_upper / safe)
    )


def quality_score(df: DataFrame, text_col: str) -> DataFrame:
    """Heuristic document quality in [0, 1]: rewards natural length,
    moderate word length, a healthy stopword rate; penalizes punctuation /
    digit / uppercase excess.  (Gopher-rules-style filtering signals.)

    The input is spread first when its scan is low-parallelism (single
    row-group files): the regex/stat columns are the heavy part of this
    plan and would otherwise evaluate in one task."""
    d = with_text_stats(_spread_text(df), text_col)
    stop_hits = _word_hits(F.col(text_col), LANG_PROFILES["en"])
    stop_ratio = stop_hits / F.greatest(F.col("n_tokens"), F.lit(1))
    length_ok = (
        F.when((F.col("n_tokens") >= 5) & (F.col("n_tokens") <= 100000), 1.0)
        .otherwise(0.0)
    )
    wordlen_ok = (
        F.when((F.col("avg_token_len") >= 2) & (F.col("avg_token_len") <= 12), 1.0)
        .otherwise(0.0)
    )
    score = (
        0.3 * length_ok
        + 0.2 * wordlen_ok
        + 0.2 * F.least(stop_ratio * 5, F.lit(1.0))
        + 0.1 * (1 - F.least(F.col("punct_ratio") * 4, F.lit(1.0)))
        + 0.1 * (1 - F.least(F.col("digit_ratio") * 4, F.lit(1.0)))
        + 0.1 * (1 - F.least(F.col("upper_ratio") * 4, F.lit(1.0)))
    )
    return d.withColumn("quality_score", score)


def detect_language(df: DataFrame, text_col: str) -> DataFrame:
    """Append lang_pred: argmax of per-language stopword hit counts,
    'und' (undetermined) when nothing matches.  Ties break by profile
    order (en, de, fr, es)."""
    df = _spread_text(df)
    t = F.col(text_col)
    hit_cols = {lang: _word_hits(t, words) for lang, words in LANG_PROFILES.items()}
    best = F.greatest(*hit_cols.values())
    pred = F.lit("und")
    for lang in reversed(list(LANG_PROFILES)):  # earlier profiles win ties
        pred = F.when((hit_cols[lang] > 0) & (hit_cols[lang] == best), F.lit(lang)).otherwise(pred)
    return df.withColumn("lang_pred", pred)


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set.  Robust to shuffling/whitespace; pairs with exact_duplicates
    for bag-of-words dedup."""
    toks = F.array_sort(
        F.array_distinct(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
        )
    )
    df = spread_input(df.select(id_col, text_col))
    return df.select(
        F.col(id_col),
        F.md5(F.concat_ws(" ", toks)).alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# PII scanning (training-data filter pass)
# ---------------------------------------------------------------------------

# Patterns live in the Java-regex AND RE2 common subset (no backrefs, no
# lookaround) so the DuckDB oracle evaluates the IDENTICAL expressions.
# Counts are per-pattern and independent — a phone-shaped substring inside
# a longer number can legitimately count under two patterns.
PII_PATTERNS = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "phone": r"\+?\d[\d().\- ]{7,14}\d",
    "ipv4": r"\b(\d{1,3}\.){3}\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def pii_scan(df: DataFrame, text_col: str) -> DataFrame:
    """Append per-pattern PII match counts (``pii_email``, ``pii_phone``,
    ``pii_ipv4``, ``pii_ssn``) and a ``has_pii`` flag — the filter pass a
    training pipeline runs before a corpus ships.

    Pure JVM ``regexp_count`` column expressions: no UDFs, whole-stage
    codegen, trivially scan-parallel at any scale.  NULL text scans as
    zero matches (explicitly coalesced — counts are counts, not NULLs).
    """
    df = _spread_text(df)
    t = F.col(text_col)
    counts = {
        name: F.coalesce(
            F.regexp_count(t, F.lit(pat)), F.lit(0)
        ).cast("long").alias(f"pii_{name}")
        for name, pat in PII_PATTERNS.items()
    }
    out = df.select("*", *counts.values())
    flag = None
    for name in PII_PATTERNS:
        c = F.col(f"pii_{name}") > 0
        flag = c if flag is None else (flag | c)
    return out.withColumn("has_pii", flag)
