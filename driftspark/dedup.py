"""Deduplication operators for large-scale training-data pipelines.

Exact (hash groupBy), MinHash+LSH (shingle → minhash → band → bucket join),
SimHash (bit-majority over token hashes + banded hamming candidates), and
token-set Jaccard.  All are pure DataFrame compositions — shuffles only on
key/bucket columns, map-side partial aggregation everywhere, no UDFs.

Scale notes:
* MinHash signatures aggregate per document (one shuffle at doc grain);
  LSH banding turns the quadratic all-pairs problem into an equi-join on
  (band, band_hash) buckets.  Hot buckets (boilerplate docs) are bounded by
  ``max_bucket_size``.
* Jaccard token-join drops tokens above a document-frequency ceiling
  (stop-token suppression) — without it the self-join explodes on "the".
* MinHash uses md5-derived hashes so an external engine (DuckDB oracle)
  can reproduce signatures exactly; SimHash uses xxhash64 (JVM intrinsic,
  faster) and is verified by property tests instead.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)


from driftspark.partitioning import spread_input as _spread_input


def tokens(df: DataFrame, id_col: str, text_col: str, distinct: bool = True) -> DataFrame:
    """(id, token) long form — whitespace tokenization, lowercased."""
    t = _spread_input(df.select(id_col, text_col)).select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token"),
    ).where(F.col("token") != "")
    return t.distinct() if distinct else t


def _content_hash(content_cols: Sequence[str]):
    """Collision-proof content hash shared by exact_duplicates and
    exact_dedup.  One column hashes directly; multiple columns hash the
    per-column md5s joined with a delimiter plus an explicit NULL token —
    the former concat_ws(separator) both SKIPPED NULLs (("x", NULL) vs
    (NULL, "x") collided, and exact_dedup would DELETE the distinct row)
    and was ambiguous for values containing the separator byte."""
    if len(content_cols) == 1:
        return F.md5(F.col(content_cols[0]).cast("string"))
    parts = [
        F.coalesce(F.md5(F.col(c).cast("string")), F.lit("<NULL>"))
        for c in content_cols
    ]
    return F.md5(F.concat_ws("|", *parts))


def exact_duplicates(
    df: DataFrame, content_cols: Sequence[str], id_col: Optional[str] = None
) -> DataFrame:
    """Exact-content duplicate groups: (content_hash, dup_count [, ids]).

    Hash-groupBy — the canonical first dedup pass; partial agg map-side."""
    h = _content_hash(content_cols)
    g = df.select(h.alias("content_hash"), *( [F.col(id_col)] if id_col else [] ))
    agg = [F.count(F.lit(1)).alias("dup_count")]
    if id_col:
        agg.append(F.sort_array(F.collect_list(id_col)).alias("ids"))
    return g.groupBy("content_hash").agg(*agg).where(F.col("dup_count") > 1)


def exact_dedup(df: DataFrame, content_cols: Sequence[str], order_col: str) -> DataFrame:
    """Keep one row per content hash (smallest order_col) — distributed
    keep-first via window rank, no collect."""
    h = _content_hash(content_cols)
    w = Window.partitionBy(h).orderBy(F.col(order_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    shingle_size: int = 1,
) -> DataFrame:
    """Per-document MinHash signature: sig_k = min over shingles of
    md5(shingle || ':' || k).  shingle_size=1 → word shingles; >1 → word
    n-grams (sliding window via posexplode + self-join-free array slicing).

    Returns (id, mh0..mh{n-1}).  One explode + one groupBy(doc) shuffle."""
    return _signatures_from_tokens(
        ngrams(df, id_col, text_col, shingle_size), n_hashes
    )


def ngrams(
    df: DataFrame, id_col: str, text_col: str, n: int, distinct: bool = True
) -> DataFrame:
    """(id, token) long form of word n-grams — n=1 is plain tokens; n>1
    slides a window via sequence + array slicing (texts shorter than n
    yield their single short gram, the minhash shingle convention)."""
    if n == 1:
        return tokens(df, id_col, text_col, distinct)
    # drop empty words BEFORE sliding (Spark split keeps leading/trailing
    # empties at limit -1: a whitespace-only text would otherwise emit a
    # single-space gram) — grams are built over TOKENS, matching tokens()
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    out = (
        _spread_input(df.select(id_col, text_col))
        .select(F.col(id_col).alias("id"), F.explode(grams).alias("token"))
        .where(F.col("token") != "")
    )
    return out.distinct() if distinct else out


def _signatures_from_tokens(tok: DataFrame, n_hashes: int) -> DataFrame:
    """(id, token) -> (id, mh0..mh{n-1}) — the single definition of the
    md5 min-hash signature, shared by minhash_signatures and the
    near-duplicate pipeline (and mirrored by the DuckDB oracle)."""
    aggs = [
        F.min(F.md5(F.concat(F.col("token"), F.lit(f":{k}")))).alias(f"mh{k}")
        for k in range(n_hashes)
    ]
    return tok.groupBy("id").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    n_hashes: int = 16,
    bands: int = 4,
    max_bucket_size: int = 200,
) -> DataFrame:
    """MinHash-LSH candidate pairs: split the signature into ``bands``
    bands of ``n_hashes/bands`` rows; docs sharing any band bucket are
    candidates.  Self-join happens per (band, bucket) with oversized
    buckets dropped (boilerplate guard).  Returns (id_a, id_b) distinct,
    id_a < id_b.

    A group of more than ``max_bucket_size`` docs with the IDENTICAL full
    signature saturates every one of its band buckets, so the cap alone
    would drop ALL the group's pairs — such groups emit min-id star pairs
    instead (the simhash hamming-0 fix is the precedent), and downstream
    Jaccard verification still checks every emitted pair.  The star scan
    is bounded: only cap-dropped docs can belong to such a cluster, so the
    full-signature window runs over that (usually empty) subset, not the
    corpus."""
    rows_per_band = n_hashes // bands
    if rows_per_band == 0:
        raise ValueError(
            f"bands={bands} > n_hashes={n_hashes}: every band would hash "
            "zero signature rows (one constant bucket for the whole corpus)"
        )
    if n_hashes % bands:
        logger.warning(
            "lsh_candidate_pairs: n_hashes=%d not divisible by bands=%d — "
            "the trailing %d hash(es) are unused for banding",
            n_hashes, bands, n_hashes % bands,
        )
    band_structs = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_structs.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *cols)).alias("bucket"))
        )
    buckets = signatures.select(
        "id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("id", "bb.band", "bb.bucket")
    # hot-bucket cap via partial-aggregated groupBy + anti-join, NOT a
    # count window: the window sorts the full n*bands exploded table per
    # consumer (both self-join sides), while the groupBy shuffles only
    # per-partition (bucket, count) partials and the over-cap output is
    # tiny — AQE converts the anti-join to broadcast at runtime, so the
    # exploded table is filtered in place without a sort.  No explicit
    # broadcast(): a pathological corpus (most docs in over-cap clusters)
    # can make `hot` large, and the anti-join then degrades to a shuffle
    # join on the SAME key the candidate self-join shuffles on anyway.
    hot = (
        buckets.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > max_bucket_size)
        .select("band", "bucket")
    )
    sized = buckets.join(hot, ["band", "bucket"], "left_anti")
    a = sized.select("band", "bucket", F.col("id").alias("id_a"))
    b = sized.select("band", "bucket", F.col("id").alias("id_b"))
    banded = (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    star = _star_pairs(signatures, n_hashes, rows_per_band, max_bucket_size)
    # plain union, NOT dropDuplicates: the two pair sets are provably
    # disjoint, so deduplicating would re-shuffle the entire candidate
    # set for nothing.  Proof: a star pair's endpoints belong to an
    # identical-full-signature cluster of size > max_bucket_size; every
    # band bucket of such a doc contains the whole cluster (identical
    # signatures band-hash identically), so all its buckets are over the
    # cap and it appears in NO banded pair.  banded is internally
    # distinct (.distinct() above); star is internally distinct (one row
    # per non-root member of each cluster).
    return banded.unionByName(star)


def _star_pairs(
    signatures: DataFrame, n_hashes: int, rows_per_band: int,
    max_bucket_size: int,
) -> DataFrame:
    """Min-id star pairs of identical-FULL-signature clusters larger than
    ``max_bucket_size`` — the pairs the bucket cap would otherwise drop
    wholesale (such a cluster saturates every one of its band buckets).

    Cost discipline (this pass runs on EVERY call): one narrow projection
    of the (cached) signature table to (id, full-sig hash, band-0 bucket
    hash) — the 16 signature columns never enter a join or shuffle — then
    a partial-aggregated groupBy over the band-0 buckets whose over-cap
    output (~empty in the common case) is AQE-broadcast back onto the
    narrow projection at runtime, so the probe side moves no rows (no
    FORCED broadcast — a duplicate-dominated corpus makes it n/cap rows).  Only cap-dropped docs
    (over-cap band-0 bucket — a superset of every over-cap full-signature
    cluster, since identical signatures band-hash identically) reach the
    full-signature window, which therefore sorts the hot subset, not the
    corpus.  An earlier variant re-evaluated the exploded n*bands
    bucket-size window a third time; that was the measured minhash_lsh
    overhead vs the pre-star engine."""
    narrow = signatures.select(
        "id",
        F.md5(
            F.concat_ws("|", *[F.col(f"mh{k}") for k in range(n_hashes)])
        ).alias("fs"),
        F.md5(
            F.concat_ws("|", *[F.col(f"mh{r}") for r in range(rows_per_band)])
        ).alias("bucket"),
    )
    hot = (
        narrow.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > max_bucket_size)
        .select("bucket")
    )
    wsig = Window.partitionBy("fs")
    # no explicit broadcast(): hot is ~empty in the common case and AQE
    # converts the join at runtime; on a duplicate-dominated corpus hot
    # can reach n/cap rows, where a forced broadcast would OOM the driver
    # (same reasoning as the cap filter in lsh_candidate_pairs)
    return (
        narrow.join(hot, "bucket")
        .select("id", "fs")
        .withColumn("__sz", F.count(F.lit(1)).over(wsig))
        .where(F.col("__sz") > max_bucket_size)
        .withColumn("__root", F.min("id").over(wsig))
        .where(F.col("id") != F.col("__root"))
        .select(F.col("__root").alias("id_a"), F.col("id").alias("id_b"))
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    min_jaccard: float = 0.7,
    storage_level=None,
    max_bucket_size: int = 200,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures → banded candidates →
    exact token-Jaccard verification of candidates only.  Returns
    (id_a, id_b, jaccard >= min_jaccard).

    The token table feeds the signatures AND the per-doc token-array
    aggregation of the verification stage; the signature table feeds both
    sides of the bucket self-join and the star pass — both are cached so
    each expensive explode/distinct/agg runs once instead of twice (at
    10^12 scale these spill to disk, which still beats recomputing the
    distinct-token shuffle).  The caches stay
    registered on the returned DataFrame's lineage (Spark evicts LRU);
    callers looping over many corpora in one session can reclaim storage
    early with ``spark.catalog.clearCache()``.

    ``storage_level`` overrides the default MEMORY_AND_DISK persistence of
    the two intermediate tables — at corpus scale pass
    ``StorageLevel.DISK_ONLY`` so the exploded token table (typically tens
    of times the document bytes) cannot evict hotter executor caches."""
    from pyspark import StorageLevel

    lvl = storage_level or StorageLevel.MEMORY_AND_DISK
    tok = tokens(df, id_col, text_col).persist(lvl)
    sigs = _signatures_from_tokens(tok, n_hashes).persist(lvl)
    cands = lsh_candidate_pairs(sigs, n_hashes, bands, max_bucket_size)
    # exact Jaccard verification via per-doc token ARRAYS: one groupBy
    # builds (id, tokens[]) and the candidate pairs attach both sides'
    # arrays (AQE broadcasts the array table when it fits, sort-merge
    # otherwise), with |intersection| computed in-JVM by array_intersect.
    # This replaces the former token-long-form plan — two shuffle joins
    # that multiplied each doc's token rows by its pair count, plus a
    # (id_a, id_b) re-aggregation and a separate sizes join — with one
    # aggregation and two joins; tok is distinct per doc, so
    # size(array_intersect) and size(array) equal the old distinct-token
    # intersection and set sizes exactly (element order is irrelevant).
    arrays = tok.groupBy("id").agg(F.collect_list("token").alias("toks"))
    out = (
        cands
        .join(arrays.select(F.col("id").alias("id_a"), F.col("toks").alias("ta")), "id_a")
        .join(arrays.select(F.col("id").alias("id_b"), F.col("toks").alias("tb")), "id_b")
        .select(
            "id_a", "id_b",
            F.size(F.array_intersect("ta", "tb")).alias("inter"),
            F.size("ta").alias("na"),
            F.size("tb").alias("nb"),
        )
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .where(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_jaccard: float = 0.5,
    max_token_df: int = 1000,
    storage_level=None,
) -> DataFrame:
    """All-pairs token-set Jaccard via token self-join with stop-token
    suppression (tokens appearing in more than ``max_token_df`` docs are
    excluded from pairing but still count toward set sizes).
    ``storage_level`` as in :func:`minhash_near_duplicates`."""
    from pyspark import StorageLevel

    tok = tokens(df, id_col, text_col).persist(
        storage_level or StorageLevel.MEMORY_AND_DISK
    )
    sizes = tok.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    docfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    rare = tok.join(
        F.broadcast(docfreq.where(F.col("df") <= max_token_df).select("token")), "token"
    )
    shared = (
        rare.select(F.col("id").alias("id_a"), "token")
        .join(rare.select(F.col("id").alias("id_b"), "token"), "token")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        shared.join(sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .where(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


def drop_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    min_jaccard: float = 0.8,
    max_rounds: int = 20,
    max_bucket_size: int = 200,
) -> DataFrame:
    """Remove near-duplicate documents, keeping the smallest id of each
    duplicate group (cluster representative).

    Pipeline: MinHash-LSH verified pairs → connected components collapsed
    to min-id via label propagation iterated TO FIXPOINT (stop when no
    label changes, ``max_rounds`` guard) → anti-join the losers out of the
    corpus.  Each round combines a neighbor-min step with pointer-jumping
    (label <- label's label), so chains of length L converge in O(log L)
    rounds — a boilerplate mega-cluster at 100 TB scale collapses to one
    representative instead of silently keeping every 2^rounds-th hop.
    ``localCheckpoint`` truncates the per-round lineage."""
    pairs = minhash_near_duplicates(
        df, id_col, text_col, n_hashes=n_hashes, bands=bands,
        min_jaccard=min_jaccard, max_bucket_size=max_bucket_size,
    ).select("id_a", "id_b")
    # label propagation: each node's label = min(label of neighbors, self)
    edges = pairs.unionByName(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    ).localCheckpoint()
    labels = (
        edges.select(F.col("id_a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        neigh = (
            edges.join(labels, edges.id_b == labels.id)
            .groupBy("id_a")
            .agg(F.min("label").alias("nl"))
        )
        stepped = labels.join(neigh, labels.id == neigh.id_a, "left").select(
            "id", F.least(F.col("label"), F.coalesce("nl", "label")).alias("label")
        )
        # pointer jumping: a label is always some node's id, so chase one
        # hop of the label chain each round (halves chain depth)
        chain = stepped.select(
            F.col("id").alias("pid"), F.col("label").alias("plabel")
        )
        new_labels = (
            stepped.join(chain, stepped.label == chain.pid, "left")
            .select("id", F.coalesce("plabel", "label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    losers = labels.where(F.col("label") != F.col("id")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def simhash64(
    df: DataFrame, id_col: str, text_col: str, hash_fn: str = "xxhash64"
) -> DataFrame:
    """SimHash per document: bit k of the fingerprint is the sign of
    sum over tokens of (2*bit_k(hash(token)) - 1).  Conditional-sum
    aggregates, all JVM-side (hash + bit ops), one groupBy(doc).

    hash_fn="xxhash64" (default): 64-bit fingerprint, JVM-intrinsic hash —
    the scale path.  hash_fn="md5": 60-bit fingerprint from the first 15
    hex chars of md5 — engine-portable, so an external SQL engine (the
    DuckDB driver oracle) reproduces fingerprints exactly."""
    tok = tokens(df, id_col, text_col)
    if hash_fn == "md5":
        h = F.conv(F.substring(F.md5("token"), 1, 15), 16, 10).cast("long")
        bits = 60
    else:
        h = F.xxhash64("token")
        bits = 64
    aggs = [
        F.sum(
            (F.shiftrightunsigned(h, k).bitwiseAND(F.lit(1)) * 2 - 1).cast("long")
        ).alias(f"s{k}")
        for k in range(bits)
    ]
    sums = tok.groupBy("id").agg(*aggs)
    fp = F.lit(0).cast("long")
    for k in range(bits):
        # bit 63 is the sign bit of the signed long
        bit_val = F.lit(1 << k).cast("long") if k < 63 else F.lit(-(1 << 63)).cast("long")
        fp = fp.bitwiseOR(F.when(F.col(f"s{k}") > 0, bit_val).otherwise(F.lit(0).cast("long")))
    return sums.select("id", fp.alias("simhash"))


def simhash_near_duplicates(
    sim: DataFrame, max_hamming: int = 3, chunks: int | None = None,
    max_bucket_size: int = 2000,
) -> DataFrame:
    """Hamming-near pairs from simhash fingerprints via the chunk trick:
    two 64-bit hashes within hamming distance < chunks must share at least
    one exact bit-chunk (pigeonhole) → equi-join per chunk, verify hamming
    exactly (bit_count of xor).

    ``chunks`` defaults to ``max_hamming + 1`` — the SMALLEST count for
    which the pigeonhole guarantee holds (a pair may flip at most one bit
    per chunk; with max_hamming + 1 chunks one chunk must survive intact).
    An explicit ``chunks <= max_hamming`` would silently miss pairs that
    flip one bit in EVERY chunk, so it is clamped up with a warning.  The
    64 bits split into ``chunks`` near-equal contiguous spans (4 chunks →
    the classic 16-bit spans).

    Hamming-0 groups (identical fingerprints — boilerplate mega-clusters,
    the most common real near-dup shape) are handled FIRST as star pairs
    to each group's min id: O(group) rows instead of the chunk join's
    O(group^2), so a million-document duplicate cluster still collapses.
    The remaining hamming 1..max pairs go through the chunk join with
    ``max_bucket_size`` capping each (chunk, value) bucket — without the
    cap a popular chunk value makes the join quadratic in the hottest
    bucket at 10^12-doc scale.  Dropped hot buckets lose only
    CROSS-fingerprint near-pairs whose every chunk is hot (documented
    recall bound; hamming-0 recall is total via the star path).

    OUTPUT CONTRACT: the guaranteed property is COMPONENT CONNECTIVITY —
    every document in an identical-fingerprint group is connected to the
    group (via its star pair to the min id), and hamming 1..max edges are
    found up to the hot-bucket recall bound.  The output is NOT a complete
    hamming<=k pair list: pairwise edges among non-min members of an
    identical-fingerprint group are emitted only when their (chunk, value)
    buckets fit ``max_bucket_size``.  Consumers that need every pair (not
    just connected components, which drop_near_duplicates consumes) must
    raise ``max_bucket_size`` to cover their largest group."""
    if chunks is None:
        chunks = max_hamming + 1
    elif chunks <= max_hamming:
        logger.warning(
            "simhash_near_duplicates: chunks=%d cannot guarantee recall at "
            "max_hamming=%d (a pair flipping one bit per chunk shares no "
            "chunk); clamping to chunks=%d",
            chunks, max_hamming, max_hamming + 1,
        )
        chunks = max_hamming + 1
    if chunks > 64:
        raise ValueError(f"chunks={chunks} > 64 bits of fingerprint")
    sim = sim.select("id", "simhash")
    # hamming-0 star via groupBy + join-back on the duplicated subset,
    # not a full-table window: the groupBy ships per-partition partials
    # and its >1 output (distinct duplicated fingerprints) is usually
    # tiny — AQE broadcasts it, so the corpus is never sorted
    dup_groups = (
        sim.groupBy("simhash")
        .agg(F.min("id").alias("__min"), F.count(F.lit(1)).alias("__cnt"))
        .where(F.col("__cnt") > 1)
        .select("simhash", "__min")
    )
    star = (
        sim.join(dup_groups, "simhash")
        .where(F.col("id") != F.col("__min"))
        .select(
            F.col("__min").alias("id_a"),
            F.col("id").alias("id_b"),
            F.lit(0).cast("integer").alias("hamming"),
        )
    )
    # near-equal contiguous bit spans covering all 64 bits; chunks=4
    # reproduces the classic [0,16,32,48] 16-bit layout bit-identically
    bounds = [i * 64 // chunks for i in range(chunks + 1)]

    def _span(c):
        width = bounds[c + 1] - bounds[c]
        shifted = F.shiftrightunsigned(F.col("simhash"), bounds[c])
        if width >= 64:  # chunks=1: the whole fingerprint, no mask fits a long
            return shifted
        return shifted.bitwiseAND(F.lit((1 << width) - 1))

    chunk_structs = [
        F.struct(F.lit(c).alias("chunk"), _span(c).alias("v"))
        for c in range(chunks)
    ]
    e = sim.select(
        "id", "simhash", F.explode(F.array(*chunk_structs)).alias("cc")
    ).select("id", "simhash", "cc.chunk", "cc.v")
    # chunk-bucket cap: groupBy partials + anti-join (no window sort of
    # the n*chunks exploded table; see lsh_candidate_pairs)
    hot_chunks = (
        e.groupBy("chunk", "v")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > max_bucket_size)
        .select("chunk", "v")
    )
    e = e.join(hot_chunks, ["chunk", "v"], "left_anti")
    a = e.select("chunk", "v", F.col("id").alias("id_a"), F.col("simhash").alias("ha"))
    b = e.select("chunk", "v", F.col("id").alias("id_b"), F.col("simhash").alias("hb"))
    near = (
        a.join(b, ["chunk", "v"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"))
        # filter BEFORE the distinct: far-apart pairs drop map-side
        # instead of flowing through the dedup shuffle
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    # star pairs first so hamming-0 duplicates survive even when every
    # chunk bucket of a mega-cluster exceeds the cap
    return star.unionByName(near).dropDuplicates(["id_a", "id_b"])


# ---------------------------------------------------------------------------
# Test-set contamination (decontamination pre-pass for training corpora)
# ---------------------------------------------------------------------------


def contamination_report(
    test_df: DataFrame,
    ref_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    threshold: float = 0.0,
    hash_fn: str = "xxhash64",
    min_hits: int = 1,
) -> DataFrame:
    """Per-document n-gram overlap of ``test_df`` against the ``ref_df``
    corpus — THE decontamination question for training pipelines: which
    eval/benchmark documents leak into the training set (or vice versa).

    FALSE-POSITIVE bound of the default hash join: xxhash64 collides a
    clean test gram with SOME ref gram at rate ~G²/2^65 over G distinct
    grams — negligible below ~10^9 grams, but at 10^12 grams a few 10^4
    collisions are EXPECTED, and threshold=0 flags a document on a
    single hit.  At that scale raise ``min_hits`` (a real leak shares
    many grams; a collision shares one) or a fractional ``threshold``,
    or verify flagged docs with ``hash_fn="md5"`` (128-bit).

    One distinct-gram set per side; the join runs on an n-gram HASH
    (xxhash64 default — 8-byte shuffle keys instead of long strings at
    10^12 grams; ``hash_fn="md5"`` is the engine-portable oracle path,
    the simhash convention) with AQE free to pick broadcast vs
    sort-merge.  Documents whose text yields NO grams (empty/whitespace)
    are still reported — n_ngrams 0, rate NULL, contaminated false —
    absence of evidence is not a pass that silently drops rows.

    Returns (id, n_ngrams, n_hit, rate, contaminated) where ``rate`` =
    n_hit / n_ngrams over the document's DISTINCT grams and
    ``contaminated`` = rate > threshold AND n_hit >= min_hits (strict >,
    so the defaults flag any single shared n-gram).
    """
    if min_hits < 1:
        raise ValueError(f"min_hits must be >= 1, got {min_hits}")
    if hash_fn == "xxhash64":
        h = lambda c: F.xxhash64(c)  # noqa: E731
    elif hash_fn == "md5":
        h = lambda c: F.md5(c)  # noqa: E731
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")

    tg = ngrams(test_df, id_col, text_col, n).select("id", h(F.col("token")).alias("g"))
    rg = (
        ngrams(ref_df, id_col, text_col, n)
        .select(h(F.col("token")).alias("g"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    per_doc = (
        tg.join(rg, "g", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hit"),
        )
    )
    all_ids = test_df.select(F.col(id_col).alias("id")).distinct()
    rate = F.try_divide(F.col("n_hit"), F.col("n_ngrams"))
    return (
        all_ids.join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_ngrams"), F.lit(0)).cast("long").alias("n_ngrams"),
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
            rate.alias("rate"),
            F.coalesce(
                (rate > F.lit(float(threshold)))
                & (F.col("n_hit") >= F.lit(int(min_hits))),
                F.lit(False),
            ).alias("contaminated"),
        )
    )


def hamming_contamination(
    test_df: DataFrame,
    ref_df: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int = 4,
    chunks: Optional[int] = None,
    max_bucket_size: int = 2000,
) -> DataFrame:
    """Bipartite fingerprint contamination: for every test row, the
    nearest reference fingerprint within ``max_hamming`` bits — the
    image/simhash analog of :func:`contamination_report` (eval images
    leaking into a training corpus as exact or near-duplicates).

    Exact matches (hamming 0) go through a plain equality join —
    complete recall regardless of bucket caps.  Hamming 1..max uses the
    pigeonhole chunk join (``max_hamming + 1`` contiguous bit spans, the
    simhash_near_duplicates layout) with hot (chunk, value) buckets
    capped on the REFERENCE side — the documented recall bound applies
    only to near (not exact) matches whose every chunk is hot.

    Returns one row per test id: (id, min_hamming int — NULL when
    nothing within range, n_matches long — distinct ref ids in range,
    contaminated bool).
    """
    if chunks is None:
        chunks = max_hamming + 1
    elif chunks <= max_hamming:
        logger.warning(
            "hamming_contamination: chunks=%d cannot guarantee recall at "
            "max_hamming=%d; clamping to %d",
            chunks, max_hamming, max_hamming + 1,
        )
        chunks = max_hamming + 1
    if chunks > 64:
        raise ValueError(f"chunks={chunks} > 64 bits of fingerprint")

    t = test_df.select(F.col(id_col).alias("id"), F.col(hash_col).alias("h"))
    r = ref_df.select(F.col(id_col).alias("rid"), F.col(hash_col).alias("rh"))

    exact = t.join(r, t["h"] == r["rh"]).select(
        "id", "rid", F.lit(0).cast("int").alias("d")
    )

    bounds = [i * 64 // chunks for i in range(chunks + 1)]

    def _span(col, c):
        width = bounds[c + 1] - bounds[c]
        shifted = F.shiftrightunsigned(col, bounds[c])
        if width >= 64:
            return shifted
        return shifted.bitwiseAND(F.lit((1 << width) - 1))

    def _explode(df, hcol):
        structs = [
            F.struct(F.lit(c).alias("chunk"), _span(F.col(hcol), c).alias("v"))
            for c in range(chunks)
        ]
        return df.select("*", F.explode(F.array(*structs)).alias("cc")).select(
            *df.columns, "cc.chunk", "cc.v"
        )

    re_ = _explode(r, "rh")
    hot = (
        re_.groupBy("chunk", "v")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > max_bucket_size)
        .select("chunk", "v")
    )
    te = _explode(t, "h").join(hot, ["chunk", "v"], "left_anti")
    re_ = re_.join(hot, ["chunk", "v"], "left_anti")
    near = (
        te.join(re_, ["chunk", "v"])
        .select(
            "id", "rid",
            F.bit_count(F.col("h").bitwiseXOR(F.col("rh"))).cast("int").alias("d"),
        )
        .where((F.col("d") > 0) & (F.col("d") <= max_hamming))
    )
    matches = (
        exact.unionByName(near)
        .dropDuplicates(["id", "rid"])
        .groupBy("id")
        .agg(
            F.min("d").alias("min_hamming"),
            F.count(F.lit(1)).cast("long").alias("n_matches"),
        )
    )
    return (
        t.select("id").distinct()
        .join(matches, "id", "left")
        .select(
            "id",
            "min_hamming",
            F.coalesce(F.col("n_matches"), F.lit(0)).cast("long").alias("n_matches"),
            F.col("min_hamming").isNotNull().alias("contaminated"),
        )
    )
