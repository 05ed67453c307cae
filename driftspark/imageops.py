"""Image payload operations: codecs, PSNR, perceptual hash, validation.

North-rule surface (BASELINE.json:6,15): the input table carries
``bytes:binary`` image payloads with ``fmt`` in {png, jpeg-class lossy};
the engine must verify decoded-pixel agreement (exact for lossless,
PSNR >= 40 dB for lossy) and byte-exact caption equality between the
reference and test copies of each image_id, as vectorized Arrow batches —
no per-row Python at the DataFrame layer (all decode work happens inside
``mapInPandas`` over Arrow record batches).

Codecs: this container has no PIL/libjpeg, so:
- PNG is implemented for real (pure numpy + stdlib zlib, 8-bit RGB,
  filter 0) — lossless round-trip is byte-exact on pixels.
- The lossy path uses a clearly-marked deterministic stand-in codec
  ("QJPG": 6-bit quantization + zlib) whose reconstruction error is
  bounded (max |err| = 2 per channel → PSNR ≈ 46 dB on natural noise),
  exercising the real PSNR>=40 validation plumbing.  Swap `encode_lossy` /
  `decode_image` internals for a real JPEG codec in production — the Spark
  plumbing (schema, batching, UDF signatures) is codec-agnostic.
"""

from __future__ import annotations

import logging
import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_QJPG_MAGIC = b"QJPG"


# ---------------------------------------------------------------------------
# PNG (real, lossless)
# ---------------------------------------------------------------------------


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """8-bit RGB numpy (h, w, 3) -> PNG bytes (filter 0, non-interlaced)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8. Supports what encode_png emits
    (8-bit RGB, filter type 0 per scanline, non-interlaced)."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos = len(_PNG_SIG)
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            w, h, depth, color, _, _, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or color != 2 or interlace != 0:
                raise ValueError("unsupported PNG variant")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    if (raw[:, 0] != 0).any():
        raise ValueError("unsupported PNG filter")
    return raw[:, 1:].reshape(h, w, 3).copy()


# ---------------------------------------------------------------------------
# Deterministic lossy stand-in codec ("QJPG")
# ---------------------------------------------------------------------------


def encode_lossy(pixels: np.ndarray) -> bytes:
    """STAND-IN lossy codec: 6-bit channel quantization + zlib.

    max |reconstruction error| = 2/channel → PSNR ≈ 46 dB on noise images,
    safely above the 40 dB validation floor.  NOT a real JPEG; see module
    docstring."""
    h, w, c = pixels.shape
    q = (pixels >> 2).astype(np.uint8)
    return (
        _QJPG_MAGIC
        + struct.pack(">II", w, h)
        + zlib.compress(q.tobytes(), 6)
    )


def decode_lossy(data: bytes) -> np.ndarray:
    if not data.startswith(_QJPG_MAGIC):
        raise ValueError("not a QJPG payload")
    w, h = struct.unpack(">II", data[4:12])
    q = np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8).reshape(h, w, 3)
    return ((q << 2) | 2).astype(np.uint8)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Dispatch by the table's fmt column ('png' lossless, 'jpeg' lossy)."""
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        return decode_lossy(data)
    raise ValueError(f"unknown fmt: {fmt}")


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def average_hash64(pixels: np.ndarray) -> int:
    """64-bit perceptual average-hash: grayscale → 8x8 block means →
    bit i set when block i brighter than the global mean.  Feeds the
    phash:int64 column (BASELINE.json:15) and the phash-distribution
    histograms (SURVEY.md §2.4 A24)."""
    gray = pixels.astype(np.float64).mean(axis=2)
    # images smaller than 8px in a dimension can't form 8 blocks — repeat
    # rows/cols up to >= 8 first (deterministic nearest-neighbor upsample;
    # a no-op for the >= 8px images every locked oracle runs on)
    if gray.shape[0] < 8:
        gray = np.repeat(gray, -(-8 // gray.shape[0]), axis=0)
    if gray.shape[1] < 8:
        gray = np.repeat(gray, -(-8 // gray.shape[1]), axis=1)
    h, w = gray.shape
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    blocks = gray[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).flatten()
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    # interpret as signed int64 for the LongType column
    return v - (1 << 64) if v >= (1 << 63) else v


# ---------------------------------------------------------------------------
# Distributed validation (mapInPandas — Arrow batches, no per-row Python
# at the DataFrame layer)
# ---------------------------------------------------------------------------

IMAGE_CHECK_SCHEMA = (
    "image_id string, psnr double, pixels_ok boolean, caption_ok boolean, "
    "decode_error string"
)


def _check_batches(
    batches: Iterator[pd.DataFrame], min_psnr: float
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        n = len(pdf)
        out = {
            "image_id": pdf["image_id"].astype(str),
            "psnr": np.full(n, np.nan),
            "pixels_ok": np.zeros(n, dtype=bool),
            "caption_ok": (
                pdf["ref_caption"].values == pdf["test_caption"].values
            ),
            "decode_error": np.array([None] * n, dtype=object),
        }
        for i in range(n):
            rb, tb = pdf["ref_bytes"].iloc[i], pdf["test_bytes"].iloc[i]
            if rb is None or tb is None:
                # one side of the pair is absent (full-outer join): the
                # worst integrity failure — never a silent pass
                side = "ref" if rb is None else "test"
                out["decode_error"][i] = f"missing_{side}_copy"
                out["caption_ok"][i] = False
                continue
            try:
                fmt = pdf["fmt"].iloc[i]
                ref_px = decode_image(rb, fmt)
                test_px = decode_image(tb, fmt)
                if ref_px.shape != test_px.shape:
                    out["decode_error"][i] = "shape mismatch"
                    continue
                if fmt == "png":
                    ok = bool(np.array_equal(ref_px, test_px))
                    out["psnr"][i] = psnr(ref_px, test_px) if not ok else np.inf
                    out["pixels_ok"][i] = ok
                else:
                    p = psnr(ref_px, test_px)
                    out["psnr"][i] = p
                    out["pixels_ok"][i] = p >= min_psnr
            except Exception as e:  # noqa: BLE001 — corrupt payloads are data, not bugs
                out["decode_error"][i] = f"{type(e).__name__}: {e}"
        yield pd.DataFrame(out)


def validate_image_payloads(ref_df, test_df, min_psnr: float = 40.0):
    """Join ref/test by image_id and verify the per-row invariant
    (north rule, BASELINE.json:15): decoded-pixel agreement (byte-exact
    for png, PSNR >= min_psnr for lossy) + byte-exact caption equality.

    Returns a DataFrame (image_id, psnr, pixels_ok, caption_ok,
    decode_error).  Violations = rows where NOT (pixels_ok AND caption_ok).
    The join is FULL OUTER: an image_id present on only one side (a copy
    dropped during ingestion — arguably the worst integrity failure) emits
    a violation row with decode_error = missing_ref_copy/missing_test_copy
    instead of silently vanishing from an inner join.

    Scale notes: the equi-join on image_id is a shuffle join co-locating
    each pair (AQE handles skew); the decode runs inside mapInPandas over
    Arrow batches so image bytes cross the JVM↔Python boundary once,
    batched.  The per-image Python loop inside the batch is inherent to
    codec work (PIL/libjpeg would sit in the same place).
    """
    joined = (
        ref_df.select(
            "image_id",
            F.col("bytes").alias("ref_bytes"),
            F.col("caption").alias("ref_caption"),
            "fmt",
        )
        .join(
            test_df.select(
                "image_id",
                F.col("bytes").alias("test_bytes"),
                F.col("caption").alias("test_caption"),
            ),
            "image_id",
            "full_outer",
        )
    )
    return joined.mapInPandas(
        lambda it: _check_batches(it, min_psnr), schema=IMAGE_CHECK_SCHEMA
    )


def phash_near_duplicates(df, id_col: str = "image_id", phash_col: str = "phash",
                          max_hamming: int = 4):
    """Image near-duplicate pairs by perceptual-hash hamming distance.

    Two images whose 64-bit phash differ in <= max_hamming bits are
    visually near-identical (for average-hash, each bit is one 8x8 block's
    brightness sign).  Reuses the SimHash banded hamming join
    (driftspark.dedup.simhash_near_duplicates): candidates must share one
    exact bit-chunk (max_hamming + 1 chunks, so the pigeonhole recall
    guarantee holds at ANY max_hamming), then the exact bit_count(xor)
    verifies — no all-pairs comparison.  Returns (id_a, id_b, hamming)."""
    from driftspark.dedup import simhash_near_duplicates

    sim = df.select(F.col(id_col).alias("id"), F.col(phash_col).alias("simhash"))
    return simhash_near_duplicates(sim, max_hamming=max_hamming)


def validate_image_payloads_paired(
    paired_df, min_psnr: float = 40.0, max_parallelism: int | None = None
):
    """Payload validation over a PRE-JOINED pairs table
    (image_id, ref_bytes, ref_caption, test_bytes, test_caption, fmt).

    This is the shuffle-free scale path: when the ref/test copies land
    co-located (an Iceberg table bucketed by image_id, or a pairs table
    materialized by the ingestion join), validation is a pure scan +
    mapInPandas — decode/PSNR compute parallelizes linearly with executors
    because no image bytes ever cross the network.  Prefer this over
    validate_image_payloads whenever the storage layout allows.

    ``max_parallelism`` coalesces the scan to at most that many
    partitions before the decode stage — a cap on CONCURRENT Python/Arrow
    worker streams per host.  Hosts whose JVM->Python Arrow channel
    saturates below the core count (this sandbox knees at ~8 streams)
    decode faster under the cap; leave None on clusters where executors
    own few cores each (the usual layout), since the per-executor stream
    count is already bounded there."""
    if max_parallelism is not None:
        paired_df = paired_df.coalesce(max_parallelism)
    return paired_df.mapInPandas(
        lambda it: _check_batches(it, min_psnr), schema=IMAGE_CHECK_SCHEMA
    )


def _bucket_spec(spark, table: str):
    """(bucket_cols, n_buckets) from DESCRIBE EXTENDED, or (None, 0) for
    an unbucketed table."""
    rows = {r["col_name"]: r["data_type"] for r in
            spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()}
    n = rows.get("Num Buckets")
    cols = rows.get("Bucket Columns")
    if not n or not cols:
        return None, 0
    return [c.strip(" `") for c in cols.strip("[]").split(",")], int(n)


UNPAIRED_WARN_ROWS = 1_000_000


def validate_image_payloads_auto(
    ref,
    test=None,
    *,
    spark=None,
    min_psnr: float = 40.0,
    max_parallelism: int | None = None,
    warn_rows: int | None = UNPAIRED_WARN_ROWS,
):
    """ONE front door for payload validation — picks the cheapest of the
    three routes the storage layout allows:

    1. ``ref`` is a pre-joined pairs DataFrame (has ``ref_bytes`` and
       ``test_bytes``; ``test`` omitted) → ``validate_image_payloads_paired``
       — pure scan + decode, zero shuffle.
    2. ``ref``/``test`` are catalog table NAMES, both bucketed by
       ``image_id`` with equal bucket counts →
       ``validate_image_payloads_bucketed`` — zero-Exchange co-located
       join (requires ``spark``).
    3. anything else → ``validate_image_payloads`` (full-outer join) —
       correct everywhere but shuffles the image BYTES; above
       ``warn_rows`` on either side a warning names the cheaper layouts,
       because at 10^12 scale the byte shuffle dominates the job.
    """
    paired_cols = {"ref_bytes", "test_bytes"}
    if test is None:
        if not hasattr(ref, "columns") or not paired_cols <= set(ref.columns):
            raise ValueError(
                "single-argument form needs a pre-joined pairs DataFrame "
                "with ref_bytes/test_bytes columns"
            )
        return validate_image_payloads_paired(ref, min_psnr, max_parallelism)
    if isinstance(ref, str) != isinstance(test, str):
        raise ValueError(
            "mixed arguments: pass TWO table names (bucketed route) or TWO "
            "DataFrames (join route), not one of each — got "
            f"({type(ref).__name__}, {type(test).__name__})"
        )
    if isinstance(ref, str):
        if spark is None:
            raise ValueError("table-name form requires spark=")
        from driftspark.bucketing import validate_image_payloads_bucketed

        rc, rn = _bucket_spec(spark, ref)
        tc, tn = _bucket_spec(spark, test)
        if rc == tc == ["image_id"] and rn == tn and rn > 0:
            return validate_image_payloads_bucketed(
                spark, ref, test, min_psnr, max_parallelism
            )
        logger.warning(
            "validate_image_payloads_auto: tables %s/%s are not both "
            "bucketed by image_id (specs %s x %s / %s x %s) — falling back "
            "to the shuffling join; bucket both tables by image_id for the "
            "zero-Exchange path",
            ref, test, rc, rn, tc, tn,
        )
        ref, test = spark.table(ref), spark.table(test)
    # unpaired DataFrame fallback: correct, but image bytes cross the
    # network in the equi-join shuffle — observable above warn_rows.
    # Both side sizes come from ONE column-pruned action (union of the
    # two count aggregates); warn_rows=None skips the probe entirely for
    # callers that need a job-free plan construction.
    if warn_rows is not None:
        counts = (
            ref.groupBy().agg(F.count(F.lit(1)).alias("n"))
            .unionAll(test.groupBy().agg(F.count(F.lit(1)).alias("n")))
            .collect()
        )
        big = max(r["n"] for r in counts)
        if big > warn_rows:
            logger.warning(
                "validate_image_payloads_auto: unpaired fallback will SHUFFLE "
                "image bytes for ~%d rows; materialize a pairs table "
                "(validate_image_payloads_paired) or bucket both tables by "
                "image_id (validate_image_payloads_bucketed) at this scale",
                big,
            )
    return validate_image_payloads(ref, test, min_psnr)


def phash_contamination(test_df, ref_df, id_col: str = "image_id",
                        phash_col: str = "phash", max_hamming: int = 4):
    """Image test-set contamination: for every test image, the nearest
    reference image by perceptual-hash hamming distance — eval images
    leaking into a training corpus as exact or near-duplicate pixels.
    Thin wrapper over driftspark.dedup.hamming_contamination (exact
    matches cap-immune; near matches via the pigeonhole chunk join)."""
    from driftspark.dedup import hamming_contamination

    return hamming_contamination(
        test_df, ref_df, id_col, phash_col, max_hamming=max_hamming
    )
