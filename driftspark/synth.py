"""Deterministic synthetic image+caption tables (FIXTURES.md F1/F2).

Generation is DISTRIBUTED (spark.range → mapInPandas) and counter-based:
every column derives from a SplitMix64-style mix of (seed, row index), so
the table is bit-identical regardless of partitioning or parallelism —
the determinism-under-parallelism requirement of SURVEY.md §7.

Two shapes:
- ``synth_image_table``: the drift-detection target.  Disjoint image_ids
  per split; the test split optionally carries injected distribution drift
  (w/h mix, fmt proportions, caption vocabulary, phash bit-prefix, pixel
  brightness).  Controlled uniqueness duplicates (~0.1%) and dangling
  foreign keys (~0.05%) feed the constraint checks.
- ``synth_image_pairs``: the payload-validation target.  Same image_ids in
  both splits with nominally identical payloads; a controlled fraction of
  test rows is corrupted (pixel noise beyond the PSNR floor) or caption-
  edited to produce violation rows.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from driftspark.imageops import average_hash64, encode_lossy, encode_png

IMAGE_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, "
    "phash long, part int, split string, fk_dataset_id string"
)

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer — vectorized counter-based hash."""
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _u(seed: int, stream: int, i: np.ndarray) -> np.ndarray:
    """Deterministic uniforms in [0, 1) for row indices ``i``."""
    mask = (1 << 64) - 1
    seed_term = np.uint64((seed * 0x9E3779B97F4A7C15) & mask)
    stream_term = np.uint64((stream * 0x9E3779B97F4A7C15) & mask)
    with np.errstate(over="ignore"):
        h = _mix64(seed_term ^ _mix64(i.astype(np.uint64) + stream_term))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _choice(u: np.ndarray, values, probs) -> np.ndarray:
    cum = np.cumsum(probs)
    idx = np.searchsorted(cum, u, side="right")
    return np.asarray(values, dtype=object)[np.clip(idx, 0, len(values) - 1)]


_VOCAB = [f"tok{k}" for k in range(25)]


def _pixels_for(seed: int, i: int, w: int, h: int, brightness: int) -> np.ndarray:
    rng = np.random.Generator(np.random.Philox(key=seed, counter=i))
    px = rng.integers(0, 200, size=(h, w, 3), dtype=np.int64) + brightness
    return np.clip(px, 0, 255).astype(np.uint8)


def _gen_rows(
    ids: np.ndarray,
    seed: int,
    n_rows: int,
    n_parts: int,
    drift: bool,
    with_bytes: bool,
    dup_every: int,
    dangling_every: int,
    with_feature_truth: bool = False,
) -> pd.DataFrame:
    i = ids.astype(np.uint64)
    half = n_rows // 2
    is_test = ids >= half
    split = np.where(is_test, "test", "ref")

    # controlled duplicate keys within a split (uniqueness-violation target)
    key_idx = ids.copy()
    if dup_every:
        dup_mask = (ids % dup_every) == (dup_every - 1)
        key_idx = np.where(dup_mask, ids - 1, ids)
    image_id = np.array([f"img_{k:010d}" for k in key_idx], dtype=object)

    # size distribution drifts on the test side
    sizes = [16, 32, 64]
    p_ref, p_drift = [0.6, 0.3, 0.1], [0.3, 0.4, 0.3]
    uw = _u(seed, 1, i)
    w = np.where(
        is_test & drift,
        _choice(uw, sizes, p_drift).astype(np.int64),
        _choice(uw, sizes, p_ref).astype(np.int64),
    ).astype(np.int32)
    uh = _u(seed, 2, i)
    h = np.where(
        is_test & drift,
        _choice(uh, sizes, p_drift).astype(np.int64),
        _choice(uh, sizes, p_ref).astype(np.int64),
    ).astype(np.int32)

    # fmt proportions drift (chi2 / categorical-PSI target)
    uf = _u(seed, 3, i)
    fmt = np.where(
        is_test & drift,
        _choice(uf, ["png", "jpeg"], [0.4, 0.6]),
        _choice(uf, ["png", "jpeg"], [0.7, 0.3]),
    )

    # caption vocabulary shifts on the test side
    tok_u = _u(seed, 4, i)
    tok_idx = (tok_u * 15).astype(np.int64)
    if drift:
        tok_idx = np.where(is_test, tok_idx + 5, tok_idx)
    caption = np.array(
        [f"caption {k} {_VOCAB[t]}" for k, t in zip(key_idx, tok_idx)], dtype=object
    )

    # foreign key with controlled dangling references
    fk_idx = (_u(seed, 5, i) * 100).astype(np.int64)
    fk = np.array([f"ds_{k:04d}" for k in fk_idx], dtype=object)
    if dangling_every:
        dang = (ids % dangling_every) == (dangling_every - 1)
        fk = np.where(dang, np.array([f"ds_miss_{k}" for k in ids], dtype=object), fk)

    part = (ids % n_parts).astype(np.int32)
    brightness = np.where(is_test & drift, 25, 0)

    feature_truth: dict = {}
    if with_bytes:
        payloads, phashes = [], []
        if with_feature_truth:
            feature_truth = {
                k: [] for k in (
                    "t_mean_r", "t_mean_g", "t_mean_b",
                    "t_brightness", "t_contrast", "t_edge_density",
                )
            }
        for r in range(len(ids)):
            px = _pixels_for(seed, int(key_idx[r]), int(w[r]), int(h[r]), int(brightness[r]))
            payloads.append(
                encode_png(px) if fmt[r] == "png" else encode_lossy(px)
            )
            phashes.append(average_hash64(px))
            if with_feature_truth:
                # decoded-equivalent pixels WITHOUT running any codec: png
                # roundtrips losslessly, the lossy stand-in quantizes to
                # ((px >> 2) << 2) | 2 — so these are the exact features a
                # decode of the emitted payload must reproduce
                d = px if fmt[r] == "png" else (((px >> 2) << 2) | 2).astype(np.uint8)
                g = d.astype(np.float64).mean(axis=2)
                feature_truth["t_mean_r"].append(float(d[:, :, 0].mean()))
                feature_truth["t_mean_g"].append(float(d[:, :, 1].mean()))
                feature_truth["t_mean_b"].append(float(d[:, :, 2].mean()))
                feature_truth["t_brightness"].append(float(g.mean()))
                feature_truth["t_contrast"].append(float(g.std()))
                gx = float(np.abs(np.diff(g, axis=1)).mean())
                gy = float(np.abs(np.diff(g, axis=0)).mean())
                feature_truth["t_edge_density"].append((gx + gy) / 2.0)
        payload = pd.Series(payloads, dtype=object)
        phash = np.array(phashes, dtype=np.int64)
    else:
        payload = pd.Series([None] * len(ids), dtype=object)
        # synthetic phash with a drift-able bit-prefix (A24 histogram target)
        prefix_u = _u(seed, 6, i)
        prefix = np.where(
            is_test & drift,
            (prefix_u * 64).astype(np.int64) + 96,  # concentrated band
            (prefix_u * 256).astype(np.int64),
        )
        stream7 = np.uint64((7 * 0x9E3779B97F4A7C15) & ((1 << 64) - 1))
        with np.errstate(over="ignore"):
            low = _mix64(i + stream7) & np.uint64((1 << 56) - 1)
        phash = ((prefix.astype(np.uint64) << np.uint64(56)) | low).view(np.int64)

    return pd.DataFrame(
        {
            "image_id": image_id,
            "bytes": payload,
            "w": w,
            "h": h,
            "fmt": fmt,
            "caption": caption,
            "phash": phash,
            "part": part,
            "split": split,
            "fk_dataset_id": fk,
            **feature_truth,
        }
    )


def synth_image_table(
    spark: SparkSession,
    n_rows: int,
    n_parts: int = 8,
    seed: int = 42,
    drift: bool = False,
    with_bytes: bool = True,
    dup_every: int = 1000,
    dangling_every: int = 2000,
    num_partitions: int | None = None,
) -> DataFrame:
    """Image+caption table per FIXTURES.md F1 (see module docstring)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _gen_rows(
                pdf["id"].values,
                seed,
                n_rows,
                n_parts,
                drift,
                with_bytes,
                dup_every,
                dangling_every,
            )

    rng = spark.range(0, n_rows, numPartitions=num_partitions)
    return rng.mapInPandas(gen, schema=IMAGE_SCHEMA)


PAIR_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, "
    "split string, part int"
)


def _pair_px_caption(
    seed: int, p: int, fmt: str, is_test: bool,
    corrupt_every: int, caption_edit_every: int,
):
    """One side of pair ``p``: the exact pixel array + caption the pair
    generator encodes.  Shared by synth_image_pairs and the oracle truth
    builder so the invariant check's expected output is derived from the
    SAME logic, without running any codec."""
    px = _pixels_for(seed, p, 16, 16, 0)
    cap = f"caption {p} {_VOCAB[p % len(_VOCAB)]}"
    if is_test:
        if corrupt_every and p % corrupt_every == corrupt_every - 1:
            rng = np.random.Generator(np.random.Philox(key=seed + 1, counter=p))
            noise = rng.integers(-40, 41, size=px.shape)
            px = np.clip(px.astype(np.int64) + noise, 0, 255).astype(np.uint8)
        elif fmt == "jpeg":
            # mild re-encode jitter so the lossy path exercises a FINITE
            # PSNR above the 40 dB floor (otherwise the test bytes are
            # byte-identical and PSNR is inf)
            rng = np.random.Generator(np.random.Philox(key=seed + 2, counter=p))
            jitter = rng.integers(-2, 3, size=px.shape)
            px = np.clip(px.astype(np.int64) + jitter, 0, 255).astype(np.uint8)
        if caption_edit_every and p % caption_edit_every == caption_edit_every - 1:
            cap = cap + " EDITED"
    return px, cap


def _pair_truth_rows(
    n_pairs: int, seed: int, corrupt_every: int, caption_edit_every: int,
    min_psnr: float = 40.0,
) -> pd.DataFrame:
    """Expected validate_image_payloads output for synth_image_pairs —
    computed codec-free: png roundtrips losslessly, the lossy stand-in
    quantizes to ((px >> 2) << 2) | 2, so the decoded arrays are known
    analytically and psnr/pixels_ok/caption_ok follow (imageops
    _check_batches semantics: png → byte-equality with psnr=inf when
    equal; jpeg → psnr >= min_psnr)."""
    from driftspark.imageops import psnr as _psnr

    pairs = np.arange(n_pairs, dtype=np.int64)
    u = _u(seed, 11, pairs.astype(np.uint64))
    fmt = _choice(u, ["png", "jpeg"], [0.5, 0.5])
    rows = {"image_id": [], "psnr": [], "pixels_ok": [], "caption_ok": []}
    for p in range(n_pairs):
        rpx, rcap = _pair_px_caption(seed, p, fmt[p], False, corrupt_every, caption_edit_every)
        tpx, tcap = _pair_px_caption(seed, p, fmt[p], True, corrupt_every, caption_edit_every)
        if fmt[p] == "png":
            ok = bool(np.array_equal(rpx, tpx))
            val = float("inf") if ok else float(_psnr(rpx, tpx))
        else:
            q = lambda a: (((a >> 2) << 2) | 2).astype(np.uint8)  # noqa: E731
            val = float(_psnr(q(rpx), q(tpx)))
            ok = bool(val >= min_psnr)
        rows["image_id"].append(f"img_{p:010d}")
        rows["psnr"].append(val)
        rows["pixels_ok"].append(ok)
        rows["caption_ok"].append(rcap == tcap)
    return pd.DataFrame(rows)


def synth_image_pairs(
    spark: SparkSession,
    n_pairs: int,
    n_parts: int = 8,
    seed: int = 42,
    corrupt_every: int = 500,
    caption_edit_every: int = 700,
    num_partitions: int | None = None,
) -> DataFrame:
    """Ref/test payload pairs for the PSNR/caption invariant (north rule).

    Every image_id appears once per split.  Test-side payload is a
    re-encode of the SAME pixels (png byte-exact, lossy within codec
    error) except every ``corrupt_every``-th pair, whose test pixels get
    +-40 noise (PSNR ~ 16 dB → pixel violation), and every
    ``caption_edit_every``-th pair, whose test caption is edited.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].values
            pair = ids // 2
            is_test = (ids % 2) == 1
            u = _u(seed, 11, pair.astype(np.uint64))
            fmt = _choice(u, ["png", "jpeg"], [0.5, 0.5])
            rows = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "split", "part")}
            for r in range(len(ids)):
                p = int(pair[r])
                w = h = 16
                px, cap = _pair_px_caption(
                    seed, p, fmt[r], bool(is_test[r]), corrupt_every, caption_edit_every
                )
                data = encode_png(px) if fmt[r] == "png" else encode_lossy(px)
                rows["image_id"].append(f"img_{p:010d}")
                rows["bytes"].append(data)
                rows["w"].append(w)
                rows["h"].append(h)
                rows["fmt"].append(fmt[r])
                rows["caption"].append(cap)
                rows["split"].append("test" if is_test[r] else "ref")
                rows["part"].append(p % n_parts)
            out = pd.DataFrame(rows)
            out["w"] = out["w"].astype(np.int32)
            out["h"] = out["h"].astype(np.int32)
            out["part"] = out["part"].astype(np.int32)
            yield out

    rng = spark.range(0, n_pairs * 2, numPartitions=num_partitions)
    return rng.mapInPandas(gen, schema=PAIR_SCHEMA)


PAIR_WIDE_SCHEMA = (
    "image_id string, ref_bytes binary, ref_caption string, "
    "test_bytes binary, test_caption string, fmt string, part int"
)


def synth_image_pairs_wide(
    spark: SparkSession,
    n_pairs: int,
    n_parts: int = 8,
    seed: int = 42,
    corrupt_every: int = 500,
    caption_edit_every: int = 700,
    num_partitions: int | None = None,
) -> DataFrame:
    """Pre-joined (co-located) ref/test payload pairs — one row per
    image_id with both copies, the storage layout the shuffle-free
    ``validate_image_payloads_paired`` path expects."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].values
            u = _u(seed, 11, ids.astype(np.uint64))
            fmt = _choice(u, ["png", "jpeg"], [0.5, 0.5])
            rows = {k: [] for k in (
                "image_id", "ref_bytes", "ref_caption", "test_bytes",
                "test_caption", "fmt", "part",
            )}
            for r in range(len(ids)):
                p = int(ids[r])
                px = _pixels_for(seed, p, 16, 16, 0)
                cap = f"caption {p} {_VOCAB[p % len(_VOCAB)]}"
                tpx, tcap = px, cap
                if corrupt_every and p % corrupt_every == corrupt_every - 1:
                    rng = np.random.Generator(np.random.Philox(key=seed + 1, counter=p))
                    noise = rng.integers(-40, 41, size=px.shape)
                    tpx = np.clip(px.astype(np.int64) + noise, 0, 255).astype(np.uint8)
                elif fmt[r] == "jpeg":
                    rng = np.random.Generator(np.random.Philox(key=seed + 2, counter=p))
                    jitter = rng.integers(-2, 3, size=px.shape)
                    tpx = np.clip(px.astype(np.int64) + jitter, 0, 255).astype(np.uint8)
                if caption_edit_every and p % caption_edit_every == caption_edit_every - 1:
                    tcap = cap + " EDITED"
                enc = encode_png if fmt[r] == "png" else encode_lossy
                rows["image_id"].append(f"img_{p:010d}")
                rows["ref_bytes"].append(enc(px))
                rows["ref_caption"].append(cap)
                rows["test_bytes"].append(enc(tpx))
                rows["test_caption"].append(tcap)
                rows["fmt"].append(fmt[r])
                rows["part"].append(p % n_parts)
            out = pd.DataFrame(rows)
            out["part"] = out["part"].astype(np.int32)
            yield out

    rng = spark.range(0, n_pairs, numPartitions=num_partitions)
    return rng.mapInPandas(gen, schema=PAIR_WIDE_SCHEMA)


def synth_dataset_dim(spark: SparkSession, n: int = 100) -> DataFrame:
    """Parent dimension table (FIXTURES.md F2) — small, broadcast side."""
    pdf = pd.DataFrame(
        {
            "dataset_id": [f"ds_{k:04d}" for k in range(n)],
            "source": [["web", "books", "code", "wiki"][k % 4] for k in range(n)],
        }
    )
    return spark.createDataFrame(pdf)


AUDIO_SCHEMA = "audio_id string, bytes binary, sample_rate int, caption string"


def _audio_rows(ids: np.ndarray, seed: int, sample_rate: int) -> pd.DataFrame:
    """Pure-pandas audio-row builder shared by the Spark generator and the
    driver-side oracle ground-truth writer: clip i is a sine at
    110*(1 + i%8) Hz with amplitude/duration/bit-depth drawn from the
    SplitMix64 streams.  Besides the payload columns it returns the exact
    generation parameters (amp, freq, n_samples_true, bits) so a SQL
    oracle can re-derive the decoded samples without touching the bytes."""
    from driftspark.multimodal import encode_wav

    amp = 0.1 + 0.8 * _u(seed, 101, ids)
    dur = 0.05 + 0.15 * _u(seed, 102, ids)
    use_float = _u(seed, 103, ids) < 0.25
    rows = {
        "audio_id": [], "bytes": [], "sample_rate": [], "caption": [],
        "amp": [], "freq": [], "n_samples_true": [], "bits": [],
    }
    for r in range(len(ids)):
        i = int(ids[r])
        freq = 110.0 * (1 + i % 8)
        n = max(int(dur[r] * sample_rate), 8)
        t = np.arange(n, dtype=np.float64) / sample_rate
        samples = amp[r] * np.sin(2 * np.pi * freq * t)
        bits = 32 if use_float[r] else 16
        rows["audio_id"].append(f"aud_{i:08d}")
        rows["bytes"].append(encode_wav(samples, sample_rate, bits=bits))
        rows["sample_rate"].append(sample_rate)
        rows["caption"].append(f"sine {freq:.0f}Hz clip {i}")
        rows["amp"].append(float(amp[r]))
        rows["freq"].append(freq)
        rows["n_samples_true"].append(n)
        rows["bits"].append(bits)
    out = pd.DataFrame(rows)
    out["bytes"] = out["bytes"].astype(object)
    out["sample_rate"] = out["sample_rate"].astype(np.int32)
    out["n_samples_true"] = out["n_samples_true"].astype(np.int64)
    out["bits"] = out["bits"].astype(np.int32)
    return out


def synth_audio_table(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    sample_rate: int = 8000,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic WAV clips (counter-based like the image tables):
    same bytes for the same (seed, i) regardless of partitioning.  Every
    payload is a real RIFF/WAVE file (PCM16 or float32) decodable by
    driftspark.multimodal.decode_wav.  See ``_audio_rows`` for the
    generator itself."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _audio_rows(pdf["id"].values, seed, sample_rate)[
                ["audio_id", "bytes", "sample_rate", "caption"]
            ]

    rng = spark.range(0, n_rows, numPartitions=num_partitions)
    return rng.mapInPandas(gen, schema=AUDIO_SCHEMA)


VIDEO_SCHEMA = "video_id string, bytes binary, n_frames int, fps int"

VIDEO_FAKE_EVERY = 23  # every 23rd video ships a fake-codec payload —
                       # undecodable at fake=False (NotImplementedError row)
VIDEO_CORRUPT_EVERY = 29  # every 29th is a truncated RIFF (ValueError row)


def _video_frames(i: int) -> np.ndarray:
    """Deterministic frames for video i: (2 + i%5) frames of
    (10 + (i%3)*7) x (9 + (i%4)*5) gradient pixels
    (7*i + 11*f + y + 2*x + 3*c) % 256 — the odd widths exercise the AVI
    4-byte row padding, the varying frame counts exercise past-end
    clamping in sample_frames."""
    n, h, w = 2 + i % 5, 10 + (i % 3) * 7, 9 + (i % 4) * 5
    f = np.arange(n)[:, None, None, None]
    y = np.arange(h)[None, :, None, None]
    x = np.arange(w)[None, None, :, None]
    c = np.arange(3)[None, None, None, :]
    return ((7 * i + 11 * f + y + 2 * x + 3 * c) % 256).astype(np.uint8)


def _video_payload(i: int) -> bytes:
    import struct

    from driftspark.multimodal import encode_avi, encode_fake_video

    if i % VIDEO_CORRUPT_EVERY == VIDEO_CORRUPT_EVERY - 1:
        # valid RIFF/AVI header, no strf/frame chunks
        return b"RIFF" + struct.pack("<I", 16) + b"AVI " + b"\x00" * 12
    if i % VIDEO_FAKE_EVERY == VIDEO_FAKE_EVERY - 1:
        return encode_fake_video(_video_frames(i))
    return encode_avi(_video_frames(i), fps=25)


def synth_video_table(
    spark: SparkSession, n_rows: int, num_partitions: int | None = None
) -> DataFrame:
    """Deterministic uncompressed-AVI video table (counter-based like the
    image/audio tables — identical bytes for identical i regardless of
    partitioning), with controlled fake-codec and corrupt payloads."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(v) for v in pdf["id"].values]
            yield pd.DataFrame(
                {
                    "video_id": [f"vid_{i:08d}" for i in ids],
                    "bytes": pd.Series([_video_payload(i) for i in ids], dtype=object),
                    "n_frames": np.array([2 + i % 5 for i in ids], dtype=np.int32),
                    "fps": np.full(len(ids), 25, dtype=np.int32),
                }
            )

    rng = spark.range(0, n_rows, numPartitions=num_partitions)
    return rng.mapInPandas(gen, schema=VIDEO_SCHEMA)


def _video_truth_rows(n_rows: int, frame_indices) -> pd.DataFrame:
    """Codec-free expected rows for the video_frames driver oracle: frame
    sampling (past-end clamps to the last frame) + the SAME pixel feature
    math (multimodal.pixel_feature_values — shared by construction), never
    touching the AVI/PNG byte paths for decodable videos.  Expected
    decode_error strings for the fake/corrupt payloads are derived by
    probing _decode_video_frame once per bad payload with sample_frames'
    exact exception formatting."""
    from driftspark.multimodal import _decode_video_frame, pixel_feature_values

    feat_cols = ("mean_r", "mean_g", "mean_b", "brightness", "contrast", "edge_density")
    rows = {k: [] for k in ("image_id", "width", "height", *feat_cols, "decode_error")}
    for i in range(n_rows):
        bad = (
            i % VIDEO_CORRUPT_EVERY == VIDEO_CORRUPT_EVERY - 1
            or i % VIDEO_FAKE_EVERY == VIDEO_FAKE_EVERY - 1
        )
        err = None
        frames = None
        if bad:
            try:
                _decode_video_frame(_video_payload(i), 0, fake=False)
            except NotImplementedError as e:
                err = str(e)
            except Exception as e:  # noqa: BLE001
                err = f"{type(e).__name__}: {e}"
        else:
            frames = _video_frames(i)
        for fi in frame_indices:
            rows["image_id"].append(f"vid_{i:08d}:{fi:02d}")
            if bad:
                rows["width"].append(0)
                rows["height"].append(0)
                for c in feat_cols:
                    rows[c].append(None)
                rows["decode_error"].append(err)
            else:
                px = frames[min(fi, frames.shape[0] - 1)]
                w, h, *feats = pixel_feature_values(px)
                rows["width"].append(w)
                rows["height"].append(h)
                for c, v in zip(feat_cols, feats):
                    rows[c].append(float(v))
                rows["decode_error"].append(None)
    out = pd.DataFrame(rows)
    out["width"] = out["width"].astype(np.int32)
    out["height"] = out["height"].astype(np.int32)
    for c in feat_cols:
        out[c] = out[c].astype("float64")
    return out


ACS_FEATURES = [
    "AGEP", "COW", "SCHL", "MAR", "OCCP", "POBP", "RELP", "WKHP", "SEX", "RAC1P"
]
ACS_SCHEMA = ", ".join(f"{c} double" for c in ACS_FEATURES) + ", label int"


def synth_acs_table(
    spark: SparkSession,
    n_rows: int,
    year: int = 2014,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """ACS-income-shaped synthetic batch (the reference's folktables
    workload substitute, SURVEY §2.1 S3): ten numeric features named after
    the ACS income columns plus a binary label.  ``year`` applies
    progressive covariate drift relative to the 2014 reference batch (AGEP
    and SCHL shift up, WKHP shifts down, COW reweights) so a yearly loop
    reproduces the reference demo's growing-drift sequence.  Counter-based
    (SplitMix64) — identical rows for identical (seed, year, n_rows)
    regardless of partitioning."""
    d = max(year - 2014, 0)
    yseed = seed * 1000 + year

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            i = pdf["id"].values
            agep = 18.0 + 50.0 * _u(yseed, 1, i) + 1.5 * d
            cow = np.floor(1 + 8 * _u(yseed, 2, i) ** (1.0 + 0.08 * d))
            schl = np.floor(1 + 24 * _u(yseed, 3, i)) + 0.6 * d
            mar = np.floor(1 + 5 * _u(yseed, 4, i))
            occp = np.floor(10 + 9790 * _u(yseed, 5, i))
            pobp = np.floor(1 + 500 * _u(yseed, 6, i))
            relp = np.floor(18 * _u(yseed, 7, i))
            wkhp = 40.0 + 12.0 * (_u(yseed, 8, i) + _u(yseed, 9, i) - 1.0) - 0.8 * d
            sex = np.floor(1 + 2 * _u(yseed, 10, i))
            rac1p = np.floor(1 + 9 * _u(yseed, 11, i))
            noise = 4.0 * (_u(yseed, 12, i) - 0.5)
            z = 0.06 * agep + 0.22 * schl + 0.09 * wkhp - 0.45 * mar - 9.2 + noise
            label = (z > 0).astype(np.int32)
            yield pd.DataFrame(
                {
                    "AGEP": agep, "COW": cow, "SCHL": schl, "MAR": mar,
                    "OCCP": occp, "POBP": pobp, "RELP": relp, "WKHP": wkhp,
                    "SEX": sex, "RAC1P": rac1p, "label": label,
                }
            )

    rng = spark.range(0, n_rows, numPartitions=num_partitions)
    return rng.mapInPandas(gen, schema=ACS_SCHEMA)
