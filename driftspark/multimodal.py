"""Multimodal column operators: image/audio/video as opaque binary columns
with typed metadata, processed as Arrow batches.

Design (task brief "multimodal columns"): payloads are `binary` columns,
per-modality metadata travels in typed columns (w/h/fmt, sample_rate,
n_frames...), and all per-payload compute runs inside ``mapInPandas`` over
Arrow batches — the Spark plumbing (schemas, partitioning, batch shapes,
UDF signatures) is real and tested for every modality.

Codec availability: this container carries no PIL/libjpeg/ffmpeg, so
- IMAGE ops are REAL against the engine's own codecs (zlib PNG + the
  deterministic QJPG lossy stand-in from driftspark.imageops);
- AUDIO decode is REAL for RIFF/WAVE (PCM uint8/int16/int32 + IEEE float,
  stdlib struct parser — ``decode_wav``/``encode_wav``); compressed audio
  (mp3/ogg/flac) would need soundfile and raises NotImplementedError;
- VIDEO frame extraction is REAL for uncompressed AVI (RIFF 'DIB '
  24-bit streams, stdlib struct demuxer — ``decode_avi_frame``/
  ``encode_avi``); compressed containers (mp4/h264) would need
  PyAV/ffmpeg and raise NotImplementedError (deterministic fake-codec
  escape hatch ``fake=True`` kept for plumbing tests).
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from driftspark.imageops import decode_image, encode_png

IMAGE_FEATURE_SCHEMA = (
    "image_id string, width int, height int, mean_r double, mean_g double, "
    "mean_b double, brightness double, contrast double, edge_density double, "
    "decode_error string"
)


def pixel_feature_values(px: np.ndarray) -> tuple:
    """Feature math over one (h, w, 3) uint8 array — shared by
    image_features and the video-frame oracle truth builder so the
    codec-free expected values stay identical by construction.

    Returns (width, height, mean_r, mean_g, mean_b, brightness, contrast,
    edge_density)."""
    g = px.astype(np.float64).mean(axis=2)
    # 1-pixel-wide/tall images have no gradient in that axis: 0.0, not a
    # NaN-with-RuntimeWarning from the empty diff's mean
    gx = np.abs(np.diff(g, axis=1)).mean() if g.shape[1] > 1 else 0.0
    gy = np.abs(np.diff(g, axis=0)).mean() if g.shape[0] > 1 else 0.0
    return (
        px.shape[1],
        px.shape[0],
        px[:, :, 0].mean(),
        px[:, :, 1].mean(),
        px[:, :, 2].mean(),
        g.mean(),
        g.std(),
        (gx + gy) / 2.0,
    )


def _image_features(pdf: pd.DataFrame) -> pd.DataFrame:
    n = len(pdf)
    out = {
        "image_id": pdf["image_id"].astype(str),
        "width": np.zeros(n, dtype=np.int32),
        "height": np.zeros(n, dtype=np.int32),
        "mean_r": np.full(n, np.nan),
        "mean_g": np.full(n, np.nan),
        "mean_b": np.full(n, np.nan),
        "brightness": np.full(n, np.nan),
        "contrast": np.full(n, np.nan),
        "edge_density": np.full(n, np.nan),
        "decode_error": np.array([None] * n, dtype=object),
    }
    for i in range(n):
        try:
            px = decode_image(pdf["bytes"].iloc[i], pdf["fmt"].iloc[i])
            (
                out["width"][i], out["height"][i],
                out["mean_r"][i], out["mean_g"][i], out["mean_b"][i],
                out["brightness"][i], out["contrast"][i], out["edge_density"][i],
            ) = pixel_feature_values(px)
        except Exception as e:  # noqa: BLE001 — corrupt payloads are data
            out["decode_error"][i] = f"{type(e).__name__}: {e}"
    return pd.DataFrame(out)


def image_features(df: DataFrame) -> DataFrame:
    """Decode + feature-extract image payloads (REAL path).

    Input columns: image_id, bytes, fmt.  One Arrow pass; feature math is
    vectorized numpy per image."""
    return df.select("image_id", "bytes", "fmt").mapInPandas(
        lambda it: (_image_features(p) for p in it), schema=IMAGE_FEATURE_SCHEMA
    )


def resize_images(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Nearest-neighbor resize, re-encoded as PNG (REAL path).

    Output: image_id, bytes (png; NULL on failure), w, h, decode_error —
    corrupt payloads surface as error rows like every other decode path
    here (one truncated image must not abort a million-row job)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, errs = [], [], []
            for i in range(len(pdf)):
                ids.append(pdf["image_id"].iloc[i])
                try:
                    px = decode_image(pdf["bytes"].iloc[i], pdf["fmt"].iloc[i])
                    ys = (np.arange(target_h) * px.shape[0] // target_h).clip(0, px.shape[0] - 1)
                    xs = (np.arange(target_w) * px.shape[1] // target_w).clip(0, px.shape[1] - 1)
                    payloads.append(encode_png(px[ys][:, xs]))
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — corrupt payloads are data
                    payloads.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "bytes": pd.Series(payloads, dtype=object),
                    "w": np.full(len(ids), target_w, dtype=np.int32),
                    "h": np.full(len(ids), target_h, dtype=np.int32),
                    "decode_error": pd.Series(errs, dtype=object),
                }
            )

    return df.select("image_id", "bytes", "fmt").mapInPandas(
        run,
        schema="image_id string, bytes binary, w int, h int, decode_error string",
    )


# ---------------------------------------------------------------------------
# Audio — REAL RIFF/WAVE codec (stdlib struct; no external audio libs)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """Encode float samples in [-1, 1] as a RIFF/WAVE payload.

    bits=16 -> PCM int16 (fmt 1), bits=32 -> IEEE float32 (fmt 3).
    Multi-channel input as (n, ch); 1-D input is mono."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    if bits == 16:
        fmt_code, data = 1, (np.clip(x, -1.0, 1.0) * 32767.0).round().astype("<i2")
    elif bits == 32:
        fmt_code, data = 3, x.astype("<f4")
    else:
        raise ValueError(f"unsupported encode bit depth: {bits}")
    raw = data.tobytes()
    bytes_per = bits // 8
    fmt_chunk = struct.pack(
        "<HHIIHH", fmt_code, ch, sample_rate, sample_rate * ch * bytes_per,
        ch * bytes_per, bits,
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt_chunk) + 8 + len(raw))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"data" + struct.pack("<I", len(raw)) + raw
    )


def decode_wav(data: bytes) -> tuple:
    """Decode a RIFF/WAVE payload -> (mono float64 samples in [-1, 1],
    sample_rate).  Supports PCM uint8/int16/int32 (fmt 1) and IEEE
    float32/float64 (fmt 3); multi-channel is mixed down to the channel
    mean.  Pure stdlib chunk walk — unknown chunks are skipped."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    fmt_code, ch, sr, _, _, bits = fmt
    if fmt_code == 1 and bits == 8:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif fmt_code == 1 and bits == 16:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif fmt_code == 1 and bits == 32:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    elif fmt_code == 3 and bits == 32:
        x = np.frombuffer(raw, dtype="<f4").astype(np.float64)
    elif fmt_code == 3 and bits == 64:
        x = np.frombuffer(raw, dtype="<f8").astype(np.float64)
    else:
        raise ValueError(f"unsupported WAV format: code={fmt_code} bits={bits}")
    if ch > 1:
        x = x[: (len(x) // ch) * ch].reshape(-1, ch).mean(axis=1)
    return x, int(sr)


_FAKE_AUDIO_MAGIC = b"FAKA"


def encode_fake_audio(samples: np.ndarray, sample_rate: int) -> bytes:
    """Deterministic stand-in 'codec': float32 PCM + zlib."""
    return (
        _FAKE_AUDIO_MAGIC
        + struct.pack(">II", sample_rate, len(samples))
        + zlib.compress(samples.astype(np.float32).tobytes(), 1)
    )


def _decode_audio(data: bytes, fake: bool):
    if data[:4] == b"RIFF":
        return decode_wav(data)  # REAL path: PCM/float WAV, stdlib-only
    if data[:4] == _FAKE_AUDIO_MAGIC and fake:
        sr, n = struct.unpack(">II", data[4:12])
        return np.frombuffer(zlib.decompress(data[12:]), dtype=np.float32), sr
    # compressed codecs (mp3/ogg/flac) would need soundfile/librosa
    raise NotImplementedError(
        "only RIFF/WAVE payloads are decodable without external audio "
        "libs; pass WAV bytes (encode_wav) or fake-codec payloads with "
        "fake=True"
    )

AUDIO_FEATURE_SCHEMA = (
    "audio_id string, sample_rate int, n_samples long, duration_sec double, "
    "rms double, peak double, zero_crossing_rate double, decode_error string"
)


def audio_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + feature-extract audio payloads (REAL path for WAV).

    Input columns: audio_id, bytes.  RIFF/WAVE payloads (PCM 8/16/32-bit
    and IEEE float) decode for real via the stdlib codec; compressed
    formats (mp3/ogg) would need soundfile and surface as decode_error
    rows.  One Arrow pass, vectorized numpy feature math per clip."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = {
                "audio_id": pdf["audio_id"].astype(str),
                "sample_rate": np.zeros(n, dtype=np.int32),
                "n_samples": np.zeros(n, dtype=np.int64),
                "duration_sec": np.full(n, np.nan),
                "rms": np.full(n, np.nan),
                "peak": np.full(n, np.nan),
                "zero_crossing_rate": np.full(n, np.nan),
                "decode_error": np.array([None] * n, dtype=object),
            }
            for i in range(n):
                try:
                    samples, sr = _decode_audio(pdf["bytes"].iloc[i], fake)
                    out["sample_rate"][i] = sr
                    out["n_samples"][i] = len(samples)
                    out["duration_sec"][i] = len(samples) / sr if sr else np.nan
                    out["rms"][i] = float(np.sqrt(np.mean(samples**2)))
                    out["peak"][i] = float(np.abs(samples).max())
                    # single-sample clips have no crossings (empty diff
                    # would warn and yield NaN)
                    out["zero_crossing_rate"][i] = (
                        float((np.diff(np.signbit(samples)) != 0).mean())
                        if len(samples) > 1
                        else 0.0
                    )
                except NotImplementedError as e:
                    out["decode_error"][i] = str(e)
                except Exception as e:  # noqa: BLE001
                    out["decode_error"][i] = f"{type(e).__name__}: {e}"
            yield pd.DataFrame(out)

    return df.select("audio_id", "bytes").mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Video — REAL uncompressed-AVI codec (stdlib struct; no PyAV/ffmpeg)
# ---------------------------------------------------------------------------


def encode_avi(frames: np.ndarray, fps: int = 25) -> bytes:
    """Encode (n, h, w, 3) uint8 RGB frames as a standard uncompressed AVI
    (RIFF 'AVI ', single 'DIB ' video stream, 24-bit bottom-up BGR with
    4-byte row padding, no index chunk).  Mainstream players accept this
    single-stream layout; the matching decoder handles exactly this shape
    (no audio streams, no idx1 — see _avi_layout)."""
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w, c = frames.shape
    if c != 3:
        raise ValueError("frames must be (n, h, w, 3) RGB")
    row_bytes = (w * 3 + 3) & ~3
    pad = row_bytes - w * 3
    frame_payloads = []
    for f in frames:
        bgr = f[::-1, :, ::-1]  # bottom-up rows, RGB -> BGR
        if pad:
            rows = np.zeros((h, row_bytes), dtype=np.uint8)
            rows[:, : w * 3] = bgr.reshape(h, w * 3)
            frame_payloads.append(rows.tobytes())
        else:
            frame_payloads.append(bgr.tobytes())
    size_image = row_bytes * h

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    # flags = 0: no idx1 chunk is written, so AVIF_HASINDEX (0x10) must
    # NOT be promised — strict demuxers seek the index when the flag is set
    avih = struct.pack(
        "<14I", 1_000_000 // fps, size_image * fps, 0, 0, n, 0, 1,
        size_image, w, h, 0, 0, 0, 0,
    )
    # AVISTREAMHEADER: flags, priority, language, initial_frames, scale,
    # rate, start, length, suggested_buffer, quality, sample_size, rcFrame
    strh = (
        b"vids" + b"DIB "
        + struct.pack("<I2H8I", 0, 0, 0, 0, 1, fps, 0, n,
                      size_image, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<I2i2H2I2i2I", 40, w, h, 1, 24, 0, size_image, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", p) for p in frame_payloads))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _avi_layout(data: bytes):
    """One RIFF walk → (w, h, top_down, row_bytes, frame (offset, size)
    list) for a SINGLE-video-stream uncompressed AVI (the shape encode_avi
    produces; stream-00 frame chunks, first strf wins — multi-stream files
    from other muxers are not supported without PyAV/ffmpeg)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")

    dims = {}
    frames: list = []

    def walk(buf: bytes, pos: int, end: int):
        while pos + 8 <= end:
            cid = buf[pos : pos + 4]
            size = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
            body_start = pos + 8
            if cid == b"LIST":
                walk(buf, body_start + 4, body_start + size)
            elif cid == b"strf" and not dims:
                bi = struct.unpack("<I2i2H2I", buf[body_start : body_start + 24])
                dims["w"], dims["h"], dims["bits"], dims["comp"] = (
                    bi[1], bi[2], bi[4], bi[5],
                )
            elif cid in (b"00db", b"00dc"):
                frames.append((body_start, size))
            pos = body_start + size + (size & 1)

    walk(data, 12, len(data))
    if not dims or not frames:
        raise ValueError("AVI missing strf/frame chunks")
    if dims["bits"] != 24 or dims["comp"] != 0:
        raise ValueError(
            f"only uncompressed 24-bit AVI decodable without PyAV/ffmpeg "
            f"(got bits={dims['bits']} compression={dims['comp']})"
        )
    w, h = dims["w"], abs(dims["h"])
    return w, h, dims["h"] < 0, (w * 3 + 3) & ~3, frames


def _avi_extract(data, w, h, top_down, row_bytes, frame):
    start, size = frame
    # trust the chunk's declared size: a short frame chunk must surface
    # as a decode error, not silently read the NEXT chunk's bytes as
    # pixels (this is a validation engine — corrupt payloads are data)
    if size < row_bytes * h:
        raise ValueError(
            f"frame chunk truncated: {size} bytes < {row_bytes * h} expected"
        )
    raw = np.frombuffer(data, dtype=np.uint8, count=row_bytes * h, offset=start)
    rows = raw.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    bgr = rows if top_down else rows[::-1]
    return np.ascontiguousarray(bgr[:, :, ::-1])  # BGR -> RGB


def decode_avi_frame(data: bytes, frame_idx: int) -> np.ndarray:
    """Decode one frame of an uncompressed ('DIB '/24-bit) AVI payload to
    (h, w, 3) uint8 RGB.  Stdlib RIFF walk; only the requested frame's
    bytes are touched.  Indices past the end clamp to the last frame
    (matching the fake codec's behavior); negative indices are rejected."""
    if frame_idx < 0:
        raise ValueError("frame_idx must be >= 0")
    w, h, top_down, row_bytes, frames = _avi_layout(data)
    return _avi_extract(
        data, w, h, top_down, row_bytes, frames[min(frame_idx, len(frames) - 1)]
    )


_FAKE_VIDEO_MAGIC = b"FAKV"


def encode_fake_video(frames: np.ndarray) -> bytes:
    """Deterministic stand-in 'container': n_frames x h x w x 3 + zlib."""
    f, h, w, c = frames.shape
    return (
        _FAKE_VIDEO_MAGIC
        + struct.pack(">III", f, h, w)
        + zlib.compress(frames.astype(np.uint8).tobytes(), 1)
    )


_STUB_VIDEO_MSG = (
    "only uncompressed RIFF/AVI payloads are decodable without "
    "external video libs; pass AVI bytes (encode_avi) or fake-codec "
    "payloads with fake=True"
)


def _decode_video_frame(data: bytes, frame_idx: int, fake: bool) -> np.ndarray:
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return decode_avi_frame(data, frame_idx)  # REAL path: raw-DIB AVI
    if data[:4] == _FAKE_VIDEO_MAGIC and fake:
        if frame_idx < 0:
            raise ValueError("frame_idx must be >= 0")
        f, h, w = struct.unpack(">III", data[4:16])
        raw = np.frombuffer(zlib.decompress(data[16:]), dtype=np.uint8)
        return raw.reshape(f, h, w, 3)[min(frame_idx, f - 1)]
    # compressed containers (mp4/h264/vp9) would need PyAV/ffmpeg
    raise NotImplementedError(_STUB_VIDEO_MSG)

FRAME_SAMPLE_SCHEMA = (
    "video_id string, frame_idx int, bytes binary, decode_error string"
)


def sample_frames(df: DataFrame, frame_indices, fake: bool = False) -> DataFrame:
    """Extract the given frame indices from each video payload as PNG rows
    (one output row per (video, frame)).  REAL for uncompressed AVI
    payloads; compressed containers surface as decode_error rows."""
    idx_list = list(frame_indices)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"video_id": [], "frame_idx": [], "bytes": [], "decode_error": []}
            for i in range(len(pdf)):
                data = pdf["bytes"].iloc[i]
                vid = str(pdf["video_id"].iloc[i])
                # parse the container ONCE per payload — the single-frame
                # API re-walks the whole RIFF chunk tree (or re-inflates
                # the fake payload) per index: O(k*n) for k sampled
                # indices over an n-frame video, vs O(n + k) here.
                # Error strings stay identical to _decode_video_frame's
                # (the oracle truth builder probes that function).
                extract = None
                payload_err = None
                try:
                    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
                        w_, h_, td, rb, frames = _avi_layout(data)

                        def extract(fi, _d=data, _w=w_, _h=h_, _td=td, _rb=rb, _fr=frames):
                            if fi < 0:
                                raise ValueError("frame_idx must be >= 0")
                            return _avi_extract(
                                _d, _w, _h, _td, _rb, _fr[min(fi, len(_fr) - 1)]
                            )
                    elif data[:4] == _FAKE_VIDEO_MAGIC and fake:
                        f_, hh, ww = struct.unpack(">III", data[4:16])
                        raw = np.frombuffer(
                            zlib.decompress(data[16:]), dtype=np.uint8
                        ).reshape(f_, hh, ww, 3)

                        def extract(fi, _raw=raw, _f=f_):
                            if fi < 0:
                                raise ValueError("frame_idx must be >= 0")
                            return _raw[min(fi, _f - 1)]
                    else:
                        raise NotImplementedError(_STUB_VIDEO_MSG)
                except NotImplementedError as e:
                    payload_err = str(e)
                except Exception as e:  # noqa: BLE001
                    payload_err = f"{type(e).__name__}: {e}"
                for fi in idx_list:
                    rows["video_id"].append(vid)
                    rows["frame_idx"].append(fi)
                    if payload_err is not None:
                        rows["bytes"].append(None)
                        rows["decode_error"].append(payload_err)
                        continue
                    try:
                        rows["bytes"].append(encode_png(extract(fi)))
                        rows["decode_error"].append(None)
                    except Exception as e:  # noqa: BLE001
                        rows["bytes"].append(None)
                        rows["decode_error"].append(f"{type(e).__name__}: {e}")
            out = pd.DataFrame(rows)
            out["frame_idx"] = out["frame_idx"].astype(np.int32)
            yield out

    return df.select("video_id", "bytes").mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)
