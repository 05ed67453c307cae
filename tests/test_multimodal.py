"""Multimodal operators: real image path, stubbed audio/video plumbing,
embedding near-duplicates."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from driftspark import imageops as io
from driftspark.ann import embedding_near_duplicates, knn_pairs_exact
from driftspark.multimodal import (
    audio_features,
    encode_fake_audio,
    encode_fake_video,
    image_features,
    resize_images,
    sample_frames,
)
from driftspark.synth import synth_image_table


def test_image_features_real_decode(spark):
    t = synth_image_table(spark, 200, with_bytes=True, num_partitions=2)
    feats = image_features(t).cache()
    pdf = feats.toPandas()
    assert len(pdf) == 200
    assert pdf["decode_error"].isna().all()
    assert (pdf["width"] > 0).all() and (pdf["height"] > 0).all()
    # pixels are uniform-ish noise in [0, 200) + brightness: means near 100
    assert pdf["brightness"].between(60, 140).all()
    assert (pdf["contrast"] > 0).all()
    # oracle on one row
    row = t.where("image_id = 'img_0000000000'").first()
    px = io.decode_image(bytes(row["bytes"]), row["fmt"])
    f0 = pdf[pdf["image_id"] == "img_0000000000"].iloc[0]
    assert f0["brightness"] == pytest.approx(px.astype(float).mean(axis=2).mean(), abs=1e-9)
    assert f0["mean_r"] == pytest.approx(px[:, :, 0].mean(), abs=1e-9)


def test_resize_images(spark):
    t = synth_image_table(spark, 50, with_bytes=True, num_partitions=2)
    resized = resize_images(t, 8, 8).toPandas()
    assert len(resized) == 50
    assert (resized["w"] == 8).all() and (resized["h"] == 8).all()
    px = io.decode_png(bytes(resized["bytes"].iloc[0]))
    assert px.shape == (8, 8, 3)


def test_audio_features_fake_codec(spark):
    rng = np.random.RandomState(42)
    rows = []
    for i in range(20):
        sr = 16000
        samples = np.sin(np.linspace(0, 440 * 2 * np.pi, sr)).astype(np.float32)
        rows.append((f"aud_{i}", encode_fake_audio(samples, sr)))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["audio_id", "bytes"]))
    feats = audio_features(df, fake=True).toPandas()
    assert len(feats) == 20
    assert feats["decode_error"].isna().all()
    assert (feats["sample_rate"] == 16000).all()
    assert feats["duration_sec"].iloc[0] == pytest.approx(1.0, abs=1e-6)
    assert feats["rms"].iloc[0] == pytest.approx(1 / np.sqrt(2), abs=0.01)  # sine RMS
    assert feats["peak"].iloc[0] == pytest.approx(1.0, abs=0.01)


def test_audio_error_surfaces(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            [
                ("a0", b"RIFF....WAVE"),        # RIFF but malformed → real decode error
                ("a1", b"\xff\xfb\x90mp3data"),  # compressed format → stub error
            ],
            columns=["audio_id", "bytes"],
        )
    )
    feats = audio_features(df).toPandas().set_index("audio_id")
    assert "ValueError" in feats.loc["a0", "decode_error"]
    assert "RIFF/WAVE" in feats.loc["a1", "decode_error"]


def test_video_frame_sampling_fake_codec(spark):
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (10, 16, 16, 3)).astype(np.uint8)
    df = spark.createDataFrame(
        pd.DataFrame([("v0", encode_fake_video(frames))], columns=["video_id", "bytes"])
    )
    out = sample_frames(df, [0, 5, 9], fake=True).toPandas()
    assert len(out) == 3
    assert out["decode_error"].isna().all()
    # extracted frame 5 decodes back to the original pixels
    f5 = out[out["frame_idx"] == 5].iloc[0]
    assert np.array_equal(io.decode_png(bytes(f5["bytes"])), frames[5])
    # fake-codec payload without the fake flag hits the compressed-stub path
    stub = sample_frames(df, [0]).toPandas()
    assert "RIFF/AVI" in stub["decode_error"].iloc[0]


def test_embedding_near_duplicates(spark):
    rng = np.random.RandomState(42)
    base = rng.normal(size=(60, 16)).astype(np.float32)
    # rows 0/1 and 2/3 are near-duplicates (tiny perturbation)
    base[1] = base[0] + rng.normal(scale=0.01, size=16)
    base[3] = base[2] + rng.normal(scale=0.01, size=16)
    pdf = pd.DataFrame({"vec_id": range(60), "embedding": [v.tolist() for v in base]})
    df = spark.createDataFrame(pdf)
    got = embedding_near_duplicates(
        df, "vec_id", "embedding", min_cosine=0.99, bands=8, n_planes=16
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    assert (0, 1) in pairs and (2, 3) in pairs
    # verified cosines are exact
    sims = {(r["id_a"], r["id_b"]): r["cosine"] for r in got}
    a, b = base[0], base[1]
    expected = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert sims[(0, 1)] == pytest.approx(expected, abs=1e-6)
    # no false positives against the exact all-pairs oracle
    oracle = knn_pairs_exact(df, "vec_id", "embedding", k=59)
    true_pairs = {
        (r["id_a"], r["id_b"])
        for r in oracle.where("cosine >= 0.99").collect()
        if r["id_a"] < r["id_b"]
    }
    assert pairs <= true_pairs


def test_ivf_index_recall(spark):
    rng = np.random.RandomState(42)
    from driftspark.ann import IVFIndex, cosine_topk

    # clustered embeddings so IVF cells are meaningful
    centers = rng.normal(size=(8, 16)) * 3
    vecs = np.vstack([c + rng.normal(scale=0.3, size=(50, 16)) for c in centers]).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(400), "embedding": [v.tolist() for v in vecs]})
    df = spark.createDataFrame(pdf)
    idx = IVFIndex(n_centroids=8).fit(df, "embedding")
    assigned = idx.assign(df, "embedding").cache()
    # every vector gets a cell; cells partition the data
    counts = assigned.groupBy("centroid_id").count().collect()
    assert sum(r["count"] for r in counts) == 400
    assert len(counts) >= 6
    q = vecs[0].tolist()
    exact = [r["vec_id"] for r in cosine_topk(df.where("vec_id <> 0"), "vec_id", "embedding", q, 10).collect()]
    got = [r["vec_id"] for r in idx.search(assigned.where("vec_id <> 0"), "vec_id", "embedding", q, k=10, n_probe=2).collect()]
    recall = len(set(exact) & set(got)) / 10
    assert recall >= 0.9  # clustered data: nearest cell holds the neighbors
    # determinism: refit gives identical centroids
    idx2 = IVFIndex(n_centroids=8).fit(df, "embedding")
    assert np.allclose(idx.centroids, idx2.centroids)


# ---------------------------------------------------------------------------
# Real WAV codec (VERDICT r01 next-round #4: de-stub audio)
# ---------------------------------------------------------------------------


def test_wav_roundtrip_pcm16_and_float32():
    from driftspark.multimodal import decode_wav, encode_wav

    rng = np.random.RandomState(7)
    x = (rng.rand(1000) * 1.8 - 0.9).astype(np.float64)
    y16, sr = decode_wav(encode_wav(x, 8000, bits=16))
    assert sr == 8000 and len(y16) == 1000
    # encode scales by 32767, decode by 32768 (WAV convention):
    # |error| <= (0.5 + |x|) / 32768
    assert np.allclose(y16, x, atol=1.5 / 32768)
    y32, sr = decode_wav(encode_wav(x, 44100, bits=32))
    assert sr == 44100
    assert np.allclose(y32, x, atol=1e-7)


def test_wav_decode_uint8_int32_and_stereo_mixdown():
    import struct as st

    from driftspark.multimodal import decode_wav

    def wav(fmt_code, ch, sr, bits, raw):
        fmt = st.pack("<HHIIHH", fmt_code, ch, sr, sr * ch * bits // 8, ch * bits // 8, bits)
        return (b"RIFF" + st.pack("<I", 4 + 8 + len(fmt) + 8 + len(raw)) + b"WAVE"
                + b"fmt " + st.pack("<I", len(fmt)) + fmt
                + b"data" + st.pack("<I", len(raw)) + raw)

    # uint8 PCM: 128 -> 0.0, 255 -> ~0.99, 0 -> -1.0
    y, sr = decode_wav(wav(1, 1, 8000, 8, bytes([128, 255, 0])))
    assert np.allclose(y, [(128 - 128) / 128, (255 - 128) / 128, (0 - 128) / 128])
    # int32 PCM
    y, _ = decode_wav(wav(1, 1, 8000, 32, np.array([2**30, -(2**31)], dtype="<i4").tobytes()))
    assert np.allclose(y, [0.5, -1.0])  # 2^30 / 2^31, -2^31 / 2^31
    # stereo float32 mixes down to channel mean
    stereo = np.array([0.5, -0.5, 1.0, 0.0], dtype="<f4").tobytes()
    y, _ = decode_wav(wav(3, 2, 8000, 32, stereo))
    assert np.allclose(y, [0.0, 0.5])


def test_wav_rejects_garbage_and_unknown_chunks_skipped():
    import struct as st

    from driftspark.multimodal import decode_wav, encode_wav

    with pytest.raises(ValueError):
        decode_wav(b"not a wav at all")
    # inject an unknown chunk between fmt and data — decoder must skip it
    wav = encode_wav(np.array([0.25, -0.25]), 8000, bits=32)
    fmt_end = 12 + 8 + 16
    injected = wav[:fmt_end] + b"LIST" + st.pack("<I", 4) + b"INFO" + wav[fmt_end:]
    y, sr = decode_wav(injected)
    assert sr == 8000 and np.allclose(y, [0.25, -0.25], atol=1e-7)


def test_audio_features_real_wav(spark):
    """audio_features over synth WAV table matches a hand numpy oracle."""
    from driftspark.multimodal import audio_features, decode_wav
    from driftspark.synth import synth_audio_table

    t = synth_audio_table(spark, 30, num_partitions=3)
    payloads = {r["audio_id"]: bytes(r["bytes"]) for r in t.collect()}
    feats = {r["audio_id"]: r for r in audio_features(t).collect()}
    assert len(feats) == 30
    for aid, data in payloads.items():
        r = feats[aid]
        assert r["decode_error"] is None, r["decode_error"]
        x, sr = decode_wav(data)
        assert r["sample_rate"] == sr == 8000
        assert r["n_samples"] == len(x)
        assert abs(r["duration_sec"] - len(x) / sr) < 1e-12
        assert abs(r["rms"] - float(np.sqrt(np.mean(x**2)))) < 1e-12
        assert abs(r["peak"] - float(np.abs(x).max())) < 1e-12
        zcr = float((np.diff(np.signbit(x)) != 0).mean())
        assert abs(r["zero_crossing_rate"] - zcr) < 1e-12


def test_synth_audio_deterministic(spark):
    from driftspark.synth import synth_audio_table

    a = {r["audio_id"]: bytes(r["bytes"])
         for r in synth_audio_table(spark, 20, num_partitions=2).collect()}
    b = {r["audio_id"]: bytes(r["bytes"])
         for r in synth_audio_table(spark, 20, num_partitions=5).collect()}
    assert a == b  # partitioning-invariant generation


# ---------------------------------------------------------------------------
# Real uncompressed-AVI video codec
# ---------------------------------------------------------------------------


def test_avi_roundtrip_exact():
    from driftspark.multimodal import decode_avi_frame, encode_avi

    rng = np.random.RandomState(5)
    frames = rng.randint(0, 256, (7, 12, 16, 3)).astype(np.uint8)
    avi = encode_avi(frames, fps=10)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    for k in (0, 3, 6):
        assert np.array_equal(decode_avi_frame(avi, k), frames[k])
    # past-the-end clamps to the last frame (fake-codec parity)
    assert np.array_equal(decode_avi_frame(avi, 99), frames[6])


def test_avi_row_padding_odd_width():
    """w=5 -> 15-byte rows pad to 16; pixels must survive exactly."""
    from driftspark.multimodal import decode_avi_frame, encode_avi

    rng = np.random.RandomState(9)
    frames = rng.randint(0, 256, (2, 3, 5, 3)).astype(np.uint8)
    avi = encode_avi(frames)
    assert np.array_equal(decode_avi_frame(avi, 0), frames[0])
    assert np.array_equal(decode_avi_frame(avi, 1), frames[1])


def test_avi_rejects_non_avi_and_compressed():
    from driftspark.multimodal import decode_avi_frame

    with pytest.raises(ValueError):
        decode_avi_frame(b"RIFF\x00\x00\x00\x00WAVE", 0)
    with pytest.raises(ValueError):
        decode_avi_frame(b"nonsense bytes here!", 0)


def test_sample_frames_real_avi(spark):
    from driftspark.multimodal import encode_avi

    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (10, 16, 16, 3)).astype(np.uint8)
    df = spark.createDataFrame(
        pd.DataFrame([("v0", encode_avi(frames))], columns=["video_id", "bytes"])
    )
    out = sample_frames(df, [0, 5, 9]).toPandas()  # no fake flag: REAL path
    assert len(out) == 3
    assert out["decode_error"].isna().all()
    f5 = out[out["frame_idx"] == 5].iloc[0]
    assert np.array_equal(io.decode_png(bytes(f5["bytes"])), frames[5])


def test_synth_video_table_deterministic_and_error_rows(spark):
    """synth_video_table is layout-invariant (counter-based payloads) and
    carries the controlled fake-codec + truncated-RIFF rows; sample_frames
    over it surfaces exactly those as decode_error rows."""
    from driftspark.synth import (
        VIDEO_CORRUPT_EVERY,
        VIDEO_FAKE_EVERY,
        synth_video_table,
    )

    n = 60  # covers one fake (22) and two corrupt (28, 57) ids
    a = synth_video_table(spark, n, num_partitions=2).orderBy("video_id").collect()
    b = synth_video_table(spark, n, num_partitions=5).orderBy("video_id").collect()
    assert [bytes(r["bytes"]) for r in a] == [bytes(r["bytes"]) for r in b]

    out = sample_frames(synth_video_table(spark, n, num_partitions=3), [0]).toPandas()
    errs = out[out["decode_error"].notna()].set_index("video_id")["decode_error"]
    bad_fake = {f"vid_{i:08d}" for i in range(n) if i % VIDEO_FAKE_EVERY == VIDEO_FAKE_EVERY - 1
                and i % VIDEO_CORRUPT_EVERY != VIDEO_CORRUPT_EVERY - 1}
    bad_corrupt = {f"vid_{i:08d}" for i in range(n) if i % VIDEO_CORRUPT_EVERY == VIDEO_CORRUPT_EVERY - 1}
    assert set(errs.index) == bad_fake | bad_corrupt
    for vid in bad_fake:
        assert "RIFF/AVI" in errs[vid]  # NotImplementedError message
    for vid in bad_corrupt:
        assert errs[vid].startswith("ValueError:")
    ok = out[out["decode_error"].isna()]
    assert len(ok) == n - len(errs)
    assert ok["bytes"].notna().all()


def test_embedding_drift_numpy_oracle(spark):
    """embedding_drift == hand-numpy Welch z per dimension; only the
    shifted dimensions flag; rows with a mismatched dimension drop."""
    from driftspark.ann import embedding_drift

    rng = np.random.RandomState(3)
    d = 6
    R = rng.normal(0, 1, (300, d))
    T = rng.normal(0, 1, (320, d))
    T[:, 1] += 2.0  # strong shift on dim 1 only
    rows = [(i, v.tolist()) for i, v in enumerate(R)]
    rows += [(1000, [0.0, 1.0])]  # wrong-dim row must be ignored
    ref = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "embedding"]))
    test = spark.createDataFrame(
        pd.DataFrame([(i, v.tolist()) for i, v in enumerate(T)], columns=["id", "embedding"])
    )
    out = embedding_drift(ref, test, "embedding", z_threshold=4.0).toPandas()
    assert len(out) == d
    assert out.set_index("dim")["drifted"].to_dict() == {
        j: (j == 1) for j in range(d)
    }
    m0, m1 = R.mean(axis=0), T.mean(axis=0)
    v0, v1 = R.var(axis=0), T.var(axis=0)  # population (ddof=0)
    z = (m1 - m0) / (np.sqrt(v0 / len(R) + v1 / len(T)) + 1e-12)
    np.testing.assert_allclose(out.sort_values("dim")["z"].values, z, rtol=1e-9)
    np.testing.assert_allclose(out.sort_values("dim")["ref_std"].values, np.sqrt(v0), rtol=1e-9)


def test_embedding_drift_requires_both_sides(spark):
    from driftspark.ann import embedding_drift

    ref = spark.createDataFrame(
        pd.DataFrame({"embedding": [[0.0, 1.0], [1.0, 0.0]]})
    )
    empty = spark.createDataFrame(pd.DataFrame({"embedding": [[0.0, 1.0]]})).where("false")
    with pytest.raises(ValueError, match="no rows"):
        embedding_drift(ref, empty, "embedding")


def test_embedding_dim_inference_null_first_row(spark):
    """A NULL embedding in the physically-first reference row must raise
    the documented loud ValueError from every dim-inference site, not a
    cryptic int(None)/int(-1) failure (size(NULL) is NULL under ANSI but
    -1 under legacy semantics — both rejected)."""
    from driftspark.ann import embedding_drift, embedding_near_duplicates
    from driftspark.streaming import fit_embedding_moments

    nullfirst = spark.createDataFrame(
        [(0, None), (1, [0.0, 1.0])], "id long, embedding array<double>"
    ).coalesce(1).orderBy("id")
    with pytest.raises(ValueError, match="pass dim explicitly"):
        embedding_drift(nullfirst, nullfirst, "embedding")
    with pytest.raises(ValueError, match="pass dim explicitly"):
        fit_embedding_moments(nullfirst, "embedding")
    with pytest.raises(ValueError, match="pass dim explicitly"):
        embedding_near_duplicates(nullfirst, "id", "embedding")
    # explicit dim still works over the same data (NULL row filtered out)
    d = embedding_drift(nullfirst, nullfirst, "embedding", dim=2)
    assert d.count() == 2


def test_embedding_null_element_guard_parity(spark, caplog):
    """A row whose embedding CONTAINS a NULL element must be excluded from
    moments in BOTH the batch and streaming paths (guard-parity rule):
    F.sum skips the NULL element while n counts the row, silently biasing
    that dimension's mean — and in the cumulative stream the NaN poisons
    (s, q) state forever.  The drop is counted + warned (batch/fit)."""
    import logging

    from driftspark.ann import _valid_vec, embedding_drift
    from driftspark.streaming import fit_embedding_moments

    clean = [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0], [7.0, 8.0]]
    # NULL elements AND a real NaN element: both poison cumulative state
    # (a NaN passes isNotNull, so the guard needs the explicit isnan arm)
    dirty = clean + [[100.0, None], [None, None], [float("nan"), 9.0]]
    ref = spark.createDataFrame(
        [(v,) for v in dirty], "embedding array<double>"
    )
    test = spark.createDataFrame(
        [(v,) for v in clean], "embedding array<double>"
    )
    with caplog.at_level(logging.WARNING, logger="driftspark.ann"):
        out = embedding_drift(ref, test, "embedding", dim=2).toPandas()
    exp_mean = np.array(clean).mean(axis=0)
    np.testing.assert_allclose(
        out.sort_values("dim")["ref_mean"].values, exp_mean, rtol=1e-12
    )
    np.testing.assert_allclose(
        out.sort_values("dim")["test_mean"].values, exp_mean, rtol=1e-12
    )
    assert any("dropped rows" in r.getMessage() for r in caplog.records)

    n, mean, var = fit_embedding_moments(ref, "embedding", dim=2)
    assert n == 4
    np.testing.assert_allclose(mean, exp_mean, rtol=1e-12)

    # the shared predicate itself: NULL array and NULL element both drop
    flags = (
        ref.select(F.coalesce(_valid_vec("embedding", 2), F.lit(False)).alias("ok"))
        .toPandas()["ok"]
        .tolist()
    )
    assert flags == [True, True, True, True, False, False, False]


def test_embedding_drift_summarizer_path_matches(spark):
    """The wide-dim Summarizer path (single JVM vector accumulator) agrees
    with the per-dimension expression path to float tolerance."""
    from driftspark.ann import embedding_drift

    rng = np.random.RandomState(11)
    R = rng.normal(0, 1, (200, 12))
    T = rng.normal(0.2, 1.1, (180, 12))
    ref = spark.createDataFrame(
        pd.DataFrame({"embedding": [v.tolist() for v in R]})
    )
    test = spark.createDataFrame(
        pd.DataFrame({"embedding": [v.tolist() for v in T]})
    )
    a = embedding_drift(ref, test, "embedding", max_codegen_dim=256).toPandas()
    b = embedding_drift(ref, test, "embedding", max_codegen_dim=0).toPandas()
    for c in ("ref_mean", "test_mean", "mean_shift", "ref_std", "test_std", "z"):
        np.testing.assert_allclose(
            a.sort_values("dim")[c].values, b.sort_values("dim")[c].values,
            rtol=1e-9, atol=1e-12,
        )
    assert (a.sort_values("dim")["drifted"].values == b.sort_values("dim")["drifted"].values).all()


def test_zero_norm_embedding_does_not_abort(spark):
    """An all-zero embedding has no defined cosine: under Spark 4's
    default ANSI mode the norm-product division used to abort the job.
    The NULL cosine must drop the vector from near-dup pairs and top-k
    results instead."""
    from driftspark.ann import cosine_topk, embedding_near_duplicates

    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.01]),
        (2, [0.0, 0.0]),  # zero norm
    ]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    top = cosine_topk(df, "id", "embedding", [1.0, 0.0], k=3).collect()
    assert [r["id"] for r in top][:2] == [0, 1]
    assert all(r["cosine"] is not None for r in top[:2])
    pairs = embedding_near_duplicates(
        df, "id", "embedding", min_cosine=0.9, max_bucket_size=10
    ).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in ids
    assert all(2 not in p for p in ids)


def test_avi_truncated_frame_chunk_is_error_not_garbage():
    """A frame chunk shorter than row_bytes*h must raise (surfacing as a
    decode_error row), not silently read the NEXT chunk's bytes as
    pixels."""
    import struct as st

    from driftspark.multimodal import decode_avi_frame, encode_avi

    rng = np.random.RandomState(5)
    frames = rng.randint(0, 255, (2, 8, 8, 3)).astype(np.uint8)
    data = bytearray(encode_avi(frames))
    # shrink the first '00db' chunk's declared size by half
    i = bytes(data).index(b"00db")
    size = st.unpack("<I", data[i + 4 : i + 8])[0]
    st.pack_into("<I", data, i + 4, size // 2)
    with pytest.raises(ValueError, match="truncated"):
        decode_avi_frame(bytes(data), 0)


def test_negative_frame_index_rejected(spark):
    from driftspark.multimodal import decode_avi_frame, encode_avi

    rng = np.random.RandomState(6)
    frames = rng.randint(0, 255, (4, 8, 8, 3)).astype(np.uint8)
    avi = encode_avi(frames)
    with pytest.raises(ValueError, match=">= 0"):
        decode_avi_frame(avi, -1)
    df = spark.createDataFrame(
        pd.DataFrame([("v0", avi)], columns=["video_id", "bytes"])
    )
    out = sample_frames(df, [-1, 0]).toPandas().set_index("frame_idx")
    assert ">= 0" in out.loc[-1, "decode_error"]
    assert out.loc[0, "decode_error"] is None


def test_one_pixel_image_features_no_nan(spark):
    from driftspark.imageops import encode_png

    px = np.full((1, 1, 3), 200, dtype=np.uint8)
    df = spark.createDataFrame(
        pd.DataFrame([("i0", bytearray(encode_png(px)), "png")],
                     columns=["image_id", "bytes", "fmt"])
    )
    row = image_features(df).first()
    assert row["decode_error"] is None
    assert row["edge_density"] == 0.0
    assert row["brightness"] == pytest.approx(200.0)


def test_resize_images_corrupt_payload_survives(spark):
    """One truncated payload must emit a decode_error row, not abort the
    whole job (the lone decode path that used to raise through Spark)."""
    t = synth_image_table(spark, 10, with_bytes=True, num_partitions=1)
    corrupt = spark.createDataFrame(
        pd.DataFrame([("bad_row", bytearray(b"\x89PNGtruncated"), "png")],
                     columns=["image_id", "bytes", "fmt"])
    )
    out = resize_images(
        t.select("image_id", "bytes", "fmt").unionByName(corrupt), 4, 4
    ).toPandas().set_index("image_id")
    assert out.loc["bad_row", "decode_error"] is not None
    assert out.loc["bad_row", "bytes"] is None
    good = out.drop(index="bad_row")
    assert good["decode_error"].isna().all()
    assert len(good) == 10


def test_ivf_search_many_matches_per_query_search(spark):
    """Batch probe-pruned search returns, for every query, the same hit
    set and ranking as the single-query search() loop; the broadcast path
    really broadcasts (corpus never shuffles) and the shuffle path
    (broadcast_queries=False) returns identical rows."""
    from driftspark.ann import IVFIndex

    rng = np.random.RandomState(9)
    d = 10
    rows = [(i, [float(x) for x in rng.normal(0, 1, d)]) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    idx = IVFIndex(n_centroids=6, sample_rows=300).fit(df, "vec")
    queries = df.where(F.col("id") < 4)
    corpus = df.where(F.col("id") >= 4)
    assigned = idx.assign(corpus, "vec").cache()

    batch = idx.search_many(
        assigned, "id", "vec", queries, "id", "vec", k=5, n_probe=3
    )
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:1500]
    got = {
        (r["query_id"], r["rank"]): (r["id"], round(r["cosine"], 9))
        for r in batch.collect()
    }
    for q in queries.collect():
        single = idx.search(assigned, "id", "vec", q["vec"], k=5, n_probe=3)
        for rank, r in enumerate(single.collect(), start=1):
            assert got[(q["id"], rank)] == (r["id"], round(r["cosine"], 9))

    shuffled = idx.search_many(
        assigned, "id", "vec", queries, "id", "vec", k=5, n_probe=3,
        broadcast_queries=False,
    )
    got2 = {
        (r["query_id"], r["rank"]): (r["id"], round(r["cosine"], 9))
        for r in shuffled.collect()
    }
    assert got2 == got
    assigned.unpersist()
