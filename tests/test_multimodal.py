"""Multimodal binary-column plumbing. Image (PPM P6) and audio (raw PCM
s16le) kernels decode for REAL with pure numpy; formats that need
external codecs (JPEG, compressed audio, video containers) raise unless
fake=True supplies the deterministic double."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from eel_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synth_media(spark, n=64)


def test_synth_media_schema(media):
    assert media.schema == mm.MEDIA_SCHEMA
    assert media.count() == 64


def test_ppm_round_trip():
    px = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    assert (mm.decode_ppm(mm.encode_ppm(px)) == px).all()
    # comments and multi-whitespace headers are legal P6
    with_comment = b"P6\n# a comment\n7 5\n255\n" + px.tobytes()
    assert (mm.decode_ppm(with_comment) == px).all()
    for bad in (b"", b"P5\n1 1\n255\nxxx", b"P6\n2 2\n255\nshort"):
        with pytest.raises(ValueError):
            mm.decode_ppm(bad)


def test_extract_image_features_real_decode(media):
    """fake=False works on P6 payloads: features are REAL pixel stats."""
    out = mm.extract_image_features(media, fake=False)
    rows = out.collect()
    assert len(rows) == 64 // 3 + (64 % 3 > 0)  # every 3rd row is an image
    metas = {
        r["media_id"]: r["meta"]
        for r in media.filter("media_type='image'").select("media_id", "meta").collect()
    }
    for r in rows:
        w, h = metas[r["media_id"]]["width"], metas[r["media_id"]]["height"]
        assert r["n_bytes"] == len(f"P6\n{w} {h}\n255\n") + w * h * 3
        assert len(r["features"]) == 8
        assert all(0.0 <= f < 1.0 for f in r["features"])
    # cross-check one row against a direct numpy decode
    r0 = next(r for r in rows if r["media_id"] == 0)
    payload = media.filter("media_id = 0").first()["payload"]
    px = mm.decode_ppm(bytes(payload)).astype(np.float64)
    assert r0["features"][0] == pytest.approx(px[..., 0].mean() / 256.0)
    assert r0["features"][3] == pytest.approx(px[..., 0].std() / 128.0)


def test_extract_image_features_deterministic(media):
    a = {r["media_id"]: r["features"] for r in mm.extract_image_features(media).collect()}
    b = {r["media_id"]: r["features"] for r in mm.extract_image_features(media).collect()}
    assert a == b


def test_non_ppm_image_raises_without_fake(media, spark):
    """JPEG-style payloads still need a real codec: honest failure."""
    jpeg_ish = media.filter("media_type='image'").withColumn(
        "payload", F.concat(F.lit(bytes([0xFF, 0xD8, 0xFF])), F.col("payload"))
    )
    with pytest.raises(Exception, match="NotImplementedError|non-PPM"):
        mm.extract_image_features(jpeg_ish, fake=False).collect()
    # with fake=True the deterministic double applies instead
    rows = mm.extract_image_features(jpeg_ish, fake=True).collect()
    assert all(len(r["features"]) == 8 for r in rows)


def test_resize_images_real(media):
    out = mm.resize_images(media, width=32, height=24, fake=False).collect()
    assert len(out) > 0
    for r in out:
        assert r["width"] == 32 and r["height"] == 24
        px = mm.decode_ppm(bytes(r["payload"]))
        assert px.shape == (24, 32, 3)
    # nearest-neighbor: resizing to the same dims is the identity
    src = mm.synth_media(media.sparkSession, n=3).filter("media_type='image'")
    row = src.first()
    w, h = row["meta"]["width"], row["meta"]["height"]
    same = mm.resize_images(src, width=w, height=h, fake=False).first()
    assert bytes(same["payload"]) == bytes(row["payload"])


def test_extract_audio_features_real_pcm(media):
    out = mm.extract_audio_features(media, fake=False).collect()
    assert len(out) > 0
    by_id = {r["media_id"]: r for r in out}
    payloads = {
        r["media_id"]: bytes(r["payload"])
        for r in media.filter("media_type='audio'").collect()
    }
    for mid, r in by_id.items():
        samples = np.frombuffer(payloads[mid], dtype="<i2").astype(np.float64) / 32768.0
        assert r["rms"] == pytest.approx(float((samples**2).mean() ** 0.5))
        assert 0.0 <= r["rms"] <= 1.0
        assert r["duration_ms"] is not None


def test_compressed_audio_raises_without_fake(media):
    mp3_ish = media.filter("media_type='audio'").withColumn(
        "meta",
        F.struct(
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
            F.lit("mp3").alias("codec"),
        ),
    )
    with pytest.raises(Exception, match="NotImplementedError|torchaudio"):
        mm.extract_audio_features(mp3_ish, fake=False).collect()
    rows = mm.extract_audio_features(mp3_ish, fake=True).collect()
    assert all(0.0 <= r["rms"] <= 1.0 for r in rows)


def test_frame_sample_plan_prunes_payload(media, spark, tmp_path):
    # persist to parquet so pruning is observable at a real scan
    path = str(tmp_path / "media")
    media.write.parquet(path)
    plan_df = mm.frame_sample_plan(spark.read.parquet(path), every_ms=1000)
    rows = plan_df.collect()
    assert len(rows) > 0
    for r in rows:
        assert all(ts % 1000 == 0 for ts in r["frame_ts_ms"])
    # metadata-only: the binary payload column must be pruned at the scan
    plan = plan_df._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "payload" not in read_schema


def test_pack_by_bytes(media):
    packed = mm.pack_by_bytes(
        media.withColumn("nb", F.length("payload")), F.col("nb"), target_mb=1
    )
    assert packed.count() == 64  # no row loss; partition count is an impl detail


def test_y4m_round_trip():
    """encode_y4m ⇄ y4m_frame/decode_y4m: RGB → BT.601 YCbCr planes →
    RGB is identity to within ±1 per channel (uint8 rounding)."""
    rng = np.random.RandomState(7)
    frames = rng.randint(0, 256, size=(3, 6, 8, 3)).astype(np.uint8)
    payload = mm.encode_y4m(frames, fps=(4, 1))
    info = mm.parse_y4m(payload)
    assert (info["width"], info["height"], info["n_frames"]) == (8, 6, 3)
    assert (info["fps_num"], info["fps_den"]) == (4, 1)
    back = mm.decode_y4m(payload)
    assert back.shape == frames.shape
    assert np.abs(back.astype(int) - frames.astype(int)).max() <= 1
    # single-frame extraction matches the full decode
    assert (mm.y4m_frame(payload, 1) == back[1]).all()
    # malformed / unsupported streams fail loudly
    for bad in (b"", b"RIFFxxxx", payload[:-5]):
        with pytest.raises(ValueError):
            mm.parse_y4m(bad)
    subsampled = payload.replace(b"C444", b"C420")
    with pytest.raises(ValueError, match="C444"):
        mm.parse_y4m(subsampled)


def test_sample_video_frames_real_y4m(media, spark):
    """Fan-out explode with REAL decode (fake=False): one video row →
    duration/every_ms + 1 frame rows; each sampled frame is a valid
    quarter-resolution P6 whose pixels match a direct numpy decode of
    the y4m payload."""
    frames = mm.sample_video_frames(media, every_ms=1000, fake=False)
    got = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.min("frame_ts_ms").alias("first_ts"),
        F.max("frame_ts_ms").alias("last_ts"),
    ).collect()
    vids = {
        r["media_id"]: r["meta"]["duration_ms"]
        for r in media.filter("media_type = 'video'").select("media_id", "meta").collect()
        if r["meta"]["duration_ms"] > 0
    }
    by_id = {r["media_id"]: r for r in got}
    assert set(by_id) == set(vids)  # zero-duration videos yield no rows
    for mid, dur in vids.items():
        assert by_id[mid]["n_frames"] == dur // 1000 + 1
        assert by_id[mid]["first_ts"] == 0
        assert by_id[mid]["last_ts"] == dur
    # cross-check one sampled frame against a direct decode: ts=1000 at
    # 4 fps is frame index 4
    mid = next(iter(vids))
    sampled = frames.filter(f"media_id = {mid} AND frame_ts_ms = 1000").first()
    payload = bytes(media.filter(f"media_id = {mid}").first()["payload"])
    expect = mm.y4m_frame(payload, min(mm.parse_y4m(payload)["n_frames"] - 1, 4))
    assert (mm.decode_ppm(bytes(sampled["frame"])) == expect).all()

    # non-y4m containers still gate honestly without fake
    mp4_ish = media.filter("media_type='video'").withColumn(
        "payload", F.concat(F.lit(b"\x00\x00\x00 ftypmp42"), F.col("payload"))
    )
    with pytest.raises(Exception, match="NotImplementedError|non-y4m"):
        mm.sample_video_frames(mp4_ish, fake=False).collect()
    # and the fake double still honors the explode contract
    fake_frames = mm.sample_video_frames(mp4_ish, every_ms=1000, fake=True)
    assert fake_frames.count() == sum(d // 1000 + 1 for d in vids.values())


# ---------------------------------------------------------------------------
# engine-neutral corpus + integer stats (the r10 oracle path)
# ---------------------------------------------------------------------------


def test_encode_y4m_planes_round_trip():
    planes = np.arange(2 * 3 * 4 * 5, dtype=np.uint8).reshape(2, 3, 4, 5)
    payload = mm.encode_y4m_planes(planes, fps=(1, 1))
    info = mm.parse_y4m(payload)
    assert (info["n_frames"], info["fps_num"], info["fps_den"]) == (2, 1, 1)
    assert (info["width"], info["height"]) == (5, 4)
    for k in range(2):
        assert (mm.y4m_frame_planes(payload, k) == planes[k]).all()
    # encode_y4m (RGB path) now shares the plane writer: same container
    rgb = np.arange(1 * 4 * 5 * 3, dtype=np.uint8).reshape(1, 4, 5, 3)
    assert mm.parse_y4m(mm.encode_y4m(rgb))["n_frames"] == 1


def test_synth_media_lcg_payloads_match_formulas(spark):
    """Every payload byte/sample is the documented pure function of
    (media_id, coordinate) — spot-checked after a REAL decode."""
    rows = {r["media_id"]: r for r in mm.synth_media_lcg(spark, n=12).collect()}
    for i in (0, 3, 9):  # images
        px = mm.decode_ppm(bytes(rows[i]["payload"]))
        h, w = px.shape[:2]
        assert (w, h) == (64 + i % 32, 48 + i % 16)
        assert px[2, 5, 0] == (5 * 3 + i) % 256
        assert px[2, 5, 1] == (2 * 5 + 2 * i) % 256
        assert px[2, 5, 2] == (5 + 2 + 7 * i) % 256
    for i in (1, 4, 10):  # audio
        s = np.frombuffer(bytes(rows[i]["payload"]), dtype="<i2")
        ns = 256 + (i % 5) * 64
        assert len(s) == ns
        for k in (0, 7, ns - 1):
            assert s[k] == ((i * 1000003 + k * 40503 + 12345) * 2654435761) % 65536 - 32768
    for i in (2, 5, 11):  # video: planted YCbCr planes survive bit-exactly
        payload = bytes(rows[i]["payload"])
        assert mm.parse_y4m(payload)["n_frames"] == i % 7 + 1
        k = i % 7  # last frame
        planes = mm.y4m_frame_planes(payload, k)
        assert planes.shape == (3, (48 + i % 16) // 4, (64 + i % 32) // 4)
        assert planes[1, 2, 3] == (3 * 3 + 2 * 5 + 17 * 1 + 13 * k + i) % 256


def test_payload_integer_stats_matches_pure_python(spark):
    """The mapInPandas kernel's integer stats equal a from-scratch Python
    recomputation of the planted formulas for ALL ids — the same numbers
    the DuckDB oracle derives arithmetically."""
    n = 16
    out = {
        r["media_id"]: r
        for r in mm.payload_integer_stats(
            mm.synth_media_lcg(spark, n=n), every_ms=1000
        ).collect()
    }
    assert len(out) == n
    for i in range(n):
        w, h = 64 + i % 32, 48 + i % 16
        if i % 3 == 0:
            units = [
                c
                for x in range(w)
                for y in range(h)
                for c in ((x * 3 + i) % 256, (y * 5 + 2 * i) % 256,
                          (x + y + 7 * i) % 256)
            ]
            n_bytes = 13 + w * h * 3
        elif i % 3 == 1:
            ns = 256 + (i % 5) * 64
            units = [
                ((i * 1000003 + k * 40503 + 12345) * 2654435761) % 65536 - 32768
                for k in range(ns)
            ]
            n_bytes = 2 * ns
        else:
            nf, vw, vh = i % 7 + 1, w // 4, h // 4
            units = [
                (x * 3 + y * 5 + 17 * p + 13 * k + i) % 256
                for k in range(nf)
                for p in range(3)
                for y in range(vh)
                for x in range(vw)
            ]
            n_bytes = 36 + nf * (6 + 3 * vw * vh)
        r = out[i]
        assert r["n_bytes"] == n_bytes, i
        assert r["n_units"] == len(units), i
        assert r["unit_sum"] == sum(units), i
        assert r["unit_sq_sum"] == sum(u * u for u in units), i


def test_multimodal_features_matches_oracle(spark, oracle):
    from eel_spark.queries import ORACLE, QUERIES
    from tests.conftest import SF_DIR, assert_df_matches_oracle

    assert_df_matches_oracle(
        QUERIES["multimodal_features"](spark, SF_DIR),
        oracle,
        ORACLE["multimodal_features"],
    )


def test_multimodal_selfcheck_chain(spark):
    """The pre-r10 self-verifying composite (float statistics + the lossy
    y4m → RGB → P6 → image-kernel chain) stays green: 22 images + 21
    audio + 18 videos (duration-0 videos sample no frames there)."""
    from eel_spark.queries.pipeline import multimodal_selfcheck

    df = multimodal_selfcheck(spark, "/root/testdata/sf0.001")
    counts = {
        r["media_type"]: r["n"]
        for r in df.groupBy("media_type").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"image": 22, "audio": 21, "video": 18}


def test_resize_integer_stats_match_formula(spark):
    """Oracle-grade check for the RESIZE kernel: nearest-neighbor index
    selection is pure integer arithmetic (rows[y] = min(y*sh//th, sh-1)),
    so over the LCG corpus the resized raster's exact per-pixel values
    are computable from the planted formula without running numpy —
    any index-rounding or channel-order drift in _resize_image breaks
    the equality."""
    tw, th = 17, 11
    media = mm.synth_media_lcg(spark, n=12)
    out = {
        r["media_id"]: bytes(r["payload"])
        for r in mm.resize_images(media, width=tw, height=th).collect()
    }
    assert set(out) == {0, 3, 6, 9}
    for i, payload in out.items():
        px = mm.decode_ppm(payload)
        assert px.shape == (th, tw, 3)
        sw, sh = 64 + i % 32, 48 + i % 16
        for y in (0, th // 2, th - 1):
            for x in (0, tw // 2, tw - 1):
                sy = min(y * sh // th, sh - 1)
                sx = min(x * sw // tw, sw - 1)
                assert px[y, x, 0] == (sx * 3 + i) % 256, (i, x, y)
                assert px[y, x, 1] == (sy * 5 + 2 * i) % 256, (i, x, y)
                assert px[y, x, 2] == (sx + sy + 7 * i) % 256, (i, x, y)
