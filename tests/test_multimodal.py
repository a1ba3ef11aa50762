"""Multimodal binary-column plumbing: Arrow batch contracts are real,
decode kernels are stubs (fake=True doubles; fake=False raises)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eel_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synth_media(spark, n=64)


def test_synth_media_schema(media):
    assert media.schema == mm.MEDIA_SCHEMA
    assert media.count() == 64


def test_extract_image_features(media):
    out = mm.extract_image_features(media, fake=True)
    rows = out.collect()
    assert len(rows) == 64 // 3 + (64 % 3 > 0)  # every 3rd row is an image
    for r in rows:
        assert r["n_bytes"] > 0
        assert len(r["features"]) == 8
        assert all(0.0 <= f <= 1.0 for f in r["features"])


def test_extract_image_features_deterministic(media):
    a = {r["media_id"]: r["features"] for r in mm.extract_image_features(media, fake=True).collect()}
    b = {r["media_id"]: r["features"] for r in mm.extract_image_features(media, fake=True).collect()}
    assert a == b


def test_stub_raises_without_fake(media):
    with pytest.raises(Exception) as exc:
        mm.extract_image_features(media, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_resize_images(media):
    out = mm.resize_images(media, width=32, height=32, fake=True).collect()
    assert len(out) > 0
    for r in out:
        assert r["width"] == 32 and r["height"] == 32
        assert len(r["payload"]) == (32 * 32) // 64


def test_extract_audio_features(media):
    out = mm.extract_audio_features(media, fake=True).collect()
    assert len(out) > 0
    for r in out:
        assert 0.0 <= r["rms"] <= 1.0
        assert r["duration_ms"] is not None


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


def test_sample_video_frames(media, spark):
    """Fan-out explode: one video row → duration/every_ms + 1 frame rows,
    deterministic stub frames, media_id/timestamp contract intact."""
    import eel_spark.operators.multimodal as mm
    from pyspark.sql import functions as F

    frames = mm.sample_video_frames(media, every_ms=1000, fake=True)
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
    # frames are deterministic and non-empty
    f0 = frames.filter("media_id = 2 AND frame_ts_ms = 0").first()["frame"]
    f1 = frames.filter("media_id = 2 AND frame_ts_ms = 0").first()["frame"]
    assert f0 == f1 and len(f0) > 0

    # without fake=True the stub declares itself honestly
    import pytest
    with pytest.raises(Exception, match="NotImplementedError|video decode"):
        mm.sample_video_frames(media, fake=False).collect()
