"""Multimodal plumbing: schemas, mapInPandas batching, stubbed decode,
metadata-driven frame sampling, phash near-dup reuse of the Hamming core."""

import json

import pyspark.sql.functions as F

from hsip.multimodal import (
    MEDIA_SCHEMA,
    extract_audio_features,
    extract_image_features,
    frame_sample_plan,
    phash_near_dup_pairs,
    sample_video_frames,
    synthetic_media,
)


def test_image_feature_extraction(spark):
    media = synthetic_media(spark, n=40)
    feats = extract_image_features(media).collect()
    images = media.filter("kind = 'image'").count()
    assert len(feats) == images
    ok = [f for f in feats if f.ok]
    assert len(ok) == images  # stub decode succeeds on non-empty payloads
    assert all(16 <= f.width <= 80 and 16 <= f.height <= 80 for f in ok)
    # deterministic: same payload -> same phash
    again = {f.media_id: f.phash for f in extract_image_features(media).collect()}
    assert all(again[f.media_id] == f.phash for f in feats)


def test_empty_payload_marked_failed(spark):
    df = spark.createDataFrame(
        [("x", "image", "image/fake", b"", "{}")], schema=MEDIA_SCHEMA
    )
    rows = extract_image_features(df).collect()
    assert len(rows) == 1 and rows[0].ok is False


def test_audio_feature_extraction(spark):
    media = synthetic_media(spark, n=64)
    n_audio = media.filter("kind = 'audio'").count()
    feats = extract_audio_features(media).collect()
    assert len(feats) == n_audio and n_audio > 0
    for f in feats:
        assert f.ok
        assert f.duration_s > 0
        assert f.rms > 0 and f.peak >= f.rms
        assert 0.0 <= f.zero_cross_rate <= 1.0
    # deterministic across runs
    again = {f.media_id: f.rms for f in extract_audio_features(media).collect()}
    assert all(again[f.media_id] == f.rms for f in feats)


def test_video_frame_sampling_matches_metadata(spark):
    media = synthetic_media(spark, n=64)
    plan = sample_video_frames(media, every_n=30).collect()
    metas = {
        r.media_id: json.loads(r.meta_json)
        for r in media.filter("kind = 'video'").collect()
    }
    assert metas, "fixture must contain videos"
    by_vid = {}
    for row in plan:
        by_vid.setdefault(row.media_id, []).append(row)
    for mid, meta in metas.items():
        expected = list(range(0, meta["n_frames"], 30))
        got = sorted(by_vid.get(mid, []), key=lambda r: r.sample_idx)
        assert [r.frame_idx for r in got] == expected
        # pos column tracks the sequence position; ts from fps metadata
        assert [r.sample_idx for r in got] == list(range(len(expected)))
        assert all(abs(r.ts_sec - r.frame_idx / meta["fps"]) < 1e-12 for r in got)


def test_frame_sample_plan_is_pure_sql(spark):
    meta = spark.createDataFrame(
        [("v1", 10, 24.0), ("v2", 0, 30.0)], "media_id string, n_frames int, fps double"
    )
    plan = frame_sample_plan(meta, every_n=3)
    # no BatchEvalPython / ArrowEvalPython anywhere in the physical plan
    phys = plan._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys
    rows = plan.collect()
    assert sorted(r.frame_idx for r in rows) == [0, 3, 6, 9]
    assert {r.media_id for r in rows} == {"v1"}  # zero-frame video dropped


def test_phash_near_dup_pairs(spark):
    # planted: a==b (hamming 0), c within 2 bits of a, d far away
    base = 0x0123456789ABCDEF
    feats = spark.createDataFrame(
        [
            ("a", 32, 32, base, True),
            ("b", 32, 32, base, True),
            ("c", 32, 32, base ^ 0b11, True),
            ("d", 32, 32, ~base, True),
            ("bad", None, None, None, False),
        ],
        "media_id string, width int, height int, phash long, ok boolean",
    )
    pairs = {
        (r.media_a, r.media_b): r.hamming
        for r in phash_near_dup_pairs(feats, max_hamming=3).collect()
    }
    assert pairs[("a", "b")] == 0
    assert pairs[("a", "c")] == 2 and pairs[("b", "c")] == 2
    assert all("d" not in p and "bad" not in p for p in pairs)
