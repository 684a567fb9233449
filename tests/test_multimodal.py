"""Multimodal plumbing: schemas, mapInPandas batching, stubbed decode."""

from hsip.multimodal import extract_image_features, synthetic_media


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
    from hsip.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(
        [("x", "image", "image/fake", b"", "{}")], schema=MEDIA_SCHEMA
    )
    rows = extract_image_features(df).collect()
    assert len(rows) == 1 and rows[0].ok is False
