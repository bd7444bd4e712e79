"""Multimodal plumbing tests: schemas, batch shapes, determinism,
decoder gating (the decode itself is a documented stub)."""

import pytest

from invertedindex_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    df = mm.synthesize_media(spark, 50, seed=42)
    df.cache().count()
    return df


def test_media_schema(media):
    assert dict(media.dtypes) == {
        "media_id": "bigint", "kind": "string", "media": "binary",
        "format": "string", "width": "int", "height": "int",
        "duration_ms": "int"}
    assert media.count() == 50


def test_feature_extraction_shape_and_determinism(spark, media):
    f1 = mm.extract_features(media, dim=16).orderBy("media_id").collect()
    f2 = mm.extract_features(media, dim=16).orderBy("media_id").collect()
    assert len(f1) == 50
    for a, b in zip(f1, f2):
        assert a["feat_dim"] == 16 and len(a["feature"]) == 16
        assert a["feature"] == b["feature"]  # deterministic
        assert all(-1.0 <= x < 1.0 for x in a["feature"])


def test_features_feed_similarity_ops(spark, media):
    """Feature vectors compose with the ANN cosine operator."""
    from pyspark.sql import functions as F
    feats = mm.extract_features(media, dim=8)
    q = feats.where("media_id = 0").collect()[0]["feature"]
    qlit = F.array(*[F.lit(float(x)) for x in q])
    v = F.transform("feature", lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(v, qlit, lambda x, y: x * y),
                      F.lit(0.0), lambda a, x: a + x)
    top = (feats.where("media_id <> 0")
           .select("media_id", dot.alias("dot"))
           .orderBy(F.desc("dot")).limit(3).collect())
    assert len(top) == 3


def test_frame_sampling(media):
    frames = mm.sample_frames(media, every_ms=1000, max_frames=4)
    rows = frames.orderBy("media_id", "frame_idx").collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == set(range(50))
    for mid, fr in by_media.items():
        assert 1 <= len(fr) <= 4
        assert [f["frame_idx"] for f in fr] == list(range(len(fr)))
        assert all(len(f["frame_sha256"]) == 64 for f in fr)


def test_resize_fake(media):
    out = mm.resize_images(media, width=8, height=8).collect()
    assert all(len(r["media"]) == 64 for r in out)


def test_real_decoder_gated(media):
    # gate fires driver-side, before any job launches
    with pytest.raises(NotImplementedError, match="Pillow"):
        mm.extract_features(media, dim=8, decoder="pil")
    with pytest.raises(ValueError):
        mm.extract_features(media, dim=8, decoder="nope")


def test_metadata_only_scan_prunes_media_column(spark, media, tmp_path):
    """Column pruning: a metadata query over the written table must not
    read the blob column (ReadSchema check)."""
    p = str(tmp_path / "media")
    media.write.parquet(p)
    df = spark.read.parquet(p).groupBy("kind").count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "media" not in plan.split("ReadSchema")[1][:200]
