"""Multimodal plumbing tests: schema contracts, batch shapes, determinism
of the fake codec, resize/frame-sample arithmetic."""

from __future__ import annotations

import numpy as np

from tests.conftest import spark  # noqa: F401 (fixture)


def test_image_features_deterministic_and_shaped(spark):  # noqa: F811
    from yelp_recommender_spark.multimodal import (
        extract_image_features,
        synthesize_media,
    )

    media = synthesize_media(spark, n=12, kind="image")
    feats = extract_image_features(media, n_bins=8).collect()
    assert len(feats) == 12
    by_id = {r.media_id: r.features for r in feats}
    assert all(len(v) == 3 + 8 for v in by_id.values())  # 3 means + 8 bins
    # histogram is a distribution; means are in [0,1]
    for v in by_id.values():
        assert abs(sum(v[3:]) - 1.0) < 1e-9
        assert all(0.0 <= x <= 1.0 for x in v[:3])
    # determinism: a second run yields identical values
    again = {r.media_id: r.features for r in extract_image_features(media).collect()}
    assert by_id == again


def test_q64_pipeline_finds_exactly_planted_duplicates(spark):  # noqa: F811
    """The decode → feature → center → near-dup composition must emit
    precisely the 8 planted byte-identical duplicate pairs at cosine 1.0
    — raw (uncentered) cosine would return all ~2.5k pairs because the
    fake codec's features concentrate near their mean."""
    from yelp_recommender_spark.queries.pipeline import q64_multimodal_neardup
    from tests.conftest import SF_DIR

    rows = q64_multimodal_neardup(spark, SF_DIR).collect()
    assert [(r.id1, r.id2, r.cos) for r in rows] == [
        (i, i + 1000, 1.0) for i in range(8)
    ]


def test_image_features_exact_values(spark):  # noqa: F811
    """Pin the documented binning semantics (ADVICE r3: the r3 bincount
    form is bin = v * n_bins // 256, each bin exactly 256/n_bins wide —
    an intentional change from np.histogram(range=(0,255))). An
    independent numpy recomputation must agree bit-for-bit."""
    from yelp_recommender_spark.multimodal import (
        _fake_decode_image,
        extract_image_features,
        synthesize_media,
    )

    media = synthesize_media(spark, n=4, kind="image")
    got = {
        r.media_id: r.features
        for r in extract_image_features(media, n_bins=8).collect()
    }
    for row in media.collect():
        img = _fake_decode_image(
            bytes(row.payload),
            row.meta.width,
            row.meta.height,
            row.meta.channels,
        )
        means = img.reshape(-1, img.shape[2]).mean(axis=0) / 255.0
        counts = np.zeros(8)
        for v in img.ravel():
            counts[int(v) * 8 // 256] += 1
        expect = np.concatenate([means, counts / counts.sum()])
        assert got[row.media_id] == expect.tolist()


def test_resize_images_contract(spark):  # noqa: F811
    from yelp_recommender_spark.multimodal import resize_images, synthesize_media

    media = synthesize_media(spark, n=6, kind="image")
    out = resize_images(media, out_w=8, out_h=4).collect()
    assert len(out) == 6
    for r in out:
        assert (r.meta.width, r.meta.height) == (8, 4)
        assert len(r.payload) == 8 * 4 * r.meta.channels


def test_frame_sampling_counts(spark):  # noqa: F811
    from yelp_recommender_spark.multimodal import sample_frames, synthesize_media

    media = synthesize_media(spark, n=5, kind="video")
    metas = {r.media_id: r.meta for r in media.collect()}
    frames = sample_frames(media, every_n=2).collect()
    by_id: dict[int, list] = {}
    for f in frames:
        by_id.setdefault(f.media_id, []).append(f)
    for mid, rows in by_id.items():
        nf = metas[mid].n_frames
        assert len(rows) == (nf + 1) // 2  # frames 0,2,4,...
        fb = metas[mid].width * metas[mid].height * metas[mid].channels
        assert all(len(r.payload) == fb for r in rows)
        assert sorted(r.frame_idx for r in rows) == list(range(0, nf, 2))


def test_audio_features(spark):  # noqa: F811
    from yelp_recommender_spark.multimodal import (
        extract_audio_features,
        synthesize_media,
    )

    media = synthesize_media(spark, n=4, kind="audio")
    rows = extract_audio_features(media).collect()
    assert len(rows) == 4
    for r in rows:
        assert 0.0 < r.rms < 1.0
        assert r.zero_crossings > 0
        assert r.duration_s == 1.0  # 16000 samples @ 16 kHz


def test_kind_filter_isolation(spark):  # noqa: F811
    from yelp_recommender_spark.multimodal import (
        extract_image_features,
        synthesize_media,
    )

    imgs = synthesize_media(spark, n=3, kind="image")
    auds = synthesize_media(spark, n=3, kind="audio")
    mixed = imgs.union(auds)
    assert extract_image_features(mixed).count() == 3


def test_fake_payload_determinism(spark):  # noqa: F811
    from yelp_recommender_spark.multimodal import _fake_decode_image, _payload_bytes

    p1, p2 = _payload_bytes(7, 256), _payload_bytes(7, 256)
    assert p1 == p2
    img = _fake_decode_image(p1, 8, 8, 4)
    assert img.shape == (8, 8, 4) and img.dtype == np.uint8
