"""Cache-hygiene registry: engine persists enroll themselves and one
clear_caches() call releases everything (VERDICT r3 #6 — persist()
without unpersist() accumulated session cache entries forever)."""

from __future__ import annotations

from tests.conftest import SF_DIR, spark  # noqa: F401 (fixture)


def test_clear_caches_releases_engine_persists(spark):  # noqa: F811
    from yelp_recommender_spark.cache import _REGISTRY, clear_caches
    from yelp_recommender_spark.queries.dedup import _doc_shingles
    from yelp_recommender_spark.queries.text import _docs_tokens

    clear_caches()  # start from a clean registry
    toks = _docs_tokens(spark, SF_DIR)
    sh = _doc_shingles(spark, SF_DIR)
    toks.count(), sh.count()  # materialize the caches
    assert toks.storageLevel.useMemory and sh.storageLevel.useMemory
    assert len(_REGISTRY) >= 2

    released = clear_caches()
    assert released >= 2
    assert not _REGISTRY
    assert not toks.storageLevel.useMemory
    assert not sh.storageLevel.useMemory


def test_clear_caches_idempotent_and_safe(spark):  # noqa: F811
    from yelp_recommender_spark.cache import clear_caches, register_persist

    assert clear_caches() == 0  # empty registry is a no-op
    df = register_persist(spark.range(5))
    df.count()
    assert clear_caches() == 1
    assert clear_caches() == 0
