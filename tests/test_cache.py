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


def test_cleanup_callbacks_run_on_full_clear_only(spark):  # noqa: F811
    from yelp_recommender_spark import cache

    calls = []
    cache.register_cleanup(lambda: calls.append(1))
    mark = cache.registry_mark()
    cache.clear_caches(since=mark)  # scoped clear: memos survive
    assert calls == []
    cache.clear_caches()  # pipeline boundary: cleanups fire
    assert calls == [1]


def test_probe_modulus_memoized_per_pipeline_run(spark):  # noqa: F811
    """The four recall dials share ONE exact count per pipeline run
    (code-review r6): the memo returns without a job on the second
    call, and clear_caches() at the boundary drops it."""
    from yelp_recommender_spark import cache
    from yelp_recommender_spark.queries import similarity as S
    from yelp_recommender_spark.sources.tables import load_tables

    cache.clear_caches()
    assert S._MODULUS_MEMO == {}
    emb = load_tables(spark, "/root/testdata/sf0.001", ["embeddings"])[
        "embeddings"
    ]
    m1 = S._memoized_modulus(emb, "/root/testdata/sf0.001", 5000)
    assert S._MODULUS_MEMO != {}

    class Boom:
        def count(self):
            raise AssertionError("second dial re-ran the count")

    m2 = S._memoized_modulus(Boom(), "/root/testdata/sf0.001", 5000)
    assert m1 == m2 == 10
    cache.clear_caches()
    assert S._MODULUS_MEMO == {}


def test_probes_and_truth_memoized_per_pipeline_run(spark):  # noqa: F811
    """The dials' shared (probes, truth) frames are memoized at OBJECT
    level (r10): CacheManager plan-dedupe cannot unify them because the
    exact-topk kernel captures a per-call Broadcast, so without the memo
    every dial rebuilt the ground-truth matmul. Second call returns the
    identical objects; the boundary clear drops the memo AND the cache."""
    from yelp_recommender_spark import cache
    from yelp_recommender_spark.queries import similarity as S

    cache.clear_caches()
    assert S._TRUTH_MEMO == {}
    p1, t1 = S._probes_and_truth(spark, "/root/testdata/sf0.001")
    p2, t2 = S._probes_and_truth(spark, "/root/testdata/sf0.001")
    assert p1 is p2 and t1 is t2
    t1.count()
    assert t1.storageLevel.useMemory
    cache.clear_caches()
    assert S._TRUTH_MEMO == {}
    assert not t1.storageLevel.useMemory


def test_register_cleanup_keyed_dedupe_and_unregister(spark):  # noqa: F811
    """ADVICE r6: per-call closures used to accumulate forever (the
    idempotence check only deduped stable function objects). Dedupe is
    now by explicit key — re-registering replaces — and
    unregister_cleanup removes an entry outright."""
    from yelp_recommender_spark import cache

    calls = []
    before = len(cache._CLEANUPS)
    for i in range(5):  # five fresh closures, one key → one entry
        cache.register_cleanup(lambda i=i: calls.append(i), key="t-keyed")
    assert len(cache._CLEANUPS) == before + 1
    cache.clear_caches()
    assert calls == [4]  # the LAST registration won
    assert cache.unregister_cleanup("t-keyed")
    assert not cache.unregister_cleanup("t-keyed")  # already gone
    calls.clear()
    cache.clear_caches()
    assert calls == []  # unregistered callbacks no longer fire
