"""CDC snapshot apply (operators/merge.py): latest-wins collapse,
update-then-delete, insert, delete-of-missing-key, and pass-through."""

from __future__ import annotations

from tests.conftest import spark  # noqa: F401 (fixture)


def _apply(spark, base_rows, change_rows):
    from yelp_recommender_spark.operators.merge import apply_cdc

    base = spark.createDataFrame(base_rows, "k long, v string, x double")
    changes = spark.createDataFrame(
        change_rows, "k long, op string, seq long, v string, x double"
    )
    return {
        r.k: (r.v, r.x) for r in apply_cdc(base, changes, ["k"]).collect()
    }


def test_apply_cdc_semantics(spark):  # noqa: F811
    got = _apply(
        spark,
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, "d", 4.0)],
        [
            # k=1: update then delete → gone
            (1, "U", 1, "a2", 1.5),
            (1, "D", 2, None, None),
            # k=2: delete then re-insert → latest wins, present
            (2, "D", 1, None, None),
            (2, "U", 2, "b2", 2.5),
            # k=5: insert (not in base)
            (5, "U", 1, "e", 5.0),
            # k=9: delete of a key not in base → no-op
            (9, "D", 1, None, None),
            # k=3: plain update
            (3, "U", 7, "c9", 3.9),
            # k=4: untouched → passes through
        ],
    )
    assert got == {
        2: ("b2", 2.5),
        3: ("c9", 3.9),
        4: ("d", 4.0),
        5: ("e", 5.0),
    }


def test_apply_cdc_latest_wins_across_many_versions(spark):  # noqa: F811
    got = _apply(
        spark,
        [(1, "a", 1.0)],
        [(1, "U", s, f"v{s}", float(s)) for s in range(1, 8)],
    )
    assert got == {1: ("v7", 7.0)}


def test_apply_cdc_empty_feed_is_identity(spark):  # noqa: F811
    got = _apply(spark, [(1, "a", 1.0), (2, "b", 2.0)], [])
    assert got == {1: ("a", 1.0), 2: ("b", 2.0)}
