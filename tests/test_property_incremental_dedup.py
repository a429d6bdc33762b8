"""Property-based pins for the incremental embedding-dedup contract
(hypothesis): for ANY random corpus/batch vector split and threshold —

- the rejection set equals a plain-numpy replay of the precedence rule
  (corpus docs + smaller-id batch docs qualify; best partner = max
  ROUNDED cosine, ties → min id; threshold on the UNROUNDED cosine);
- no batch doc is ever rejected against a LARGER-id batch doc
  (keep-first is never violated);
- corpus docs are never rejected (the output is batch-only);
- the empty corpus degenerates to the pure within-batch rule.

Random geometry matters: the unit fixture uses planted clusters, so
ties, negative cosines, zero vectors, and boundary thresholds fall to
hypothesis — the same layer that caught the bounded kernel's
rounded-threshold divergence in r6.
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from tests.conftest import spark  # noqa: F401 (fixture)
from tests.test_property_bounded_pairs import _off_boundary

vec_st = st.lists(
    st.lists(
        st.sampled_from([-1.0, -0.5, 0.0, 0.5, 1.0]),
        min_size=4, max_size=4,
    ),
    min_size=0, max_size=6,
)


def _brute_incremental(corpus_vecs, batch_vecs, tau):
    """Plain-numpy replay: corpus ids 0..C-1, batch ids 100..100+B-1
    (disjoint, batch order = id order)."""
    ids = list(range(len(corpus_vecs))) + [
        100 + i for i in range(len(batch_vecs))
    ]
    mat = np.array(corpus_vecs + batch_vecs, dtype=np.float64)
    if mat.size == 0:
        return {}
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    unit = mat / norms
    raw = unit @ unit.T
    corp = np.array([i < len(corpus_vecs) for i in range(len(ids))])
    out = {}
    for bi in range(len(batch_vecs)):
        row = len(corpus_vecs) + bi
        bid = ids[row]
        cand = [
            (float(np.round(raw[row, j], 6)), ids[j])
            for j in range(len(ids))
            if ids[j] != bid
            and raw[row, j] >= tau
            and (corp[j] or ids[j] < bid)
        ]
        if not cand:
            continue
        cand.sort(key=lambda t: (-t[0], t[1]))
        out[bid] = (cand[0][1], cand[0][0])
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    corpus_vecs=vec_st,
    batch_vecs=st.lists(
        st.lists(
            st.sampled_from([-1.0, -0.5, 0.0, 0.5, 1.0]),
            min_size=4, max_size=4,
        ),
        min_size=1, max_size=6,
    ),
    tau=st.sampled_from([-0.5, 0.0, 0.4, 0.9]),
)
def test_incremental_dedup_properties(spark, corpus_vecs, batch_vecs, tau):  # noqa: F811
    from yelp_recommender_spark.operators.ann import (
        embedding_incremental_dedup,
    )

    # the <1-ulp threshold band is shape-dependent and declared
    # unspecified (see test_property_bounded_pairs.BOUNDARY_EPS)
    assume(_off_boundary(corpus_vecs + batch_vecs, tau))

    schema = "vec_id long, embedding array<double>"
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(corpus_vecs)],
        schema,
    )
    batch = spark.createDataFrame(
        [(100 + i, [float(x) for x in v]) for i, v in enumerate(batch_vecs)],
        schema,
    )
    got = {
        r.doc_id: (r.dup_of, r.cos)
        for r in embedding_incremental_dedup(
            batch, corpus, threshold=tau
        ).collect()
    }
    want = _brute_incremental(corpus_vecs, batch_vecs, tau)
    assert got == want

    # structural invariants, independent of the brute replay
    batch_ids = {100 + i for i in range(len(batch_vecs))}
    for doc_id, (dup_of, _) in got.items():
        assert doc_id in batch_ids  # corpus docs are never rejected
        if dup_of in batch_ids:
            assert dup_of < doc_id  # keep-first precedence holds
