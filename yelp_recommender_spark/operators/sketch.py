"""Mergeable sketch state — the non-distributive tail of incremental
aggregation.

``operators/incr_agg.py`` maintains COUNT/SUM (and anything derivable)
exactly in O(|delta|) per refresh, because those aggregates are
distributive. Distinct counts, item frequencies, heavy hitters, and
quantiles are NOT: maintaining them exactly means either rescanning the
fact table per batch or keeping per-key state proportional to the data.
At 100 TB the standard answer is mergeable summaries — bounded-size
state S with a merge operation such that ``S(A ∪ B) = merge(S(A),
S(B))``, so a standing summary is refreshed by summarizing ONLY the new
batch and merging, never by rescanning the accumulated facts.

Five summaries, each a plain DataFrame (persistable as parquet state,
mergeable by DataFrame algebra, zero Python anywhere):

- **HLL distinct count** (Apache DataSketches via Spark's built-in
  ``hll_sketch_agg`` / ``hll_union_agg``): per-key binary sketch,
  ~|2^lg_k| bytes each, relative error ≈ 1.04/√(2^lg_k). Register
  state is a MAX per slot, so the union SET SEMANTICS are exact and
  partitioning-independent; the reported NUMBER can differ slightly
  between a direct build and a merge because DataSketches serves a
  fresh sketch from its order-dependent HIP estimator but a unioned
  one from the composite estimator — both inside the published bound
  (the test pins both the bound and merge determinism). Max is
  irreversible: **insert-only** (a deletion requires recompute; pair
  with :func:`cms_state` — linear — when the feed is signed).
- **Count-min frequency table** (Cormen/Muthukrishnan): a (depth ×
  width) counter grid stored LONG-FORM as rows ``(d, pos, n)`` — the
  sketch IS a DataFrame, built by one hash-aggregation, merged by
  union + re-aggregate, probed map-side by ``depth`` broadcast joins +
  ``LEAST``. Point estimates are one-sided (≥ true count, ≤ true +
  ε·N with prob 1−δ, ε = e/width, δ = e^−depth). The sketch is
  LINEAR, so signed deltas (deletions, retractions) merge exactly.
- **KMV bottom-k distinct sample**: per key, the k distinct items with
  the smallest ``xxhash64`` values. Bottom-k of a union equals
  bottom-k of the concatenated bottom-k's, so the merge is exact; the
  k-th smallest normalized hash gives the classic (k−1)/u_k distinct
  estimate (rel. error ≈ 1/√k), and the state doubles as a uniform
  sample OVER DISTINCT ITEMS per key — something a row sample cannot
  give under skewed multiplicities. Insert-only (like HLL).
- **Log-binned histogram for quantiles**: per (key, bin) counts with
  bin = ⌊bpo·log2(v)⌋ for positives, a sign-mirrored band for
  negatives, and a zero sentinel between them — bin order IS value
  order over the full real line. Ranks are EXACT (the cdf is an exact
  count); only the reported value is discretized, with |value|
  relative error bounded by 2^(1/(2·bpo)) − 1 (≈ 2.2% at bpo=16) —
  the opposite trade from rank-error sketches (KLL/GK). Linear:
  signed deltas merge exactly.
- **Misra-Gries heavy hitters** (mergeable per Agarwal et al.
  PODS'12): at most k counters per key with guaranteed count
  intervals; every item heavier than a 1/(k+1) fraction is always
  present, merges add the error budgets and re-compress. The
  IDENTIFICATION counterpart to count-min's point queries (a CMS
  can't enumerate the heavy items without a candidate set).
  Insert-only.

No reference counterpart (the reference has no incremental anything —
see ``incr_agg.py``); this is a beyond-reference scale surface in the
same family as the bloom join (``operators/bloom.py``).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hll_state",
    "hll_merge",
    "hll_estimate",
    "cms_width_for_eps",
    "cms_depth_for_delta",
    "cms_state",
    "cms_merge",
    "cms_lookup",
    "cms_join_size",
    "kmv_state",
    "kmv_merge",
    "kmv_estimate",
    "kmv_jaccard",
    "hist_state",
    "hist_merge",
    "hist_quantiles",
    "mg_state",
    "mg_merge",
    "mg_rollup",
    "mg_heavy_hitters",
]


# --------------------------------------------------------------------
# HLL distinct count (insert-only; union is exact because registers max)
# --------------------------------------------------------------------


def hll_state(
    df: DataFrame, keys: list[str], cols: list[str], lg_k: int = 12
) -> DataFrame:
    """Per-key HLL sketch state: one binary ``hll_<c>`` column per
    requested column. State size per key per column is ~2^lg_k bytes;
    estimate relative error ≈ 1.04/√(2^lg_k) (≈1.6% at the default
    lg_k=12). The sketch binary embeds lg_k, so a mismatched merge
    fails loudly inside ``hll_union_agg`` rather than silently — no
    side-channel stamp needed (contrast :func:`cms_state`, whose plain
    counter rows carry their parameters as columns)."""
    return df.groupBy(*keys).agg(
        *[
            F.hll_sketch_agg(F.col(c), F.lit(int(lg_k))).alias(f"hll_{c}")
            for c in cols
        ]
    )


def hll_merge(
    state: DataFrame, delta: DataFrame, keys: list[str], cols: list[str]
) -> DataFrame:
    """Merged HLL state: union the two state tables and re-union
    sketches per key. Register state merges exactly (per-slot max), so
    the merged sketch represents precisely A ∪ B whatever the split or
    partitioning; the ESTIMATE read from it can differ from a direct
    ``hll_state(A ∪ B)`` build within the error bound, because a
    post-union sketch is served by the composite estimator instead of
    the insert-order HIP estimator (DataSketches semantics — pinned by
    test along with merge determinism).
    Output schema equals :func:`hll_state`'s, so merges compose: a
    standing distinct-count summary is refreshed per ingest batch by
    sketching ONLY the batch and merging — O(|batch| + |keys|), never
    a rescan of accumulated facts. Insert-only by construction."""
    both = state.unionByName(delta)
    return both.groupBy(*keys).agg(
        *[
            F.hll_union_agg(F.col(f"hll_{c}")).alias(f"hll_{c}")
            for c in cols
        ]
    )


def hll_estimate(state: DataFrame, cols: list[str]) -> DataFrame:
    """Readable view of an HLL state table: each sketch column replaced
    by its ``dv_<c>`` (distinct-value estimate, long)."""
    others = [
        c for c in state.columns if c not in {f"hll_{x}" for x in cols}
    ]
    return state.select(
        *others,
        *[
            F.hll_sketch_estimate(F.col(f"hll_{c}")).alias(f"dv_{c}")
            for c in cols
        ],
    )


# --------------------------------------------------------------------
# Count-min frequency sketch (linear: signed deltas merge exactly)
# --------------------------------------------------------------------


def cms_width_for_eps(eps: float) -> int:
    """Counter-grid width for an additive-error bound of ε·N (the
    textbook w = ⌈e/ε⌉)."""
    return int(math.ceil(math.e / eps))


def cms_depth_for_delta(delta: float) -> int:
    """Rows needed so the ε·N bound holds with probability 1−δ
    (d = ⌈ln(1/δ)⌉)."""
    return int(math.ceil(math.log(1.0 / delta)))


def _cms_pos(item: Column, d: int, width: int) -> Column:
    """Row d's counter position for an item: ``xxhash64(item, d)``
    folded into [0, width) — the same seeded-literal JVM hash family as
    the bloom filter, and the identical expression on build and probe
    sides is what makes the one-sided (never under-count) guarantee
    structural."""
    return F.pmod(F.xxhash64(item, F.lit(d)), F.lit(width))


def cms_state(
    df: DataFrame,
    item_col: str,
    depth: int = 5,
    width: int = 2048,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch of an item stream as a long-form counter table:
    rows ``(d, pos, n, depth, width)``, at most depth×width of them.
    ``weight_col`` (long; default +1 per row) makes the feed signed —
    the sketch is linear, so a −1-weighted deletion feed subtracts
    exactly (estimates stay one-sided as long as every TRUE count is
    non-negative at query time, the standard turnstile caveat).

    Scale: one explode(×depth) + one hash-aggregation; partial
    aggregation collapses each map task to ≤ depth×width rows before
    the single (tiny) shuffle. The full item stream is never collected
    or broadcast — only the fixed-size grid is."""
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    item = F.col(item_col)
    rows = df.where(item.isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_pos(item, d, width).alias("pos"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("cell"),
        w.alias("_w"),
    )
    return (
        rows.groupBy(F.col("cell.d").alias("d"), F.col("cell.pos").alias("pos"))
        .agg(F.sum("_w").alias("n"))
        .withColumn("depth", F.lit(int(depth)))
        .withColumn("width", F.lit(int(width)))
    )


def _cms_params(state: DataFrame) -> tuple[int, int]:
    """(depth, width) stamped on a CMS state table — the table is at
    most depth×width rows, so the head() is cheap (the bloom word
    table's validation pattern)."""
    head = state.select("depth", "width").head(1)
    if not head:
        return (0, 0)
    return (int(head[0][0]), int(head[0][1]))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merged CMS state: cell-wise sum. Exact (the sketch is linear),
    so ``cms_state(A ∪ B)`` and this merge are row-identical tables —
    pinned by test, not just estimate-close. Raises ``ValueError`` on
    mismatched (depth, width): summing differently-shaped grids would
    silently corrupt estimates."""
    pa, pb = _cms_params(a), _cms_params(b)
    if pa != (0, 0) and pb != (0, 0) and pa != pb:
        raise ValueError(
            f"count-min states have different shapes {pa} vs {pb} — "
            "merging them would silently corrupt estimates"
        )
    return (
        a.unionByName(b)
        .groupBy("d", "pos", "depth", "width")
        .agg(F.sum("n").alias("n"))
        .select("d", "pos", "n", "depth", "width")
        .filter(F.col("n") != 0)
    )


def cms_lookup(
    state: DataFrame, items: DataFrame, item_col: str
) -> DataFrame:
    """Point frequency estimates: ``items`` with an ``est_n`` column
    (min over the depth counters; ≥ true count always, ≤ true + ε·N
    with prob 1−δ). Plan shape: ``depth`` broadcast joins of the probe
    side against the ≤ depth×width-row counter table + a codegen'd
    ``LEAST`` — map-side only, the probed table is never shuffled
    (asserted by test). Absent cells count 0 via coalesce; a NULL item
    estimates NULL (``xxhash64`` skips NULL inputs, which would
    otherwise silently send every NULL to one arbitrary cell)."""
    depth, width = _cms_params(state)
    if depth == 0:
        return items.withColumn(
            "est_n",
            F.when(
                F.col(item_col).isNotNull(), F.lit(0).cast("long")
            ),
        )
    out = items
    ests = []
    for d in range(depth):
        row_d = F.broadcast(
            state.filter(F.col("d") == d).select(
                F.col("pos").alias(f"_cp{d}"), F.col("n").alias(f"_cn{d}")
            )
        )
        out = out.withColumn(f"_cq{d}", _cms_pos(F.col(item_col), d, width))
        out = out.join(row_d, F.col(f"_cq{d}") == F.col(f"_cp{d}"), "left")
        ests.append(F.coalesce(F.col(f"_cn{d}"), F.lit(0).cast("long")))
    est = F.least(*ests) if depth > 1 else ests[0]
    est = F.when(F.col(item_col).isNotNull(), est)
    drop = [f"_cq{d}" for d in range(depth)]
    drop += [f"_cp{d}" for d in range(depth)]
    drop += [f"_cn{d}" for d in range(depth)]
    return out.withColumn("est_n", est).drop(*drop)


# --------------------------------------------------------------------
# KMV bottom-k distinct sample + estimator (insert-only)
# --------------------------------------------------------------------

_HASH_SPAN = 2.0**64  # xxhash64 range: signed 64-bit


def kmv_state(
    df: DataFrame, keys: list[str], item_col: str, k: int = 256
) -> DataFrame:
    """Per-key bottom-k state: ``kmv`` = the ≤ k distinct items with the
    smallest ``xxhash64`` values, as a hash-sorted array of (h, item)
    structs, plus the ``kmv_k`` stamp. Build cost: one distinct + one
    per-key rank (sort-based window, spillable) that keeps only k rows
    per key before the collect — per-key state is bounded at k whatever
    the key's cardinality. Ties (astronomically rare 64-bit collisions
    between distinct items) break on the item value, keeping the state
    deterministic under any partitioning (pinned by test)."""
    item = F.col(item_col)
    pairs = (
        df.where(item.isNotNull())
        .select(*keys, item.alias("_item"))
        .distinct()
        .withColumn("_h", F.xxhash64(F.col("_item")))
    )
    return _bottomk_collect(pairs, keys, k)


def _bottomk_collect(
    pairs: DataFrame, keys: list[str], k: int
) -> DataFrame:
    """The bottom-k kernel shared by build and merge (ONE definition,
    so the tie-break and collation rules cannot silently diverge
    between the two paths the merge-equals-build test compares):
    distinct ``(keys, _h, _item)`` rows → per-key rank by (hash, item)
    → keep k → hash-sorted struct array + the k stamp."""
    w = Window.partitionBy(*keys).orderBy("_h", "_item")
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*keys)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("_h").alias("h"), F.col("_item").alias("item")
                    )
                )
            ).alias("kmv")
        )
        .withColumn("kmv_k", F.lit(int(k)))
    )


def _kmv_k(state: DataFrame) -> int:
    head = state.select("kmv_k").head(1)
    return int(head[0][0]) if head else 0


def kmv_merge(
    a: DataFrame, b: DataFrame, keys: list[str]
) -> DataFrame:
    """Merged bottom-k state: explode both sides, dedup, re-rank, keep
    k. Exact — bottom-k(A ∪ B) ⊆ bottom-k(A) ∪ bottom-k(B), so merging
    the two summaries reproduces ``kmv_state`` over the combined feed
    row-for-row (pinned by test). Raises on mismatched k (a merge at
    the smaller k would silently loosen the estimator)."""
    ka, kb = _kmv_k(a), _kmv_k(b)
    if ka and kb and ka != kb:
        raise ValueError(
            f"KMV states have different k ({ka} vs {kb}) — merging "
            "would silently change the estimator's accuracy"
        )
    k = ka or kb
    both = (
        a.unionByName(b)
        .select(*keys, F.explode("kmv").alias("e"))
        .select(
            *keys, F.col("e.h").alias("_h"), F.col("e.item").alias("_item")
        )
        .distinct()
    )
    return _bottomk_collect(both, keys, k)


def kmv_estimate(state: DataFrame) -> DataFrame:
    """Distinct-count estimates from a bottom-k state: exact |kmv| when
    the key saw fewer than k distinct items (the sample IS the distinct
    set), else the classic (k−1)/u_k with u_k the k-th smallest hash
    normalized to (0, 1] over the signed-64-bit range (rel. error
    ≈ 1/√k). Output: key columns + ``dv_est`` (double)."""
    size = F.size("kmv")
    k = F.col("kmv_k")
    u_k = (
        F.element_at("kmv", k).getField("h").cast("double")
        + F.lit(2.0**63)
        + F.lit(1.0)
    ) / F.lit(_HASH_SPAN)
    keys = [c for c in state.columns if c not in ("kmv", "kmv_k")]
    return state.select(
        *keys,
        F.when(size < k, size.cast("double"))
        .otherwise((k.cast("double") - 1.0) / u_k)
        .alias("dv_est"),
    )


# --------------------------------------------------------------------
# Log-binned histogram for quantiles (linear; exact ranks,
# value discretized with a bounded RELATIVE error)
# --------------------------------------------------------------------

# Bin layout over the FULL real line, monotone in the value so an
# ascending-bin scan is an ascending-value scan: −Inf below everything,
# negative values around _NEG_OFFSET (more negative value → smaller
# bin), the exact-zero sentinel strictly between every negative and
# every positive bin (log bins of double range span ±~17k around their
# anchor, far from every sentinel), positives at plain ⌊bpo·log2(v)⌋,
# +Inf above them, and NaN above +Inf — matching Spark's own ORDER BY,
# where NaN sorts greater than any value. Without the sentinels a NaN
# silently lands in the bin of ~1.0 (NaN comparisons are true against
# v > 0 in Spark) and ±Inf kills the job with CAST_OVERFLOW under ANSI.
_NEG_INF_BIN = -(2**31)
_NEG_OFFSET = -(2**30)
_ZERO_BIN = -(2**29)
_POS_INF_BIN = 2**30
_NAN_BIN = 2**30 + 1


def hist_state(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    bins_per_octave: int = 16,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-(key, bin) count state over ANY numeric column: positives
    bin at ⌊bpo·log2(v)⌋, negatives mirror onto ``_NEG_OFFSET − ⌊bpo·
    log2(−v)⌋`` (monotone: bin order IS value order), exact zeros get
    the sentinel bin between them, and ±Inf / NaN get sentinel bins in
    Spark's own sort order (−Inf below all, +Inf above all finite, NaN
    above +Inf) so dirty real-world doubles neither crash the job nor
    silently skew a quantile; NULLs are ignored, matching SQL
    aggregates. State per key is bounded by the value range: ~bpo bins
    per octave — both signs of the full double range at bpo=16 is ≤
    ~2k bins, whatever the row count. ``weight_col`` makes the feed
    signed (linear sketch: retractions subtract exactly;
    :func:`hist_merge` drops zeroed bins)."""
    v = F.col(value_col)
    wgt = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    bpo_l = F.lit(float(bins_per_octave))
    vd = v.cast("double")
    bin_idx = (
        F.when(F.isnan(vd), F.lit(_NAN_BIN))  # first: NaN compares true
        .when(vd == float("inf"), F.lit(_POS_INF_BIN))
        .when(vd == float("-inf"), F.lit(_NEG_INF_BIN))
        .when(vd == 0, F.lit(_ZERO_BIN))
        .when(vd > 0, F.floor(bpo_l * F.log2(vd)))
        .otherwise(F.lit(_NEG_OFFSET) - F.floor(bpo_l * F.log2(-vd)))
    )
    return (
        df.where(v.isNotNull())
        .groupBy(*keys, bin_idx.cast("int").alias("bin"))
        .agg(F.sum(wgt).alias("n"))
        .withColumn("hist_bpo", F.lit(int(bins_per_octave)))
    )


def _hist_bpo(state: DataFrame) -> int:
    head = state.select("hist_bpo").head(1)
    return int(head[0][0]) if head else 0


def hist_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merged histogram state: per-(key, bin) sum, zeroed bins dropped.
    Exact (linear), so a standing quantile summary refreshes per batch
    — including signed retraction feeds — without rescanning facts.
    Raises on mismatched bins_per_octave (bin indexes would collide
    across different discretizations)."""
    ba, bb = _hist_bpo(a), _hist_bpo(b)
    if ba and bb and ba != bb:
        raise ValueError(
            f"histogram states have different bins_per_octave ({ba} vs "
            f"{bb}) — their bin indexes are not comparable"
        )
    keys = [c for c in a.columns if c not in ("bin", "n", "hist_bpo")]
    return (
        a.unionByName(b)
        .groupBy(*keys, "bin", "hist_bpo")
        .agg(F.sum("n").alias("n"))
        .filter(F.col("n") != 0)
        .select(*keys, "bin", "n", "hist_bpo")
    )


def hist_quantiles(
    state: DataFrame, qs: list[float]
) -> DataFrame:
    """Quantile estimates per key: for each q, the (sign-aware)
    geometric midpoint of the first bin whose exact cumulative count
    reaches q·total (zero-bin → 0.0; bin order is value order across
    negatives, zero, and positives). Ranks are exact — the error is
    ONLY the value discretization, bounded by a 2^(1/(2·bpo)) relative
    factor on |value| (≈2.2% at bpo=16). Output: key columns + one
    ``q_<q>`` double per requested quantile (dots become underscores:
    q=0.5 → ``q_0_5``).

    Plan: one per-key ordered window (cumulative sum over ≤ ~1k bins
    per key) + one hash-aggregation — never a sort of the raw data."""
    bpo = _hist_bpo(state)
    keys = [c for c in state.columns if c not in ("bin", "n", "hist_bpo")]
    w_tot = Window.partitionBy(*keys)
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        state.withColumn("_total", F.sum("n").over(w_tot))
        .withColumn("_cum", F.sum("n").over(w_cum))
    )
    rep = (
        F.when(F.col("bin") == _NAN_BIN, F.lit(float("nan")))
        .when(F.col("bin") == _POS_INF_BIN, F.lit(float("inf")))
        .when(F.col("bin") == _NEG_INF_BIN, F.lit(float("-inf")))
        .when(F.col("bin") == _ZERO_BIN, F.lit(0.0))
        .when(
            F.col("bin") > _ZERO_BIN,
            F.pow(
                F.lit(2.0),
                (F.col("bin").cast("double") + 0.5) / F.lit(float(bpo)),
            ),
        )
        .otherwise(
            -F.pow(
                F.lit(2.0),
                (
                    (F.lit(float(_NEG_OFFSET)) - F.col("bin").cast("double"))
                    + 0.5
                )
                / F.lit(float(bpo)),
            )
        )
    )
    aggs = []
    for q in qs:
        name = f"q_{q}".replace(".", "_")
        aggs.append(
            F.min(
                F.when(
                    F.col("_cum")
                    >= F.lit(float(q)) * F.col("_total").cast("double"),
                    rep,
                )
            ).alias(name)
        )
    return cum.groupBy(*keys).agg(*aggs)


# --------------------------------------------------------------------
# Misra-Gries heavy hitters (mergeable summaries, Agarwal et al.
# PODS'12; insert-only like HLL/KMV)
# --------------------------------------------------------------------


def mg_state(
    df: DataFrame,
    keys: list[str],
    item_col: str,
    k: int = 64,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-key Misra-Gries summary: at most ``k`` surviving items with
    lower-bound counts, plus one per-key sentinel row (``item`` NULL)
    so a key whose items ALL fell below the decrement never loses its
    error-budget bookkeeping. Columns: ``item``, ``n_lo`` (guaranteed
    lower bound), ``mg_n`` (exact total weight — distributive, rides
    along), ``mg_delta`` (max undercount), ``mg_k``.

    Guarantees (per key): ``n_lo ≤ true ≤ n_lo + mg_delta`` for every
    summarized item, ``true ≤ mg_delta`` for every absent one, and
    ``mg_delta ≤ mg_n/(k+1)`` — so any item heavier than a 1/(k+1)
    fraction is ALWAYS present (the classic frequent-elements bound;
    merging preserves all three, the PODS'12 mergeability result).

    Build: exact batch counts (one hash-agg — partial aggregation
    bounds map output at the batch's distinct items), then the
    compress step: subtract the (k+1)-th largest count from all and
    drop non-positives. Deterministic under any partitioning (count
    ties break on the item). Insert-only: a negative weight fails the
    job loudly (it would silently break every bound)."""
    item = F.col(item_col)
    wgt = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    wgt = F.when(
        wgt < 0,
        F.raise_error(
            F.lit("mg_state: negative weight — Misra-Gries is insert-only")
        ),
    ).otherwise(wgt)
    counts = (
        df.where(item.isNotNull())
        .groupBy(*keys, item.alias("_item"))
        .agg(F.sum(wgt).alias("_c"))
    )
    ranked = _mg_compress(counts, keys, k, "_item").withColumn(
        "_n", F.sum("_c").over(Window.partitionBy(*keys))
    )
    # survivors and the per-key sentinel in ONE pass over `ranked`
    # (each row emits its survivor struct if it qualifies, and the
    # rank-1 row additionally emits the sentinel — every key with any
    # item has a rank-1 row): a survivors-UNION-sentinel formulation
    # would reference `ranked` twice, recomputing the full exact-count
    # aggregation once per reference on unpersisted lineage — measured
    # at ~2× the whole mg_state cost, compounding in detect_skew
    item_t = counts.schema["_item"].dataType
    surv = F.when(
        (F.col("_rn") <= k) & (F.col("_c") > F.col("_d")),
        F.struct(
            F.col("_item").alias("item"),
            (F.col("_c") - F.col("_d")).alias("n_lo"),
        ),
    )
    sent = F.when(
        F.col("_rn") == 1,
        F.struct(
            F.lit(None).cast(item_t).alias("item"),
            F.lit(0).cast("long").alias("n_lo"),
        ),
    )
    return (
        ranked.select(
            *keys,
            F.col("_n").alias("mg_n"),
            F.col("_d").alias("mg_delta"),
            F.explode(
                F.filter(F.array(surv, sent), lambda s: s.isNotNull())
            ).alias("_e"),
        )
        .select(
            *keys,
            F.col("_e.item").alias("item"),
            F.col("_e.n_lo").alias("n_lo"),
            "mg_n",
            "mg_delta",
        )
        .withColumn("mg_k", F.lit(int(k)))
    )


def _mg_compress(
    counts: DataFrame, keys: list[str], k: int, item_col: str
) -> DataFrame:
    """The Misra-Gries compress kernel shared by build and merge (ONE
    definition, so the rank tie-break and decrement rule cannot
    silently diverge between the two paths the merge-preserves-bounds
    tests compare): per-key rank by (count desc, item), ``_d`` = the
    (k+1)-th largest count (0 when ≤ k items). Callers keep rows with
    ``_rn <= k`` and ``_c > _d`` and subtract."""
    w_rank = Window.partitionBy(*keys).orderBy(
        F.col("_c").desc(), F.col(item_col)
    )
    w_all = Window.partitionBy(*keys)
    return counts.withColumn(
        "_rn", F.row_number().over(w_rank)
    ).withColumn(
        "_d",
        F.coalesce(
            F.max(F.when(F.col("_rn") == k + 1, F.col("_c"))).over(w_all),
            F.lit(0).cast("long"),
        ),
    )


def _mg_k(state: DataFrame) -> int:
    head = state.select("mg_k").head(1)
    return int(head[0][0]) if head else 0


def mg_merge(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Merged Misra-Gries state: sum the lower-bound counts item-wise,
    re-compress to k (subtract the (k+1)-th largest, drop
    non-positives), and add up the error budgets — new ``mg_delta`` =
    δ_a + δ_b + the new decrement, which the PODS'12 analysis keeps
    ≤ (n_a+n_b)/(k+1). Output schema equals :func:`mg_state`'s, so a
    standing heavy-hitter summary refreshes per batch in
    O(|batch| + k·|keys|). Raises on mismatched k."""
    ka, kb = _mg_k(a), _mg_k(b)
    if ka and kb and ka != kb:
        raise ValueError(
            f"Misra-Gries states have different k ({ka} vs {kb}) — "
            "their error budgets are not comparable"
        )
    # a two-way merge IS a rollup: tag each input as one value of an
    # extra key column and roll that column away — ONE copy of the
    # subtle budget/compress/sentinel machinery instead of two that
    # must be kept in sync
    cols = [*keys, "item", "n_lo", "mg_n", "mg_delta", "mg_k"]
    tagged = a.select(*cols, F.lit(0).alias("_side")).unionByName(
        b.select(*cols, F.lit(1).alias("_side"))
    )
    return mg_rollup(tagged, list(keys))


def mg_heavy_hitters(
    state: DataFrame, min_frac: float | None = None
) -> DataFrame:
    """Readable view of a Misra-Gries state: the summarized items with
    their guaranteed count interval [``n_lo``, ``n_hi``] (sentinel rows
    dropped). With ``min_frac``, only items whose lower bound clears
    ``min_frac · mg_n`` — every TRUE heavy hitter above
    ``min_frac + 1/(k+1)`` is guaranteed present and reported."""
    keys = [
        c
        for c in state.columns
        if c not in ("item", "n_lo", "mg_n", "mg_delta", "mg_k")
    ]
    out = state.where(F.col("item").isNotNull()).select(
        *keys,
        "item",
        "n_lo",
        (F.col("n_lo") + F.col("mg_delta")).alias("n_hi"),
        "mg_n",
    )
    if min_frac is not None:
        out = out.filter(
            F.col("n_lo")
            >= F.lit(float(min_frac)) * F.col("mg_n").cast("double")
        )
    return out


def kmv_jaccard(
    a: DataFrame, b: DataFrame, keys: list[str]
) -> DataFrame:
    """Per-key Jaccard / intersection estimates between two KMV states
    — the set-operation queries an HLL cannot serve (register maxima
    destroy membership; bottom-k samples keep it). For each key present
    in BOTH states: take the bottom-k of the union of the two samples
    (a valid KMV sample of A ∪ B by the merge property), estimate
    J = |union-sample members seen in both sides' samples| / |union
    sample| (the classic bottom-k Jaccard estimator, ±≈1/√k), the
    union size from the union sample's k-th hash, and the intersection
    as J · |A ∪ B|. Exact whenever both keys held fewer than k distinct
    items (the samples ARE the sets). Pure array algebra on the joined
    states — no explode, no shuffle beyond the key join.

    Output: key columns + ``jaccard_est``, ``union_est``,
    ``intersection_est`` (doubles). Raises on mismatched k."""
    ka, kb = _kmv_k(a), _kmv_k(b)
    if ka and kb and ka != kb:
        raise ValueError(
            f"KMV states have different k ({ka} vs {kb}) — their "
            "samples are not comparable"
        )
    k = ka or kb
    joined = a.select(
        *keys, F.col("kmv").alias("_ka")
    ).join(b.select(*keys, F.col("kmv").alias("_kb")), list(keys))
    u = F.slice(
        F.array_sort(F.array_union("_ka", "_kb")), 1, k
    )
    both = F.array_intersect("_ka", "_kb")
    inter_in_u = F.size(F.array_intersect(u, both))
    j = inter_in_u.cast("double") / F.size(u).cast("double")
    u_size = F.size(u)
    u_k_hash = (
        F.element_at(u, u_size).getField("h").cast("double")
        + F.lit(2.0**63)
        + F.lit(1.0)
    ) / F.lit(_HASH_SPAN)
    union_est = F.when(
        u_size < k, u_size.cast("double")
    ).otherwise((F.lit(float(k)) - 1.0) / u_k_hash)
    return joined.select(
        *keys,
        j.alias("jaccard_est"),
        union_est.alias("union_est"),
        (j * union_est).alias("intersection_est"),
    )


def mg_rollup(state: DataFrame, keys_out: list[str]) -> DataFrame:
    """Coarsen a Misra-Gries state to fewer key columns — the s-way
    merge: every group of dropped-key values sharing a ``keys_out``
    prefix folds into one summary (sum the lower bounds item-wise,
    re-compress, add the error budgets; MG merging is associative, so
    the PODS'12 δ ≤ n/(k+1) bound survives any merge tree). This is
    what makes a SCALABLE global heavy-hitter pass possible: partial
    summaries per hash bucket (parallel rank windows over bounded
    groups), then one rollup over the ≤ buckets·(k+1) surviving rows —
    never a global rank over all distinct items."""
    k = _mg_k(state)
    keys_in = [
        c
        for c in state.columns
        if c not in ("item", "n_lo", "mg_n", "mg_delta", "mg_k")
    ]
    dropped = [c for c in keys_in if c not in keys_out]
    if not dropped:
        return state
    # one (mg_n, mg_delta) per dropped-key group: max within the group
    # (it rides every row incl. the sentinel), summed across groups
    meta = (
        state.groupBy(*keys_out, *dropped)
        .agg(F.max("mg_n").alias("_n"), F.max("mg_delta").alias("_d"))
        .groupBy(*keys_out)
        .agg(F.sum("_n").alias("mg_n"), F.sum("_d").alias("_d_in"))
        # empty input + empty keys_out: the global agg yields one
        # all-NULL row — dropping it keeps empty-in → empty-out (a
        # NULL-total sentinel would violate the state invariant)
        .filter(F.col("mg_n").isNotNull())
    )
    summed = (
        state.where(F.col("item").isNotNull())
        .groupBy(*keys_out, "item")
        .agg(F.sum("n_lo").alias("_c"))
    )
    ranked = _mg_compress(summed, keys_out, k, "item").withColumnRenamed(
        "_d", "_d_new"
    )
    kept = ranked.filter(
        (F.col("_rn") <= k) & (F.col("_c") > F.col("_d_new"))
    ).select(
        *keys_out,
        "item",
        (F.col("_c") - F.col("_d_new")).alias("n_lo"),
        "_d_new",
    )
    if keys_out:
        d_new_per_key = ranked.groupBy(*keys_out).agg(
            F.max("_d_new").alias("_d_new")
        )
        kept = kept.join(meta, list(keys_out))
        sentinel_join = meta.join(d_new_per_key, list(keys_out), "left")
    else:  # global rollup: meta and d_new are 1-row scalar folds
        # agg (not groupBy().agg): an all-sentinel state has zero
        # ranked rows, and the sentinel's budget must still roll up
        d_new_per_key = ranked.agg(F.max("_d_new").alias("_d_new"))
        kept = kept.crossJoin(F.broadcast(meta))
        sentinel_join = meta.crossJoin(F.broadcast(d_new_per_key))
    survivors = kept.select(
        *keys_out,
        "item",
        "n_lo",
        "mg_n",
        (F.col("_d_in") + F.col("_d_new")).alias("mg_delta"),
    )
    item_type = state.schema["item"].dataType
    sentinel = sentinel_join.select(
        *keys_out,
        F.lit(None).cast(item_type).alias("item"),
        F.lit(0).cast("long").alias("n_lo"),
        "mg_n",
        (
            F.col("_d_in")
            + F.coalesce(F.col("_d_new"), F.lit(0).cast("long"))
        ).alias("mg_delta"),
    )
    return survivors.unionByName(sentinel).withColumn(
        "mg_k", F.lit(int(k))
    )


def cms_join_size(a: DataFrame, b: DataFrame) -> DataFrame:
    """Equi-join output-size estimate from two count-min states over
    the join keys: |A ⋈ B| = Σ_v f_A(v)·f_B(v), estimated per depth
    row as the cell-wise inner product and taken as the MIN over
    depths (Cormode & Muthukrishnan's classic join-size estimator).
    One-sided like the point queries — never an underestimate, within
    ε·N_A·N_B (ε = e/width) with prob 1−δ of the truth.

    Why it matters at 100 TB: the decision "broadcast vs shuffle vs
    pre-aggregate" and the detection of a join about to EXPLODE
    (many-to-many hot keys multiplying) both want the output
    cardinality BEFORE paying for the join; two bounded grids built in
    one scan each answer it in milliseconds. Cost: joining two ≤
    depth×width tables — driver-free, broadcastable.

    Returns a 1-row DataFrame ``(est_join_rows double)`` — double, not
    long: at the scales this guards, one whale cell's product can pass
    2^63 (1e10 × 1e10), where a long inner product would overflow the
    very estimate that exists to catch the explosion; double keeps the
    magnitude (the decision signal) at any scale. Raises on mismatched
    (depth, width) — inner products across different grids are
    meaningless."""
    pa, pb = _cms_params(a), _cms_params(b)
    if pa != (0, 0) and pb != (0, 0) and pa != pb:
        raise ValueError(
            f"count-min states have different shapes {pa} vs {pb} — "
            "their inner product is meaningless"
        )
    depth = pa[0] or pb[0]
    prod = a.select("d", "pos", F.col("n").alias("_na")).join(
        b.select("d", "pos", F.col("n").alias("_nb")),
        ["d", "pos"],
    )
    per_depth = prod.groupBy("d").agg(
        F.sum(
            F.col("_na").cast("double") * F.col("_nb").cast("double")
        ).alias("_ip")
    )
    # a depth whose occupied cells never collide contributes NO row to
    # per_depth — but its true inner product is 0, exactly the minimum
    # that proves the join is small; the depth spine restores it (and
    # keeps the 1−e^−depth confidence at the full depth)
    spine = a.sparkSession.range(max(depth, 1)).select(
        F.col("id").cast("int").alias("d")
    )
    filled = spine.join(per_depth, "d", "left").select(
        F.coalesce("_ip", F.lit(0.0)).alias("_ip")
    )
    return filled.agg(F.min("_ip").alias("est_join_rows"))
