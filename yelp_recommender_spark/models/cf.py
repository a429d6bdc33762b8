"""Collaborative filtering — co-rating weights, LSH candidates, top-N
neighborhoods, weighted scorers (SURVEY.md §2 J1/J4/J5, A6/A9/A10, W2,
F8-F10; reference: ``/root/reference/models/item_cf_model.py`` and
``/root/reference/scripts/train_user_cf.py`` / ``predict_user_cf.py``).

One generic engine: weights are computed between *entities* that share
*contexts* —

- item-based CF: entity = business_id, context = user_id
- user-based CF: entity = user_id,     context = business_id

The reference materializes per-entity sparse vectors and loops over pairs
in Python (cartesian at ``item_cf_model.py:78``, collected dicts at
``train_user_cf.py:277``); here pair generation is a self-equi-join on the
context key — the relational form of "co-rated": work ∝ Σ ratings²(context)
distributed over contexts, optionally LSH-pruned first, never a cartesian
and never driver state.

Determinism: weights are rounded to 6 digits at the operator boundary;
weighted sums use exact decimal accumulators; zero-variance Pearson is 0.0
(reference ``utils/metrics.py:92-93``) via ``nanvl``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from yelp_recommender_spark.functions.exact_agg import davg
from yelp_recommender_spark.functions.rules import DEFAULT_STARS
from yelp_recommender_spark.operators.topk import top_n_per_key


def dedup_ratings(ratings: DataFrame, entity: str, context: str) -> DataFrame:
    """One rating per (entity, context): mean stars.

    The reference's vector build silently keeps the last duplicate
    (dict overwrite, ``item_cf_model.py:116-124``) — collection-order
    dependent, not reproducible; the mean is the documented divergence
    (SURVEY §7 risk register)."""
    return ratings.groupBy(entity, context).agg(davg("stars").alias("stars"))


def corated_weights(
    ratings: DataFrame,
    entity: str = "business_id",
    context: str = "user_id",
    min_corated: int = 2,
    cap_per_context: int | None = None,
    *,
    plan_guard: str | None = None,
    decision_out: dict | None = None,
    explosion_factor: float = 4.0,
) -> DataFrame:
    """Pairwise similarity weights over co-rating contexts.

    Output: (e1, e2, n_common, pearson, cosine, jaccard) for e1 < e2 with
    ≥ ``min_corated`` shared contexts (P4). Semantics:

    - pearson over the co-rated sub-vectors, following the user-CF form
      (``utils/metrics.py:72-94``), zero-variance → 0.0. Documented
      divergence: the reference's *item*-CF runs scipy ``pearsonr`` over
      full dense vectors including zeros for non-raters
      (``item_cf_model.py:154-157``), so item-CF weights differ
      numerically from that model — the co-rated form is the standard
      CF similarity and is used here for both orientations;
    - cosine over the FULL sparse vectors (sklearn on scipy matrices,
      ``item_cf_model.py:158-161``): dot ranges over common contexts
      (zeros elsewhere), norms over each entity's full vector;
    - jaccard over rater sets (``utils/metrics.py:48-53``).

    Scale: the self-join key is the context; a power-law context (a user
    who rated everything) contributes |ratings|² pairs — cap it with
    ``cap_per_context`` (keep the context's top-rated entities,
    deterministic tie-break), the standard mitigation the reference
    approximates with its min-rating filters (``train_user_cf.py:266-269``).

    ``plan_guard`` consults the sketch-backed planner
    (:func:`~yelp_recommender_spark.operators.joinplan.self_join_size`,
    ONE extra scan of the deduped ratings, bounded grid state) on the
    join AS IT WILL RUN (after any ``cap_per_context`` pruning) so a
    pathological corpus gets the explosion warning BEFORE the shuffle:
    ``"warn"`` emits a ``UserWarning`` with the evidence, ``"raise"``
    refuses with a ``ValueError`` naming ``cap_per_context`` as the
    remedy. ``decision_out`` (caller dict, updated in place) records
    the verdict either way — passing it alone enables record-only
    planning. Default (both None/off): zero planner cost, byte-identical
    behavior to r9."""
    from yelp_recommender_spark.cache import register_persist

    r = dedup_ratings(ratings, entity, context)
    if cap_per_context:
        r = top_n_per_key(
            r, [context], "stars", cap_per_context, tiebreak=entity
        )
    # Pin the deduped ratings through the session cache registry: the
    # lineage below references r FOUR times (self-join sides a/b + the
    # two per-entity stats sides), and each reference is a full
    # re-aggregation when r arrives as raw lineage — the r10 plan audit
    # showed the (entity, context) hash-aggregate (2 exchanges) planned
    # 4× per corated_weights call. One materialization feeds all four
    # (released by clear_caches() at the pipeline boundary, the
    # derive_ratings convention).
    r = register_persist(r)
    if plan_guard is not None or decision_out is not None:
        import warnings

        from yelp_recommender_spark.operators.joinplan import self_join_size

        verdict = self_join_size(
            r, context, explosion_factor=explosion_factor
        )
        verdict["cap_per_context"] = cap_per_context
        if decision_out is not None:
            decision_out.update(verdict)
        if verdict["explosion"] and plan_guard is not None:
            msg = (
                f"co-rating self-join on {context!r} is a multiplier: "
                f"~{verdict['est_pairs']:.0f} pairs from "
                f"{verdict['n_rows']} ratings (heaviest context ≤ "
                f"{verdict['max_key_frac']:.2%} of rows) — set "
                "cap_per_context (or LSH-prefilter with "
                "lsh_candidate_pairs) to bound the shuffle"
            )
            if plan_guard == "raise":
                raise ValueError(msg)
            warnings.warn(msg, stacklevel=2)

    # per-entity stats over the full vector (for cosine norms / jaccard
    # sizes); the squared-star sum uses the exact decimal accumulator so
    # norms are partition-order independent. Pinned like r: the s1/s2
    # aliases below are two lineage references, and without the pin the
    # stats aggregate (exchange + hash-agg over r) plans twice.
    stats = register_persist(
        r.groupBy(entity).agg(
            F.count(F.lit(1)).alias("n"),
            F.sqrt(
                F.sum(
                    (F.col("stars") * F.col("stars")).cast("decimal(27,12)")
                ).cast("double")
            ).alias("norm"),
        )
    )

    a = r.select(
        F.col(context).alias("_ctx"),
        F.col(entity).alias("e1"),
        F.col("stars").alias("s1"),
    )
    b = r.select(
        F.col(context).alias("_ctx"),
        F.col(entity).alias("e2"),
        F.col("stars").alias("s2"),
    )
    pairs = a.join(b, ["_ctx"]).filter(F.col("e1") < F.col("e2"))

    # Pearson from exact decimal power sums instead of F.corr: (a) ANSI
    # mode makes corr throw DIVIDE_BY_ZERO on zero-variance pairs, where
    # the reference defines 0.0 (utils/metrics.py:92-93); (b) the scalar
    # formula over order-independent sums is bit-identical across engines
    # and partitionings — corr's streaming update is not.
    dec = lambda c: F.sum(c.cast("decimal(27,12)")).cast("double")  # noqa: E731
    agg = pairs.groupBy("e1", "e2").agg(
        F.count(F.lit(1)).alias("n_common"),
        dec(F.col("s1")).alias("_sx"),
        dec(F.col("s2")).alias("_sy"),
        dec(F.col("s1") * F.col("s2")).alias("_dot"),
        dec(F.col("s1") * F.col("s1")).alias("_sxx"),
        dec(F.col("s2") * F.col("s2")).alias("_syy"),
    )
    n = F.col("n_common").cast("double")
    vx = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vy = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    pearson = F.when((vx <= 0) | (vy <= 0), F.lit(0.0)).otherwise(
        (n * F.col("_dot") - F.col("_sx") * F.col("_sy")) / F.sqrt(vx * vy)
    )
    agg = agg.withColumn("_pearson", pearson)
    s1 = stats.select(
        F.col(entity).alias("e1"), F.col("n").alias("n1"), F.col("norm").alias("norm1")
    )
    s2 = stats.select(
        F.col(entity).alias("e2"), F.col("n").alias("n2"), F.col("norm").alias("norm2")
    )
    return (
        agg.filter(F.col("n_common") >= min_corated)
        .join(s1, "e1")
        .join(s2, "e2")
        .select(
            "e1",
            "e2",
            "n_common",
            F.round("_pearson", 6).alias("pearson"),
            F.round(
                F.when(
                    (F.col("norm1") == 0) | (F.col("norm2") == 0), F.lit(0.0)
                ).otherwise(F.col("_dot") / (F.col("norm1") * F.col("norm2"))),
                6,
            ).alias("cosine"),
            F.round(
                F.col("n_common")
                / (F.col("n1") + F.col("n2") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


def combined_weight() -> F.Column:
    """A12: the reference's combined similarity —
    (pearson + cosine + jaccard) / 3 (``item_cf_model.py:178-180``) —
    over :func:`corated_weights` output columns, rounded to 6 like each
    constituent metric."""
    return F.round(
        (F.col("pearson") + F.col("cosine") + F.col("jaccard")) / 3, 6
    )


def symmetrize(weights: DataFrame, weight_col: str) -> DataFrame:
    """Undirected (e1,e2,w) → both directions (J7,
    ``predict_user_cf.py:175-185``). ``weight_col="mean"`` selects the
    A12 combined metric (:func:`combined_weight`).

    One pass, not fwd-UNION-rev: the union form references ``weights``
    twice, and when it arrives as unpersisted lineage (the co-rating
    self-join + exact-decimal Pearson — the expensive part of CF) the
    whole weight computation would run once per direction (the r9
    scan-audit pattern: differently-projected branches of one subtree
    defeat exchange reuse). Each edge emits both directions from one
    read instead."""
    w = combined_weight() if weight_col == "mean" else F.col(weight_col)
    return weights.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("e1").alias("e1"),
                    F.col("e2").alias("e2"),
                    w.alias("w"),
                ),
                F.struct(
                    F.col("e2").alias("e1"),
                    F.col("e1").alias("e2"),
                    w.alias("w"),
                ),
            )
        ).alias("_d")
    ).select("_d.*")


def top_n_neighbors(
    weights: DataFrame, weight_col: str = "pearson", n: int = 10
) -> DataFrame:
    """(e1, e2, w): each entity's top-N neighbors by weight (W2,
    ``item_cf_model.py:309-313``), deterministic tie-break on neighbor id.
    ``weight_col`` is any of {pearson, cosine, jaccard} or "mean" for the
    A12 combined (p+c+j)/3 metric."""
    return top_n_per_key(
        symmetrize(weights, weight_col), ["e1"], "w", n, tiebreak="e2"
    )


def _weighted_sum_cols() -> tuple[F.Column, F.Column]:
    """Exact decimal Σw·r and Σ|w| (w pre-rounded to 6 → products have ≤
    12 fractional digits; decimal(38,12) sums them exactly)."""
    swr = F.sum(
        (F.col("w") * F.col("stars")).cast("decimal(38,12)")
    ).cast("double")
    sw = F.sum(F.abs(F.col("w")).cast("decimal(38,12)")).cast("double")
    return swr, sw


def predict_item_cf(
    test: DataFrame,
    train: DataFrame,
    neighbors: DataFrame,
    user_avg: DataFrame,
    biz_avg: DataFrame,
    default: float = DEFAULT_STARS,
) -> DataFrame:
    """Item-based weighted-average scorer (A9,
    ``item_cf_model.py:348-366``): score(u,b) = Σ w(b,n)·r(u,n) / Σ|w|
    over the user's rated neighbors of b; fallback ladder ū → b̄ → 2.5.

    Output: (user_id, business_id, stars, decision).

    Scale: two shuffling joins — (test ⋈ neighbors) on business and
    (⋈ ratings) on (user, neighbor) — then one aggregate back to (u,b).
    The neighbor table is top-N-pruned (≤ N rows per business), so the
    explode factor is bounded by N."""
    r = dedup_ratings(train, "business_id", "user_id")
    cand = (
        test.select("user_id", "business_id")
        .join(
            neighbors.select(
                F.col("e1").alias("business_id"),
                F.col("e2").alias("_nb"),
                "w",
            ),
            "business_id",
            "left",
        )
        .join(
            r.select(
                "user_id",
                F.col("business_id").alias("_nb"),
                "stars",
            ),
            ["user_id", "_nb"],
        )
    )
    swr, sw = _weighted_sum_cols()
    scored = cand.groupBy("user_id", "business_id").agg(
        F.when(sw > 0, F.round(swr / sw, 6)).alias("cf_score")
    )
    out = (
        test.select("user_id", "business_id")
        .join(scored, ["user_id", "business_id"], "left")
        .join(F.broadcast(user_avg), "user_id", "left")
        .join(F.broadcast(biz_avg), "business_id", "left")
    )
    decision = (
        F.when(F.col("cf_score").isNotNull(), "cf")
        .when(F.col("user_avg").isNotNull(), "usr_avg")
        .when(F.col("biz_avg").isNotNull(), "biz_avg")
        .otherwise("default")
    )
    return out.select(
        "user_id",
        "business_id",
        F.coalesce("cf_score", "user_avg", "biz_avg", F.lit(default)).alias("stars"),
        decision.alias("decision"),
    )


def predict_user_cf(
    test: DataFrame,
    train: DataFrame,
    neighbors: DataFrame,
    user_avg: DataFrame,
    biz_avg: DataFrame,
    default: float = DEFAULT_STARS,
) -> DataFrame:
    """User-based mean-centered scorer (A10,
    ``predict_user_cf.py:216-227``): score(u,b) = ū + Σ w(u,v)·(r(v,b) −
    v̄) / Σ|w| over neighbors v of u who rated b; fallback ū → b̄ → 2.5.
    """
    r = dedup_ratings(train, "business_id", "user_id")
    neigh_means = user_avg.select(
        F.col("user_id").alias("_nb"), F.col("user_avg").alias("_nb_avg")
    )
    cand = (
        test.select("user_id", "business_id")
        .join(
            neighbors.select(
                F.col("e1").alias("user_id"), F.col("e2").alias("_nb"), "w"
            ),
            "user_id",
            "left",
        )
        .join(
            r.select(
                F.col("user_id").alias("_nb"), "business_id", "stars"
            ),
            ["_nb", "business_id"],
        )
        .join(F.broadcast(neigh_means), "_nb")
        .withColumn("stars", F.col("stars") - F.col("_nb_avg"))
    )
    swr, sw = _weighted_sum_cols()
    scored = cand.groupBy("user_id", "business_id").agg(
        F.when(sw > 0, F.round(swr / sw, 6)).alias("cf_delta")
    )
    out = (
        test.select("user_id", "business_id")
        .join(scored, ["user_id", "business_id"], "left")
        .join(F.broadcast(user_avg), "user_id", "left")
        .join(F.broadcast(biz_avg), "business_id", "left")
    )
    cf_score = F.when(
        F.col("cf_delta").isNotNull() & F.col("user_avg").isNotNull(),
        F.round(F.col("user_avg") + F.col("cf_delta"), 6),
    )
    decision = (
        F.when(cf_score.isNotNull(), "cf")
        .when(F.col("user_avg").isNotNull(), "usr_avg")
        .when(F.col("biz_avg").isNotNull(), "biz_avg")
        .otherwise("default")
    )
    return out.select(
        "user_id",
        "business_id",
        F.coalesce(cf_score, "user_avg", "biz_avg", F.lit(default)).alias("stars"),
        decision.alias("decision"),
    )


def lsh_candidate_pairs(
    ratings: DataFrame,
    entity: str = "business_id",
    context: str = "user_id",
    n_hashes: int = 32,
    bands: int = 16,
    min_jaccard: float = 0.01,
) -> DataFrame:
    """MinHash-LSH candidate entity pairs from rater sets (J5/M2-M4;
    reference: hand-rolled 512-sig/256-band pipeline at
    ``train_user_cf.py:232-261``). Returns (e1, e2, jaccard ≥ min_jaccard).

    Reuses the text-dedup machinery — the rater set IS the shingle set
    (``get_rating_shingles``, ``train_user_cf.py:215-230``, made one-line).
    Use as a pre-filter feeding :func:`corated_weights` when the context
    self-join would otherwise explode."""
    from yelp_recommender_spark.operators.dedup import minhash_lsh_pairs

    sets = ratings.groupBy(entity).agg(
        F.collect_set(F.col(context).cast("string")).alias("shingles")
    )
    return minhash_lsh_pairs(
        sets,
        id_col=entity,
        shingle_col="shingles",
        n_hashes=n_hashes,
        bands=bands,
        threshold=min_jaccard,
        fast=True,
    ).withColumnRenamed("d1", "e1").withColumnRenamed("d2", "e2")
