"""Config-driven train/predict lifecycle — the engine's counterpart to
the reference's ``train.py`` / ``predict.py`` / ``config/config.py:10-32``
entry points.

Config is a JSON file with the same role as the reference's per-model
configs (``/root/reference/config/config_base.json`` etc.):

    {
      "model": "baseline|content|extended|item_cf|user_cf|als|hybrid",
      "training_data": "/path/reviews.json",     # JSON-lines reviews
      "business_data": "/path/business.json",    # extended model only
      "model_dir": "/path/weights/base_model",   # save/load root
      "params": {"top_k": 200, "min_corated": 2, "k_neighbors": 10,
                 "rank": 10, "reg": 0.2, "max_iter": 10}
    }

``train`` fits the configured family and persists everything predict
needs (including the average tables for the cold-start ladder, and — for
the CF families — the deduplicated rating table the scorer joins
against, matching the reference's saved utility matrix). ``predict``
reloads the directory in a fresh session, scores a JSON-lines test-pair
file, and writes the reference's prediction contract
{user_id, business_id, stars, decision} via the distributed JSON sink.

Usage:

    python -m yelp_recommender_spark.cli train   --config cfg.json
    python -m yelp_recommender_spark.cli predict --config cfg.json \
        --test-file test.json --output preds.json
    python -m yelp_recommender_spark.cli evaluate \
        --predictions preds.json --truth truth.json

ALS accepts ``params.grid = {"ranks": [...], "regs": [...]}`` to run the
reference's hyperparameter sweep and persist the best-by-validation-RMSE
model (plus the sweep results as the ``als_grid`` table).
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from yelp_recommender_spark.models.persistence import load_model, save_model
from yelp_recommender_spark.sources.readers import read_json
from yelp_recommender_spark.sources.writers import write_predictions

REVIEW_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("business_id", T.StringType()),
        T.StructField("stars", T.DoubleType()),
        T.StructField("text", T.StringType()),
    ]
)
PAIR_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("business_id", T.StringType()),
    ]
)
PRED_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("business_id", T.StringType()),
        T.StructField("stars", T.DoubleType()),
        T.StructField("decision", T.StringType()),
    ]
)
BUSINESS_SCHEMA = T.StructType(
    [
        T.StructField("business_id", T.StringType()),
        T.StructField("categories", T.StringType()),
        T.StructField(
            "attributes", T.MapType(T.StringType(), T.StringType())
        ),
    ]
)

MODELS = ("baseline", "content", "extended", "item_cf", "user_cf", "als", "hybrid")


def load_config(path: str) -> dict:
    with open(path) as fh:
        cfg = json.load(fh)
    if cfg.get("model") not in MODELS:
        raise ValueError(f"config 'model' must be one of {MODELS}")
    for key in ("training_data", "model_dir"):
        if key not in cfg:
            raise ValueError(f"config missing '{key}'")
    cfg.setdefault("params", {})
    return cfg


# --------------------------------------------------------------------------
def train(spark: SparkSession, cfg: dict) -> None:
    """Fit the configured model family and persist it to model_dir."""
    from yelp_recommender_spark.models.baseline import fit_avgs

    p = cfg["params"]
    reviews = read_json(spark, cfg["training_data"], REVIEW_SCHEMA)
    user_avg, biz_avg = fit_avgs(reviews)
    tables: dict[str, DataFrame] = {"user_avg": user_avg, "biz_avg": biz_avg}
    ml: dict = {}
    model = cfg["model"]

    if model == "baseline":
        pass
    elif model == "content":
        from yelp_recommender_spark.models.content_based import fit_content

        prof = fit_content(
            reviews,
            top_k=int(p.get("top_k", 200)),
            min_df=int(p.get("min_df", 1)),
            variant=p.get("variant", "onehot"),
        )
        tables |= {k: v for k, v in prof.items() if v is not None}
    elif model == "extended":
        from yelp_recommender_spark.models.extended_content import fit_extended

        if "business_data" not in cfg:
            raise ValueError("extended model requires 'business_data'")
        business = read_json(spark, cfg["business_data"], BUSINESS_SCHEMA)
        ext = fit_extended(
            reviews, business, top_k=int(p.get("top_k", 200))
        )
        tables |= ext
    elif model in ("item_cf", "user_cf"):
        from yelp_recommender_spark.models.cf import (
            corated_weights,
            dedup_ratings,
            top_n_neighbors,
        )

        entity, context = (
            ("business_id", "user_id")
            if model == "item_cf"
            else ("user_id", "business_id")
        )
        # the co-rating self-join is the one explosion-risk shuffle in
        # CF training: consult the sketch-backed planner (one bounded
        # grid pass over the deduped ratings), warn with evidence on a
        # multiplier corpus, and persist the verdict with the model so
        # the next run can budget (params.cap_per_context is the
        # remedy the warning names)
        cf_plan: dict = {}
        weights = corated_weights(
            reviews,
            entity,
            context,
            min_corated=int(p.get("min_corated", 2)),
            cap_per_context=(
                int(p["cap_per_context"])
                if p.get("cap_per_context") is not None
                else None
            ),
            plan_guard="warn",
            decision_out=cf_plan,
        )
        tables["cf_join_plan"] = spark.createDataFrame(
            [(json.dumps(cf_plan, sort_keys=True),)], "plan_json string"
        )
        tables["neighbors"] = top_n_neighbors(
            weights, p.get("metric", "pearson"), n=int(p.get("k_neighbors", 10))
        )
        # the scorer joins the rating table at predict time — persist the
        # deduplicated form (the reference's saved utility matrix)
        tables["ratings"] = dedup_ratings(reviews, entity, context)
    elif model == "als":
        if "grid" in p:
            # hyperparameter sweep + selection (reference
            # scripts/train_als.py:89-106): params.grid = {"ranks":
            # [40,50], "regs": [0.2,0.4]}; best-by-validation-RMSE model
            # is persisted, the full sweep as the als_grid table
            from yelp_recommender_spark.models.als_hybrid import (
                train_als_grid_indexed,
            )

            g = p["grid"]
            bundle = train_als_grid_indexed(
                reviews,
                ranks=tuple(int(r) for r in g.get("ranks", (40, 50))),
                regs=tuple(float(r) for r in g.get("regs", (0.2, 0.4))),
                max_iter=int(p.get("max_iter", 18)),
                holdout_mod=int(g.get("holdout_mod", 10)),
            )
            ml |= {
                k: bundle[k] for k in ("user_indexer", "item_indexer", "als")
            }
            tables["als_grid"] = spark.createDataFrame(
                [
                    (
                        int(r["rank"]),
                        float(r["reg"]),
                        r["val_rmse"],
                        int(r["n_scored"]),
                        int(r["n_missing"]),
                        r["rank"] == bundle["rank"]
                        and r["reg"] == bundle["reg"],
                    )
                    for r in bundle["selection"]
                ],
                "rank int, reg double, val_rmse double, n_scored bigint,"
                " n_missing bigint, best boolean",
            )
        else:
            from yelp_recommender_spark.models.als_hybrid import (
                train_als_indexed,
            )

            ml |= train_als_indexed(
                reviews,
                rank=int(p.get("rank", 10)),
                reg=float(p.get("reg", 0.2)),
                max_iter=int(p.get("max_iter", 10)),
            )
    elif model == "hybrid":
        from yelp_recommender_spark.models.als_hybrid import (
            hybrid_features_indexed,
            train_als_indexed,
            train_hybrid_regressor,
        )
        from yelp_recommender_spark.models.cf import dedup_ratings

        bundle = train_als_indexed(
            reviews,
            rank=int(p.get("rank", 10)),
            reg=float(p.get("reg", 0.2)),
            max_iter=int(p.get("max_iter", 1)),
        )
        gmean = float(reviews.agg(F.avg("stars").alias("g")).head()["g"])
        feats = hybrid_features_indexed(
            bundle,
            reviews.select("user_id", "business_id"),
            user_avg,
            biz_avg,
            gmean,
        ).join(
            # one label per (user, biz): mean stars — a pair rated twice
            # with different stars must not train against two conflicting
            # label rows (ADVICE r2 #4)
            dedup_ratings(reviews, "business_id", "user_id"),
            ["user_id", "business_id"],
        )
        ml |= bundle
        ml["blend"] = train_hybrid_regressor(feats)
        tables["global_mean"] = spark.createDataFrame(
            [(gmean,)], "global_mean double"
        )
    save_model(cfg["model_dir"], tables=tables, ml=ml)


def predict(
    spark: SparkSession, cfg: dict, test_file: str, output: str
) -> DataFrame:
    """Reload model_dir, score the test pairs, write the prediction
    contract to ``output``; returns the prediction DataFrame."""
    m = load_model(spark, cfg["model_dir"])
    test = read_json(spark, test_file, PAIR_SCHEMA).select(
        "user_id", "business_id"
    ).distinct()
    user_avg, biz_avg = m["user_avg"], m["biz_avg"]
    model = cfg["model"]

    if model == "baseline":
        from yelp_recommender_spark.models.baseline import predict_baseline

        preds = predict_baseline(test, user_avg, biz_avg)
    elif model == "content":
        from yelp_recommender_spark.models.content_based import predict_content

        profiles = {
            "vocab": m.get("vocab"),
            "biz_profile": m["biz_profile"],
            "user_profile": m["user_profile"],
        }
        preds = predict_content(test, profiles, user_avg, biz_avg)
    elif model == "extended":
        from yelp_recommender_spark.models.extended_content import (
            predict_extended,
        )

        preds = predict_extended(
            test,
            {
                "biz_embedding": m["biz_embedding"],
                "user_profile": m["user_profile"],
            },
            user_avg,
            biz_avg,
        )
    elif model == "item_cf":
        from yelp_recommender_spark.models.cf import predict_item_cf

        preds = predict_item_cf(
            test, m["ratings"], m["neighbors"], user_avg, biz_avg
        )
    elif model == "user_cf":
        from yelp_recommender_spark.models.cf import predict_user_cf

        preds = predict_user_cf(
            test, m["ratings"], m["neighbors"], user_avg, biz_avg
        )
    elif model == "als":
        from yelp_recommender_spark.models.als_hybrid import (
            predict_als_indexed,
        )

        preds = predict_als_indexed(m, test, user_avg, biz_avg)
    elif model == "hybrid":
        from yelp_recommender_spark.models.als_hybrid import (
            hybrid_features_indexed,
            predict_hybrid,
        )

        gmean = float(m["global_mean"].head()["global_mean"])
        feats = hybrid_features_indexed(m, test, user_avg, biz_avg, gmean)
        preds = predict_hybrid(m["blend"], feats)
    else:  # pragma: no cover - load_config guards
        raise ValueError(model)

    write_predictions(preds, output)
    return preds


def evaluate(
    spark: SparkSession,
    predictions_file: str,
    truth_file: str,
    output: str | None = None,
) -> dict:
    """Third leg of the lifecycle (reference ``scripts/evaluate.py``,
    ``README.md:53-57``: ``python scripts/evaluate.py <pred> <gt>``):
    overall RMSE over the truth pairs — missing / NaN predictions
    EXCLUDED from the denominator and counted (``evaluate.py:93-96``) —
    plus the per-decision-rule breakdown (``evaluate.py:104-121``).

    Prints one JSON line; optionally writes it to ``output``. Both
    metrics are distributed aggregations (models/evaluator.py) — nothing
    driver-side beyond the final metric rows."""
    from yelp_recommender_spark.models.evaluator import rmse, rmse_by_decision

    preds = read_json(spark, predictions_file, PRED_SCHEMA)
    truth = read_json(spark, truth_file, REVIEW_SCHEMA)
    overall = rmse(preds, truth).head()
    by_dec = rmse_by_decision(preds, truth).collect()
    result = {
        "rmse": overall.rmse,
        "n_scored": overall.n_scored,
        "n_missing": overall.n_missing,
        "by_decision": {
            # predictions without a decision tag (older files, external
            # producers) group under "untagged" — a None key would make
            # the JSON line unserializable
            (r.decision or "untagged"): {"n": r.n, "rmse": r.rmse}
            for r in sorted(by_dec, key=lambda r: r.decision or "")
        },
    }
    line = json.dumps(result, sort_keys=True)
    print(line)
    if output:
        with open(output, "w") as fh:
            fh.write(line + "\n")
    return result


# --------------------------------------------------------------------------
_PLANS_HEADER = """# PLANS — physical-plan audit of the query catalog

Node counts from `explain('formatted')` at sf0.001 — each physical
node appears once (cached/reused subtrees are referenced, not
re-expanded). Plan SHAPE is scale-independent; AQE may swap a
shuffled join to broadcast at runtime when a side turns out small.
Generated by `python -m yelp_recommender_spark.cli explain --all
--markdown PLANS.md`. Notes:

- `InMemoryTableScan` = reads of the session cache registry's shared
  tables (token/shingle/signature tables computed once per session).
- A `BroadcastNestedLoopJoin` over a 1-row side (scalar fold such as
  n_docs) is benign; the catalog-wide no-CartesianProduct rule is
  enforced by tests/test_plans.py, as are per-query pins (pruned
  scans, broadcast dims, exchange counts).
- Streaming / iterative-ML entries are excluded (their plans live in
  execution harnesses, not the returned batch frame).

"""


def _pos_int(s: str) -> int:
    """argparse type for the strictly-positive knobs (--strip-spans-w,
    --span-min-docs, --semantic-clusters): a typo'd zero/negative must
    be a parse error, not an executor-side ValueError mid-run (the
    --max-pairs-per-doc precedent, ADVICE r7)."""
    v = int(s)
    if v < 1:
        raise argparse.ArgumentTypeError(f"must be >= 1 (got {v})")
    return v


def _nonneg_int(s: str) -> int:
    """argparse type for --max-pairs-per-doc: 0 is the documented
    unbounded opt-out; a (typo'd) negative value must be a parse error,
    not a silent switch into the Ω(#pairs) exact contract (ADVICE r7)."""
    v = int(s)
    if v < 0:
        raise argparse.ArgumentTypeError(
            f"must be >= 0 (got {v}; 0 = unbounded exact contract)"
        )
    return v


# ---------------------------------------------------------------------------
# Exit-code contract — ONE matrix across every maintenance/monitoring
# subcommand, so cron consumers can branch on $? without parsing JSON
# (r9 VERDICT ask #7). Pinned by tests/test_cli_exit_codes.py.
#
#   0  ran clean, nothing found
#   1  usage/config error (argparse, or a message-only SystemExit)
#   2  check failed or cannot guarantee an answer: data-quality
#      violations (maintain), broken standing index
#      (maintain --check-index), skew-check --from-profile refusal
#      (the stored summary cannot PROVE the verdict — rescan with
#      --input)
#   3  positive skew/explosion verdict: whales found (skew-check),
#      join-explosion estimate (explain-join)
#   4  profile drift flagged (profile-diff)
# ---------------------------------------------------------------------------
EXIT_OK = 0
EXIT_USAGE = 1
EXIT_CHECK_FAILED = 2
EXIT_VERDICT = 3
EXIT_DRIFT = 4
EXIT_CODES = {
    "ok": EXIT_OK,
    "usage": EXIT_USAGE,
    "check_failed": EXIT_CHECK_FAILED,
    "verdict": EXIT_VERDICT,
    "drift": EXIT_DRIFT,
}

_EXIT_EPILOG = (
    "exit codes (uniform across the maintenance/monitoring "
    "subcommands): 0 clean; 1 usage/config error; 2 check failed or "
    "cannot guarantee (maintain violations, --check-index broken, "
    "skew-check --from-profile refusal, explain "
    "--max-scans-per-relation violation); 3 positive verdict "
    "(skew-check whales, explain-join explosion); 4 drift "
    "(profile-diff)"
)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(
        prog="yelp_recommender_spark", epilog=_EXIT_EPILOG
    )
    sub = ap.add_subparsers(dest="cmd", required=True)
    tr = sub.add_parser("train")
    tr.add_argument("--config", required=True)
    pr = sub.add_parser("predict")
    pr.add_argument("--config", required=True)
    pr.add_argument("--test-file", required=True)
    pr.add_argument("--output", required=True)
    ev = sub.add_parser("evaluate")
    ev.add_argument("--predictions", required=True)
    ev.add_argument("--truth", required=True)
    ev.add_argument("--output", default=None)
    cu = sub.add_parser(
        "curate",
        help="corpus curation: quality filter → dedup → decontaminate "
        "→ mixture weights → sequence packing",
    )
    cu.add_argument("--input", required=True, help="documents parquet (or sf dir)")
    cu.add_argument("--output", required=True, help="output directory")
    cu.add_argument("--seq-len", type=int, default=256)
    cu.add_argument("--min-tokens", type=int, default=5)
    cu.add_argument("--max-top-token-frac", type=float, default=0.9)
    cu.add_argument("--max-dup-bigram-frac", type=float, default=0.9)
    cu.add_argument("--near-dup-threshold", type=float, default=0.8)
    cu.add_argument(
        "--max-bits-per-token",
        type=float,
        default=None,
        help="drop docs scoring above this under the corpus bigram LM",
    )
    cu.add_argument("--benchmark-source", default=None)
    cu.add_argument("--mixture-alpha", type=float, default=0.5)
    cu.add_argument(
        "--corpus-index",
        default=None,
        help="standing-corpus LSH index dir: near-dedup this batch "
        "against every prior run's survivors and append this run's "
        "(production ingest loop)",
    )
    cu.add_argument(
        "--embeddings",
        default=None,
        help="embeddings parquet keyed by doc_id: adds an embedding "
        "near-dup stage after the MinHash one (bounded contract by "
        "default — see --max-pairs-per-doc)",
    )
    cu.add_argument("--embedding-threshold", type=float, default=0.95)
    cu.add_argument("--embedding-id-col", default="doc_id")
    cu.add_argument("--embedding-vec-col", default="embedding")
    cu.add_argument(
        "--max-pairs-per-doc",
        type=_nonneg_int,
        default=20,
        help="bounded near-dup contract: each doc contributes at most "
        "this many partners (O(n·k) pair output; per-doc exclusions "
        "persisted to <output>/embedding_dedup_audit). 0 = unbounded "
        "exact contract (Ω(#pairs) — the catalog queries' mode)",
    )
    cu.add_argument(
        "--embedding-index",
        default=None,
        help="standing-corpus EMBEDDING index dir (requires "
        "--embeddings): match this batch's vectors against every prior "
        "run's survivors (plus smaller-id batch docs) and append this "
        "run's — the vector twin of --corpus-index; O(batch) output, "
        "--max-pairs-per-doc does not apply",
    )
    cu.add_argument(
        "--quality-model",
        default=None,
        help="qualityclf-v1 model file (from quality-train): adds a "
        "learned quality filter after the heuristic one; docs scoring "
        "below --quality-min-score are dropped",
    )
    cu.add_argument("--quality-min-score", type=float, default=0.5)
    cu.add_argument(
        "--semantic-dedup-eps",
        type=float,
        default=None,
        help="SemDeDup stage (requires --embeddings): k-means the "
        "surviving vectors and greedily prune within each cluster at "
        "cosine >= 1-eps, keeping the member farthest from its "
        "centroid per duplicate group (within-batch)",
    )
    cu.add_argument("--semantic-clusters", type=_pos_int, default=64)
    cu.add_argument(
        "--strip-spans-w",
        type=_pos_int,
        default=None,
        help="strip cross-document repeated substrings: w-token "
        "windows recurring across --span-min-docs docs are merged "
        "into spans and removed from the token stream (boilerplate, "
        "licence blocks); downstream stages see the cleaned tokens",
    )
    cu.add_argument("--span-min-docs", type=_pos_int, default=2)
    cu.add_argument(
        "--span-scope", choices=["docs", "occurrences"], default="docs",
        help="occurrences also counts repeats within one document",
    )
    cu.add_argument(
        "--dsir-target",
        default=None,
        help="target documents parquet (or sf dir): adds a DSIR "
        "selection stage after all filters — Gumbel-top-k resample "
        "--dsir-keep surviving docs with probability proportional to "
        "their hashed-n-gram importance weight under the target "
        "distribution (Xie et al. 2023); goes with --dsir-keep",
    )
    cu.add_argument(
        "--dsir-keep", type=_pos_int, default=None,
        help="DSIR selection budget (number of docs kept)",
    )
    cu.add_argument("--dsir-dim", type=_pos_int, default=10_000)
    cu.add_argument("--dsir-seed", type=int, default=0)
    qt = sub.add_parser(
        "quality-train",
        help="fit the hashed-feature quality classifier on a labeled "
        "doc set and write a qualityclf-v1 model file for "
        "curate --quality-model",
    )
    qt.add_argument("--input", required=True, help="documents parquet")
    qt.add_argument(
        "--labels", required=True,
        help="parquet of (doc_id, label) seed labels: 1 = keep, 0 = drop",
    )
    qt.add_argument("--model-out", required=True, help="model file path")
    qt.add_argument("--n-dims", type=int, default=4096)
    qt.add_argument("--reg-param", type=float, default=0.0)
    qt.add_argument("--elastic-net", type=float, default=0.0)
    qt.add_argument("--max-iter", type=int, default=100)
    ex = sub.add_parser(
        "explain",
        help="physical-plan audit: PLANS.md-style node counts for a "
        "catalog query (or --all), plus the full formatted plan on "
        "demand",
    )
    ex.add_argument("--query", default=None, help="catalog query name")
    ex.add_argument(
        "--all", action="store_true", help="audit the whole catalog"
    )
    ex.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ex.add_argument(
        "--full", action="store_true",
        help="also print the full explain('formatted') text "
        "(single --query only)",
    )
    ex.add_argument(
        "--markdown", default=None,
        help="write the audit as a PLANS.md-style markdown file",
    )
    ex.add_argument(
        "--executed", action="store_true",
        help="run each query to completion first and audit the "
        "AQE-FINAL plan (the r9 post-execution scan audit): counts "
        "reflect what actually ran, and each query's per-relation "
        "parquet-scan counts are printed",
    )
    ex.add_argument(
        "--max-scans-per-relation", type=int, default=None,
        metavar="N",
        help="fail (exit 2, check-failed) if any audited query scans "
        "one parquet relation more than N times — the recompute-"
        "multiplier gate (a union of differently-filtered views of "
        "one subtree defeats exchange reuse); most useful with "
        "--executed so caches/reuse are credited",
    )
    ab = sub.add_parser(
        "ann-build",
        help="train + persist an ANN index over an embeddings parquet "
        "table (tier auto-resolved by corpus size, or forced)",
    )
    ab.add_argument("--input", required=True, help="embeddings parquet")
    ab.add_argument("--index-dir", required=True)
    ab.add_argument(
        "--tier", choices=["auto", "ivf", "ivfpq"], default="auto",
        help="auto = resolve by corpus cardinality with the serving "
        "planner's threshold (resolved tier recorded in meta.json)",
    )
    ab.add_argument("--n-centroids", type=int, default=64)
    ab.add_argument("--m", type=int, default=8)
    ab.add_argument("--ksub", type=int, default=64)
    ab.add_argument(
        "--encoding",
        choices=["raw", "residual", "opq", "opq_residual"],
        default="raw",
        help="IVF-PQ code semantics: residual quantizes centroid "
        "offsets — tighter ADC estimates on clustered corpora at the "
        "same (m, ksub) budget; opq learns an orthogonal rotation "
        "balancing subspace energy (the gain on correlated/anisotropic "
        "embeddings; rotation persisted as a fourth artifact); "
        "recorded in meta.json",
    )
    ab.add_argument("--id-col", default="vec_id")
    ab.add_argument("--vec-col", default="embedding")
    aq = sub.add_parser(
        "ann-query",
        help="top-k neighbors from a persisted ANN index (no refit)",
    )
    aq.add_argument("--index-dir", required=True)
    aq.add_argument("--queries", required=True, help="query parquet")
    aq.add_argument("--output", required=True, help="result parquet")
    aq.add_argument("--k", type=int, default=10)
    aq.add_argument("--n-probe", type=int, default=8)
    am = sub.add_parser(
        "amplify",
        help="replicate a TESTDATA sf directory K× with FK-consistent "
        "key offsets (token-disjoint documents, perturbed embeddings) "
        "for scaling measurement — no Spark session needed",
    )
    am.add_argument("--src", required=True, help="source sf directory")
    am.add_argument("--out", required=True, help="output directory")
    am.add_argument("--factor", type=int, required=True)
    am.add_argument(
        "--overwrite", action="store_true",
        help="replace an existing amplification with different params",
    )
    pf = sub.add_parser(
        "profile",
        help="one-pass table profile over bounded sketch state: "
        "per-column stats (nulls, HLL distinct, min/max), Misra-Gries "
        "top values with guaranteed count intervals, log-histogram "
        "quantiles for numerics — three scans total whatever the "
        "table's width; outputs are mergeable parquet state",
    )
    pf.add_argument("--input", required=True, help="parquet table path")
    pf.add_argument(
        "--output", required=True,
        help="dir for columns/ heavy_hitters/ quantiles/ parquet",
    )
    pf.add_argument(
        "--columns", default=None, help="comma-separated column subset"
    )
    pf.add_argument("--topk", type=_pos_int, default=10)
    pf.add_argument(
        "--state",
        default=None,
        help="standing-profile state dir: ALSO fold this input's "
        "column stats (with their HLL sketches) into the versioned "
        "standing profile there — the daily-profile job that refreshes "
        "in O(batch) instead of rescanning history; the summary line "
        "then reports the STANDING totals (columns/ output carries the "
        "HLL binaries in this mode)",
    )
    pf.add_argument(
        "--state-version",
        type=int,
        default=None,
        help="pin the standing-profile version for this batch (e.g. "
        "days since epoch): a retry of the same batch then OVERWRITES "
        "its own version — exactly-once; without it the version is "
        "newest-committed+1, which double-counts a re-run of an "
        "already-committed batch (at-least-once)",
    )
    pd_ = sub.add_parser(
        "profile-diff",
        help="standing-profile drift report: compare two written "
        "profiles (profile --output dirs) per column — null-rate "
        "spikes, distinct collapse/explosion, numeric range breaks, "
        "heavy-hitter turnover, quantile shift, schema adds/removes; "
        "prints the findings JSON and exits 4 when anything is "
        "flagged — the monitoring consumer the standing profile "
        "exists for",
    )
    pd_.add_argument("--old", default=None, help="older profile output dir")
    pd_.add_argument("--new", default=None, help="newer profile output dir")
    pd_.add_argument(
        "--state",
        default=None,
        help="instead of two output dirs, diff two COMMITTED versions "
        "of a standing-profile state dir (profile --state): column "
        "stats checks only (the state holds no heavy-hitter/quantile "
        "views). Versions default to the two newest commits — 'what "
        "did the last batch change in the standing totals'; note the "
        "standing profile is CUMULATIVE, so per-batch drift detection "
        "wants per-batch output dirs instead",
    )
    pd_.add_argument("--old-version", type=int, default=None)
    pd_.add_argument("--new-version", type=int, default=None)
    pd_.add_argument("--null-rate-delta", type=float, default=0.05)
    pd_.add_argument("--distinct-ratio", type=float, default=2.0)
    pd_.add_argument("--range-frac", type=float, default=0.10)
    pd_.add_argument("--hh-jaccard-min", type=float, default=0.5)
    pd_.add_argument("--quantile-rel", type=float, default=0.5)
    sk = sub.add_parser(
        "skew-check",
        help="whale-key guard: one bounded-state scan reports every "
        "key holding >= --min-frac of the rows (guaranteed detection "
        "above min_frac + 1/(k+1), exact-interval bounds); exit 3 "
        "when whales are found — cron it in front of the expensive "
        "join/aggregate it protects",
    )
    sk.add_argument("--input", default=None, help="parquet table path")
    sk.add_argument(
        "--keys", required=True, help="comma-separated key columns"
    )
    sk.add_argument("--min-frac", type=float, default=0.01)
    sk.add_argument("--k", type=_pos_int, default=256)
    sk.add_argument(
        "--from-profile",
        default=None,
        help="instead of scanning a table, answer from a WRITTEN "
        "profile (profile --output dir): reads its heavy_hitters view "
        "(O(width*topk), no table scan) for a SINGLE key column; exits "
        "2 when that view cannot guarantee the verdict at --min-frac "
        "(threshold below the summary's 1/(k+1) resolution, or "
        "possible top-k truncation) — rescan with --input then. NOTE: "
        "the profile excludes NULL values (their rate lives in the "
        "column stats), so fractions are over non-null rows; a "
        "NULL-heavy whale key needs the scan path",
    )
    ej = sub.add_parser(
        "explain-join",
        help="sketch-backed join planner: estimate an equi-join's "
        "output cardinality (count-min inner product) and per-side "
        "whale bounds BEFORE running it; prints the plan JSON "
        "(broadcast/salted/shuffle strategy + explosion warning) and "
        "exits 3 on an explosion verdict — the pre-flight for any "
        "many-to-many-risk join",
    )
    ej.add_argument("--left", required=True, help="left/big parquet path")
    ej.add_argument(
        "--right", default=None, help="right/replica-side parquet path"
    )
    ej.add_argument(
        "--self",
        action="store_true",
        dest="self_join",
        help="estimate a SELF-equi-join of --left on --on (the CF "
        "co-rating / LSH band-key shape): one count-min grid serves "
        "both sides, est_pairs is the a<b pair estimate; --right must "
        "be omitted",
    )
    ej.add_argument(
        "--on", required=True, help="comma-separated join key columns"
    )
    ej.add_argument("--broadcast-rows", type=_pos_int, default=1_000_000)
    ej.add_argument("--explosion-factor", type=float, default=4.0)
    ej.add_argument("--whale-frac", type=float, default=0.10)
    ej.add_argument(
        "--how",
        default="inner",
        help="join flavor the estimate should describe "
        "(inner/left/left_semi/left_anti — left-preserving only); "
        "est_join_rows is always the inner-match count, "
        "est_output_rows adjusts it to this flavor (semi/anti are "
        "capped at the left row count and never flag explosion)",
    )
    mt = sub.add_parser(
        "maintain",
        help="maintenance: table small-file compaction (+ optional "
        "range clustering + data-quality report), standing-index "
        "compaction (--index), and the read-only index doctor "
        "(--check-index)",
    )
    mt.add_argument("--input", default=None, help="parquet table path")
    mt.add_argument("--output", default=None, help="compacted output path")
    mt.add_argument("--target-mb", type=int, default=128)
    mt.add_argument(
        "--index",
        default=None,
        help="standing-index dir (curate --corpus-index / "
        "--embedding-index): rewrite its N committed ingest runs into "
        "one baseline run under the same crash discipline — crash "
        "mid-compaction leaves the old runs intact",
    )
    mt.add_argument(
        "--check-index",
        default=None,
        help="standing-index dir: READ-ONLY audit (torn runs, strays, "
        "meta/family provenance); prints the report JSON and exits 2 "
        "on errors without mutating the index",
    )
    mt.add_argument(
        "--gc-strays",
        action="store_true",
        help="with --index: also vacuum crash artifacts (stray "
        "uncommitted run data, dangling txn intents) older than "
        "--older-than-hours — recent artifacts are presumed in-flight "
        "staging and kept",
    )
    mt.add_argument("--older-than-hours", type=float, default=24.0)
    mt.add_argument(
        "--order-cols",
        default=None,
        help="comma-separated columns to range-cluster (zone-map layout)",
    )
    mt.add_argument(
        "--not-null",
        default=None,
        help="comma-separated columns that must be non-null (checked on "
        "the compacted output; nonzero exit on violation)",
    )
    args = ap.parse_args(argv)

    if args.cmd == "amplify":
        # pyarrow-native: no Spark session, prints the manifest JSON
        from yelp_recommender_spark.amplify import amplify

        manifest = amplify(
            args.src, args.out, args.factor, overwrite=args.overwrite
        )
        print(json.dumps(manifest))
        return

    from yelp_recommender_spark.session import get_spark

    if args.cmd == "evaluate":
        spark = get_spark(app_name="yelp_recommender_evaluate")
        evaluate(spark, args.predictions, args.truth, args.output)
        return
    if args.cmd == "maintain":
        modes = [
            bool(args.check_index), bool(args.index),
            bool(args.input or args.output),
        ]
        if sum(modes) != 1:
            ap.error(
                "maintain: pass exactly one of --check-index DIR, "
                "--index DIR, or --input/--output"
            )
        if args.check_index:
            # read-only doctor: pure listing + meta reads, no Spark
            from yelp_recommender_spark.indexmaint import check_index

            report = check_index(args.check_index)
            print(json.dumps(report, sort_keys=True))
            if not report["ok"]:
                raise SystemExit(EXIT_CHECK_FAILED)
            return
        if args.index:
            from yelp_recommender_spark.indexmaint import (
                compact_standing_index,
                gc_strays,
            )

            spark = get_spark(app_name="yelp_recommender_maintain")
            report = compact_standing_index(
                spark, args.index,
                target_bytes=args.target_mb * 1024 * 1024,
            )
            if args.gc_strays:
                report["gc"] = gc_strays(
                    args.index, older_than_hours=args.older_than_hours
                )
            print(json.dumps(report, sort_keys=True))
            return
        if not (args.input and args.output):
            ap.error("maintain: table mode needs both --input and --output")
        from yelp_recommender_spark.operators.compact import compact_parquet
        from yelp_recommender_spark.operators.quality import (
            check_constraints,
        )

        spark = get_spark(app_name="yelp_recommender_maintain")
        order = (
            [c.strip() for c in args.order_cols.split(",") if c.strip()]
            if args.order_cols
            else None
        )
        n_files = compact_parquet(
            spark,
            args.input,
            args.output,
            target_bytes=args.target_mb * 1024 * 1024,
            order_cols=order,
        )
        report: dict = {"files": n_files, "checks": []}
        failed = False
        if args.not_null:
            suite = [
                {"type": "not_null", "col": c.strip()}
                for c in args.not_null.split(",")
                if c.strip()
            ]
            rows = check_constraints(
                spark.read.parquet(args.output), suite
            ).collect()
            report["checks"] = [
                {
                    "check": r.check_name,
                    "n_violations": r.n_violations,
                    "passed": r.passed,
                }
                for r in rows
            ]
            failed = any(not r.passed for r in rows)
        print(json.dumps(report, sort_keys=True))
        if failed:
            raise SystemExit(EXIT_CHECK_FAILED)
        return
    if args.cmd == "skew-check":
        keys = [c.strip() for c in args.keys.split(",") if c.strip()]
        if (args.input is None) == (args.from_profile is None):
            raise SystemExit(
                "skew-check: pass exactly one of --input / --from-profile"
            )
        spark = get_spark(app_name="yelp_recommender_skew_check")
        if args.from_profile is not None:
            # answer from the standing profile's already-written MG
            # view — O(width*topk) read, no table scan; refuse (exit 2)
            # whenever the stored summary cannot GUARANTEE the verdict
            if len(keys) != 1:
                raise SystemExit(
                    "skew-check --from-profile supports a single key "
                    "column (profiles are per-column) — composite keys "
                    "need a table scan (--input)"
                )
            hh = spark.read.parquet(
                os.path.join(args.from_profile, "heavy_hitters")
            )
            if "mg_k" not in hh.columns:
                print(
                    json.dumps({"err": "profile predates mg_k — rescan"})
                )
                raise SystemExit(EXIT_CHECK_FAILED)
            rows = [r for r in hh.collect() if r.column == keys[0]]
            if not rows:
                print(
                    json.dumps(
                        {"err": f"column {keys[0]!r} not in profile"}
                    )
                )
                raise SystemExit(EXIT_CHECK_FAILED)
            mg_k = int(rows[0].mg_k)
            mg_n = int(rows[0].mg_n)
            if args.min_frac < 1.0 / (mg_k + 1):
                print(
                    json.dumps(
                        {
                            "err": "profile summary resolution "
                            f"1/(k+1)={1.0 / (mg_k + 1):.4f} is coarser "
                            f"than min_frac={args.min_frac} — rescan "
                            "with --input"
                        }
                    )
                )
                raise SystemExit(EXIT_CHECK_FAILED)
            cut = args.min_frac * mg_n
            whale_rows = [r for r in rows if int(r.n_lo) >= cut]
            # truncation is only POSSIBLE when the view stored exactly
            # its top-k quota (a shorter list means the MG summary
            # held fewer survivors — stored in full, verdict provably
            # complete); profiles predating the stored topk can't
            # distinguish the cases, so they stay conservative
            topk_stored = (
                int(rows[0].topk) if "topk" in hh.columns else None
            )
            truncation_possible = (
                topk_stored is None or len(rows) >= topk_stored
            )
            if truncation_possible and len(whale_rows) == len(rows):
                # every STORED item clears the threshold, so the view's
                # top-k cutoff may sit above it — whales could be
                # truncated away; only a rescan can prove completeness
                print(
                    json.dumps(
                        {
                            "err": "all stored heavy hitters clear "
                            "min_frac and the view is at its top-k "
                            "quota — whales could be truncated away; "
                            "rescan with --input"
                        }
                    )
                )
                raise SystemExit(EXIT_CHECK_FAILED)
            payload = [
                {
                    keys[0]: str(r.value),
                    "n_lo": int(r.n_lo),
                    "n_hi": int(r.n_hi),
                    "frac_lo": round(int(r.n_lo) / mg_n, 6),
                    "frac_hi": round(int(r.n_hi) / mg_n, 6),
                }
                for r in whale_rows
            ]
            print(
                json.dumps(
                    {
                        "n_whales": len(payload),
                        "min_frac": args.min_frac,
                        "source": "profile",
                        "whales": payload,
                    },
                    sort_keys=True,
                )
            )
            if payload:
                raise SystemExit(EXIT_VERDICT)
            return
        from yelp_recommender_spark.operators.skew import detect_skew

        whales = detect_skew(
            spark.read.parquet(args.input),
            keys,
            min_frac=args.min_frac,
            k=args.k,
        ).collect()  # bounded: at most k rows survive the summary
        print(
            json.dumps(
                {
                    "n_whales": len(whales),
                    "min_frac": args.min_frac,
                    "source": "scan",
                    "whales": [
                        {
                            **{c: str(r[c]) for c in keys},
                            "n_lo": int(r.n_lo),
                            "n_hi": int(r.n_hi),
                            "frac_lo": round(float(r.frac_lo), 6),
                            "frac_hi": round(float(r.frac_hi), 6),
                        }
                        for r in whales
                    ],
                },
                sort_keys=True,
            )
        )
        if whales:
            raise SystemExit(EXIT_VERDICT)
        return
    if args.cmd == "profile-diff":
        from yelp_recommender_spark.operators.profile import (
            collect_column_stats,
            collect_profile,
            drift_report,
        )

        state_mode = args.state is not None
        if state_mode == (args.old is not None or args.new is not None):
            raise SystemExit(
                "profile-diff: pass either --old/--new output dirs or "
                "--state (with optional --old-version/--new-version)"
            )
        spark = get_spark(app_name="yelp_recommender_profile_diff")
        if state_mode:
            from yelp_recommender_spark.streaming.ops import (
                _committed_summary_batches,
            )

            ids = _committed_summary_batches(args.state)
            old_v = args.old_version
            new_v = args.new_version
            if old_v is None or new_v is None:
                if len(ids) < 2:
                    raise SystemExit(
                        f"profile-diff --state: {args.state} has "
                        f"{len(ids)} committed version(s); need two "
                        "(or pass --old-version/--new-version)"
                    )
                old_v = ids[-2] if old_v is None else old_v
                new_v = ids[-1] if new_v is None else new_v
            for v in (old_v, new_v):
                if v not in ids:
                    raise SystemExit(
                        f"profile-diff --state: version {v} is not a "
                        f"committed version of {args.state} "
                        f"(committed: {ids})"
                    )

            def _ver(v):
                stats = spark.read.parquet(
                    os.path.join(args.state, f"batch_id={v}")
                )
                return {
                    "columns": collect_column_stats(stats),
                    "heavy_hitters": {},
                    "quantiles": {},
                }

            old_prof, new_prof = _ver(old_v), _ver(new_v)
        else:
            if args.old is None or args.new is None:
                raise SystemExit(
                    "profile-diff: --old and --new are both required "
                    "in output-dir mode"
                )
            old_prof = collect_profile(spark, args.old)
            new_prof = collect_profile(spark, args.new)
        findings = drift_report(
            old_prof,
            new_prof,
            null_rate_delta=args.null_rate_delta,
            distinct_ratio=args.distinct_ratio,
            range_frac=args.range_frac,
            hh_jaccard_min=args.hh_jaccard_min,
            quantile_rel=args.quantile_rel,
        )
        flagged = [f for f in findings if f["flagged"]]
        print(
            json.dumps(
                {
                    "n_checks": len(findings),
                    "n_flagged": len(flagged),
                    "flagged": flagged,
                },
                sort_keys=True,
            )
        )
        if flagged:
            raise SystemExit(EXIT_DRIFT)
        return
    if args.cmd == "explain-join":
        from yelp_recommender_spark.operators.joinplan import (
            join_plan,
            self_join_size,
        )

        if args.self_join == (args.right is not None):
            raise SystemExit(
                "explain-join: pass exactly one of --right / --self"
            )
        spark = get_spark(app_name="yelp_recommender_explain_join")
        keys = [c.strip() for c in args.on.split(",") if c.strip()]
        if args.self_join:
            plan = self_join_size(
                spark.read.parquet(args.left),
                keys,
                explosion_factor=args.explosion_factor,
            )
        else:
            plan = join_plan(
                spark.read.parquet(args.left),
                spark.read.parquet(args.right),
                keys,
                how=args.how,
                broadcast_rows=args.broadcast_rows,
                explosion_factor=args.explosion_factor,
                whale_frac=args.whale_frac,
            )
        print(json.dumps(plan, sort_keys=True))
        if plan["explosion"]:
            raise SystemExit(EXIT_VERDICT)
        return
    if args.cmd == "profile":
        from yelp_recommender_spark.operators.profile import profile_table

        spark = get_spark(app_name="yelp_recommender_profile")
        df = spark.read.parquet(args.input)
        cols = (
            [c.strip() for c in args.columns.split(",") if c.strip()]
            if args.columns
            else None
        )
        prof = profile_table(df, columns=cols, topk=args.topk)
        standing_version = None
        if args.state:
            from yelp_recommender_spark.operators.profile import (
                merge_column_stats,
                profile_column_stats,
            )
            from yelp_recommender_spark.streaming.ops import (
                _committed_summary_batches,
                latest_summary,
                summary_apply_batch,
            )

            # in state mode the columns output carries the HLL binaries
            # (the mergeable form), and the standing fold READS that
            # just-written O(width) parquet instead of rescanning the
            # input — the three-scan contract holds with --state
            prof["columns"] = profile_column_stats(
                df, cols, keep_sketches=True
            )
            for name, d in prof.items():
                d.write.mode("overwrite").parquet(
                    os.path.join(args.output, name)
                )
            batch_stats = spark.read.parquet(
                os.path.join(args.output, "columns")
            )
            if args.state_version is not None:
                # caller-pinned version: re-running the same batch
                # overwrites the same version — exactly-once under
                # retries (date-derived versions are the natural choice
                # for a daily job)
                standing_version = int(args.state_version)
            else:
                # auto mode is AT-LEAST-ONCE: the version comes from a
                # directory listing, so re-running an already-committed
                # batch folds it in again — pass --state-version for
                # retry-safe runs (single writer either way)
                ids = _committed_summary_batches(args.state)
                standing_version = (ids[-1] + 1) if ids else 0
            summary_apply_batch(
                args.state,
                batch_stats,
                standing_version,
                lambda b: b,  # already the stats table — no rescan
                merge_column_stats,
            )
            stats = latest_summary(spark, args.state).collect()
        else:
            for name, d in prof.items():
                d.write.mode("overwrite").parquet(
                    os.path.join(args.output, name)
                )
            # the stats table is O(width) rows — a bounded driver read
            # for the operator-facing summary line
            stats = spark.read.parquet(
                os.path.join(args.output, "columns")
            ).collect()
        print(
            json.dumps(
                {
                    "n_rows": int(stats[0].n_rows) if stats else 0,
                    "columns": {
                        r.column: {
                            "n_nonnull": int(r.n_nonnull),
                            "approx_distinct": int(r.approx_distinct),
                        }
                        for r in stats
                    },
                    "output": args.output,
                    "standing_version": standing_version,
                },
                sort_keys=True,
            )
        )
        return
    if args.cmd == "ann-build":
        from yelp_recommender_spark.ann_index import build_ann_index

        spark = get_spark(app_name="yelp_recommender_ann_build")
        report = build_ann_index(
            spark,
            args.input,
            args.index_dir,
            tier=args.tier,
            n_centroids=args.n_centroids,
            m=args.m,
            ksub=args.ksub,
            id_col=args.id_col,
            vec_col=args.vec_col,
            encoding=args.encoding,
        )
        print(json.dumps(report, sort_keys=True))
        return
    if args.cmd == "ann-query":
        from yelp_recommender_spark.ann_index import query_ann_index

        spark = get_spark(app_name="yelp_recommender_ann_query")
        out = query_ann_index(
            spark, args.index_dir, args.queries, k=args.k,
            n_probe=args.n_probe,
        )
        out.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
        print(json.dumps({"n_results": int(n), "output": args.output}))
        return
    if args.cmd == "explain":
        from yelp_recommender_spark.planaudit import (
            audit_catalog,
            audit_line,
            formatted_plan,
            plan_node_counts,
            run_to_completion,
            scan_relations,
        )
        from yelp_recommender_spark.queries import QUERIES

        if not args.all and not args.query:
            raise SystemExit("explain: pass --query NAME or --all")
        if args.all and args.full:
            raise SystemExit(
                "explain: --full prints one query's formatted plan — "
                "use it with --query NAME (with --all it would dump "
                "the whole catalog's plans)"
            )
        spark = get_spark(app_name="yelp_recommender_explain")
        lines = []
        if args.query:
            if args.query not in QUERIES:
                raise SystemExit(f"unknown query {args.query!r}")
            # build the frame ONCE: counts and --full share it (some
            # queries do eager work — stats probes, cache registration)
            df = QUERIES[args.query](spark, args.sf_dir)
            if args.executed:
                run_to_completion(df)
            counts = plan_node_counts(df)
            counts["scans_by_relation"] = scan_relations(df)
            audits = {args.query: counts}
            if args.full:
                print(formatted_plan(df))
        else:
            audits = audit_catalog(
                spark, args.sf_dir, executed=args.executed
            )
        for name, counts in audits.items():
            lines.append(f"## {name}")
            lines.append(f"- {audit_line(counts)}")
            lines.append("")
            print(f"{name}: {audit_line(counts)}")
            if args.executed:
                rels = counts.get("scans_by_relation") or {}
                shown = {k: rels[k] for k in sorted(rels)}
                print(f"{name}: scans by relation: {shown or 'none'}")
        if args.markdown:
            with open(args.markdown, "w") as f:
                f.write(_PLANS_HEADER + "\n".join(lines))
        if args.max_scans_per_relation is not None:
            cap = args.max_scans_per_relation
            violations = {
                name: bad
                for name, counts in audits.items()
                if (bad := {
                    rel: n
                    for rel, n in (counts.get("scans_by_relation") or {}).items()
                    if n > cap
                })
            }
            if violations:
                print(
                    "explain: recompute-multiplier gate FAILED "
                    f"(relation scanned more than {cap}x): "
                    f"{json.dumps(violations, sort_keys=True)}"
                )
                raise SystemExit(EXIT_CHECK_FAILED)
            print(
                f"explain: recompute-multiplier gate ok (<= {cap} "
                "scans per relation per query)"
            )
        return
    if args.cmd == "curate":
        from yelp_recommender_spark.curate import curate_corpus

        spark = get_spark(app_name="yelp_recommender_curate")
        report = curate_corpus(
            spark,
            args.input,
            args.output,
            seq_len=args.seq_len,
            min_tokens=args.min_tokens,
            max_top_token_frac=args.max_top_token_frac,
            max_dup_bigram_frac=args.max_dup_bigram_frac,
            near_dup_threshold=args.near_dup_threshold,
            max_bits_per_token=args.max_bits_per_token,
            benchmark_source=args.benchmark_source,
            mixture_alpha=args.mixture_alpha,
            corpus_index_dir=args.corpus_index,
            embeddings_path=args.embeddings,
            embedding_threshold=args.embedding_threshold,
            embedding_id_col=args.embedding_id_col,
            embedding_vec_col=args.embedding_vec_col,
            max_pairs_per_doc=(
                args.max_pairs_per_doc if args.max_pairs_per_doc > 0
                else None
            ),
            embedding_index_dir=args.embedding_index,
            quality_model_path=args.quality_model,
            quality_min_score=args.quality_min_score,
            semantic_eps=args.semantic_dedup_eps,
            dsir_target_path=args.dsir_target,
            dsir_keep=args.dsir_keep,
            dsir_dim=args.dsir_dim,
            dsir_seed=args.dsir_seed,
            semantic_clusters=args.semantic_clusters,
            strip_spans_w=args.strip_spans_w,
            span_min_docs=args.span_min_docs,
            span_scope=args.span_scope,
        )
        print(json.dumps(report, sort_keys=True))
        return
    if args.cmd == "quality-train":
        from yelp_recommender_spark.functions.text import tokens_col
        from yelp_recommender_spark.operators.qualityclf import (
            save_model as save_quality_model,
        )
        from yelp_recommender_spark.operators.qualityclf import (
            train_quality_classifier,
        )

        spark = get_spark(app_name="yelp_recommender_quality_train")
        inp = args.input
        if os.path.isdir(inp) and os.path.exists(
            os.path.join(inp, "documents.parquet")
        ):
            inp = os.path.join(inp, "documents.parquet")
        docs = spark.read.parquet(inp).select("doc_id", "text")
        tokens = docs.select(
            "doc_id",
            F.explode(tokens_col("text")).alias("token"),
        )
        labels = spark.read.parquet(args.labels).select("doc_id", "label")
        weights, intercept = train_quality_classifier(
            tokens,
            labels,
            n_dims=args.n_dims,
            reg_param=args.reg_param,
            elastic_net=args.elastic_net,
            max_iter=args.max_iter,
        )
        save_quality_model(args.model_out, weights, intercept)
        import numpy as np

        print(
            json.dumps(
                {
                    "model": args.model_out,
                    "n_dims": int(args.n_dims),
                    "n_nonzero_weights": int(
                        np.count_nonzero(np.asarray(weights))
                    ),
                    "intercept": float(intercept),
                },
                sort_keys=True,
            )
        )
        return
    cfg = load_config(args.config)
    spark = get_spark(app_name=f"yelp_recommender_{cfg['model']}")
    if args.cmd == "train":
        train(spark, cfg)
    else:
        predict(spark, cfg, args.test_file, args.output)


if __name__ == "__main__":
    main()
