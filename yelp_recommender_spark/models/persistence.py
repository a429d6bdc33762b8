"""Model persistence (SURVEY.md §2.1 S7-S10) — save/load for every
artifact the engine trains, so predict can run in a different session
(or on a different cluster) from fit.

Reference lifecycle being covered:

- profiles / averages / vocabulary JSON round-trip
  (``/root/reference/models/content_based_model.py:380-478``)
- CF weight CSV round-trip (``/root/reference/models/item_cf_model.py:194,223-225``)
- ALS model save + reload (``/root/reference/scripts/als_recommender.py:82,97``,
  ``/root/reference/scripts/predict_als.py:92-93``)
- hybrid blend regressor save (``/root/reference/scripts/train_hybrid.py:108-110``)

Design (Spark-first, not a port): the reference's artifacts are
driver-written JSON/CSV — schema-lossy and single-file. Here every
DataFrame artifact is Parquet (schema-preserving, distributed read and
write, partition-friendly at 100 TB), Spark ML models (ALSModel, the GBT
pipeline) use native ML persistence, and a small JSON manifest — written
through the Spark DataFrameWriter so it lands on whatever Hadoop
filesystem the path points at (local, HDFS, S3) without driver-side
``open()`` — records which parts exist and how to reload them.

Layout under ``<path>/``:

- ``_manifest/``            1-row JSON: {"tables": [...], "ml": {...}}
- ``tables/<name>/``        Parquet per DataFrame artifact
- ``ml/<name>/``            native Spark ML persistence directory
"""

from __future__ import annotations

import importlib
import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def _join(path: str, *parts: str) -> str:
    return "/".join([path.rstrip("/"), *parts])


def save_model(
    path: str,
    tables: dict[str, DataFrame] | None = None,
    ml: dict[str, Any] | None = None,
) -> None:
    """Persist a model as named DataFrame artifacts + named Spark ML
    stages. Overwrites any prior model at ``path``.

    ``ml`` values must be MLWritable (e.g. ``ALSModel``,
    ``PipelineModel``); their concrete class is recorded in the manifest
    so :func:`load_model` can resolve the right ``.load``."""
    tables = tables or {}
    ml = ml or {}
    spark = None
    for name, df in tables.items():
        spark = df.sparkSession
        df.write.mode("overwrite").parquet(_join(path, "tables", name))
    ml_classes: dict[str, str] = {}
    for name, model in ml.items():
        cls = type(model)
        ml_classes[name] = f"{cls.__module__}.{cls.__name__}"
        model.write().overwrite().save(_join(path, "ml", name))
    if spark is None:
        spark = SparkSession.getActiveSession()
    manifest = json.dumps({"tables": sorted(tables), "ml": ml_classes})
    (
        spark.createDataFrame([(manifest,)], "manifest string")
        .coalesce(1)
        .write.mode("overwrite")
        .json(_join(path, "_manifest"))
    )


def load_model(spark: SparkSession, path: str) -> dict[str, Any]:
    """Reload a model saved by :func:`save_model`: returns
    {name: DataFrame} for table artifacts plus {name: fitted ML model}
    for ML stages, flat in one dict (names are disjoint by contract)."""
    manifest = json.loads(
        spark.read.json(_join(path, "_manifest")).head()["manifest"]
    )
    out: dict[str, Any] = {}
    for name in manifest["tables"]:
        out[name] = spark.read.parquet(_join(path, "tables", name))
    for name, cls_path in manifest["ml"].items():
        module, _, cls_name = cls_path.rpartition(".")
        cls = getattr(importlib.import_module(module), cls_name)
        out[name] = cls.load(_join(path, "ml", name))
    return out


# --------------------------------------------------------------------------
# convenience wrappers matching the reference's per-model save entry points
# --------------------------------------------------------------------------
def save_avgs(path: str, user_avg: DataFrame, biz_avg: DataFrame) -> None:
    """Baseline averages (``content_based_model.py:380-399``)."""
    save_model(path, tables={"user_avg": user_avg, "biz_avg": biz_avg})


def load_avgs(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    m = load_model(spark, path)
    return m["user_avg"], m["biz_avg"]


def save_content_model(path: str, model: dict[str, DataFrame]) -> None:
    """Content model = vocab + biz/user profiles
    (``content_based_model.py:400-478``); ``vocab`` may be absent for the
    extended model's concatenated embedding space."""
    save_model(path, tables={k: v for k, v in model.items() if v is not None})


def load_content_model(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    m = load_model(spark, path)
    m.setdefault("vocab", None)
    return m


def save_cf_weights(path: str, weights: DataFrame) -> None:
    """CF weight table (``item_cf_model.py:194,223-225`` — CSV there,
    Parquet here: the weight table is pair-keyed and at 100 TB benefits
    from predicate pushdown on the entity columns)."""
    save_model(path, tables={"weights": weights})


def load_cf_weights(spark: SparkSession, path: str) -> DataFrame:
    return load_model(spark, path)["weights"]
