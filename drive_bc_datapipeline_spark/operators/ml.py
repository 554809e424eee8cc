"""SparkML regression pipeline (SURVEY §2 E2/E3).

Reference parity:
- ml-sparkml.py:33-74 — StringIndexer per categorical + VectorAssembler
  + StandardScaler, then RandomForestRegressor / GBTRegressor tuned
  with a CrossValidator grid, evaluated with RMSE/MAE/MSE/R2.
- ml-savepipeline.py / inference-prediction.py — fit the full Pipeline,
  save it; load the PipelineModel elsewhere and batch-score new rows.

Here the label is order-fulfillment duration (ml_duration_features, E1)
instead of DriveBC event duration; the pipeline shape is identical.

Scale notes (100 TB):
- Everything is a Pipeline over DataFrames: feature transforms are
  narrow (no shuffle); tree training shuffles once per iteration and
  is embarrassingly parallel over partitions.
- StringIndexer's distinct-scan is the only full pass before training —
  at 100 TB you'd fit indexers on a sample or use feature hashing; the
  `handleInvalid="keep"` setting makes a sampled fit safe to apply to
  unseen categories.
- Scoring (E3) is a pure map: load PipelineModel once per executor,
  stream batches through — no driver involvement beyond the plan.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import StandardScaler, StringIndexer, VectorAssembler
from pyspark.ml.regression import GBTRegressor, RandomForestRegressor
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder
from pyspark.sql import DataFrame

LABEL = "duration_days"
NUMERIC = ["num_items", "total_qty", "total_price"]
CATEGORICAL = ["o_orderstatus", "o_orderpriority"]


def build_pipeline(algo: str = "rf") -> Pipeline:
    """StringIndexer* → VectorAssembler → StandardScaler → RF|GBT."""
    indexers = [
        StringIndexer(
            inputCol=c, outputCol=f"{c}_idx", handleInvalid="keep"
        )
        for c in CATEGORICAL
    ]
    assembler = VectorAssembler(
        inputCols=NUMERIC + [f"{c}_idx" for c in CATEGORICAL],
        outputCol="features_raw",
    )
    scaler = StandardScaler(
        inputCol="features_raw", outputCol="features", withMean=True
    )
    if algo == "rf":
        reg = RandomForestRegressor(
            labelCol=LABEL, featuresCol="features", numTrees=10, seed=42
        )
    elif algo == "gbt":
        reg = GBTRegressor(
            labelCol=LABEL, featuresCol="features", maxIter=10, seed=42
        )
    else:
        raise ValueError(f"unknown algo {algo!r}")
    return Pipeline(stages=[*indexers, assembler, scaler, reg])


def fit(train: DataFrame, algo: str = "rf") -> PipelineModel:
    return build_pipeline(algo).fit(train)


def fit_cv(train: DataFrame, algo: str = "rf", folds: int = 2) -> PipelineModel:
    """CrossValidator over a small depth grid (ml-sparkml.py's CV)."""
    pipe = build_pipeline(algo)
    reg = pipe.getStages()[-1]
    grid = (
        ParamGridBuilder()
        .addGrid(reg.maxDepth, [3, 5])
        .build()
    )
    cv = CrossValidator(
        estimator=pipe,
        estimatorParamMaps=grid,
        evaluator=RegressionEvaluator(
            labelCol=LABEL, predictionCol="prediction", metricName="rmse"
        ),
        numFolds=folds,
        seed=42,
        parallelism=2,
    )
    return cv.fit(train).bestModel


def evaluate(model: PipelineModel, test: DataFrame) -> dict[str, float]:
    """RMSE / MAE / MSE / R2 — the reference's metric set."""
    pred = model.transform(test)
    out = {}
    for metric in ("rmse", "mae", "mse", "r2"):
        out[metric] = RegressionEvaluator(
            labelCol=LABEL, predictionCol="prediction", metricName=metric
        ).evaluate(pred)
    return out


def save(model: PipelineModel, path: str) -> None:
    model.write().overwrite().save(path)


def load(path: str) -> PipelineModel:
    return PipelineModel.load(path)


def score(model: PipelineModel, batch: DataFrame) -> DataFrame:
    """E3 batch inference: new rows → predictions (inference-prediction.py)."""
    return model.transform(batch).select(
        "o_orderkey", *CATEGORICAL, *NUMERIC, "prediction"
    )
