"""Pluggable ML engines for CREATE MODEL — the Spark-first shape of the
reference's ML-handler zoo (reference: command_executor.py:1532-1567
resolves the engine named in USING and hands it the training query;
handlers implement create/predict, e.g. the lightwood/statsforecast
integrations).

An engine here is `factory(name, train_df, target, params) -> ModelSpec`:
training consumes a *distributed* DataFrame (MLlib — fit runs on the
cluster, only the fitted parameters come back to the driver), and the
returned ModelSpec predicts in Arrow-batched pandas with no JVM
dependency at inference, so the model joins compose with everything in
`operators/model.py`.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from mindsdb_spark.operators.model import ModelSpec

_NUMERIC = ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal")


def _numeric_features(df: DataFrame, target: str) -> list[str]:
    feats = [
        c for c, t in df.dtypes if c != target and any(t.startswith(n) for n in _NUMERIC)
    ]
    if not feats:
        raise ValueError("no numeric feature columns to train on")
    return feats


def spark_ml_linreg(name: str, train_df: DataFrame, target: str, params: dict) -> ModelSpec:
    """Distributed least-squares via MLlib LinearRegression; inference is a
    closed-form affine map in pandas (coefficients only cross the driver)."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    feats = _numeric_features(train_df, target)
    casted = train_df
    for c in [*feats, target]:
        casted = casted.withColumn(c, casted[c].cast("double"))
    va = VectorAssembler(inputCols=feats, outputCol="__features")
    lr = LinearRegression(
        featuresCol="__features",
        labelCol=target,
        regParam=float(params.get("reg_param", 0.0)),
        elasticNetParam=float(params.get("elastic_net", 0.0)),
    )
    model = lr.fit(va.transform(casted.dropna(subset=[*feats, target])))
    coefs = dict(zip(feats, [float(w) for w in model.coefficients]))
    intercept = float(model.intercept)

    def predict(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pd.Series(intercept, index=pdf.index, dtype="float64")
        for c, w in coefs.items():
            s = s + pdf[c].astype("float64") * w
        return pd.DataFrame({target: s})

    return ModelSpec(name=name, predict=predict, output_schema=f"{target} double")


def spark_ml_kmeans_label(name: str, train_df: DataFrame, target: str, params: dict) -> ModelSpec:
    """Cluster-id 'prediction': MLlib KMeans fit, nearest-centroid label at
    inference (numpy). `target` names the output column."""
    import numpy as np

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import VectorAssembler

    feats = _numeric_features(train_df, target) if target in dict(train_df.dtypes) else [
        c for c, t in train_df.dtypes if any(t.startswith(n) for n in _NUMERIC)
    ]
    casted = train_df
    for c in feats:
        casted = casted.withColumn(c, casted[c].cast("double"))
    va = VectorAssembler(inputCols=feats, outputCol="__features")
    km = KMeans(
        k=int(params.get("k", 4)), seed=int(params.get("seed", 42)), featuresCol="__features"
    )
    centers = np.stack(km.fit(va.transform(casted.dropna(subset=feats))).clusterCenters())

    def predict(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[feats].to_numpy(dtype="float64")
        d = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        return pd.DataFrame({target: d.argmin(axis=1).astype("int64")}, index=pdf.index)

    return ModelSpec(name=name, predict=predict, output_schema=f"{target} long")


BUILTIN_ML_ENGINES = {
    "spark_ml_linreg": spark_ml_linreg,
    "spark_ml_kmeans": spark_ml_kmeans_label,
}
