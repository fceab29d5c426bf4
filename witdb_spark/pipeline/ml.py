"""ML plugin analog (reference plugin/trino-ml: learn_classifier /
classify / features over a libsvm wrapper, Classifier.java) rebuilt on
Spark MLlib — the distributed-native替 is the whole point: MLlib's
LogisticRegression trains with distributed treeAggregate passes instead of
the reference's single-node libsvm call.

Models are returned as fitted PipelineModel-like objects (the reference
returns an opaque Classifier value); `classify` applies them. Training is
deterministic given a fixed partitioning up to float reduction order —
tests assert accuracy bounds, not exact coefficients (same policy as the
approx sketches)."""

from __future__ import annotations

from pyspark.ml.classification import LogisticRegression, LogisticRegressionModel
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def learn_classifier(
    train: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    max_iter: int = 25,
    reg_param: float = 0.01,
) -> LogisticRegressionModel:
    """learn_classifier(label, features) -> model (reference
    plugin/trino-ml MLFunctions.java). Multinomial logistic regression;
    features arrive as array<float> columns straight off parquet."""
    assembled = train.select(
        F.col(label_col).cast("double").alias("label"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    lr = LogisticRegression(maxIter=max_iter, regParam=reg_param)
    return lr.fit(assembled)


def classify(
    model: LogisticRegressionModel, df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """classify(features, model) -> predicted label per input row; keeps
    all input columns and appends `prediction`. The model's working
    columns are remapped to reserved __clf_* names so pre-existing
    features/rawPrediction/probability/prediction columns survive."""
    for c in df.columns:
        if c == "prediction":
            raise ValueError(
                "classify appends a 'prediction' column; rename the"
                " existing one first"
            )
    assembled = df.withColumn(
        "__clf_features", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    m = model.copy(None)
    m.setFeaturesCol("__clf_features")
    m.setRawPredictionCol("__clf_raw")
    m.setProbabilityCol("__clf_prob")
    m.setPredictionCol("__clf_pred")
    out = m.transform(assembled)
    return out.drop("__clf_features", "__clf_raw", "__clf_prob").withColumn(
        "prediction", F.col("__clf_pred").cast("int")
    ).drop("__clf_pred")
