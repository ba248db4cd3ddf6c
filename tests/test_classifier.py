"""Model-based quality/domain classifier: distributed softmax
regression (operators/classifier.py) vs the numpy reference
implementation (shared with the golden generator so the two cannot
drift — the Spark trainer is the only independent party), plus the
determinism contracts the stored golden relies on (partitioning
invariance, zero-weight reproducibility)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from napalm_logs_spark.operators.classifier import (
    GRAD_QUANT,
    classifier_filter,
    softmax_predict,
    softmax_train,
)
from tools.make_goldens import numpy_softmax_train

SF_DIR = "/root/testdata/sf0.001"
K, ITERS, LR = 10, 8, 5.0


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


# One shared numpy reference (tools/make_goldens.numpy_softmax_train)
# backs both this test and the golden generator.
_numpy_train = numpy_softmax_train


@pytest.fixture(scope="module")
def pdf_emb():
    df = pd.read_parquet(f"{SF_DIR}/embeddings.parquet").sort_values("vec_id")
    M = np.array([np.asarray(v, dtype="float64") for v in df["embedding"]])
    y = df["label"].to_numpy().astype(np.int64)
    return df, M, y


def test_weights_match_numpy_replication(emb, pdf_emb):
    _, M, y = pdf_emb
    W_spark = softmax_train(emb, k=K, iters=ITERS, lr=LR)
    W_np = _numpy_train(M, y, K, ITERS, LR)
    # fixed-point gradient sums make the two trainers IDENTICAL, not
    # merely close — any drift means order-dependence snuck in
    assert np.array_equal(W_spark, W_np)


def test_predictions_match_and_beat_chance(emb, pdf_emb):
    _, M, y = pdf_emb
    out = (
        classifier_filter(emb, k=K, iters=ITERS, lr=LR)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    W = _numpy_train(M, y, K, ITERS, LR)
    Xb = np.concatenate([M, np.ones((len(M), 1))], axis=1)
    pred = (Xb @ W.T).argmax(axis=1)
    assert (out["pred"].to_numpy() == pred).all()
    assert (out["correct"].to_numpy() == (pred == y).astype(int)).all()
    # 10-class chance is 0.1; the gate should actually learn something
    # (8 short-test iterations reach ~0.18; 20 reach ~0.30)
    assert out["correct"].mean() > 0.15


def test_partitioning_invariance(emb):
    a = softmax_train(emb, k=K, iters=4, lr=LR)
    b = softmax_train(emb.repartition(7), k=K, iters=4, lr=LR)
    c = softmax_train(emb.coalesce(1), k=K, iters=4, lr=LR)
    assert np.array_equal(a, b)
    assert np.array_equal(a, c)


def test_predict_ties_break_low(spark):
    # zero weights score every class equally -> argmax picks class 0
    df = spark.createDataFrame(
        [(1, [0.5, -0.5])], "vec_id long, embedding array<double>"
    )
    out = softmax_predict(df, np.zeros((3, 3))).collect()
    assert out[0]["pred"] == 0


def test_empty_and_null_inputs(spark):
    # an empty (or all-null) training set is a configuration error:
    # loud ValueError, not a degenerate weight matrix that crashes
    # the predict stage later with an opaque shape mismatch
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>, label int"
    )
    with pytest.raises(ValueError, match="no trainable rows"):
        softmax_train(empty, k=3, iters=2)
    # null embedding / null label rows are excluded from training
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, None, 1), (3, [0.0, 1.0], None)],
        "vec_id long, embedding array<double>, label int",
    )
    W2 = softmax_train(df, k=2, iters=2, lr=1.0)
    assert W2.shape == (2, 3)
    assert np.isfinite(W2).all()
    # ...and the scorer tolerates the same null rows the trainer
    # drops: null embedding -> null prediction, valid rows scored
    preds = {
        r["vec_id"]: r["pred"]
        for r in softmax_predict(df, W2).select("vec_id", "pred").collect()
    }
    assert preds[2] is None
    assert preds[1] is not None and preds[3] is not None
    # the composed gate runs end-to-end on the null-bearing frame
    out = classifier_filter(
        df.filter(F.col("label").isNotNull()), k=2, iters=2, lr=1.0
    ).collect()
    assert {r["vec_id"] for r in out} == {1, 2}


def test_label_range_validated(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.0, 1.0], 3)],
        "vec_id long, embedding array<double>, label int",
    )
    # label >= k: loud driver-side error, not an executor IndexError
    with pytest.raises(ValueError, match=r"labels must lie in \[0, 3\)"):
        softmax_train(df, k=3, iters=1)
    # negative labels would silently wrap in numpy fancy indexing
    neg = spark.createDataFrame(
        [(1, [1.0, 0.0], -1), (2, [0.0, 1.0], 1)],
        "vec_id long, embedding array<double>, label int",
    )
    with pytest.raises(ValueError, match="labels must lie in"):
        softmax_train(neg, k=3, iters=1)


def test_predict_composes_with_structured_streaming(spark, tmp_path):
    """Train batch, score a stream: softmax_predict is a narrow Arrow
    UDF, so the same weights gate a readStream source — the deployment
    shape where the classifier filters documents as they arrive."""
    batch = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    W = softmax_train(batch, k=K, iters=4, lr=LR)
    expected = {
        r["vec_id"]: r["pred"]
        for r in softmax_predict(batch, W).select("vec_id", "pred").collect()
    }
    src = str(tmp_path / "src")
    batch.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        softmax_predict(stream, W)
        .select("vec_id", "pred")
        .writeStream.format("memory")
        .queryName("clf_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["vec_id"]: r["pred"]
        for r in spark.sql("SELECT * FROM clf_stream_test").collect()
    }
    assert got == expected


def test_matches_stored_golden(emb):
    golden = pd.read_parquet(
        "/root/repo/testdata_goldens/classifier_golden.parquet"
    )
    key = (
        emb.select(
            F.sum(
                F.floor(F.col("embedding")[0].cast("double") * 1000).cast("long")
            ).alias("k")
        ).first()["k"]
    )
    g = (
        golden[golden["scale_key"] == key]
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(g) > 0
    out = (
        classifier_filter(emb, k=10, iters=20, lr=5.0)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert (out["pred"].to_numpy() == g["pred"].to_numpy()).all()
    assert (out["correct"].to_numpy() == g["correct"].to_numpy()).all()
