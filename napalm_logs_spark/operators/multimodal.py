"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by Arrow-batched ``mapInPandas`` stages.

The Spark side — schema, partitioning, UDF signature, batch shape — is
real and tested.  The codec step itself is environment-dependent
(image/audio libraries are not in this container) and is isolated
behind :func:`default_decoder`:

* ``decoder='stub'``  → deterministic fake features (hash-derived), so
  pipelines and tests run anywhere;
* ``decoder='real'``  → raises ``NotImplementedError`` with the exact
  integration point (swap in PIL/librosa/ffmpeg on a real cluster).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),      # image | audio | video
        T.StructField("payload", T.BinaryType()),   # opaque bytes
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),    # typed metadata
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, digest string, "
    "features array<float>"
)


def synth_media_pandas(n: int = 64, seed: int = 42) -> pd.DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(128 + (i % 5) * 64)
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "payload": bytearray(payload),
                "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                "width": 64 if kind != "audio" else None,
                "height": 64 if kind != "audio" else None,
                "duration_ms": 1000 if kind != "image" else None,
            }
        )
    pdf = pd.DataFrame(rows)
    # None-mixed int columns must stay integral (pandas promotes to
    # float64, which Spark's IntegerType rejects as 64.0).  Object dtype
    # with Python int/None survives both Arrow and row-based conversion.
    for col in ("width", "height", "duration_ms"):
        pdf[col] = pd.Series(
            [None if pd.isna(v) else int(v) for v in pdf[col]],
            dtype=object,
            index=pdf.index,
        )
    return pdf


def default_decoder(kind: str, payload: bytes, n_features: int = 8):
    """STUB decode: deterministic features from the payload digest.

    Real integration point: replace with PIL.Image.open /
    librosa.load / ffmpeg frame sampling.  Raises if asked for the
    real path so the stub can never silently masquerade in prod.
    """
    digest = hashlib.sha256(payload).digest()
    vec = np.frombuffer(digest[: n_features * 4], dtype="<u4").astype("float32")
    return (vec % 1000) / 1000.0


def real_decoder(kind: str, payload: bytes, n_features: int = 8):  # pragma: no cover
    raise NotImplementedError(
        "media codecs not available in this environment; plug a real "
        "decoder (PIL/librosa/ffmpeg) into extract_features(decoder=...)"
    )


def extract_features(
    df: DataFrame, decoder=default_decoder, n_features: int = 8
) -> DataFrame:
    """Binary payloads → feature vectors, Arrow-batched.

    Batches arrive as pandas frames with ``bytes`` payload cells; the
    decoder runs once per row but numpy work is vectorizable per batch.
    Output is stable under repartitioning (pure per-row function).
    """

    def _batch(it):
        for pdf in it:
            feats = [
                decoder(k, bytes(p), n_features).tolist()
                for k, p in zip(pdf["kind"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "digest": [
                        hashlib.sha256(bytes(p)).hexdigest() for p in pdf["payload"]
                    ],
                    "features": feats,
                }
            )

    return df.mapInPandas(_batch, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 200) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    offset (JVM-side sequence explode; the decode itself is the stubbed
    step above).  Shows the explode-shape the real pipeline uses."""
    return (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "frame_off_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "frame_off_ms", "mime")
    )


RESIZE_SCHEMA = (
    "media_id long, kind string, width int, height int, "
    "out_width int, out_height int, resized_digest string"
)


def default_resizer(payload: bytes, w: int, h: int, out_w: int, out_h: int) -> bytes:
    """STUB resize: deterministic surrogate output (digest of payload +
    target box) standing in for the real pixel work — the Spark-side
    shape (aspect-fit box math, Arrow batches, output schema) is real.
    Swap for PIL ``Image.resize`` on a cluster with codecs."""
    return hashlib.sha256(payload + f"{w}x{h}->{out_w}x{out_h}".encode()).digest()


def resize_images(
    df: DataFrame,
    max_side: int = 256,
    resizer=default_resizer,
) -> DataFrame:
    """Image resize stage: aspect-preserving fit into ``max_side``.

    The box math (pure integer, deterministic) runs in pandas per Arrow
    batch; ``resizer`` is the isolated codec step (stub here, PIL on a
    real image).  One narrow pass — never shuffles; at 100 TB the
    stage's cost is the codec, and partition count = input splits keeps
    every executor busy.
    """

    def _batch(it):
        for pdf in it:
            imgs = pdf[pdf["kind"] == "image"]
            if not len(imgs):
                continue
            w = imgs["width"].to_numpy()
            h = imgs["height"].to_numpy()
            side = np.maximum(w, h)
            scale = np.minimum(1.0, max_side / np.maximum(side, 1))
            out_w = np.maximum(1, np.floor(w * scale + 0.5).astype("int32"))
            out_h = np.maximum(1, np.floor(h * scale + 0.5).astype("int32"))
            yield pd.DataFrame(
                {
                    "media_id": imgs["media_id"],
                    "kind": imgs["kind"],
                    "width": w,
                    "height": h,
                    "out_width": out_w,
                    "out_height": out_h,
                    "resized_digest": [
                        resizer(bytes(p), int(a), int(b), int(c), int(d)).hex()
                        for p, a, b, c, d in zip(
                            imgs["payload"], w, h, out_w, out_h
                        )
                    ],
                }
            )

    return df.mapInPandas(_batch, schema=RESIZE_SCHEMA)
