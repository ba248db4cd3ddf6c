"""Perceptual-hash image dedup (operators/imagededup.py): hash
contract, container invariance, banded-join exactness, the signed
int64 packing, and the freq_cap skew guard."""

import numpy as np
from pyspark.sql import functions as F

from napalm_logs_spark.operators.imagededup import (
    dhash64,
    hamming_near_dup,
    phash_images,
    synth_phash_corpus_pandas,
)
from napalm_logs_spark.operators.multimodal import encode_bmp, encode_png


def _corpus_df(spark, pdf):
    return spark.createDataFrame(pdf, schema="media_id long, payload binary")


def test_container_swap_same_hash(spark):
    # identical pixels through BMP and PNG decode to the same array,
    # hence the same hash — Hamming 0 through the full Spark path
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(10, 14, 3), dtype=np.uint8)
    import pandas as pd

    pdf = pd.DataFrame(
        {"media_id": [0, 1], "payload": [bytearray(encode_bmp(px)), bytearray(encode_png(px))]}
    )
    rows = phash_images(_corpus_df(spark, pdf)).collect()
    assert rows[0].phash == rows[1].phash == dhash64(px)


def test_signed_packing_roundtrip(spark):
    # an image whose first sampled gradient is positive sets bit 63 →
    # the packed value is NEGATIVE as int64 and must survive Spark
    px = np.zeros((8, 9, 3), dtype=np.uint8)
    px[:, 1:, :] = 255  # every row: col0 -> col1 is a rising edge
    v = dhash64(px)
    assert v < 0  # MSB set
    import pandas as pd

    pdf = pd.DataFrame({"media_id": [7], "payload": [bytearray(encode_bmp(px))]})
    assert phash_images(_corpus_df(spark, pdf)).collect()[0].phash == v


def test_banded_join_is_exact_vs_brute_force(spark):
    corpus = _corpus_df(spark, synth_phash_corpus_pandas(n_base=8, seed=5))
    hashed = phash_images(corpus)
    hv = {r.media_id: r.phash for r in hashed.collect()}
    ids = sorted(hv)
    for max_h, n_bands in ((3, 4), (6, 8)):
        brute = {
            (a, b, bin((hv[a] ^ hv[b]) & ((1 << 64) - 1)).count("1"))
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
            if bin((hv[a] ^ hv[b]) & ((1 << 64) - 1)).count("1") <= max_h
        }
        got = {
            (r.id_a, r.id_b, r.hamming)
            for r in hamming_near_dup(
                hashed, max_hamming=max_h, n_bands=n_bands
            ).collect()
        }
        assert got == brute, (max_h, n_bands)


def test_partitioning_invariance(spark):
    corpus = synth_phash_corpus_pandas(n_base=6, seed=9)
    outs = []
    for n_part in (1, 7):
        hashed = phash_images(_corpus_df(spark, corpus).repartition(n_part))
        outs.append(
            sorted(
                (r.id_a, r.id_b, r.hamming)
                for r in hamming_near_dup(hashed, max_hamming=6, n_bands=8).collect()
            )
        )
    assert outs[0] == outs[1] and len(outs[0]) > 0


def test_freq_cap_drops_hot_buckets(spark):
    # three identical hashes: every band bucket has size 3; cap=2 drops
    # them all (a pair is lost only when EVERY shared band is capped),
    # cap=3 keeps all pairs
    import pandas as pd

    px = np.arange(8 * 9 * 3, dtype=np.uint8).reshape(8, 9, 3)
    pdf = pd.DataFrame(
        {"media_id": [0, 1, 2], "payload": [bytearray(encode_bmp(px))] * 3}
    )
    hashed = phash_images(_corpus_df(spark, pdf))
    assert hamming_near_dup(hashed, freq_cap=2).count() == 0
    assert hamming_near_dup(hashed, freq_cap=3).count() == 3


def test_param_validation():
    import pytest

    class _Fake:  # noqa: D401 - never touched before the raise
        pass

    with pytest.raises(ValueError):
        hamming_near_dup(_Fake(), max_hamming=4, n_bands=4)
    with pytest.raises(ValueError):
        hamming_near_dup(_Fake(), n_bands=5)
