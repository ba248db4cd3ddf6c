"""Perceptual image dedup: difference-hash (dHash) + banded Hamming join.

The image analog of the text side's SimHash (`docdedup.simhash_pairs`):
re-encoded, re-exposed, or lightly retouched copies of an image land
within a few bits of each other under a gradient-sign hash, so
near-duplicate detection over a 100 TB image corpus reduces to an
equality join on hash *bands* — never a pixel-space or all-pairs
comparison.  The multimodal counterpart of MinHash-LSH in a training
-data pipeline: CommonPool/LAION-style image dedup before CLIP-stage
training.

The hash contract (so an independent replication can reproduce it
bit-for-bit — the stored golden in ``tools/make_goldens.py`` does):

* integer luma per pixel: ``(299·R + 587·G + 114·B) // 1000``;
* floor-sampled downscale to ``8 × 9`` (row ``r`` reads source row
  ``(r·H) // 8``, column ``c`` reads ``(c·W) // 9``) — all-integer
  index math, no float resampling;
* bit ``(r, c)`` = 1 iff ``luma[r, c+1] > luma[r, c]`` (strict);
* bits packed row-major MSB-first into 64 bits, re-interpreted as a
  SIGNED two's-complement int64 (Spark ``LongType`` has no unsigned).

Gradient *signs* are invariant to global brightness/contrast shifts
(until clipping), which is exactly the family of trivial variants a
crawl produces.

Scale shape: decode+hash is one narrow Arrow ``mapInPandas`` pass (the
payload bytes never shuffle); candidate generation explodes each hash
into ``n_bands`` disjoint bit-slices and self-joins on
``(band, value)`` — by pigeonhole, two hashes within Hamming distance
``max_hamming < n_bands`` agree on at least one band, so the banded
join is EXACT (finds every qualifying pair, unlike the probabilistic
MinHash bands), and the verify step is a JVM ``bit_count(xor)`` on the
already-joined longs.  Band width is the recall/cost dial: 4×16-bit
bands (Hamming ≤ 3) keep buckets cold on planet-scale corpora; 8×8-bit
bands (Hamming ≤ 7) trade hotter buckets for a wider radius and suit
smaller or pre-bucketed corpora.  Degenerate corpora (miles of flat
images hash to the same bands) can hot-spot a bucket: ``freq_cap``
drops bands whose bucket exceeds the cap — a pair is lost only if
EVERY band it shares is capped — mirroring the stop-shingle cap in
``docdedup.ngram_jaccard_pairs``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .multimodal import decode_image, encode_bmp, encode_png

HASH_BITS = 64
_HASH_H, _HASH_W = 8, 8


def dhash64(px: np.ndarray) -> int:
    """The dHash contract above, as one pure function over an
    ``(H, W, 3)`` uint8 array → signed int64."""
    p = px.astype(np.int64)
    gray = (299 * p[:, :, 0] + 587 * p[:, :, 1] + 114 * p[:, :, 2]) // 1000
    h, w = gray.shape
    ys = (np.arange(_HASH_H) * h) // _HASH_H
    xs = (np.arange(_HASH_W + 1) * w) // (_HASH_W + 1)
    g = gray[np.ix_(ys, xs)]
    bits = (g[:, 1:] > g[:, :-1]).reshape(-1)
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def phash_images(
    df: DataFrame,
    decoder=decode_image,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Decode each payload on the executors and emit its 64-bit dHash.

    One narrow Arrow pass — the corpus's heavy binary column is read
    exactly once and never shuffles; everything downstream of this
    operator moves 16 bytes per image.
    """

    def _batch(it):
        for pdf in it:
            hashes = np.fromiter(
                (dhash64(decoder(bytes(p))) for p in pdf[payload_col]),
                dtype=np.int64,
                count=len(pdf),
            )
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), "phash": hashes}
            )

    return df.mapInPandas(_batch, schema=f"{id_col} long, phash long")


def hamming_near_dup(
    hashed: DataFrame,
    *,
    max_hamming: int = 3,
    n_bands: int = 4,
    id_col: str = "media_id",
    hash_col: str = "phash",
    freq_cap: int | None = None,
) -> DataFrame:
    """All pairs within ``max_hamming`` bits — EXACT via banded
    equality join (requires ``max_hamming < n_bands``; pigeonhole).

    Output: ``(id_a, id_b, hamming)`` with ``id_a < id_b``.  Everything
    after the hash table is JVM-side: band slicing is unsigned shifts +
    masks, the verify is ``bit_count(xor)``.  ``freq_cap`` (optional)
    drops (band, value) buckets larger than the cap before the join —
    the documented-recall skew guard for degenerate corpora.
    """
    if HASH_BITS % n_bands:
        raise ValueError(f"n_bands must divide {HASH_BITS}, got {n_bands}")
    if not 0 <= max_hamming < n_bands:
        raise ValueError(
            f"banded join is exact only for max_hamming < n_bands "
            f"(got {max_hamming} >= {n_bands})"
        )
    wb = HASH_BITS // n_bands
    mask = (1 << wb) - 1
    bands = hashed.select(
        F.col(id_col).alias("id"),
        F.col(hash_col).alias("h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col(hash_col), b * wb)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("_b"),
    ).select("id", "h", F.col("_b.band").alias("band"), F.col("_b.val").alias("val"))
    if freq_cap is not None:
        sizes = bands.groupBy("band", "val").agg(F.count(F.lit(1)).alias("_n"))
        bands = bands.join(
            sizes.filter(F.col("_n") <= freq_cap), ["band", "val"]
        ).drop("_n")
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.h").alias("h_a"),
            F.col("b.h").alias("h_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).cast("int")
    return (
        pairs.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def synth_phash_corpus_pandas(n_base: int = 12, seed: int = 11) -> pd.DataFrame:
    """Deterministic image corpus with planted near-duplicate families.

    Per base image (random RGB, varying sizes): the BMP original, the
    SAME pixels re-encoded as PNG (the container-swap duplicate —
    Hamming 0 by construction), a +8 brightness-shifted copy (the
    re-exposed near-duplicate — gradient signs survive except where a
    channel clips), and a ±12-noise copy (the recompressed/retouched
    near-duplicate — flips the few bits whose sampled luma gradient was
    small), then ``n_base`` unrelated random images (expected pairwise
    Hamming ≈ 32 — never candidates).  The golden replays this RNG
    stream from the PRE-encoding arrays, so the gate proves
    encode → decode → hash → banded-join fidelity end-to-end.
    """
    rng = np.random.RandomState(seed)
    ids, payloads = [], []
    mid = 0
    for i in range(n_base):
        h, w = 12 + (i % 3) * 4, 16 + (i % 4) * 4
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        noise = rng.randint(-12, 13, size=px.shape)
        for payload in (
            encode_bmp(px),
            encode_png(px),
            encode_bmp(
                np.clip(px.astype(np.int16) + 8, 0, 255).astype(np.uint8)
            ),
            encode_bmp(
                np.clip(px.astype(np.int16) + noise, 0, 255).astype(np.uint8)
            ),
        ):
            ids.append(mid)
            payloads.append(bytearray(payload))
            mid += 1
    for _ in range(n_base):
        px = rng.randint(0, 256, size=(12, 16, 3), dtype=np.uint8)
        ids.append(mid)
        payloads.append(bytearray(encode_bmp(px)))
        mid += 1
    return pd.DataFrame({"media_id": ids, "payload": payloads})
