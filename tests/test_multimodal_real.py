

# ---------------------------------------------------------------------------
# round 3: PNG codec (stdlib zlib) + magic dispatch + JPEG degradation


def _png_with_filters(px, filters):
    """Independent PNG writer that FILTERS rows per the public spec
    (types 0-4) — exercises decode_png's unfilter paths, which our own
    encoder (always filter 0) cannot."""
    import struct
    import zlib

    import numpy as np

    h, w, ch = px.shape
    stride = w * ch
    flat = px.astype(np.int32).reshape(h, stride)
    raw = bytearray()
    for y in range(h):
        ft = filters[y % len(filters)]
        raw.append(ft)
        prior = flat[y - 1] if y else np.zeros(stride, np.int32)
        for x in range(stride):
            a = flat[y][x - ch] if x >= ch else 0
            b = prior[x]
            c = prior[x - ch] if x >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            raw.append((int(flat[y][x]) - pred) & 0xFF)

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))


def test_png_roundtrip_and_all_filters():
    import numpy as np

    from napalm_logs_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.RandomState(9)
    px = rng.randint(0, 256, size=(11, 7, 3), dtype=np.uint8)
    assert (decode_png(encode_png(px)) == px).all()
    # every spec filter type must unfilter back to the same pixels
    for filters in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        wire = _png_with_filters(px, filters)
        assert (decode_png(wire) == px).all(), filters


def test_image_magic_dispatch_and_jpeg_degradation():
    import numpy as np
    import pytest

    from napalm_logs_spark.operators.multimodal import (
        decode_image,
        encode_bmp,
        encode_png,
        real_resizer,
    )

    px = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    assert (decode_image(encode_bmp(px)) == px).all()
    assert (decode_image(encode_png(px)) == px).all()
    # resize keeps the input's container: PNG in -> PNG out
    out = real_resizer(encode_png(px), 4, 6, 2, 3)
    assert bytes(out[:8]) == b"\x89PNG\r\n\x1a\n"
    assert decode_image(out).shape == (3, 2, 3)
    out = real_resizer(encode_bmp(px), 4, 6, 2, 3)
    assert bytes(out[:2]) == b"BM"
    # JPEG is decoded by the built-in baseline codec even without
    # pillow (full round-trip/fidelity coverage lives in test_jpeg);
    # a JPEG-magic payload with no SOF/SOS still fails loudly
    from napalm_logs_spark.operators.jpegcodec import encode_jpeg

    jout = decode_image(encode_jpeg(px, 95))
    assert jout.shape == px.shape
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 16)
    with pytest.raises(ValueError, match="unrecognized"):
        decode_image(b"GIF89a......")


def test_real_features_png_equal_bmp(spark):
    """Same pixels through the PNG container must produce byte-identical
    features to the BMP container (the golden is codec-independent)."""
    from napalm_logs_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        real_media_decoder,
        synth_real_media_pandas,
    )

    a = spark.createDataFrame(
        synth_real_media_pandas(n=12), schema=MEDIA_SCHEMA)
    b = spark.createDataFrame(
        synth_real_media_pandas(n=12, png_images=True), schema=MEDIA_SCHEMA)
    fa = {r.media_id: r for r in extract_features(a, decoder=real_media_decoder).collect()}
    fb = {r.media_id: r for r in extract_features(b, decoder=real_media_decoder).collect()}
    assert fa.keys() == fb.keys()
    for k in fa:
        assert fa[k].features == fb[k].features, k
    # and the PNG rows really are PNG
    mimes = {r.media_id: r.mime for r in b.select("media_id", "mime").collect()}
    assert "image/png" in set(mimes.values())


def test_audio_gates_verdicts(spark):
    import numpy as np
    import pandas as pd

    from napalm_logs_spark.operators.multimodal import (
        audio_quality_gates,
        encode_wav,
        synth_audio_corpus_pandas,
    )

    corpus = spark.createDataFrame(
        synth_audio_corpus_pandas(n=12, seed=13),
        schema="media_id long, payload binary",
    )
    rows = {r.media_id: r for r in audio_quality_gates(corpus).collect()}
    # synth families: i%4 == 0 clean sine, 1 near-silence, 2 clipped, 3 noise
    for i, r in rows.items():
        fam = i % 4
        assert r.is_silence == (fam == 1), (i, r)
        assert r.is_clipped == (fam == 2), (i, r)
        assert r.keep == (fam in (0, 3)), (i, r)
        assert r.peak >= 0 and r.sum_sq >= 0 and r.n_zero_cross >= 0

    # edge cases: empty audio and exact-zero (DC) audio
    edge = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [100, 101],
                "payload": [
                    bytearray(encode_wav(np.zeros(0, dtype=np.int16))),
                    bytearray(encode_wav(np.zeros(400, dtype=np.int16))),
                ],
            }
        ),
        schema="media_id long, payload binary",
    )
    e = {r.media_id: r for r in audio_quality_gates(edge).collect()}
    assert e[100].n_samples == 0 and not e[100].keep
    assert e[101].is_silence and e[101].rms_x1000 == 0 and not e[101].keep


def test_audio_gates_integer_contract(spark):
    # rms_x1000 must be the floor integer sqrt of (sum_sq*1e6)//n —
    # cross-check one row against direct math on the decoded samples
    import math

    import numpy as np

    import pandas as pd

    from napalm_logs_spark.operators.multimodal import (
        audio_quality_gates,
        decode_wav,
        synth_audio_corpus_pandas,
    )

    pdf = synth_audio_corpus_pandas(n=4, seed=13)
    x, _ = decode_wav(bytes(pdf.payload[0]))
    s = x.astype(np.int64)
    want = math.isqrt(int((s * s).sum()) * 1_000_000 // s.size)
    got = (
        audio_quality_gates(
            spark.createDataFrame(pdf, schema="media_id long, payload binary")
        )
        .filter("media_id = 0")
        .collect()[0]
    )
    assert got.rms_x1000 == want
    assert got.sum_sq == int((s * s).sum())
