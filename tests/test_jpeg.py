"""Baseline JPEG codec tests (pure numpy/stdlib, no image library).

Round-trip fidelity of the 4:4:4 encoder, plus hand-crafted baseline
streams for the decoder paths our encoder never emits: 4:2:0 chroma
subsampling, grayscale, DRI/RSTn restart intervals, and 16-bit DQT
precision.  Reference parity note: napalm-logs has no media path —
this family is the training-data-pipeline addendum (SURVEY.md §2.7).
"""
import struct

import numpy as np
import pytest

from napalm_logs_spark.operators.jpegcodec import (
    AC_CHROMA_BITS,
    AC_CHROMA_VALS,
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_CHROMA_BITS,
    DC_CHROMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    ZIGZAG,
    _BitWriter,
    _canonical_codes,
    _quality_tables,
    _rgb_to_ycbcr,
    decode_jpeg,
    encode_jpeg,
)


def _err(a, b):
    return np.abs(a.astype(int) - b.astype(int))


# --- encoder round trips ----------------------------------------------------

def test_flat_color_roundtrip_exact():
    px = np.full((16, 24, 3), (200, 30, 90), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, 95))
    assert out.shape == px.shape
    assert _err(out, px).max() <= 1


def test_gradient_roundtrip_close_nonmultiple_of_8():
    h, w = 21, 37  # forces edge-replication padding + crop
    yy, xx = np.mgrid[0:h, 0:w]
    px = np.stack([(yy * 7) % 256, (xx * 5) % 256, ((yy + xx) * 3) % 256], -1)
    px = (px.astype(float) * 0.4 + 100).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(px, 95))
    assert out.shape == (h, w, 3)
    assert _err(out, px).mean() < 1.5
    assert _err(out, px).max() <= 5


def test_noise_roundtrip_tolerance_and_quality_monotonic():
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
    sizes = {}
    for q in (30, 75, 95):
        b = encode_jpeg(px, q)
        sizes[q] = len(b)
        out = decode_jpeg(b)
        assert out.shape == px.shape
    # white noise is JPEG's worst case; q95 must still track closely
    assert _err(decode_jpeg(encode_jpeg(px, 95)), px).mean() < 8
    assert sizes[30] < sizes[75] < sizes[95]


def test_encode_deterministic_and_wellformed():
    rng = np.random.RandomState(1)
    px = rng.randint(0, 256, (8, 8, 3), dtype=np.uint8)
    b1, b2 = encode_jpeg(px, 75), encode_jpeg(px, 75)
    assert b1 == b2
    assert b1[:3] == b"\xff\xd8\xff" and b1[-2:] == b"\xff\xd9"
    assert b"\xff\xc0" in b1  # SOF0 baseline


def test_encoder_rejects_bad_input():
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((0, 4, 3), dtype=np.uint8))


def test_decoder_rejects_progressive_and_truncation():
    px = np.full((8, 8, 3), 128, dtype=np.uint8)
    b = bytearray(encode_jpeg(px, 75))
    i = bytes(b).index(b"\xff\xc0")
    b[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(b))
    with pytest.raises(ValueError):
        decode_jpeg(encode_jpeg(px, 75)[:40])
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")


# --- hand-crafted streams for decoder-only paths ----------------------------

_H = {
    "dcl": _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),
    "acl": _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS),
    "dcc": _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS),
    "acc": _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS),
}


def _seg(marker, body):
    return struct.pack(">HH", marker, len(body) + 2) + body


def _headers(h, w, comps, qt16=False):
    """SOI..SOS headers for hand-built streams.  ``comps`` is a list of
    (comp_id, hsamp, vsamp, qtbl_id).  qt16 emits 16-bit DQT bodies."""
    qt_l, qt_c = _quality_tables(90)

    def dqt(tid, tbl):
        z = tbl.reshape(-1)[ZIGZAG]
        if qt16:
            return _seg(0xFFDB, bytes([0x10 | tid])
                        + b"".join(struct.pack(">H", int(v)) for v in z))
        return _seg(0xFFDB, bytes([tid]) + bytes(int(v) for v in z))

    def dht(cls, tid, bits, vals):
        return _seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    sof = _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, len(comps))
               + b"".join(bytes([cid, (hs << 4) | vs, tq])
                          for cid, hs, vs, tq in comps))
    sos = _seg(0xFFDA, bytes([len(comps)])
               + b"".join(bytes([cid, 0x00 if tq == 0 else 0x11])
                          for cid, _, _, tq in comps)
               + bytes([0, 63, 0]))
    return (b"\xff\xd8" + dqt(0, qt_l) + dqt(1, qt_c)
            + dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
            + dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
            + dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
            + dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS), sof, sos)


def _emit_dc_block(bw, diff, dc_tbl, ac_tbl):
    size = int(abs(diff)).bit_length()
    code, ln = dc_tbl[size]
    bw.put(code, ln)
    if size:
        bw.put(diff if diff > 0 else diff + (1 << size) - 1, size)
    code, ln = ac_tbl[0x00]  # EOB: DC-only block
    bw.put(code, ln)


def _flat_dc(rgb):
    """Quantized DC values (Y, Cb, Cr) of a flat-color 8x8 block."""
    ycc = _rgb_to_ycbcr(np.array(rgb, dtype=np.float64)) - 128.0
    qt_l, qt_c = _quality_tables(90)
    qs = (qt_l[0, 0], qt_c[0, 0], qt_c[0, 0])
    return [int(np.round(8.0 * c / q)) for c, q in zip(ycc, qs)]


def _expected_flat(rgb):
    """What a DC-only decode of that flat color reproduces (quant loss)."""
    from napalm_logs_spark.operators.jpegcodec import _ycbcr_to_rgb

    ycc = _rgb_to_ycbcr(np.array(rgb, dtype=np.float64)) - 128.0
    qt_l, qt_c = _quality_tables(90)
    qs = (qt_l[0, 0], qt_c[0, 0], qt_c[0, 0])
    rec = [np.round(8.0 * c / q) * q / 8.0 + 128.0 for c, q in zip(ycc, qs)]
    one = np.ones((1, 1))
    return _ycbcr_to_rgb(rec[0] * one, rec[1] * one, rec[2] * one)[0, 0]


def test_decode_420_subsampled_stream():
    # 16x16 flat color, 4:2:0: one MCU = 4 Y blocks + 1 Cb + 1 Cr
    rgb = (180, 60, 25)
    dc_y, dc_cb, dc_cr = _flat_dc(rgb)
    head, sof, sos = _headers(16, 16, [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)])
    bw = _BitWriter()
    for k in range(4):  # Y blocks: first carries the DC, rest diff=0
        _emit_dc_block(bw, dc_y if k == 0 else 0, _H["dcl"], _H["acl"])
    _emit_dc_block(bw, dc_cb, _H["dcc"], _H["acc"])
    _emit_dc_block(bw, dc_cr, _H["dcc"], _H["acc"])
    out = decode_jpeg(head + sof + sos + bw.flush() + b"\xff\xd9")
    assert out.shape == (16, 16, 3)
    exp = _expected_flat(rgb)
    assert _err(out, np.broadcast_to(exp, out.shape)).max() <= 1
    assert _err(out, np.full_like(out, rgb)).max() <= 3  # quant loss bound


def test_decode_422_subsampled_stream():
    # 16x8 flat color, 4:2:2: one MCU = 2 Y blocks + 1 Cb + 1 Cr
    rgb = (40, 120, 220)
    dc_y, dc_cb, dc_cr = _flat_dc(rgb)
    head, sof, sos = _headers(8, 16, [(1, 2, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)])
    bw = _BitWriter()
    for k in range(2):
        _emit_dc_block(bw, dc_y if k == 0 else 0, _H["dcl"], _H["acl"])
    _emit_dc_block(bw, dc_cb, _H["dcc"], _H["acc"])
    _emit_dc_block(bw, dc_cr, _H["dcc"], _H["acc"])
    out = decode_jpeg(head + sof + sos + bw.flush() + b"\xff\xd9")
    assert out.shape == (8, 16, 3)
    assert _err(out, np.full_like(out, rgb)).max() <= 3


def test_decode_grayscale_stream():
    head, sof, sos = _headers(8, 8, [(1, 1, 1, 0)])
    qt_l, _ = _quality_tables(90)
    dc = int(np.round(8.0 * (77.0 - 128.0) / qt_l[0, 0]))  # gray level 77
    bw = _BitWriter()
    _emit_dc_block(bw, dc, _H["dcl"], _H["acl"])
    out = decode_jpeg(head + sof + sos + bw.flush() + b"\xff\xd9")
    assert out.shape == (8, 8, 3)
    # replicated channels, near the requested gray
    assert (out[..., 0] == out[..., 1]).all() and (out[..., 1] == out[..., 2]).all()
    assert abs(int(out[0, 0, 0]) - 77) <= 3


def test_decode_restart_markers_reset_dc_predictors():
    # 8x16 flat color, 4:4:4, DRI=1: RST0 between the two MCUs; the
    # second MCU's DC is absolute again (predictor reset), so a decoder
    # that fails to reset would render a doubled DC in the right half.
    rgb = (90, 200, 140)
    dc_y, dc_cb, dc_cr = _flat_dc(rgb)
    head, sof, sos = _headers(8, 16, [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)])
    dri = _seg(0xFFDD, struct.pack(">H", 1))

    def mcu_bytes():
        bw = _BitWriter()
        _emit_dc_block(bw, dc_y, _H["dcl"], _H["acl"])
        _emit_dc_block(bw, dc_cb, _H["dcc"], _H["acc"])
        _emit_dc_block(bw, dc_cr, _H["dcc"], _H["acc"])
        return bw.flush()

    scan = mcu_bytes() + b"\xff\xd0" + mcu_bytes()
    out = decode_jpeg(head + dri + sof + sos + scan + b"\xff\xd9")
    assert out.shape == (8, 16, 3)
    assert _err(out, np.full_like(out, rgb)).max() <= 3
    # both halves identical — the predictor really was reset
    assert (out[:, :8] == out[:, 8:]).all()


def test_decode_16bit_dqt():
    rgb = (10, 250, 66)
    dc_y, dc_cb, dc_cr = _flat_dc(rgb)
    head, sof, sos = _headers(8, 8, [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)],
                              qt16=True)
    bw = _BitWriter()
    _emit_dc_block(bw, dc_y, _H["dcl"], _H["acl"])
    _emit_dc_block(bw, dc_cb, _H["dcc"], _H["acc"])
    _emit_dc_block(bw, dc_cr, _H["dcc"], _H["acc"])
    out = decode_jpeg(head + sof + sos + bw.flush() + b"\xff\xd9")
    assert _err(out, np.full_like(out, rgb)).max() <= 3


# --- integration with the multimodal decode path ----------------------------

def test_decode_image_dispatches_jpeg_without_pillow():
    from napalm_logs_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, (12, 20, 3), dtype=np.uint8)
    out = decode_image(encode_jpeg(px, 95))
    assert out.shape == px.shape
    assert _err(out, px).mean() < 8


def test_real_media_decoder_jpeg_feature_fidelity():
    from napalm_logs_spark.operators.multimodal import real_media_decoder

    rng = np.random.RandomState(4)
    px = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    feats = real_media_decoder("image", encode_jpeg(px, 95))
    # mean R/G/B within 2 levels of the pre-encoding truth, w/h exact
    truth = px.reshape(-1, 3).mean(axis=0)
    assert np.abs(feats[:3] - truth).max() < 2.0
    assert feats[4] == 16 and feats[5] == 16


def test_real_resizer_jpeg_reencodes_lossless_png():
    from napalm_logs_spark.operators.multimodal import (
        PNG_MAGIC,
        decode_image,
        real_resizer,
    )

    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    out = real_resizer(encode_jpeg(px, 95), 16, 16, 8, 8)
    assert bytes(out[:8]) == PNG_MAGIC
    assert decode_image(out).shape == (8, 8, 3)


def test_synth_real_media_jpeg_mode_roundtrips():
    from napalm_logs_spark.operators.multimodal import (
        real_media_decoder,
        synth_real_media_pandas,
    )

    pdf = synth_real_media_pandas(n=36, jpeg_images=True)
    mimes = set(pdf[pdf["kind"] == "image"]["mime"])
    assert mimes == {"image/bmp", "image/png", "image/jpeg"}
    for _, row in pdf.iterrows():
        feats = real_media_decoder(row["kind"], bytes(row["payload"]))
        assert np.isfinite(feats).all()
