"""Self-contained baseline JPEG codec (pure numpy + stdlib).

Implements the public ITU-T T.81 baseline-sequential profile so the
multimodal decode path (reference parity target: napalm-logs has no
media path at all — this family is the training-data-pipeline addendum,
see ``multimodal.py``) works without any external image library:

- ``encode_jpeg``: 8-bit RGB → baseline JFIF bytes.  4:4:4 (no chroma
  subsampling), Annex-K quantization tables scaled by the libjpeg
  quality formula, Annex-K "typical" Huffman tables, vectorized DCT /
  quantization across all blocks (numpy matmul); only the entropy
  coder is a per-coefficient python loop.
- ``decode_jpeg``: baseline (SOF0/SOF1) JFIF/EXIF bytes → (h, w, 3)
  uint8 RGB.  Generic per-component sampling factors (4:4:4, 4:2:0,
  4:2:2, grayscale), multiple DQT/DHT segments, 16-bit quant tables,
  DRI/RSTn restart markers, byte unstuffing.  Raises with a clear
  message on progressive (SOF2) / arithmetic / hierarchical streams.

Chroma upsampling is nearest-neighbor (block replication) — fidelity
tests gate on feature-level tolerance, not bit-parity with libjpeg.
Throughput note: the entropy coder is python-looped per coefficient;
fine for the fixture-sized payloads this engine decodes in tests, and
executor-parallel (one image per row inside mapInPandas) at scale —
the loop is per-image, never per-corpus.

All tables below are verbatim public constants from ITU-T T.81
Annex K (the JPEG specification), not from any proprietary source.
"""
from __future__ import annotations

import struct

import numpy as np

# --- ITU-T T.81 Annex K constants -----------------------------------------

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# (bits-per-length[1..16], symbol values) — Annex K "typical" tables
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8x8 DCT-II basis: fwd = M @ B @ M.T, inv = M.T @ C @ M
_K = np.arange(8).reshape(8, 1)
_N = np.arange(8).reshape(1, 8)
DCT_M = np.sqrt(2.0 / 8.0) * np.cos((2 * _N + 1) * _K * np.pi / 16.0)
DCT_M[0, :] = np.sqrt(1.0 / 8.0)


def _canonical_codes(bits, vals):
    """Canonical Huffman assignment (T.81 C.2): codes in value order,
    lengths ascending.  Returns {symbol: (code, length)}."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _quality_tables(quality: int):
    """libjpeg-style quality scaling of the Annex-K base tables."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y, cb, cr):
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1
            self.buf.append(byte)
            if byte == 0xFF:            # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)   # pad with 1-bits
        return bytes(self.buf)


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane (H, W multiples of 8) → (n, 8, 8) blocks in
    raster order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _magnitude(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def encode_jpeg(pixels: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF JPEG bytes (4:4:4)."""
    px = np.asarray(pixels)
    if px.ndim != 3 or px.shape[2] != 3 or px.dtype != np.uint8:
        raise ValueError("encode_jpeg expects (h, w, 3) uint8 RGB")
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qt_luma, qt_chroma = _quality_tables(quality)

    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8  # edge-replicate pad
    padded = np.empty((ph, pw, 3), dtype=np.float64)
    padded[:h, :w] = px
    padded[h:, :w] = px[-1:, :]
    padded[:, w:] = padded[:, w - 1 : w]
    ycc = _rgb_to_ycbcr(padded) - 128.0

    huff = {
        "dcl": _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),
        "acl": _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS),
        "dcc": _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS),
        "acc": _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS),
    }
    zz = ZIGZAG
    # vectorized DCT + quantization per component, zigzagged
    comp_coeffs = []
    for c in range(3):
        blocks = _blocks_of(ycc[..., c])
        coeffs = np.einsum("ij,njk,lk->nil", DCT_M, blocks, DCT_M)
        qt = qt_luma if c == 0 else qt_chroma
        quant = np.round(coeffs / qt).astype(np.int32)
        comp_coeffs.append(quant.reshape(-1, 64)[:, zz])

    bw = _BitWriter()
    pred = [0, 0, 0]
    n_blocks = comp_coeffs[0].shape[0]
    for b in range(n_blocks):          # 4:4:4 → one block per comp per MCU
        for c in range(3):
            dc_tbl = huff["dcl"] if c == 0 else huff["dcc"]
            ac_tbl = huff["acl"] if c == 0 else huff["acc"]
            blk = comp_coeffs[c][b]
            diff = int(blk[0]) - pred[c]
            pred[c] = int(blk[0])
            size = _magnitude(diff)
            code, ln = dc_tbl[size]
            bw.put(code, ln)
            if size:
                bw.put(diff if diff > 0 else diff + (1 << size) - 1, size)
            run = 0
            nz = np.nonzero(blk[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            for k in range(1, last + 1):
                v = int(blk[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_tbl[0xF0]   # ZRL
                    bw.put(code, ln)
                    run -= 16
                size = _magnitude(v)
                code, ln = ac_tbl[(run << 4) | size]
                bw.put(code, ln)
                bw.put(v if v > 0 else v + (1 << size) - 1, size)
                run = 0
            if last < 63:
                code, ln = ac_tbl[0x00]       # EOB
                bw.put(code, ln)
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid: int, table: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(table.reshape(-1)[zz].tolist()))

    def dht(cls: int, tid: int, bits, vals) -> bytes:
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    app0 = seg(0xFFE0, b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HHBB", 1, 1, 0, 0))
    sof0 = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x11, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]),
    )
    sos = seg(
        0xFFDA,
        bytes([3]) + bytes([1, 0x00]) + bytes([2, 0x11]) + bytes([3, 0x11])
        + bytes([0, 63, 0]),
    )
    return (
        b"\xff\xd8" + app0
        + dqt(0, qt_luma) + dqt(1, qt_chroma)
        + dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        + dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        + dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
        + sof0 + sos + scan + b"\xff\xd9"
    )


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    real marker and reports RSTn so the MCU loop can reset predictors."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None

    def _fill(self) -> bool:
        d, p = self.data, self.pos
        if p >= len(d):
            return False
        byte = d[p]
        if byte == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos = p + 2
            else:
                self.marker = nxt
                return False
            byte = 0xFF
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8
        return True

    def read(self, n: int) -> int:
        while self.nbits < n:
            if not self._fill():
                raise ValueError("truncated JPEG entropy segment")
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_huff(self, table: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")

    def restart(self) -> None:
        """Consume an RSTn marker and byte-align."""
        self.acc = 0
        self.nbits = 0
        m = self.marker
        if m is None or not (0xD0 <= m <= 0xD7):
            raise ValueError("expected JPEG restart marker")
        self.marker = None
        self.pos += 2   # skip FF Dn


def _decode_table(bits, vals) -> dict:
    """{(length, code): symbol} for the bit-at-a-time reader."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if v < (1 << (size - 1)) else v


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w, 3) uint8 RGB (grayscale replicated)."""
    d = bytes(payload)
    if d[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple, dict] = {}
    comps = None        # [(cid, h, v, tq)]
    hh = ww = None
    restart_interval = 0
    scan_map = None     # cid -> (dc_table_id, ac_table_id)
    while pos < len(d):
        if d[pos] != 0xFF:
            pos += 1
            continue
        if pos + 1 >= len(d):
            raise ValueError("truncated JPEG (dangling 0xFF at end of header)")
        marker = d[pos + 1]
        if marker == 0xFF:          # spec-legal fill byte (T.81 B.1.1.2)
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        if pos + 4 > len(d):
            raise ValueError("truncated JPEG (marker without length field)")
        (ln,) = struct.unpack_from(">H", d, pos + 2)
        body = d[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:              # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq:
                    t = np.frombuffer(body, ">u2", 64, i).astype(np.int32)
                    i += 128
                else:
                    t = np.frombuffer(body, np.uint8, 64, i).astype(np.int32)
                    i += 64
                full = np.zeros(64, np.int32)
                full[ZIGZAG] = t
                qtables[tq] = full.reshape(8, 8)
        elif marker == 0xC4:            # DHT (possibly several tables)
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                htables[(cls, tid)] = _decode_table(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1):    # SOF0 baseline / SOF1 ext-seq
            _prec, hh, ww, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "unsupported JPEG flavor (progressive/arithmetic/"
                "hierarchical) — only baseline sequential is built in"
            )
        elif marker == 0xDD:            # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:            # SOS: entropy data follows
            ns = body[0]
            scan_map = {}
            for c in range(ns):
                cid, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan_map[cid] = (tt >> 4, tt & 0xF)
            pos = pos + 2 + ln
            break
        pos += 2 + ln
    if comps is None or scan_map is None:
        raise ValueError("JPEG without SOF/SOS")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (ww + 8 * hmax - 1) // (8 * hmax)
    mcuy = (hh + 8 * vmax - 1) // (8 * vmax)
    planes = {
        cid: np.zeros((mcuy * v * 8, mcux * h * 8), np.float64)
        for cid, h, v, _ in comps
    }
    br = _BitReader(d, pos)
    pred = {cid: 0 for cid, *_ in comps}
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                while br.marker is None and br._fill():
                    pass                 # drain padding bits to the marker
                br.restart()
                pred = {cid: 0 for cid, *_ in comps}
            n_mcu += 1
            for cid, ch, cv, tq in comps:
                dc_t = htables[(0, scan_map[cid][0])]
                ac_t = htables[(1, scan_map[cid][1])]
                qt = qtables[tq]
                for by in range(cv):
                    for bx in range(ch):
                        zz = np.zeros(64, np.int32)
                        size = br.read_huff(dc_t)
                        diff = _extend(br.read(size), size) if size else 0
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = br.read_huff(ac_t)
                            if rs == 0x00:      # EOB
                                break
                            if rs == 0xF0:      # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 0xF
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = _extend(br.read(size), size)
                            k += 1
                        blk = np.zeros(64, np.float64)
                        blk[ZIGZAG] = zz * qt.reshape(-1)[ZIGZAG]
                        sp = DCT_M.T @ blk.reshape(8, 8) @ DCT_M + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = sp
    # upsample to full resolution and crop
    full = []
    for cid, ch, cv, _ in comps:
        p = planes[cid]
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        full.append(p[:hh, :ww])
    if len(full) == 1:
        y = np.clip(full[0].round(), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    if len(full) != 3:
        raise ValueError(f"unsupported JPEG component count {len(full)}")
    return _ycbcr_to_rgb(full[0], full[1], full[2])
