"""Self-contained ISO-BMFF (MP4) container codec — uncompressed video.

The multimodal path's video demux against a REAL container format: the
writer emits a spec-conformant ISO base-media file (ISO/IEC 14496-12 —
``ftyp``/``mdat``/``moov`` with a full sample table), the parser walks
the actual box tree and reconstructs per-sample offsets via the real
``stsc``/``stco``/``stsz`` chunk-walk algorithm.  Samples are stored as
the QuickTime/BMFF uncompressed ``raw `` video sample entry (24-bit
RGB) — a legitimate uncompressed-video coding, so no external codec
library is needed while the CONTAINER layer (the part a 100 TB frame-
sampling pipeline actually exercises: locate and slice sample byte
ranges without decoding) is the real format.

Reference analog: the reference has no media path at all — this extends
the engine for multimodal training-data pipelines (mapInPandas over
binary columns; see ``operators/multimodal.py``).
"""

from __future__ import annotations

import struct

import numpy as np

#: container boxes whose body is a sequence of child boxes
_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts"}

_MATRIX = struct.pack(
    ">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + tag + body


def _full(tag: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(tag, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + body)


def encode_mp4(frames: np.ndarray, fps: float = 25.0) -> bytes:
    """(n, h, w, 3) uint8 RGB frames → ISO-BMFF bytes (``raw `` 24-bit
    video track, movie/media timescale 1000, samples packed two per
    chunk so the parser's stsc/stco walk is genuinely exercised)."""
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w, _ = frames.shape
    samples = [frames[i].tobytes() for i in range(n)]
    sizes = [len(s) for s in samples]
    delta = int(round(1000.0 / fps))
    duration = n * delta

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    mdat_body = b"".join(samples)
    mdat_off = len(ftyp) + 8  # absolute offset of the first sample

    # chunks of 2 samples (last may hold 1)
    chunk_sizes = [min(2, n - i) for i in range(0, n, 2)]
    offsets, pos = [], mdat_off
    si = 0
    for c in chunk_sizes:
        offsets.append(pos)
        pos += sum(sizes[si : si + c])
        si += c

    stsd_entry = (
        struct.pack(">I", 86 + 0)
        + b"raw "
        + b"\x00" * 6
        + struct.pack(">H", 1)          # data_reference_index
        + b"\x00" * 16                   # pre_defined / reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)           # reserved
        + struct.pack(">H", 1)           # frame_count
        + b"\x00" * 32                   # compressorname
        + struct.pack(">Hh", 24, -1)     # depth, pre_defined
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc_entries = [(1, 2, 1)]
    if chunk_sizes and chunk_sizes[-1] == 1:
        stsc_entries.append((len(chunk_sizes), 1, 1))
    stsc = _full(
        b"stsc", 0, 0,
        struct.pack(">I", len(stsc_entries))
        + b"".join(struct.pack(">III", *e) for e in stsc_entries),
    )
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", s) for s in sizes),
    )
    stco = _full(
        b"stco", 0, 0,
        struct.pack(">I", len(offsets))
        + b"".join(struct.pack(">I", o) for o in offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    url_ = _full(b"url ", 0, 1, b"")  # flag 1: media in this file
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url_)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIIIHH", 0, 0, 1000, duration, 0x55C4, 0),
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIII", 0, 0, 1, 0)     # times, track_ID, reserved
        + struct.pack(">I", duration)
        + b"\x00" * 8                         # reserved
        + struct.pack(">HHHH", 0, 0, 0, 0)    # layer, group, volume, reserved
        + _MATRIX
        + struct.pack(">II", w << 16, h << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, 1000, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)  # rate, volume, reserved
        + b"\x00" * 8
        + _MATRIX
        + b"\x00" * 24                        # pre_defined
        + struct.pack(">I", 2),               # next_track_ID
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_body) + moov


def is_mp4(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[4:8] == b"ftyp"


def _children(payload: bytes, start: int, end: int):
    """Yield (tag, body_start, body_end) for the boxes in [start, end)."""
    pos = start
    while pos + 8 <= end:
        size, tag = struct.unpack_from(">I4s", payload, pos)
        if size == 1:  # 64-bit largesize
            size = struct.unpack_from(">Q", payload, pos + 8)[0]
            body = pos + 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
            body = pos + 8
        else:
            body = pos + 8
        if size < 8 or pos + size > end:
            raise ValueError(f"malformed box {tag!r} at {pos}")
        yield tag, body, pos + size
        pos += size


def _find(payload: bytes, start: int, end: int, path: list):
    """Descend a container path; return (body_start, body_end) or None."""
    if not path:
        return start, end
    for tag, b, e in _children(payload, start, end):
        if tag == path[0]:
            got = _find(payload, b, e, path[1:])
            if got is not None:
                return got
    return None


def parse_mp4(payload: bytes) -> dict:
    """Walk the box tree of a video ISO-BMFF file → sample table.

    Returns ``{timescale, width, height, fourcc, depth, frames}`` where
    ``frames`` is a list of ``(idx, t_units, offset, size)`` computed by
    the real stsc/stco chunk walk (per-chunk sample runs, cumulative
    intra-chunk offsets) and stts delta accumulation.
    """
    if not is_mp4(payload):
        raise ValueError("not an ISO-BMFF payload")
    end = len(payload)
    # locate the video trak: any trak whose hdlr handler_type is 'vide'
    moov = _find(payload, 0, end, [b"moov"])
    if moov is None:
        raise ValueError("no moov box")
    stbl = None
    timescale = 1000
    for tag, b, e in _children(payload, *moov):
        if tag != b"trak":
            continue
        mdia = _find(payload, b, e, [b"mdia"])
        if mdia is None:
            continue
        hdlr = _find(payload, *mdia, [b"hdlr"])
        if hdlr is None or payload[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        mdhd = _find(payload, *mdia, [b"mdhd"])
        if mdhd is not None:
            version = payload[mdhd[0]]
            timescale = struct.unpack_from(
                ">I", payload, mdhd[0] + (20 if version else 12)
            )[0]
        stbl = _find(payload, *mdia, [b"minf", b"stbl"])
        break
    if stbl is None:
        raise ValueError("no video track")

    boxes = {tag: (b, e) for tag, b, e in _children(payload, *stbl)}
    for need in (b"stsd", b"stts", b"stsc", b"stsz", b"stco"):
        if need not in boxes:
            raise ValueError(f"missing {need!r}")

    sb = boxes[b"stsd"][0] + 8  # skip fullbox header + entry_count
    entry_size = struct.unpack_from(">I", payload, sb)[0]
    fourcc = payload[sb + 4 : sb + 8].decode("ascii", "replace")
    width, height = struct.unpack_from(">HH", payload, sb + 32)
    depth = struct.unpack_from(">H", payload, sb + 82)[0] if entry_size >= 84 else 24

    b = boxes[b"stts"][0] + 4
    (n_runs,) = struct.unpack_from(">I", payload, b)
    deltas = []
    for i in range(n_runs):
        cnt, dlt = struct.unpack_from(">II", payload, b + 4 + 8 * i)
        deltas.extend([dlt] * cnt)

    b = boxes[b"stsz"][0] + 4
    uniform, n_samples = struct.unpack_from(">II", payload, b)
    if uniform:
        sizes = [uniform] * n_samples
    else:
        sizes = list(struct.unpack_from(f">{n_samples}I", payload, b + 8))

    b = boxes[b"stco"][0] + 4
    (n_chunks,) = struct.unpack_from(">I", payload, b)
    chunk_offs = list(struct.unpack_from(f">{n_chunks}I", payload, b + 4))

    b = boxes[b"stsc"][0] + 4
    (n_sc,) = struct.unpack_from(">I", payload, b)
    sc = [struct.unpack_from(">III", payload, b + 4 + 12 * i) for i in range(n_sc)]

    # the chunk walk: expand stsc runs over the stco chunk list
    frames, t, si = [], 0, 0
    for run_i, (first_chunk, per_chunk, _desc) in enumerate(sc):
        last_chunk = (
            sc[run_i + 1][0] - 1 if run_i + 1 < len(sc) else n_chunks
        )
        for ci in range(first_chunk - 1, last_chunk):
            pos = chunk_offs[ci]
            for _ in range(per_chunk):
                if si >= n_samples:
                    break
                frames.append((si, t, pos, sizes[si]))
                pos += sizes[si]
                t += deltas[si] if si < len(deltas) else 0
                si += 1
    return {
        "timescale": timescale,
        "width": width,
        "height": height,
        "fourcc": fourcc,
        "depth": depth,
        "frames": frames,
    }


def decode_mp4(payload: bytes) -> np.ndarray:
    """Uncompressed ``raw `` RGB24 BMFF video → (n, h, w, 3) uint8."""
    info = parse_mp4(payload)
    if info["fourcc"] != "raw " or info["depth"] != 24:
        raise ValueError(f"unsupported coding {info['fourcc']!r}/{info['depth']}")
    h, w = info["height"], info["width"]
    out = np.empty((len(info["frames"]), h, w, 3), dtype=np.uint8)
    for idx, _t, off, size in info["frames"]:
        if size != h * w * 3:
            raise ValueError(f"sample {idx} size {size} != {h * w * 3}")
        out[idx] = np.frombuffer(payload, np.uint8, size, off).reshape(h, w, 3)
    return out
