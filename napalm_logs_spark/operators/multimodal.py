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


# ---------------------------------------------------------------------------
# REAL codecs for uncompressed formats (pure stdlib + numpy — no PIL/
# librosa/ffmpeg needed).  This is the genuinely-working half of the
# decode surface: BMP images, PCM WAV audio, and a trivial raw-frame
# video container; the `default_decoder` stub above remains only for
# COMPRESSED codecs (png/jpeg/mp3/mp4), which need external libraries.

import io
import struct
import wave


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP bytes."""
    h, w, _ = pixels.shape
    row_pad = (-(w * 3)) % 4
    img_size = (w * 3 + row_pad) * h
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", 54 + img_size, 0, 0, 54,
        40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0,
    )
    # BMP stores rows bottom-up, BGR order
    body = bytearray()
    for y in range(h - 1, -1, -1):
        body += pixels[y, :, ::-1].tobytes() + b"\x00" * row_pad
    return header + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → (h, w, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    if bpp != 24:
        raise ValueError(f"only 24-bit BMP supported, got {bpp}")
    row_pad = (-(w * 3)) % 4
    out = np.empty((abs(h), w, 3), dtype=np.uint8)
    stride = w * 3 + row_pad
    for i in range(abs(h)):
        y = (abs(h) - 1 - i) if h > 0 else i
        row = np.frombuffer(payload, dtype=np.uint8, count=w * 3, offset=off + i * stride)
        out[y] = row.reshape(w, 3)[:, ::-1]
    return out


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples → PCM WAV bytes (stdlib `wave`)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple:
    """PCM WAV bytes → (int16 samples, rate)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        n = wf.getnframes()
        data = np.frombuffer(wf.readframes(n), dtype="<i2")
        return data, wf.getframerate()


#: trivial raw-frame video container: magic, n_frames, h, w, then
#: n_frames × (h×w×3) uint8 RGB frames.  A documented toy format — the
#: point is exercising the REAL decode→frame-sample→feature pipeline
#: shape without an ffmpeg dependency.
NLV_MAGIC = b"NLV1"


def encode_nlv(frames: np.ndarray) -> bytes:
    n, h, w, _ = frames.shape
    return NLV_MAGIC + struct.pack("<III", n, h, w) + frames.astype(np.uint8).tobytes()


def decode_nlv(payload: bytes) -> np.ndarray:
    if payload[:4] != NLV_MAGIC:
        raise ValueError("not an NLV payload")
    n, h, w = struct.unpack_from("<III", payload, 4)
    return np.frombuffer(payload, dtype=np.uint8, offset=16).reshape(n, h, w, 3)


# --- PNG: full stdlib codec (zlib + struct; the public PNG spec) ----------

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
JPEG_MAGIC = b"\xff\xd8\xff"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 8-bit truecolor PNG bytes (filter 0 rows,
    stdlib zlib — no image library needed)."""
    h, w = pixels.shape[:2]
    import zlib

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y].astype(np.uint8).tobytes() for y in range(h)
    )
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """8-bit truecolor(+alpha) non-interlaced PNG → (h, w, 3) uint8 RGB.
    Implements the spec's five scanline filters (None/Sub/Up/Average/
    Paeth); alpha is dropped.  Raises on other PNG flavors."""
    import zlib

    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = bytearray()
    while pos < len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or ctype not in (2, 6) or inter != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={ctype} "
                    f"interlace={inter}); only 8-bit RGB/RGBA supported"
                )
            ch = 3 if ctype == 2 else 4
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG without IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.int32)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.int32)
        prior = out[y - 1] if y else np.zeros(stride, np.int32)
        if ft == 0:
            out[y] = line
        elif ft == 2:                       # Up
            out[y] = (line + prior) & 0xFF
        elif ft == 1:                       # Sub: per-lane prefix sum
            for lane in range(ch):
                out[y, lane::ch] = np.cumsum(line[lane::ch]) & 0xFF
        elif ft in (3, 4):                  # Average / Paeth
            cur = out[y]
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prior[x]
                c = prior[x - ch] if x >= ch else 0
                if ft == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ft}")
    px = out.astype(np.uint8).reshape(h, w, ch)
    return px[:, :, :3]


def _pil_image():  # optional JPEG decoder, probed like the Kafka jar
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-dispatched image decode: BMP, PNG and baseline JPEG are
    all decoded by self-contained codecs (``jpegcodec.decode_jpeg``
    implements the ITU-T T.81 baseline profile incl. 4:2:0/4:2:2
    sampling, DRI restarts and grayscale) — no external image library
    is required for any of the three containers.

    When pillow IS installed its C decoders are preferred for PNG and
    JPEG automatically (faster, and it also covers progressive JPEG,
    which the built-in baseline decoder rejects by design); the stdlib
    paths keep the engine fully functional without it.  PNG throughput
    note: the stdlib codec unfilters Average/Paeth rows (filter types
    3/4, common in externally-produced PNGs) in a python loop —
    correct but slow for large images."""
    head = bytes(payload[:8])
    if head[:2] == b"BM":
        return decode_bmp(payload)
    if head == PNG_MAGIC or head[:3] == JPEG_MAGIC:
        Image = _pil_image()
        if Image is not None:
            import io

            return np.asarray(
                Image.open(io.BytesIO(bytes(payload))).convert("RGB")
            )
        if head == PNG_MAGIC:
            return decode_png(payload)
        from napalm_logs_spark.operators.jpegcodec import decode_jpeg

        return decode_jpeg(payload)
    raise ValueError("unrecognized image payload (not BMP/PNG/JPEG)")


def real_media_decoder(kind: str, payload: bytes, n_features: int = 8):
    """REAL feature extraction for the self-contained formats above.

    image (BMP/PNG/baseline-JPEG all built-in) → [mean R/G/B,
    pixel std, w, h, 0, 0] ; audio → [RMS, zero-crossing rate, seconds,
    rate/1e3, 0…] ; video → [n_frames, h, w, mean luma, 0…].
    Deterministic; dispatch is by payload magic, not metadata.
    """
    v = np.zeros(n_features, dtype="float64")
    if kind == "image":
        px = decode_image(payload).astype("float64")
        v[:3] = px.reshape(-1, 3).mean(axis=0)
        v[3] = px.std()
        v[4], v[5] = px.shape[1], px.shape[0]
    elif kind == "audio":
        samples, rate = decode_wav(payload)
        x = samples.astype("float64")
        v[0] = np.sqrt((x**2).mean()) if len(x) else 0.0
        v[1] = (np.diff(np.signbit(x)) != 0).mean() if len(x) > 1 else 0.0
        v[2] = len(x) / rate
        v[3] = rate / 1e3
    elif kind == "video":
        from .mp4codec import decode_mp4, is_mp4

        raw = bytes(payload)
        fr = (decode_mp4(raw) if is_mp4(raw) else decode_nlv(raw)).astype("float64")
        v[0] = fr.shape[0]
        v[1], v[2] = fr.shape[1], fr.shape[2]
        v[3] = fr.mean()
    else:
        raise ValueError(f"unknown media kind {kind!r}")
    return np.round(v, 6).astype("float32")


def real_resizer(payload: bytes, w: int, h: int, out_w: int, out_h: int) -> bytes:
    """REAL nearest-neighbor image resize (numpy index sampling) —
    decodes by magic (BMP/PNG/baseline-JPEG, all built-in) and
    re-encodes in the input's own container (JPEG re-encodes as PNG:
    lossless, so a resize does not stack a second generation of DCT
    loss) so the output is always a valid, decodable image payload."""
    px = decode_image(payload)
    ys = (np.arange(out_h) * (px.shape[0] / out_h)).astype(int)
    xs = (np.arange(out_w) * (px.shape[1] / out_w)).astype(int)
    resized = px[ys][:, xs]
    if bytes(payload[:8]) == PNG_MAGIC or bytes(payload[:3]) == JPEG_MAGIC:
        return encode_png(resized)
    return encode_bmp(resized)


def synth_real_media_pandas(
    n: int = 24, seed: int = 42, png_images: bool = False,
    jpeg_images: bool = False, mp4_videos: bool = False,
) -> pd.DataFrame:
    """Deterministic REAL media table: decodable BMP / WAV / NLV
    payloads (same schema as :func:`synth_media_pandas`).

    ``png_images=True`` encodes every second image as PNG instead of
    BMP — same RNG stream, same pixels, different container — so a
    stored golden computed from the pre-encoding arrays stays valid
    while the query exercises both built-in image codecs.
    ``jpeg_images=True`` instead cycles image containers
    BMP → PNG → baseline-JPEG(q=95); JPEG is lossy, so goldens for
    that mode come from the decoded arrays (fidelity vs pre-encoding
    is tolerance-gated separately in tests).
    ``mp4_videos=True`` encodes every second video row as a real
    ISO-BMFF file (``mp4codec.encode_mp4``, uncompressed ``raw ``
    samples) instead of NLV — same frames, same RNG stream, so
    pre-encoding goldens stay valid while the box-tree demux is
    exercised."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w, h = 8 + (i % 5) * 4, 6 + (i % 3) * 4
            px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            if jpeg_images and (i // 3) % 3 == 2:
                from napalm_logs_spark.operators.jpegcodec import encode_jpeg

                payload = encode_jpeg(px, quality=95)
                meta = dict(width=w, height=h, duration_ms=None, mime="image/jpeg")
            elif (png_images or jpeg_images) and (i // 3) % (2 if png_images else 3) == 1:
                payload = encode_png(px)
                meta = dict(width=w, height=h, duration_ms=None, mime="image/png")
            else:
                payload = encode_bmp(px)
                meta = dict(width=w, height=h, duration_ms=None, mime="image/bmp")
        elif kind == "audio":
            rate, secs = 8000, 0.05 + (i % 4) * 0.05
            t = np.arange(int(rate * secs))
            samples = (3000 * np.sin(2 * np.pi * (100 + i * 10) * t / rate)).astype("int16")
            payload = encode_wav(samples, rate)
            meta = dict(width=None, height=None,
                        duration_ms=int(secs * 1000), mime="audio/wav")
        else:
            nf, h, w = 2 + i % 3, 6, 8
            frames = rng.randint(0, 256, size=(nf, h, w, 3), dtype=np.uint8)
            if mp4_videos and (i // 3) % 2 == 1:
                from .mp4codec import encode_mp4

                payload = encode_mp4(frames, fps=25.0)
                meta = dict(width=w, height=h, duration_ms=nf * 40, mime="video/mp4")
            else:
                payload = encode_nlv(frames)
                meta = dict(width=w, height=h, duration_ms=nf * 40, mime="video/x-nlv")
        rows.append({"media_id": i, "kind": kind, "payload": bytearray(payload), **meta})
    pdf = pd.DataFrame(rows)
    for col in ("width", "height", "duration_ms"):
        pdf[col] = pd.Series(
            [None if pd.isna(v) else int(v) for v in pdf[col]],
            dtype=object, index=pdf.index,
        )
    return pdf[["media_id", "kind", "payload", "mime", "width", "height", "duration_ms"]]


FRAME_SCHEMA = "media_id long, frame_off_ms int, frame_idx int, frame_mean double"


def sample_frames(df: DataFrame, every_ms: int = 200, fps: float = 25.0) -> DataFrame:
    """REAL frame sampling for NLV video payloads: decode on the
    executors, pick the frame at each sampled offset (nearest-earlier
    at ``fps``), emit per-frame statistics.

    Composition of :func:`frame_sample_plan`'s explode shape with the
    raw-frame codec — the full decode→sample→featurize pipeline with no
    external libraries.  Narrow mapInPandas; the payload bytes never
    shuffle.
    """
    frame_ms = 1000.0 / fps

    def _batch(it):
        for pdf in it:
            vids = pdf[pdf["kind"] == "video"]
            out = {"media_id": [], "frame_off_ms": [], "frame_idx": [], "frame_mean": []}
            for r in vids.itertuples(index=False):
                frames = decode_nlv(bytes(r.payload))
                dur = int(r.duration_ms) if r.duration_ms is not None else int(
                    len(frames) * frame_ms
                )
                for off in range(0, max(dur, 1), every_ms):
                    idx = min(int(off / frame_ms), len(frames) - 1)
                    out["media_id"].append(r.media_id)
                    out["frame_off_ms"].append(off)
                    out["frame_idx"].append(idx)
                    out["frame_mean"].append(
                        round(float(frames[idx].astype("float64").mean()), 6)
                    )
            if out["media_id"]:
                yield pd.DataFrame(out)

    return df.mapInPandas(_batch, schema=FRAME_SCHEMA)


DEMUX_SCHEMA = (
    "media_id long, frame_off_ms int, frame_idx int, n_bytes long, digest string"
)


def demux_mp4_samples(df: DataFrame, every_ms: int = 200) -> DataFrame:
    """Container-level frame sampling for ISO-BMFF video payloads: walk
    the box tree, pick the sample at each ``every_ms`` offset
    (nearest-earlier by the stts decode timeline), and SLICE its bytes
    straight out of ``mdat`` via the stsc/stco/stsz table — no pixel
    decode anywhere.  This is the shape a 100 TB video pipeline needs:
    per-frame byte ranges are a pure function of the (tiny) moov box,
    so sampling cost is proportional to frames KEPT, not frames stored.

    Narrow mapInPandas over the binary column; payloads never shuffle.
    Non-BMFF rows are ignored (the NLV toy container has its own
    :func:`sample_frames` path).
    Output: ``(media_id, frame_off_ms, frame_idx, n_bytes, digest)``
    with ``digest`` = sha256 of the raw sample bytes — verifiable from
    the pre-encoding frames, so a stored golden gates the whole
    box-walk + slice path end-to-end.
    """
    from .mp4codec import is_mp4, parse_mp4

    def _batch(it):
        for pdf in it:
            out = {k: [] for k in
                   ("media_id", "frame_off_ms", "frame_idx", "n_bytes", "digest")}
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload)
                if r.kind != "video" or not is_mp4(payload):
                    continue
                info = parse_mp4(payload)
                scale = info["timescale"] / 1000.0  # units per ms
                frames = info["frames"]
                if r.duration_ms:
                    dur_ms = int(r.duration_ms)
                elif len(frames) > 1:
                    per = frames[1][1] - frames[0][1]
                    dur_ms = int((frames[-1][1] + per) / scale)
                else:
                    dur_ms = 1
                for off in range(0, max(dur_ms, 1), every_ms):
                    units = off * scale
                    idx = 0
                    for fi, (i2, t, _o, _s) in enumerate(frames):
                        if t <= units:
                            idx = fi
                        else:
                            break
                    i2, _t, foff, fsize = frames[idx]
                    blob = payload[foff : foff + fsize]
                    out["media_id"].append(r.media_id)
                    out["frame_off_ms"].append(off)
                    out["frame_idx"].append(i2)
                    out["n_bytes"].append(fsize)
                    out["digest"].append(hashlib.sha256(blob).hexdigest())
            if out["media_id"]:
                yield pd.DataFrame(out)

    return df.mapInPandas(_batch, schema=DEMUX_SCHEMA)


# --- audio quality gates ---------------------------------------------------

AUDIO_GATE_SCHEMA = (
    "media_id long, n_samples long, rate int, peak int, sum_sq long, "
    "n_zero_cross long, rms_x1000 long, is_silence boolean, "
    "is_clipped boolean, keep boolean"
)


def audio_quality_gates(
    df: DataFrame,
    *,
    silence_rms: int = 100,
    clip_peak: int = 32600,
    clip_per_mille: int = 1,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Audio curation gates — the ASR-corpus analog of the Gopher text
    rules (`text.gopher_rule_gates`): decode each PCM WAV on the
    executors and emit ALL-INTEGER signal statistics plus silence /
    clipping verdicts, so a stored golden computed from the
    PRE-encoding sample arrays gates encode→decode→stat fidelity
    exactly (no float tolerance anywhere).

    The integer contract (mirrored by ``tools/make_goldens.py``):

    * ``peak``        = max(|x|) (0 for empty);
    * ``sum_sq``      = Σ x² — exact in int64 up to ~2^33 samples of
      full-scale int16 (hours of audio; a 100 TB shard is many files,
      not one);
    * ``n_zero_cross`` = count of sign-bit changes between neighbors;
    * ``rms_x1000``   = isqrt((sum_sq · 10⁶) // n) — floor integer
      sqrt of a floor division, deterministic on any platform;
    * ``is_silence``  = rms_x1000 < silence_rms · 1000;
    * ``is_clipped``  = (#samples with |x| ≥ clip_peak) · 1000 ≥
      n · clip_per_mille, and at least one such sample;
    * ``keep``        = n > 0 and neither gate fired.

    One narrow Arrow ``mapInPandas`` pass; the audio bytes never
    shuffle — downstream filters move ~60 bytes per file.
    """
    import math

    def _batch(it):
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                x, rate = decode_wav(bytes(payload))
                xi = x.astype(np.int64)
                n = int(xi.size)
                peak = int(np.abs(xi).max()) if n else 0
                sum_sq = int((xi * xi).sum()) if n else 0
                zc = (
                    int(
                        np.count_nonzero(
                            np.signbit(xi[1:]) != np.signbit(xi[:-1])
                        )
                    )
                    if n > 1
                    else 0
                )
                rms = math.isqrt((sum_sq * 1_000_000) // n) if n else 0
                n_clip = int(np.count_nonzero(np.abs(xi) >= clip_peak))
                silence = rms < silence_rms * 1000
                clipped = n_clip > 0 and n_clip * 1000 >= n * clip_per_mille
                rows.append(
                    (
                        int(mid), n, int(rate), peak, sum_sq, zc, rms,
                        bool(silence), bool(clipped),
                        bool(n > 0 and not silence and not clipped),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_samples", "rate", "peak", "sum_sq",
                    "n_zero_cross", "rms_x1000", "is_silence",
                    "is_clipped", "keep",
                ],
            )

    return df.mapInPandas(_batch, schema=AUDIO_GATE_SCHEMA)


def synth_audio_corpus_pandas(n: int = 24, seed: int = 13) -> pd.DataFrame:
    """Deterministic WAV corpus with planted gate-trippers: clean sine
    rows (kept), near-silent noise rows (silence gate), hard-clipped
    sine rows (clipping gate), and white-noise rows (kept).  The golden
    replays this RNG stream from the PRE-encoding int16 arrays."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        rate = 8000
        t = np.arange(int(rate * (0.05 + (i % 3) * 0.025)))
        fam = i % 4
        if fam == 0:  # clean sine
            x = (4000 + 500 * (i % 5)) * np.sin(
                2 * np.pi * (120 + 7 * i) * t / rate
            )
        elif fam == 1:  # near-silence: tiny noise floor
            x = rng.randint(-40, 41, size=t.size)
        elif fam == 2:  # hard-clipped loud sine
            x = np.clip(
                60000 * np.sin(2 * np.pi * (90 + 11 * i) * t / rate),
                -32768, 32767,
            )
        else:  # white noise, healthy level
            x = rng.randint(-9000, 9001, size=t.size)
        samples = x.astype(np.int16)
        rows.append((i, bytearray(encode_wav(samples, rate))))
    return pd.DataFrame(rows, columns=["media_id", "payload"])
