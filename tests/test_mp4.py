"""ISO-BMFF codec + container-level frame sampling."""

import struct

import numpy as np
import pytest

from napalm_logs_spark.operators.mp4codec import (
    decode_mp4,
    encode_mp4,
    is_mp4,
    parse_mp4,
)


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8])
def test_mp4_round_trip(n):
    rng = np.random.RandomState(n)
    frames = rng.randint(0, 256, size=(n, 6, 8, 3), dtype=np.uint8)
    payload = encode_mp4(frames, fps=25)
    assert is_mp4(payload)
    assert (decode_mp4(payload) == frames).all()


def test_mp4_box_tree_is_well_formed():
    payload = encode_mp4(np.zeros((4, 2, 2, 3), dtype=np.uint8))
    pos, tags = 0, []
    while pos < len(payload):
        size, tag = struct.unpack_from(">I4s", payload, pos)
        tags.append(tag)
        pos += size
    assert pos == len(payload)
    assert tags == [b"ftyp", b"mdat", b"moov"]


def test_mp4_sample_table_and_chunk_walk():
    # odd sample count: chunks of 2 + a trailing 1-sample chunk, so the
    # parser exercises a multi-entry stsc
    frames = np.arange(5 * 2 * 2 * 3, dtype=np.uint8).reshape(5, 2, 2, 3) % 256
    info = parse_mp4(encode_mp4(frames, fps=25))
    assert info["fourcc"] == "raw " and info["depth"] == 24
    assert info["timescale"] == 1000
    assert [f[0] for f in info["frames"]] == [0, 1, 2, 3, 4]
    assert [f[1] for f in info["frames"]] == [0, 40, 80, 120, 160]
    assert all(f[3] == 2 * 2 * 3 for f in info["frames"])
    # offsets are strictly increasing and land inside the payload
    offs = [f[2] for f in info["frames"]]
    assert offs == sorted(offs) and len(set(offs)) == 5


def test_mp4_rejects_malformed():
    with pytest.raises(ValueError):
        parse_mp4(b"\x00" * 32)
    good = encode_mp4(np.zeros((2, 2, 2, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        parse_mp4(good[:40])  # truncated inside moov-less prefix


def test_real_media_decoder_dispatches_mp4():
    from napalm_logs_spark.operators.multimodal import real_media_decoder

    rng = np.random.RandomState(7)
    frames = rng.randint(0, 256, size=(3, 6, 8, 3), dtype=np.uint8)
    v = real_media_decoder("video", encode_mp4(frames))
    assert v[0] == 3 and v[1] == 6 and v[2] == 8
    assert abs(v[3] - frames.astype("float64").mean()) < 1e-3


def test_demux_skips_non_bmff_and_matches_pre_encoding_truth(spark):
    from napalm_logs_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        demux_mp4_samples,
        synth_real_media_pandas,
    )
    import hashlib

    pdf = synth_real_media_pandas(n=24, mp4_videos=True)
    media = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
    got = demux_mp4_samples(media, every_ms=30).collect()
    mp4_ids = {
        r.media_id for r in got
    }
    # only the MP4-container video rows appear (i%3==2 and (i//3)%2==1)
    assert mp4_ids == {i for i in range(24) if i % 3 == 2 and (i // 3) % 2 == 1}
    # digests equal sha256 of the decoded frame bytes (slice == decode)
    by_id = {r["media_id"]: bytes(r["payload"]) for _, r in pdf.iterrows()}
    for r in got:
        frames = decode_mp4(by_id[r.media_id])
        assert r.digest == hashlib.sha256(frames[r.frame_idx].tobytes()).hexdigest()
        assert r.n_bytes == frames[r.frame_idx].nbytes


def test_demux_invariant_under_repartition(spark):
    from napalm_logs_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        demux_mp4_samples,
        synth_real_media_pandas,
    )

    media = spark.createDataFrame(
        synth_real_media_pandas(n=24, mp4_videos=True), schema=MEDIA_SCHEMA
    )
    a = sorted(map(tuple, demux_mp4_samples(media, every_ms=30).collect()))
    b = sorted(
        map(tuple, demux_mp4_samples(media.repartition(7), every_ms=30).collect())
    )
    assert a == b and len(a) > 0
