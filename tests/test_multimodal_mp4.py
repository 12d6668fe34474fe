"""Round-10 ISO-BMFF metadata decode: the recursive box walk that
turned sample_frames' frame COUNT from an honest fake into a real
container read (mvhd timescale/duration, tkhd 16.16 dims, stsz sample
count). The builder here is an independent test-side model that can
reorder sibling boxes, insert unknown boxes, use version-1 time fields
and 64-bit largesize headers — none of which a fixed-offset reader
would survive."""

import struct

import pytest

from aardappel_spark.ops.multimodal import (
    _decode_mp4,
    _frame_count,
    decode_header,
)


def _box(btype: bytes, payload: bytes, largesize: bool = False) -> bytes:
    if largesize:
        return (
            struct.pack(">I", 1) + btype
            + struct.pack(">Q", 16 + len(payload)) + payload
        )
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _mvhd(timescale, duration, version=0):
    if version == 0:
        body = struct.pack(">BxxxIIII", 0, 0, 0, timescale, duration)
    else:
        body = struct.pack(">BxxxQQIQ", 1, 0, 0, timescale, duration)
    body += struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
    body += bytes(10) + bytes(36) + bytes(24) + struct.pack(">I", 2)
    return _box(b"mvhd", body)


def _tkhd(w, h, version=0):
    if version == 0:
        body = struct.pack(">BxxxIIIxxxxI", 0, 0, 0, 1, 0)
    else:
        body = struct.pack(">BxxxQQIxxxxQ", 1, 0, 0, 1, 0)
    body += bytes(8) + bytes(8) + bytes(36)
    body += struct.pack(">II", w << 16, h << 16)
    return _box(b"tkhd", body)


def _mp4(timescale, duration, w, h, n_frames, version=0,
         largesize=False, junk_boxes=False, reorder=False):
    stsz = _box(b"stsz", struct.pack(">BxxxII", 0, 1, n_frames))
    stbl = _box(b"stbl", stsz)
    minf = _box(b"minf", stbl)
    mdhd = _box(b"mdhd", struct.pack(">BxxxIIIIHH", 0, 0, 0,
                                     timescale, duration, 0x55C4, 0))
    hdlr = _box(b"hdlr", struct.pack(">BxxxI4s", 0, 0, b"vide")
                + bytes(12) + b"\x00")
    mdia_kids = [mdhd, hdlr, minf]
    trak_kids = [_tkhd(w, h, version), _box(b"mdia", b"".join(mdia_kids))]
    moov_kids = [_mvhd(timescale, duration, version),
                 _box(b"trak", b"".join(trak_kids))]
    if junk_boxes:
        moov_kids.insert(0, _box(b"udta", b"\x01\x02\x03"))
        trak_kids.insert(0, _box(b"edts", b""))
        trak_kids = [trak_kids[0], _tkhd(w, h, version),
                     _box(b"mdia", b"".join(mdia_kids))]
        moov_kids = [moov_kids[0], _mvhd(timescale, duration, version),
                     _box(b"trak", b"".join(trak_kids))]
    if reorder:
        moov_kids = moov_kids[::-1]
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200))
    moov = _box(b"moov", b"".join(moov_kids), largesize=largesize)
    return ftyp + moov


def test_mp4_box_walk_reads_metadata():
    p = _mp4(90000, 90000 * 7 + 123, 1920, 1080, 314)
    d = _decode_mp4(p)
    assert d == {
        "format": "mp4", "width": 1920, "height": 1080,
        "n_samples": 314, "duration_ms": (90000 * 7 + 123) * 1000 // 90000,
    }
    assert decode_header(p)["n_samples"] == 314


def test_mp4_walk_survives_reorder_junk_version1_largesize():
    for kwargs in (
        {"reorder": True},
        {"junk_boxes": True},
        {"version": 1},
        {"largesize": True},
        {"version": 1, "junk_boxes": True, "reorder": True},
    ):
        p = _mp4(600, 600 * 3, 640, 360, 48, **kwargs)
        d = _decode_mp4(p)
        assert (d["width"], d["height"], d["n_samples"], d["duration_ms"]) \
            == (640, 360, 48, 3000), kwargs


def test_mp4_refusals():
    good = _mp4(1000, 2500, 320, 240, 25)
    assert _decode_mp4(good)["duration_ms"] == 2500

    with pytest.raises(ValueError):  # box size overruns container
        _decode_mp4(good[:-10])
    with pytest.raises(ValueError):  # no moov at all
        _decode_mp4(b"\x00\x00\x00\x10ftypisom\x00\x00\x02\x00")
    with pytest.raises(ValueError):  # the old metadata-less stub
        _decode_mp4(b"\x00\x00\x00\x18ftypisom" + bytes(8))
    zero_ts = _mp4(1000, 2500, 320, 240, 25)
    # patch mvhd timescale to zero: ftyp(16) + moov hdr(8) + mvhd
    # hdr(8) + ver/flags(4) + creation(4) + modification(4) = byte 44
    zero_ts = zero_ts[:44] + b"\x00\x00\x00\x00" + zero_ts[48:]
    with pytest.raises(ValueError):
        _decode_mp4(zero_ts)


def _trak(w, h, n_frames, handler, timescale=1000, duration=1000):
    stsz = _box(b"stsz", struct.pack(">BxxxII", 0, 1, n_frames))
    mdhd = _box(b"mdhd", struct.pack(">BxxxIIIIHH", 0, 0, 0,
                                     timescale, duration, 0x55C4, 0))
    hdlr = _box(b"hdlr", struct.pack(">BxxxI4s", 0, 0, handler)
                + bytes(12) + b"\x00")
    mdia = _box(b"mdia", mdhd + hdlr + _box(b"minf", _box(b"stbl", stsz)))
    return _box(b"trak", _tkhd(w, h) + mdia)


def test_mp4_multitrack_picks_the_vide_trak():
    """r10 ADVICE: an audio-first multi-track file must NOT report the
    audio stsz count as the video frame count — the walk has to select
    the trak whose mdia/hdlr handler_type is 'vide'."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200))
    audio = _trak(0, 0, 9999, b"soun")
    video = _trak(1280, 720, 42, b"vide")
    p = ftyp + _box(b"moov", _mvhd(1000, 5000) + audio + video)
    d = _decode_mp4(p)
    assert (d["width"], d["height"], d["n_samples"]) == (1280, 720, 42)

    # no vide trak anywhere: fall back to the first trak WITH dims
    other = _trak(640, 480, 7, b"text")
    p2 = ftyp + _box(b"moov", _mvhd(1000, 5000) + audio + other)
    d2 = _decode_mp4(p2)
    assert (d2["width"], d2["height"], d2["n_samples"]) == (640, 480, 7)

    # single audio trak: first-trak fallback still decodes (0x0 dims)
    p3 = ftyp + _box(b"moov", _mvhd(1000, 5000) + audio)
    d3 = _decode_mp4(p3)
    assert (d3["width"], d3["height"], d3["n_samples"]) == (0, 0, 9999)

    # r11 ADVICE: a degenerate (0, h) track must NOT shadow a later
    # genuine track — tuple ordering ranked (0, 240) > (0, 0)
    degenerate = _trak(0, 240, 5, b"text")
    real = _trak(320, 200, 11, b"text")
    p4 = ftyp + _box(b"moov", _mvhd(1000, 5000) + degenerate + real)
    d4 = _decode_mp4(p4)
    assert (d4["width"], d4["height"], d4["n_samples"]) == (320, 200, 11)


def test_mp4_empty_box_payloads_raise_valueerror():
    """r10 ADVICE: an mvhd/tkhd box with an EMPTY payload at the end of
    the buffer must raise ValueError, not IndexError (which would fail
    the whole Spark task instead of yielding the unsupported row)."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200))
    p = ftyp + _box(b"moov", _box(b"mvhd", b""))
    with pytest.raises(ValueError):
        _decode_mp4(p)
    p2 = ftyp + _box(
        b"moov", _mvhd(1000, 5000) + _box(b"trak", _box(b"tkhd", b""))
    )
    with pytest.raises(ValueError):
        _decode_mp4(p2)


def test_frame_count_real_for_mp4_fake_otherwise():
    import hashlib

    p = _mp4(1000, 5000, 320, 240, 37)
    assert _frame_count(p) == 37
    stub = b"\x00\x00\x00\x18ftypisom" + bytes(8)
    assert _frame_count(stub) == 1 + hashlib.md5(stub).digest()[2]
    other = b"not a container at all"
    assert _frame_count(other) == 1 + hashlib.md5(other).digest()[2]


def test_sample_frames_uses_stsz_count(spark):
    from aardappel_spark.ops.multimodal import MEDIA_SCHEMA, sample_frames

    p = _mp4(1000, 5000, 320, 240, 37)
    df = spark.createDataFrame(
        [(1, "video", "video/mp4", bytearray(p))], MEDIA_SCHEMA
    )
    frames = sample_frames(df, every_n=10).collect()
    assert sorted(r.frame_no for r in frames) == [0, 10, 20, 30]
