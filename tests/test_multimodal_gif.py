"""Round-10 GIF pixel decode: a genuine variable-width LZW decoder
(CLEAR/EOI, 9→12-bit stepping, 4096-entry cap) exercised against an
independent test-side LZW COMPRESSOR (greedy longest-match, the
classic algorithm) whose bit packer simulates the decoder's table
growth to choose each code's width — so round-trips cover dictionary
references, the K-w-K corner case, width transitions and mid-stream
CLEARs, not just literal streams."""

import random
import struct

import pytest

from aardappel_spark.ops.multimodal import (
    _lzw_decode,
    _pixel_stats_gif,
    decode_header,
)


def _lzw_codes(indices: bytes, mcs: int, clear_every: int | None = None):
    """Greedy LZW: emit CLEAR, then longest-match codes, then EOI.
    clear_every inserts CLEAR codes mid-stream (uncompressed-GIF
    style), resetting the table."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1

    def fresh():
        return {bytes([i]): i for i in range(1 << mcs)}

    table = fresh()
    next_code = eoi + 1
    codes = [clear]
    since_clear = 0
    w = b""
    for b in indices:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        codes.append(table[w])
        since_clear += 1
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
        w = bytes([b])
        if clear_every and since_clear >= clear_every:
            codes.append(table[w])
            codes.append(clear)
            table = fresh()
            next_code = eoi + 1
            since_clear = 0
            w = b""
    if w:
        codes.append(table[w])
    codes.append(eoi)
    return codes


def _pack(codes, mcs: int) -> bytes:
    """LSB-first packer that simulates the DECODER's table evolution to
    pick each code's bit width — the GIF width contract."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width, size, prev = mcs + 1, clear + 2, False
    acc = nbits = 0
    out = bytearray()
    for code in codes:
        assert code < (1 << width)
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if code == clear:
            width, size, prev = mcs + 1, clear + 2, False
        elif code == eoi:
            break
        else:
            if prev and size < 4096:
                size += 1
            prev = True
            if size == (1 << width) and width < 12:
                width += 1
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif(w, h, indices, palette, mcs=None, interlace=False,
         local=False, with_extension=False, clear_every=None):
    """Hand-assembled single-frame GIF with a real LZW stream."""
    n_pal = len(palette)
    pal_bits = max(1, (n_pal - 1).bit_length())
    mcs = mcs if mcs is not None else max(2, pal_bits)
    pal_bytes = b"".join(bytes(c) for c in palette)
    pal_bytes += b"\x00" * (3 * (1 << pal_bits) - len(pal_bytes))
    out = b"GIF89a" + struct.pack("<HH", w, h)
    if local:
        out += bytes([0x00, 0, 0])  # no global table
    else:
        out += bytes([0x80 | 0x70 | (pal_bits - 1), 0, 0]) + pal_bytes
    if with_extension:  # graphic control extension, must be skipped
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    ipacked = (0x80 | (pal_bits - 1)) if local else 0x00
    if interlace:
        ipacked |= 0x40
    out += bytes([ipacked])
    if local:
        out += pal_bytes
    out += bytes([mcs])
    data = _pack(_lzw_codes(bytes(indices), mcs, clear_every), mcs)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return out


def _expected(indices, palette):
    return (
        len(indices),
        sum(palette[v][0] for v in indices),
        sum(palette[v][1] for v in indices),
        sum(palette[v][2] for v in indices),
    )


def test_gif_lzw_round_trips_randomized():
    rng = random.Random(20260816)
    for _ in range(60):
        pal_bits = rng.choice([1, 2, 4, 8])
        n_pal = 1 << pal_bits
        palette = [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(n_pal)
        ]
        w, h = rng.randrange(1, 20), rng.randrange(1, 16)
        # runs of repeats exercise dictionary hits AND the K-w-K case
        idx = []
        while len(idx) < w * h:
            v = rng.randrange(n_pal)
            idx.extend([v] * rng.randrange(1, 6))
        idx = idx[: w * h]
        p = _gif(w, h, idx, palette, with_extension=rng.random() < 0.5)
        assert _pixel_stats_gif(p) == _expected(idx, palette), (w, h, pal_bits)


def test_gif_lzw_width_growth_past_nine_bits():
    """4096 pixels over a 256-color palette pushes the dictionary well
    past 512 entries: codes must widen 9 -> 10 -> 11 bits."""
    rng = random.Random(5)
    palette = [(i, (2 * i) % 256, (7 * i) % 256) for i in range(256)]
    idx = [rng.randrange(256) for _ in range(64 * 64)]
    p = _gif(64, 64, idx, palette)
    assert _pixel_stats_gif(p) == _expected(idx, palette)


def test_gif_kwk_case_exact():
    """'aaaa...' is the canonical code==len(table) stream."""
    palette = [(10, 20, 30), (40, 50, 60), (0, 0, 0), (1, 2, 3)]
    idx = [0] * 30
    p = _gif(6, 5, idx, palette)
    assert _pixel_stats_gif(p) == _expected(idx, palette)


def test_gif_midstream_clear_codes():
    rng = random.Random(11)
    palette = [(i, 255 - i, i // 2) for i in range(16)]
    idx = [rng.randrange(16) for _ in range(12 * 10)]
    p = _gif(12, 10, idx, palette, clear_every=20)
    assert _pixel_stats_gif(p) == _expected(idx, palette)


def test_gif_interlace_flag_and_local_palette():
    rng = random.Random(13)
    palette = [(rng.randrange(256),) * 3 for _ in range(4)]
    idx = [rng.randrange(4) for _ in range(8 * 6)]
    # interlacing permutes rows only; channel sums are invariant
    assert _pixel_stats_gif(
        _gif(8, 6, idx, palette, interlace=True)
    ) == _expected(idx, palette)
    # local color table must win (here it's the only table)
    assert _pixel_stats_gif(
        _gif(8, 6, idx, palette, local=True)
    ) == _expected(idx, palette)


def test_gif_honest_refusals():
    palette = [(1, 2, 3), (4, 5, 6)]
    idx = [0, 1] * 6
    good = _gif(4, 3, idx, palette)
    assert _pixel_stats_gif(good) == _expected(idx, palette)
    assert decode_header(good)["width"] == 4

    # truncated: chop the stream before EOI
    with pytest.raises(ValueError):
        _pixel_stats_gif(good[:-6] + b"\x00\x3b")
    # headers-only fixture shape (no image block) must refuse
    with pytest.raises(ValueError):
        _pixel_stats_gif(b"GIF89a" + struct.pack("<HH", 3, 2)
                         + bytes([0, 0, 0]) + b"\x3b")
    # pixel count mismatch: frame claims more pixels than the stream has
    with pytest.raises(ValueError):
        _pixel_stats_gif(_gif(4, 3, idx[:-2], palette))
    # r10 ADVICE: a 10-byte magic+dims payload passes _decode_gif's
    # header check but has no packed byte — must be ValueError, never
    # IndexError (which would fail the whole Spark task)
    with pytest.raises(ValueError):
        _pixel_stats_gif(b"GIF89a" + struct.pack("<HH", 3, 2))
    # truncated right before the LZW min-code-size byte
    with pytest.raises(ValueError):
        _pixel_stats_gif(
            b"GIF89a" + struct.pack("<HH", 4, 3) + bytes([0, 0, 0])
            + b"\x2c" + struct.pack("<HHHH", 0, 0, 4, 3) + b"\x00"
        )


def test_gif_lzw_decoder_rejects_unseen_code():
    with pytest.raises(ValueError):
        # width 3 after mcs=2: CLEAR(4) then code 7 with empty table
        _lzw_decode(_pack([4, 7, 5], 2), 2, 100)
