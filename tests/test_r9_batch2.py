"""Round-9 batch-2 additions: local clustering census, LSH band sweep,
aspect-ratio bucketing, Matryoshka truncation recall.

Each query gets the same treatment as the rest of the registry: a
from-scratch python model over the REAL fixture (or a randomized graph),
never a replay of the Spark kernel's own arithmetic.
"""

import hashlib
import itertools
import random
from fractions import Fraction

import duckdb
import pytest

from pyspark.sql import functions as F


def test_local_clustering_census_matches_python_model(spark):
    """Per-vertex triangle counts + integer-bucketed coefficients on a
    randomized graph vs brute-force triple enumeration."""
    from aardappel_spark.ops.graph import local_clustering_census

    rng = random.Random(907)
    n = 40
    edges = set()
    for _ in range(160):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    # add a guaranteed clique so the top bucket is exercised
    for a, b in itertools.combinations([50, 51, 52, 53], 2):
        edges.add((a, b))
    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "src long, dst long"
    )
    got = {
        r.cc_bucket: (r.n_vertices, r.sum_triangles, r.sum_wedges)
        for r in local_clustering_census(df, buckets=10).collect()
    }

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    model = {}
    for v, nbrs in adj.items():
        d = len(nbrs)
        if d < 2:
            continue
        t = sum(
            1
            for x, y in itertools.combinations(sorted(nbrs), 2)
            if y in adj.get(x, ())
        )
        bucket = (20 * t) // (d * (d - 1))
        nv, st, sw = model.get(bucket, (0, 0, 0))
        model[bucket] = (nv + 1, st + t, sw + d * (d - 1) // 2)
    assert got == model
    # the planted 4-clique puts its members at c_v = 1 unless the random
    # edges added external neighbors; at least assert the census covered
    # every degree>=2 vertex exactly once
    assert sum(v[0] for v in got.values()) == sum(
        1 for nbrs in adj.values() if len(nbrs) >= 2
    )


def test_lsh_band_sweep_matches_python_model(spark, sf_dir):
    """The empirical (b, r) S-curve vs a from-scratch python MinHash:
    3-word shingles, 12 salted-md5 permutations, aligned 2-band pooled
    universe, per-config aligned-band detection, token-Jaccard >= 1/2
    truth — counted independently of the Spark kernel."""
    from aardappel_spark.registry import QUERIES

    docs = duckdb.connect().execute(
        f"SELECT doc_id, COALESCE(text,'') FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()

    sigs, toksets = {}, {}
    for doc_id, text in docs:
        toks = [t for t in text.split(" ") if t]
        toksets[doc_id] = set(toks)
        if len(toks) < 3:
            grams = [" ".join(toks)]
        else:
            grams = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        sigs[doc_id] = [
            min(hashlib.md5(f"{k}{g}".encode()).hexdigest() for g in grams)
            for k in range(12)
        ]

    ids = sorted(sigs)
    universe = set()
    for a, b in itertools.combinations(ids, 2):
        sa, sb = sigs[a], sigs[b]
        if any(
            sa[s] == sb[s] and sa[s + 1] == sb[s + 1] for s in range(0, 12, 2)
        ):
            universe.add((a, b))

    model = {}
    for r in (2, 3, 4, 6, 12):
        n_cand = n_hits = n_truth = 0
        for a, b in universe:
            sa, sb = sigs[a], sigs[b]
            det = any(
                all(sa[i] == sb[i] for i in range(s, s + r))
                for s in range(0, 12, r)
            )
            ta, tb = toksets[a], toksets[b]
            union = len(ta | tb)
            truth = union > 0 and 2 * len(ta & tb) >= union
            n_cand += det
            n_hits += det and truth
            n_truth += truth
        model[(12 // r, r)] = (n_cand, n_hits, n_truth)

    got = {}
    for row in QUERIES["dedup_lsh_band_sweep"](spark, sf_dir).collect():
        got[(row.n_bands, row.rows_per_band)] = (
            row.n_candidates,
            row.n_hits,
            row.n_truth,
        )
        if row.n_truth:
            assert row.recall == round(row.n_hits / row.n_truth, 6)
        if row.n_candidates:
            assert row.precision == round(row.n_hits / row.n_candidates, 6)
    assert got == model
    # the pooled universe must contain every config's detections: the
    # r=2 config IS the universe, so its candidate count is the maximum
    assert model[(6, 2)][0] == max(v[0] for v in model.values())


def test_aspect_bucket_sql_matches_fraction_model(spark):
    """The integer-arithmetic nearest-bucket CASE vs exact Fraction
    distance with first-listed tie-break, over the full dims grid the
    synthetic payload cycle can produce (and a few extreme ratios)."""
    from aardappel_spark.ops.multimodal import ASPECT_BUCKETS, aspect_bucket_sql

    dims = [(w, h) for w in range(1, 14) for h in range(1, 12)]
    dims += [(4096, 1), (1, 4096), (640, 384), (383, 640)]
    df = spark.createDataFrame(dims, "width long, height long")
    got = {
        (r.width, r.height): r.bucket
        for r in df.selectExpr(
            "width",
            "height",
            f"{aspect_bucket_sql('width', 'height')} AS bucket",
        ).collect()
    }
    for w, h in dims:
        ratio = Fraction(w, h)
        best = min(
            ASPECT_BUCKETS, key=lambda b: (abs(ratio - Fraction(b[0], b[1])),)
        )
        # first-listed tie-break: min() is stable over ASPECT_BUCKETS order
        assert got[(w, h)] == f"{best[0]}x{best[1]}", (w, h)


def test_mrl_recall_shape_and_control_row(spark, sf_dir):
    """The d=64 leg recomputes the full-width top-k, so its recall is
    1.0 by construction; every leg is a single row with 0<=n_hit<=10."""
    from aardappel_spark.registry import QUERIES

    rows = {r.dims: r for r in QUERIES["ann_mrl_recall"](spark, sf_dir).collect()}
    assert set(rows) == {8, 16, 32, 64}
    for d, r in rows.items():
        assert r.k == 10
        assert 0 <= r.n_hit <= 10
        assert r.recall == round(r.n_hit / 10.0, 6)
    assert rows[64].n_hit == 10 and rows[64].recall == 1.0


def _bmp24(width, height, rows_bgr, pad=True):
    """Hand-assembled 24bpp BMP: rows_bgr is height lists of width
    (b, g, r) tuples, stored bottom-up with 4-byte row padding."""
    import struct as _st

    stride = (3 * width + 3) & ~3 if pad else 3 * width
    body = b""
    for row in rows_bgr:
        raw = b"".join(bytes(px) for px in row)
        body += raw + b"\x00" * (stride - len(raw))
    hdr = b"BM" + _st.pack("<III", 54 + len(body), 0, 54)
    dib = _st.pack("<Iii", 40, width, height) + _st.pack("<HH", 1, 24)
    dib += _st.pack("<IIIIII", 0, len(body), 2835, 2835, 0, 0)
    return hdr + dib + body


def test_pixel_stats_bmp_stride_padding_and_channel_order():
    """The fixture's BMP widths are multiples of 4 (no padding), so the
    model test MUST cover the padded case: a 3x2 BMP whose pad bytes are
    nonzero-looking positions that a naive flat sum would swallow."""
    from aardappel_spark.ops.multimodal import _pixel_stats_bmp

    rows = [
        [(1, 2, 3), (4, 5, 6), (7, 8, 9)],       # bottom row (B,G,R)
        [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
    ]
    p = _bmp24(3, 2, rows)
    assert (3 * 3 + 3) & ~3 == 12  # row stride really pads 9 -> 12
    n_px, sum_r, sum_g, sum_b = _pixel_stats_bmp(p)
    assert n_px == 6
    assert sum_b == 1 + 4 + 7 + 10 + 40 + 70
    assert sum_g == 2 + 5 + 8 + 20 + 50 + 80
    assert sum_r == 3 + 6 + 9 + 30 + 60 + 90


def test_pixel_stats_p6_and_p3_agree():
    """The same pixels encoded as plain P3 and raw P6 must produce the
    same stats (the fixture only builds P3; P6 is the raw-binary leg)."""
    from aardappel_spark.ops.multimodal import _pixel_stats_ppm

    vals = [(12, 34, 56), (255, 0, 128), (1, 2, 3), (200, 100, 50)]
    p3 = ("P3\n2 2\n255\n" + " ".join(
        " ".join(map(str, px)) for px in vals
    )).encode()
    p6 = b"P6\n2 2\n255\n" + b"".join(bytes(px) for px in vals)
    assert _pixel_stats_ppm(p3) == _pixel_stats_ppm(p6)
    n_px, sum_r, sum_g, sum_b = _pixel_stats_ppm(p3)
    assert (n_px, sum_r, sum_g, sum_b) == (4, 12 + 255 + 1 + 200,
                                           34 + 0 + 2 + 100, 56 + 128 + 3 + 50)


def test_pixel_stats_ppm_comment_handling():
    from aardappel_spark.ops.multimodal import _pixel_stats_ppm

    p3 = b"P3\n# a comment\n1 1\n255\n9 8 7"
    assert _pixel_stats_ppm(p3) == (1, 9, 8, 7)


def test_audio_stats_known_samples_and_sign_fold():
    """Hand-assembled PCM16 WAV with known samples including the most
    negative value; exact |s|, s^2 and max folds."""
    import struct as _st

    from aardappel_spark.ops.multimodal import _audio_stats_wav

    samples = [0, 1, -1, 32767, -32768, -12345]
    data = b"".join(_st.pack("<h", s) for s in samples)
    fmt = _st.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    p = (
        b"RIFF" + _st.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + _st.pack("<I", 16) + fmt
        + b"data" + _st.pack("<I", len(data)) + data
    )
    n_vals, sum_abs, sum_sq, max_abs = _audio_stats_wav(p)
    assert n_vals == 6
    assert sum_abs == sum(abs(s) for s in samples)
    assert sum_sq == sum(s * s for s in samples)
    assert max_abs == 32768


def test_pixel_audio_kernels_degrade_not_crash(spark):
    """Corrupt/entropy-coded payloads must yield NULL stats rows, never
    a task failure (the extract_features degrade contract)."""
    from aardappel_spark.ops.multimodal import audio_stats, pixel_stats

    rows = [
        (0, "image", None, b"BM\x01"),                  # truncated BMP
        (1, "image", None, b"P6\n2 2\n255\nxx"),        # truncated P6
        (2, "image", None, b"\x89PNG\r\n\x1a\x08junk"),  # bad magic tail
        (3, "audio", None, b"RIFF\x00\x00\x00\x00WAVE"),  # chunkless WAV
        (4, "audio", None, None),                        # NULL payload
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, mime string, payload binary"
    )
    px = {r.media_id: r for r in pixel_stats(df).collect()}
    au = {r.media_id: r for r in audio_stats(df).collect()}
    assert len(px) == len(au) == 5
    assert all(px[i].n_px is None for i in px)
    assert all(au[i].n_vals is None for i in au)


def test_minhash_bbit_matches_python_model(spark, sf_dir):
    """b-bit estimation census vs a from-scratch python model: same
    12-permutation signature, lowest-4-bit (last md5 hex char) match
    count, rational estimator (4m-3)/45, integer error deciles."""
    from aardappel_spark.registry import QUERIES

    docs = duckdb.connect().execute(
        f"SELECT doc_id, COALESCE(text,'') FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()

    sigs, toksets = {}, {}
    for doc_id, text in docs:
        toks = [t for t in text.split(" ") if t]
        toksets[doc_id] = set(toks)
        if len(toks) < 3:
            grams = [" ".join(toks)]
        else:
            grams = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        sigs[doc_id] = [
            min(hashlib.md5(f"{k}{g}".encode()).hexdigest() for g in grams)
            for k in range(12)
        ]

    model = {}
    for a, b in itertools.combinations(sorted(sigs), 2):
        sa, sb = sigs[a], sigs[b]
        if not any(
            sa[s] == sb[s] and sa[s + 1] == sb[s + 1] for s in range(0, 12, 2)
        ):
            continue
        ta, tb = toksets[a], toksets[b]
        u = len(ta | tb)
        if u == 0:
            continue
        i = len(ta & tb)
        m = sum(sa[k][-1] == sb[k][-1] for k in range(12))
        bucket = (10 * abs((4 * m - 3) * u - 45 * i)) // (45 * u)
        np_, sm, su = model.get(bucket, (0, 0, 0))
        model[bucket] = (np_ + 1, sm + m, su + u)

    got = {
        r.err_bucket: (r.n_pairs, r.sum_matches, r.sum_union)
        for r in QUERIES["dedup_minhash_bbit"](spark, sf_dir).collect()
    }
    assert got == model


def test_langid_margin_matches_python_model(spark, sf_dir):
    """Margin census vs a python replay of the marker-hit scoring: the
    pred tie-break must equal text_langid's, and margin = sorted
    scores[-1] - scores[-2]."""
    from aardappel_spark.ops.text import LANG_PROFILES
    from aardappel_spark.registry import QUERIES

    docs = duckdb.connect().execute(
        f"SELECT COALESCE(text,'') FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    model = {}
    for (text,) in docs:
        toks = [t for t in text.split(" ") if t]
        scores = {
            lang: sum(t in set(words) for t in toks)
            for lang, words in LANG_PROFILES.items()
        }
        pred = "und"
        for lang in LANG_PROFILES:  # first lang wins ties
            if scores[lang] > 0 and scores[lang] == max(scores.values()):
                pred = lang
                break
        ss = sorted(scores.values())
        margin = ss[-1] - ss[-2]
        model[(pred, margin)] = model.get((pred, margin), 0) + 1
    got = {
        (r.pred_lang, r.margin): r.n_docs
        for r in QUERIES["text_langid_margin"](spark, sf_dir).collect()
    }
    assert got == model


def test_orders_benford_matches_python_model(spark, sf_dir):
    """Benford census vs a python model over the real orders fixture:
    exact cents leading digit, ppm expectation literals, integer
    deviation."""
    from aardappel_spark.registry import QUERIES
    from aardappel_spark.registry.sales import _BENFORD_PPM

    assert sum(_BENFORD_PPM.values()) == 1_000_000
    totals = duckdb.connect().execute(
        f"SELECT o_totalprice FROM read_parquet('{sf_dir}/orders.parquet')"
    ).fetchall()
    counts = {}
    for (v,) in totals:
        d = int(str(int(round(v * 100)))[0])
        counts[d] = counts.get(d, 0) + 1
    n = sum(counts.values())
    model = {
        d: (c, _BENFORD_PPM[d], (1_000_000 * c) // n - _BENFORD_PPM[d])
        for d, c in counts.items()
    }
    got = {
        r.digit: (r.n_orders, r.expected_ppm, r.deviation_ppm)
        for r in QUERIES["orders_benford"](spark, sf_dir).collect()
    }
    assert got == model


def test_customer_kanon_matches_python_model(spark, sf_dir):
    """k-anonymity class-size histogram vs a python model over the real
    customer fixture (truncating cents bucket, incl. negative
    balances)."""
    from aardappel_spark.registry import QUERIES

    rows = duckdb.connect().execute(
        f"SELECT c_nationkey, c_mktsegment, c_acctbal FROM "
        f"read_parquet('{sf_dir}/customer.parquet')"
    ).fetchall()
    classes = {}
    for nk, seg, bal in rows:
        cents = int(round(bal * 100))
        bucket = int(cents / 100000)  # truncation toward zero
        key = (nk, seg, bucket)
        classes[key] = classes.get(key, 0) + 1
    model = {}
    for k in classes.values():
        nc, nr = model.get(k, (0, 0))
        model[k] = (nc + 1, nr + k)
    got = {
        r.k: (r.n_classes, r.n_rows)
        for r in QUERIES["customer_kanon"](spark, sf_dir).collect()
    }
    assert got == model
    assert any(bal < 0 for _, _, bal in rows)  # negatives really exercised


def test_pixel_stats_refuses_negative_width_bmp():
    """A malformed BMP with negative WIDTH (only height may legally be
    negative) must raise, not emit a negative pixel count."""
    import struct as _st

    import pytest as _pt

    from aardappel_spark.ops.multimodal import _pixel_stats_bmp

    p = _bmp24(3, 2, [[(0, 0, 0)] * 3] * 2)
    bad = p[:18] + _st.pack("<i", -3) + p[22:]
    with _pt.raises(ValueError):
        _pixel_stats_bmp(bad)


def test_decode_kernels_roundtrip_randomized():
    """Randomized round-trip fuzz: assemble random-but-valid BMP / P3 /
    P6 / WAV payloads, decode with the real kernels, and check the
    exact sums against the generating pixel/sample lists (20 seeds per
    format, padded and unpadded widths)."""
    import struct as _st

    from aardappel_spark.ops.multimodal import (
        _audio_stats_wav,
        _pixel_stats_bmp,
        _pixel_stats_ppm,
    )

    rng = random.Random(160816)
    for trial in range(20):
        w = rng.randint(1, 9)   # odd widths exercise BMP stride padding
        h = rng.randint(1, 7)
        px = [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(w * h)
        ]
        rows = [px[r * w : (r + 1) * w] for r in range(h)]
        bmp = _bmp24(w, h, [[(b, g, r) for (r, g, b) in row] for row in rows])
        want = (
            w * h,
            sum(p[0] for p in px),
            sum(p[1] for p in px),
            sum(p[2] for p in px),
        )
        assert _pixel_stats_bmp(bmp) == want, (trial, w, h)

        p3 = ("P3\n%d %d\n255\n" % (w, h)).encode() + " ".join(
            " ".join(map(str, p)) for p in px
        ).encode()
        assert _pixel_stats_ppm(p3) == want, (trial, w, h)
        p6 = b"P6\n%d %d\n255\n" % (w, h) + b"".join(bytes(p) for p in px)
        assert _pixel_stats_ppm(p6) == want, (trial, w, h)

        n = rng.randint(1, 60)
        samples = [rng.randint(-32768, 32767) for _ in range(n)]
        data = b"".join(_st.pack("<h", s) for s in samples)
        wav = (
            b"RIFF" + _st.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + _st.pack("<I", 16)
            + _st.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
            + b"data" + _st.pack("<I", len(data)) + data
        )
        assert _audio_stats_wav(wav) == (
            n,
            sum(abs(s) for s in samples),
            sum(s * s for s in samples),
            max(abs(s) for s in samples),
        ), trial
