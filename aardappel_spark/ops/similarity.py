"""Similarity search over embedding columns (array<float>).

Two tiers:
  * brute_force_topk — exact cosine top-k for ONE query vector: a
    broadcast of the query + one JVM-side pass over the corpus (zip_with
    / aggregate), no shuffle until the final top-k (which is a
    TakeOrdered, not a sort of the corpus).
  * lsh_bucket_topk — random-hyperplane LSH: deterministic
    pseudo-random hyperplanes derived from md5 bits give each vector a
    signature; candidates share the query's bucket (equi-join), then
    exact cosine re-ranks. The scale path: at 100 TB the bucket join
    prunes ~(1 - 2^-bits) of the corpus before any arithmetic.

All math in double precision with explicit casts so results are
reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..localrel import empty_df, local_df


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    vectors: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Exact cosine top-k neighbors of the vector with ``query_id``.

    Output: id, extra cols, sim (rounded to 4 — stable across engines).
    """
    v = vectors.withColumn("_v", F.col(vec_col).cast("array<double>"))
    q = v.filter(F.col(id_col) == query_id).select(F.col("_v").alias("_q"))
    out = (
        v.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            *[F.col(c) for c in (extra_cols or [])],
            F.round(cosine(F.col("_v"), F.col("_q")), 4).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.col(id_col))
        .limit(k)
    )
    return out


def cosine_neardup_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int = 100_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, EXACT tier: all pairs with
    cosine >= threshold. Norms are precomputed per vector so the O(n^2)
    stage does one dot product per pair. This is the ONLY cartesian
    product in the codebase — it refuses inputs above ``max_rows``
    (n^2 pair arithmetic is never the 100 TB path) so it can't silently
    ship at scale; use ``cosine_neardup_pairs_blas`` for the exact tier
    or ``cosine_neardup_lsh`` for the approximate scale tier instead."""
    n = vectors.count()
    if n > max_rows:
        raise ValueError(
            f"cosine_neardup_pairs is the all-pairs small tier ({n} rows > "
            f"max_rows={max_rows}): use cosine_neardup_pairs_blas (exact, "
            "block-partitioned) or cosine_neardup_lsh (approximate) at scale"
        )
    v = vectors.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).withColumn("_n", _norm(F.col("_v")))
    a = v.select(
        F.col("_id").alias("id_a"), F.col("_v").alias("_va"), F.col("_n").alias("_na")
    )
    b = v.select(
        F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb")
    )
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    sim = _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    return (
        pairs.withColumn("sim", sim)
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 3).alias("sim"))
    )


def cosine_neardup_pairs_blas(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_rows: int = 65536,
) -> DataFrame:
    """Exact near-dup pairs via BLOCK-PARTITIONED vectorized matmul.

    The corpus is split into ``ceil(n / block_rows)`` deterministic blocks
    (``pmod(xxhash64(id), n_blocks)``). The outer loop broadcasts ONE
    normalized block at a time (driver memory is O(block_rows * dims),
    never O(corpus)); ``mapInPandas`` streams the full corpus through a
    ``A_batch @ block.T`` numpy kernel per Arrow batch. The
    ``id_a < id_b`` mask emits each unordered pair exactly once — in the
    iteration whose broadcast block owns the LARGER id — so the union of
    the per-block results is the exact all-pairs answer with no dedup
    stage. ~20x faster than per-pair expression arithmetic
    (``cosine_neardup_pairs``), and unlike it, no cross join: total work
    is n_blocks corpus passes = O(n^2 / block) FLOPs in BLAS, the
    minimum for the exact tier.
    """
    import math
    from functools import reduce

    import numpy as np
    import pandas as pd

    spark = vectors.sparkSession
    src = vectors.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    n = src.count()
    schema = "id_a bigint, id_b bigint, sim double"
    if n == 0:
        return empty_df(spark, schema)
    n_blocks = max(1, math.ceil(n / block_rows))
    if n_blocks > 1:
        # The loop re-reads src once per block for the block collect and
        # once for the map side; cache the narrow (id, vec) projection.
        src = src.persist()
    part = F.pmod(F.xxhash64(F.col("_id")), F.lit(n_blocks))

    def one_block(b: int) -> DataFrame | None:
        rows = src.filter(part == b).collect()
        if not rows:
            # hash-empty block (possible whenever n_blocks is close to n):
            # nothing to broadcast, skip the corpus pass entirely
            return None
        ids = np.array([r[0] for r in rows], dtype=np.int64)
        mat = np.array([r[1] for r in rows], dtype=np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        b_ids = spark.sparkContext.broadcast(ids)
        b_mat = spark.sparkContext.broadcast(mat)

        def kernel(batches):
            B_ids, B = b_ids.value, b_mat.value
            for pdf in batches:
                if not len(pdf) or not len(B_ids):
                    continue
                A = np.array(list(pdf["_v"]), dtype=np.float64)
                A = A / np.linalg.norm(A, axis=1, keepdims=True)
                a_ids = pdf["_id"].to_numpy(dtype=np.int64)
                sims = A @ B.T
                ai, bi = np.nonzero(sims >= threshold)
                mask = a_ids[ai] < B_ids[bi]
                yield pd.DataFrame(
                    {
                        "id_a": a_ids[ai][mask],
                        "id_b": B_ids[bi][mask],
                        "sim": np.round(sims[ai, bi][mask], 3),
                    }
                )

        return src.mapInPandas(kernel, schema)

    parts = [df for df in (one_block(b) for b in range(n_blocks)) if df is not None]
    if not parts:
        return empty_df(spark, schema)
    return reduce(DataFrame.union, parts)


def cosine_lsh_scored_pairs(
    vectors: DataFrame,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Every LSH-bucket candidate pair with its exact UNROUNDED cosine:
    the bucket self-join + scoring stage of ``cosine_neardup_lsh``,
    factored out so consumers that differ only in what they do with
    the score (the gated 0.45 near-dup cut, the calibration histogram)
    can share ONE persisted build instead of re-running the join per
    query (guide §2.4). Rounding/thresholding stay in the consumers so
    their outputs are bit-identical to the unshared form."""
    probe = vectors.select(vec_col).first()
    if probe is None:  # empty corpus -> empty pair set, same schema
        return vectors.select(
            F.col(id_col).alias("id_a"),
            F.col(id_col).alias("id_b"),
            F.lit(0.0).alias("sim"),
        ).limit(0)
    v = (
        banded_signature_frame(vectors, 1, bits, id_col, vec_col, keep_cols=[vec_col])
        .select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
            F.element_at("_bands", 1).alias("_sig"),
        )
        .withColumn("_n", _norm(F.col("_v")))
    )
    a = v.select("_sig", F.col("_id").alias("id_a"), F.col("_v").alias("_va"), F.col("_n").alias("_na"))
    b = v.select("_sig", F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb"))
    pairs = a.join(b, "_sig").filter(F.col("id_a") < F.col("id_b"))
    sim = _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    return pairs.withColumn("sim", sim).select("id_a", "id_b", "sim")


def cosine_neardup_lsh(
    vectors: DataFrame,
    threshold: float,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scored: DataFrame | None = None,
) -> DataFrame:
    """Scale tier: candidate pairs share an LSH bucket (equi-join on the
    hyperplane signature — no cross join), then exact cosine filters.
    Recall < 1 by design (controlled by ``bits``). Pass ``scored`` (a
    materialized ``cosine_lsh_scored_pairs`` frame) to skip the join
    build; the threshold applies to the unrounded score either way."""
    if scored is None:
        scored = cosine_lsh_scored_pairs(vectors, bits, id_col, vec_col)
    return (
        scored.filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 3).alias("sim"))
    )


def hyperplane_signature(
    vec: Column, dims: int, bits: int = 8
) -> Column:
    """Deterministic random-hyperplane signature: hyperplane (b, d)
    component = +1/-1 from a bit of md5(f"{b}:{d}") computed AT PLAN
    TIME into array literals. Signature bit b = 1 iff dot(vec, plane_b)
    > 0. Higher-order functions keep the expression tree O(bits), not
    O(bits*dims) — a bits*dims chain of column ops made analysis/codegen
    the bottleneck (measured 7s at 6x64)."""
    import hashlib

    def sign(b: int, d: int) -> float:
        h = hashlib.md5(f"{b}:{d}".encode()).hexdigest()
        return 1.0 if int(h[0], 16) % 2 == 1 else -1.0

    planes = F.array(
        *[
            F.array(*[F.lit(sign(b, d)) for d in range(dims)])
            for b in range(bits)
        ]
    )
    v = vec.cast("array<double>")
    dots = F.transform(
        planes,
        lambda p: F.aggregate(
            F.zip_with(v, p, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        ),
    )
    bitvals = F.transform(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        lambda i: F.when(
            F.element_at(dots, (i + 1).cast("int")) > 0,
            F.pow(F.lit(2.0), i).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bitvals, F.lit(0).cast("long"), lambda a, x: a + x)


def lsh_bucket_topk(
    vectors: DataFrame,
    query_id: int,
    k: int = 10,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """ANN: restrict exact cosine to the query's LSH bucket.

    Recall < 1 by design; at scale, bucket size ~ N / 2^bits makes the
    re-rank cheap. Returns the same shape as brute_force_topk.
    """
    probe = vectors.select(vec_col).first()
    if probe is None:  # empty corpus (hence no query row) -> empty top-k
        return vectors.select(
            F.col(id_col),
            *[F.col(c) for c in (extra_cols or [])],
            F.lit(0.0).alias("sim"),
        ).limit(0)
    # one vectorized signature pass (n_bands=1 degenerates to the plain
    # `bits`-bit signature — same md5 planes, same bit packing as
    # hyperplane_signature, which the oracle replicates)
    sig = banded_signature_frame(
        vectors, 1, bits, id_col, vec_col,
        keep_cols=[vec_col, *(extra_cols or [])],
    ).withColumn("_sig", F.element_at("_bands", 1))
    q_sig = sig.filter(F.col(id_col) == query_id).select(
        F.col("_sig").alias("_qsig"),
        F.col(vec_col).cast("array<double>").alias("_q"),
    )
    bucket = (
        sig.filter(F.col(id_col) != query_id)
        .join(F.broadcast(q_sig), sig["_sig"] == q_sig["_qsig"])
    )
    return (
        bucket.select(
            F.col(id_col),
            *[F.col(c) for c in (extra_cols or [])],
            F.round(
                cosine(F.col(vec_col).cast("array<double>"), F.col("_q")), 4
            ).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.col(id_col))
        .limit(k)
    )


def banded_signature(
    vec: Column, dims: int, n_bands: int = 12, band_bits: int = 4
) -> Column:
    """Banded random-hyperplane signature: ``n_bands`` independent
    ``band_bits``-bit signatures as an array<long>, one per band. Plane
    (global bit b = band*band_bits + j, dim d) uses the SAME md5 sign
    convention as :func:`hyperplane_signature`, so the DuckDB oracle can
    replicate every band bit. Banding is the OR-amplified construction
    (same as MinHash LSH bands): a candidate matches if ANY band is
    equal, which raises recall without widening any single bucket —
    multi-probe via band structure rather than bit flips."""
    import hashlib

    total = n_bands * band_bits

    def sign(b: int, d: int) -> float:
        h = hashlib.md5(f"{b}:{d}".encode()).hexdigest()
        return 1.0 if int(h[0], 16) % 2 == 1 else -1.0

    planes = F.array(
        *[
            F.array(*[F.lit(sign(b, d)) for d in range(dims)])
            for b in range(total)
        ]
    )
    v = vec.cast("array<double>")
    dots = F.transform(
        planes,
        lambda p: F.aggregate(
            F.zip_with(v, p, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        ),
    )
    # band value = sum over j of (dot[band*r + j] > 0) << j
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda band: F.aggregate(
            F.sequence(F.lit(0), F.lit(band_bits - 1)),
            F.lit(0).cast("long"),
            lambda acc, j: acc
            + F.when(
                F.element_at(dots, (band * band_bits + j + 1).cast("int")) > 0,
                F.pow(F.lit(2.0), j).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        ),
    )


def _banded_planes(dims: int, n_bands: int, band_bits: int):
    """The md5-derived hyperplane sign matrix (n_bands*band_bits, dims)
    — identical bit conventions to :func:`banded_signature`."""
    import hashlib

    import numpy as np

    total = n_bands * band_bits
    planes = np.empty((total, dims))
    for b in range(total):
        for d in range(dims):
            h = hashlib.md5(f"{b}:{d}".encode()).hexdigest()
            planes[b, d] = 1.0 if int(h[0], 16) % 2 == 1 else -1.0
    return planes


def banded_signature_frame(
    vectors: DataFrame,
    n_bands: int = 12,
    band_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """(id, bands array<long>) for the whole corpus in ONE vectorized
    mapInPandas pass: each Arrow batch matmuls against the plane matrix
    (built once per task from the md5 convention). This is the hot-path
    form of :func:`banded_signature` — the 48-plane higher-order-
    function expression costs ~50 s on 5000 vectors at sf0.1, the BLAS
    matmul milliseconds; a unit test pins that the two agree bit-for-
    bit (and the DuckDB oracle replicates the same bits in SQL)."""
    import numpy as np

    keep = [c for c in (keep_cols or []) if c != id_col]
    probe = vectors.select(vec_col).first()
    if probe is None:
        out = vectors.select(id_col, *keep).limit(0)
        return out.withColumn("_bands", F.array().cast("array<bigint>"))
    dims = len(probe[0])
    planes = _banded_planes(dims, n_bands, band_bits)
    weights = 1 << np.arange(band_bits)

    def fn(iterator):
        import pandas as pd

        for pdf in iterator:
            if not len(pdf):
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=float)
            bits = (mat @ planes.T > 0).astype(np.int64)
            vals = bits.reshape(len(mat), n_bands, band_bits) @ weights
            cols = {id_col: pdf[id_col].values}
            for c in keep:
                cols[c] = pdf[c].values
            cols["_bands"] = list(vals)
            yield pd.DataFrame(cols)

    keep_schema = "".join(
        f", {f.name} {f.dataType.simpleString()}"
        for f in vectors.schema.fields
        if f.name in keep
    )
    return vectors.select(id_col, *{*keep, vec_col}).mapInPandas(
        fn, f"{id_col} bigint{keep_schema}, _bands array<bigint>"
    )


def lsh_banded_candidates(
    vectors: DataFrame,
    query_id: int,
    n_bands: int = 12,
    band_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sig: DataFrame | None = None,
) -> DataFrame:
    """Candidate ids sharing >= 1 LSH band with the query (the query id
    itself excluded). The corpus explodes to (id, band_idx, band_val)
    and equi-joins the BROADCAST query bands — no cross join, no
    nested loop; at 100 TB the corpus side shuffles nothing (broadcast
    hash join) and the distinct is over candidate ids only. ``sig``
    lets callers share one materialized signature frame across the
    top-k, candidate-count and recall consumers."""
    probe = vectors.select(vec_col).first()
    if probe is None:
        return vectors.select(F.col(id_col)).limit(0)
    if sig is None:
        sig = banded_signature_frame(vectors, n_bands, band_bits, id_col, vec_col)
    longf = sig.select(
        F.col(id_col), F.posexplode("_bands").alias("_band", "_bv")
    )
    q = longf.filter(F.col(id_col) == query_id).select("_band", "_bv")
    return (
        longf.filter(F.col(id_col) != query_id)
        .join(F.broadcast(q), ["_band", "_bv"])
        .select(id_col)
        .distinct()
    )


def lsh_banded_topk(
    vectors: DataFrame,
    query_id: int,
    k: int = 10,
    n_bands: int = 12,
    band_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: list[str] | None = None,
    sig: DataFrame | None = None,
) -> DataFrame:
    """ANN top-k via banded (OR-amplified) hyperplane LSH: exact cosine
    re-rank restricted to :func:`lsh_banded_candidates`. Same output
    shape as brute_force_topk. Raises recall far above the single-bucket
    tier (lsh_bucket_topk: recall@10 = 0.2 on the 6-bit bucket at
    sf0.01; this tier measures 0.9 at 12x4 bands with ~50% candidate
    mass — sub-brute-force, and the eval query reports the candidate
    count so the pruning is auditable). At 100 TB: raise band_bits so
    each bucket holds ~N/2^band_bits rows; candidate mass scales as
    n_bands * N / 2^band_bits for unrelated vectors."""
    probe = vectors.select(vec_col).first()
    if probe is None:
        return vectors.select(
            F.col(id_col),
            *[F.col(c) for c in (extra_cols or [])],
            F.lit(0.0).alias("sim"),
        ).limit(0)
    cand = lsh_banded_candidates(
        vectors, query_id, n_bands, band_bits, id_col, vec_col, sig=sig
    )
    qv = vectors.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).cast("array<double>").alias("_q")
    )
    return (
        vectors.join(cand, id_col, "left_semi")
        .crossJoin(F.broadcast(qv))
        .select(
            F.col(id_col),
            *[F.col(c) for c in (extra_cols or [])],
            F.round(
                cosine(F.col(vec_col).cast("array<double>"), F.col("_q")), 4
            ).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.col(id_col))
        .limit(k)
    )


def _normalize_rows(mat):
    import numpy as np

    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return mat / norms


def ivf_seed_matrix(
    vectors: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """The deterministic seed-centroid matrix ``ivf_build`` starts from:
    the ``n_centroids`` rows with the smallest ``md5(id)`` (an RNG-free
    pseudo-random sample), row-normalized. Exposed so diagnostics that
    compare seed vs refined centroids (``emb_centroid_shift``) read the
    SAME seeding as the index build instead of re-deriving it — one
    source of truth for the seed rule."""
    import numpy as np

    seed_rows = (
        vectors.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .orderBy(F.md5(F.col("_id").cast("string")), "_id")
        .limit(n_centroids)
        .collect()
    )
    if not seed_rows:
        return np.zeros((0, 0))
    return _normalize_rows(np.array([r["_v"] for r in seed_rows], dtype=np.float64))


def ivf_build(
    vectors: DataFrame,
    n_centroids: int = 16,
    refine_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Deterministic IVF index build (spherical k-means).

    Seeding is reproducible with no RNG: the ``n_centroids`` rows with
    the smallest ``md5(id)`` are a deterministic pseudo-random sample of
    the corpus. Each Lloyd iteration assigns every vector to its
    max-cosine centroid (one vectorized ``mapInPandas`` pass over the
    corpus — the centroid matrix is a broadcast, never the corpus) and
    recomputes centroids treeAggregate-style: the SAME pass emits one
    (cluster, count, sum-vector) partial per Arrow batch, and only
    those partials — O(partitions x centroids) rows of dims doubles,
    KBs at any corpus size — reach the driver for the final mean. No
    per-iteration shuffle of the corpus at all. Empty clusters keep
    their previous centroid.

    Returns ``(assigned, centroids)``: the corpus with a ``_c`` cluster
    column, and the normalized centroid matrix (numpy, driver-side —
    n_centroids x dims, tiny by construction).
    """
    import numpy as np
    import pandas as pd

    spark = vectors.sparkSession
    v = vectors.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    C = ivf_seed_matrix(vectors, n_centroids, id_col=id_col, vec_col=vec_col)
    if C.size == 0:
        # empty corpus: zero-row assignment and a (0, 0) centroid matrix
        # (the np.array of an empty list is 1-D, which would trip the
        # axis-1 normalize — the round-2 numpy empty-input trap class)
        return v.withColumn("_c", F.lit(0).cast("int")).limit(0), np.zeros((0, 0))

    def assign_with(Cn):
        b_C = spark.sparkContext.broadcast(Cn)

        def run(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                A = _normalize_rows(np.array(list(pdf["_v"]), dtype=np.float64))
                pdf = pdf.copy()
                pdf["_c"] = (A @ b_C.value.T).argmax(axis=1).astype(np.int32)
                yield pdf

        return v.mapInPandas(run, "_id bigint, _v array<double>, _c int")

    def partial_sums_with(Cn):
        b_C = spark.sparkContext.broadcast(Cn)

        def run(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                V = np.array(list(pdf["_v"]), dtype=np.float64)
                A = _normalize_rows(V)
                c = (A @ b_C.value.T).argmax(axis=1)
                out = []
                for ci in np.unique(c):
                    sel = V[c == ci]
                    out.append(
                        {
                            "_c": int(ci),
                            "_n": int(sel.shape[0]),
                            "_s": sel.sum(axis=0).tolist(),
                        }
                    )
                yield pd.DataFrame(out)

        return v.mapInPandas(run, "_c int, _n bigint, _s array<double>")

    for _ in range(refine_iters):
        partials = partial_sums_with(C).collect()
        newC = C.copy()
        dims = C.shape[1]
        sums: dict[int, "np.ndarray"] = {}
        counts: dict[int, int] = {}
        for r in partials:
            sums[r["_c"]] = sums.get(r["_c"], np.zeros(dims)) + np.array(r["_s"])
            counts[r["_c"]] = counts.get(r["_c"], 0) + r["_n"]
        for c, total in sums.items():
            newC[c] = total / counts[c]
        C = _normalize_rows(newC)

    return assign_with(C), C


def ivf_topk(
    vectors: DataFrame,
    query_id: int,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 8,
    refine_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: list[str] | None = None,
    prebuilt: tuple | None = None,
) -> DataFrame:
    """ANN via IVF: probe the query's ``n_probe`` nearest clusters, exact
    cosine re-rank inside them. Complements the hyperplane-LSH tier:
    recall is tunable by n_probe (n_probe = n_centroids degrades to exact
    brute force), and the inverted lists prune ~(1 - n_probe/n_centroids)
    of the corpus before any pairwise arithmetic. Same output shape as
    ``brute_force_topk`` so results are directly comparable.

    ``prebuilt`` takes an already-built ``(assigned, centroids)`` pair
    (ivf_build output) so the index builds ONCE per session and every
    consumer — top-k, probe curve, centroid shift, SemDeDup — shares
    it, exactly how a production deployment treats an index."""
    import numpy as np

    qrow = (
        vectors.filter(F.col(id_col) == query_id)
        .select(F.col(vec_col).cast("array<double>"))
        .first()
    )
    if qrow is None:  # no query vector (e.g. empty corpus) -> empty top-k
        return vectors.select(
            F.col(id_col),
            *[F.col(c) for c in (extra_cols or [])],
            F.lit(0.0).alias("sim"),
        ).limit(0)

    assigned, C = prebuilt if prebuilt is not None else ivf_build(
        vectors, n_centroids=n_centroids, refine_iters=refine_iters,
        id_col=id_col, vec_col=vec_col,
    )
    qv = np.array(qrow[0], dtype=np.float64)
    qn = qv / (np.linalg.norm(qv) or 1.0)
    probes = [int(c) for c in (qn @ C.T).argsort()[::-1][:n_probe]]

    q_lit = F.array(*[F.lit(float(x)) for x in qv])
    cand = assigned.filter(F.col("_c").isin(probes) & (F.col("_id") != query_id))
    if extra_cols:
        cand = cand.join(
            vectors.select(F.col(id_col).alias("_id"), *extra_cols), "_id"
        )
    return (
        cand.select(
            F.col("_id").alias(id_col),
            *[F.col(c) for c in (extra_cols or [])],
            F.round(cosine(F.col("_v"), q_lit), 4).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.col(id_col))
        .limit(k)
    )


def sq8_quantize(vec_col: Column) -> tuple[Column, Column]:
    """Symmetric int8 scalar quantization of a double array: scale
    s = max(|x_i|) (floored at 1e-30 so zero vectors quantize to zeros),
    q_i = floor(x_i * 127 / s + 0.5). Returns (q_array, scale). Every
    step is IEEE-exact and engine-portable (mul/div/floor only), so two
    engines produce bit-identical int8 codes."""
    s = F.greatest(
        F.array_max(F.transform(vec_col, lambda x: F.abs(x))), F.lit(1e-30)
    )
    # floor(x + 0.5) == round-half-up, identical in Spark and DuckDB
    q = F.transform(vec_col, lambda x: F.floor(x * F.lit(127.0) / s + F.lit(0.5)))
    return q, s


def sq8_topk(
    vectors: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Approximate top-k neighbors under int8 scalar quantization — the
    compressed-scan tier of ANN: codes are 4x smaller than float32 (16x
    smaller than float64), so a 100 TB embedding store scans 25 TB, and
    the integer dot product vectorizes. Ranking is by the INTEGER dot
    product q_doc . q_query (bigint, exact in both engines — no float
    comparison anywhere in the ordering), tie-broken by id.

    Output: id, extras, qdot (the raw integer score). The quantization
    (md5-free, pure arithmetic) is deterministic, so the result is
    oracle-gated exactly despite being an approximation of true cosine.
    """
    v = vectors.withColumn("_v", F.col(vec_col).cast("array<double>"))
    qarr, _ = sq8_quantize(F.col("_v"))
    v = v.withColumn("_q", qarr)
    qrow = v.filter(F.col(id_col) == query_id).select(F.col("_q").alias("_qq"))
    dot = F.aggregate(
        F.zip_with(F.col("_q"), F.col("_qq"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        v.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(qrow))
        .select(
            F.col(id_col),
            *[F.col(c) for c in (extra_cols or [])],
            dot.alias("qdot"),
        )
        .orderBy(F.desc("qdot"), F.col(id_col))
        .limit(k)
    )


def pq_build(
    vectors: DataFrame,
    m_sub: int = 8,
    k_sub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Deterministic PQ index build: trains the ``m_sub`` x ``k_sub``
    codebook (md5-seeded + one Lloyd iteration per subspace, Euclidean
    — PQ's metric) and encodes the FULL corpus to ``m_sub``-code
    arrays. This is index-build-time work, done once and shared by
    every consumer (ann_pq, the IVFADC composition, their recall
    evals) exactly like ivf_build: training partials and codes come
    from ``mapInPandas`` passes with the codebook as a broadcast — the
    corpus never collects, never re-shuffles.

    Returns ``(codes, C)``: the ``(_id, _code)`` frame and the
    ``(m_sub, k_sub, d_sub)`` numpy codebook (driver-side, tiny)."""
    import numpy as np
    import pandas as pd

    spark = vectors.sparkSession
    v = vectors.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    seed_rows = (
        v.orderBy(F.md5(F.col("_id").cast("string")), "_id").limit(k_sub).collect()
    )
    if not seed_rows:
        # empty corpus: zero-row codes and an all-zero codebook (the
        # np.array-of-empty-list 1-D trap class — never reshape it)
        codes = v.select("_id").withColumn(
            "_code", F.expr("CAST(array() AS array<bigint>)")
        ).limit(0)
        return codes, np.zeros((m_sub, k_sub, 0))
    S = np.array([r["_v"] for r in seed_rows], dtype=np.float64)
    dims = S.shape[1]
    d_sub = dims // m_sub
    # C[m] = k_sub centroids of subspace m, initialized from the seeds
    C = S.reshape(k_sub, m_sub, d_sub).transpose(1, 0, 2).copy()

    def partials_with(Cn):
        b_C = spark.sparkContext.broadcast(Cn)

        def run(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                V = np.array(list(pdf["_v"]), dtype=np.float64)
                Vs = V.reshape(len(V), m_sub, d_sub)
                out = []
                for m in range(m_sub):
                    D = ((Vs[:, m, None, :] - b_C.value[m][None, :, :]) ** 2).sum(
                        axis=2
                    )
                    a = D.argmin(axis=1)
                    for c in np.unique(a):
                        sel = Vs[a == c, m, :]
                        out.append(
                            {
                                "_m": int(m),
                                "_c": int(c),
                                "_n": int(sel.shape[0]),
                                "_s": sel.sum(axis=0).tolist(),
                            }
                        )
                yield pd.DataFrame(out)

        return v.mapInPandas(run, "_m int, _c int, _n bigint, _s array<double>")

    # one Lloyd iteration: O(partitions x m_sub x k_sub) partial rows
    # reach the driver; empty clusters keep their seed centroid
    agg: dict[tuple[int, int], tuple] = {}
    for r in partials_with(C).collect():
        key = (r["_m"], r["_c"])
        s, n = agg.get(key, (np.zeros(d_sub), 0))
        agg[key] = (s + np.array(r["_s"]), n + r["_n"])
    newC = C.copy()
    for (m, c), (s, n) in agg.items():
        newC[m, c] = s / n
    C = newC

    b_C = spark.sparkContext.broadcast(C)

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(list(pdf["_v"]), dtype=np.float64)
            Vs = V.reshape(len(V), m_sub, d_sub)
            codes = np.stack(
                [
                    ((Vs[:, m, None, :] - b_C.value[m][None, :, :]) ** 2)
                    .sum(axis=2)
                    .argmin(axis=1)
                    for m in range(m_sub)
                ],
                axis=1,
            ).astype(np.int64)
            out = pdf[["_id"]].copy()
            out["_code"] = [row.tolist() for row in codes]
            yield out

    return v.mapInPandas(encode, "_id bigint, _code array<bigint>"), C


def pq_topk(
    vectors: DataFrame,
    query_id: int,
    k: int = 10,
    m_sub: int = 8,
    k_sub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: list[str] | None = None,
    candidates: DataFrame | None = None,
    prebuilt: tuple | None = None,
) -> DataFrame:
    """ANN via product quantization: the vector splits into ``m_sub``
    subspaces, each trained to a ``k_sub``-centroid codebook (same
    deterministic md5-seeded + one-Lloyd-iteration recipe as
    ``ivf_build``, but Euclidean per subspace, which is PQ's metric);
    every vector compresses to ``m_sub`` codes (3 bits each here — at
    scale this is the 64x memory story: 8 bytes of codes standing in
    for 512 bytes of float64s), and the query ranks candidates by the
    ADC lookup-table sum instead of touching raw vectors.

    Shapes for 100 TB: training partials and codes come from
    ``mapInPandas`` passes with the codebook as a broadcast (the corpus
    never collects, never re-shuffles); the ADC scoring is a pure
    column expression over the code arrays (zip_with against a literal
    lookup table) ending in a TakeOrdered. Everything is deterministic
    — seeding, argmin tie order (smallest code), empty-cluster carry —
    so the full pipeline is replicated in the DuckDB oracle and the
    result is hash-gated like the other ANN tiers.

    ``candidates`` (a frame with one ``_id`` column) restricts ADC
    SCORING to those ids while training and encoding still see the
    full corpus — the IVFADC composition (ivfpq_topk / ann_ivfpq):
    the coarse quantizer's probed inverted lists are the candidates,
    and at scale the codes live partitioned BY coarse cluster so the
    probe reads only those partitions instead of joining.

    ``prebuilt`` takes an already-built ``(codes, codebook)`` pair
    (pq_build output) so the index builds ONCE per session — training
    and encoding are index-time jobs, not per-query work.
    """
    import numpy as np

    v = vectors.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    qrow = v.filter(F.col("_id") == query_id).select("_v").first()
    if qrow is None:
        return vectors.select(
            F.col(id_col),
            *[F.col(c) for c in (extra_cols or [])],
            F.lit(0.0).alias("adc"),
        ).limit(0)

    codes, C = prebuilt if prebuilt is not None else pq_build(
        vectors, m_sub=m_sub, k_sub=k_sub, id_col=id_col, vec_col=vec_col
    )
    m_sub, d_sub = C.shape[0], C.shape[2]

    qv = np.array(qrow[0], dtype=np.float64)
    Qs = qv.reshape(m_sub, d_sub)
    lut = ((Qs[:, None, :] - C) ** 2).sum(axis=2)  # (m_sub, k_sub)
    lut_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in row]) for row in lut]
    )
    picked = F.zip_with(
        F.col("_code"),
        lut_lit,
        lambda c, row: F.element_at(row, (c + F.lit(1)).cast("int")),
    )
    score = F.aggregate(picked, F.lit(0.0), lambda a, x: a + x)

    if candidates is not None:
        codes = codes.join(candidates.select("_id"), "_id")
    out = codes.filter(F.col("_id") != query_id).withColumn(
        "adc", F.round(score, 6)
    )
    if extra_cols:
        out = out.join(
            vectors.select(F.col(id_col).alias("_id"), *extra_cols), "_id"
        )
    return (
        out.select(
            F.col("_id").alias(id_col),
            *[F.col(c) for c in (extra_cols or [])],
            "adc",
        )
        .orderBy(F.asc("adc"), F.col(id_col))
        .limit(k)
    )


def ivfpq_topk(
    vectors: DataFrame,
    query_id: int,
    k: int = 10,
    n_probe: int = 4,
    m_sub: int = 8,
    k_sub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: list[str] | None = None,
    prebuilt: tuple | None = None,
    prebuilt_pq: tuple | None = None,
) -> DataFrame:
    """IVFADC — the composed IVF + PQ index (Jegou, Douze & Schmid,
    "Product Quantization for Nearest Neighbor Search", TPAMI 2011):
    the IVF coarse quantizer prunes the corpus to the query's
    ``n_probe`` inverted lists, then the PQ ADC lookup-table distance
    ranks ONLY those lists' members. This is the billion-scale recipe
    every production ANN system ships (FAISS IVFxx,PQyy): the coarse
    step cuts candidates ~n_probe/n_centroids, the fine step scans
    8-byte codes instead of raw vectors — together ~64x less data
    touched per query than a brute-force float scan, with recall
    dialed by n_probe exactly like the plain IVF tier.

    This is the no-residual IVFADC variant (PQ codes quantize raw
    vectors, not r = x - q1(x)); the residual refinement changes the
    codebook training input, not the plan shape. Both stages reuse the
    session-shared artifacts: ``prebuilt`` takes the ivf_build output
    so the coarse index builds once, and PQ training/encoding stay
    full-corpus (index-build-time work), so the per-query cost is the
    probe + code scan only. Deterministic end to end — oracle-gated
    like every other tier."""
    import numpy as np

    assigned, C = prebuilt if prebuilt is not None else ivf_build(
        vectors, id_col=id_col, vec_col=vec_col
    )
    qrow = (
        vectors.filter(F.col(id_col) == query_id)
        .select(F.col(vec_col).cast("array<double>"))
        .first()
    )
    if qrow is None or getattr(C, "size", 0) == 0:
        # empty corpus / missing query: pq_topk's empty path applies
        return pq_topk(
            vectors, query_id=query_id, k=k, m_sub=m_sub, k_sub=k_sub,
            id_col=id_col, vec_col=vec_col, extra_cols=extra_cols,
            prebuilt=prebuilt_pq,
        )
    qv = np.array(qrow[0], dtype=np.float64)
    qn = qv / (np.linalg.norm(qv) or 1.0)
    dps = qn @ C.T
    # ties break toward the SMALLER cluster id (the oracle's
    # row_number ORDER BY dp DESC, cid) — lexsort, not argsort-reverse
    order = np.lexsort((np.arange(len(dps)), -dps))
    probes = [int(c) for c in order[:n_probe]]
    cand = assigned.filter(F.col("_c").isin(probes)).select("_id")
    return pq_topk(
        vectors, query_id=query_id, k=k, m_sub=m_sub, k_sub=k_sub,
        id_col=id_col, vec_col=vec_col, extra_cols=extra_cols,
        candidates=cand, prebuilt=prebuilt_pq,
    )


def knn_graph_banded(
    vectors: DataFrame,
    k: int = 5,
    n_bands: int = 12,
    band_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sig: DataFrame | None = None,
) -> DataFrame:
    """k-NN graph over banded-LSH candidates, scored bucket-locally.

    Candidate generation AND scoring both happen inside each (band,
    value) bucket: the corpus ships its vectors once per band
    membership (n_bands x N narrow rows), each bucket computes a dense
    numpy Gram matrix of its members, and only (id_a, id_b, dot) rows —
    24 bytes, not 2 x dims x 8 — leave the bucket. The naive
    alternative (distinct pairs joined back to two full vector columns)
    shuffles every candidate pair's BOTH vectors: measured 5.5 s vs
    ~1.5 s at sf0.1, and the gap widens linearly with dims. Duplicate
    pairs from multi-band collisions collapse with max() (the dots are
    identical); norms join as scalars; the top-k cut is a window
    partitioned by the source vector, ranked on the ROUNDED similarity
    with id tie-breaks so engine float ulps cannot reorder ranks.

    At 100 TB: band_bits dials bucket occupancy (~N / 2^band_bits per
    band); per-bucket work is m^2 dots and the Gram matmul is BLAS."""
    import numpy as np
    import pandas as pd

    if sig is None:
        sig = banded_signature_frame(vectors, n_bands, band_bits, id_col, vec_col)
    v = vectors.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    member = (
        sig.select(F.col(id_col).alias("_id"), F.posexplode("_bands").alias("_band", "_bv"))
        .join(v, "_id")
    )

    def bucket_dots(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "dot": []}).astype(
                {"id_a": "int64", "id_b": "int64", "dot": "float64"}
            )
        ids = pdf["_id"].to_numpy()
        M = np.array(pdf["_v"].tolist(), dtype=np.float64)
        G = M @ M.T
        n = len(ids)
        ia, ib = np.where(~np.eye(n, dtype=bool))
        return pd.DataFrame(
            {"id_a": ids[ia], "id_b": ids[ib], "dot": G[ia, ib]}
        )

    dots = (
        member.groupBy("_band", "_bv")
        .applyInPandas(bucket_dots, "id_a bigint, id_b bigint, dot double")
        .groupBy("id_a", "id_b")
        .agg(F.max("dot").alias("dot"))
    )
    norms = v.select("_id", _norm(F.col("_v")).alias("nrm"))
    na = norms.select(F.col("_id").alias("id_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("_id").alias("id_b"), F.col("nrm").alias("nb"))
    scored = (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 4).alias("sim"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("id_a").orderBy(F.desc("sim"), F.asc("id_b"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id_a").alias(id_col),
            F.col("id_b").alias("neighbor"),
            F.col("rank").cast("int").alias("rank"),
            "sim",
        )
    )


def ivf_probe_curve(
    vectors: DataFrame,
    query_id: int,
    k: int = 10,
    n_centroids: int = 16,
    probe_counts: tuple[int, ...] = (1, 2, 4, 8, 16),
    refine_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prebuilt: tuple | None = None,
) -> DataFrame:
    """Recall-vs-n_probe sweep for the IVF tier: one row per probe
    count with the candidate mass it scans and its recall@k against
    exact brute force — the tuning curve an operator reads before
    picking n_probe for a production index (the dedup_threshold_curve
    of the ANN story).

    ONE index build and ONE exact-cosine scoring pass serve every
    probe count: each vector gets its centroid's rank in the query's
    probe-preference order, the corpus crosses a broadcast ``len(
    probe_counts)``-row frame (candidates(P) = rank <= P, so the
    nested candidate sets come from one non-equi broadcast join, never
    len(probe_counts) rescans), and per-P top-k is one window over the
    exploded frame. The explode is bounded by len(probe_counts) x
    corpus — an eval-time cost, and the scan stays distributed.

    Ranking is on the ROUNDED sim with vec_id tie-break (the tier
    discipline), so both engines select identical top-k sets."""
    import numpy as np

    spark = vectors.sparkSession
    out_schema = (
        "n_probe int, n_candidates bigint, n_hit bigint, recall double"
    )
    qrow = (
        vectors.filter(F.col(id_col) == query_id)
        .select(F.col(vec_col).cast("array<double>"))
        .first()
    )
    if qrow is None:
        return empty_df(spark, out_schema)

    assigned, C = prebuilt if prebuilt is not None else ivf_build(
        vectors, n_centroids=n_centroids, refine_iters=refine_iters,
        id_col=id_col, vec_col=vec_col,
    )
    qv = np.array(qrow[0], dtype=np.float64)
    qn = qv / (np.linalg.norm(qv) or 1.0)
    # argsort()[::-1] breaks score ties by HIGHER cid first — replayed in
    # the oracle as ORDER BY dp DESC, cid DESC (the ann_ivf convention)
    order = (qn @ C.T).argsort()[::-1]
    rank_of_cid = {int(c): r + 1 for r, c in enumerate(order)}
    rank_map = F.create_map(
        *[F.lit(x) for c, r in rank_of_cid.items() for x in (c, r)]
    )

    q_lit = F.array(*[F.lit(float(x)) for x in qv])
    scored = (
        assigned.filter(F.col("_id") != query_id)
        .select(
            "_id",
            rank_map[F.col("_c")].alias("_r"),
            F.round(cosine(F.col("_v"), q_lit), 4).alias("sim"),
        )
    )
    bf = (
        brute_force_topk(vectors, query_id=query_id, k=k, id_col=id_col,
                         vec_col=vec_col)
        .select(F.col(id_col).alias("_id"), F.lit(1).alias("_bf"))
    )
    probes_df = local_df(
        spark, [(int(p),) for p in probe_counts], "n_probe int"
    )
    # barrier: the candidate counts and the per-P top-k both consume the
    # scored frame; one scoring pass over the corpus, not two
    ex = scored.localCheckpoint(eager=False).join(
        F.broadcast(probes_df), F.col("_r") <= F.col("n_probe")
    )

    from pyspark.sql.window import Window

    w = Window.partitionBy("n_probe").orderBy(F.desc("sim"), F.asc("_id"))
    topk = (
        ex.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .join(F.broadcast(bf), "_id", "left")
        .groupBy("n_probe")
        .agg(F.sum(F.coalesce(F.col("_bf"), F.lit(0))).alias("n_hit"))
    )
    ncand = ex.groupBy("n_probe").agg(F.count("*").alias("n_candidates"))
    return (
        probes_df.join(ncand, "n_probe")
        .join(topk, "n_probe")
        .select(
            "n_probe",
            F.col("n_candidates").cast("bigint").alias("n_candidates"),
            F.col("n_hit").cast("bigint").alias("n_hit"),
            F.round(F.col("n_hit") / F.lit(float(k)), 6).alias("recall"),
        )
    )
