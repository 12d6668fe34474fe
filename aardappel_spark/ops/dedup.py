"""Deduplication operators: exact, MinHash(+LSH banding), SimHash.

Scale design notes (the whole point of these at 100 TB):
  * exact dedup = one hash-aggregate on the text hash — never groupBy the
    full text at scale; md5 keys keep shuffle rows small;
  * minhash signatures are computed in one explode + hash-agg pass
    (per-token md5s, min per salt) — linear, no cross-doc work;
  * candidate pairs come from LSH BAND self-joins (equi-join on a band
    key), never an all-pairs cross join; band width trades recall vs
    join fan-out;
  * everything is built-in JVM functions — md5/min/concat — no UDFs.

MinHash here uses deterministic "salted md5" hash families so results are
reproducible across engines (and oracle-checkable in SQL): h_k(token) =
md5(k || token); the signature component is the lexicographic MIN hex
digest. This is a valid min-wise family for Jaccard estimation over the
token set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokenize, tokens_col


def shingles_col(text_col: str = "text", k: int = 3) -> F.Column:
    """Word k-gram shingles. Shingling (vs raw tokens) is what keeps
    MinHash discriminative on small vocabularies: the shingle space is
    |V|^k, so unrelated docs share almost no shingles and LSH bands
    don't collapse into quadratic candidate blowup. Texts shorter than
    k words hash as one whole-text shingle.

    Built by zipping the token array with its k-1 shifted selves —
    higher-order-function INPUTS evaluate once per row, where the
    previous slice-inside-a-transform-lambda re-ran the tokenization
    per shingle (O(tokens^2) per document; the rewrite measured the
    MinHash signature build 3.4s -> ~1s at sf0.1)."""
    toks = tokens_col(text_col)
    n = F.size(toks)
    cnt = n - (k - 1)
    sh = F.slice(toks, 1, cnt)
    for i in range(1, k):
        sh = F.zip_with(
            sh,
            F.slice(toks, i + 1, cnt),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    whole = F.array(F.array_join(toks, " "))
    return F.when(n < k, whole).otherwise(sh)


def exact_dedup_groups(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Group identical texts: representative id (min) + copy count.
    Keyed on md5(text) so the shuffle carries 32-byte keys, not documents.
    """
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("h"))
        .groupBy("h")
        .agg(
            F.min(id_col).alias("rep_doc_id"),
            F.count("*").alias("n_copies"),
        )
        .drop("h")
    )


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one representative row per distinct text (lowest id wins)."""
    reps = exact_dedup_groups(docs, id_col, text_col).select(
        F.col("rep_doc_id").alias(id_col)
    )
    return docs.join(reps, id_col, "left_semi")


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 4,
    shingle_size: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc MinHash signature over the shingle set: columns
    mh0..mh{k-1} (lexicographic-min salted md5 hex digests). One explode
    + one hash-aggregate — a single shuffle keyed on doc id."""
    t = docs.select(
        F.col(id_col),
        F.explode(shingles_col(text_col, shingle_size)).alias("token"),
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(str(k)), F.col("token")))).alias(f"mh{k}")
        for k in range(num_hashes)
    ]
    return t.groupBy(id_col).agg(*aggs)


def minhash_candidate_pairs(
    docs: DataFrame,
    num_hashes: int = 4,
    band_size: int = 2,
    shingle_size: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    sig: DataFrame | None = None,
) -> DataFrame:
    """LSH banding: docs sharing ALL components of any band are candidate
    near-duplicates. Bands of ``band_size`` consecutive signature
    components; each band is an equi-join key (no cross join anywhere).

    Returns distinct (doc_a, doc_b) with doc_a < doc_b.
    """
    if sig is None:
        sig = minhash_signatures(docs, num_hashes, shingle_size, id_col, text_col)
    bands = [
        F.concat_ws("|", *[F.col(f"mh{k}") for k in range(b, b + band_size)]).alias(
            "band_key"
        )
        for b in range(0, num_hashes, band_size)
    ]
    pairs = None
    for i, band in enumerate(bands):
        keyed = sig.select(F.col(id_col), band, F.lit(i).alias("band_id"))
        p = (
            keyed.alias("l")
            .join(keyed.alias("r"), ["band_key", "band_id"])
            .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            .select(
                F.col(f"l.{id_col}").alias("doc_a"),
                F.col(f"r.{id_col}").alias("doc_b"),
            )
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.distinct()


def verify_pairs_jaccard(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Verification stage after LSH: exact token-set Jaccard for each
    candidate pair. The expensive set math runs only on candidates (the
    LSH output), never all-pairs — this is what makes near-dup feasible
    at corpus scale. Output: (doc_a, doc_b, jaccard)."""
    toks = _candidate_docs(docs, pairs, id_col).select(
        F.col(id_col), F.array_distinct(tokens_col(text_col)).alias("_t")
    )
    a = toks.select(F.col(id_col).alias("doc_a"), F.col("_t").alias("_ta"))
    b = toks.select(F.col(id_col).alias("doc_b"), F.col("_t").alias("_tb"))
    j = pairs.join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect("_ta", "_tb"))
    union = F.size(F.array_union("_ta", "_tb"))
    # try_divide: two empty token sets (empty/whitespace-only docs) can
    # be LSH candidates of each other; their Jaccard is undefined —
    # NULL, not an ANSI divide-by-zero crash
    return j.select(
        "doc_a",
        "doc_b",
        F.round(F.try_divide(inter.cast("double"), union), 4).alias("jaccard"),
    )


def simhash(
    docs: DataFrame,
    bits: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash over the token multiset: for each bit b, sign of
    sum(+1/-1 votes) where a token votes +1 iff bit b of its md5 is set.
    Near-duplicates have small Hamming distance between simhash values.

    Implemented as explode + conv(md5) + bit tests + one aggregation.
    ``bits`` <= 32 keeps the bit-test math in exact integer range.
    """
    t = tokenize(docs, id_col, text_col)
    # 60-bit integer from the first 15 hex chars — exact in a long
    h = F.conv(F.substring(F.md5(F.col("token")), 1, 15), 16, 10).cast("decimal(20,0)")
    t = t.withColumn("h", h.cast("long"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = t.groupBy(id_col).agg(*votes)
    sim = None
    for b in range(bits):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return agg.select(F.col(id_col), sim.cast("long").alias("simhash"))


def _candidate_docs(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Restrict docs to ids appearing in candidate pairs (left-semi).
    Verification set math then materializes token/gram arrays for the
    candidate docs ONLY — at corpus scale that is the difference between
    building n_grams for every document and for the ~2x|pairs| that LSH
    surfaced. (Catalyst reuses the pairs subtree's shuffles across the
    semi-join and the verify joins.)"""
    cand = (
        pairs.select(F.col("doc_a").alias(id_col))
        .unionByName(pairs.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    return docs.join(cand, id_col, "left_semi")


def char_ngrams_col(text_col: str | F.Column = "text", n: int = 3) -> F.Column:
    """Character n-gram set of a document (order-preserving transform on
    the raw string — no explode). Texts shorter than n characters
    contribute themselves as a single gram."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    grams = F.transform(
        F.sequence(F.lit(1), F.length(c) - (n - 1)),
        lambda i: c.substr(i, F.lit(n)),
    )
    return F.when(F.length(c) < n, F.array(c)).otherwise(grams)


def char_ngram_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """n-gram Jaccard verification: exact character-n-gram-set Jaccard
    for each candidate pair. Robust to tokenization differences (word
    Jaccard misses near-dups that differ by punctuation/spacing); like
    ``verify_pairs_jaccard`` the set math runs on LSH candidates only.
    Output: (doc_a, doc_b, ngram_jaccard)."""
    g = _candidate_docs(docs, pairs, id_col).select(
        F.col(id_col), F.array_distinct(char_ngrams_col(text_col, n)).alias("_g")
    )
    a = g.select(F.col(id_col).alias("doc_a"), F.col("_g").alias("_ga"))
    b = g.select(F.col(id_col).alias("doc_b"), F.col("_g").alias("_gb"))
    j = pairs.join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect("_ga", "_gb"))
    union = F.size(F.array_union("_ga", "_gb"))
    return j.select(
        "doc_a",
        "doc_b",
        F.round(inter.cast("double") / union, 4).alias("ngram_jaccard"),
    )


def edit_distance_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    prefix_len: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Edit-distance verification: classic Levenshtein between the two
    documents' text prefixes for each candidate pair — the string-level
    complement to the set-based Jaccard verifiers (catches near-dups
    whose edits preserve the token multiset, e.g. reorderings fail here
    but pass Jaccard, and vice versa). Levenshtein is O(len^2), which is
    exactly why it only ever runs on LSH candidates and on a bounded
    prefix, never corpus x corpus. Output: (doc_a, doc_b, edit_dist)."""
    p = _candidate_docs(docs, pairs, id_col).select(
        F.col(id_col), F.substring(F.col(text_col), 1, prefix_len).alias("_p")
    )
    a = p.select(F.col(id_col).alias("doc_a"), F.col("_p").alias("_pa"))
    b = p.select(F.col(id_col).alias("doc_b"), F.col("_p").alias("_pb"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("_pa", "_pb").cast("bigint").alias("edit_dist"),
        )
    )


def simhash_wide(
    docs: DataFrame,
    bits: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash for wide fingerprints (up to 60 bits — one exact md5-derived
    long per token). The 16-bit ``simhash`` chains one aggregate column
    per bit, which stops scaling past ~32 bits (expression-tree width);
    this variant goes long-format instead: posexplode the per-token ±1
    vote vector, sum votes per (doc, bit), rebuild the fingerprint with a
    second sum of shifted bits — linear for any bit width.

    Token occurrences are pre-aggregated to (doc, token_hash, count)
    first, weighting each vote by the count — identical result, since
    SimHash votes are additive in term frequency — so the bit votes run
    per DISTINCT token. The per-bit sums are ``bits`` conditional
    aggregate columns in ONE groupBy(doc): two shuffles total and no
    intermediate row blowup (an earlier posexplode form shuffled a
    bits x distinct-tokens long format — 3 shuffles, 60x the rows, and
    measured 2x slower at sf0.1). Spark's hash aggregate handles 60 sum
    columns fine; the width ceiling is the fingerprint's own 64-bit
    budget, not the expression tree."""
    t = tokenize(docs, id_col, text_col)
    # pre-aggregate occurrences to distinct (doc, token) BEFORE hashing:
    # md5+conv then run once per distinct token per doc instead of once
    # per occurrence (~2x fewer hash evals; measured 5.2s -> 2.7s at
    # sf0.1, bit-identical output)
    pre = t.groupBy(id_col, "token").agg(F.count("*").alias("c"))
    h = F.conv(F.substring(F.md5(F.col("token")), 1, 15), 16, 10).cast("decimal(20,0)").cast("long")
    per_tok = pre.select(F.col(id_col), h.alias("h"), "c")
    aggs = [
        F.sum(
            F.when(F.expr(f"(shiftright(h, {b}) & 1) = 1"), F.col("c")).otherwise(
                -F.col("c")
            )
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    per_doc = per_tok.groupBy(id_col).agg(*aggs)
    fp = F.lit(0).cast("long")
    for b in range(bits):
        fp = fp + F.when(
            F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return per_doc.select(F.col(id_col), fp.alias("simhash"))


def simhash_candidate_pairs(
    docs: DataFrame,
    bits: int = 60,
    n_bands: int = 4,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    sig: DataFrame | None = None,
) -> DataFrame:
    """SimHash near-duplicate pairs via Hamming-ball banding.

    Pigeonhole: two fingerprints within Hamming distance ``n_bands - 1``
    agree exactly on at least one of ``n_bands`` disjoint bit bands, so
    equi-joins on band values find every such pair with NO cross join —
    the same scale shape as MinHash LSH. Candidates are then filtered by
    exact distance ``bit_count(a ^ b) <= max_hamming``. For guaranteed
    recall keep ``max_hamming < n_bands``; larger values trade recall
    for reach. Output: (doc_a, doc_b, hamming)."""
    if bits % n_bands:
        raise ValueError("bits must divide evenly into n_bands")
    width = bits // n_bands
    mask = (1 << width) - 1
    if sig is None:
        sig = simhash_wide(docs, bits=bits, id_col=id_col, text_col=text_col)
    keyed = sig.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {n_bands - 1}),"
                f" b -> shiftright(simhash, b * {width}) & {mask})"
            )
        ).alias("band_id", "band_val"),
    )
    l = keyed.select(
        "band_id", "band_val", F.col(id_col).alias("doc_a"), F.col("simhash").alias("_sa")
    )
    r = keyed.select(
        "band_id", "band_val", F.col(id_col).alias("doc_b"), F.col("simhash").alias("_sb")
    )
    pairs = (
        l.join(r, ["band_id", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.expr("bit_count(_sa ^ _sb)").alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs


def neardup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over candidate pairs: every document gets a
    cluster_id = the smallest doc id reachable through the near-dup
    graph (singletons cluster as themselves). This is the final step of
    corpus dedup — pick min(doc_id) per cluster as the survivor.

    Algorithm: iterative min-label propagation (the Pregel/GraphX
    formulation, driver-coordinated like all iterative algorithms on
    Spark). Per iteration: one equi-join (labels into edges) + one
    hash-agg — linear in |E|, shuffles keyed on node id. Converges in
    O(diameter) rounds; near-dup components are shallow (pairs come from
    LSH bands), so the loop exits after 2-3 rounds in practice. Lineage
    is truncated with localCheckpoint per round so plans don't nest.

    ONE job per round: the old label rides the union (is-old flag) so
    the aggregation emits both the new min-label AND a changed flag,
    and the convergence probe is a sum over the lazily-checkpointed
    round frame — materialization and probe share a single action
    (the separate new-vs-old probe join doubled the per-round job
    count, which on shallow graphs IS the query's cost: label frames
    are small, fixed job latency dominates).
    """
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    edges = edges.unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    ).localCheckpoint(eager=False)
    labels = docs.select(F.col(id_col).alias("node"), F.col(id_col).alias("lbl"))
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges["dst"] == labels["node"])
            .select(F.col("src").alias("node"), "lbl")
        )
        new = (
            labels.select("node", "lbl", F.lit(1).alias("_o"))
            .unionByName(nbr.select("node", "lbl", F.lit(0).alias("_o")))
            .groupBy("node")
            .agg(
                F.min("lbl").alias("lbl"),
                # every node has exactly one is-old row, so this IS the
                # previous label — no probe join needed
                F.min(F.when(F.col("_o") == 1, F.col("lbl"))).alias("_old"),
            )
            .withColumn(
                "_chg", (F.col("lbl") != F.col("_old")).cast("bigint")
            )
            .localCheckpoint(eager=False)
        )
        changed = new.agg(F.coalesce(F.sum("_chg"), F.lit(0))).collect()[0][0]
        labels = new.select("node", "lbl")
        if changed == 0:
            break
    return labels.select(
        F.col("node").alias(id_col), F.col("lbl").alias("cluster_id")
    )


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    ngram_words: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    word n-gram with a benchmark/eval set — the overlap check run
    before training so test data doesn't leak into the train split.

    Both sides explode to word n-grams (whole-text for shorter docs);
    the benchmark gram set is distinct-ed and joined back — with a
    benchmark of normal size Catalyst broadcasts it, so the corpus
    never shuffles. Output: (id, n_contaminated_grams) for flagged
    documents only.
    """
    grams = F.explode(shingles_col(text_col, k=ngram_words)).alias("gram")
    return contamination_check_grams(
        docs.select(F.col(id_col), grams),
        benchmark.select(grams),
        id_col=id_col,
    )


def contamination_check_grams(
    corpus_grams: DataFrame,
    bench_grams: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Core of ``contamination_check`` over pre-exploded (id, gram)
    frames — callers that already materialize a shared gram frame (the
    bench's cached 4-gram explode feeds three queries) skip the
    re-explode entirely."""
    block = bench_grams.select("gram").distinct()
    return (
        corpus_grams.select(F.col(id_col), "gram")
        .join(block, "gram")
        .groupBy(id_col)
        .agg(F.count("*").cast("bigint").alias("n_contaminated_grams"))
    )


BLOOM_M = 2048  # bits in the filter
BLOOM_K = 4  # hash functions


def _bloom_bit(j: int, gram: F.Column) -> F.Column:
    """Bit index for hash j of a gram: first 28 bits of md5(j ':' gram)
    mod BLOOM_M — deterministic and replicable in any SQL engine."""
    h = F.md5(F.concat(F.lit(f"{j}:"), gram))
    return F.conv(F.substring(h, 1, 7), 16, 10).cast("long") % BLOOM_M


def bloom_contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    ngram_words: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination via a Bloom filter instead of the exact
    distinct-gram join (`contamination_check`): the benchmark's gram set
    is folded into a BLOOM_M-bit / BLOOM_K-hash filter, and a corpus gram
    is flagged when all K bits are set. At 100 TB this is the shape that
    survives: the broadcast is a fixed-size bitmap (KBs) no matter how
    many benchmark grams exist, where the exact join's broadcast grows
    with the eval suite. False positives are possible but DETERMINISTIC
    (md5 bit positions), so the output is still engine-exact and
    oracle-gated.

    Output: (id, n_flagged_grams) for documents with >= 1 flagged gram
    occurrence — a superset of the exact check's rows.
    """
    gram = F.explode(shingles_col(text_col, k=ngram_words)).alias("gram")
    probe = docs.select(
        F.col(id_col),
        F.posexplode(shingles_col(text_col, k=ngram_words)).alias("pos", "gram"),
    )
    return bloom_contamination_check_grams(
        probe, benchmark.select(gram), id_col=id_col
    )


def bloom_contamination_check_grams(
    corpus_grams: DataFrame,
    bench_grams: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Core of ``bloom_contamination_check`` over pre-exploded gram
    frames: corpus side needs (id, pos, gram) — pos gives each gram
    occurrence an identity so the all-K-bits test groups correctly."""
    uniq = bench_grams.select("gram").distinct()
    bits = None
    for j in range(BLOOM_K):
        b = uniq.select(_bloom_bit(j, F.col("gram")).alias("bit"))
        bits = b if bits is None else bits.unionByName(b)
    bits = bits.distinct().withColumn("_set", F.lit(1))

    probe = corpus_grams.select(F.col(id_col), "pos", "gram")
    probe_bits = None
    for j in range(BLOOM_K):
        pb = probe.select(id_col, "pos", _bloom_bit(j, F.col("gram")).alias("bit"))
        probe_bits = pb if probe_bits is None else probe_bits.unionByName(pb)
    hits = (
        probe_bits.join(F.broadcast(bits), "bit", "left")
        .groupBy(id_col, "pos")
        .agg(F.sum(F.coalesce(F.col("_set"), F.lit(0))).alias("_nset"))
        .filter(F.col("_nset") == BLOOM_K)
    )
    return hits.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_flagged_grams")
    )


def distinct_shingle_sets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: int = 1,
) -> DataFrame:
    """(_id, _toks): each document's DISTINCT word w-gram set (Broder
    w-shingling; ``shingle=1`` is plain words; docs shorter than w words
    get an empty array). Shared by the batch prefix-filter kernels and
    the streaming twin so tokenization can never diverge between them.

    The word array is materialized BEFORE shingling: Catalyst does not
    CSE inside higher-order-function lambdas, so slicing the split
    expression directly re-tokenizes per shingle (O(tokens^2)/doc — the
    same trap shingles_col documents); zip_with over a pre-computed
    attribute is O(tokens * w)."""
    words = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    wdf = docs.select(F.col(id_col).alias("_id"), words.alias("_w"))
    if shingle > 1:
        n = F.size(F.col("_w"))
        cnt = n - (shingle - 1)
        sh = F.slice(F.col("_w"), 1, cnt)
        for i in range(1, shingle):
            sh = F.zip_with(
                sh,
                F.slice(F.col("_w"), i + 1, cnt),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        toks = F.when(n >= shingle, sh).otherwise(
            F.array().cast("array<string>")
        )
    else:
        toks = F.col("_w")
    return wdf.select("_id", F.array_distinct(toks).alias("_toks"))


def ranked_token_frame(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: int = 1,
) -> DataFrame:
    """(_id, _st, _n): each doc's token set as an array of
    ``struct(_df, tok)`` sorted ascending by global document frequency
    (then token) — the tau-INDEPENDENT tokenize + df-census + rank
    stage both prefix-filter kernels start from. Factored out so
    consumers that run several prefix kernels over the same corpus
    (the registry runs the Jaccard and the containment audits
    back-to-back) can build and persist it once instead of paying the
    tokenize + two wide shuffles per kernel (guide §2.4: two
    operations keyed the same way share one build). The per-doc RANKS
    (array position), the PREFIX (array slice), the verify SETS
    (transform to tok) and the df census (struct field) all project
    out of this one frame."""
    tok = (
        distinct_shingle_sets(docs, id_col, text_col, shingle)
        .select("_id", F.explode("_toks").alias("tok"))
        .localCheckpoint(eager=False)
    )
    dfreq = tok.groupBy("tok").agg(F.count("*").alias("_df"))
    return (
        tok.join(dfreq, "tok")
        .groupBy("_id")
        .agg(F.array_sort(F.collect_list(F.struct("_df", "tok"))).alias("_st"))
        .withColumn("_n", F.size("_st").cast("bigint"))
    )


def setsim_prefix_pairs(
    docs: DataFrame,
    tau_num: int = 4,
    tau_den: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: int = 1,
    guard_max_candidates: int | None = None,
    ranked: DataFrame | None = None,
) -> DataFrame:
    """Exact set-similarity self-join via prefix filtering (Chaudhuri,
    Ganti & Kaushik ICDE 2006) PLUS PPJoin's length and positional
    filters (Xiao et al. WWW 2008 §3) — the database-literature answer
    to near-dup candidate generation with NO false negatives, next to
    the probabilistic MinHash/SimHash tiers. A pair with token-set
    Jaccard >= tau MUST share at least one token among each side's
    first ``p = n - ceil(tau*n) + 1`` tokens when every document orders
    its tokens by ascending global document frequency (rarest first),
    so candidates come from an equi-join on prefix tokens. Two exact
    pruning filters run inside that join:

      * LENGTH filter: J >= tau forces tau*max(n_a,n_b) <= min(n_a,n_b)
        — size-incompatible pairs never leave the join;
      * POSITIONAL filter: at a prefix-token match at 1-based ranks
        (i, j), the overlap is bounded by ``1 + min(n_a-i, n_b-j)``;
        J >= tau needs overlap ``(den+num)*|I| >= num*(n_a+n_b)``, so
        matches whose bound fails are pruned. For a truly tau-similar
        pair the FIRST common token (in global df order) sits inside
        both prefixes and has zero overlap before it, so its match
        always survives — pruning later matches loses nothing.

    tau is the exact rational tau_num/tau_den; prefix length, both
    filters and the verify step ``den*|inter| >= num*|union|`` are all
    integer arithmetic (Spark ``div``) so both engines agree at every n.

    ``shingle=w`` tokenizes into word w-grams (Broder's w-shingling)
    instead of single words: the shingle space is |V|^w, which is what
    keeps prefix tokens genuinely rare on small-vocabulary corpora.
    Docs shorter than w words produce no shingles and drop out.

    DEGENERATE-REGIME GUARD: on a token space with no rare tail (e.g.
    unigrams over a 31-word vocabulary) every prefix token has huge df
    and the candidate join degrades toward all-pairs. Before the join
    runs, the prefix-bucket candidate bound ``sum_t C(df_prefix_t, 2)``
    is measured; if it exceeds ``guard_max_candidates`` (default
    ``max(1_000_000, 200 * n_docs)``) the kernel REFUSES with the dial
    to turn (larger ``shingle``, higher tau) — mirroring the all-pairs
    refusal in ``similarity.cosine_neardup_pairs``. The n^2 regime is
    never the 100 TB path.

    Returns one row per candidate pair (id_a < id_b): token counts,
    exact intersection size, and ``verified`` (Jaccard >= tau). Scale:
    one shuffle tokenizes + ranks (per-doc window, partition-local),
    one equi-join on prefix tokens with both filters applied in-join,
    one verify join carrying the two bounded token arrays.
    """
    # barrier: the ranked frame feeds the prefix, the guard and the
    # verify sets — tokenize ONCE, never re-scan the corpus per
    # consumer (scan_audit-enforced). A caller-provided (persisted)
    # frame skips the build entirely: the tokenize + df census + rank
    # are tau-independent, so back-to-back kernels share one build.
    if ranked is None:
        ranked = ranked_token_frame(
            docs, id_col, text_col, shingle
        ).localCheckpoint(eager=False)
    # prefix length p = n - ceil(tau*n) + 1; ceil(num*n/den) via integer
    # div so both engines agree at every n (no double round-trip)
    prefix = ranked.selectExpr(
        "_id",
        "_n",
        f"slice(_st, 1, CAST(_n - (({tau_num} * _n + {tau_den - 1}) div "
        f"{tau_den}) + 1 AS INT)) AS _pre",
    ).select(
        "_id",
        "_n",
        F.posexplode("_pre").alias("_pos", "_s"),
    ).select(
        "_id",
        "_n",
        (F.col("_pos") + 1).cast("bigint").alias("_rn"),
        F.col("_s.tok").alias("tok"),
    )
    if guard_max_candidates is None or guard_max_candidates <= 0:
        # count() on the source frame, not a distinct over postings —
        # for a parquet scan this is a metadata-only job
        bound = max(1_000_000, 200 * docs.count())
    else:
        bound = guard_max_candidates
    mass_row = (
        prefix.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .selectExpr("coalesce(sum(c * (c - 1) div 2), 0) AS mass")
        .collect()
    )
    mass = mass_row[0]["mass"] if mass_row else 0
    if mass > bound:
        raise ValueError(
            f"setsim_prefix_pairs: degenerate token space — the prefix "
            f"buckets bound {mass} candidate pairs (> {bound}); the "
            f"prefix filter cannot prune a vocabulary with no rare "
            f"tail. Increase `shingle` (word w-grams grow the token "
            f"space to |V|^w) or raise tau; the all-pairs regime is "
            f"refused by design, mirroring cosine_neardup_pairs."
        )
    ub = F.lit(1) + F.least(
        F.col("a._n") - F.col("a._rn"), F.col("b._n") - F.col("b._rn")
    )
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "tok")
        .filter(
            (F.col("a._id") < F.col("b._id"))
            # length filter: tau * max(n_a, n_b) <= min(n_a, n_b)
            & (
                F.lit(tau_den) * F.least(F.col("a._n"), F.col("b._n"))
                >= F.lit(tau_num) * F.greatest(F.col("a._n"), F.col("b._n"))
            )
            # positional filter: overlap upper bound at this match must
            # still admit (den+num)*|I| >= num*(n_a+n_b)
            & (
                F.lit(tau_den + tau_num) * ub
                >= F.lit(tau_num) * (F.col("a._n") + F.col("b._n"))
            )
        )
        .select(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .distinct()
    )
    # verify sets come free off the checkpointed sorted-struct frame —
    # no second aggregation over the postings
    sets = ranked.select(
        "_id",
        F.expr("transform(_st, s -> s.tok)").alias("_toks"),
        F.col("_n"),
    )
    joined = (
        cand.join(
            sets.select(
                F.col("_id").alias("id_a"),
                F.col("_toks").alias("_ta"), F.col("_n").alias("n_a"),
            ),
            "id_a",
        )
        .join(
            sets.select(
                F.col("_id").alias("id_b"),
                F.col("_toks").alias("_tb"), F.col("_n").alias("n_b"),
            ),
            "id_b",
        )
        .withColumn(
            "n_inter", F.size(F.array_intersect("_ta", "_tb")).cast("bigint")
        )
    )
    return joined.select(
        "id_a", "id_b", "n_a", "n_b", "n_inter",
        (
            F.lit(tau_den) * F.col("n_inter")
            >= F.lit(tau_num) * (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        ).alias("verified"),
    )


def containment_prefix_pairs(
    docs: DataFrame,
    tau_num: int = 9,
    tau_den: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: int = 1,
    guard_max_candidates: int | None = None,
    ranked: DataFrame | None = None,
) -> DataFrame:
    """Exact CONTAINMENT self-join via prefix filtering — the asymmetric
    companion to ``setsim_prefix_pairs``: find every ordered pair
    (a, b), a != b, with ``|A ∩ B| / |A| >= tau`` — a short document
    (quote, boilerplate block, excerpt) living inside a longer one,
    which symmetric Jaccard structurally misses (a 50-token quote in a
    5000-token page has Jaccard ~1%, containment 100%).

    Prefix lemma for an overlap threshold ``alpha = ceil(tau * n_a)``:
    if ``|A ∩ B| >= alpha`` then B shares at least one token with A's
    first ``n_a - alpha + 1`` tokens in ANY fixed global order (else
    the intersection fits inside the remaining alpha-1 tokens).
    Candidates therefore come from an equi-join of A-side PREFIX
    postings against the FULL posting list of the b side — exact with
    no ordering assumption on B. Two in-join filters stay exact:

      * SIZE filter: ``|A ∩ B| <= n_b``, so tau*n_a <= n_b — a doc
        can't be tau-contained in one with too few distinct tokens;
      * POSITIONAL filter on the A side: at a prefix match at rank i,
        ``|A ∩ B| <= 1 + (n_a - i)`` — matches too deep in A's prefix
        to reach alpha are pruned (the first common token in global
        order survives for any truly contained pair).

    tau is the exact rational; the verify step is the integer
    cross-multiply ``den*|inter| >= num*n_a``. ``shingle=w`` tokenizes
    into word w-grams like the Jaccard kernel. The same
    degenerate-regime GUARD refuses token spaces with no rare tail
    (prefix-bucket candidate bound over ``guard_max_candidates``,
    default ``max(1_000_000, 200 * n_docs)``).

    Returns one row per candidate ordered pair: (id_a, id_b, n_a, n_b,
    n_inter, contained). Scale: one tokenize pass, one groupBy(_id)
    for the sorted token frame, one prefix-vs-postings equi-join, one
    verify join on bounded arrays — same shuffle budget as the Jaccard
    kernel with an asymmetric candidate join.
    """
    # barrier: one tau-independent tokenize + df census + rank, shared
    # with the Jaccard kernel (scan_audit-enforced); a caller-provided
    # persisted frame skips the build (guide §2.4)
    if ranked is None:
        ranked = ranked_token_frame(
            docs, id_col, text_col, shingle
        ).localCheckpoint(eager=False)
    # A-side prefix: p = n - alpha + 1, alpha = ceil(tau*n) (integer
    # div). Keeps each prefix token's _df (already inside the sorted
    # struct), which the guard below reads for free.
    prefix = ranked.selectExpr(
        "_id",
        "_n",
        f"slice(_st, 1, CAST(_n - (({tau_num} * _n + {tau_den - 1}) div "
        f"{tau_den}) + 1 AS INT)) AS _pre",
    ).select(
        "_id",
        "_n",
        F.posexplode("_pre").alias("_pos", "_s"),
    ).select(
        "_id",
        "_n",
        (F.col("_pos") + 1).cast("bigint").alias("_rn"),
        F.col("_s.tok").alias("tok"),
        F.col("_s._df").alias("_df"),
    )
    if guard_max_candidates is None or guard_max_candidates <= 0:
        bound = max(1_000_000, 200 * docs.count())
    else:
        bound = guard_max_candidates
    # asymmetric candidate bound: prefix postings x full postings per
    # token, i.e. sum_t pc_t * df_t — and since every prefix-posting
    # row of token t carries df_t in its struct, that is just
    # sum(_df) over prefix rows: one aggregate, no df-census join
    # (the old form re-aggregated the full posting stream per run)
    mass_row = prefix.selectExpr(
        "coalesce(sum(_df), 0) AS mass"
    ).collect()
    mass = mass_row[0]["mass"] if mass_row else 0
    if mass > bound:
        raise ValueError(
            f"containment_prefix_pairs: degenerate token space — the "
            f"prefix-vs-postings buckets bound {mass} candidate pairs "
            f"(> {bound}). Increase `shingle` or raise tau; the "
            f"all-pairs regime is refused by design."
        )
    full_b = ranked.select(
        F.col("_id").alias("id_b"),
        F.col("_n").alias("n_b"),
        F.explode(F.expr("transform(_st, s -> s.tok)")).alias("tok"),
    )
    cand = (
        prefix.alias("a")
        .join(full_b, "tok")
        .filter(
            (F.col("a._id") != F.col("id_b"))
            # size filter: tau * n_a <= n_b
            & (F.lit(tau_den) * F.col("n_b") >= F.lit(tau_num) * F.col("a._n"))
            # positional filter: 1 + (n_a - rn_a) must still reach alpha
            & (
                F.lit(tau_den) * (F.lit(1) + F.col("a._n") - F.col("a._rn"))
                >= F.lit(tau_num) * F.col("a._n")
            )
        )
        .select(F.col("a._id").alias("id_a"), "id_b")
        .distinct()
    )
    sets = ranked.select(
        "_id",
        F.expr("transform(_st, s -> s.tok)").alias("_toks"),
        F.col("_n"),
    )
    joined = (
        cand.join(
            sets.select(
                F.col("_id").alias("id_a"),
                F.col("_toks").alias("_ta"), F.col("_n").alias("n_a"),
            ),
            "id_a",
        )
        .join(
            sets.select(
                F.col("_id").alias("id_b"),
                F.col("_toks").alias("_tb"), F.col("_n").alias("n_b"),
            ),
            "id_b",
        )
        .withColumn(
            "n_inter", F.size(F.array_intersect("_ta", "_tb")).cast("bigint")
        )
    )
    return joined.select(
        "id_a", "id_b", "n_a", "n_b", "n_inter",
        (
            F.lit(tau_den) * F.col("n_inter")
            >= F.lit(tau_num) * F.col("n_a")
        ).alias("contained"),
    )
