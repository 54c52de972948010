"""Deduplication operators for training-data pipelines (beyond-reference):
exact, n-gram Jaccard, MinHash+LSH, SimHash. All JVM-side expressions —
shingling via split/transform, banding via explode — no Python in the hot
path.

Hashing is engine-portable by construction: ONE md5 per shingle/token
truncated to 60 bits (`md5_long`), then the k MinHash permutations come
from universal rehashing (aᵢ·h + bᵢ) mod p with p = 2³¹−1 — cheaper than
k independent string hashes (one digest per shingle instead of k) and
reproducible in any engine with md5, which is what lets the DuckDB
correctness oracle replay the exact pipeline (xxhash64 is Spark-private).

Scale design:
- exact: one hash-groupBy; the md5 key distributes uniformly.
- n-gram Jaccard: self-join on shingle. The shingle join is the skew axis
  (stop-shingles); `max_shingle_freq` drops super-frequent shingles the way
  production near-dup pipelines drop stop-grams — a documented recall
  trade-off that bounds the join fan-out at 100 TB.
- MinHash LSH: 64 hash slots, b bands × r rows; candidate pairs only join
  within equal (band, band_hash) buckets, then exact Jaccard verifies.
- SimHash: 60-bit signature from token-hash bit votes; banding on 4×15-bit
  chunks finds candidates with Hamming distance ≤ 3 cheaply (pigeonhole:
  ≤3 flipped bits leave ≥1 of 4 chunks intact), verified by
  bit_count(xor).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from .util import spread

# Mersenne prime 2³¹−1: (a·h + b) mod P stays under 2⁶² for h, a < P, so
# the arithmetic never overflows a signed 64-bit int in ANY engine (DuckDB
# raises on bigint overflow where the JVM would silently wrap).
HASH_P = 2_147_483_647

_rng = np.random.RandomState(1729)
#: Universal-hash coefficients for the 64 MinHash slots, fixed seed —
#: shared with the DuckDB oracle SQL (registry embeds them as literals).
MINHASH_A: list[int] = [int(x) for x in _rng.randint(1, HASH_P, size=64)]
MINHASH_B: list[int] = [int(x) for x in _rng.randint(0, HASH_P, size=64)]
del _rng


def md5_long(col: Column) -> Column:
    """Deterministic 60-bit non-negative hash: first 15 hex chars of md5.

    Engine-portable twin: DuckDB `CAST(('0x' || substr(md5(x), 1, 15)) AS
    BIGINT)` produces the identical value."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _rehash(base: Column, i: int) -> Column:
    """i-th universal hash of a 60-bit base hash, in [0, 2³¹−1)."""
    return (F.lit(MINHASH_A[i]) * base + F.lit(MINHASH_B[i])) % F.lit(HASH_P)


def _bucket_fold(cols: list[Column]) -> Column:
    """Order-dependent polynomial combine of per-row hash values into one
    bucket id — (…(h₀·31 + h₁) mod P …) — the mod at each step keeps every
    intermediate below 2³⁶ (overflow-safe in engines that raise)."""
    acc = cols[0]
    for c in cols[1:]:
        acc = (acc * F.lit(31) + c) % F.lit(HASH_P)
    return acc


def exact_duplicate_groups(documents: DataFrame,
                           text_col: str = "text") -> DataFrame:
    """(text_hash, n_docs, min_doc_id) for texts appearing more than once."""
    return (
        documents
        .select("doc_id", F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.min("doc_id").alias("min_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


def word_grams(text: Column, n: int, lowercase: bool,
               distinct: bool) -> Column:
    """Word n-grams of `text` as an array column (JVM transform, no UDF) —
    the shared core of `word_shingles` (dedup: distinct, case-kept) and
    `text.word_ngrams` (frequency stats: non-distinct, lowercased).

    Two load-bearing subtleties, centralized here so they can never
    drift between call sites:
    - the token array is bound as a higher-order-function lambda variable
      (one-element array wrapper), so the regex split runs ONCE per row —
      inlined it would re-execute per element_at (O(words²) regex work);
    - k < 1 is guarded explicitly: Spark's sequence(1, 0) counts DOWN, so
      an unguarded sub-n-word doc evaluates element_at past the array (an
      ANSI runtime error) instead of yielding no grams.
    """
    base = F.trim(F.lower(text)) if lowercase else F.trim(text)

    def _grams_of(toks: Column) -> Column:
        k = F.size(toks) - (n - 1)
        grams = F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]))
        if distinct:
            grams = F.array_distinct(grams)
        return F.when(k >= 1, grams) \
            .otherwise(F.array().cast("array<string>"))

    return F.element_at(
        F.transform(F.array(F.split(base, r"\s+")), _grams_of), 1)


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles as an array column."""
    return word_grams(text, n, lowercase=False, distinct=True)


def _doc_shingles(documents: DataFrame, text_col: str, n: int,
                  max_shingle_freq: int | None = None) -> DataFrame:
    """Exploded (doc_id, shingle) pairs, optionally dropping shingles that
    occur in more than `max_shingle_freq` docs (stop-gram skew guard)."""
    ds = (spread(documents)
          .select("doc_id",
                  F.explode(word_shingles(F.col(text_col), n)).alias("shingle")))
    if max_shingle_freq is not None:
        hot = (ds.groupBy("shingle").agg(F.count(F.lit(1)).alias("__f"))
               .filter(F.col("__f") > max_shingle_freq).select("shingle"))
        ds = ds.join(hot, "shingle", "left_anti")
    return ds


def ngram_jaccard_pairs(documents: DataFrame, n: int = 3,
                        threshold: float = 0.5,
                        text_col: str = "text",
                        max_shingle_freq: int | None = None) -> DataFrame:
    """(src, dst, jaccard) for doc pairs with shingle-set Jaccard ≥ threshold.

    Exact (no hashing): self-join on shingle → shared counts → sizes join.
    """
    ds = _doc_shingles(documents, text_col, n, max_shingle_freq)
    sizes = ds.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = ds.alias("a"), ds.alias("b")
    shared = (
        a.join(b, on=(F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("src"),
                 F.col("b.doc_id").alias("dst"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared
        .join(sizes.withColumnRenamed("doc_id", "src")
                   .withColumnRenamed("n_sh", "n_src"), "src")
        .join(sizes.withColumnRenamed("doc_id", "dst")
                   .withColumnRenamed("n_sh", "n_dst"), "dst")
        .withColumn("jaccard", F.col("shared")
                    / (F.col("n_src") + F.col("n_dst") - F.col("shared")))
        .filter(F.col("jaccard") >= threshold)
        .select("src", "dst", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signatures(documents: DataFrame, num_hashes: int = 64,
                       n: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, minhash array<long>): k permutations approximated by
    minima of universal rehashes of ONE md5 digest per shingle — the
    standard broadcast-free formulation, one string hash instead of k.

    Entirely map-side: the shingle array never explodes and the minima
    come from `array_min(transform(...))` per slot, so signature
    computation is a pure projection — zero shuffle, which at 100 TB
    removes the (doc, shingle) exchange that a groupBy formulation pays
    (the wide derived data stays inside the row it came from).
    """
    assert num_hashes <= len(MINHASH_A)
    hashes = F.transform(word_shingles(F.col(text_col), n),
                         lambda s: md5_long(s) % F.lit(HASH_P))
    sig = F.array(*[
        F.array_min(F.transform(F.col("__hs"), lambda h: _rehash(h, i)))
        for i in range(num_hashes)
    ])
    # two-step select: `__hs` is referenced num_hashes times, and Catalyst's
    # CollapseProject keeps non-cheap duplicated expressions in their own
    # projection, so the md5s run once per shingle, not once per slot
    return (spread(documents)
            .select("doc_id", hashes.alias("__hs"))
            .filter(F.size("__hs") > 0)  # match groupBy semantics: no rows, no sig
            .select("doc_id", sig.alias("minhash")))


def minhash_band_buckets(sig: DataFrame, num_hashes: int = 64,
                         bands: int = 16) -> DataFrame:
    """(doc_id, band, bucket): the LSH band buckets of a signature frame
    (`minhash_signatures` output) — one row per (doc, band). This IS the
    storable bucket index: signatures are append-only, so the batch tier
    persists this frame once per corpus refresh and incremental dedup
    bucket-joins new-batch buckets against it (`minhash_lsh_pairs_vs_index`)
    instead of re-signing the corpus per trigger."""
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    band_cols = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            _bucket_fold([F.element_at("minhash", b * rows + r + 1)
                          for r in range(rows)]).alias("bucket"),
        )
        for b in range(bands)
    ])
    return (sig.select("doc_id", F.explode(band_cols).alias("bb"))
            .select("doc_id", "bb.band", "bb.bucket"))


def minhash_bucket_index(documents: DataFrame, num_hashes: int = 64,
                         bands: int = 16, n: int = 3,
                         text_col: str = "text",
                         max_bucket_size: int | None = 100) -> DataFrame:
    """(doc_id, band, bucket): shingle → sign → band a corpus in one call —
    the precomputed artifact `minhash_lsh_pairs_vs_index` consumes.
    Persist/checkpoint the result; recomputing it per ingest trigger is
    exactly the corpus-sized work the index exists to avoid. Buckets
    holding more than `max_bucket_size` docs are truncated at build time
    (`_cap_hot_buckets`) — the cap is a property of the STORED artifact,
    so every probe inherits it for free."""
    return _cap_hot_buckets(
        minhash_band_buckets(
            minhash_signatures(documents, num_hashes, n, text_col),
            num_hashes, bands),
        max_bucket_size)


def _cap_hot_buckets(buckets: DataFrame,
                     max_bucket_size: int | None) -> DataFrame:
    """Drop every (band, bucket) group holding more than `max_bucket_size`
    docs — the band-bucket twin of `_doc_shingles`' stop-shingle guard.
    A skewed corpus (boilerplate, giant duplicate cliques) can make one
    bucket quadratic: a B-doc bucket contributes B² candidate pairs PER
    BAND, so an uncapped hot bucket is the one place the LSH design can
    silently regress to all-pairs. RECALL EFFECT: a near-dup clique
    larger than the cap loses its pairs in every band it floods — by
    design; cliques that size are exact/boilerplate duplicates and belong
    to the upstream hash-groupBy dedup (`exact_duplicates`), not LSH.
    MEASURED on this corpus (r10): max occupancy is 3 (sf0.01), 4
    (sf0.1), 4 (sf1) — the default cap of 100 never binds, so it changes
    no answer at any tested SF; it exists for the skewed real-corpus
    case, and the SQL oracles apply the identical truncation."""
    if max_bucket_size is None:
        return buckets
    hot = (buckets.groupBy("band", "bucket")
           .agg(F.count(F.lit(1)).alias("__f"))
           .filter(F.col("__f") > max_bucket_size)
           .select("band", "bucket"))
    return buckets.join(hot, ["band", "bucket"], "left_anti")


def minhash_lsh_pairs(documents: DataFrame, num_hashes: int = 64,
                      bands: int = 16, n: int = 3, threshold: float = 0.5,
                      text_col: str = "text",
                      max_bucket_size: int | None = 100) -> DataFrame:
    """(src, dst, jaccard): LSH-bucketed candidate generation + exact
    verification. bands*rows must equal num_hashes; with 16 bands × 4 rows
    the S-curve catches ~all pairs with J ≥ 0.5. Buckets holding more
    than `max_bucket_size` docs are skipped entirely (`_cap_hot_buckets`
    — the quadratic-hot-bucket guard; None disables)."""
    sig = minhash_signatures(documents, num_hashes, n, text_col)
    buckets = _cap_hot_buckets(
        minhash_band_buckets(sig, num_hashes, bands), max_bucket_size)
    if max_bucket_size is not None:
        # the cap makes the bucket frame a diamond (occupancy agg + both
        # sides of the candidate self-join) — pin it so the corpus-sized
        # shingle+sign pipeline runs once, not three times
        buckets = buckets.localCheckpoint()
    cand = (
        buckets.alias("x").join(
            buckets.alias("y"),
            on=(F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("src"),
                F.col("y.doc_id").alias("dst"))
        .distinct()
        .localCheckpoint()  # reused: doc restriction + final pair join
    )
    # exact verification restricted to CANDIDATE docs: semi-join the
    # shingle table down before the quadratic shingle self-join — the whole
    # point of LSH is that this set is a sliver of the corpus, so the
    # verify stage must not redo all-pairs work.
    cand_docs = (cand.select(F.col("src").alias("doc_id"))
                 .unionByName(cand.select(F.col("dst").alias("doc_id")))
                 .distinct())
    # restrict BEFORE shingling: the semi-join cannot push below the
    # shingle explode on its own, and re-tokenizing the full corpus just
    # to throw non-candidates away wastes the scan at any scale
    ds = _doc_shingles(documents.join(cand_docs, "doc_id", "left_semi"),
                       text_col, n)
    sizes = ds.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = ds.alias("a"), ds.alias("b")
    shared = (
        a.join(b, on=(F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("src"),
                 F.col("b.doc_id").alias("dst"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .join(cand, ["src", "dst"], "left_semi")
    )
    return (
        shared
        .join(sizes.withColumnRenamed("doc_id", "src")
                   .withColumnRenamed("n_sh", "n_src"), "src")
        .join(sizes.withColumnRenamed("doc_id", "dst")
                   .withColumnRenamed("n_sh", "n_dst"), "dst")
        .withColumn("jaccard", F.col("shared")
                    / (F.col("n_src") + F.col("n_dst") - F.col("shared")))
        .filter(F.col("jaccard") >= threshold)
        .select("src", "dst", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash_signatures(documents: DataFrame, bits: int = 60,
                       text_col: str = "text") -> DataFrame:
    """(doc_id, simhash long): per-token md5_long bit votes weighted by
    term frequency, sign-aggregated into a `bits`-wide signature (60 by
    default: the full md5_long width, sign-bit-free in a 64-bit long)."""
    toks = (spread(documents)
            .select("doc_id", F.explode(
                F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"))
            .groupBy("doc_id", "tok")
            .agg(F.count(F.lit(1)).alias("tf"))
            .withColumn("h", md5_long(F.col("tok"))))
    one = F.lit(1).cast("long")
    zero = F.lit(0).cast("long")
    votes = [
        F.sum(F.when(F.col("h").bitwiseAND(F.shiftleft(one, i)) != 0,
                     F.col("tf")).otherwise(-F.col("tf"))).alias(f"v{i}")
        for i in range(bits)
    ]
    v = toks.groupBy("doc_id").agg(*votes)
    sig = zero
    for i in range(bits):
        sig = sig.bitwiseOR(
            F.when(F.col(f"v{i}") > 0, F.shiftleft(one, i)).otherwise(zero))
    return v.select("doc_id", sig.alias("simhash"))


def hamming_banded_pairs(sig: DataFrame, bits_total: int, chunks: int,
                         max_hamming: int, id_col: str = "doc_id",
                         sig_col: str = "simhash") -> DataFrame:
    """(src, dst, hamming): id pairs whose `sig_col` signatures are within
    Hamming distance ≤ max_hamming — the shared pigeonhole-banding core of
    SimHash text dedup and dHash image dedup. Candidates come from
    chunk-equality buckets (distance ≤ chunks−1 ⇒ at least one of the
    `chunks` equal-width chunks matches — max_hamming above that would
    silently miss pairs, hence the assert), verified by bit_count(xor).
    Scale: candidates are a bucket-keyed equi join, never all-pairs."""
    if max_hamming > chunks - 1:  # ValueError, not assert: must survive -O
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the pigeonhole bound "
            f"chunks-1={chunks - 1}: banding would silently miss pairs")
    if bits_total % chunks != 0:
        # equal-width chunking would silently drop the top
        # bits_total % chunks bits from every band — recall still holds
        # by pigeonhole, but bucket selectivity degrades unannounced
        raise ValueError(
            f"bits_total={bits_total} is not divisible by chunks={chunks}: "
            f"the top {bits_total % chunks} bits would be left out of "
            f"every band")
    chunk_bits = bits_total // chunks
    mask = (1 << chunk_bits) - 1
    chunk_arr = F.array(*[
        F.struct(
            F.lit(c).alias("chunk"),
            F.shiftrightunsigned(F.col(sig_col), c * chunk_bits)
             .bitwiseAND(F.lit(mask)).alias("val"))
        for c in range(chunks)
    ])
    b = (sig.select(F.col(id_col).alias("__id"),
                    F.col(sig_col).alias("__sig"),
                    F.explode(chunk_arr).alias("cc"))
         .select("__id", "__sig", "cc.chunk", "cc.val"))
    cand = (
        b.alias("x").join(
            b.alias("y"),
            on=(F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.val") == F.col("y.val"))
            & (F.col("x.__id") < F.col("y.__id")))
        .select(F.col("x.__id").alias("src"),
                F.col("y.__id").alias("dst"),
                F.col("x.__sig").alias("sa"),
                F.col("y.__sig").alias("sb"))
        .distinct()
    )
    return (
        cand
        .withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("src", "dst", "hamming")
    )


def simhash_pairs(documents: DataFrame, max_hamming: int = 3,
                  text_col: str = "text") -> DataFrame:
    """(src, dst, hamming): pairs within Hamming distance ≤ max_hamming.
    Candidates via 4×15-bit chunk equality (pigeonhole: distance ≤ 3 ⇒ at
    least one of 4 chunks equal), verified by bit_count(xor)."""
    sig = simhash_signatures(documents, 60, text_col)
    return hamming_banded_pairs(sig, bits_total=60, chunks=4,
                                max_hamming=max_hamming)


def minhash_lsh_pairs_between(left: DataFrame, right: DataFrame,
                              num_hashes: int = 64, bands: int = 16,
                              n: int = 3, threshold: float = 0.5,
                              text_col: str = "text",
                              max_bucket_size: int | None = 100
                              ) -> DataFrame:
    """Incremental near-dup: (src=left doc, dst=right doc, jaccard) for
    cross-corpus pairs only — the production shape where a NEW ingest
    batch (left) is deduped against the EXISTING corpus (right) without
    re-running corpus×corpus pairs.

    Self-contained form: signs BOTH sides here, so the right (corpus)
    side pays a full shingle+sign pass per call. Per-trigger streaming
    ingest must NOT use this — precompute `minhash_bucket_index(right)`
    once per corpus refresh and call `minhash_lsh_pairs_vs_index`, which
    this function delegates to (identical results by construction).
    """
    return minhash_lsh_pairs_vs_index(
        left, right, minhash_bucket_index(right, num_hashes, bands, n,
                                          text_col, max_bucket_size),
        num_hashes=num_hashes, bands=bands, n=n, threshold=threshold,
        text_col=text_col)


def minhash_lsh_pairs_vs_index(left: DataFrame, right_docs: DataFrame,
                               right_index: DataFrame,
                               num_hashes: int = 64, bands: int = 16,
                               n: int = 3, threshold: float = 0.5,
                               text_col: str = "text") -> DataFrame:
    """(src=left doc, dst=right doc, jaccard) against a PRECOMPUTED corpus
    bucket index (`minhash_bucket_index(right_docs)`, stored/checkpointed
    by the batch tier) — the per-trigger ingest shape: only the new batch
    is shingled and signed; the corpus contributes its stored (doc_id,
    band, bucket) rows to the candidate join, and its TEXT is touched
    only for colliding docs in the exact-Jaccard verify (a key-fetch,
    pushed into the `right_docs` scan via semi-join). Batch size — never
    corpus size — bounds every stage but that key-fetch.

    `right_index` must have been built with the SAME num_hashes/bands/n —
    bucket ids are not comparable across banding configurations — and
    carries its hot-bucket cap from BUILD time (`minhash_bucket_index`
    applies `_cap_hot_buckets` once, when the artifact is stored): a hot
    standing-index bucket is the quadratic hazard every future batch
    pays again, so the truncation is part of the artifact, never a
    per-trigger corpus re-aggregation here. The batch side is
    deliberately uncapped: batch size already bounds its buckets, and
    capping it would make accept decisions depend on batch composition,
    breaking the stream≡one-shot union equivalence."""
    l_buckets = minhash_band_buckets(
        minhash_signatures(left, num_hashes, n, text_col),
        num_hashes, bands)
    cand = (
        l_buckets.alias("x").join(
            right_index.alias("y"),
            on=(F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket")))
        .select(F.col("x.doc_id").alias("src"),
                F.col("y.doc_id").alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    l_docs = cand.select(F.col("src").alias("doc_id")).distinct()
    r_docs = cand.select(F.col("dst").alias("doc_id")).distinct()
    # restrict BEFORE shingling (semi-joins don't push below the explode):
    # only colliding docs pay the re-tokenization
    ls = _doc_shingles(left.join(l_docs, "doc_id", "left_semi"),
                       text_col, n)
    rs = _doc_shingles(right_docs.join(r_docs, "doc_id", "left_semi"),
                       text_col, n)
    l_sizes = ls.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_src"))
    r_sizes = rs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_dst"))
    shared = (
        ls.alias("a").join(rs.alias("b"),
                           F.col("a.shingle") == F.col("b.shingle"))
        .groupBy(F.col("a.doc_id").alias("src"),
                 F.col("b.doc_id").alias("dst"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .join(cand, ["src", "dst"], "left_semi")
    )
    return (
        shared
        .join(l_sizes.withColumnRenamed("doc_id", "src"), "src")
        .join(r_sizes.withColumnRenamed("doc_id", "dst"), "dst")
        .withColumn("jaccard", F.col("shared")
                    / (F.col("n_src") + F.col("n_dst") - F.col("shared")))
        .filter(F.col("jaccard") >= threshold)
        .select("src", "dst", F.round("jaccard", 6).alias("jaccard"))
    )


def winnow_fingerprints(documents: DataFrame, k: int = 16, window: int = 8,
                        text_col: str = "text") -> DataFrame:
    """(doc_id, fp): winnowed substring fingerprints — the MOSS scheme
    (Schleimer/Wilkerson/Aiken, SIGMOD'03): hash every character k-gram
    of the whitespace-normalized text, then keep only each sliding
    window's MINIMUM hash. Guarantees any shared substring of length
    ≥ k + window − 1 leaves at least one shared fingerprint, while
    storing ~1/window of the k-gram hashes — substring-LEVEL dedup
    signal (copied passages), which whole-document MinHash cannot see
    when the surrounding text differs.

    All JVM-side: one explode over positions (rows ∝ text length — the
    same order as shingling), `md5_long` portable hashes, and a per-doc
    sliding MIN window (partitioned by doc_id, so it parallelizes across
    documents; trailing partial windows included — mirrored exactly by
    the oracle)."""
    from pyspark.sql import Window

    s = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    grams = (
        spread(documents)
        .select("doc_id", s.alias("__s"))
        .filter(F.length("__s") >= k)
        .select("doc_id",
                F.explode(F.sequence(
                    F.lit(1), F.length("__s") - F.lit(k - 1))).alias("pos"),
                "__s")
        .select("doc_id", "pos",
                md5_long(F.expr(f"substring(__s, pos, {k})")).alias("h"))
    )
    w = (Window.partitionBy("doc_id").orderBy("pos")
         .rowsBetween(0, window - 1))
    # True winnowing keeps the MIN of every window; the fingerprint set is
    # exactly the distinct per-window minima. (Filtering positions where
    # h == window-min instead — a previous version of this code — selects
    # only hashes minimal in the window STARTING at their own position, a
    # strict subset that loses the shared-substring guarantee: a descending
    # hash run selects nothing mid-document.)
    return (grams
            .withColumn("__wm", F.min("h").over(w))
            .select("doc_id", F.col("__wm").alias("fp"))
            .distinct())


def winnow_pairs(documents: DataFrame, k: int = 16, window: int = 8,
                 min_shared: int = 10, max_fp_freq: int | None = 20,
                 text_col: str = "text") -> DataFrame:
    """(src, dst, shared): doc pairs sharing ≥ min_shared winnowed
    fingerprints — copied-passage detection. The fingerprint self-join
    has the same skew axis as the shingle join; `max_fp_freq` drops
    fingerprints present in more than that many documents (template
    boilerplate carrying no copy signal), bounding the join at
    max_fp_freq² per fingerprint."""
    fps = winnow_fingerprints(documents, k, window, text_col)
    if max_fp_freq is not None:
        hot = (fps.groupBy("fp").agg(F.count(F.lit(1)).alias("__c"))
               .filter(F.col("__c") > max_fp_freq).select("fp"))
        fps = fps.join(F.broadcast(hot), "fp", "left_anti")
    a = fps.select(F.col("doc_id").alias("src"), "fp")
    b = fps.select(F.col("doc_id").alias("dst"), "fp")
    return (a.join(b, "fp")
            .filter(F.col("src") < F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("shared"))
            .filter(F.col("shared") >= min_shared))
