"""Text analysis, corpus statistics, and sampling/curation queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from ..sources.testdata import load_table
from ._shared import ORACLES, register
from ..operators.sketches import hll_sql as _hll_sql

# ---------------------------------------------------------------------------
# Text analysis (lang-ID, quality, tokens, fingerprint) — oracle SQL is
# generated from the same pattern constants the Spark side compiles in.
# ---------------------------------------------------------------------------

@register("lang_id", r"""
WITH c AS (
  SELECT doc_id,
       len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|it|was|for)\b')) AS c_en,
       len(regexp_extract_all(lower(text), '\b(le|la|les|des|et|une|est|dans|que|pour)\b')) AS c_fr,
       len(regexp_extract_all(lower(text), '\b(el|los|las|una|es|que|en|por|con|para)\b')) AS c_es,
       len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|von|mit|den|dem|ein)\b')) AS c_de,
       len(regexp_extract_all(lower(text), '[一-鿿]')) AS c_zh
  FROM documents
),
g AS (SELECT *, greatest(c_en, c_fr, c_es, c_de, c_zh) AS g FROM c)
SELECT doc_id,
  CASE WHEN g = 0 THEN 'unknown'
    WHEN c_en = g THEN 'en'
    WHEN c_fr = g THEN 'fr'
    WHEN c_es = g THEN 'es'
    WHEN c_de = g THEN 'de'
    WHEN c_zh = g THEN 'zh'
  END AS pred_lang
FROM g
""")
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import lang_id
    return lang_id(load_table(spark, sf_dir, "documents"))


@register("text_quality", r"""
WITH m AS (
  SELECT doc_id,
    len(regexp_extract_all(text, '\S+')) AS words,
    len(regexp_extract_all(text, '[.,;:!?]')) AS punct,
    len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|it|was|for)\b')) AS stop
  FROM documents
),
r AS (
  SELECT doc_id, words,
    CAST(punct AS DOUBLE) / greatest(words, 1) AS punct_ratio,
    CAST(stop AS DOUBLE) / greatest(words, 1) AS stop_ratio
  FROM m
)
SELECT doc_id, CAST(words AS INT) AS word_count,
  CAST(ROUND(punct_ratio, 6) AS DOUBLE) AS punct_ratio,
  CAST(ROUND(stop_ratio, 6) AS DOUBLE) AS stopword_ratio,
  CAST(ROUND(least(CAST(words AS DOUBLE) / 100.0, 1.0) * 0.5
       + (1.0 - least(punct_ratio * 10.0, 1.0)) * 0.25
       + least(stop_ratio * 5.0, 1.0) * 0.25, 6) AS DOUBLE) AS quality
FROM r
""")
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import text_quality
    return text_quality(load_table(spark, sf_dir, "documents"))


@register("doc_quality_ecdf", r"""
WITH m AS (
  SELECT doc_id,
    len(regexp_extract_all(text, '\S+')) AS words,
    len(regexp_extract_all(text, '[.,;:!?]')) AS punct,
    len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|it|was|for)\b')) AS stop
  FROM documents
),
q AS (
  SELECT doc_id,
    CAST(ROUND(least(CAST(words AS DOUBLE) / 100.0, 1.0) * 0.5
         + (1.0 - least(CAST(punct AS DOUBLE) / greatest(words, 1) * 10.0, 1.0)) * 0.25
         + least(CAST(stop AS DOUBLE) / greatest(words, 1) * 5.0, 1.0) * 0.25, 6)
      AS DOUBLE) AS quality
  FROM m
),
hist AS (SELECT quality, COUNT(*) AS c FROM q GROUP BY quality),
cum AS (SELECT quality, SUM(c) OVER (ORDER BY quality) AS cum FROM hist),
n AS (SELECT COUNT(*) AS n FROM q)
SELECT q.doc_id, q.quality,
       CAST(ROUND(CAST(cum.cum AS DOUBLE) / n.n, 6) AS DOUBLE) AS quality_pct
FROM q JOIN cum USING (quality) CROSS JOIN n
""")
def q_doc_quality_ecdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile rank of the quality score WITHOUT a global row
    sort: the 6-dp score has bounded cardinality, so the rank is a
    cum-sum over the score histogram broadcast back onto the corpus —
    the scale-safe form of "keep the top X% by quality"."""
    from ..operators.text import quality_ecdf
    return quality_ecdf(load_table(spark, sf_dir, "documents"))


@register("token_count", r"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '\S+')) AS INT) AS ws_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+')) AS INT) AS bpe_tokens
FROM documents
""")
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import token_counts
    return token_counts(load_table(spark, sf_dir, "documents"))


@register("doc_fingerprint", r"""
SELECT doc_id,
  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
FROM documents
""")
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import doc_fingerprint
    return doc_fingerprint(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Training-data curation: deterministic splits / sampling / decontamination
# ---------------------------------------------------------------------------

# hash bucket twin of operators/sampling.hash_bucket (md5_long % 1e6)
_SQL_HASH_BUCKET = ("CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) "
                    "AS BIGINT) % 1000000")


@register("doc_split_assignment", f"""
SELECT doc_id,
       CASE WHEN b < 800000 THEN 'train'
            WHEN b < 900000 THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id, {_SQL_HASH_BUCKET} AS b FROM documents)
""")
def q_doc_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment: pure map-side
    hash thresholding, stable under repartition/re-run/late data."""
    from ..operators.sampling import assign_split
    docs = load_table(spark, sf_dir, "documents")
    return assign_split(docs).select("doc_id", "split")


@register("doc_sample_exact_n", """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                         AS BIGINT) ASC, doc_id ASC) AS rn
  FROM documents)
WHERE rn <= 20
""")
def q_doc_sample_exact_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 20 docs per source, deterministic under any partitioning
    (portable md5 rank) — the eval-set builder; fraction sampling can't
    promise exact counts."""
    from ..operators.sampling import stratified_exact_n
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return stratified_exact_n(docs, 20, strata_col="source")


@register("doc_sample_weighted_exact_n", r"""
WITH m AS (
  SELECT doc_id, source,
    len(regexp_extract_all(text, '\S+')) AS words,
    len(regexp_extract_all(text, '[.,;:!?]')) AS punct,
    len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|it|was|for)\b')) AS stop
  FROM documents),
q AS (
  SELECT doc_id, source,
    CAST(ROUND(least(CAST(words AS DOUBLE) / 100.0, 1.0) * 0.5
         + (1.0 - least(CAST(punct AS DOUBLE) / greatest(words, 1) * 10.0, 1.0)) * 0.25
         + least(CAST(stop AS DOUBLE) / greatest(words, 1) * 5.0, 1.0) * 0.25, 6)
      AS DOUBLE) + 0.01 AS weight
  FROM m),
k AS (
  SELECT doc_id, source, weight,
    (ROUND(ln(2 * (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                   AS BIGINT) % 4503599627370496) + 1), 9)
     - 36.73680057) / weight AS k
  FROM q)
SELECT doc_id, source, CAST(ROUND(weight, 6) AS DOUBLE) AS weight FROM k
QUALIFY ROW_NUMBER() OVER (PARTITION BY source
                           ORDER BY k DESC, doc_id ASC) <= 5
""")
def q_doc_sample_weighted_exact_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 5 docs per source, sampled ∝ quality WITHOUT replacement
    (Efraimidis–Spirakis keys, operators/sampling.weighted_exact_n) —
    fills the gap between uniform exact-n and binomial quality-weighted
    sampling: a size-guaranteed eval set that still prefers high-quality
    documents."""
    from ..operators.sampling import weighted_exact_n
    from ..operators.text import quality_col
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source",
        (quality_col(F.col("text")) + F.lit(0.01)).alias("weight"))
    out = weighted_exact_n(docs, 5, weight_col="weight",
                           strata_col="source")
    return out.select("doc_id", "source",
                      F.round("weight", 6).alias("weight"))


@register("doc_sample_stratified", f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source, {_SQL_HASH_BUCKET} AS b FROM documents)
WHERE b < CASE WHEN source IN ('src0', 'src1') THEN 500000 ELSE 100000 END
""")
def q_doc_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing sample: 50% of the two curated sources, 10% of the
    rest — one shuffle-free deterministic filter."""
    from ..operators.sampling import stratified_sample
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        docs, {"src0": 0.5, "src1": 0.5}, default_fraction=0.1,
    ).select("doc_id", "source")


_SQL_SHINGLES4 = r"""
SELECT doc_id, unnest(list_distinct(list_transform(
         generate_series(1, greatest(len(toks) - 3, 0)),
         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS shingle
FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents WHERE source {op} 'src19')
"""


@register("decontaminate_ngram", f"""
WITH tr AS ({_SQL_SHINGLES4.format(op='<>')}),
bench AS (SELECT DISTINCT shingle FROM ({_SQL_SHINGLES4.format(op='=')}) b)
SELECT tr.doc_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM tr JOIN bench USING (shingle)
GROUP BY tr.doc_id
""")
def q_decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (the GPT-3/LLaMA recipe): training docs
    sharing any word 4-gram with the held-out slice (source src19 stands
    in for the eval set). The benchmark shingle set broadcasts; the
    training side never shuffles before the per-doc hit count."""
    from ..operators.sampling import ngram_contamination
    docs = load_table(spark, sf_dir, "documents")
    return ngram_contamination(
        docs.filter(F.col("source") != "src19"),
        docs.filter(F.col("source") == "src19"), n=4)


@register("decontaminate_bloom_pruned", f"""
WITH tr AS ({_SQL_SHINGLES4.format(op='<>')}),
bench AS (SELECT DISTINCT shingle FROM ({_SQL_SHINGLES4.format(op='=')}) b)
SELECT tr.doc_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM tr JOIN bench USING (shingle)
GROUP BY tr.doc_id
""")
def q_decontaminate_bloom_pruned(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """The Bloom-pruned-but-EXACT decontamination path
    (`sampling.bloom_pruned_contamination`, the per-trigger form the
    streaming ingest pipeline rides): the corpus probes the fixed
    256 KiB benchmark bitmap map-side, and the exact shingle verify
    joins only the Bloom survivors. The oracle is decontaminate_ngram's
    EXACT SQL — deliberately: a hash match here externally proves the
    no-false-negative pruning changes the plan, never the answer."""
    from ..operators.sampling import bloom_pruned_contamination
    docs = load_table(spark, sf_dir, "documents")
    return bloom_pruned_contamination(
        docs.filter(F.col("source") != "src19"),
        docs.filter(F.col("source") == "src19"), n=4)


@register("documents_curated", f"""
WITH lang AS ({{lang}}),
q AS ({{quality}}),
tok AS ({{tokens}}),
contam AS ({{contam}})
SELECT d.doc_id, q.quality, tok.ws_tokens
FROM documents d
JOIN lang USING (doc_id)
JOIN q USING (doc_id)
JOIN tok USING (doc_id)
LEFT JOIN contam USING (doc_id)
WHERE d.source <> 'src19'
  AND lang.pred_lang = 'en'
  AND q.quality >= 0.5
  AND tok.ws_tokens BETWEEN 50 AND 10000
  AND contam.doc_id IS NULL
""")
def q_documents_curated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation composite: language + quality + token budget +
    benchmark decontamination in ONE corpus scan plus one broadcast
    anti-join (see operators/text.curate_documents). The oracle reaches
    the same answer through explicit metric self-joins."""
    from ..operators.text import curate_documents
    docs = load_table(spark, sf_dir, "documents")
    return curate_documents(
        docs.filter(F.col("source") != "src19"),
        docs.filter(F.col("source") == "src19"))


# splice the already-registered metric oracles into the composite's CTEs
ORACLES["documents_curated"] = ORACLES["documents_curated"].format(
    lang=ORACLES["lang_id"], quality=ORACLES["text_quality"],
    tokens=ORACLES["token_count"], contam=ORACLES["decontaminate_ngram"])


@register("doc_repetition", r"""
WITH w AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
           FROM documents),
base AS (
  SELECT doc_id, len(w) AS n_words,
         CAST(ROUND(CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 6)
              AS DOUBLE) AS distinct_word_ratio
  FROM w),
bg AS (
  SELECT doc_id, unnest(list_transform(
           generate_series(1, greatest(len(w) - 1, 0)),
           i -> w[i] || ' ' || w[i+1])) AS bigram
  FROM w),
cnt AS (SELECT doc_id, bigram, COUNT(*) AS n FROM bg GROUP BY doc_id, bigram),
top AS (SELECT doc_id, MAX(n) AS top_n, SUM(n) AS total_bg
        FROM cnt GROUP BY doc_id)
SELECT b.doc_id, CAST(b.n_words AS INT) AS n_words, b.distinct_word_ratio,
  CAST(COALESCE(ROUND(CAST(top_n AS DOUBLE) / total_bg, 6), 0.0) AS DOUBLE)
    AS top_bigram_frac
FROM base b LEFT JOIN top USING (doc_id)
""")
def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: a low distinct-word ratio or one
    bigram dominating the text marks boilerplate for removal."""
    from ..operators.text import repetition_metrics
    return repetition_metrics(load_table(spark, sf_dir, "documents"))


@register("pii_scan", r"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
  CAST(len(regexp_extract_all(text,
    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ipv4,
  CAST(len(regexp_extract_all(text,
    '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS INT) AS n_phone
FROM documents
""")
def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc PII match counts (email/IPv4/phone), row-local regexes with
    identical Java-regex/RE2 semantics. The synthetic corpus is PII-free,
    so this entry pins "both engines agree nothing matches"; the value
    check on matching text lives in tests/test_operators_misc.py over a
    constructed fixture (redaction included)."""
    from ..operators.text import pii_scan
    return pii_scan(load_table(spark, sf_dir, "documents"))


@register("domain_mixture_plan", """
WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
t AS (SELECT SUM(n_docs) AS total FROM c),
w AS (SELECT source, n_docs, total,
        CASE source WHEN 'src0' THEN 0.400000 WHEN 'src1' THEN 0.300000
                    WHEN 'src2' THEN 0.200000 WHEN 'src3' THEN 0.100000
                    ELSE 0.000000 END AS wt
      FROM c CROSS JOIN t)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
  CAST(FLOOR(0.100000 * total * wt) AS BIGINT) AS target_docs,
  CAST(ROUND(LEAST(1.0, CAST(FLOOR(0.100000 * total * wt) AS DOUBLE)
                         / n_docs), 6) AS DOUBLE) AS rate
FROM w
""")
def q_domain_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture planning: per-source sampling rates that realize a
    target 40/30/20/10 mix over src0-3 within a 10%-of-corpus budget.
    DECIMAL-exact floor boundaries on both sides; one stratum groupBy plus
    a broadcast 1-row grand total."""
    from ..operators.sampling import mixture_plan
    docs = load_table(spark, sf_dir, "documents")
    return mixture_plan(
        docs, {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1},
        sample_frac=0.1)


@register("domain_mixture_temperature", r"""
WITH t AS (
  SELECT source,
         CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT)
           AS token_mass
  FROM documents GROUP BY source),
s AS (
  SELECT source, token_mass,
         CAST(ROUND(sqrt(CAST(token_mass AS DOUBLE)), 6)
              AS DECIMAL(24,6)) AS s6
  FROM t),
tot AS (SELECT SUM(s6) AS tot6, SUM(token_mass) AS mass_tot FROM s),
w AS (
  SELECT source, token_mass, mass_tot,
         ROUND(CAST(s6 AS DOUBLE) / CAST(tot6 AS DOUBLE), 6) AS weight
  FROM s CROSS JOIN tot),
tt AS (
  SELECT source, token_mass, weight,
         CAST(FLOOR((0.1 * CAST(mass_tot AS DOUBLE)) * weight) AS BIGINT)
           AS target_tokens
  FROM w)
SELECT source, token_mass, CAST(weight AS DOUBLE) AS weight, target_tokens,
  CASE WHEN token_mass > 0
       THEN CAST(ROUND(LEAST(1.0,
                             CAST(target_tokens AS DOUBLE) / token_mass), 6)
                 AS DOUBLE)
       ELSE CAST(0.0 AS DOUBLE) END AS rate
FROM tt
""")
def q_domain_mixture_temperature(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Temperature mixture (α=0.5) over TOKEN mass: weights ∝ √mass —
    the multilingual/multi-domain smoothing recipe that upweights small
    domains relative to proportional sampling, budgeted in tokens (what
    the trainer actually consumes), not documents. IEEE sqrt + 6-dp
    DECIMAL normalizer sum + same-order double products keep every
    floor boundary hash-exact across engines."""
    from ..operators.sampling import temperature_mixture_plan
    from ..operators.text import _match_count, WS_TOKEN_PATTERN
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "source",
        _match_count(F.col("text"), WS_TOKEN_PATTERN).alias("ws_tokens"))
    return temperature_mixture_plan(scored, alpha=0.5, sample_frac=0.1)


@register("doc_sample_quality_weighted", f"""
WITH q AS ({{quality}})
SELECT doc_id, quality FROM q
WHERE {_SQL_HASH_BUCKET} <
      CAST(FLOOR(CAST(quality AS DECIMAL(8,6)) * 0.900000 * 1000000)
           AS BIGINT)
""")
def q_doc_sample_quality_weighted(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Quality-weighted curation sample: keep each doc with probability
    0.9 · quality via the deterministic hash threshold (no RNG, stable
    under repartition/re-run). DECIMAL-exact threshold boundaries."""
    from ..operators.sampling import quality_weighted_sample
    from ..operators.text import quality_col
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select("doc_id", quality_col(F.col("text")).alias("quality"))
    return quality_weighted_sample(scored, base_rate=0.9)


ORACLES["doc_sample_quality_weighted"] = \
    ORACLES["doc_sample_quality_weighted"].format(
        quality=ORACLES["text_quality"])


@register("doc_shards_by_tokens", rf"""
WITH t AS (SELECT doc_id, source,
             len(regexp_extract_all(text, '\S+')) AS ws_tokens,
             {_SQL_HASH_BUCKET} AS b
           FROM documents)
SELECT doc_id, source, CAST(ws_tokens AS INT) AS ws_tokens,
  CAST(FLOOR(CAST(SUM(ws_tokens) OVER w - ws_tokens AS DOUBLE) / 2000)
       AS BIGINT) AS shard
FROM t
WINDOW w AS (PARTITION BY source ORDER BY b, doc_id
             ROWS UNBOUNDED PRECEDING)
""")
def q_doc_shards_by_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus sharding: greedy prefix packing into ~2000-token
    shards per source over a deterministic hash order — every output shard
    feeds the trainer a near-uniform token count."""
    from ..operators.sampling import shard_by_token_budget
    from ..operators.text import _match_count, WS_TOKEN_PATTERN
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source",
        _match_count(F.col("text"), WS_TOKEN_PATTERN).alias("ws_tokens"))
    return shard_by_token_budget(scored, budget=2000)


@register("corpus_top_ngrams", r"""
WITH toks AS (SELECT string_split_regex(trim(lower(text)), '\s+') AS w
              FROM documents),
grams AS (SELECT unnest(list_transform(
            generate_series(1, greatest(len(w) - 1, 0)),
            i -> w[i] || ' ' || w[i+1])) AS ngram FROM toks)
SELECT ngram, CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM grams GROUP BY ngram
ORDER BY n_occurrences DESC, ngram ASC LIMIT 50
""")
def q_corpus_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics: the 50 most frequent word bigrams
    (count desc, ngram asc tie-break) — the vocabulary-induction / BPE
    corpus-stats primitive. Top-k via TakeOrderedAndProject, no global
    sort."""
    from ..operators.text import corpus_top_ngrams
    return corpus_top_ngrams(load_table(spark, sf_dir, "documents"),
                             n=2, k=50)


@register("doc_chunk_windows", r"""
WITH d AS (SELECT doc_id,
                  list_filter(string_split_regex(trim(text), '\s+'),
                              x -> x <> '') AS w
           FROM documents),
c AS (SELECT doc_id, w,
             unnest(generate_series(0,
               GREATEST(1, CAST(CEIL((len(w) - 16) / 48.0) AS INT)) - 1))
               AS chunk_id
      FROM d)
SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
       array_to_string(list_slice(w, chunk_id * 48 + 1, chunk_id * 48 + 64),
                       ' ') AS chunk_text,
       CAST(len(list_slice(w, chunk_id * 48 + 1, chunk_id * 48 + 64)) AS INT)
         AS n_tokens
FROM c
""")
def q_doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG/retrieval chunking: 64-token windows with 16-token overlap
    (stride 48), one row per chunk, short tail kept, every doc yields at
    least one chunk. Row-local array expressions — zero shuffle."""
    from ..operators.text import chunk_documents
    return chunk_documents(load_table(spark, sf_dir, "documents"),
                           window=64, overlap=16)


@register("word_heavy_hitters", r"""
WITH toks AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
              FROM documents),
tok AS (SELECT token FROM toks WHERE token <> ''),
n AS (SELECT COUNT(*) AS total FROM tok)
SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM tok GROUP BY token
HAVING COUNT(*) >= (SELECT CEIL(0.02 * total) FROM n)
""")
def q_word_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters (tokens with >= 2% of all occurrences)
    via the two-phase Misra-Gries sketch + recount — the oracle runs the
    naive GROUP BY/HAVING, so the hash-match IS the sketch's exactness
    guarantee (operators/sketches.py)."""
    from ..operators.sketches import corpus_tokens, heavy_hitters
    toks = corpus_tokens(load_table(spark, sf_dir, "documents"))
    return heavy_hitters(toks, min_frac=0.02)


def _sql_cms_oracle() -> str:
    from ..operators.sketches import CMS_A, CMS_B, CMS_P
    depth, width = 4, 2048
    a = ", ".join(str(x) for x in CMS_A[:depth])
    b = ", ".join(str(x) for x in CMS_B[:depth])
    probes = ", ".join(f"'{w}'" for w in _CMS_PROBES)
    return rf"""
WITH toks AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
              FROM documents),
tok AS (SELECT token FROM toks WHERE token <> ''),
slots AS (
  SELECT token, d, ((a * h + b) % {CMS_P}) % {width} AS slot
  FROM (SELECT token,
               CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT)
                 % {CMS_P} AS h
        FROM tok),
       (SELECT unnest(range(0, {depth})) AS d,
               unnest([{a}]) AS a, unnest([{b}]) AS b)),
sketch AS (SELECT d, slot, COUNT(*) AS n FROM slots GROUP BY 1, 2),
probes AS (SELECT unnest([{probes}]) AS token),
pslots AS (
  SELECT token, d, ((a * h + b) % {CMS_P}) % {width} AS slot
  FROM (SELECT token,
               CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT)
                 % {CMS_P} AS h
        FROM probes),
       (SELECT unnest(range(0, {depth})) AS d,
               unnest([{a}]) AS a, unnest([{b}]) AS b)),
est AS (
  SELECT p.token, MIN(COALESCE(s.n, 0)) AS n_cms
  FROM pslots p LEFT JOIN sketch s ON s.d = p.d AND s.slot = p.slot
  GROUP BY 1),
exact AS (SELECT token, COUNT(*) AS n_exact FROM tok
          WHERE token IN ({probes}) GROUP BY 1)
SELECT p.token, CAST(COALESCE(e.n_exact, 0) AS BIGINT) AS n_exact,
       CAST(est.n_cms AS BIGINT) AS n_cms
FROM probes p LEFT JOIN exact e USING (token) JOIN est USING (token)
"""


_CMS_PROBES = ["join", "hash", "row", "batch", "scan", "customer",
               "column", "filter", "merge", "vector",
               "zzz-token-absent-from-corpus"]


@register("word_counts_cms", _sql_cms_oracle())
def q_word_counts_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch probe counts beside exact counts for a fixed
    token list — the mergeable APPROXIMATE counter for when even the
    Misra-Gries k·partitions recount is too big. The oracle replays the
    identical sketch (same md5 base + universal hashes mod width), so
    the hash-match pins the sketch construction bit-for-bit; the n_exact
    column displays the (bounded) overcount. Sketch shuffle ≤
    depth·width rows per partition at any corpus size; probing
    broadcasts the ≤ depth·width-row sketch."""
    from ..operators.sketches import (
        cms_estimate, corpus_tokens, count_min_sketch,
    )
    toks = corpus_tokens(load_table(spark, sf_dir, "documents"))
    toks = toks.localCheckpoint()  # reused: sketch build + exact recount
    sketch = count_min_sketch(toks, depth=4, width=2048)
    probes = toks.sparkSession.createDataFrame(
        [(w,) for w in _CMS_PROBES], ["token"])
    est = cms_estimate(sketch, probes, depth=4, width=2048)
    exact = (toks.join(F.broadcast(probes), "token", "left_semi")
             .groupBy("token").agg(F.count(F.lit(1)).alias("__ne")))
    return (probes
            .join(F.broadcast(exact), "token", "left")
            .join(F.broadcast(est), "token")
            .select("token",
                    F.coalesce(F.col("__ne"), F.lit(0)).alias("n_exact"),
                    F.col("n_cms")))


@register("doc_tfidf_keywords", r"""
WITH toks AS (SELECT doc_id,
                unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
              FROM documents),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, token, tfidf, CAST(rank AS INT) AS rank FROM (
  SELECT tf.doc_id, tf.token,
         CAST(ROUND(CAST(tf.tf * n.n_docs AS DOUBLE) / df.df, 6) AS DOUBLE)
           AS tfidf,
         ROW_NUMBER() OVER (
           PARTITION BY tf.doc_id
           ORDER BY ROUND(CAST(tf.tf * n.n_docs AS DOUBLE) / df.df, 6) DESC,
                    tf.token ASC) AS rank
  FROM tf JOIN df USING (token) CROSS JOIN n)
WHERE rank <= 3
""")
def q_doc_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 keywords by rational tf-idf (tf · N / df, no log —
    monotone-equivalent ranking, bit-identical across engines)."""
    from ..operators.text import tfidf_keywords
    return tfidf_keywords(load_table(spark, sf_dir, "documents"), top=3)


@register("doc_unigram_logprob", r"""
WITH toks AS (SELECT doc_id,
                unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
              FROM documents),
tk AS (SELECT * FROM toks WHERE tok <> ''),
counts AS (SELECT tok, COUNT(*) AS c FROM tk GROUP BY tok),
totals AS (SELECT SUM(c) AS t, COUNT(*) AS u FROM counts),
vocab AS (SELECT tok, CAST(ROUND(ln(c + 1), 9) AS DECIMAL(12,9)) AS logc
          FROM counts ORDER BY c DESC, tok ASC LIMIT 65536),
per_doc AS (
  SELECT tk.doc_id, COUNT(*) AS n_tokens,
         SUM(COALESCE(v.logc, CAST(0 AS DECIMAL(12,9)))) AS s
  FROM tk LEFT JOIN vocab v ON tk.tok = v.tok
  GROUP BY tk.doc_id)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(ROUND(CAST(s AS DOUBLE) / n_tokens - ln(t + u + 1), 6)
            AS DOUBLE) AS avg_logprob
FROM per_doc CROSS JOIN totals
""")
def q_doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score: per-doc mean token log-probability
    under the corpus's own Laplace-smoothed unigram LM — the cheap first
    screen of quality filtering before any learned classifier. ln is
    evaluated once per distinct vocab entry (vocab-sized, broadcast),
    per-doc sums are 9-dp decimals so the value is shuffle-order-proof."""
    from ..operators.text import unigram_logprob
    return unigram_logprob(load_table(spark, sf_dir, "documents"))


@register("doc_prefix_matches", r"""
WITH k AS (SELECT doc_id AS id, substr(trim(lower(text)), 1, 64) AS name
           FROM documents),
kb0 AS (SELECT id, name,
         array_to_string((string_split_regex(trim(name), '\s+'))[1:2], ' ')
           AS block
       FROM k),
hot AS (SELECT block FROM kb0 GROUP BY block HAVING COUNT(*) > 100),
kb AS (SELECT * FROM kb0 WHERE block NOT IN (SELECT block FROM hot))
SELECT a.id AS src, b.id AS dst,
  CAST(levenshtein(a.name, b.name) AS INT) AS distance
FROM kb a JOIN kb b ON a.block = b.block AND a.id < b.id
WHERE levenshtein(a.name, b.name) <= 24
""")
def q_doc_prefix_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution, block → verify: candidate doc pairs share their
    first two words (prefix blocking — small near-uniform blocks, no
    stop-token skew axis), then JVM levenshtein over the 64-char
    normalized prefix verifies within blocks. The all-pairs edit-distance
    join this replaces is quadratic in the corpus; this is quadratic only
    in max block size — and the oversize-block guard bounds THAT: blocks
    over 100 members (pair space already 38× from sf0.01→sf0.1 unguarded)
    are pruned on both sides. Locally exact: max observed block is 14 at
    sf0.1, so the guard changes nothing at test scale."""
    from ..operators.entity import blocked_name_matches
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring(F.trim(F.lower(F.col("text"))), 1, 64).alias("title"))
    return blocked_name_matches(docs, "doc_id", "title",
                                prefix_tokens=2, max_distance=24,
                                max_block_size=100)


@register("bpe_merge_candidates", r"""
WITH words AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
  FROM documents),
wf AS (SELECT word, COUNT(*) AS freq FROM words GROUP BY word),
pairs AS (
  SELECT unnest(list_transform(
           generate_series(1, len(word) - 1),
           i -> substr(word, i, 2))) AS pair, freq
  FROM wf WHERE len(word) >= 2)
SELECT pair, CAST(SUM(freq) AS BIGINT) AS n_occurrences
FROM pairs GROUP BY pair
ORDER BY n_occurrences DESC, pair ASC LIMIT 50
""")
def q_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, iteration 1: top-50 adjacent character
    pairs weighted by word frequency. The corpus collapses to the
    vocabulary-sized word-frequency table before the character
    expansion, so the quadratic-in-word-length stage runs over distinct
    words, not token occurrences."""
    from ..operators.text import bpe_merge_candidates
    return bpe_merge_candidates(load_table(spark, sf_dir, "documents"),
                                k=50)


def _bpe_chain_sql(n_merges: int) -> str:
    """The shared unrolled BPE-training CTE chain: each round is a
    pair-count CTE, a deterministic argmax (count desc, pair asc), and
    the greedy left-to-right merge replayed as the SAME list fold the
    Spark side runs (DuckDB list_reduce seeds with the first element;
    Spark's F.aggregate starts from an empty accumulator whose first
    step is a plain append — identical results, asserted
    value-for-value). Used by both the train and encode oracles."""
    parts = [r"""
WITH w AS (
  SELECT word, COUNT(*) AS freq FROM (
    SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
    FROM documents) WHERE word <> '' GROUP BY word),
v0 AS (
  SELECT list_transform(generate_series(1, length(word)),
                        i -> substr(word, i, 1)) AS toks, freq
  FROM w)"""]
    for k in range(1, n_merges + 1):
        parts.append(f""",
p{k} AS (
  SELECT l, r, SUM(freq) AS cnt FROM (
    SELECT toks[i] AS l, toks[i+1] AS r, freq
    FROM v{k - 1}, unnest(generate_series(1, len(toks)-1)) AS u(i))
  GROUP BY 1, 2),
m{k} AS (
  SELECT {k} AS rank, l AS lhs, r AS rhs, l || r AS merged,
         CAST(cnt AS BIGINT) AS pair_count
  FROM p{k} ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
v{k} AS (
  SELECT list_reduce(list_transform(toks, t -> [t]),
           (acc, x) -> CASE WHEN acc[-1] = m.lhs AND x[1] = m.rhs
                            THEN list_append(acc[1:length(acc)-1], m.merged)
                            ELSE list_concat(acc, x) END) AS toks, freq
  FROM v{k - 1} CROSS JOIN m{k} m)""")
    return "".join(parts)


def _bpe_train_sql(n_merges: int) -> str:
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM m{k}" for k in range(1, n_merges + 1))
    return _bpe_chain_sql(n_merges) + "\n" + union


def _bpe_encode_sql(n_merges: int) -> str:
    """Encode oracle: re-runs the training chain, then tokenizes each
    (source, word) with the learned merges — the fold nested once per
    merge rank, exactly the Spark-side chained F.aggregate."""
    inner = ("list_transform(generate_series(1, length(word)), "
             "i -> substr(word, i, 1))")
    for k in range(1, n_merges + 1):
        inner = f"""list_reduce(list_transform({inner}, t -> [t]),
          (acc, x) -> CASE WHEN acc[-1] = m{k}.lhs AND x[1] = m{k}.rhs
                           THEN list_append(acc[1:length(acc)-1], m{k}.merged)
                           ELSE list_concat(acc, x) END)"""
    crosses = " ".join(f"CROSS JOIN m{k}" for k in range(1, n_merges + 1))
    return rf"""{_bpe_chain_sql(n_merges)},
sw AS (
  SELECT source, word, COUNT(*) AS n_occ FROM (
    SELECT source,
           unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
    FROM documents) WHERE word <> '' GROUP BY 1, 2),
enc AS (
  SELECT source, n_occ, len({inner}) AS ntok
  FROM sw {crosses})
SELECT source, CAST(SUM(n_occ) AS BIGINT) AS ws_tokens,
       CAST(SUM(n_occ * ntok) AS BIGINT) AS bpe_tokens,
       CAST(ROUND(CAST(SUM(n_occ * ntok) AS DOUBLE)
                  / CAST(SUM(n_occ) AS DOUBLE), 6) AS DOUBLE)
         AS tokens_per_word
FROM enc GROUP BY source
"""


@register("bpe_train_merges", _bpe_train_sql(8))
def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full BPE tokenizer-training loop (8 merge rounds) —
    `bpe_merge_candidates` is round 1 of this. Every round's pair
    count, argmax, and greedy merge rewrite run on the
    VOCABULARY-sized word-frequency table (the corpus is scanned
    exactly once, the dictionary-BPE trainer shape); the oracle
    unrolls all 8 rounds, so a regression in the merge-apply fold, the
    tie-break, or the weighting shifts some round's winner and
    hash-mismatches."""
    from ..operators.text import bpe_train
    return bpe_train(load_table(spark, sf_dir, "documents"), n_merges=8)


@register("bpe_encode_stats", _bpe_encode_sql(8))
def q_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→encode round trip: tokenize the corpus with the 8 merges
    `bpe_train_merges` just learned and report per-source fertility
    (BPE tokens per whitespace word) — the first number a tokenizer
    evaluation reads. Encode is the training fold chained per merge
    rank, row-local over the (source, word)-frequency table (no
    shuffle, no per-occurrence walk); the oracle replays training AND
    the nested encode folds end-to-end."""
    from ..operators.text import bpe_encode_stats
    return bpe_encode_stats(load_table(spark, sf_dir, "documents"),
                            n_merges=8)


_SQL_QUALITY = r"""
ROUND(
  LEAST(len(regexp_extract_all(text, '\S+')) / 100.0, 1.0) * 0.5
  + (1.0 - LEAST(
      len(regexp_extract_all(text, '[.,;:!?]'))
        / GREATEST(len(regexp_extract_all(text, '\S+')), 1) * 10.0,
      1.0)) * 0.25
  + LEAST(
      len(regexp_extract_all(lower(text),
          '\b(the|and|of|to|in|is|that|it|was|for)\b'))
        / GREATEST(len(regexp_extract_all(text, '\S+')), 1) * 5.0,
      1.0) * 0.25, 6)
"""


@register("corpus_summary", rf"""
WITH per_doc AS (
  SELECT lang, source,
    len(regexp_extract_all(text, '\S+')) AS toks,
    CAST({_SQL_QUALITY} AS DECIMAL(24,6)) AS q,
    length(text) AS chars
  FROM documents)
SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(toks) AS BIGINT) AS total_tokens,
  ROUND(CAST(SUM(q) AS DOUBLE), 6) AS total_quality,
  ROUND(quantile_cont(chars, 0.5), 6) AS p50_chars
FROM per_doc GROUP BY lang, source
""")
def q_corpus_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-card corpus report: per (declared lang × source) stratum the
    doc volume, token mass, DECIMAL-exact summed quality, and median
    length — all row-local metrics fused into ONE corpus scan + one hash
    aggregate."""
    from ..operators.text import corpus_summary
    return corpus_summary(load_table(spark, sf_dir, "documents"))


@register("doc_pack_sequences", rf"""
WITH t AS (SELECT doc_id, source,
             len(regexp_extract_all(text, '\S+')) AS ws_tokens,
             {_SQL_HASH_BUCKET} AS b
           FROM documents),
s AS (
  SELECT doc_id, source, ws_tokens, b,
    CAST(FLOOR(CAST(SUM(ws_tokens) OVER w1 - ws_tokens AS DOUBLE) / 2000)
         AS BIGINT) AS shard
  FROM t
  WINDOW w1 AS (PARTITION BY source ORDER BY b, doc_id
                ROWS UNBOUNDED PRECEDING))
SELECT doc_id, source, CAST(ws_tokens AS INT) AS ws_tokens, shard,
  CAST(ROW_NUMBER() OVER w2 AS INT) AS seq_pos,
  CAST(SUM(ws_tokens) OVER w2 - ws_tokens AS BIGINT) AS start_offset
FROM s
WINDOW w2 AS (PARTITION BY source, shard ORDER BY b, doc_id
              ROWS UNBOUNDED PRECEDING)
""")
def q_doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: shard assignment plus per-document position and
    starting token offset within the shard — the concatenation layout a
    trainer needs for fixed-length sequences with correct attention
    boundaries."""
    from ..operators.sampling import pack_sequences
    from ..operators.text import _match_count, WS_TOKEN_PATTERN
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source",
        _match_count(F.col("text"), WS_TOKEN_PATTERN).alias("ws_tokens"))
    return pack_sequences(scored, budget=2000)


@register("doc_quality_quantile_norm", rf"""
WITH q AS (
  SELECT doc_id, source, CAST({_SQL_QUALITY} AS DOUBLE) AS quality
  FROM documents),
shist AS (SELECT source, quality, COUNT(*) AS c FROM q GROUP BY 1, 2),
stot AS (SELECT source, COUNT(*) AS n FROM q GROUP BY 1),
scum AS (
  SELECT s.source, s.quality,
         CAST(SUM(s.c) OVER (PARTITION BY s.source ORDER BY s.quality)
              AS DOUBLE) / t.n AS pct
  FROM shist s JOIN stot t USING (source)),
ghist AS (SELECT quality, COUNT(*) AS c FROM q GROUP BY 1),
gn AS (SELECT COUNT(*) AS n FROM q),
gcum AS (SELECT quality AS gq,
                CAST(SUM(c) OVER (ORDER BY quality) AS DOUBLE) / gn.n AS gpct
         FROM ghist CROSS JOIN gn),
mapped AS (
  SELECT sc.source, sc.quality, sc.pct, MIN(gc.gq) AS quality_norm
  FROM scum sc JOIN gcum gc ON gc.gpct >= sc.pct
  GROUP BY 1, 2, 3)
SELECT q.doc_id, q.source, q.quality,
       CAST(ROUND(m.pct, 6) AS DOUBLE) AS src_pct,
       m.quality_norm
FROM q JOIN mapped m USING (source, quality)
""")
def q_doc_quality_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quantile normalization: each document's quality score
    becomes the GLOBAL score at its within-source percentile, putting
    heterogeneous sources on one comparable scale before corpus-wide
    thresholding. Histogram-sized frames throughout (per-source ECDF,
    pooled quantile function, histogram×histogram inequality join) — no
    global row sort at any corpus size."""
    from ..operators.text import quantile_normalize
    return quantile_normalize(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Lexical retrieval (beyond-reference): Okapi BM25 — the sparse half of a
# RAG retrieval stack, next to the embedding ANN battery. The fixed query
# set is part of the entry (a retrieval benchmark run, not a service).
# ---------------------------------------------------------------------------

_BM25_QUERIES = [(1, "hash"), (1, "join"),
                 (2, "window"), (2, "agg"), (2, "stream"),
                 (3, "slow"), (3, "query"), (3, "scan")]

_SQL_BM25_VALUES = ", ".join(f"({q}, '{t}')" for q, t in _BM25_QUERIES)


@register("bm25_topk", rf"""
WITH toks AS (
  SELECT doc_id, t AS token FROM (
    SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
    FROM documents) WHERE t <> ''),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
tot AS (SELECT COUNT(*) AS n, SUM(dl) AS t FROM dl),
q(query_id, token) AS (VALUES {_SQL_BM25_VALUES}),
tfq AS (SELECT q.query_id, tf.doc_id, tf.token, tf.tf
        FROM tf JOIN q USING (token)),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tfq GROUP BY 1),
per AS (
  SELECT query_id, tfq.doc_id,
         CAST(ROUND(ROUND(ln(2 * n + 2) - ln(2 * df + 1), 9)
               * (tf * CAST(2.2 AS DOUBLE)
                  / (tf + CAST(1.2 AS DOUBLE)
                          * (CAST(0.25 AS DOUBLE)
                             + CAST(0.75 AS DOUBLE) * dl * n / t))), 9)
              AS DECIMAL(18,9)) AS s
  FROM tfq JOIN df USING (token) JOIN dl ON tfq.doc_id = dl.doc_id
  CROSS JOIN tot),
scored AS (
  SELECT query_id, doc_id,
         CAST(ROUND(CAST(SUM(s) AS DOUBLE), 6) AS DOUBLE) AS score
  FROM per GROUP BY 1, 2)
SELECT query_id, doc_id, score,
       CAST(rank AS INT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id ASC) AS rank
      FROM scored)
WHERE rank <= 10
""")
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 per query (k1=1.2, b=0.75) over `documents` —
    idf via ln on integer inputs only, 9-dp DECIMAL per-term sums, so
    both engines agree bit-for-bit (same discipline as
    doc_unigram_logprob). Sparse twin of the embedding_topk_* entries."""
    from ..operators.text import bm25_topk
    qdf = spark.createDataFrame(_BM25_QUERIES, "query_id int, term string")
    return bm25_topk(load_table(spark, sf_dir, "documents"), qdf)


_HLL_TOKS_SQL = ("SELECT source, token FROM (SELECT source, "
                 "unnest(string_split_regex(trim(lower(text)), "
                 "'\\s+')) AS token FROM documents) WHERE token <> ''")


@register("vocab_hll_by_source", f"""
WITH ex AS (
  SELECT source, CAST(COUNT(DISTINCT token) AS BIGINT) AS n_distinct
  FROM ({_HLL_TOKS_SQL}) GROUP BY source)
SELECT ex.source, ex.n_distinct, h.hll_estimate
FROM ex JOIN ({_hll_sql(_HLL_TOKS_SQL, "source")}) h USING (source)
""")
def q_vocab_hll_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary cardinality: exact COUNT DISTINCT beside
    the HyperLogLog estimate (m=256 registers, σ≈6.5%). The oracle
    replays the ENTIRE sketch — portable md5 base, register split,
    integer-exact leading-zero ranks via bin(), BIGINT-scaled harmonic
    sum, linear-counting correction with integer-only ln — so the hash
    match pins the sketch construction bit-for-bit while n_distinct
    displays the (bounded) estimation error. At 100 TB the register
    table is 256 rows per group FOREVER, max-mergeable across
    partitions, shards, and streams (`streaming/sketches.streaming_hll`
    maintains the identical table)."""
    from ..operators.sketches import hll_estimate, hll_sketch
    from ..operators.util import spread
    docs = load_table(spark, sf_dir, "documents")
    toks = (spread(docs)
            .select("source",
                    F.explode(F.split(F.trim(F.lower(F.col("text"))),
                                      r"\s+")).alias("token"))
            .filter(F.col("token") != "")
            .localCheckpoint())  # reused: sketch build + exact distinct
    est = hll_estimate(hll_sketch(toks, group_cols=("source",)),
                       group_cols=("source",))
    exact = toks.groupBy("source").agg(
        F.count_distinct("token").cast("long").alias("n_distinct"))
    return (exact.join(est, "source")
            .select("source", "n_distinct", "hll_estimate"))


def _vocab_overlap_sql() -> str:
    from ..operators.sketches import hll_overlap_sql
    return hll_overlap_sql(_HLL_TOKS_SQL, "source")


@register("vocab_overlap_sources", _vocab_overlap_sql())
def q_vocab_overlap_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary overlap between corpus sources from the SAME
    per-source HLL sketches `vocab_hll_by_source` maintains: the union
    is the per-register max-merge (exact at the sketch level), the
    intersection is 6-dp inclusion-exclusion, jaccard its ratio — the
    mixture-planning / cross-source-contamination readout (which
    sources duplicate each other's vocabulary) with NOTHING
    vocabulary-sized ever materialized: the corpus is scanned once to
    build ≤ 256 registers per source, and the 190-pair matrix works on
    register rows only. The oracle replays register build, max-merge,
    and the inclusion-exclusion arithmetic bit-for-bit."""
    from ..operators.sketches import hll_pairwise_overlap, hll_sketch
    from ..operators.util import spread
    docs = load_table(spark, sf_dir, "documents")
    toks = (spread(docs)
            .select("source",
                    F.explode(F.split(F.trim(F.lower(F.col("text"))),
                                      r"\s+")).alias("token"))
            .filter(F.col("token") != ""))
    return hll_pairwise_overlap(hll_sketch(toks, group_cols=("source",)),
                                "source")


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical arm and the
# brute-force dense (embedding cosine) arm — the standard two-tower RAG
# retrieval stack. Only ranks cross the fusion boundary, so both arms'
# deterministic tie-breaks make the fused ranking engine-exact.
# ---------------------------------------------------------------------------

_HYBRID_SQL = rf"""
WITH toks AS (
  SELECT doc_id, t AS token FROM (
    SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
    FROM documents) WHERE t <> ''),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
tot AS (SELECT COUNT(*) AS n, SUM(dl) AS t FROM dl),
q(query_id, token) AS (VALUES {_SQL_BM25_VALUES}),
tfq AS (SELECT q.query_id, tf.doc_id, tf.token, tf.tf
        FROM tf JOIN q USING (token)),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tfq GROUP BY 1),
per AS (
  SELECT query_id, tfq.doc_id,
         CAST(ROUND(ROUND(ln(2 * n + 2) - ln(2 * df + 1), 9)
               * (tf * CAST(2.2 AS DOUBLE)
                  / (tf + CAST(1.2 AS DOUBLE)
                          * (CAST(0.25 AS DOUBLE)
                             + CAST(0.75 AS DOUBLE) * dl * n / t))), 9)
              AS DECIMAL(18,9)) AS s
  FROM tfq JOIN df USING (token) JOIN dl ON tfq.doc_id = dl.doc_id
  CROSS JOIN tot),
lex_scored AS (
  SELECT query_id, doc_id,
         CAST(ROUND(CAST(SUM(s) AS DOUBLE), 6) AS DOUBLE) AS score
  FROM per GROUP BY 1, 2),
lex AS (SELECT query_id, doc_id, r AS lex_rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY score DESC, doc_id ASC) AS r FROM lex_scored)
        WHERE r <= 20),
qv AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
       WHERE vec_id IN (1, 2, 3)),
den_scored AS (
  SELECT qv.query_id, e.vec_id AS doc_id,
         list_sum(list_transform(list_zip(e.embedding, qv.qvec),
                  x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS cosine
  FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> qv.query_id),
den AS (SELECT query_id, doc_id, r AS dense_rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, doc_id ASC) AS r FROM den_scored)
        WHERE r <= 20),
fused AS (
  SELECT COALESCE(l.query_id, d.query_id) AS query_id,
         COALESCE(l.doc_id, d.doc_id) AS doc_id,
         COALESCE(CAST(1 AS DOUBLE) / (60 + l.lex_rank), CAST(0 AS DOUBLE))
         + COALESCE(CAST(1 AS DOUBLE) / (60 + d.dense_rank),
                    CAST(0 AS DOUBLE)) AS rrf
  FROM lex l FULL JOIN den d
    ON l.query_id = d.query_id AND l.doc_id = d.doc_id)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(doc_id AS BIGINT) AS doc_id,
       CAST(ROUND(rrf, 6) AS DOUBLE) AS rrf_score,
       CAST(fr AS INT) AS fused_rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY rrf DESC, doc_id ASC) AS fr FROM fused)
WHERE fr <= 10
"""


@register("hybrid_rrf_topk", _HYBRID_SQL)
def q_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF fusion (c=60) of BM25 top-20 and exact-cosine top-20 per query
    (query i's dense vector = embedding i — the synthetic corpus keys
    documents and embeddings identically). Arms are k-rows-per-query
    frames, so the fusion never rescans the corpus."""
    from pyspark.sql import Window
    from ..operators.ann import cosine_topk_bruteforce, rrf_fuse
    from ..operators.text import bm25_topk
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qdf = spark.createDataFrame(_BM25_QUERIES, "query_id int, term string")
    lex = bm25_topk(docs, qdf, top=20).select(
        "query_id", "doc_id", F.col("rank").alias("arm_rank"))
    wd = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    den = (cosine_topk_bruteforce(emb, query_ids=[1, 2, 3], k=20)
           .withColumn("arm_rank", F.row_number().over(wd))
           .select("query_id", F.col("neighbor_id").alias("doc_id"),
                   "arm_rank"))
    return rrf_fuse({"lex": lex, "dense": den}, k=10)


def _bloom_sql() -> str:
    """DuckDB twin of sketches.bloom_build/bloom_may_contain over the
    4-gram decontamination shape — embeds the shared universal-hash
    coefficients so the oracle replays the exact bitmap."""
    from ..operators.dedup import HASH_P, MINHASH_A, MINHASH_B

    num_bits, k = 1 << 21, 4
    h_expr = ("(CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) "
              f"% {HASH_P})")
    bp = "\n  UNION ALL ".join(
        f"SELECT ((({MINHASH_A[i]} * h + {MINHASH_B[i]}) % {HASH_P}) "
        f"% {num_bits}) AS p FROM bh"
        for i in range(k))
    tp = "\n  UNION ALL ".join(
        f"SELECT doc_id, shingle, ((({MINHASH_A[i]} * h + {MINHASH_B[i]}) "
        f"% {HASH_P}) % {num_bits}) AS p FROM th"
        for i in range(k))
    return f"""
WITH tr AS ({_SQL_SHINGLES4.format(op='<>')}),
bench AS (SELECT DISTINCT shingle FROM ({_SQL_SHINGLES4.format(op='=')}) b),
bh AS (SELECT {h_expr} AS h FROM bench),
bp AS (
  {bp}
),
bloom AS (SELECT p // 32 AS word,
                 bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS bits
          FROM bp GROUP BY 1),
th AS (SELECT doc_id, shingle, {h_expr} AS h FROM tr),
tp AS (
  {tp}
),
hits AS (
  SELECT t.doc_id, t.shingle,
         MIN(CASE WHEN b.bits IS NOT NULL
                   AND (b.bits & (1::BIGINT << CAST(t.p % 32 AS INT)))
                       = (1::BIGINT << CAST(t.p % 32 AS INT))
              THEN 1 ELSE 0 END) AS allhit
  FROM tp t LEFT JOIN bloom b ON t.p // 32 = b.word
  GROUP BY 1, 2)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_flagged
FROM hits WHERE allhit = 1 GROUP BY doc_id
"""


@register("decontaminate_bloom", _bloom_sql())
def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decontaminate_ngram's 100 TB shape: the benchmark shingle set
    collapses to a 2^21-bit Bloom bitmap (bounded broadcast however many
    eval suites accumulate) and the training corpus pays ONE map-side
    membership pass — no false negatives, FP surplus bounded by
    bits-per-key. Oracle replays the exact bitmap bit-for-bit."""
    from ..operators.sampling import bloom_contamination
    docs = load_table(spark, sf_dir, "documents")
    return bloom_contamination(
        docs.filter(F.col("source") != "src19"),
        docs.filter(F.col("source") == "src19"), n=4)
