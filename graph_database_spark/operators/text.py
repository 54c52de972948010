"""Text analysis for large-scale training-data pipelines (beyond-reference,
per the build brief): language-ID, quality scoring, token counting, document
fingerprinting. Everything is built from JVM-side `pyspark.sql.functions`
(regexp/hash/arithmetic inside whole-stage codegen) — zero Python UDFs — so
the same expressions scale to 100 TB and have exact DuckDB SQL twins.

Pattern constants are shared with the oracle SQL in registry.py so both
engines evaluate literally the same regexes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .util import spread

# language → stopword alternation (word-bounded). Deterministic heuristic:
# argmax of match counts, first-listed language wins ties, 'unknown' if all 0.
LANG_PATTERNS: dict[str, str] = {
    "en": r"\b(the|and|of|to|in|is|that|it|was|for)\b",
    "fr": r"\b(le|la|les|des|et|une|est|dans|que|pour)\b",
    "es": r"\b(el|los|las|una|es|que|en|por|con|para)\b",
    "de": r"\b(der|die|das|und|ist|von|mit|den|dem|ein)\b",
    "zh": r"[一-鿿]",
}
LANG_ORDER = ("en", "fr", "es", "de", "zh")

WS_TOKEN_PATTERN = r"\S+"
# BPE-ish pre-tokenization: letter runs, single digits, punctuation runs
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+"
PUNCT_PATTERN = r"[.,;:!?]"
EN_STOPWORD_PATTERN = LANG_PATTERNS["en"]


def _match_count(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))


def lang_pred_col(text: Column) -> Column:
    """Predicted-language Column (row-local expression) — argmax of
    stopword-profile match counts, first-listed language wins ties."""
    low = F.lower(text)
    counts = {lang: _match_count(low, pat)
              for lang, pat in LANG_PATTERNS.items()}
    g = F.greatest(*[counts[lang] for lang in LANG_ORDER])
    pred = F.when(g == 0, F.lit("unknown"))
    for lang in LANG_ORDER:
        pred = pred.when(counts[lang] == g, F.lit(lang))
    return pred


def lang_id(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang): stopword-profile n-gram heuristic."""
    return documents.select(
        "doc_id", lang_pred_col(F.col(text_col)).alias("pred_lang"))


def quality_col(text: Column) -> Column:
    """[0,1] quality score Column, rounded to 6dp. Rational arithmetic
    only (no exp/log) so the score is bit-identical across engines."""
    words = _match_count(text, WS_TOKEN_PATTERN)
    punct = _match_count(text, PUNCT_PATTERN)
    stop = _match_count(F.lower(text), EN_STOPWORD_PATTERN)
    word_count = F.when(words > 0, words).otherwise(F.lit(1))
    punct_ratio = punct / word_count
    stop_ratio = stop / word_count
    return F.round(
        F.least(words.cast("double") / 100.0, F.lit(1.0)) * 0.5
        + (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0))) * 0.25
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.25, 6)


def text_quality(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, word_count, punct_ratio, stopword_ratio, quality):
    length/punctuation/stopword heuristics combined into a [0,1] score."""
    text = F.col(text_col)
    words = _match_count(text, WS_TOKEN_PATTERN)
    punct = _match_count(text, PUNCT_PATTERN)
    stop = _match_count(F.lower(text), EN_STOPWORD_PATTERN)
    word_count = F.when(words > 0, words).otherwise(F.lit(1))
    punct_ratio = punct / word_count
    stop_ratio = stop / word_count
    return documents.select(
        "doc_id",
        words.alias("word_count"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        quality_col(text).alias("quality"),
    )


def token_counts(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, ws_tokens, bpe_tokens): whitespace and BPE-ish regex
    pre-tokenization counts."""
    text = F.col(text_col)
    return documents.select(
        "doc_id",
        _match_count(text, WS_TOKEN_PATTERN).alias("ws_tokens"),
        _match_count(text, BPE_TOKEN_PATTERN).alias("bpe_tokens"),
    )


def unigram_logprob(documents: DataFrame, text_col: str = "text",
                    vocab_size: int = 65536) -> DataFrame:
    """(doc_id, n_tokens, avg_logprob): per-document mean token
    log-probability under the corpus's own Laplace-smoothed unigram
    language model — the classic cheap perplexity proxy for quality
    filtering (documents scoring far below the corpus mean are
    boilerplate/gibberish; far above are degenerate repetition).

    p(t) = (c(t)+1) / (T+U+1) with c = corpus token count, T = total
    tokens, U = distinct tokens (+1 = the OOV bucket). avg_logprob =
    mean ln p over the doc's tokens.

    Scale shape: one exploded-token scan builds the count table (vocab-
    sized, NOT corpus-sized); `ln` is evaluated once per DISTINCT vocab
    entry, never per token occurrence. The per-token join is against the
    top-`vocab_size` entries broadcast (the cap bounds the broadcast on
    an unbounded real-world vocab; tokens past the cap fall into the
    c=0 OOV floor, and ln(0+1)=0 makes that a coalesce-to-zero, no
    special case). Per-doc aggregation decimal-sums the 9-dp-rounded
    per-entry logs, so the result is summation-order-independent and
    engine-portable (ln runs on exactly-representable integer inputs
    only; +,*,/ are IEEE-exact in any engine).
    """
    toks = (spread(documents)
            .select("doc_id",
                    F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                                      r"\s+")).alias("tok"))
            .filter(F.col("tok") != ""))
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    # T and U ride along as a broadcast 1-row frame (no driver sync)
    totals = counts.agg(F.sum("c").alias("__T"),
                        F.count(F.lit(1)).alias("__U"))
    vocab = (counts
             .orderBy(F.desc("c"), F.asc("tok")).limit(vocab_size)
             .select("tok",
                     F.round(F.log(F.col("c") + F.lit(1)), 9)
                      .cast("decimal(12,9)").alias("__logc")))
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"),
             F.sum(F.coalesce(F.col("__logc"),
                              F.lit(0).cast("decimal(12,9)"))).alias("__s"))
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id", "n_tokens",
            F.round(F.col("__s").cast("double") / F.col("n_tokens")
                    - F.log(F.col("__T") + F.col("__U") + F.lit(1)), 6)
             .alias("avg_logprob"))
    )


def repetition_metrics(documents: DataFrame,
                       text_col: str = "text") -> DataFrame:
    """(doc_id, n_words, distinct_word_ratio, top_bigram_frac): the
    Gopher-style repetition quality signals — low distinct-word ratio or a
    single bigram dominating the text marks boilerplate/spam for removal.

    Plan shape: `n_words` and `distinct_word_ratio` are row-local array
    expressions fused into the scan; the bigram mode needs a per-doc
    frequency table, so the text explodes to (doc_id, bigram) and
    aggregates twice — both shuffles keyed on doc_id, no self-joins.
    The final join back to the row-local metrics is the only join.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    # localCheckpoint: base feeds BOTH the row-local branch and the bigram
    # explode — without it each branch re-runs the scan + regex tokenize
    # (the dominant cost at corpus scale); same dual-consumer pattern as
    # curate_documents
    base = (spread(documents)
            .select("doc_id", toks.alias("w"))
            .withColumn("n_words", F.size("w"))
            .localCheckpoint())
    bigrams = F.when(
        F.col("n_words") >= 2,
        F.zip_with(
            F.slice("w", F.lit(1), F.col("n_words") - 1),
            F.slice("w", F.lit(2), F.col("n_words") - 1),
            lambda a, b: F.concat_ws(" ", a, b)),
    ).otherwise(F.array().cast("array<string>"))
    row_local = base.select(
        "doc_id", "n_words",
        F.round(F.size(F.array_distinct("w")) / F.col("n_words"), 6)
         .alias("distinct_word_ratio"))
    top = (base
           .select("doc_id", F.explode(bigrams).alias("bigram"))
           .groupBy("doc_id", "bigram")
           .agg(F.count(F.lit(1)).alias("n"))
           .groupBy("doc_id")
           .agg(F.max("n").alias("top_n"),
                F.sum("n").alias("total_bg")))
    return (row_local.join(top, "doc_id", "left")
            .select("doc_id", "n_words", "distinct_word_ratio",
                    F.coalesce(
                        F.round(F.col("top_n").cast("double")
                                / F.col("total_bg"), 6),
                        F.lit(0.0)).alias("top_bigram_frac")))


def word_ngrams(text: Column, n: int = 2) -> Column:
    """All word n-grams (lowercased, NON-distinct — frequency matters) as
    an array column; shares `dedup.word_grams`' binding + guard core."""
    from .dedup import word_grams
    return word_grams(text, n, lowercase=True, distinct=False)


def corpus_top_ngrams(documents: DataFrame, n: int = 2, k: int = 50,
                      text_col: str = "text") -> DataFrame:
    """(ngram, n_occurrences): corpus-wide top-k most frequent word
    n-grams — the vocabulary-induction / BPE-corpus-statistics primitive.
    Deterministic tie-break (count desc, ngram asc); the top-k is a
    TakeOrderedAndProject over the ngram aggregate, never a global sort.
    """
    grams = (spread(documents)
             .select(F.explode(word_ngrams(F.col(text_col), n))
                      .alias("ngram")))
    return (grams.groupBy("ngram")
            .agg(F.count(F.lit(1)).alias("n_occurrences"))
            .orderBy(F.desc("n_occurrences"), F.asc("ngram"))
            .limit(k))


def tfidf_keywords(documents: DataFrame, top: int = 3,
                   text_col: str = "text") -> DataFrame:
    """(doc_id, token, tfidf, rank): per-doc top keywords by RATIONAL
    tf-idf — tf · N / df with no logarithm, so the score is a single
    exactly-rounded IEEE division both engines compute bit-identically
    (log/exp differ across libm implementations; ranking is unchanged
    since ln is monotone in N/df).

    Two aggregates (doc-term tf, term df — df derived from tf so the
    corpus explodes once) and a token-keyed join; N is a 1-row broadcast.
    """
    from pyspark.sql import Window

    toks = (spread(documents)
            .select("doc_id",
                    F.explode(F.split(F.trim(F.lower(F.col(text_col))),
                                      r"\s+")).alias("token")))
    tf = (toks.groupBy("doc_id", "token")
          .agg(F.count(F.lit(1)).alias("tf")))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = documents.agg(F.count(F.lit(1)).alias("n_docs"))
    tfidf = F.round((F.col("tf") * F.col("n_docs")).cast("double")
                    / F.col("df"), 6)
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("token"))
    return (tf.join(df, "token")
            .crossJoin(F.broadcast(n_docs))
            .select("doc_id", "token", tfidf.alias("tfidf"))
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= top))


def bm25_postings(documents: DataFrame,
                  text_col: str = "text") -> DataFrame:
    """(doc_id, token, tf): the postings frame behind `bm25_topk` — the
    ONE corpus explode + tf aggregate every BM25 statistic (df, dl,
    total_tokens, scoring) derives from. At cluster scale this is the
    frame you persist as a table (the inverted index) and hand to
    `bm25_topk(postings=...)` so query batches never touch the corpus.
    Tokenization matches `corpus_stats_rows` exactly (lower, whitespace
    split, empties dropped)."""
    toks = (spread(documents)
            .select("doc_id",
                    F.explode(F.split(F.trim(F.lower(F.col(text_col))),
                                      r"\s+")).alias("token"))
            .filter(F.col("token") != ""))
    return toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf"))


def bm25_topk(documents: DataFrame, queries: DataFrame, k1: float = 1.2,
              b: float = 0.75, top: int = 10,
              text_col: str = "text",
              postings: DataFrame | None = None) -> DataFrame:
    """(query_id, doc_id, score, rank): Okapi BM25 retrieval — the
    classic lexical ranking a RAG pipeline runs before (or fused with)
    embedding ANN. `queries` is (query_id, term), terms lowercase.

    score(q, D) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    with idf(t) = ln((N − df + ½)/(df + ½) + 1) = ln(2N+2) − ln(2df+1),
    so ln only ever sees exactly-representable integers (engine-portable,
    same discipline as `unigram_logprob`); per-term scores are rounded to
    9 dp into DECIMAL sums (order-free), dl/avgdl is expressed as
    dl·N/T to keep one division.

    Scale shape: exactly ONE corpus scan (down from two in r7, four in
    r6). For ≤ 64 distinct query terms (the retrieval case) the token
    stream collapses in ONE per-doc groupBy whose aggregate list is
    [dl] + one conditional count per term — a single shuffle with
    map-side combine carrying |docs| bounded-width rows, and dl, tf,
    df, n_docs/total_tokens all derive from that frame (the per-term
    unpivot is a row-local stack). Vocabulary-scale query sets fall
    back to the masked-token aggregate (group key = query term or a
    per-doc NULL), whose shuffle is ≤ |docs|·(|terms|+1) narrow rows.
    With a persisted `postings` table (the production inverted-index
    path, see `bm25_postings`) the corpus is scanned ZERO times —
    everything derives from the postings. Top-k per query is
    rank-limited (WindowGroupLimit), never a global sort.
    """
    from pyspark.sql import Window

    # a duplicated (query_id, term) row must not double-count: the
    # corpus path would inflate tf pre-aggregation while the postings
    # path would emit two summed per-term rows — distinct() up front
    # keeps both paths identical (standard BM25 ignores repeated query
    # mentions; qtf weighting would be an explicit extension)
    q_terms = F.broadcast(
        queries.withColumnRenamed("term", "token").distinct())
    if postings is not None:
        dl = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
        tf_q0 = postings.join(q_terms, "token")
        # dl and tf_q0 are each consumed twice below (totals/df +
        # scoring); without a materialized parent Catalyst re-expands
        # the diamond's subtree per reference, re-scanning the postings
        # table — so the two small frames are pinned. Streaming frames
        # can't checkpoint — that reuse belongs to the streaming planner.
        if not dl.isStreaming:
            dl = dl.localCheckpoint()
        if not tf_q0.isStreaming:
            tf_q0 = tf_q0.localCheckpoint()
        totals = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                        F.sum("dl").alias("total_tokens"))
        # df counts DOCS per token — dedup (doc, token) first, since
        # tf_q0 carries one row per query sharing the term
        df = tf_q0.select("doc_id", "token").distinct() \
            .groupBy("token").agg(F.count(F.lit(1)).alias("df"))
        tf_q = tf_q0.join(dl, "doc_id")
    else:
        # the query set is a driver-sized constant by contract — ONE
        # collect yields both the distinct terms and the term→query_ids
        # map, and everything query-shaped becomes plan literals (no
        # q_terms/df broadcast-exchange jobs; at sf0.1 the old shape
        # spent more wall time on its 14 jobs' fixed overhead than on
        # the corpus)
        qpairs = {(r["query_id"], r["term"])
                  for r in queries.select("query_id", "term").collect()}
        terms = sorted({t for _, t in qpairs})
        # the ZERO-SHUFFLE corpus path (r10): per-doc tf is row-local by
        # definition, so dl and one count per query term come straight
        # off the tokenized array — no explode, no corpus shuffle at
        # all; docs with no tokens are excluded (dl > 0), matching the
        # explode-based semantics. Guarded to retrieval-sized term sets
        # so the row width stays bounded; a vocabulary-scale query set
        # routes through the inverted-index (postings) path instead.
        if not terms or len(terms) > 64:
            return bm25_topk(documents, queries, k1, b, top, text_col,
                             postings=bm25_postings(documents, text_col))
        arr = F.filter(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                       lambda x: x != "")
        base = spread(documents).select("doc_id", arr.alias("__toks"))

        def _tf(term: str) -> Column:
            # NB: a 2-arg lambda would be read as (element, index) by
            # F.filter — close over the term in a real scope instead
            return F.size(F.filter(F.col("__toks"),
                                   lambda x: x == F.lit(term)))

        per_doc = (base
                   .select("doc_id", F.size("__toks").alias("dl"),
                           *[_tf(t).alias(f"__tf{i}")
                             for i, t in enumerate(terms)])
                   .filter(F.col("dl") > 0))
        # per_doc feeds the 1-row stats aggregate (totals + df), and the
        # unpivoted scoring rows — pin the one tokenization pass; a
        # streaming corpus leaves reuse to the streaming planner
        if not per_doc.isStreaming:
            per_doc = per_doc.localCheckpoint()
        # n_docs, total_tokens, AND every per-term document frequency in
        # ONE 1-row aggregate (df never touches a distinct()); the single
        # 1-row broadcast is the only corpus statistic crossing the plan
        stats = per_doc.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").alias("total_tokens"),
            *[F.sum((F.col(f"__tf{i}") > 0).cast("int")).cast("long")
              .alias(f"__df{i}") for i in range(len(terms))])
        esc = [t.replace("\\", "\\\\").replace("'", "\\'") for t in terms]
        rows = (per_doc
                .selectExpr("doc_id", "dl",
                            "stack({}, {}) AS (token, tf)".format(
                                len(terms),
                                ", ".join(f"'{e}', __tf{i}"
                                          for i, e in enumerate(esc))))
                .filter(F.col("tf") > 0)
                .crossJoin(F.broadcast(stats)))
        # token → df: a literal CASE over the term list (token values
        # can only be stack literals); token → query_ids: a literal
        # when-chain of int arrays exploded — queries sharing a term
        # each get their scoring row without a broadcast join
        dfc = F.lit(None).cast("long")
        qidc = F.lit(None).cast("array<int>")
        for i, t in enumerate(terms):
            qids = sorted(q for q, tt in qpairs if tt == t)
            dfc = F.when(F.col("token") == F.lit(t),
                         F.col(f"__df{i}")).otherwise(dfc)
            qidc = F.when(F.col("token") == F.lit(t),
                          F.array(*[F.lit(q) for q in qids])) \
                .otherwise(qidc)
        tf_q = rows.select(
            F.explode(qidc).alias("query_id"), "doc_id", "token", "tf",
            "dl", dfc.alias("df"), "n_docs", "total_tokens")
        df = totals = None  # folded into tf_q via stats literals
    idf = F.round(F.log(2 * F.col("n_docs") + 2)
                  - F.log(2 * F.col("df") + 1), 9)
    tfc = (F.col("tf") * (k1 + 1)
           / (F.col("tf") + k1 * (1 - b + b * F.col("dl")
                                  * F.col("n_docs")
                                  / F.col("total_tokens"))))
    s_col = F.round(idf * tfc, 9).cast("decimal(18,9)").alias("s")
    if postings is not None:
        per_term = (tf_q  # carries dl — no extra join
                    .join(F.broadcast(df), "token")
                    .crossJoin(F.broadcast(totals))
                    .select("query_id", "doc_id", s_col))
    else:
        per_term = tf_q.select("query_id", "doc_id", s_col)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id"))
    return (per_term.groupBy("query_id", "doc_id")
            .agg(F.round(F.sum("s").cast("double"), 6).alias("score"))
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= top))


def corpus_stats_rows(documents: DataFrame,
                      text_col: str = "text") -> DataFrame:
    """(key, kind, n): the BM25/TF-IDF corpus statistics in mergeable
    row form — kind='df' is the distinct-document count per token,
    kind='tf' the total occurrence count per token, kind='doc' (one
    key='' row) the corpus size; total_tokens = Σ n over kind='tf' and
    avgdl = total_tokens / n_docs derive from the table. Tokenization
    matches `bm25_topk`/`tfidf_keywords` exactly (lower, whitespace split,
    empty dropped).

    The shape is chosen for INCREMENTAL maintenance: per-document df
    contributions are deduplicated ROW-LOCALLY (array_distinct before
    the explode), so the whole computation is explode → count with no
    distinct state — on a stream of documents the identical expression
    chain runs as a standard streaming aggregation whose state is the
    stats table itself (≈ 2·|vocab| + 1 rows, never corpus-sized), and
    micro-batch partials merge by addition. The streaming twin
    (`streaming.text_stats`) asserts bit-identical tables.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = spread(documents).select(toks.alias("__toks"))
    dfr = (base.select(F.explode(F.array_distinct("__toks")).alias("key"))
           .filter(F.col("key") != "")
           .withColumn("kind", F.lit("df")))
    tfr = (base.select(F.explode("__toks").alias("key"))
           .filter(F.col("key") != "")
           .withColumn("kind", F.lit("tf")))
    docr = base.select(F.lit("").alias("key"), F.lit("doc").alias("kind"))
    return (dfr.unionByName(tfr).unionByName(docr)
            .groupBy("key", "kind").agg(F.count(F.lit(1)).alias("n")))


def bpe_merge_candidates(documents: DataFrame, k: int = 50,
                         text_col: str = "text") -> DataFrame:
    """(pair, n_occurrences): the top-k adjacent character pairs weighted
    by word frequency — iteration 1 of BPE tokenizer training (the merge
    ranking). The full trainer is a driver-side loop around this
    operator: apply the winning merge to the word list, re-rank, repeat.

    Plan shape for 100 TB: the corpus collapses to the word-frequency
    table FIRST (vocabulary-sized, zipfian-small relative to the corpus),
    so the per-word character expansion runs over distinct words, not
    over every token occurrence. Adjacent pairs come from substr windows
    (1-based, identical in the oracle); deterministic (count desc, pair
    asc) top-k via TakeOrderedAndProject.
    """
    words = (spread(documents)
             .select(F.explode(F.split(F.trim(F.lower(F.col(text_col))),
                                       r"\s+")).alias("word"))
             .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))
    pairs = F.transform(
        F.sequence(F.lit(1), F.length("word") - 1),
        lambda i: F.col("word").substr(i, F.lit(2)))
    return (words
            .filter(F.length("word") >= 2)
            .select(F.explode(pairs).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("n_occurrences"))
            .orderBy(F.desc("n_occurrences"), F.asc("pair"))
            .limit(k))


def bpe_train(documents: DataFrame, n_merges: int = 8,
              text_col: str = "text") -> DataFrame:
    """(rank, lhs, rhs, merged, pair_count): the BPE merge table — the
    full tokenizer-training loop `bpe_merge_candidates` is iteration 1
    of (Sennrich et al. 2016). Each round picks the most frequent
    adjacent token pair (weighted by word frequency, ties broken on
    (lhs, rhs) asc) and applies the merge greedily left-to-right.

    Plan shape for 100 TB: the corpus collapses to the word-frequency
    table FIRST and every iteration — pair count, argmax, merge
    rewrite — runs on that vocabulary-sized frame; the corpus is
    scanned exactly once, like the classic dictionary-based BPE
    trainers. The merge rewrite is a JVM-side F.aggregate fold (acc
    ends with lhs ∧ next == rhs → replace tail with merged, else
    append), whose greedy non-overlapping semantics an external
    engine replays with the identical list fold; the per-round argmax
    is a bounded 1-row collect (the merge table IS driver-sized by
    definition). State localCheckpoints per round — the repo-wide
    iterative discipline — but LAZILY (eager=False): the next round's
    argmax collect is the action that materializes it, so a round costs
    ONE driver sync instead of two, and the final round's rewrite (whose
    state nothing ever reads — bpe_train returns only the merge table)
    is never computed at all (r13, the anf.py superstep fold applied
    here; lineage is still truncated per round)."""
    spark = documents.sparkSession
    words = (spread(documents)
             .select(F.explode(F.split(F.trim(F.lower(F.col(text_col))),
                                       r"\s+")).alias("word"))
             .filter(F.col("word") != "")
             .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))
    chars = F.transform(F.sequence(F.lit(1), F.length("word")),
                        lambda i: F.col("word").substr(i, F.lit(1)))
    state = words.select(chars.alias("toks"), "freq") \
        .localCheckpoint(eager=False)
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        pairs = state.select(
            F.explode(F.zip_with(
                F.slice("toks", 1, F.size("toks") - 1),
                F.slice("toks", 2, F.size("toks") - 1),
                lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs"))))
            .alias("p"), "freq")
        best = (pairs.select("p.lhs", "p.rhs", "freq")
                .groupBy("lhs", "rhs")
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("lhs"), F.asc("rhs"))
                .limit(1).collect())
        if not best:
            break  # vocabulary fully merged — nothing adjacent left
        lhs, rhs, cnt = best[0]["lhs"], best[0]["rhs"], int(best[0]["cnt"])
        merged = lhs + rhs
        merges.append((rank, lhs, rhs, merged, cnt))
        # greedy left-to-right apply: F.get is 0-based and OOB-null, so
        # the empty-accumulator first step falls to the append branch
        # with no ANSI out-of-bounds error
        fold = F.aggregate(
            "toks", F.array().cast("array<string>"),
            lambda acc, t: F.when(
                (F.get(acc, F.size(acc) - 1) == F.lit(lhs))
                & (t == F.lit(rhs)),
                F.concat(F.slice(acc, 1, F.size(acc) - 1),
                         F.array(F.lit(merged))))
            .otherwise(F.concat(acc, F.array(t))))
        state = state.select(fold.alias("toks"), "freq") \
            .localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges,
        "rank int, lhs string, rhs string, merged string, pair_count long")


def bpe_encode_stats(documents: DataFrame, n_merges: int = 8,
                     text_col: str = "text",
                     group_col: str = "source") -> DataFrame:
    """(group, ws_tokens, bpe_tokens, tokens_per_word): tokenize the
    corpus with the merges `bpe_train` just learned and report
    per-group compression — the train→encode round trip that proves the
    merge table is USABLE, and the fertility readout (tokens per word)
    a tokenizer evaluation starts with.

    The encode is the training fold replayed per merge in rank order —
    a chain of row-local F.aggregate folds over the character array, no
    shuffle — and it runs on the (group, word)-frequency table, so like
    training it never re-walks token occurrences. The merge table is a
    driver literal by definition (n_merges rows)."""
    merges = [(r["lhs"], r["rhs"], r["merged"])
              for r in bpe_train(documents, n_merges, text_col).collect()]
    sw = (spread(documents)
          .select(group_col,
                  F.explode(F.split(F.trim(F.lower(F.col(text_col))),
                                    r"\s+")).alias("word"))
          .filter(F.col("word") != "")
          .groupBy(group_col, "word")
          .agg(F.count(F.lit(1)).alias("n_occ")))
    arr = F.transform(F.sequence(F.lit(1), F.length("word")),
                      lambda i: F.col("word").substr(i, F.lit(1)))

    def _merge_step(lhs: str, rhs: str, merged: str):
        # factory: pyspark inspects the lambda's arity, so the merge
        # constants must close over scope, not ride default args
        def step(acc, t):
            return F.when(
                (F.get(acc, F.size(acc) - 1) == F.lit(lhs))
                & (t == F.lit(rhs)),
                F.concat(F.slice(acc, 1, F.size(acc) - 1),
                         F.array(F.lit(merged)))) \
                .otherwise(F.concat(acc, F.array(t)))
        return step

    for lhs, rhs, merged in merges:
        arr = F.aggregate(arr, F.array().cast("array<string>"),
                          _merge_step(lhs, rhs, merged))
    enc = sw.withColumn("__ntok", F.size(arr))
    ws = F.sum("n_occ")
    bpe = F.sum(F.col("n_occ") * F.col("__ntok"))
    return (enc.groupBy(group_col)
            .agg(ws.cast("long").alias("ws_tokens"),
                 bpe.cast("long").alias("bpe_tokens"))
            .select(group_col, "ws_tokens", "bpe_tokens",
                    F.round(F.col("bpe_tokens").cast("double")
                            / F.col("ws_tokens").cast("double"), 6)
                    .alias("tokens_per_word")))


def corpus_summary(documents: DataFrame,
                   text_col: str = "text") -> DataFrame:
    """(lang, source, n_docs, total_tokens, total_quality, p50_chars):
    the data-card / corpus-report primitive — one row per (declared lang
    × source) stratum with volume, token mass, summed quality (mean =
    total/n, left to the consumer), and median length.

    Every metric is row-local (token count and quality are fused into
    the scan), so the whole report is ONE corpus scan + one hash
    aggregate. total_quality is the DECIMAL-exact sum of the 6dp-rounded
    per-doc scores — publishing the sum rather than the mean keeps the
    column bit-identical across engines (a mean's trailing division can
    land exactly on a round-half boundary where HALF_UP/HALF_EVEN
    implementations split).
    """
    text = F.col(text_col)
    per_doc = documents.select(
        "lang", "source",
        _match_count(text, WS_TOKEN_PATTERN).alias("__toks"),
        quality_col(text).cast("decimal(24,6)").alias("__q"),
        F.length(text).alias("__chars"))
    return (per_doc.groupBy("lang", "source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("__toks").alias("total_tokens"),
                 F.round(F.sum("__q").cast("double"), 6)
                  .alias("total_quality"),
                 F.round(F.expr("percentile(__chars, 0.5)"), 6)
                  .alias("p50_chars")))


# PII patterns chosen for identical semantics in Java regex (Spark) and
# RE2 (DuckDB oracle): no backrefs, no lookaround, \b supported by both.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
}
PII_ORDER = ("email", "ipv4", "phone")


def pii_scan(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_email, n_ipv4, n_phone): per-doc PII match counts —
    row-local regexp counts fused into the scan, zero shuffles."""
    text = F.col(text_col)
    return documents.select(
        "doc_id",
        *[_match_count(text, PII_PATTERNS[k]).alias(f"n_{k}")
          for k in PII_ORDER])


def pii_redact(documents: DataFrame, text_col: str = "text",
               out_col: str = "clean_text") -> DataFrame:
    """documents + `clean_text` with each PII class replaced by its
    <CLASS> token — sequential regexp_replace projections (row-local)."""
    clean = F.col(text_col)
    for k in PII_ORDER:
        clean = F.regexp_replace(clean, PII_PATTERNS[k], f"<{k.upper()}>")
    return documents.withColumn(out_col, clean)


def chunk_documents(documents: DataFrame, window: int = 64,
                    overlap: int = 16,
                    text_col: str = "text") -> DataFrame:
    """(doc_id, chunk_id, chunk_text, n_tokens): overlapping token-window
    chunks — the retrieval/RAG indexing primitive (and the context-window
    splitter for long-document training).

    Chunk i covers tokens [i·stride, i·stride + window) with
    stride = window − overlap; the tail chunk may be short; a doc with
    ≤ overlap tokens still yields exactly one chunk, so no document
    silently disappears from the index. Everything is a row-local array
    expression over ONE token-array binding (split once, slice per
    chunk) — chunking is embarrassingly parallel and adds no shuffle.
    """
    if overlap >= window:
        raise ValueError("overlap must be < window")
    stride = window - overlap
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                    lambda x: x != "")
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.size("__toks") - F.lit(overlap)) / F.lit(stride))
         .cast("int"))
    chunk = F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id")
    return (
        documents.select("doc_id", toks.alias("__toks"))
        .select("doc_id", "__toks", chunk)
        .select(
            "doc_id", "chunk_id",
            F.array_join(
                F.slice("__toks", F.col("chunk_id") * stride + 1, window),
                " ").alias("chunk_text"),
            F.size(F.slice("__toks", F.col("chunk_id") * stride + 1, window))
             .alias("n_tokens"),
        )
    )


def normalized_text(text: Column) -> Column:
    """lower + collapse whitespace + trim — the canonical form fingerprints
    and exact-dedup hash over."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def doc_fingerprint(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint): md5 of the normalized text."""
    return documents.select(
        "doc_id", F.md5(normalized_text(F.col(text_col))).alias("fingerprint"))


def curate_documents(documents: DataFrame, benchmark: DataFrame,
                     lang: str = "en", min_quality: float = 0.5,
                     min_tokens: int = 50, max_tokens: int = 10_000,
                     contamination_ngram: int = 4,
                     text_col: str = "text",
                     keep_cols: tuple[str, ...] = (),
                     benchmark_bloom: DataFrame | None = None) -> DataFrame:
    """End-to-end curation: (doc_id, *keep_cols, quality, ws_tokens) for
    docs that are the target language, above the quality floor, inside
    the token budget, and NOT contaminated by the benchmark corpus.
    `keep_cols` carries extra input columns (e.g. text/source for a
    downstream dedup stage) through WITHOUT a join-back — the one-scan
    property below would otherwise be lost to a self-join on doc_id.

    Plan shape: language, quality, and token metrics are all row-local
    expressions, so they evaluate in ONE scan of the corpus with the
    three predicates fused into it (no metric self-joins); the only join
    is the broadcast n-gram contamination anti-join. At 100 TB this is a
    single pass over the data — the property a curation pipeline must
    have, and one the equivalent four-way-join SQL formulation (see the
    oracle) only reaches if its optimizer collapses the self-joins.

    `benchmark_bloom` (a precomputed `sampling.benchmark_shingle_bloom`
    bitmap of the benchmark's contamination_ngram-shingles) switches the
    contamination stage to the Bloom-pruned-but-exact path: SAME
    accepted set (no false negatives ⇒ the exact verify sees every true
    hit), but the corpus pays a fixed ≤ 256 KiB bitmap broadcast instead
    of re-broadcasting every distinct benchmark n-gram — the standing-
    corpus form `streaming/pipeline` rides per trigger.
    """
    from .sampling import bloom_pruned_contamination, ngram_contamination

    text = F.col(text_col)
    ws_tokens = _match_count(text, WS_TOKEN_PATTERN)
    # spread(): regex metrics are CPU-bound and a small parquet scans as
    # one partition — fan the narrow input out to full parallelism first
    extra = [c for c in keep_cols if c not in ("doc_id", text_col)]
    kept = (
        spread(documents)
        .select("doc_id", text_col, *extra,
                quality_col(text).alias("quality"),
                ws_tokens.alias("ws_tokens"))
        .filter((lang_pred_col(F.col(text_col)) == F.lit(lang))
                & (F.col("quality") >= min_quality)
                & (F.col("ws_tokens") >= min_tokens)
                & (F.col("ws_tokens") <= max_tokens))
        # kept feeds BOTH the contamination shingling and the final
        # anti-join; checkpoint so the regex-metric scan runs once
        .localCheckpoint()
    )
    if benchmark_bloom is not None:
        contaminated = bloom_pruned_contamination(
            kept.select("doc_id", text_col), benchmark,
            n=contamination_ngram, text_col=text_col,
            bloom=benchmark_bloom).select("doc_id")
    else:
        contaminated = ngram_contamination(
            kept.select("doc_id", text_col), benchmark,
            n=contamination_ngram, text_col=text_col).select("doc_id")
    return (kept.join(contaminated, "doc_id", "left_anti")
            .select("doc_id", *[c for c in keep_cols if c != "doc_id"],
                    "quality", "ws_tokens"))


def quality_ecdf(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, quality, quality_pct): each document's EXACT percentile
    rank (inclusive ECDF) of the quality score — the normalization step
    before combining heterogeneous signals or thresholding "keep the
    top X%" in a curation pipeline.

    The naive global rank is a full sort into one ordered partition —
    the classic scale trap. Here the rank comes from a histogram
    cum-sum instead: the 6-dp-rounded score has BOUNDED cardinality
    (≤ 10⁶ distinct values no matter the corpus size), so the cum-sum
    window runs over a histogram-sized frame and broadcasts back onto
    the corpus — no row ever sorts globally."""
    from pyspark.sql import Window

    q = documents.select(
        "doc_id", quality_col(F.col(text_col)).alias("quality"))
    hist = q.groupBy("quality").agg(F.count(F.lit(1)).alias("__c"))
    w = Window.orderBy("quality").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select("quality", F.sum("__c").over(w).alias("__cum"))
    tot = q.agg(F.count(F.lit(1)).alias("__n"))
    return (q.join(F.broadcast(cum), "quality")
            .crossJoin(F.broadcast(tot))
            .select("doc_id", "quality",
                    F.round(F.col("__cum") / F.col("__n"), 6)
                     .alias("quality_pct")))


def quantile_normalize(documents: DataFrame, text_col: str = "text",
                       source_col: str = "source") -> DataFrame:
    """(doc_id, source, quality, src_pct, quality_norm): per-source
    quantile normalization of the quality score — each document's score
    is replaced by the GLOBAL score at the same percentile its score
    occupies WITHIN ITS SOURCE. Scores from heterogeneous sources (a
    web crawl vs curated books) then share one scale, so a single
    corpus-wide threshold selects the same per-source fraction instead
    of silently dropping the harder source wholesale.

    Scale shape: same histogram machinery as `quality_ecdf` — the
    6-dp score has bounded cardinality, so both the per-source ECDF
    (window over the per-source histogram) and the global quantile
    function (cum-sum over the pooled histogram) are histogram-sized
    frames, broadcast back onto the corpus. The percentile→quantile
    lookup is an inequality join between the TWO HISTOGRAMS (never the
    corpus): min global score whose ECDF covers the source percentile.
    No global row sort anywhere. Percentiles compare as exact count
    ratios (k/n IEEE division is correctly rounded in every engine), so
    the oracle matches bit-for-bit."""
    from pyspark.sql import Window

    q = documents.select(
        "doc_id", F.col(source_col).alias("source"),
        quality_col(F.col(text_col)).alias("quality"))
    # per-source inclusive ECDF over the per-source score histogram
    shist = (q.groupBy("source", "quality")
             .agg(F.count(F.lit(1)).alias("__c")))
    ws = (Window.partitionBy("source").orderBy("quality")
          .rowsBetween(Window.unboundedPreceding, 0))
    stot = q.groupBy("source").agg(F.count(F.lit(1)).alias("__n"))
    scum = (shist
            .select("source", "quality", F.sum("__c").over(ws).alias("__cum"))
            .join(F.broadcast(stot), "source")
            .select("source", "quality",
                    (F.col("__cum") / F.col("__n")).alias("__pct")))
    # global quantile function from the pooled histogram
    ghist = q.groupBy("quality").agg(F.count(F.lit(1)).alias("__c"))
    wg = Window.orderBy("quality").rowsBetween(Window.unboundedPreceding, 0)
    gn = q.agg(F.count(F.lit(1)).alias("__N"))
    gcum = (ghist
            .select(F.col("quality").alias("__gq"),
                    F.sum("__c").over(wg).alias("__gcum"))
            .crossJoin(F.broadcast(gn))
            .select("__gq", (F.col("__gcum") / F.col("__N")).alias("__gpct")))
    # histogram × histogram inequality join: smallest global score whose
    # cumulative share reaches the within-source percentile
    mapped = (scum.join(F.broadcast(gcum), F.col("__gpct") >= F.col("__pct"))
              .groupBy("source", "quality", "__pct")
              .agg(F.min("__gq").alias("quality_norm")))
    return (q.join(F.broadcast(mapped), ["source", "quality"])
            .select("doc_id", "source", "quality",
                    F.round("__pct", 6).alias("src_pct"),
                    F.col("quality_norm")))
