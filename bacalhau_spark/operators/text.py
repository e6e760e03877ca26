"""Text-analysis operators over the documents table.

Reference capability: the grep/sed text plane and arbitrary text code in
containers (`pkg/test/scenario/test_scenarios.go:77-132`). Here the
training-data-pipeline text stack is first-class: tokenization, language-ID
heuristic, quality scoring, token counting, document fingerprinting — all as
JVM-side expressions (no Python UDFs), so they run inside whole-stage codegen
over 100 TB of text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bacalhau_spark.catalog import spread_compute, table
from bacalhau_spark.functions import words

# Tiny stopword marker sets for the language-ID heuristic. A production
# pipeline swaps in real frequency tables; the *plumbing* (per-language score
# -> argmax, one pass over tokens) is the part that matters at scale.
_LANG_MARKERS = {
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "los", "y", "las"),
}

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


def _marker_hits(w, markers):
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(w, lambda x: F.array_contains(arr, x)))


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents scan spread across cores (catalog.spread_compute) — used
    ONLY by the operators whose per-row CPU measurably dwarfs the exchange
    (tokenize-explode, 4-language marker scans, BM25 term filters; A/B'd at
    sf0.1). The cheap per-row ops (quality ratios, fingerprint, chunking,
    token counts) keep the plain scan: their work doesn't buy back the
    shuffle."""
    return spread_compute(spark, table(spark, sf_dir, "documents")
                          .select("doc_id", "text"), "doc_id")


def q11_tokenize_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + word count (Q11) — the UDTF-shaped explode. At scale the
    groupBy key (doc_id, word) is high-cardinality and well-spread; map-side
    combine collapses within-partition repeats before the shuffle."""
    docs = _docs(spark, sf_dir)
    return (
        docs.select("doc_id", F.explode(words("text")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("n"))
        .orderBy("doc_id", "word")
    )


def nd_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID. One pass over the token array per doc;
    argmax over per-language hit counts (ties -> first language in fixed
    order, deterministic)."""
    docs = _docs(spark, sf_dir)
    w = words("text")
    scored = docs.select(
        "doc_id",
        *[
            _marker_hits(w, markers).alias(f"hits_{lang}")
            for lang, markers in _LANG_MARKERS.items()
        ],
    )
    langs = list(_LANG_MARKERS)
    best = F.lit(langs[0])
    best_hits = F.col(f"hits_{langs[0]}")
    for lang in langs[1:]:
        cond = F.col(f"hits_{lang}") > best_hits
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_hits = F.when(cond, F.col(f"hits_{lang}")).otherwise(best_hits)
    return (
        scored.select("doc_id", best.alias("guess"),
                      best_hits.cast("int").alias("hits"))
        .orderBy("doc_id")
    )


def nd_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: token count, type-token ratio, stopword ratio, mean
    word length — the standard cheap filters before expensive dedup/training
    stages. All ratios are exact double divisions (oracle-identical)."""
    docs = table(spark, sf_dir, "documents")
    w = words("text")
    n_tok = F.size(w)
    n_types = F.size(F.array_distinct(w))
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x)))
    mean_wlen = (F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
                 .cast("double") / n_tok)
    # Ratios stay unrounded: int/int division is bit-identical across engines
    # while ROUND-of-double is not (see scalar.q04 note).
    return (
        docs.select(
            "doc_id",
            n_tok.alias("n_tokens"),
            (n_types.cast("double") / n_tok).alias("ttr"),
            (n_stop.cast("double") / n_tok).alias("stop_ratio"),
            mean_wlen.alias("mean_wlen"),
        )
        .orderBy("doc_id")
    )


def nd_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token counting: words, digit runs, and punctuation each
    count as one token (the cheap pre-tokenizer estimate used for corpus
    sizing)."""
    docs = table(spark, sf_dir, "documents")
    bpe = F.size(F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0))
    return (
        docs.select(
            "doc_id",
            F.size(words("text")).alias("n_words"),
            bpe.alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


# Real merge-table BPE (Sennrich-style): merges applied in rank order,
# each replacing all non-overlapping occurrences left-to-right. The table
# is fixed (rank = English pair frequency, with second-order merges like
# th+e, an+d, in+g over earlier outputs) so both engines compute identical
# tokenizations. A production pipeline swaps in a learned table; the
# mechanism — ranked pair merges over an initial character segmentation —
# is the real algorithm, not the regex estimate nd_token_count keeps for
# cheap corpus sizing.
BPE_MERGES = (
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("a", "t"), ("s", "t"), ("e", "n"),
    ("o", "r"), ("t", "e"), ("an", "d"), ("a", "r"), ("o", "u"),
    ("i", "s"), ("i", "t"), ("a", "l"), ("l", "e"), ("c", "h"),
    ("r", "o"), ("in", "g"), ("s", "e"), ("u", "e"), ("u", "r"),
    ("l", "o"), ("a", "s"), ("o", "w"), ("the", "r"), ("m", "e"),
    ("d", "e"), ("c", "o"), ("l", "a"), ("h", "a"), ("v", "e"),
    ("b", "a"), ("s", "c"), ("f", "a"), ("g", "r"), ("p", "a"),
)
_BPE_SEP = "\x01"


def nd_bpe_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-table BPE token counting. Tokenization state is the text with
    every token terminated by a separator byte; applying merge (a, b) is a
    LITERAL string replace of 'a<SEP>b<SEP>' with 'ab<SEP>' — plain
    replace() is non-overlapping left-to-right in both engines, which is
    exactly the within-rank application order of BPE. The whole ranked
    chain compiles to one whole-stage-codegen projection: no Python, no
    broadcast state, no shuffle before the output sort — strictly better
    at 100 TB than a Pandas-UDF merge loop shipping rank tables to
    workers. Spaces are single tokens by construction (no merge contains
    one) and are subtracted from the count."""
    docs = table(spark, sf_dir, "documents")
    state = F.regexp_replace(F.lower(F.col("text")), "([\\s\\S])",
                             "$1" + _BPE_SEP)
    for a, b in BPE_MERGES:
        state = F.replace(state, F.lit(f"{a}{_BPE_SEP}{b}{_BPE_SEP}"),
                          F.lit(f"{a}{b}{_BPE_SEP}"))
    n_sep = F.length(state) - F.length(
        F.replace(state, F.lit(_BPE_SEP), F.lit("")))
    n_space = F.length("text") - F.length(
        F.replace(F.col("text"), F.lit(" "), F.lit("")))
    n_chars = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    bpe = (n_sep - n_space).cast("int")
    return (
        docs.select(
            "doc_id",
            F.size(words("text")).alias("n_words"),
            bpe.alias("n_bpe_tokens"),
            # chars-per-token: int/int division is bit-identical cross-engine
            (n_chars.cast("double") / (n_sep - n_space))
            .alias("chars_per_token"),
        )
        .orderBy("doc_id")
    )


def _bpe_oracle_sql() -> str:
    expr = "regexp_replace(lower(text), '([\\s\\S])', '\\1' || chr(1), 'g')"
    for a, b in BPE_MERGES:
        expr = (f"replace({expr}, '{a}' || chr(1) || '{b}' || chr(1), "
                f"'{a}{b}' || chr(1))")
    return (
        f"WITH s AS (SELECT doc_id, text, {expr} AS st FROM documents) "
        "SELECT doc_id, "
        "CAST(len(string_split(lower(text), ' ')) AS INTEGER) AS n_words, "
        "CAST((length(st) - length(replace(st, chr(1), ''))) "
        "- (length(text) - length(replace(text, ' ', ''))) AS INTEGER) "
        "AS n_bpe_tokens, "
        "CAST(length(replace(text, ' ', '')) AS DOUBLE) / "
        "((length(st) - length(replace(st, chr(1), ''))) "
        "- (length(text) - length(replace(text, ' ', '')))) "
        "AS chars_per_token "
        "FROM s ORDER BY doc_id"
    )


def nd_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set. Two docs with the same vocabulary collide — the cheap
    first-stage near-dup key (followed by minhash, dedup.py)."""
    docs = table(spark, sf_dir, "documents")
    canon = F.array_join(F.array_sort(F.array_distinct(words("text"))), " ")
    return (
        docs.select("doc_id", F.md5(canon).alias("fp"))
        .orderBy("doc_id")
    )


BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("spark", "vector")
BM25_TOPK = 20


def nd_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance ranking: top-20 documents for a fixed two-term query.

    Per-doc term frequencies and length are one codegen pass over the token
    array; the corpus stats (N, avgdl, per-term df) are ONE tiny aggregate
    broadcast back — so the whole ranker is two narrow passes + a broadcast,
    no wide shuffle, and scales linearly with corpus bytes. idf uses the raw
    odds form (N - df + 0.5)/(df + 0.5) rather than its log: the monotone
    transform preserves the ranking while keeping every operation (+ * /)
    correctly-rounded IEEE, so Spark and DuckDB produce bit-identical
    scores (ln differs in last-ulp between libm implementations)."""
    docs = _docs(spark, sf_dir)
    w = words("text")

    def tf_of(term):
        # One-arg lambda on purpose: F.filter treats a 2-arg lambda as
        # (element, index), so a `t=term` default would bind the index.
        return F.size(F.filter(w, lambda x: x == F.lit(term)))

    base = docs.select(
        "doc_id", F.size(w).alias("dl"),
        *[tf_of(t).alias(f"tf{i}") for i, t in enumerate(BM25_TERMS)])
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
          for i in range(len(BM25_TERMS))])
    joined = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    score = None
    for i in range(len(BM25_TERMS)):
        tf = F.col(f"tf{i}").cast("double")
        dfreq = F.col(f"df{i}").cast("double")
        idf = ((F.col("n_docs").cast("double") - dfreq + F.lit(0.5))
               / (dfreq + F.lit(0.5)))
        norm = (tf + F.lit(BM25_K1)
                * (F.lit(1 - BM25_B)
                   + F.lit(BM25_B) * (F.col("dl").cast("double") / avgdl)))
        term = idf * ((tf * F.lit(BM25_K1 + 1)) / norm)
        score = term if score is None else score + term
    return (
        joined.select(
            "doc_id",
            *[F.col(f"tf{i}").cast("int").alias(f"tf_{t}")
              for i, t in enumerate(BM25_TERMS)],
            score.alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(BM25_TOPK)
    )


NGRAM_TOPK = 20


def nd_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigrams: per-doc adjacent word pairs (one codegen
    transform over the token array — no self-join, no string re-tokenize),
    exploded into a (bigram -> count) aggregate. Map-side combine collapses
    within-partition repeats, so the shuffle carries at most
    |distinct bigrams| rows per partition; the final top-k is a
    TakeOrdered, never a global sort. Ties break on the bigram text, so the
    cut at k is deterministic."""
    docs = table(spark, sf_dir, "documents")
    # Reference the PROJECTED token array ("ws"), not the raw tokenize
    # expression — inlining it would make Catalyst re-split the text per
    # access (see dedup._rolling_shingle_keys note).
    bigrams = F.when(
        F.size(F.col("ws")) >= 2,
        F.expr("transform(sequence(1, size(ws) - 1), "
               "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(words("text").alias("ws"))
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "bigram")
        .limit(NGRAM_TOPK)
    )


def _sql_marker_hits(markers: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{m}'" for m in markers)
    return (f"len(list_filter(string_split(lower(text), ' '), "
            f"x -> list_contains([{inlist}], x)))")


CHUNK_WORDS = 50
CHUNK_STRIDE = 25


def nd_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (50-word chunks, 50% overlap) — the
    LLM-training segmentation op. One explode per document over a computed
    start sequence; all JVM-side (transform/slice/array_join inside
    codegen), no Python in the path. Chunk count per doc =
    ceil(n_words / stride) clipped to starts < n_words."""
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    w = words("text")
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(F.size(w) - 1, F.lit(0)),
                   F.lit(CHUNK_STRIDE)),
        lambda s: s < F.size(w))
    return (
        docs.select(
            "doc_id",
            F.posexplode(
                F.transform(starts,
                            lambda s: F.array_join(
                                F.slice(w, s + 1, CHUNK_WORDS), " ")))
            .alias("chunk_idx", "chunk"))
        .select("doc_id", "chunk_idx",
                F.size(F.split("chunk", " ")).alias("chunk_words"),
                F.md5("chunk").alias("chunk_hash"))
        .orderBy("doc_id", "chunk_idx")
    )


def nd_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF term weighting over a 50-doc slice: one explode for term
    frequencies, one distinct-count aggregate for document frequencies,
    joined back on the term. Two shuffles (doc_id x word, then word); at
    corpus scale the df side is the small relation and broadcasts. idf =
    ln(N/df), rounded — engines agree to 4 decimals on libm ln."""
    w = (table(spark, sf_dir, "documents")
         .where(F.col("doc_id") < 50)
         .select("doc_id", F.explode(words("text")).alias("word")))
    tf = w.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dfreq = w.groupBy("word").agg(
        F.countDistinct("doc_id").alias("doc_freq"))
    tfidf = F.round(F.col("tf") * F.log(F.lit(50.0) / F.col("doc_freq")), 4)
    return (
        tf.join(F.broadcast(dfreq), "word")
        .select("doc_id", "word", "tf", tfidf.alias("tfidf"))
        .orderBy("doc_id", "word")
    )


def nd_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup on a bounded slice: pairwise levenshtein over
    the first 40 chars of a 30-doc window. Quadratic by nature — at scale
    this runs only WITHIN candidate buckets produced by cheap keys
    (fingerprint/minhash), never across the corpus; the bounded slice here
    stands in for one bucket."""
    docs = (table(spark, sf_dir, "documents")
            .where(F.col("doc_id") < 30)
            .select("doc_id", F.substring("text", 1, 40).alias("head")))
    a = docs.select(F.col("doc_id").alias("a_id"), F.col("head").alias("a_h"))
    b = docs.select(F.col("doc_id").alias("b_id"), F.col("head").alias("b_h"))
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id",
                F.levenshtein("a_h", "b_h").alias("dist"))
        .where(F.col("dist") <= 25)
        .orderBy("a_id", "b_id")
    )


def nd_word_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM surprisal proxy per document — the cheap stand-in for
    perplexity-based quality filtering (the CCNet/KenLM gate) that stays
    integer-exact: each word scores total_words DIV corpus_freq(word)
    (rare words score high), summed per document. Integer division keeps
    the sum associative, so it is shuffle-order stable and hash-gatable
    where a float log-prob sum would not be.

    Scale shape (de-skewed): a window count partitioned by the raw word
    key would funnel every occurrence of each Zipf-head word ("the" is
    percents of any real corpus) into one partition. Instead the token
    stream first reduces to per-(doc, word) counts — partial aggregation
    combines the head words map-side, so the shuffle carries at most one
    row per document per word. The reduced (doc, word) counts are
    materialized ONCE per call (lazy localCheckpoint — the PMI
    convention, r14): the corpus-frequency rollup, the join probe and
    the grand total all scan the count frame, so the token stream is
    scanned exactly once. The frequency attaches back at doc
    granularity where the hot key is bounded by n_docs and AQE's
    skew-join split handles the residue. The grand total t is SUM(c)
    over the counts — the same integer as the token count, with no
    extra pass over text."""
    docs = spread_compute(spark, table(spark, sf_dir, "documents")
                          .select("doc_id", "text"), "doc_id")
    wordsdf = docs.select("doc_id", F.explode(words("text")).alias("word"))
    # Lazily checkpoint the reduced per-doc counts (the PMI convention,
    # r14): freq and the main join both consume dw — one corpus pass
    # instead of two. The corpus token total is the SAME integer as
    # SUM(c) over dw (every occurrence counted once either way), so the
    # third full tokenize pass the old `total` branch paid is gone too.
    # 1.01 s -> 0.77 s at sf0.1 (experiments/count_frame_ckpt_r14.py).
    dw = (wordsdf.groupBy("doc_id", "word").agg(F.count("*").alias("c"))
          .localCheckpoint(eager=False))
    freq = dw.groupBy("word").agg(F.sum("c").alias("f"))
    total = dw.agg(F.sum("c").cast("long").alias("t"))
    return (
        dw.join(freq, "word")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(F.sum("c").cast("long").alias("n_words"),
             F.sum(F.col("c") * F.expr("t div f")).alias("rarity_sum"))
        .orderBy("doc_id")
    )


_WORD_RARITY_ORACLE = """
WITH wds AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
             FROM documents),
wf AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY word) AS f FROM wds),
t AS (SELECT COUNT(*) AS t FROM wds)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(t // f) AS BIGINT) AS rarity_sum
FROM wf CROSS JOIN t GROUP BY doc_id ORDER BY doc_id
"""


def nd_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM conditional surprisal per document — the context-
    sensitive half of the perplexity-style quality gate ([[nd_word_rarity]]
    is the unigram half): each bigram occurrence scores
    c(w1) DIV c(w1,w2), where c(w1) counts w1 as a CONTEXT (= the number
    of bigrams starting with w1, so sum over continuations equals the
    context count and every score is >= 1). Text whose word PAIRS are
    improbable even when the words themselves are common — shuffled or
    machine-mangled text that a unigram gate cannot see — scores high.
    Integer division keeps the per-doc sum associative and therefore
    shuffle-order stable and hash-gatable.

    Scale shape (same de-skew as nd_word_rarity): bigrams reduce FIRST to
    per-(doc, bigram) counts, so the Zipf head ("of the") is combined
    map-side and the shuffle carries at most one row per document per
    distinct bigram. Both corpus tables — bigram frequency and context
    frequency — are rollups of that same reduced frame (the context key
    is the bigram's first token, a projection, not a second pass over
    text), and both attach back by broadcast-resistant keys whose hot
    rows are bounded by n_docs with AQE skew-split as the residue. The
    raw token stream is scanned once and never shuffled — enforced
    since r14 by a lazy localCheckpoint of the reduced counts (the PMI
    convention): all three consumers scan the count frame, so the
    one-corpus-pass claim holds by construction, not by AQE reuse."""
    docs = _docs(spark, sf_dir)
    w = words("text")
    bigrams = F.zip_with(
        F.slice(w, 1, F.size(w) - 1),
        F.slice(w, 2, F.size(w) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b))
    bg = docs.select("doc_id", F.explode(bigrams).alias("bigram"))
    # Lazily checkpoint the REDUCED per-doc counts: THREE branches
    # consume db (bfreq, ctx, main join) and Spark shares no subplans
    # across DataFrame branches, so without the cut each branch re-ran
    # the tokenize+explode corpus pass (the nd_pmi_collocations fix,
    # r14: 1.73 s -> 1.45 s here, experiments/count_frame_ckpt_r14.py).
    # Holds counts only, never the token stream; recomputed per call.
    db = (bg.groupBy("doc_id", "bigram").agg(F.count("*").alias("c"))
          .localCheckpoint(eager=False))
    bfreq = db.groupBy("bigram").agg(F.sum("c").alias("c12"))
    ctx = (db.groupBy(F.substring_index("bigram", " ", 1).alias("w1"))
           .agg(F.sum("c").alias("c1")))
    return (
        db.join(bfreq, "bigram")
        .withColumn("w1", F.substring_index("bigram", " ", 1))
        .join(ctx, "w1")
        .groupBy("doc_id")
        .agg(F.sum("c").cast("long").alias("n_bigrams"),
             F.sum(F.col("c") * F.expr("c1 div c12"))
             .cast("long").alias("surprisal_sum"))
        .orderBy("doc_id")
    )


_BIGRAM_SURPRISAL_ORACLE = """
WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
           FROM documents),
bg AS (SELECT doc_id,
              unnest(list_transform(range(1, len(ws)),
                                    i -> ws[i] || ' ' || ws[i + 1]))
              AS bigram
       FROM w),
db AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg
       GROUP BY doc_id, bigram),
bf AS (SELECT bigram, SUM(c) AS c12 FROM db GROUP BY bigram),
cx AS (SELECT split_part(bigram, ' ', 1) AS w1, SUM(c) AS c1 FROM db
       GROUP BY w1)
SELECT db.doc_id, CAST(SUM(db.c) AS BIGINT) AS n_bigrams,
       CAST(SUM(db.c * (cx.c1 // bf.c12)) AS BIGINT) AS surprisal_sum
FROM db JOIN bf USING (bigram)
JOIN cx ON split_part(db.bigram, ' ', 1) = cx.w1
GROUP BY db.doc_id ORDER BY db.doc_id
"""


PMI_TOP_K = 50
PMI_MIN_COUNT = 5
PMI_SCALE = 1000


def nd_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide collocation mining: the top-PMI_TOP_K bigrams by
    pointwise mutual information — the phrase-mining pass that decides
    which word pairs a tokenizer should treat as units ("new york"-class
    phrases). PMI = log(P(w1,w2) / (P(w1) P(w2))) is monotone in the
    rational T * c12 / (c1 * c2), so the ranking is computed as the
    integer (c12 * T * PMI_SCALE) DIV (c1 * c2) — no floats anywhere,
    the order is exact, and ties break lexicographically on the bigram
    (a total order, so the cut is deterministic on any partitioning).
    Bigrams below PMI_MIN_COUNT occurrences are dropped first (the
    standard support floor: a hapax pair has degenerate PMI).

    Scale shape: one explode pass reduces immediately to bigram counts
    (map-side combine collapses the Zipf head); marginals c1/c2 are
    projections of that reduced frame, not second passes over text; the
    support floor cuts the candidate set before the two marginal joins;
    and the final top-K is a bounded sort over the survivors. The token
    stream is scanned once, never shuffled. The reduced bigram-count
    frame is lazily localCheckpoint'ed: FOUR branches consume it (main,
    c1, c2, the t guard) and Spark shares no subplans across DataFrame
    branches — the r14 before-plan shows the explode+count lineage four
    times with zero ReusedExchange — so without the cut each branch
    re-ran the corpus pass (2.7 s -> 1.3 s at sf0.1,
    experiments/ab_records_r14.txt). The checkpoint holds the
    REDUCED counts (the co-occurrence sketch a real pipeline would
    materialize anyway), never the token stream, and is recomputed per
    call — no cross-run state."""
    docs = _docs(spark, sf_dir)
    w = words("text")
    bigrams = F.zip_with(
        F.slice(w, 1, F.size(w) - 1),
        F.slice(w, 2, F.size(w) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b))
    bf = (docs.select(F.explode(bigrams).alias("bigram"))
          .groupBy("bigram").agg(F.count("*").alias("c12"))
          .localCheckpoint(eager=False))
    c1 = (bf.groupBy(F.substring_index("bigram", " ", 1).alias("w1"))
          .agg(F.sum("c12").alias("c1")))
    c2 = (bf.groupBy(F.substring_index("bigram", " ", -1).alias("w2"))
          .agg(F.sum("c12").alias("c2")))
    # The triple product c12 * t * PMI_SCALE overflows int64 at corpus
    # scale (t ~ 1e11 tokens, head bigrams c12 ~ 1e9 -> ~1e23): Spark
    # (non-ANSI) would wrap silently exactly where the operator claims
    # exactness. The product therefore runs in DECIMAL(38,0) (int128-
    # class, like the oracle's HUGEINT); `div` yields BIGINT and is
    # exact whenever the QUOTIENT fits int64 — and the quotient is
    # bounded by t * PMI_SCALE (c12 <= min(c1, c2)), so the in-plan
    # guard on t below is the full precondition. At t = 9.2e15 tokens
    # (~40 PB of text) the guard fires loudly instead of corrupting.
    t_cap = (2**63 - 1) // PMI_SCALE
    overflow_msg = F.concat(
        F.lit(f"nd_pmi_collocations: corpus token mass exceeds {t_cap} "
              "(pmi_x1000 would overflow int64); t="),
        F.col("t").cast("string"))
    total = (bf.agg(F.sum("c12").cast("long").alias("t"))
             .select(F.when(F.col("t") > t_cap,
                            F.raise_error(overflow_msg).cast("long"))
                     .otherwise(F.col("t")).alias("t")))
    return (
        bf.filter(F.col("c12") >= PMI_MIN_COUNT)
        .withColumn("w1", F.substring_index("bigram", " ", 1))
        .withColumn("w2", F.substring_index("bigram", " ", -1))
        .join(c1, "w1").join(c2, "w2")
        .crossJoin(F.broadcast(total))
        .select("bigram", F.col("c12").cast("long").alias("c12"),
                F.expr(f"(CAST(c12 AS DECIMAL(38,0)) * t * {PMI_SCALE}) "
                       f"div (CAST(c1 AS DECIMAL(38,0)) * c2)")
                .cast("long").alias("pmi_x1000"))
        .orderBy(F.col("pmi_x1000").desc(), "bigram")
        .limit(PMI_TOP_K)
    )


_PMI_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
           FROM documents),
bg AS (SELECT unnest(list_transform(range(1, len(ws)),
                                    i -> ws[i] || ' ' || ws[i + 1]))
              AS bigram
       FROM w),
bf AS (SELECT bigram, COUNT(*) AS c12 FROM bg GROUP BY bigram),
m1 AS (SELECT split_part(bigram, ' ', 1) AS w1, SUM(c12) AS c1 FROM bf
       GROUP BY w1),
m2 AS (SELECT split_part(bigram, ' ', 2) AS w2, SUM(c12) AS c2 FROM bf
       GROUP BY w2),
t AS (SELECT SUM(c12) AS t FROM bf)
SELECT bigram, CAST(c12 AS BIGINT) AS c12,
       CAST((CAST(c12 AS HUGEINT) * t.t * {PMI_SCALE})
            // (CAST(m1.c1 AS HUGEINT) * m2.c2) AS BIGINT)
       AS pmi_x1000
FROM bf
JOIN m1 ON split_part(bf.bigram, ' ', 1) = m1.w1
JOIN m2 ON split_part(bf.bigram, ' ', 2) = m2.w2
CROSS JOIN t
WHERE c12 >= {PMI_MIN_COUNT}
ORDER BY pmi_x1000 DESC, bigram LIMIT {PMI_TOP_K}
"""


SKIPGRAM_WIN = 2
SKIPGRAM_TOP_K = 50


def nd_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram training-pair extraction — the word2vec/fastText data
    pass: every (center, context) pair within ±SKIPGRAM_WIN positions,
    counted corpus-wide, top-SKIPGRAM_TOP_K by (n DESC, w1, w2) — a
    total order, so the cut is deterministic on any partitioning. At
    100 TB this IS the embedding-training dataset builder; the count
    table doubles as the co-occurrence matrix sketch.

    Scale shape: pair generation is pure codegen over the projected
    token array (zip_with over offset slices — no joins, no positional
    explode; the d=1 and d=2 streams and both (center, context)
    orientations concatenate into ONE array per doc before the single
    explode). The stream reduces immediately to (w1, w2) counts with
    map-side combine collapsing the Zipf head; the token stream is
    scanned once and never shuffled — only the reduced pair counts
    move. The final top-K is a bounded sort over the reduced frame."""
    docs = _docs(spark, sf_dir)
    w = words("text")
    n = F.size(w)

    def _fwd(d):
        # left-to-right pairs at distance d: (w[i], w[i+d]) as a
        # 'a b'-joined string; empty when the doc is shorter than d+1
        ln = F.greatest(n - d, F.lit(0))
        return F.zip_with(F.slice(w, 1, ln), F.slice(w, 1 + d, ln),
                          lambda a, b: F.concat(a, F.lit(" "), b))

    def _rev(d):
        ln = F.greatest(n - d, F.lit(0))
        return F.zip_with(F.slice(w, 1 + d, ln), F.slice(w, 1, ln),
                          lambda a, b: F.concat(a, F.lit(" "), b))

    pairs = F.concat(*[f(d) for d in range(1, SKIPGRAM_WIN + 1)
                       for f in (_fwd, _rev)])
    return (
        docs.select(F.explode(pairs).alias("p"))
        .groupBy(F.substring_index("p", " ", 1).alias("w1"),
                 F.substring_index("p", " ", -1).alias("w2"))
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "w1", "w2")
        .limit(SKIPGRAM_TOP_K)
    )


_SKIPGRAM_ORACLE = f"""
WITH w AS (SELECT string_split(lower(text), ' ') AS ws FROM documents),
pos AS (SELECT ws, i, d
        FROM w, unnest(range(1, len(ws) + 1)) u(i),
             (VALUES {", ".join(f"({d})"
                                for d in range(1, SKIPGRAM_WIN + 1))}) v(d)
        WHERE i + d <= len(ws)),
pairs AS (SELECT ws[i] AS w1, ws[i + d] AS w2 FROM pos
          UNION ALL
          SELECT ws[i + d], ws[i] FROM pos)
SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n FROM pairs
GROUP BY w1, w2 ORDER BY n DESC, w1, w2 LIMIT {SKIPGRAM_TOP_K}
"""

ZIPF_SCALE = 1_000_000


def nd_zipf_octaves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law corpus diagnostic: the token-frequency distribution
    binned by frequency OCTAVE (floor(log2 f), computed exactly as
    length(bin(f)) - 1 — bit-length integer arithmetic, portable where
    float log2 is not at the 2^k boundaries). Per octave: distinct word
    types, total token mass, and mass in parts-per-million of the
    corpus. A healthy natural-language crawl shows the Zipf signature
    (type counts decaying geometrically up the octaves, mass roughly
    flat); template floods and generated spam bend it — this is the
    one-page distribution fingerprint a data card plots.

    Scale shape: the token stream reduces once to per-word counts
    (map-side combine absorbs the Zipf head), the octave rollup runs
    over the vocabulary-sized frame, and the corpus total rides the
    same reduced frame as a broadcast 1-row aggregate — one scan, one
    word-keyed exchange, nothing else moves."""
    docs = _docs(spark, sf_dir)
    freq = (docs.select(F.explode(words("text")).alias("word"))
            .groupBy("word").agg(F.count("*").alias("f")))
    oct_ = (freq.select((F.length(F.bin("f")) - 1).cast("int")
                        .alias("octave"), "f")
            .groupBy("octave")
            .agg(F.count("*").cast("long").alias("n_types"),
                 F.sum("f").cast("long").alias("n_tokens")))
    total = oct_.agg(F.sum("n_tokens").cast("long").alias("t"))
    return (oct_.crossJoin(F.broadcast(total))
            .select("octave", "n_types", "n_tokens",
                    F.expr(f"n_tokens * {ZIPF_SCALE} div t")
                    .cast("long").alias("mass_ppm"))
            .orderBy("octave"))


_ZIPF_ORACLE = f"""
WITH wds AS (SELECT unnest(string_split(lower(text), ' ')) AS word
             FROM documents),
freq AS (SELECT word, COUNT(*) AS f FROM wds GROUP BY word),
oct AS (SELECT CAST(length(bin(f)) - 1 AS INTEGER) AS octave,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(f) AS BIGINT) AS n_tokens
        FROM freq GROUP BY octave),
t AS (SELECT SUM(n_tokens) AS t FROM oct)
SELECT octave, n_types, n_tokens,
       CAST(n_tokens * {ZIPF_SCALE} // t.t AS BIGINT) AS mass_ppm
FROM oct CROSS JOIN t ORDER BY octave
"""


_LANGID_ORACLE = (
    "WITH s AS (SELECT doc_id, "
    + ", ".join(f"{_sql_marker_hits(m)} AS hits_{lang}"
                for lang, m in _LANG_MARKERS.items())
    + " FROM documents) SELECT doc_id, CASE "
    "WHEN hits_es > hits_en AND hits_es > hits_de AND hits_es > hits_fr THEN 'es' "
    "WHEN hits_fr > hits_en AND hits_fr > hits_de THEN 'fr' "
    "WHEN hits_de > hits_en THEN 'de' ELSE 'en' END AS guess, "
    "CAST(greatest(hits_en, hits_de, hits_fr, hits_es) AS INTEGER) AS hits "
    "FROM s ORDER BY doc_id"
)

_STOP_LIST = ", ".join(f"'{s}'" for s in _STOPWORDS)

VOCAB_K = 512


def nd_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage audit: build the top-VOCAB_K corpus
    vocabulary (by frequency, ties broken lexicographically — a total
    order, so the cut is deterministic on any partitioning) and report
    per document its token count, out-of-vocabulary count, and OOV rate
    — the screen that decides whether a tokenizer's vocab fits a corpus
    before a training run commits to it.

    Scale shape: the vocab build is a groupBy(word).count (map-side
    combine collapses the Zipf head, the de-skew lesson) followed by a
    top-K over #distinct-words rows — bounded output, broadcast to the
    coverage pass, which is then a single codegen scan with a broadcast
    hash probe per token: the 100 TB token stream never shuffles and is
    read exactly twice (once to build, once to audit; production
    amortizes the build across many audits). OOV rate is an int/int
    division — bit-identical across engines, emitted raw."""
    return vocab_coverage_frame(
        spread_compute(spark, table(spark, sf_dir, "documents")
                       .select("doc_id", "text"), "doc_id"))


def vocab_coverage_frame(docs: DataFrame) -> DataFrame:
    """The coverage audit over an ARBITRARY (doc_id, text) frame
    (nd_vocab_coverage is the fixture-bound wrapper; also the
    property-test surface — hypothesis corpora pin the top-K tie-break
    and the all-OOV edge)."""
    toks = docs.select("doc_id", F.explode(words("text")).alias("word"))
    vocab = (toks.groupBy("word").agg(F.count("*").alias("n"))
             .orderBy(F.col("n").desc(), F.col("word"))
             .limit(VOCAB_K)
             .select("word", F.lit(True).alias("in_vocab")))
    return (toks.join(F.broadcast(vocab), "word", "left")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_tokens"),
                 F.sum(F.when(F.col("in_vocab").isNull(), 1)
                       .otherwise(0)).cast("long").alias("n_oov"))
            .withColumn("oov_rate",
                        F.col("n_oov").cast("double") / F.col("n_tokens"))
            .orderBy("doc_id"))


_VOCAB_ORACLE = f"""
WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
              FROM documents),
vocab AS (SELECT word FROM (SELECT word, COUNT(*) AS n FROM toks
                            GROUP BY word) f
          ORDER BY n DESC, word LIMIT {VOCAB_K})
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       AS n_oov,
       CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
       / COUNT(*) AS oov_rate
FROM toks t LEFT JOIN vocab v ON t.word = v.word
GROUP BY doc_id ORDER BY doc_id
"""


GIBBERISH_CPT_X100 = 580  # flag docs averaging > 5.80 chars per token


def nd_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chars-per-token compression proxy: n_chars / n_tokens per document
    plus a gibberish flag when the ratio exceeds GIBBERISH_CPT_X100/100 —
    the cheap screen for base64 blobs, minified code, and
    tokenizer-hostile text that blows up sequence budgets (tokenizers
    emit ~4-5 chars/token on clean prose; far more on noise — a real
    corpus gates at ~12; the fixture threshold sits inside the
    synthetic-prose distribution, 465-605 cpt_x100, so BOTH flag
    branches execute and are hash-gated). The ratio
    is emitted in EXACT integer centi-chars-per-token (cpt_x100 =
    100*n_chars DIV n_tokens) so the flag comparison and the hash gate
    are integer end to end; per-source aggregation is the
    nd_mix_temperature shape and is left to it.

    Scale shape: pure per-row codegen over (length, token count) — zero
    shuffle beyond the presentation sort."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    n_tok = F.greatest(F.size(words("text")), F.lit(1)).cast("long")
    n_chars = F.length("text").cast("long")
    cpt = (n_chars * 100 / n_tok).cast("long")
    return (docs.select(
        "doc_id", n_chars.alias("n_chars"), n_tok.alias("n_tokens"),
        cpt.alias("cpt_x100"),
        (cpt > GIBBERISH_CPT_X100).alias("gibberish"))
        .orderBy("doc_id"))


_COMPRESSION_ORACLE = f"""
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
       CAST(greatest(len(string_split(lower(text), ' ')), 1) AS BIGINT)
       AS n_tokens,
       CAST(length(text) * 100
            // greatest(len(string_split(lower(text), ' ')), 1)
            AS BIGINT) AS cpt_x100,
       (length(text) * 100
        // greatest(len(string_split(lower(text), ' ')), 1))
       > {GIBBERISH_CPT_X100} AS gibberish
FROM documents ORDER BY doc_id
"""


QUALITY_GATE_PCT = 0.4


def nd_quality_percentile_gate(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """CORPUS-RELATIVE quality gating: instead of the Gopher family's
    absolute thresholds, keep each document iff its quality score clears
    its own LANGUAGE's 40th-percentile score — the perplexity-percentile
    filter shape (score distributions differ per language, so absolute
    cutoffs over- or under-prune the tails). The score is an integer
    proxy (alphabetic-token density per mille, floor division, plus
    stopword evidence), and the threshold is the DISCRETE percentile —
    the actual score at ascending rank floor(p·(n−1))+1, the
    quantile_disc lower convention — so the whole gate is integer
    arithmetic end to end. An interpolated percentile_cont threshold
    would hang the kept flag on the two engines' interpolation formulas
    agreeing to the last ulp (a+f·(b−a) vs (1−f)·a+f·b differ in IEEE),
    which the identical-op-chain rule cannot guarantee across engines.

    Scale shape: per-row codegen score → per-lang rank window over a
    BOUNDED group count to pick the threshold row (the exact form for
    bounded-cardinality audits; percentile_approx is the 100 TB default
    when groups are unbounded) → the ~#langs-row threshold table
    broadcasts back into a second per-row pass. The corpus is read twice
    (threshold build + gate pass — the nd_vocab_coverage two-pass audit
    shape; production amortizes the build across shards); only
    (lang, score) pairs ever shuffle, text never does."""
    docs = spread_compute(spark, table(spark, sf_dir, "documents")
                          .select("doc_id", "lang", "text"), "doc_id")
    w = words("text")
    n_words = F.greatest(F.size(w), F.lit(1))
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_alpha = F.size(F.filter(w, lambda x: x.rlike("^[a-z]+$")))
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x)))
    # floor(a/b) on positive ints this small == exact integer division
    # (a, b < 2^30: the double quotient can't round across an integer);
    # DuckDB's // is integer division, same values
    scored = docs.select(
        "doc_id", "lang",
        (F.floor(n_alpha.cast("long") * 1000 / n_words)
         + n_stop).cast("long").alias("score"))
    from pyspark.sql.window import Window
    rank_w = Window.partitionBy("lang").orderBy("score", "doc_id")
    cnt_w = Window.partitionBy("lang")
    cut = (F.floor(F.lit(QUALITY_GATE_PCT)
                   * (F.count("*").over(cnt_w) - 1)).cast("long") + 1)
    thresholds = (scored
                  .withColumn("rn", F.row_number().over(rank_w))
                  .withColumn("cut", cut)
                  .where(F.col("rn") == F.col("cut"))
                  .select("lang", F.col("score").alias("thr")))
    return (scored.join(F.broadcast(thresholds), "lang")
            .select("doc_id", "lang", "score",
                    (F.col("score") >= F.col("thr")).alias("kept"))
            .orderBy("doc_id"))


_QUALITY_GATE_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang,
         CAST((len(list_filter(string_split(lower(text), ' '),
                   x -> regexp_matches(x, '^[a-z]+$'))) * 1000)
              // greatest(len(string_split(lower(text), ' ')), 1)
              + len(list_filter(string_split(lower(text), ' '),
                    x -> list_contains([{_STOP_LIST}], x)))
              AS BIGINT) AS score
  FROM documents),
ranked AS (
  SELECT lang, score,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY score, doc_id) AS rn,
         CAST(floor({QUALITY_GATE_PCT} * (COUNT(*) OVER (PARTITION BY lang)
              - 1)) AS BIGINT) + 1 AS cut
  FROM scored),
thr AS (SELECT lang, score AS thr FROM ranked WHERE rn = cut)
SELECT s.doc_id, s.lang, s.score, s.score >= t.thr AS kept
FROM scored s JOIN thr t ON s.lang = t.lang
ORDER BY s.doc_id
"""


# Count-min sketch geometry. Depth/width are fixture-sized (DJL bound:
# overcount <= e*N/w with prob 1-(1/e)^d); the production knob is width.
# The affine family reuses the minhash convention (seeded constants over
# the 60-bit md5 prefix mod MH_PRIME) so both engines compute identical
# positions — and because every CMS counter is an exact integer SUM, the
# whole sketch is deterministic and value-hash-gatable, unlike the HLL
# surface (nd_approx_distinct) which is engine-specific and
# tolerance-tested instead.
CMS_D = 4
CMS_W = 1024
CMS_PRIME = 2147483647  # dedup.MH_PRIME; reimported here to keep text.py
#                         self-contained for worker-side closures
CMS_AB = tuple(
    ((48271 * (s + 1) ** 2 + 16807) % CMS_PRIME or 1,
     (69621 * (s + 1) + 907633385) % CMS_PRIME)
    for s in range(CMS_D)
)
_CMS_AB_VALUES = ", ".join(f"({s}, {a}::BIGINT, {b}::BIGINT)"
                           for s, (a, b) in enumerate(CMS_AB))
CMS_TOP_K = 20


def nd_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter tokens via a count-min sketch, with the exact counts
    alongside as the sketch-error audit — the streaming/mergeable
    frequency summary (CMS rows are sums, so partition sketches merge by
    addition; the same property that makes HLL registers and bloom
    bitmaps the other two members of this sketch plane). Integer-exact
    end to end: positions are affine maps over the 60-bit md5 prefix,
    counters are exact SUMs, estimates are MINs over CMS_D counters —
    so unlike textbook float sketches the whole operator value-hashes
    against the DuckDB oracle, and the audit certifies the CMS
    guarantee in-row (overcount >= 0 always; never undercounts).

    Scale shape: the sketch build is ONE map-side-combined aggregate
    whose output is <= CMS_D*CMS_W rows no matter the corpus (the
    explode-by-depth multiplies rows only inside the scan stage, same
    pattern as nd_dataset_card's grain mirror); the probe side joins
    distinct tokens to the CONSTANT-size sketch via broadcast. The
    exact-count audit is the one corpus-sized token aggregate — the
    thing the sketch exists to avoid — kept deliberately as the audit
    at test scale; the production form reports est_count only and
    drops that aggregate. Top-K cut is (est_count DESC, token)
    lexicographic — total order, no ties possible."""
    docs = table(spark, sf_dir, "documents").select("text")
    toks = docs.select(F.explode(words("text")).alias("tok"))
    return cms_frame(toks).limit(CMS_TOP_K)


def cms_x(tok: Column) -> Column:
    """The shared token → x fold: 60-bit md5 prefix mod CMS_PRIME.
    Module-level (not nested in cms_frame) because the STREAMING sketch
    (streaming/events.py nd_stream_heavy_hitters) must compute the
    bit-identical x on its build side — a drifted hash would make the
    offline probe read the wrong cells."""
    return (F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")
            % CMS_PRIME)


def cms_positions() -> Column:
    """Explode a row bearing column `x` into its CMS_D (seed, p) sketch
    cells, aliased `sp` — the other shared fold between the batch core
    and the streaming build/probe sides."""
    return F.explode(F.array(*[
        F.struct(
            F.lit(s).alias("seed"),
            (((F.lit(a) * F.col("x") + F.lit(b)) % CMS_PRIME)
             % CMS_W).alias("p"))
        for s, (a, b) in enumerate(CMS_AB)])).alias("sp")


def cms_frame(toks: DataFrame) -> DataFrame:
    """The CMS core over an ARBITRARY single-column (tok) frame — all
    distinct tokens with true/estimated counts, ordered (est DESC, tok);
    also the property-test surface (tests/test_property.py pins
    positions, counters, and min-estimates against a pure-Python
    model)."""
    t = toks.select("tok", cms_x(F.col("tok")).alias("x"))

    counters = (t.select(cms_positions()).select("sp.seed", "sp.p")
                .groupBy("seed", "p").agg(F.count("*").alias("c")))
    dt = (t.groupBy("tok")
          .agg(F.count("*").alias("true_count"), F.max("x").alias("x")))
    est = (dt.select("tok", "true_count", cms_positions())
           .select("tok", "true_count", "sp.seed", "sp.p")
           .join(F.broadcast(counters), ["seed", "p"])
           .groupBy("tok", "true_count")
           .agg(F.min("c").alias("est_count")))
    return (est.select("tok",
                       F.col("true_count").cast("long").alias("true_count"),
                       F.col("est_count").cast("long").alias("est_count"),
                       (F.col("est_count") - F.col("true_count"))
                       .cast("long").alias("overcount"))
            .orderBy(F.desc("est_count"), "tok"))


_CMS_ORACLE = f"""
WITH t AS (SELECT unnest(string_split(lower(text), ' ')) AS tok
           FROM documents),
tx AS (SELECT tok,
              CAST('0x' || substring(md5(tok), 1, 15) AS BIGINT)
              % {CMS_PRIME} AS x FROM t),
counters AS (SELECT seed, ((a * x + b) % {CMS_PRIME}) % {CMS_W} AS p,
                    COUNT(*) AS c
             FROM tx CROSS JOIN (VALUES {_CMS_AB_VALUES}) s(seed, a, b)
             GROUP BY seed, p),
dt AS (SELECT tok, COUNT(*) AS true_count, MAX(x) AS x
       FROM tx GROUP BY tok),
est AS (SELECT tok, true_count, MIN(c) AS est_count
        FROM dt CROSS JOIN (VALUES {_CMS_AB_VALUES}) s(seed, a, b)
        JOIN counters ON counters.seed = s.seed
                     AND counters.p = ((a * x + b) % {CMS_PRIME}) % {CMS_W}
        GROUP BY tok, true_count)
SELECT tok, CAST(true_count AS BIGINT) AS true_count,
       CAST(est_count AS BIGINT) AS est_count,
       CAST(est_count - true_count AS BIGINT) AS overcount
FROM est ORDER BY est_count DESC, tok LIMIT {CMS_TOP_K}
"""


QUERIES = {
    "nd_heavy_hitters_cms": (nd_heavy_hitters_cms, _CMS_ORACLE),
    "nd_compression_ratio": (nd_compression_ratio, _COMPRESSION_ORACLE),
    "nd_quality_percentile_gate": (nd_quality_percentile_gate,
                                   _QUALITY_GATE_ORACLE),
    "nd_vocab_coverage": (nd_vocab_coverage, _VOCAB_ORACLE),
    "q11_tokenize_count": (
        q11_tokenize_count,
        "SELECT doc_id, word, COUNT(*) AS n FROM (SELECT doc_id, "
        "unnest(string_split(lower(text), ' ')) AS word FROM documents) t "
        "GROUP BY doc_id, word ORDER BY doc_id, word",
    ),
    "nd_langid": (nd_langid, _LANGID_ORACLE),
    "nd_word_rarity": (nd_word_rarity, _WORD_RARITY_ORACLE),
    "nd_bigram_surprisal": (nd_bigram_surprisal, _BIGRAM_SURPRISAL_ORACLE),
    "nd_pmi_collocations": (nd_pmi_collocations, _PMI_ORACLE),
    "nd_skipgram_pairs": (nd_skipgram_pairs, _SKIPGRAM_ORACLE),
    "nd_zipf_octaves": (nd_zipf_octaves, _ZIPF_ORACLE),
    "nd_quality": (
        nd_quality,
        "SELECT doc_id, "
        "CAST(len(string_split(lower(text), ' ')) AS INTEGER) AS n_tokens, "
        "CAST(len(list_distinct(string_split(lower(text), ' '))) AS DOUBLE) "
        "/ len(string_split(lower(text), ' ')) AS ttr, "
        f"CAST(len(list_filter(string_split(lower(text), ' '), "
        f"x -> list_contains([{_STOP_LIST}], x))) AS DOUBLE) "
        "/ len(string_split(lower(text), ' ')) AS stop_ratio, "
        "CAST(length(replace(text, ' ', '')) AS DOUBLE) "
        "/ len(string_split(lower(text), ' ')) AS mean_wlen "
        "FROM documents ORDER BY doc_id",
    ),
    "nd_bpe_count": (nd_bpe_count, _bpe_oracle_sql()),
    "nd_token_count": (
        nd_token_count,
        "SELECT doc_id, "
        "CAST(len(string_split(lower(text), ' ')) AS INTEGER) AS n_words, "
        "CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) "
        "AS INTEGER) AS n_bpe_tokens FROM documents ORDER BY doc_id",
    ),
    "nd_chunking": (
        nd_chunking,
        # duckdb: k-th chunk = words[k*S+1 .. k*S+W] (list_slice clamps),
        # starts generated while k*S < n_words.
        "WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w "
        "FROM documents WHERE doc_id < 200) "
        "SELECT doc_id, CAST(k AS INTEGER) AS chunk_idx, "
        f"CAST(len(list_slice(w, k * {CHUNK_STRIDE} + 1, "
        f"k * {CHUNK_STRIDE} + {CHUNK_WORDS})) AS INTEGER) AS chunk_words, "
        f"md5(array_to_string(list_slice(w, k * {CHUNK_STRIDE} + 1, "
        f"k * {CHUNK_STRIDE} + {CHUNK_WORDS}), ' ')) AS chunk_hash "
        "FROM d CROSS JOIN LATERAL (SELECT unnest(range(0, "
        f"CAST(ceil(len(w) / {CHUNK_STRIDE}.0) AS BIGINT))) AS k) ks "
        "ORDER BY doc_id, chunk_idx",
    ),
    "nd_tfidf": (
        nd_tfidf,
        "WITH w AS (SELECT doc_id, "
        "unnest(string_split(lower(text), ' ')) AS word "
        "FROM documents WHERE doc_id < 50), "
        "tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w "
        "GROUP BY doc_id, word), "
        "dfreq AS (SELECT word, COUNT(DISTINCT doc_id) AS doc_freq "
        "FROM w GROUP BY word) "
        "SELECT doc_id, word, tf, "
        "ROUND(tf * ln(50.0 / doc_freq), 4) AS tfidf "
        "FROM tf JOIN dfreq USING (word) ORDER BY doc_id, word",
    ),
    "nd_levenshtein": (
        nd_levenshtein,
        "SELECT a.doc_id AS a_id, b.doc_id AS b_id, "
        "CAST(levenshtein(substring(a.text, 1, 40), substring(b.text, 1, 40)) "
        "AS INTEGER) AS dist "
        "FROM documents a JOIN documents b ON a.doc_id < b.doc_id "
        "WHERE a.doc_id < 30 AND b.doc_id < 30 "
        "AND levenshtein(substring(a.text, 1, 40), substring(b.text, 1, 40)) <= 25 "
        "ORDER BY a_id, b_id",
    ),
    "nd_fingerprint": (
        nd_fingerprint,
        "SELECT doc_id, md5(array_to_string(list_sort(list_distinct("
        "string_split(lower(text), ' '))), ' ')) AS fp "
        "FROM documents ORDER BY doc_id",
    ),
    "nd_bm25": (
        nd_bm25,
        # Identical raw-idf BM25 arithmetic (+ * / only — see nd_bm25
        # docstring): bit-identical scores, so the exact hash gate holds.
        "WITH base AS (SELECT doc_id, "
        "len(string_split(lower(text), ' ')) AS dl, "
        + ", ".join(
            f"len(list_filter(string_split(lower(text), ' '), "
            f"x -> x = '{t}')) AS tf{i}"
            for i, t in enumerate(BM25_TERMS))
        + " FROM documents), "
        "stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, "
        "CAST(SUM(dl) AS DOUBLE) AS sum_dl, "
        + ", ".join(
            f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) "
            f"AS df{i}" for i in range(len(BM25_TERMS)))
        + " FROM base) "
        "SELECT doc_id, "
        + ", ".join(f"CAST(tf{i} AS INTEGER) AS tf_{t}"
                    for i, t in enumerate(BM25_TERMS))
        + ", "
        + " + ".join(
            f"(((n_docs - CAST(df{i} AS DOUBLE) + 0.5) / "
            f"(CAST(df{i} AS DOUBLE) + 0.5)) * "
            f"((CAST(tf{i} AS DOUBLE) * {BM25_K1 + 1!r}) / "
            f"(CAST(tf{i} AS DOUBLE) + {BM25_K1!r} * ({1 - BM25_B!r} + "
            f"{BM25_B!r} * (CAST(dl AS DOUBLE) / (sum_dl / n_docs))))))"
            for i in range(len(BM25_TERMS)))
        + " AS score FROM base, stats "
        f"ORDER BY score DESC, doc_id LIMIT {BM25_TOPK}",
    ),
    "nd_ngram_topk": (
        nd_ngram_topk,
        "WITH d AS (SELECT string_split(lower(text), ' ') AS ws "
        "FROM documents), "
        "bg AS (SELECT unnest(list_transform(range(1, len(ws)), "
        "i -> ws[i] || ' ' || ws[i + 1])) AS bigram FROM d) "
        "SELECT bigram, COUNT(*) AS c FROM bg GROUP BY bigram "
        f"ORDER BY c DESC, bigram LIMIT {NGRAM_TOPK}",
    ),
}
