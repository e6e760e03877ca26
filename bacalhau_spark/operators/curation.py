"""Training-corpus curation operators over the documents table.

The reference's text plane is grep/sed/awk over mounted files
(`pkg/test/scenario/test_scenarios.go:77-161`); a training-data pipeline at
100 TB needs the curation stages that sit between raw text and the
tokenizer: PII scrubbing, heuristic quality gates (C4/Gopher-style),
repetition screens, benchmark decontamination, domain mixing, and sequence
packing. Each is a narrow per-row or bounded-join shape:

- per-row regex/array expressions stay inside whole-stage codegen (no
  Python UDFs anywhere in this module);
- the only shuffles are doc_id-keyed aggregations (fixed-width keys) and a
  broadcast semi join against the (small) benchmark shingle set;
- sequence packing is windowed PER SHARD — the global-concatenation order a
  single ORDER BY would need does not exist at corpus scale, so the shard
  is the unit of deterministic packing (matches how pretraining shards are
  actually built: pack within a shard, shuffle shards).

Every operator is integer-exact or exact-division only (no ROUND on
doubles), so the DuckDB oracle hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bacalhau_spark.catalog import table
from bacalhau_spark.functions import shingles, words

# --- nd_pii_redact -----------------------------------------------------------
# Regex vocabulary is the RE2-compatible subset of Java regex (char classes,
# bounded repeats, \b word boundaries — no lookaround, no backreferences), so
# Spark and DuckDB compile identical automata.
_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PHONE_RE = r"\b\d{3}-\d{4}\b"


def pii_redact_frame(docs: DataFrame, text_col=None) -> DataFrame:
    """Core PII scrub over any frame with (doc_id, <text>): per-pattern
    counts + ordered global redaction (emails before IPs before phones, so
    digit-bearing replacements can't shadow each other). Pure per-row
    codegen — composes unchanged over readStream sources."""
    aug = text_col if text_col is not None else F.col("text")
    n_email = F.size(F.regexp_extract_all(aug, F.lit(_EMAIL_RE), 0))
    n_ip = F.size(F.regexp_extract_all(aug, F.lit(_IP_RE), 0))
    n_phone = F.size(F.regexp_extract_all(aug, F.lit(_PHONE_RE), 0))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, _EMAIL_RE, "<EMAIL>"),
            _IP_RE, "<IP>"),
        _PHONE_RE, "<PHONE>")
    return docs.select(
        "doc_id",
        n_email.cast("int").alias("n_email"),
        n_ip.cast("int").alias("n_ip"),
        n_phone.cast("int").alias("n_phone"),
        redacted.alias("redacted"),
    )


def nd_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: count and redact emails / IPv4 addresses / phone
    numbers. The fixture text is synthetic prose without PII, so the query
    first derives a deterministic PII-bearing variant from (text, doc_id) —
    identically in Spark and the oracle — then redacts it; the redaction
    machinery (pii_redact_frame) is what's under test. At 100 TB this is
    a mapper with zero shuffle."""
    from bacalhau_spark.catalog import spread_compute
    # Four Java-regex passes per row is exactly the CPU-dwarfs-row-bytes
    # profile spread_compute exists for (no-op at corpus scale when the
    # scan already has >= cores splits).
    docs = spread_compute(
        spark, table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id")
    aug = F.concat(
        F.col("text"), F.lit(" contact user"),
        F.col("doc_id").cast("string"), F.lit("@example.com or 10."),
        (F.col("doc_id") % 200).cast("string"), F.lit(".0."),
        (F.col("doc_id") % 250).cast("string"), F.lit(" call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return pii_redact_frame(docs, aug).orderBy("doc_id")


# --- nd_gopher_filter --------------------------------------------------------
_STOP_MARKERS = ("the", "a", "of", "and", "to", "in", "is")


def _gopher_flag_exprs():
    """The four gate predicates (plus the word count) as Column
    expressions over a `text` column. All comparisons are integer
    cross-multiplications, so no float boundary can disagree between
    engines; pure per-row codegen."""
    w = words("text")
    n_words = F.size(w)
    len_ns = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    stop_arr = F.array(*[F.lit(s) for s in _STOP_MARKERS])
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x)))
    n_alpha = F.size(F.filter(w, lambda x: x.rlike("^[a-z]+$")))
    f_words = (n_words >= 15) & (n_words <= 90)
    f_wlen = (len_ns * 10 >= n_words * 25) & (len_ns * 10 <= n_words * 65)
    f_stop = n_stop >= 2
    f_alpha = n_alpha * 10 >= n_words * 8
    return n_words, f_words, f_wlen, f_stop, f_alpha


def gopher_keep(docs: DataFrame) -> DataFrame:
    """Rows passing all four Gopher gates, original columns preserved —
    the filtering (rather than auditing) form, used as a pipeline stage."""
    _, f_words, f_wlen, f_stop, f_alpha = _gopher_flag_exprs()
    return docs.where(f_words & f_wlen & f_stop & f_alpha)


def gopher_flags_frame(docs: DataFrame) -> DataFrame:
    """Core Gopher-style gates over any frame with (doc_id, text) — pure
    per-row codegen, composes unchanged over readStream sources."""
    n_words, f_words, f_wlen, f_stop, f_alpha = _gopher_flag_exprs()
    return (
        docs.select(
            "doc_id",
            n_words.cast("int").alias("n_words"),
            f_words.cast("int").alias("f_words"),
            f_wlen.cast("int").alias("f_wlen"),
            f_stop.cast("int").alias("f_stop"),
            f_alpha.cast("int").alias("f_alpha"),
            (f_words & f_wlen & f_stop & f_alpha).cast("int").alias("kept"),
        )
    )


def nd_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style heuristic quality gates (word-count bounds, mean word
    length bounds, stopword presence, alphabetic fraction), each emitted as
    a flag plus the conjunctive keep decision. All comparisons are integer
    cross-multiplications (mean length 2.5..6.5 becomes
    25*n <= 10*len <= 65*n), so no float boundary can disagree between
    engines. Per-row codegen over the token array; zero shuffle."""
    return gopher_flags_frame(
        table(spark, sf_dir, "documents")).orderBy("doc_id")


# --- nd_repetition -----------------------------------------------------------
def nd_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition screen: duplicate-word fraction (via distinct count) and
    the count of the most frequent bigram per document — the Gopher
    "repeated n-gram" signals. Word/type counts come from array expressions
    on the unexploded row (one pass, no shuffle); only the top-bigram count
    explodes, and its groupBy key (doc_id, bigram) is high-cardinality and
    well-spread with map-side combine. The doc_id-keyed rejoin is between
    two already-aggregated (small) sides. All outputs integer-exact."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    w = words("text")
    stats = docs.select(
        "doc_id",
        F.size(w).cast("int").alias("n_words"),
        F.size(F.array_distinct(w)).cast("int").alias("n_distinct"),
    )
    # Project the token array BEFORE shingling: shingles() slices it once
    # per window inside a transform(), and an inlined words() expression
    # would be re-split per window index (the HOF re-evaluation trap —
    # same hazard as dedup._rolling_shingle_keys; measured 8x on this op).
    wtab = docs.select("doc_id", w.alias("w"))
    top = (
        wtab.select("doc_id",
                    F.explode(shingles(F.col("w"), 2)).alias("bigram"))
        .groupBy("doc_id", "bigram").agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").cast("int").alias("n_bigrams"),
             F.max("c").cast("int").alias("top_bigram_cnt"))
    )
    return (
        stats.join(top, "doc_id")
        .select("doc_id", "n_words", "n_distinct", "n_bigrams",
                "top_bigram_cnt")
        .orderBy("doc_id")
    )


# --- nd_seq_pack -------------------------------------------------------------
SEQ_LEN = 512
PACK_SHARDS = 8


def seq_pack_bins(docs_tok: DataFrame, shards: int = PACK_SHARDS,
                  seq_len: int = SEQ_LEN) -> DataFrame:
    """Core packing rule over any (doc_id, n_tok) frame: per shard
    (doc_id % shards, ordered by doc_id), a document belongs to the bin
    where its first token lands in the shard's concatenated token
    stream."""
    shard = (F.col("doc_id") % shards).cast("int")
    from pyspark.sql.window import Window
    win = (Window.partitionBy("shard").orderBy("doc_id")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    with_bin = (
        docs_tok.select("doc_id", shard.alias("shard"), "n_tok")
        .withColumn("cum", F.sum("n_tok").over(win))
        .withColumn("bin_id",
                    F.floor((F.col("cum") - F.col("n_tok")) / seq_len)
                    .cast("int"))
    )
    return (
        with_bin.groupBy("shard", "bin_id")
        .agg(F.count("*").cast("int").alias("n_docs"),
             F.sum("n_tok").cast("int").alias("total_tokens"))
    )


def nd_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining: documents are concatenated in
    deterministic order and cut into SEQ_LEN-token training sequences; a
    document belongs to the bin where its first token lands. Packing is
    windowed PER SHARD (doc_id % PACK_SHARDS): each shard's running token
    sum is an independent window, so the shuffle is by shard and no global
    total order is ever materialized — the shape that survives when the
    corpus is 10^9 documents (shards ≈ output files). Token counts use the
    whitespace word count; swap in nd_bpe_count's counter for real runs."""
    docs = table(spark, sf_dir, "documents")
    return seq_pack_bins(
        docs.select("doc_id", F.size(words("text")).alias("n_tok"))
    ).orderBy("shard", "bin_id")


# --- nd_ngram_overlap --------------------------------------------------------
NGRAM_N = 5


def ngram_shingle_keys(df: DataFrame, n: int = NGRAM_N) -> DataFrame:
    """(doc_id, sh) hashed n-gram shingle keys over a (doc_id, text)
    frame: 60-bit md5-derived ints (8-byte equi-join keys; text never
    shuffles). The one decontamination fold — nd_ngram_overlap and the
    curation funnel's decontam stage both consume it, so the Spark and
    oracle folds cannot drift per consumer. Words array projected before
    shingling (the HOF re-evaluation rule)."""
    key = F.conv(F.substring(F.md5(F.col("sh_str")), 1, 15), 16, 10) \
        .cast("long").alias("sh")
    return (df.select("doc_id", words("text").alias("w"))
            .select("doc_id",
                    F.explode(shingles(F.col("w"), n)).alias("sh_str"))
            .select("doc_id", key))


def gopher_gated_sql(cte_name: str = "gated") -> str:
    """The Gopher keep-conjunction as an oracle CTE over `documents` —
    the SQL twin of gopher_keep(), shared so composed pipelines state
    the gates once."""
    return f"""{cte_name} AS (SELECT doc_id, text FROM (
  SELECT doc_id, text,
    len(string_split(lower(text), ' ')) AS n_words,
    length(replace(text, ' ', '')) AS len_ns,
    len(list_filter(string_split(lower(text), ' '),
        x -> list_contains([{_STOP_LIST}], x))) AS n_stop,
    len(list_filter(string_split(lower(text), ' '),
        x -> regexp_matches(x, '^[a-z]+$'))) AS n_alpha
  FROM documents)
  WHERE n_words >= 15 AND n_words <= 90
    AND len_ns * 10 >= n_words * 25 AND len_ns * 10 <= n_words * 65
    AND n_stop >= 2 AND n_alpha * 10 >= n_words * 8)"""


def nd_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination at n-gram granularity: a corpus document is
    contaminated if it shares ANY 5-gram with the benchmark set (docs with
    doc_id % 10 == 0 stand in for the eval suite). Complements
    nd_cross_dedup (whole-document fingerprints): n-gram overlap catches
    partial inclusions. Shingles are hashed to 60-bit ints (8-byte
    equi-join keys, text never shuffles); the benchmark shingle set is
    small by construction -> broadcast left-semi join, corpus side never
    shuffles. Output is the per-source contamination tally a mixing stage
    consumes."""
    docs = table(spark, sf_dir, "documents")
    bench_sh = (
        ngram_shingle_keys(docs.filter(F.col("doc_id") % 10 == 0))
        .select("sh").distinct()
    )
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    # No distinct on the corpus shingle stream BEFORE the semi join: the
    # broadcast probe filters each shingle in place (no shuffle), so
    # deduplicating first would shuffle the corpus's entire shingle set
    # only to discard most of it. Distinct runs on the (selective) hit
    # doc_ids after the probe.
    contaminated = (
        ngram_shingle_keys(corpus)
        .join(F.broadcast(bench_sh), "sh", "left_semi")
        .select("doc_id").distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        corpus.select("doc_id", "source")
        .join(contaminated, "doc_id", "left")
        .groupBy("source")
        .agg(F.count("*").cast("int").alias("n_docs"),
             F.coalesce(F.sum("hit"), F.lit(0)).cast("int")
             .alias("n_contaminated"))
        .orderBy("source")
    )


# --- nd_domain_mix -----------------------------------------------------------
MIX_DENOM = 210  # sum of 1..20 — source srcK gets share (K+1)/210
MIX_BUDGET_FRAC = 2  # sample down to total/2


def nd_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing: resample each source toward a target mix (source srcK
    gets share (K+1)/210 of a budget of half the corpus). The per-source
    rate is computed from two broadcast scalars (total count, per-source
    count); membership is a deterministic md5 coin per doc_id, so the
    sample is reproducible across engines and runs (the same property
    nd_hash_sample relies on). Corpus side: one scan + one groupBy(source);
    nothing but 8-byte keys and counters shuffles."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    idx = F.regexp_extract("source", r"src(\d+)", 1).cast("int")
    per_src = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    # The corpus total is the sum over the (tiny) per-source aggregate — an
    # unpartitioned window over ~#sources rows, NOT a second corpus scan or
    # a driver-side count() job.
    from pyspark.sql.window import Window
    total = F.sum("n_docs").over(Window.partitionBy())
    per_src = per_src.withColumn("total", total)
    # rate = min(1, budget_share / n_src); exact double division identical
    # in both engines (int/int then /)
    budget_share = (F.col("total") * (idx + 1) /
                    F.lit(MIX_DENOM * MIX_BUDGET_FRAC))
    rate = F.least(F.lit(1.0), budget_share / F.col("n_docs"))
    coin = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                   16, 10).cast("long") % 1000000) / F.lit(1000000.0)
    sampled = (
        docs.withColumn("coin", coin)
        .join(F.broadcast(per_src.withColumn("rate", rate)
                          .select("source", "rate")), "source")
        .filter(F.col("coin") < F.col("rate"))
        .groupBy("source").agg(F.count("*").alias("n_sampled"))
    )
    return (
        per_src.join(sampled, "source", "left")
        .select("source",
                F.col("n_docs").cast("int").alias("n_docs"),
                F.coalesce(F.col("n_sampled"), F.lit(0)).cast("int")
                .alias("n_sampled"))
        .orderBy("source")
    )


# --- nd_bpe_pair_count -------------------------------------------------------
PAIR_TOP_K = 20


def nd_bpe_pair_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One merge step of BPE tokenizer TRAINING: the corpus-wide adjacent
    character-pair frequencies whose argmax becomes the next merge rule
    (complement of nd_bpe_count, which APPLIES a trained merge table).

    The classic scale trick: aggregate the corpus to its word-frequency
    vocabulary first — pairs are then counted over DISTINCT words weighted
    by their corpus counts, so the expensive pair explosion runs over the
    (tiny) vocab, not the corpus. The corpus-side shuffle is word-keyed
    with map-side combine; at 100 TB the vocab table is the persisted
    artifact each merge iteration re-reads. Top-K with a total tie-break
    (count desc, pair asc) keeps the output deterministic."""
    docs = table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(words("text")).alias("word"))
        .groupBy("word").agg(F.count("*").alias("cnt"))
    )
    pair_arr = F.when(
        F.length("word") >= 2,
        F.transform(F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.col("word").substr(i, F.lit(2))),
    ).otherwise(F.array().cast("array<string>"))
    return (
        vocab.select("cnt", F.explode(pair_arr).alias("pair"))
        .groupBy("pair").agg(F.sum("cnt").cast("int").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair"))
        .limit(PAIR_TOP_K)
    )


BPE_MERGES = 5
_BPE_SEP = "\x1f"  # unit separator: cannot occur inside words (space-split)


def nd_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative BPE tokenizer training: BPE_MERGES rounds of
    (count adjacent symbol pairs corpus-wide -> argmax -> merge), the
    full training loop whose single step is nd_bpe_pair_count. Output
    is the learned merge table: (step, pair, n) — the model artifact a
    tokenizer ships. Hash-gated against a DuckDB oracle that unrolls
    the identical loop as chained CTEs (the nd_kmeans convention for
    iterative algorithms).

    Cross-engine determinism rests on two invariants: (a) the argmax
    tie-break is total (count DESC, pair ASC — binary string order on
    both engines, and symbols never contain the chr(31) separator or a
    space), and (b) the merge REWRITE preserves symbol boundaries and
    greedy left-to-right semantics EXACTLY. A plain string
    replace(s, 'a<US>b', 'ab') does neither — it matches where b is a
    prefix (or a a suffix) of a longer symbol ('b<US>aa' contains
    'b<US>a'), and boundary-guarded variants consume the shared
    separator between adjacent matches — so the Spark side folds each
    symbol ARRAY with F.aggregate (merge iff last(acc)=a AND cur=b;
    after a merge last(acc)=a||b which can never equal a, so the fold
    is provably the classic greedy scan), and the oracle selects merge
    positions by run-parity windows (see _bpe_merges_oracle). The
    hypothesis pin (tests/test_property.py) holds both to the
    pure-Python model, overlap chains included.

    Scale shape: the corpus is aggregated ONCE to its word-frequency
    vocabulary (the classic BPE trick — pair explosion runs over
    distinct words weighted by counts, not over the token stream); each
    iteration is a map-side-combined pair count over the vocab-sized
    frame plus a 1-row argmax collect (bounded model-state fold, the
    kmeans/bloom convention), and the rewritten vocab is re-persisted
    per round (MEMORY_AND_DISK — replayable on executor loss, the
    round-8 kmeans hardening rule) so plans stay flat instead of
    nesting M rewrites. At 100 TB the vocab table is the persisted
    artifact; the corpus is scanned exactly once."""
    return bpe_merge_rules(spark,
                           table(spark, sf_dir, "documents")
                           .select("text"))


def bpe_merge_rules(spark: SparkSession, docs: DataFrame,
                    merges: int = BPE_MERGES,
                    batch: int = 1) -> DataFrame:
    """The BPE training loop over an ARBITRARY (text) frame — also the
    property-test surface (tests/test_property.py pins the full loop —
    pair counting, sep-string argmax tie-break, left-to-right merge
    rewrite — against a pure-Python model). Stops early if the corpus
    runs out of adjacent pairs before `merges` rounds.

    `batch` is the driver-round-trip bound (round-10 verdict: synchronous
    BPE is one Spark job PER MERGE — fine at demo scale, 30k jobs for a
    real tokenizer). batch=1 (default, what the registered rows grade)
    is exact classic BPE. batch=K>1 is standard frequency batching: each
    round collects the top pair-count rows once and greedily selects up
    to K pairs that are pairwise SYMBOL-DISJOINT (no symbol of one pair
    appears in another), then applies them all in ONE vocabulary
    rewrite. Disjointness is what makes the batch well-defined: merging
    (a,b) only changes counts of pairs touching a or b, so the selected
    pairs' counts — and the rewrite itself — are order-independent
    within the round. It is an APPROXIMATION of sequential BPE (the
    sequential 2nd argmax may overlap the 1st and outrank our disjoint
    pick); that trade is the standard one real trainers make, and the
    driver pays ~merges/K rounds instead of merges."""
    rules, vocab, hold = _bpe_train(spark, docs, merges, batch=batch)
    # The rule table is already collected; the final round's vocab
    # REWRITE is never materialized here (it only matters to encode
    # consumers — nd_bpe_encode) — dropping both cache markers unrun
    # saves the last fold+count job the old per-round materialization
    # always paid.
    vocab.unpersist()
    if hold is not None:
        hold.unpersist()
    return spark.createDataFrame(
        rules, "step int, pair string, n long").orderBy("step")


def _bpe_train(spark: SparkSession, docs: DataFrame, merges: int,
               batch: int = 1):
    """The shared train loop: returns (rules, final PERSISTED vocab,
    hold) — bpe_merge_rules keeps the rule table, nd_bpe_encode keeps
    the rewritten vocab (the encoded corpus). `hold` is the final
    vocab's cached parent (or None): the last rewrite is returned
    UN-materialized — computing it from the live parent cache is the
    consumer's first action — so the caller must unpersist BOTH vocab
    and hold once done (after materializing vocab, if it needs it).

    r14 job-schedule change: the old loop ran a dedicated count() per
    round to materialize the rewrite before unpersisting its parent —
    2 jobs per merge. Each round's argmax action already materializes
    the current vocab (computed from the still-live parent cache), so
    the parent unpersist is simply DEFERRED one round and the count
    job disappears: merges+1 jobs total instead of 2*merges+1, at the
    cost of two vocab-sized caches live at a time (bounded — the vocab
    frame is distinct-words-sized, not corpus-sized)."""
    from pyspark.storagelevel import StorageLevel

    if batch < 1:
        raise ValueError("batch must be >= 1")
    vocab = (
        docs.select(F.explode(words("text")).alias("word"))
        .groupBy("word").agg(F.count("*").alias("cnt"))
        .select(F.split("word", "").alias("syms"), "cnt")
        .persist(StorageLevel.MEMORY_AND_DISK))
    prev: DataFrame | None = None
    rules = []
    while len(rules) < merges:
        k = min(batch, merges - len(rules))
        pair = F.explode(F.zip_with(
            F.slice("syms", 1, F.size("syms") - 1),
            F.slice("syms", 2, F.size("syms") - 1),
            lambda a, b: F.concat(a, F.lit(_BPE_SEP), b))).alias("pair")
        # Over-fetch 4x: the greedy disjoint filter below skips
        # overlapping rows, so the top k disjoint pairs usually sit in
        # the top 4k counted rows (a short batch just means the next
        # round re-counts — correctness never depends on the factor).
        top = (vocab.select("cnt", pair)
               .groupBy("pair").agg(F.sum("cnt").cast("long").alias("n"))
               .orderBy(F.col("n").desc(), "pair")
               .limit(k * 4 if k > 1 else 1).collect())
        # That action materialized `vocab` (fold applied over the
        # parent's live cache); the parent cache is now releasable.
        if prev is not None:
            prev.unpersist()
            prev = None
        if not top:
            break
        chosen: list[tuple[str, str, int]] = []
        used: set[str] = set()
        for r in top:
            a, b = r["pair"].split(_BPE_SEP)
            if a in used or b in used:
                continue
            chosen.append((a, b, int(r["n"])))
            used.update((a, b, a + b))
            if len(chosen) >= k:
                break
        for a, b, n in chosen:
            rules.append((len(rules) + 1, f"{a} {b}", n))
        # Greedy left-to-right merge as an array fold: merge the current
        # symbol into the accumulator tail iff (tail, cur) matches a
        # chosen rule. A just-merged tail is a||b, which can never equal
        # any chosen left symbol (the batch is symbol-disjoint and b is
        # non-empty), so a merge never chains into the next position —
        # exactly the classic scan-and-skip, for every rule in the batch
        # at once. The THEN branches' slices are lazily evaluated (never
        # on an empty acc; try_element_at keeps conditions ANSI-safe).
        def fold_step(acc, x):
            out = F.concat(acc, F.array(x))
            for a, b, _n in reversed(chosen):
                merged = F.concat(F.slice(acc, 1, F.size(acc) - 1),
                                  F.array(F.lit(a + b)))
                out = F.when(
                    (F.try_element_at(acc, F.lit(-1)) == F.lit(a))
                    & (x == F.lit(b)), merged).otherwise(out)
            return out

        fold = F.aggregate(
            "syms", F.expr("CAST(array() AS array<string>)"), fold_step)
        # persist() is lazy — the rewrite is NOT materialized here. The
        # next round's argmax (or the consumer's first action) computes
        # it from `vocab`'s still-live cache; unpersist-first would
        # have replayed the whole fold chain from the raw corpus per
        # round (the round-8 O(merges^2) bug the old per-round count()
        # guarded against — the deferred unpersist above guards it at
        # half the job count).
        nxt = (vocab.withColumn("syms", fold)
               .persist(StorageLevel.MEMORY_AND_DISK))
        prev, vocab = vocab, nxt
    return rules, vocab, prev


def _bpe_merges_oracle() -> str:
    """The identical M-round loop unrolled as chained CTEs; the merge
    rule flows between rounds as scalar subqueries. The greedy merge is
    selected positionally by run-parity: a position is a CANDIDATE when
    (sym, lead(sym)) == (a, b); candidates are only ever consecutive
    when a == b (a candidate at i and i+1 forces s[i+1] = b = a), and
    greedy scan-and-skip merges exactly the even offsets within each
    maximal run of consecutive candidates (islands via the pos - cum_rn
    gaps-and-islands key, partitioned by the cand flag so non-candidate
    rows can't collide). A merged position emits sym || next and the
    consumed follower (lag(hit)) is filtered out of the rebuilt list.
    Early stop matches Spark: an exhausted r{m} is empty, its scalar
    subqueries go NULL, no position qualifies, and its UNION arm
    contributes no row."""
    parts = _bpe_chain_parts()
    union = " UNION ALL ".join(
        f"SELECT step, replace(pair, chr(31), ' ') AS pair, n FROM r{m}"
        for m in range(1, BPE_MERGES + 1))
    return (",".join(parts)
            + f"\nSELECT * FROM ({union}) ORDER BY step")


def _bpe_chain_parts() -> list[str]:
    """The unrolled BPE round CTEs (v0 .. v{BPE_MERGES}) shared by the
    merge-rule oracle (_bpe_merges_oracle) and the encode oracle
    (_bpe_encode_oracle)."""
    parts = ["""
WITH v0 AS (SELECT word, string_split(word, '') AS l, cnt
            FROM (SELECT word, COUNT(*) AS cnt FROM
                  (SELECT unnest(string_split(lower(text), ' ')) AS word
                   FROM documents) t GROUP BY word) w)"""]
    for m in range(1, BPE_MERGES + 1):
        parts.append(f"""
p{m} AS (SELECT l[i] || chr(31) || l[i + 1] AS pair, cnt
         FROM v{m - 1}, unnest(range(1, len(l))) u(i)),
r{m} AS (SELECT {m} AS step, pair, CAST(SUM(cnt) AS BIGINT) AS n
         FROM p{m} GROUP BY pair ORDER BY n DESC, pair LIMIT 1),
c{m} AS (SELECT word, cnt, i AS pos, l[i] AS sym,
                lead(l[i]) OVER w AS nxt,
                COALESCE(l[i] = string_split(
                             (SELECT pair FROM r{m}), chr(31))[1]
                         AND lead(l[i]) OVER w = string_split(
                             (SELECT pair FROM r{m}), chr(31))[2],
                         FALSE) AS cand
         FROM v{m - 1}, unnest(range(1, len(l) + 1)) u(i)
         WINDOW w AS (PARTITION BY word ORDER BY i)),
g{m} AS (SELECT *, COUNT(*) FILTER (WHERE cand)
                   OVER (PARTITION BY word ORDER BY pos) AS rn
         FROM c{m}),
s{m} AS (SELECT *, cand AND (rn - MIN(rn) OVER
                   (PARTITION BY word, cand, pos - rn)) % 2 = 0 AS hit
         FROM g{m}),
k{m} AS (SELECT *, COALESCE(lag(hit) OVER
                   (PARTITION BY word ORDER BY pos), FALSE) AS consumed
         FROM s{m}),
v{m} AS (SELECT word, cnt,
                list(CASE WHEN hit THEN sym || nxt ELSE sym END
                     ORDER BY pos)
                FILTER (WHERE NOT consumed) AS l
         FROM k{m} GROUP BY word, cnt)""")
    return parts


BPE_ENCODE_TOP_K = 50


def nd_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE — the apply half that closes the loop nd_bpe_merges
    opens: run the trained merge table over the corpus and report the
    resulting token distribution (top-BPE_ENCODE_TOP_K tokens by
    (count DESC, token) — a total order, deterministic cut). This is
    the tokenizer-vocabulary report a data pipeline publishes after
    training: which subword units actually dominate the encoded corpus.

    Scale shape: training and encoding share one pass — the greedy
    rewrite each round IS the encoding, applied to the word-frequency
    vocabulary (distinct words weighted by count, the classic BPE
    trick), so the corpus is scanned once and every round's work is
    vocab-sized; the final histogram explodes the rewritten symbol
    lists weighted by word count and reduces map-side. The oracle runs
    the identical unrolled chain and aggregates v{M}."""
    _rules, vocab, hold = _bpe_train(
        spark, table(spark, sf_dir, "documents").select("text"),
        BPE_MERGES)
    out = (vocab.select(F.explode("syms").alias("token"), "cnt")
           .groupBy("token").agg(F.sum("cnt").cast("long").alias("n"))
           .orderBy(F.col("n").desc(), "token")
           .limit(BPE_ENCODE_TOP_K)
           .localCheckpoint(eager=True))
    # The eager checkpoint materialized through the final rewrite (fold
    # over `hold`'s live cache) — both cache markers can go now.
    vocab.unpersist()
    if hold is not None:
        hold.unpersist()
    return out.orderBy(F.col("n").desc(), "token")


def _bpe_encode_oracle() -> str:
    """The merge chain's final vocabulary (v{M}) exploded to the token
    histogram — same CTEs, different terminal aggregate."""
    return (",".join(_bpe_chain_parts()) + f"""
SELECT sym AS token, CAST(SUM(cnt) AS BIGINT) AS n
FROM (SELECT unnest(l) AS sym, cnt FROM v{BPE_MERGES}) t
GROUP BY sym ORDER BY n DESC, token LIMIT {BPE_ENCODE_TOP_K}""")


# --- nd_corpus_stats ---------------------------------------------------------
def nd_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus data-card report: per language — document count, distinct
    sources, token/char totals, and document-length bounds. The one-pass
    summary a dataset card or mixing stage reads before training; all
    integer outputs, one groupBy(lang) shuffle carrying counters only."""
    docs = table(spark, sf_dir, "documents")
    n_words = F.size(words("text"))
    return (
        docs.select("lang", "source", "n_chars", n_words.alias("n_words"))
        .groupBy("lang")
        .agg(F.count("*").cast("int").alias("n_docs"),
             F.countDistinct("source").cast("int").alias("n_sources"),
             F.sum("n_words").cast("int").alias("total_words"),
             F.sum("n_chars").cast("int").alias("total_chars"),
             F.min("n_words").cast("int").alias("min_words"),
             F.max("n_words").cast("int").alias("max_words"))
        .orderBy("lang")
    )


def nd_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-rate report: per language, how many documents survive exact
    text dedup and how many duplicate copies would be dropped — the
    before/after numbers a curation run publishes alongside its output
    (complements nd_dedup_exact, which emits the survivors themselves).
    Shuffles 16-byte fingerprints, never text; two narrow aggregations."""
    docs = table(spark, sf_dir, "documents")
    groups = (docs.select("lang", F.md5("text").alias("fp"))
              .groupBy("lang", "fp").agg(F.count("*").alias("copies")))
    return (
        groups.groupBy("lang")
        .agg(F.count("*").cast("int").alias("n_unique"),
             F.sum("copies").cast("int").alias("n_docs"),
             (F.sum("copies") - F.count("*")).cast("int")
             .alias("n_dropped"))
        .orderBy("lang")
    )


_DEDUP_STATS_ORACLE = """
WITH g AS (SELECT lang, md5(text) AS fp, COUNT(*) AS copies
           FROM documents GROUP BY lang, fp)
SELECT lang, CAST(COUNT(*) AS INTEGER) AS n_unique,
  CAST(SUM(copies) AS INTEGER) AS n_docs,
  CAST(SUM(copies) - COUNT(*) AS INTEGER) AS n_dropped
FROM g GROUP BY lang ORDER BY lang
"""


_CORPUS_STATS_ORACLE = """
SELECT lang, CAST(COUNT(*) AS INTEGER) AS n_docs,
  CAST(COUNT(DISTINCT source) AS INTEGER) AS n_sources,
  CAST(SUM(len(string_split(lower(text), ' '))) AS INTEGER) AS total_words,
  CAST(SUM(n_chars) AS INTEGER) AS total_chars,
  CAST(MIN(len(string_split(lower(text), ' '))) AS INTEGER) AS min_words,
  CAST(MAX(len(string_split(lower(text), ' '))) AS INTEGER) AS max_words
FROM documents GROUP BY lang ORDER BY lang
"""


# --- DuckDB oracles ----------------------------------------------------------
_AUG_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
    "'@example.com or 10.' || CAST(doc_id % 200 AS VARCHAR) || '.0.' || "
    "CAST(doc_id % 250 AS VARCHAR) || ' call 555-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)

_PII_ORACLE = f"""
WITH a AS (SELECT doc_id, {_AUG_SQL} AS aug FROM documents)
SELECT doc_id,
  CAST(len(regexp_extract_all(aug, '{_EMAIL_RE}')) AS INTEGER) AS n_email,
  CAST(len(regexp_extract_all(aug, '{_IP_RE}')) AS INTEGER) AS n_ip,
  CAST(len(regexp_extract_all(aug, '{_PHONE_RE}')) AS INTEGER) AS n_phone,
  regexp_replace(regexp_replace(regexp_replace(aug,
    '{_EMAIL_RE}', '<EMAIL>', 'g'),
    '{_IP_RE}', '<IP>', 'g'),
    '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
FROM a ORDER BY doc_id
"""

_STOP_LIST = ", ".join(f"'{s}'" for s in _STOP_MARKERS)

_GOPHER_ORACLE = f"""
WITH s AS (SELECT doc_id,
  len(string_split(lower(text), ' ')) AS n_words,
  length(replace(text, ' ', '')) AS len_ns,
  len(list_filter(string_split(lower(text), ' '),
      x -> list_contains([{_STOP_LIST}], x))) AS n_stop,
  len(list_filter(string_split(lower(text), ' '),
      x -> regexp_matches(x, '^[a-z]+$'))) AS n_alpha
FROM documents),
f AS (SELECT doc_id, n_words,
  CAST(n_words >= 15 AND n_words <= 90 AS INTEGER) AS f_words,
  CAST(len_ns * 10 >= n_words * 25 AND len_ns * 10 <= n_words * 65
       AS INTEGER) AS f_wlen,
  CAST(n_stop >= 2 AS INTEGER) AS f_stop,
  CAST(n_alpha * 10 >= n_words * 8 AS INTEGER) AS f_alpha
FROM s)
SELECT doc_id, CAST(n_words AS INTEGER) AS n_words,
  f_words, f_wlen, f_stop, f_alpha,
  f_words * f_wlen * f_stop * f_alpha AS kept
FROM f ORDER BY doc_id
"""

_REPETITION_ORACLE = """
WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
           FROM documents),
stats AS (SELECT doc_id, CAST(len(ws) AS INTEGER) AS n_words,
          CAST(len(list_distinct(ws)) AS INTEGER) AS n_distinct FROM w),
e AS (SELECT doc_id, ws, unnest(range(greatest(len(ws) - 1, 0))) AS i
      FROM w),
bg AS (SELECT doc_id, array_to_string(ws[(i+1):(i+2)], ' ') AS bigram,
       COUNT(*) AS c FROM e GROUP BY doc_id, bigram),
top AS (SELECT doc_id, CAST(SUM(c) AS INTEGER) AS n_bigrams,
        CAST(MAX(c) AS INTEGER) AS top_bigram_cnt FROM bg GROUP BY doc_id)
SELECT s.doc_id, s.n_words, s.n_distinct, t.n_bigrams, t.top_bigram_cnt
FROM stats s JOIN top t ON s.doc_id = t.doc_id ORDER BY s.doc_id
"""

_SEQ_PACK_ORACLE = f"""
WITH d AS (SELECT doc_id,
  CAST(doc_id % {PACK_SHARDS} AS INTEGER) AS shard,
  len(string_split(lower(text), ' ')) AS n_tok FROM documents),
c AS (SELECT doc_id, shard, n_tok,
  SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
FROM d)
SELECT shard, CAST((cum - n_tok) // {SEQ_LEN} AS INTEGER) AS bin_id,
  CAST(COUNT(*) AS INTEGER) AS n_docs,
  CAST(SUM(n_tok) AS INTEGER) AS total_tokens
FROM c GROUP BY shard, bin_id ORDER BY shard, bin_id
"""

_NGRAM_OVERLAP_ORACLE = f"""
WITH w AS (SELECT doc_id, source, string_split(lower(text), ' ') AS ws
           FROM documents),
e AS (SELECT doc_id, source, ws,
      unnest(range(greatest(len(ws) - {NGRAM_N - 1}, 0))) AS i FROM w),
sh AS (SELECT DISTINCT doc_id, source,
       CAST('0x' || substring(md5(
         array_to_string(ws[(i+1):(i+{NGRAM_N})], ' ')), 1, 15)
         AS BIGINT) AS sh FROM e),
bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 10 = 0),
hits AS (SELECT DISTINCT s.doc_id FROM sh s
         JOIN bench b ON s.sh = b.sh WHERE s.doc_id % 10 <> 0)
SELECT d.source, CAST(COUNT(*) AS INTEGER) AS n_docs,
  CAST(SUM(CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END) AS INTEGER)
    AS n_contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id % 10 <> 0
GROUP BY d.source ORDER BY d.source
"""

_DOMAIN_MIX_ORACLE = f"""
WITH tot AS (SELECT COUNT(*) AS total FROM documents),
per AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
r AS (SELECT source, n_docs,
  least(1.0, (total * (CAST(regexp_extract(source, 'src(\\d+)', 1) AS INTEGER)
  + 1) / {MIX_DENOM * MIX_BUDGET_FRAC}) / n_docs) AS rate
FROM per, tot),
s AS (SELECT d.source, COUNT(*) AS n_sampled
      FROM documents d JOIN r ON d.source = r.source
      WHERE (CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)
             AS BIGINT) % 1000000) / 1000000.0 < r.rate
      GROUP BY d.source)
SELECT r.source, CAST(r.n_docs AS INTEGER) AS n_docs,
  CAST(COALESCE(s.n_sampled, 0) AS INTEGER) AS n_sampled
FROM r LEFT JOIN s ON r.source = s.source ORDER BY r.source
"""

_PAIR_COUNT_ORACLE = f"""
WITH v AS (SELECT word, COUNT(*) AS cnt FROM
  (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents) t
  GROUP BY word),
p AS (SELECT cnt, substring(word, CAST(i AS INTEGER), 2) AS pair
      FROM (SELECT word, cnt, unnest(range(1, length(word))) AS i
            FROM v WHERE length(word) >= 2) u)
SELECT pair, CAST(SUM(cnt) AS INTEGER) AS n FROM p GROUP BY pair
ORDER BY n DESC, pair LIMIT {PAIR_TOP_K}
"""

# --- nd_quality_model --------------------------------------------------------
# The learned quality filter — the standard modern curation stage (a trained
# classifier scoring every document, the single biggest quality lever in
# published ablations) expressed with this module's integer-exact discipline:
#
#   train  — a batch perceptron fit driver-side on a BOUNDED, deterministic
#            labeled slice (doc_id < QM_TRAIN_DOCS rows collected: the
#            nd_kmeans / PCA bounded-model-state convention). Teacher labels
#            come from a deterministic integer rule (the fixture has no human
#            labels; the synthesis convention of nd_pii_redact applies).
#            Batch updates (accumulate over the full pass, apply at epoch
#            end) make training ORDER-INDEPENDENT and integer-exact, so the
#            oracle can replay the identical training as QM_EPOCHS unrolled
#            SQL CTEs — the nd_bpe_merges unrolled-training precedent — and
#            the learned weights match bit-for-bit with no quantization step
#            (integer features x integer rate-1 updates are already ints).
#   score  — the fitted weights become LITERALS in one codegen dot product
#            over the full corpus: per-row, zero shuffle, no Python in the
#            hot path. At 100 TB the training slice is fixed-size (its cost
#            does not grow with the corpus) and scoring is a pure mapper.
QM_TRAIN_DOCS = 200
# 10 epochs chosen by a held-out scan (accuracy vs teacher on the FULL
# corpus at sf0.01 and sf0.1): the non-separable teacher makes batch
# perceptron accuracy non-monotone in epochs (0.65 @6, 0.88 @10, 0.79
# @14), and E=10 is the plateau that transfers across scales with a
# non-degenerate keep rate (~0.45 at both). Raw counts were tried first
# and fail outright — the large-magnitude length feature dominates every
# rate-1 update and the model collapses to all-reject at every epoch
# count; the centi-ratio scaling below is what makes integer perceptron
# training conditionable.
QM_EPOCHS = 10


def quality_features_frame(docs: DataFrame,
                           keep: tuple = ()) -> DataFrame:
    """Integer feature vector per document over any (doc_id, text) frame:
    x1 word count, x2 mean word length in DECIS (10*chars/words), x3
    stopword hits, x4 alphabetic-word PERCENT, x5 distinct-word PERCENT —
    the raw signals behind the Gopher gates, ratio-scaled to comparable
    integer ranges (integer division: `div` here, `//` in the oracle;
    identical on non-negative longs) so no single feature dominates the
    rate-1 updates. n_words >= 1 always (split('') is ['']), so the
    divisions are total. Pure per-row codegen; composes unchanged over
    readStream sources."""
    w = words("text")
    stop_arr = F.array(*[F.lit(s) for s in _STOP_MARKERS])
    base = docs.select(
        "doc_id", *keep,
        F.size(w).cast("long").alias("n_words"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        .cast("long").alias("len_ns"),
        F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x)))
        .cast("long").alias("n_stop"),
        F.size(F.filter(w, lambda x: x.rlike("^[a-z]+$")))
        .cast("long").alias("n_alpha"),
        F.size(F.array_distinct(w)).cast("long").alias("n_distinct"),
    )
    return base.select(
        "doc_id", *keep,
        F.col("n_words").alias("x1"),
        F.expr("(len_ns * 10) div n_words").alias("x2"),
        F.col("n_stop").alias("x3"),
        F.expr("(n_alpha * 100) div n_words").alias("x4"),
        F.expr("(n_distinct * 100) div n_words").alias("x5"),
    )


def quality_keep(docs: DataFrame, w: list[int]) -> DataFrame:
    """Rows passing the fitted scorer (score >= 0), (doc_id, text)
    preserved — the filtering form of the learned gate, used as a
    pipeline stage (the gopher_keep analog for the trained model)."""
    feats = quality_features_frame(docs, keep=("text",))
    score = (F.lit(w[0]) + F.lit(w[1]) * F.col("x1")
             + F.lit(w[2]) * F.col("x2") + F.lit(w[3]) * F.col("x3")
             + F.lit(w[4]) * F.col("x4") + F.lit(w[5]) * F.col("x5"))
    return feats.where(score >= 0).select("doc_id", "text")


def _qm_teacher_expr():
    """Deterministic teacher label over the feature columns: 'diverse
    vocabulary (>= 50% distinct words) with at least one stopword' —
    overlaps the feature set without handing the model a single
    thresholded copy of itself, and splits the fixture ~40/60."""
    return (F.col("x5") >= 50) & (F.col("x3") >= 1)


def train_perceptron(rows: list[tuple[int, ...]],
                     epochs: int = QM_EPOCHS) -> list[int]:
    """Batch perceptron over integer feature rows (y, x0=1, x1, ...):
    each epoch accumulates y*x over every misclassified row (y * w.x <= 0)
    and applies the summed update once at epoch end. Order-independent
    (the update is a sum), deterministic, and closed over the integers —
    the exact loop the oracle unrolls as SQL CTEs."""
    nx = len(rows[0]) - 1
    w = [0] * nx
    for _ in range(epochs):
        upd = [0] * nx
        for y, *x in rows:
            s = sum(wi * xi for wi, xi in zip(w, x))
            if y * s <= 0:
                for j in range(nx):
                    upd[j] += y * x[j]
        w = [wi + u for wi, u in zip(w, upd)]
    return w


def fit_quality_weights(spark: SparkSession, sf_dir: str,
                        labels_df: DataFrame | None = None) -> list[int]:
    """Fit the perceptron on the bounded labeled slice of the STATIC
    documents table. The collect is bounded model state — QM_TRAIN_DOCS
    rows of six longs, independent of corpus size — and the returned
    integer weights ship to any consumer (batch scorer, a readStream
    scorer) as literals: broadcast-free, pure codegen.

    `labels_df` — an optional EXTERNAL label table (doc_id, y) with
    y in {1, -1}: human ratings, an upstream model's verdicts, a
    versioned labels table. When given, training labels come from the
    join against it instead of the deterministic teacher rule (the
    round-10 verdict: a quality filter that can only learn its own
    feature thresholds is a rule, not a model — this is the ingest
    path real labels arrive through). The teacher remains the default
    so the registered row's unrolled-CTE oracle convention is
    unchanged. The doc_id bound still applies: the training collect
    stays fixed-size no matter how large the label table is."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    feats = quality_features_frame(docs).where(
        F.col("doc_id") < QM_TRAIN_DOCS)
    if labels_df is None:
        labeled = feats.select(
            F.when(_qm_teacher_expr(), 1).otherwise(-1).alias("y"),
            "x1", "x2", "x3", "x4", "x5")
    else:
        labeled = (feats.join(labels_df.select("doc_id", "y"), "doc_id")
                   .select("y", "x1", "x2", "x3", "x4", "x5"))
    train = labeled.collect()
    return train_perceptron(
        [(r.y, 1, r.x1, r.x2, r.x3, r.x4, r.x5) for r in train])


QM_LABELED_DOCS = 2 * QM_TRAIN_DOCS


def quality_labels_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic EXTERNAL-labels fixture (doc_id, y): the stand-in
    for a human-rated table (the fixture corpus has none — the
    nd_pii_redact synthesis convention). The 'annotator' applies a rule
    DIFFERENT from the teacher's (stopword-heavy AND short mean words)
    and flips every 13th document — label noise, the defining property
    of real ratings a pure rule never has. Covers doc_id <
    QM_LABELED_DOCS: the first half trains, the second half is held
    out for the agreement report."""
    docs = (table(spark, sf_dir, "documents").select("doc_id", "text")
            .where(F.col("doc_id") < QM_LABELED_DOCS))
    feats = quality_features_frame(docs)
    base = (F.col("x3") >= 2) & (F.col("x2") <= 60)
    noise = (F.col("doc_id") % 13) == 0
    return feats.select(
        "doc_id", F.when(base != noise, 1).otherwise(-1).alias("y"))


def nd_quality_model_labeled(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """The learned quality filter trained on EXTERNAL labels: fit on the
    labels fixture through the labels_df ingest path (join-then-bounded-
    collect — the same plan a versioned human-ratings table would take),
    score every document with the fitted weights as literals. The oracle
    replays the identical training as unrolled CTEs with y read from the
    labels relation instead of the teacher rule, so the hash gate covers
    the label-ingest path end to end."""
    w = fit_quality_weights(spark, sf_dir,
                            labels_df=quality_labels_frame(spark, sf_dir))
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    return quality_score_frame(docs, w).orderBy("doc_id")


def quality_score_frame(docs: DataFrame, w: list[int]) -> DataFrame:
    """Score any (doc_id, text) frame with fitted weights as literals:
    (doc_id, score, kept), one codegen dot product per row. Composes
    unchanged over readStream sources (per-row mapper, no state)."""
    feats = quality_features_frame(docs)
    score = (F.lit(w[0]) + F.lit(w[1]) * F.col("x1")
             + F.lit(w[2]) * F.col("x2") + F.lit(w[3]) * F.col("x3")
             + F.lit(w[4]) * F.col("x4") + F.lit(w[5]) * F.col("x5"))
    return feats.select("doc_id", score.cast("long").alias("score"),
                        (score >= 0).cast("int").alias("kept"))


def nd_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned quality filter: fit the batch perceptron on the bounded
    labeled slice, then score EVERY document with the fitted weights as
    literals — (doc_id, score, kept)."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    return (quality_score_frame(docs, fit_quality_weights(spark, sf_dir))
            .orderBy("doc_id"))


def _qm_feats_sql(src: str = "documents",
                  extra_cols: str = "") -> str:
    """The integer feature projection as an oracle SELECT over `src` —
    the SQL twin of quality_features_frame, shared by the standalone
    query and composed pipelines. `extra_cols` (e.g. ', text') rides
    through for consumers that filter and keep the payload."""
    return f"""SELECT doc_id{extra_cols}, n_words AS x1,
  (len_ns * 10) // n_words AS x2, n_stop AS x3,
  (n_alpha * 100) // n_words AS x4,
  (n_distinct * 100) // n_words AS x5
FROM (SELECT doc_id{extra_cols},
  CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_words,
  CAST(length(replace(text, ' ', '')) AS BIGINT) AS len_ns,
  CAST(len(list_filter(string_split(lower(text), ' '),
      x -> list_contains([{_STOP_LIST}], x))) AS BIGINT) AS n_stop,
  CAST(len(list_filter(string_split(lower(text), ' '),
      x -> regexp_matches(x, '^[a-z]+$'))) AS BIGINT) AS n_alpha,
  CAST(len(list_distinct(string_split(lower(text), ' '))) AS BIGINT)
      AS n_distinct
FROM {src})"""


def _qm_train_ctes(feats_cte: str = "s",
                   labels_cte: str | None = None) -> str:
    """The unrolled training chain as CTE text: `train` (labels over
    the bounded slice of `feats_cte` — the teacher rule by default, a
    JOIN against `labels_cte` when the external-label path is under
    test), `e0` (zero weights), and one eK per epoch applying the
    batch-sum update — ONE definition shared by the standalone oracle,
    the labeled-path oracle and the curation-funnel oracle so the
    trainings cannot drift."""
    dot = ("(w.w0 + w.w1*t.x1 + w.w2*t.x2 + w.w3*t.x3 + w.w4*t.x4"
           " + w.w5*t.x5)")
    upd = ["t.y"] + [f"t.y*t.x{j}" for j in range(1, 6)]
    epochs = []
    for e in range(1, QM_EPOCHS + 1):
        sels = ",\n    ".join(
            f"w.w{j} + COALESCE(SUM(CASE WHEN t.y * {dot} <= 0 "
            f"THEN {upd[j]} END), 0) AS w{j}" for j in range(6))
        epochs.append(
            f"e{e} AS (SELECT {sels}\n  FROM train t CROSS JOIN e{e-1} w"
            f"\n  GROUP BY w.w0, w.w1, w.w2, w.w3, w.w4, w.w5)")
    zeros = ", ".join(f"CAST(0 AS BIGINT) AS w{j}" for j in range(6))
    epoch_ctes = ",\n".join(epochs)
    if labels_cte is None:
        train_cte = f"""train AS (SELECT {feats_cte}.*,
          CASE WHEN x5 >= 50 AND x3 >= 1 THEN 1 ELSE -1 END AS y
          FROM {feats_cte} WHERE doc_id < {QM_TRAIN_DOCS})"""
    else:
        train_cte = f"""train AS (SELECT {feats_cte}.*, l.y
          FROM {feats_cte} JOIN {labels_cte} l
            ON {feats_cte}.doc_id = l.doc_id
          WHERE {feats_cte}.doc_id < {QM_TRAIN_DOCS})"""
    return f"""{train_cte},
e0 AS (SELECT {zeros}),
{epoch_ctes}"""


def _qm_score_sql(feats_alias: str = "s") -> str:
    """The literal dot product over a feature row, weights from the
    final epoch aliased `w`."""
    a = feats_alias
    return (f"(w.w0 + w.w1*{a}.x1 + w.w2*{a}.x2 + w.w3*{a}.x3"
            f" + w.w4*{a}.x4 + w.w5*{a}.x5)")


def _quality_model_oracle() -> str:
    """The training loop unrolled: e0 = zero weights, each eK one row of
    weights derived from e(K-1) by the same batch-sum update, the final
    epoch's weights scoring the full corpus. Integer-exact throughout, so
    the hash gate covers the LEARNED weights, not just the scoring."""
    score = _qm_score_sql("s")
    return f"""
WITH s AS ({_qm_feats_sql()}),
{_qm_train_ctes("s")}
SELECT s.doc_id, CAST({score} AS BIGINT) AS score,
       CAST({score} >= 0 AS INTEGER) AS kept
FROM s CROSS JOIN e{QM_EPOCHS} w ORDER BY s.doc_id
"""


def _quality_model_labeled_oracle() -> str:
    """The labeled-path training replayed: the labels relation states
    the fixture annotator rule (different thresholds + the 1-in-13
    flip) over the same feature CTE, training joins it instead of the
    teacher CASE, scoring is unchanged — the hash gate covers label
    ingest, the learned weights and the scoring in one row."""
    score = _qm_score_sql("s")
    return f"""
WITH s AS ({_qm_feats_sql()}),
labels AS (SELECT doc_id,
  CASE WHEN ((x3 >= 2 AND x2 <= 60) <> (doc_id % 13 = 0))
       THEN 1 ELSE -1 END AS y
  FROM s WHERE doc_id < {QM_LABELED_DOCS}),
{_qm_train_ctes("s", labels_cte="labels")}
SELECT s.doc_id, CAST({score} AS BIGINT) AS score,
       CAST({score} >= 0 AS INTEGER) AS kept
FROM s CROSS JOIN e{QM_EPOCHS} w ORDER BY s.doc_id
"""


def nd_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted (α=0.5) source mixing for a training run: each
    source's sampling weight is n_tokens^α — the multilingual/multi-domain
    rebalance that upsamples the tail without letting the head dominate.
    Emits per source its exact doc/token counts, its weight relative to
    the heaviest source (sqrt(n)/sqrt(n_max)), and the boost factor over
    natural sampling ((sqrt(n)/sqrt(n_max)) / (n/n_max)) — tail sources
    get boost > 1, the head gets exactly 1.

    Every emitted double is a composition of correctly-rounded IEEE ops
    (sqrt, divide) applied in the SAME order on both engines — hash-exact
    without rounding (the q04 rule: identical double-op chains agree
    bit-for-bit; only ROUND diverges). The relative-to-max form exists
    precisely to avoid a Σ over per-source doubles, whose summation order
    would differ between engines.

    Scale shape: one corpus scan → groupBy(source) with map-side combine
    (the token count per doc is computed where the text lives; only
    (source, count) pairs shuffle), then the max attaches via an
    unpartitioned window over the ~#sources-row aggregate — never a
    second corpus scan."""
    return mix_temperature_frame(
        table(spark, sf_dir, "documents").select("doc_id", "source",
                                                 "text"))


def mix_temperature_frame(docs: DataFrame) -> DataFrame:
    """The reweighting over an ARBITRARY (doc_id, source, text) frame
    (nd_mix_temperature is the fixture-bound wrapper; also the
    property-test surface)."""
    per = (docs
           .select("source", F.size(words("text")).alias("toks"))
           .groupBy("source")
           .agg(F.count("*").alias("n_docs"),
                F.sum("toks").cast("long").alias("n_tokens")))
    from pyspark.sql.window import Window
    n_max = F.max("n_tokens").over(Window.partitionBy())
    w_rel = F.sqrt(F.col("n_tokens")) / F.sqrt(F.col("n_max"))
    nat = F.col("n_tokens") / F.col("n_max")
    return (per.withColumn("n_max", n_max)
            .select("source", "n_docs", "n_tokens",
                    w_rel.alias("weight_rel"),
                    (w_rel / nat).alias("boost"))
            .orderBy("source"))


_MIX_TEMP_ORACLE = """
WITH per AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT)
         AS n_tokens
  FROM documents GROUP BY source),
m AS (SELECT per.*, MAX(n_tokens) OVER () AS n_max FROM per)
SELECT source, n_docs, n_tokens,
       sqrt(n_tokens) / sqrt(n_max) AS weight_rel,
       (sqrt(n_tokens) / sqrt(n_max)) /
       (CAST(n_tokens AS DOUBLE) / n_max) AS boost
FROM m ORDER BY source
"""


def nd_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation pipeline's survivor funnel in ONE declarative
    plan: total corpus → template-dedup survivors (keep-first per 8-word
    prefix fingerprint, the nd_source_overlap key — the fixture has no
    byte-exact duplicate texts, so whole-text md5 would make stage 1 a
    no-op; templated heads are where real corpora duplicate) →
    Gopher-quality survivors (the SURVIVOR's own flags — prefix-sharing
    copies differ in body, so keep-first picks min_by(kept, doc_id), not
    any copy's flag) → decontaminated survivors (prefix fingerprint
    absent from the held-out benchmark slice, the nd_cross_dedup
    convention: doc_id % 10 == 0 is the eval set and the funnel runs
    over the training remainder). Emits one row per stage:
    (stage, name, n_docs, frac_of_total) — frac is long/long division,
    bit-exact.

    This is the report a data-curation run publishes alongside its output
    manifest (the per-stage counts stages.py materializes one at a time,
    here folded into a single Catalyst plan). Scale shape: one corpus
    scan computes the per-doc fingerprint AND the quality flags in the
    same projection; the only shuffle carries (16-byte fp, two ints); the
    benchmark fingerprint set broadcasts; the final stage counts fold off
    the per-fp aggregate — nothing rescans the corpus, asserted in
    tests/test_scale.py.

    Reference intent: the summary a requester publishes per pipeline run
    (ROADMAP.md DAG results), as corpus analytics."""
    from bacalhau_spark.operators.dedup import OVERLAP_PREFIX_WORDS
    docs = (table(spark, sf_dir, "documents")
            .where(F.col("doc_id") % 10 != 0).select("doc_id", "text"))
    _, f_words, f_wlen, f_stop, f_alpha = _gopher_flag_exprs()
    kept = (f_words & f_wlen & f_stop & f_alpha).cast("int")
    prefix_fp = F.md5(F.concat_ws(
        " ", F.slice(words("text"), 1, OVERLAP_PREFIX_WORDS)))
    enriched = docs.select("doc_id", prefix_fp.alias("fp"),
                           kept.alias("kept"))
    bench = (table(spark, sf_dir, "documents")
             .where(F.col("doc_id") % 10 == 0)
             .select(prefix_fp.alias("bfp")).distinct())
    per_fp = (enriched.groupBy("fp")
              .agg(F.count("*").alias("n"),
                   F.min_by("kept", "doc_id").alias("kept"))
              .join(F.broadcast(bench), F.col("fp") == F.col("bfp"),
                    "left"))
    agg = per_fp.agg(
        F.sum("n").alias("total"),
        F.count("*").alias("exact"),
        F.sum("kept").alias("gopher"),
        F.sum(((F.col("kept") == 1) & F.col("bfp").isNull())
              .cast("long")).alias("decon"))
    stages = F.inline(F.array(
        F.struct(F.lit(0).alias("stage"), F.lit("total").alias("name"),
                 F.col("total").cast("long").alias("n_docs")),
        F.struct(F.lit(1).alias("stage"),
                 F.lit("template_dedup").alias("name"),
                 F.col("exact").cast("long").alias("n_docs")),
        F.struct(F.lit(2).alias("stage"), F.lit("gopher").alias("name"),
                 F.col("gopher").cast("long").alias("n_docs")),
        F.struct(F.lit(3).alias("stage"),
                 F.lit("decontaminated").alias("name"),
                 F.col("decon").cast("long").alias("n_docs"))))
    return (agg.select(stages, F.col("total").cast("long").alias("t"))
            .select("stage", "name", "n_docs",
                    (F.col("n_docs") / F.col("t")).alias("frac_of_total"))
            .orderBy("stage"))


_FUNNEL_ORACLE = """
WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
s AS (SELECT doc_id,
  md5(array_to_string((string_split(lower(text), ' '))[1:8], ' ')) AS fp,
  CAST(len(string_split(lower(text), ' ')) BETWEEN 15 AND 90
   AND length(replace(text, ' ', '')) * 10
       >= len(string_split(lower(text), ' ')) * 25
   AND length(replace(text, ' ', '')) * 10
       <= len(string_split(lower(text), ' ')) * 65
   AND len(list_filter(string_split(lower(text), ' '),
       x -> list_contains([{stops}], x))) >= 2
   AND len(list_filter(string_split(lower(text), ' '),
       x -> regexp_matches(x, '^[a-z]+$'))) * 10
       >= len(string_split(lower(text), ' ')) * 8 AS INTEGER) AS kept
 FROM corpus),
per_fp AS (SELECT fp, COUNT(*) AS n, arg_min(kept, doc_id) AS kept
           FROM s GROUP BY fp),
bench AS (SELECT DISTINCT
            md5(array_to_string((string_split(lower(text), ' '))[1:8], ' '))
            AS bfp FROM documents
          WHERE doc_id % 10 = 0),
agg AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS exact,
               CAST(SUM(kept) AS BIGINT) AS gopher,
               CAST(SUM(CASE WHEN kept = 1 AND b.bfp IS NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS decon
        FROM per_fp LEFT JOIN bench b ON per_fp.fp = b.bfp)
SELECT stage, name, n_docs, CAST(n_docs AS DOUBLE) / total AS frac_of_total
FROM (
  SELECT 0 AS stage, 'total' AS name, total AS n_docs, total FROM agg
  UNION ALL SELECT 1, 'template_dedup', exact, total FROM agg
  UNION ALL SELECT 2, 'gopher', gopher, total FROM agg
  UNION ALL SELECT 3, 'decontaminated', decon, total FROM agg)
ORDER BY stage
""".replace("{stops}", _STOP_LIST)


def nd_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card statistics: the per-source summary block a training
    corpus ships with (datasheet / model-card provenance table) — doc and
    language counts, size in chars and whitespace tokens, exact-duplicate
    rate — plus the corpus-wide TOTAL row. All counters are integers; the
    only double is dup_rate, an int/int division (bit-identical
    cross-engine).

    Plan shape (rewritten round 8 — the r7 form put two countDistincts
    inside rollup(), which plans as 2 Expand nodes whose first exchange
    carries the document stream multiplied by grains × distinct
    branches, the exact shape the round-4 profiling rule banned): each
    statistic family is now its own single-pass branch, and BOTH grains
    come from a map-side explode-mirror of the grouping key
    ([source, 'TOTAL']) — the mirror doubles rows only inside the scan
    stage, where partial aggregation / partial distinct collapses them
    before any exchange. The three shuffles therefore carry (a)
    per-source counter partials (a handful of longs per source), (b)
    distinct (grain, lang) pairs, (c) distinct (grain, fp) pairs — the
    same payload a single countDistinct pays, never the expanded
    stream; the TOTAL-key count-up is a map-side-combined groupBy, so
    no hot key either. Cost moved to the scan side: three column-pruned
    scans instead of one (text is decoded twice, for words() and
    md5()); at production scale persist the narrow (source, lang,
    n_chars, n_words, fp) projection to make it one — scans are
    embarrassingly parallel and shuffle-free, the Expand was neither.
    No Expand node anywhere, asserted for the whole curation family in
    tests/test_scale.py.

    Reference intent: the job-summary datacards the requester keeps per
    input CID set (results provenance), recast as corpus analytics."""
    docs = table(spark, sf_dir, "documents")

    def grain() -> Column:
        return (F.explode(F.array(F.col("source"), F.lit("TOTAL")))
                .alias("source"))

    base = (docs.select(grain(), "n_chars",
                        F.size(words("text")).cast("long").alias("n_words"))
            .groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("total_chars"),
                 F.sum("n_words").alias("total_words")))
    langs = (docs.select(grain(), "lang").distinct()
             .groupBy("source").agg(F.count("*").alias("n_langs")))
    fps = (docs.select(grain(), F.md5("text").alias("fp")).distinct()
           .groupBy("source").agg(F.count("*").alias("uniq_texts")))
    return (base.join(langs, "source").join(fps, "source")
            .select("source", "n_docs", "n_langs", "total_chars",
                    "total_words", "uniq_texts",
                    ((F.col("n_docs") - F.col("uniq_texts"))
                     / F.col("n_docs")).alias("dup_rate"))
            .orderBy("source"))


# Secret patterns in the Java-regex/RE2 COMMON subset (char classes +
# bounded reps only — no backrefs or lookarounds, which the two engines
# disagree on): AWS-style access key ids, 32+-hex blobs, ghp_-style
# personal access tokens.
SECRET_PATTERNS = (
    ("aws", "AKIA[0-9A-Z]{16}"),
    ("hex", "[0-9a-f]{32,}"),
    ("token", "ghp_[0-9a-z]{36}"),
)


def nd_secret_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Credential/secret scrubbing — the leaked-key screen that runs
    next to [[nd_pii_redact]]'s personal-data screen before a corpus
    ships (training sets memorize API keys verbatim; scrubbing them is
    a standard release gate). Counts per-doc hits for each pattern
    family and emits the md5 of the REDACTED text (every hit replaced
    with [SECRET]) as proof the scrub composes. The fixture prose has
    no secrets, so the query first derives a deterministic
    secret-bearing variant from (text, doc_id) — identically in both
    engines, the nd_pii_redact convention; docs off the modulus cycles
    stay clean, so zero-hit rows are exercised too.

    At 100 TB this is a pure per-row mapper (three regex passes in
    codegen, zero shuffle); spread scan for the CPU-dwarfs-row-bytes
    reason."""
    from bacalhau_spark.catalog import spread_compute

    docs = spread_compute(
        spark, table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.lit(" AKIA"),
                        F.upper(F.substring(
                            F.md5(F.col("doc_id").cast("string")), 1, 16))))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit(" "), F.md5("text"))).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0,
               F.concat(F.lit(" ghp_"),
                        F.substring(F.concat(F.md5("text"),
                                             F.md5(F.concat(F.lit("salt"),
                                                            F.col("text")))),
                                    1, 36))).otherwise(F.lit("")))
    out = docs.select("doc_id", aug.alias("aug"))
    redacted = F.col("aug")
    for _name, pat in SECRET_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, "[SECRET]")
    return (out.select(
        "doc_id",
        # idx=0 (whole match): Spark defaults to capture group 1, which
        # errors on group-free patterns; DuckDB defaults to group 0
        *[F.size(F.regexp_extract_all("aug", F.lit(pat), 0))
          .cast("long").alias(f"n_{name}")
          for name, pat in SECRET_PATTERNS],
        F.md5(redacted).alias("clean_fp"))
        .orderBy("doc_id"))


def _secret_scan_oracle() -> str:
    aug = """text
      || CASE WHEN doc_id % 7 = 0
              THEN ' AKIA' || upper(substring(md5(CAST(doc_id AS VARCHAR)),
                                              1, 16)) ELSE '' END
      || CASE WHEN doc_id % 5 = 0 THEN ' ' || md5(text) ELSE '' END
      || CASE WHEN doc_id % 11 = 0
              THEN ' ghp_' || substring(md5(text)
                                        || md5('salt' || text), 1, 36)
              ELSE '' END"""
    redacted = "aug"
    counts = []
    for name, pat in SECRET_PATTERNS:
        counts.append("CAST(len(regexp_extract_all(aug, "
                      f"'{pat}')) AS BIGINT) AS n_{name}")
        redacted = f"regexp_replace({redacted}, '{pat}', '[SECRET]', 'g')"
    return f"""
WITH a AS (SELECT doc_id, {aug} AS aug FROM documents)
SELECT doc_id, {', '.join(counts)}, md5({redacted}) AS clean_fp
FROM a ORDER BY doc_id
"""


CHURN_SCALE = 1_000_000


def nd_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot ingest delta: per source, how many distinct
    content fingerprints a new crawl snapshot ADDED, REMOVED, and KEPT
    versus the previous one, plus churn in parts-per-million — the
    "what changed in this crawl" report an incremental-ingest pipeline
    publishes per run (and the alarm that catches a source whose
    content silently turned over). Snapshots are deterministic
    overlapping doc_id-modulus slices of the fixture (old: %10 != 7,
    new: %10 != 3), standing in for two crawl dates.

    Scale shape: ONE map-side-combined aggregate to (source, fp,
    in_old, in_new) — presence flags fold with MAX inside the partial
    agg, so the exchange carries 16-byte fingerprints with two bits of
    state, never text; the per-source rollup runs on the reduced frame.
    This is the two-sided generalization of [[nd_incremental_dedup]]'s
    one-directional anti-join."""
    docs = table(spark, sf_dir, "documents")
    f = (docs.select("source", F.md5("text").alias("fp"),
                     (F.col("doc_id") % 10 != 7).cast("int").alias("o"),
                     (F.col("doc_id") % 10 != 3).cast("int").alias("nw"))
         .groupBy("source", "fp")
         .agg(F.max("o").alias("o"), F.max("nw").alias("nw")))
    return (f.groupBy("source")
            .agg(F.sum(F.expr("nw * (1 - o)")).cast("long").alias("added"),
                 F.sum(F.expr("o * (1 - nw)")).cast("long").alias("removed"),
                 F.sum(F.expr("o * nw")).cast("long").alias("kept"))
            .withColumn("churn_ppm",
                        F.expr(f"(added + removed) * {CHURN_SCALE} "
                               "div (added + removed + kept)")
                        .cast("long"))
            .orderBy("source"))


_SNAPSHOT_DIFF_ORACLE = f"""
WITH f AS (SELECT source, md5(text) AS fp,
                  MAX(CASE WHEN doc_id % 10 <> 7 THEN 1 ELSE 0 END) AS o,
                  MAX(CASE WHEN doc_id % 10 <> 3 THEN 1 ELSE 0 END) AS nw
           FROM documents GROUP BY source, fp)
SELECT source,
       CAST(SUM(nw * (1 - o)) AS BIGINT) AS added,
       CAST(SUM(o * (1 - nw)) AS BIGINT) AS removed,
       CAST(SUM(o * nw) AS BIGINT) AS kept,
       CAST((SUM(nw * (1 - o)) + SUM(o * (1 - nw))) * {CHURN_SCALE}
            // (SUM(nw * (1 - o)) + SUM(o * (1 - nw)) + SUM(o * nw))
            AS BIGINT) AS churn_ppm
FROM f GROUP BY source ORDER BY source
"""


K_ANON = 5
K_ANON_BUCKET = 100


def nd_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier combination
    (lang, source, n_chars bucketed to K_ANON_BUCKET chars): every QI
    group with fewer than K_ANON members, i.e. the documents a
    released corpus would expose to re-identification by their
    metadata alone — the privacy screen that runs next to
    [[nd_pii_redact]]'s content screen before a training set ships.
    Emits (lang, source, bucket, n) for the at-risk groups; an empty
    result certifies the release at k=K_ANON over these QIs.

    Scale shape: ONE map-side-combined aggregate over the projected
    QI columns (the n_chars bucket is per-row integer division inside
    the scan stage); the exchange carries only QI-group partials —
    bounded by the QI domain, not the corpus — and the k filter runs
    on the reduced frame. The document stream never shuffles."""
    return (table(spark, sf_dir, "documents")
            .select("lang", "source",
                    F.expr(f"n_chars div {K_ANON_BUCKET}")
                    .cast("long").alias("bucket"))
            .groupBy("lang", "source", "bucket")
            .agg(F.count("*").cast("long").alias("n"))
            .where(F.col("n") < K_ANON)
            .orderBy("lang", "source", "bucket"))


_K_ANON_ORACLE = f"""
SELECT lang, source, CAST(n_chars // {K_ANON_BUCKET} AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n
FROM documents GROUP BY lang, source, bucket
HAVING COUNT(*) < {K_ANON}
ORDER BY lang, source, bucket
"""


OUTLIER_SCALE = 1_000_000


def nd_lang_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source language-consistency audit: each source's DOMINANT
    language (mode of the lang column; ties break lang ASC — a total
    order, deterministic on any partitioning) and the count/rate of
    documents tagged with any OTHER language. A crawl source that is
    supposed to be English but suddenly ships 30% machine-translated
    boilerplate, or a scraper that started mislabeling, shows up here
    before it skews a language-balanced training mix — the categorical
    sibling of [[nd_ks_drift]]'s distributional gate. Rates are integer
    parts-per-million (n_outliers * 1e6 DIV n_docs), so every column
    value-hashes cross-engine.

    Scale shape: the document stream reduces in ONE map-side-combined
    pass to (source, lang) counts — the only exchange over corpus-
    derived data, carrying at most |sources| x |langs| rows. The mode
    pick is a window over that reduced frame (per-source partitions of
    |langs| rows), and the outlier rollup is a second aggregate of the
    same frame; the documents scan itself never shuffles."""
    from pyspark.sql import Window

    sl = (table(spark, sf_dir, "documents").select("source", "lang")
          .groupBy("source", "lang").agg(F.count("*").alias("c")))
    win = Window.partitionBy("source").orderBy(F.col("c").desc(), "lang")
    dom = (sl.withColumn("rk", F.row_number().over(win))
           .where(F.col("rk") == 1)
           .select("source", F.col("lang").alias("dominant_lang")))
    return (sl.join(dom, "source")
            .groupBy("source")
            .agg(F.max("dominant_lang").alias("dominant_lang"),
                 F.sum("c").cast("long").alias("n_docs"),
                 F.sum(F.when(F.col("lang") != F.col("dominant_lang"),
                              F.col("c")).otherwise(F.lit(0)))
                 .cast("long").alias("n_outliers"))
            .withColumn("outlier_ppm",
                        F.expr(f"n_outliers * {OUTLIER_SCALE} div n_docs")
                        .cast("long"))
            .orderBy("source"))


_LANG_OUTLIERS_ORACLE = f"""
WITH sl AS (SELECT source, lang, COUNT(*) AS c FROM documents
            GROUP BY source, lang),
dom AS (SELECT source, lang AS dominant_lang FROM sl
        QUALIFY ROW_NUMBER() OVER (PARTITION BY source
                                   ORDER BY c DESC, lang) = 1)
SELECT sl.source, MAX(dominant_lang) AS dominant_lang,
       CAST(SUM(c) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN lang <> dominant_lang THEN c ELSE 0 END)
            AS BIGINT) AS n_outliers,
       CAST(SUM(CASE WHEN lang <> dominant_lang THEN c ELSE 0 END)
            * {OUTLIER_SCALE}
            // SUM(c) AS BIGINT) AS outlier_ppm
FROM sl JOIN dom ON sl.source = dom.source
GROUP BY sl.source ORDER BY sl.source
"""


KS_SCALE = 1_000_000


def nd_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution drift: the exact two-sample
    Kolmogorov-Smirnov statistic of each source's document-length
    (n_chars) distribution against the REST of the corpus — the
    monitoring gate that catches a crawl source whose content shape
    shifted (truncation bugs, template floods, a scraper upgrade)
    before it contaminates a training mix. Everything is integer-exact:
    D = max|CDF_s - CDF_rest| is computed as the cross-multiplied
    ks_num = max|cum_s * n_rest - cum_rest * n_src| (no division until
    the final reported ks_x1e6 = ks_num * KS_SCALE DIV (n_src *
    n_rest)), so the statistic value-hashes cross-engine.

    Scale shape: the corpus collapses FIRST to per-(source, n_chars)
    counts — one map-side-combined aggregate over the 100 TB scan.
    That reduced frame feeds five logical branches (values, marginals,
    cumulative totals, grid probe), so it is PERSISTED
    (MEMORY_AND_DISK): ReuseExchange would collapse the duplicate
    subtrees only when the planner happens to leave them as identical
    exchanges (broadcast-side branches break the match — observed
    config-dependent under AQE), while an explicit materialization of
    the aggregate-sized (|sources| x |distinct lengths|) frame
    guarantees exactly one pass over the corpus under any planner;
    asserted in tests/test_scale.py (executed plan reads
    documents.parquet once). The evaluation grid is sources x
    distinct-values via a BROADCAST of the distinct-value list (the
    value domain is bounded by max document length, not corpus size),
    cumulative sums are windows over that bounded grid (the one
    unpartitioned window runs over |distinct lengths| rows, not
    documents), and the KS max is a final per-source aggregate. The
    document stream itself never shuffles."""
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    sv = (table(spark, sf_dir, "documents").select("source", "n_chars")
          .groupBy("source", "n_chars").agg(F.count("*").alias("c"))
          .persist(StorageLevel.MEMORY_AND_DISK))
    vals = sv.select("n_chars").distinct()
    srcs = sv.groupBy("source").agg(F.sum("c").alias("n_src"))
    total = srcs.agg(F.sum("n_src").cast("long").alias("n_total"))
    cum_all = (sv.groupBy("n_chars").agg(F.sum("c").alias("cv"))
               .withColumn("cum_all", F.sum("cv").over(
                   Window.orderBy("n_chars")
                   .rowsBetween(Window.unboundedPreceding,
                                Window.currentRow))))
    grid = (srcs.crossJoin(F.broadcast(vals))
            .join(sv, ["source", "n_chars"], "left").na.fill(0, ["c"])
            .withColumn("cum_s", F.sum("c").over(
                Window.partitionBy("source").orderBy("n_chars")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .join(F.broadcast(cum_all.select("n_chars", "cum_all")),
                  "n_chars")
            .crossJoin(F.broadcast(total)))
    return (grid
            .withColumn("n_rest", F.col("n_total") - F.col("n_src"))
            .withColumn("diff", F.abs(
                F.col("cum_s") * F.col("n_rest")
                - (F.col("cum_all") - F.col("cum_s")) * F.col("n_src")))
            .groupBy("source")
            .agg(F.max("n_src").cast("long").alias("n_src"),
                 F.max("n_rest").cast("long").alias("n_rest"),
                 F.max("diff").cast("long").alias("ks_num"),
                 F.expr(f"max(diff) * {KS_SCALE} div "
                        "(max(n_src) * max(n_rest))")
                 .cast("long").alias("ks_x1e6"))
            .orderBy("source"))


_KS_DRIFT_ORACLE = f"""
WITH sv AS (SELECT source, n_chars, COUNT(*) AS c FROM documents
            GROUP BY source, n_chars),
vals AS (SELECT DISTINCT n_chars FROM sv),
srcs AS (SELECT source, SUM(c) AS n_src FROM sv GROUP BY source),
tot AS (SELECT SUM(n_src) AS n_total FROM srcs),
ca AS (SELECT n_chars, SUM(SUM(c)) OVER (ORDER BY n_chars
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_all
       FROM sv GROUP BY n_chars),
grid AS (SELECT s.source, s.n_src, v.n_chars,
                SUM(COALESCE(sv.c, 0)) OVER (PARTITION BY s.source
                    ORDER BY v.n_chars
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS cum_s
         FROM srcs s CROSS JOIN vals v
         LEFT JOIN sv ON sv.source = s.source AND sv.n_chars = v.n_chars)
SELECT g.source, CAST(MAX(g.n_src) AS BIGINT) AS n_src,
       CAST(MAX(t.n_total - g.n_src) AS BIGINT) AS n_rest,
       CAST(MAX(ABS(g.cum_s * (t.n_total - g.n_src)
                    - (ca.cum_all - g.cum_s) * g.n_src)) AS BIGINT)
       AS ks_num,
       CAST(MAX(ABS(g.cum_s * (t.n_total - g.n_src)
                    - (ca.cum_all - g.cum_s) * g.n_src)) * {KS_SCALE}
            // (MAX(g.n_src) * MAX(t.n_total - g.n_src)) AS BIGINT)
       AS ks_x1e6
FROM grid g JOIN ca USING (n_chars) CROSS JOIN tot t
GROUP BY g.source ORDER BY g.source
"""


_DATASET_CARD_ORACLE = """
SELECT COALESCE(source, 'TOTAL') AS source,
       COUNT(*) AS n_docs,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(CAST(len(string_split(lower(text), ' ')) AS BIGINT))
            AS BIGINT) AS total_words,
       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS uniq_texts,
       (COUNT(*) - COUNT(DISTINCT md5(text))) / COUNT(*) AS dup_rate
FROM documents GROUP BY ROLLUP (source) ORDER BY source
"""


QUERIES = {
    "nd_quality_model": (nd_quality_model, _quality_model_oracle()),
    "nd_quality_model_labeled": (nd_quality_model_labeled,
                                 _quality_model_labeled_oracle()),
    "nd_dataset_card": (nd_dataset_card, _DATASET_CARD_ORACLE),
    "nd_ks_drift": (nd_ks_drift, _KS_DRIFT_ORACLE),
    "nd_lang_outliers": (nd_lang_outliers, _LANG_OUTLIERS_ORACLE),
    "nd_k_anonymity": (nd_k_anonymity, _K_ANON_ORACLE),
    "nd_secret_scan": (nd_secret_scan, _secret_scan_oracle()),
    "nd_snapshot_diff": (nd_snapshot_diff, _SNAPSHOT_DIFF_ORACLE),
    "nd_curation_funnel": (nd_curation_funnel, _FUNNEL_ORACLE),
    "nd_mix_temperature": (nd_mix_temperature, _MIX_TEMP_ORACLE),
    "nd_pii_redact": (nd_pii_redact, _PII_ORACLE),
    "nd_bpe_pair_count": (nd_bpe_pair_count, _PAIR_COUNT_ORACLE),
    "nd_bpe_merges": (nd_bpe_merges, _bpe_merges_oracle()),
    "nd_bpe_encode": (nd_bpe_encode, _bpe_encode_oracle()),
    "nd_gopher_filter": (nd_gopher_filter, _GOPHER_ORACLE),
    "nd_repetition": (nd_repetition, _REPETITION_ORACLE),
    "nd_seq_pack": (nd_seq_pack, _SEQ_PACK_ORACLE),
    "nd_ngram_overlap": (nd_ngram_overlap, _NGRAM_OVERLAP_ORACLE),
    "nd_domain_mix": (nd_domain_mix, _DOMAIN_MIX_ORACLE),
    "nd_corpus_stats": (nd_corpus_stats, _CORPUS_STATS_ORACLE),
    "nd_dedup_stats": (nd_dedup_stats, _DEDUP_STATS_ORACLE),
}
