"""Text-analysis operators over the ``documents`` table.

Training-data-pipeline staples, each expressed with built-in
``pyspark.sql.functions`` (JVM-side, whole-stage codegen — no Python
in the hot path) so they scale linearly with no shuffle:

- token counting (whitespace + BPE-ish regex),
- quality scoring (length / punctuation / stopword ratios),
- language identification (marker-word n-gram heuristic),
- document fingerprinting (normalized-text hash + rolling shingles).

Every function is a narrow projection: Catalyst prunes the scan to
``text`` plus requested columns, and the operators compose with any
downstream groupBy/join without extra exchanges.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker vocabularies for the language-ID heuristic. Deliberately
# SQL-portable (occurrence counting via length arithmetic) so the
# DuckDB oracle can replicate the exact scoring.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "fr": ("le", "et", "les"),
    "es": ("el", "que", "los"),
    "zh": ("de", "shi", "le"),
}

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")

# BPE-ish token pattern: runs of letters, runs of digits, or a single
# non-space symbol — the classic pre-tokenizer split.
BPE_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def occurrences(col: Column, term: str) -> Column:
    """Count non-overlapping occurrences of a literal term.

    length-arithmetic form — identical semantics in Spark and ANSI
    SQL/DuckDB, which keeps the oracle exact:
    (len(s) - len(replace(s, t, ''))) / len(t).
    """
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(term), F.lit(""))))
        / len(term)
    ).cast("long")


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish token count per document."""
    from aws_dms_cdc_data_pipeline_spark.operators.partitioning import (
        fan_out_scan,
    )

    # fan-out-guarded pure map (the gopher_quality_flags precedent):
    # a few-file corpus otherwise pins the whole per-row projection to
    # the scan's split count (profiled r17: every one of these ran as
    # ONE task at sf0.1); the 128 KB bar is the heavy-per-row tier.
    df = fan_out_scan(df, min_bytes_per_partition=128 * 1024)
    c = F.col(text_col)
    ws = F.size(F.split(F.trim(c), r"\s+"))
    return df.withColumn(
        "ws_tokens", F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(ws)
    ).withColumn("bpe_tokens", F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0)))


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + combined score in [0, 1].

    Features mirror the published quality-filter recipes (length,
    punctuation density, stopword density, mean word length); the
    combined score is a clipped linear blend — a placeholder a user
    tunes, but shuffle-free and fully vectorized.
    """
    from aws_dms_cdc_data_pipeline_spark.operators.partitioning import (
        fan_out_scan,
    )

    # fan-out-guarded pure map (the gopher_quality_flags precedent):
    # a few-file corpus otherwise pins the whole per-row projection to
    # the scan's split count (profiled r17: every one of these ran as
    # ONE task at sf0.1); the 128 KB bar is the heavy-per-row tier.
    df = fan_out_scan(df, min_bytes_per_partition=128 * 1024)
    c = F.col(text_col)
    n_chars = F.length(c)
    words = F.split(F.trim(c), r"\s+")
    n_words = F.size(words)
    punct = F.size(F.regexp_extract_all(c, F.lit(r"[.,;:!?]"), 0))
    stop_hits = sum(occurrences(c, f" {w} ") for w in STOPWORDS)
    mean_word_len = (n_chars - n_words + 1) / n_words  # spaces removed

    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = stop_hits / F.greatest(n_words, F.lit(1))
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    score = F.greatest(
        F.least(
            F.round(
                0.4 * len_score
                + 0.3 * F.least(stop_ratio * 5.0, F.lit(1.0))
                + 0.3 * (1.0 - F.least(punct_ratio * 20.0, F.lit(1.0))),
                6,
            ),
            F.lit(1.0),
        ),
        F.lit(0.0),
    )
    return (
        df.withColumn("n_words", n_words)
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("stop_ratio", F.round(stop_ratio, 6))
        .withColumn("mean_word_len", F.round(mean_word_len, 6))
        .withColumn("quality_score", score)
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: argmax of per-language marker counts.

    Deterministic tie-break: higher score wins, then lexicographically
    smaller language code. Padded-occurrence counting ≈ unigram model;
    at scale this is a pure map — no shuffle, no UDF.

    HONESTY CONTRACT (asserted by
    tests/test_text.py::test_lang_id_planted_multilingual_accuracy):
    this is a 3-marker-per-language heuristic, not a trained model.
    It is reliable exactly when the text contains the language's top
    function words, and it has two documented failure modes: (1)
    marker-free text scores 0 everywhere and falls to the
    lexicographic default ``de`` (the first code in the marker set);
    (2) cross-language marker collisions
    (French ``le`` is also a pinyin ``zh`` marker; Spanish prose
    containing ``le`` pronouns can leak score to fr/zh). PRODUCTION
    SWAP-IN POINT: replace the score map with a real public LID model
    (e.g. fastText lid.176 or CLD3) applied as a broadcast model
    inside ``mapInPandas`` — the surrounding plan shape (pure
    per-row map, no shuffle) is unchanged; only the scorer widens
    from 15 markers to a trained classifier. The model file is not in
    this container, so the heuristic is the tested default.
    """
    from aws_dms_cdc_data_pipeline_spark.operators.partitioning import (
        fan_out_scan,
    )

    # fan-out-guarded pure map (the gopher_quality_flags precedent):
    # a few-file corpus otherwise pins the whole per-row projection to
    # the scan's split count (profiled r17: every one of these ran as
    # ONE task at sf0.1); the 128 KB bar is the heavy-per-row tier.
    df = fan_out_scan(df, min_bytes_per_partition=128 * 1024)
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    scores = {
        lang: sum(occurrences(padded, f" {m} ") for m in markers)
        for lang, markers in LANG_MARKERS.items()
    }
    best = None
    for lang in sorted(scores):  # lexicographic tie-break
        s = scores[lang]
        if best is None:
            best, best_lang = s, F.lit(lang)
        else:
            cond = s > best
            best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
            best = F.when(cond, s).otherwise(best)
    return df.withColumn("pred_lang", best_lang)


# PII patterns, ordered: structured formats first (SSN before the
# generic phone run), then address-like tokens. Kept to the regex
# subset with identical semantics in Java regex and DuckDB/RE2 so the
# SQL oracle replays the exact same redaction.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "[PHONE]"),
)


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace PII-shaped spans with typed placeholders + per-type counts.

    Training-corpus hygiene pass: emails, SSNs, IPv4s, and phone-number
    runs become ``[EMAIL]``/``[SSN]``/``[IP]``/``[PHONE]``; a
    ``n_<type>`` column counts the spans BEFORE replacement so the
    scrub is auditable. Pure sequential regexp projection — JVM-side,
    shuffle-free, and each pattern applies to the previous pattern's
    output (SSNs are counted before the phone pattern could swallow
    them). Heuristic by design: a production pass would add locale
    packs, but the plumbing (ordering, counting, placeholder scheme)
    is the real contract.
    """
    from aws_dms_cdc_data_pipeline_spark.operators.partitioning import (
        fan_out_scan,
    )

    # fan-out-guarded pure map (the gopher_quality_flags precedent):
    # a few-file corpus otherwise pins the whole per-row projection to
    # the scan's split count (profiled r17: every one of these ran as
    # ONE task at sf0.1); the 128 KB bar is the heavy-per-row tier.
    df = fan_out_scan(df, min_bytes_per_partition=128 * 1024)
    out = df
    cleaned = F.col(text_col)
    for name, pat, repl in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(cleaned, F.lit(pat), 0)).cast("long"),
        )
        cleaned = F.regexp_replace(cleaned, pat, repl)
    return out.withColumn("clean_text", cleaned)


def collocations(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Top-``top_k`` adjacent-bigram collocations by pointwise mutual
    information — the corpus-analysis op behind multiword-expression
    mining and tokenizer-merge sanity checks (which adjacent pairs
    co-occur far beyond chance).

    PMI = ln(c(ab)·N / (c(a)·c(b))) over ADJACENT alnum token pairs,
    where c(a)/c(b) are corpus token counts and N the total token
    count; rounded to 6 digits (the tfidf ln-rounding convention —
    absorbs cross-engine libm ulp drift so the DuckDB oracle matches).
    ``min_count`` floors c(ab): PMI's low-frequency bias makes
    unfloored rankings hapax noise.

    Shape: one positional pass builds bigrams with ``lead`` inside the
    per-doc window (the same pruned-postings window machinery phrase
    search uses, but unpruned — this is a corpus sweep by nature),
    then three token-keyed aggregations; every exchange carries
    fixed-width (id/token, pos/count) rows — never document text —
    and top-k compiles to TakeOrderedAndProject.
    """
    from pyspark.sql import Window

    from aws_dms_cdc_data_pipeline_spark.operators.search import (
        tokenize_positions,
    )

    # four consumers (two unigram join legs, the corpus total, the
    # bigram window) would each re-run the tokenize+posexplode pass —
    # persist under the caller-owned plan-keyed cache policy the
    # other text operators document.
    toks = tokenize_positions(df, text_col, id_col).persist()
    uni = toks.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("c"))
    n_tokens = toks.agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy(id_col).orderBy("pos")
    bi = (
        toks.withColumn("_next", F.lead("term", 1).over(w))
        .filter(F.col("_next").isNotNull())
        .groupBy(
            F.col("term").alias("term_a"), F.col("_next").alias("term_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
    )
    scored = (
        bi.join(uni.select(F.col("term").alias("term_a"), F.col("c").alias("c_a")), "term_a")
        .join(uni.select(F.col("term").alias("term_b"), F.col("c").alias("c_b")), "term_b")
        .crossJoin(F.broadcast(n_tokens))
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    (F.col("pair_count") * F.col("n")).cast("double")
                    / (F.col("c_a") * F.col("c_b")).cast("double")
                ),
                6,
            ),
        )
    )
    return (
        scored.select("term_a", "term_b", "pair_count", "c_a", "c_b", "pmi")
        .orderBy(F.col("pmi").desc(), "term_a", "term_b")
        .limit(top_k)
    )


def vocabulary(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, n_occurrences, n_docs) over normalized whitespace terms.

    The corpus-analysis staple behind vocab builds, stopword lists
    and df-based filtering (e.g. ngram max_df tuning). Classic
    wordcount shape: explode + groupBy(term) — map-side combine does
    the heavy lifting, the shuffle carries one row per distinct term
    per partition. Callers wanting top-k add orderBy+limit, which
    compiles to TakeOrdered (no global sort).
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    terms = df.select(
        id_col, F.explode(F.split(norm, " ")).alias("term")
    ).filter(F.col("term") != "")
    return terms.groupBy("term").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct(id_col).alias("n_docs"),
    )


def tfidf_top_terms(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by smoothed TF-IDF.

    score = tf · (ln((N+1)/(df+1)) + 1), rounded to 6 digits (ln is
    transcendental — rounding absorbs cross-engine libm ulp drift the
    way the cosine operators do). Shape: one wordcount aggregation for
    (doc, term) tf, one for df, a broadcast of the corpus size, and a
    per-doc rank window — WindowGroupLimit pushes the top-k cut
    map-side, so no task materializes a document's full vocabulary
    sorted. Ties break (score desc, term asc): total order, stable
    cut at every k.
    """
    from pyspark.sql import Window

    from aws_dms_cdc_data_pipeline_spark.operators.partitioning import fan_out_scan

    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    terms = fan_out_scan(df.select(id_col, text_col)).select(
        id_col, F.explode(F.split(norm, " ")).alias("term")
    ).filter(F.col("term") != "")
    # tf feeds BOTH the score join and the df aggregate; without the
    # persist Spark recomputes the tokenize+explode+shuffle subtree
    # once per branch (measured: the join leg alone doubled the
    # query, 3.4 s → 1.2 s at sf1 with the persist). Cache lifecycle
    # belongs to the CALLER, exactly as minhash documents it: entries
    # are plan-keyed so back-to-back runs on the same input legally
    # reuse one materialization, and sweeps clear between families.
    # The cache is persisted TERM-partitioned: HashPartitioning(term)
    # satisfies the df aggregate AND the score join, so the warm path
    # runs both exchange-free and only the final per-doc rank window
    # shuffles (sf1 steady 2.13 s → 1.50 s). The term exchange sees
    # the same per-term row distribution the score join shuffled
    # anyway (≤1 row per (doc, term) — bounded by df, never by
    # occurrences; the map-side combine has already run).
    P = df.sparkSession.sparkContext.defaultParallelism
    tf = (
        terms.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .repartition(P, F.col("term"))
        .persist()
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # corpus size rides in the plan as a broadcast 1-row aggregate —
    # no eager driver-side count, the operator stays fully lazy
    n_docs = df.agg(F.countDistinct(id_col).alias("_n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("_n") + F.lit(1)).cast("double")
                        / (F.col("df") + F.lit(1)).cast("double")
                    )
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "tfidf", "rank")
    )


def with_repetition_scores(
    df: DataFrame, text_col: str = "text", ns: tuple[int, ...] = (2, 3)
) -> DataFrame:
    """Within-document duplicate word-n-gram fractions (repetition signal).

    The Gopher/RefinedWeb-style repetition filter: boilerplate and
    looping generations repeat n-grams far above natural-text rates,
    so ``dup_frac = 1 - distinct_ngrams / total_ngrams`` per document
    is a cheap, effective quality gate. For each ``n`` emits
    ``ngrams_{n}``, ``distinct_{n}`` and the fixed-point fraction
    ``dup_fp_{n}`` = floor(dup_frac·1e6) (integer — portable across
    engines, no float rounding hazard).

    Pure array-function projection — split once, build grams with
    ``transform`` over an index sequence, count with
    ``array_distinct`` — all JVM-side, shuffle-free, linear in corpus
    size. Word and gram arrays are staged as real columns so each is
    computed once (inlining them into downstream expressions would
    re-evaluate the transform per reference).
    """
    from aws_dms_cdc_data_pipeline_spark.operators.partitioning import (
        fan_out_scan,
    )

    # fan-out-guarded pure map (the gopher_quality_flags precedent):
    # a few-file corpus otherwise pins the whole per-row projection to
    # the scan's split count (profiled r17: every one of these ran as
    # ONE task at sf0.1); the 128 KB bar is the heavy-per-row tier.
    df = fan_out_scan(df, min_bytes_per_partition=128 * 1024)
    out = df.withColumn("_w", F.split(F.col(text_col), " "))
    temps = ["_w"]
    for n in ns:
        # sequence(1, 0) would DESCEND in Spark — guard short docs
        idx = F.when(
            F.size("_w") >= n, F.sequence(F.lit(1), F.size("_w") - (n - 1))
        ).otherwise(F.array().cast("array<int>"))
        # NB: a default-arg lambda (i, n=n) would read to F.transform
        # as the two-param (element, index) form — bind n via a factory
        def _gram(n: int):
            return lambda i: F.concat_ws(
                " ", *[F.element_at("_w", i + j) for j in range(n)]
            )

        grams = F.transform(idx, _gram(n))
        out = out.withColumn(f"_g{n}", grams)
        temps.append(f"_g{n}")
        ng = F.size(f"_g{n}")
        nd = F.size(F.array_distinct(f"_g{n}"))
        out = (
            out.withColumn(f"ngrams_{n}", ng.cast("long"))
            .withColumn(f"distinct_{n}", nd.cast("long"))
            .withColumn(
                f"dup_fp_{n}",
                F.when(ng == 0, F.lit(0))
                .otherwise(F.floor((1.0 - nd.cast("double") / ng) * 1e6))
                .cast("long"),
            )
        )
    return out.drop(*temps)


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Mean unigram log-probability per document — a perplexity proxy.

    The info-theoretic quality filter: train a unigram LM on the
    corpus itself (term frequency / total tokens), score each
    document by the mean log-probability of its words. Gibberish and
    rare-token soup score low; repetitive boilerplate scores
    suspiciously high — both tails get cut in published pipelines.

    Determinism: per-term log-probs quantize to integer micro-nats
    (``floor(ln(p)·1e6)``) BEFORE the per-document sum, so the
    aggregation is pure BIGINT — no float-summation-order drift; the
    final mean divides identical integers.

    Scale shape: one wordcount aggregation for the vocab (map-side
    combine), the corpus total rides as a broadcast 1-row aggregate
    (no eager count), and the terms⋈vocab join keys on the term —
    AQE broadcasts it when the vocabulary fits (natural-language
    vocabularies do; the shuffle path remains correct when not).
    Output: one row per document with ≥1 token.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    terms = df.select(
        id_col, F.explode(F.split(norm, " ")).alias("term")
    ).filter(F.col("term") != "")
    vocab = terms.groupBy("term").agg(F.count(F.lit(1)).alias("_c"))
    total = vocab.agg(F.sum("_c").alias("_n"))
    lp = (
        vocab.crossJoin(F.broadcast(total))
        .select(
            "term",
            F.floor(
                F.log(F.col("_c").cast("double") / F.col("_n")) * 1e6
            )
            .cast("long")
            .alias("_lq"),
        )
    )
    return (
        terms.join(lp, "term")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("_lq").alias("sum_lq"),
        )
        .withColumn(
            "mean_logprob",
            F.col("sum_lq").cast("double") / 1e6 / F.col("n_terms"),
        )
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """Mean bigram log-probability per document — the order-aware
    perplexity proxy (the CCNet/KenLM quality-filter shape scaled to
    its bigram core; :func:`unigram_logprob` is the order-blind
    version). Trains a Laplace-smoothed bigram LM on the corpus
    itself — ``p(w2|w1) = (c(w1,w2)+α) / (c(w1·)+α·|V|)`` with
    c(w1·) the bigram-context count and V the token vocabulary — and
    scores each document by the mean log-probability of its adjacent
    token pairs. Word salad scores low even when its unigrams are
    common; only documents with ≥2 tokens (≥1 bigram) appear.

    Determinism: counts are exact longs; per-bigram log-probs
    quantize to integer micro-nats (``round(ln(p)·1e6)``) BEFORE the
    per-document sum (exact, order-free BIGINT), and the final mean
    divides identical integers — the unigram_logprob contract.

    Scale shape: bigrams materialize IN-ROW from the token array (no
    positional self-join on the Spark side); the model is a
    bigram-vocabulary-sized relation joined on the pair key; the
    corpus text never shuffles — only (id, w1, w2) pair rows do.
    """
    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    from aws_dms_cdc_data_pipeline_spark.operators.partitioning import (
        fan_out_scan,
    )

    toks = fan_out_scan(df.select(id_col, text_col)).select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
            lambda x: x != F.lit(""),
        ).alias("_toks"),
    )
    # |V| rides the plan as a broadcast 1-row aggregate instead of a
    # collected driver literal: the old ``.distinct().count()`` was a
    # separate full-corpus ACTION per call (re-tokenize + distinct,
    # measured 0.17 s/pass at sf0.1) serialized before the scoring
    # DAG could even be submitted; in-plan it runs concurrently with
    # the other model legs. Exact same value (count_distinct of the
    # exploded vocabulary, long→double cast both ways).
    vagg = toks.select(F.explode("_toks").alias("w")).agg(
        F.count_distinct("w").cast("double").alias("_V")
    )
    pairs = (
        toks.filter(F.size("_toks") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.expr(
                    "transform(sequence(0, size(_toks) - 2), "
                    "i -> struct(_toks[i] AS w1, _toks[i + 1] AS w2))"
                )
            ).alias("_bg"),
        )
        .select(F.col(id_col), F.col("_bg.w1"), F.col("_bg.w2"))
    ).persist()
    bg = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    ctx = pairs.groupBy("w1").agg(
        F.count(F.lit(1)).cast("long").alias("_c1")
    )
    lp = (
        bg.join(ctx, "w1")
        .crossJoin(F.broadcast(vagg))
        .select(
            "w1", "w2",
            F.round(
                F.log(
                    (F.col("_c").cast("double") + F.lit(float(alpha)))
                    / (F.col("_c1").cast("double")
                       + F.lit(float(alpha)) * F.col("_V"))
                ) * F.lit(1e6), 0
            ).cast("long").alias("_lq"),
        )
    )
    out = (
        pairs.join(lp, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("_lq").cast("long").alias("sum_lq"),
        )
        .withColumn(
            "mean_logprob",
            F.col("sum_lq").cast("double") / 1e6 / F.col("n_bigrams"),
        )
    )
    # pairs stays persisted (plan-keyed): the model legs (bg, ctx)
    # and the scoring join all read it at evaluation time
    return out


def bigram_logprob_oracle_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> str:
    """DuckDB SQL computing the identical bigram-LM scores (positions
    via generate_subscripts + an ord+1 self-join — a different bigram
    algorithm than Spark's in-row array transform, same results)."""
    a = float(alpha)
    split = f"string_split_regex(lower({text_col}), '[^a-z0-9]+')"
    return f"""
    WITH toks AS (
        SELECT {id_col} AS id, t.term, t.ord
        FROM {table},
             LATERAL (SELECT unnest({split}) AS term,
                             generate_subscripts({split}, 1) AS ord) t
        WHERE t.term <> ''
    ),
    vs AS (SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS v FROM toks),
    pairs AS (
        SELECT a.id, a.term AS w1, b.term AS w2
        FROM toks a JOIN toks b ON a.id = b.id AND b.ord = a.ord + 1
    ),
    bg AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
           FROM pairs GROUP BY w1, w2),
    ctx AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
            FROM pairs GROUP BY w1),
    lp AS (
        SELECT bg.w1, bg.w2,
               CAST(round(ln((CAST(bg.c AS DOUBLE) + {a!r})
                             / (CAST(ctx.c1 AS DOUBLE) + {a!r} * vs.v))
                          * 1e6, 0) AS BIGINT) AS lq
        FROM bg JOIN ctx USING (w1) CROSS JOIN vs
    )
    SELECT p.id AS {id_col},
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(l.lq) AS BIGINT) AS sum_lq,
           CAST(SUM(l.lq) AS DOUBLE) / 1e6 / COUNT(*) AS mean_logprob
    FROM pairs p JOIN lp l ON p.w1 = l.w1 AND p.w2 = l.w2
    GROUP BY p.id
    """


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint over normalized text.

    Normalization: lowercase, collapse whitespace. Hash: md5 (portable
    to the SQL oracle). For shingle-level rolling hashes see
    operators/dedup.py (minhash/simhash paths).
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn("fingerprint", F.md5(norm))


def remove_boilerplate_lines(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 10,
) -> DataFrame:
    """Corpus-level line deduplication (boilerplate removal).

    The RefinedWeb/CCNet preprocessing step the document-level dedups
    (operators/dedup.py) can't express: a LINE that appears in
    ``min_df`` or more distinct documents is boilerplate (headers,
    footers, cookie banners, nav text) — strip it from every document
    and reassemble the remaining lines in their original order.
    Returns (id_col, clean_text, n_lines_kept, n_lines_removed); a
    document whose every line is boilerplate comes back with
    ``clean_text = ''`` rather than disappearing.

    Scale shape (the skew trap is the point here): boilerplate lines
    are BY DEFINITION the hottest keys in the corpus — a naive
    ``groupBy(line).agg(count_distinct(doc_id))`` funnels every copy
    of a popular footer into one task. Instead the document frequency
    is computed as ``distinct(line, doc_id)`` FIRST — that shuffle
    spreads a hot line across partitions by (line, doc) — followed by
    a map-side-combinable count. The boilerplate line set (df ≥
    min_df) is small and joins back as a build side; reassembly is
    one groupBy(doc) with an order-restoring array_sort on (pos,
    line) structs — no window, no second shuffle axis.
    """
    lines = (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
        )
        .withColumn("line", F.trim(F.col("line")))
        .filter(F.col("line") != "")
    )
    # distinct-first: hot lines spread over (line, doc) before counting
    line_df = (
        lines.select("line", id_col)
        .distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("_df"))
    )
    boiler = line_df.filter(F.col("_df") >= min_df).select("line")
    kept = lines.join(boiler, "line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("n_lines_kept"),
    )
    totals = lines.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n_lines")
    )
    return (
        df.select(id_col)
        .join(rebuilt, id_col, "left")
        .join(totals, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_lines_kept", F.lit(0)).cast("long").alias("n_lines_kept"),
            (
                F.coalesce("_n_lines", F.lit(0)) - F.coalesce("n_lines_kept", F.lit(0))
            ).cast("long").alias("n_lines_removed"),
        )
    )


def gopher_quality_flags(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Gopher quality-filter rules (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", Appendix A — the published
    thresholds the big public corpora reuse, e.g. RefinedWeb/Dolma):

    - ``ok_word_count``: 50 ≤ words ≤ 100,000
    - ``ok_mean_word_len``: mean word length in [3, 10] characters
    - ``ok_symbol_ratio``: ('#' chars + '...' occurrences) / words ≤ 0.1
    - ``ok_alpha_words``: ≥80% of words contain ≥1 alphabetic char
    - ``ok_stopwords``: ≥2 DISTINCT of the 8 Gopher stop words
      {the, be, to, of, and, that, have, with}
    - ``ok_bullet_lines``: ≤90% of lines start with a bullet
      ('-', '*', '•')
    - ``ok_ellipsis_lines``: ≤30% of lines end with '...'
    - ``passes``: AND of all flags (the filter decision)

    Every ratio test compares cross-multiplied integers (10·sym ≤
    words, 5·alpha ≥ 4·words, ...), so the flags are exact in any
    engine — no float thresholds. Words are whitespace tokens of the
    trimmed text (punctuation attached, per the paper's tokenizer-
    free counting); lines split on newlines. One narrow projection,
    no UDF — a pure map at any scale, fan-out-guarded so a few-file
    corpus doesn't pin the per-word rule evaluation to the scan's
    split count (profiled r17: the whole query ran as ONE 0.4 s task
    at sf0.1; the 128 KB bar is the quadratic/heavy-work tier — this
    map runs several array lambdas plus a per-word rlike).
    """
    from aws_dms_cdc_data_pipeline_spark.operators.partitioning import (
        fan_out_scan,
    )

    df = fan_out_scan(
        df.select(id_col, text_col),
        min_bytes_per_partition=128 * 1024,
    )
    c = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(
        F.split(F.regexp_replace(F.trim(c), r"\s+", " "), " "),
        lambda w: w != F.lit(""),
    )
    n_words = F.size(words).cast("long")
    total_wlen = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_hash = (F.length(c) - F.length(F.regexp_replace(c, r"#", ""))).cast(
        "long"
    )
    n_ellipsis = (
        (F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))) / 3
    ).cast("long")
    n_alpha = F.size(
        F.filter(words, lambda w: w.rlike("[a-zA-Z]"))
    ).cast("long")
    stop_arr = F.array(*[F.lit(w) for w in sorted(
        ("the", "be", "to", "of", "and", "that", "have", "with")
    )])
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(words, F.lower)), stop_arr
        )
    ).cast("long")
    lines = F.filter(F.split(c, "\n"), lambda x: x != F.lit(""))
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(
            lines,
            lambda x: F.trim(x).startswith("-")
            | F.trim(x).startswith("*")
            | F.trim(x).startswith("•"),
        )
    ).cast("long")
    n_ell_end = F.size(
        F.filter(lines, lambda x: F.trim(x).endswith("..."))
    ).cast("long")

    ok_word_count = (n_words >= 50) & (n_words <= 100_000)
    ok_mean_word_len = (total_wlen >= 3 * n_words) & (
        total_wlen <= 10 * n_words
    ) & (n_words > 0)
    ok_symbol_ratio = (10 * (n_hash + n_ellipsis) <= n_words) & (n_words > 0)
    ok_alpha_words = (5 * n_alpha >= 4 * n_words) & (n_words > 0)
    ok_stopwords = n_stop >= 2
    ok_bullet_lines = 10 * n_bullet <= 9 * n_lines
    ok_ellipsis_lines = 10 * n_ell_end <= 3 * n_lines
    flags = {
        "ok_word_count": ok_word_count,
        "ok_mean_word_len": ok_mean_word_len,
        "ok_symbol_ratio": ok_symbol_ratio,
        "ok_alpha_words": ok_alpha_words,
        "ok_stopwords": ok_stopwords,
        "ok_bullet_lines": ok_bullet_lines,
        "ok_ellipsis_lines": ok_ellipsis_lines,
    }
    passes = None
    for f in flags.values():
        passes = f if passes is None else (passes & f)
    return df.select(
        id_col,
        n_words.alias("n_words"),
        *[v.alias(k) for k, v in flags.items()],
        passes.alias("passes"),
    )


def gopher_oracle_sql(
    *, table: str = "documents", text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB SQL computing the identical Gopher flags (same word/
    line definitions, same cross-multiplied integer thresholds)."""
    return f"""
    WITH base AS (
        SELECT {id_col},
               COALESCE({text_col}, '') AS c,
               list_filter(string_split(regexp_replace(trim(
                   COALESCE({text_col}, '')), '\\s+', ' ', 'g'), ' '),
                   w -> w <> '') AS words,
               list_filter(string_split(COALESCE({text_col}, ''),
                                        chr(10)), x -> x <> '') AS lines
        FROM {table}
    ),
    m AS (
        SELECT {id_col},
               CAST(len(words) AS BIGINT) AS n_words,
               CAST(COALESCE(list_sum(list_transform(words,
                    w -> CAST(length(w) AS BIGINT))), 0) AS BIGINT)
                   AS total_wlen,
               CAST(length(c) - length(replace(c, '#', '')) AS BIGINT)
                   AS n_hash,
               CAST((length(c) - length(replace(c, '...', ''))) / 3
                    AS BIGINT) AS n_ellipsis,
               CAST(len(list_filter(words,
                    w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT)
                   AS n_alpha,
               CAST(len(list_intersect(
                        list_distinct(list_transform(words, w -> lower(w))),
                        ['and','be','have','of','that','the','to','with']))
                    AS BIGINT) AS n_stop,
               CAST(len(lines) AS BIGINT) AS n_lines,
               CAST(len(list_filter(lines, x ->
                        trim(x) LIKE '-%' OR trim(x) LIKE '*%'
                        OR trim(x) LIKE '•%')) AS BIGINT) AS n_bullet,
               CAST(len(list_filter(lines, x ->
                        trim(x) LIKE '%...')) AS BIGINT) AS n_ell_end
        FROM base
    )
    SELECT {id_col}, n_words,
           (n_words >= 50 AND n_words <= 100000) AS ok_word_count,
           (total_wlen >= 3 * n_words AND total_wlen <= 10 * n_words
            AND n_words > 0) AS ok_mean_word_len,
           (10 * (n_hash + n_ellipsis) <= n_words AND n_words > 0)
               AS ok_symbol_ratio,
           (5 * n_alpha >= 4 * n_words AND n_words > 0) AS ok_alpha_words,
           (n_stop >= 2) AS ok_stopwords,
           (10 * n_bullet <= 9 * n_lines) AS ok_bullet_lines,
           (10 * n_ell_end <= 3 * n_lines) AS ok_ellipsis_lines,
           ((n_words >= 50 AND n_words <= 100000)
            AND (total_wlen >= 3 * n_words AND total_wlen <= 10 * n_words
                 AND n_words > 0)
            AND (10 * (n_hash + n_ellipsis) <= n_words AND n_words > 0)
            AND (5 * n_alpha >= 4 * n_words AND n_words > 0)
            AND (n_stop >= 2)
            AND (10 * n_bullet <= 9 * n_lines)
            AND (10 * n_ell_end <= 3 * n_lines)) AS passes
    FROM m
    """


def ccnet_perplexity_buckets(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet-style head/middle/tail quality buckets (Wenzek et al.
    2020, "CCNet: Extracting High Quality Monolingual Datasets"):
    score every document with a PER-LANGUAGE unigram LM trained on
    the corpus itself (the in-container stand-in for CCNet's
    pretrained KenLM — same bucketing contract), then cut each
    language's score distribution at its tertiles. ``head`` is the
    best third (highest mean log-prob = lowest perplexity), exactly
    the slice the public pipelines keep first.

    Determinism: per-(lang, term) log-probs quantize to integer
    micro-nats before the per-doc BIGINT sum (E49 pattern); the
    per-doc mean uses explicit FLOOR division ``(s − mod_floor(s, n))
    / n`` so negative sums divide identically in every engine; the
    tertile cuts are nearest-rank order statistics (rank ⌈n/3⌉,
    ⌈2n/3⌉) over the per-language DISTINCT-score distribution, and
    boundary ties bucket downward — no row-level tie-break needed.

    Scale shape: one tokenize pass; the per-lang LM is a (lang,
    term) relation (vocab-sized, AQE-broadcast when small); the
    cumulative window for the cuts runs over DISTINCT scores per
    language; the corpus-sized relation only CASEs against the
    broadcast ≤|langs|-row cut table. Output: (id, lang, score_q,
    ppl_bucket) for every doc with ≥1 token and a non-null language.
    """
    from pyspark.sql import Window

    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    terms = (
        df.filter(F.col(lang_col).isNotNull())
        .select(
            id_col,
            F.col(lang_col).alias("_lang"),
            F.explode(F.split(norm, " ")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    vocab = terms.groupBy("_lang", "term").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    tot = vocab.groupBy("_lang").agg(F.sum("_c").cast("long").alias("_n"))
    lp = vocab.join(F.broadcast(tot), "_lang").select(
        "_lang",
        "term",
        F.floor(F.log(F.col("_c").cast("double") / F.col("_n")) * 1e6)
        .cast("long")
        .alias("_lq"),
    )
    scores = (
        terms.join(lp, ["_lang", "term"])
        .groupBy(id_col, "_lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_nt"),
            F.sum("_lq").cast("long").alias("_s"),
        )
        .select(
            id_col,
            "_lang",
            # portable floor division (negative sums round toward -inf
            # in Spark DIV and DuckDB // alike only via this identity)
            F.expr("(_s - (((_s % _nt) + _nt) % _nt)) DIV _nt")
            .cast("long")
            .alias("score_q"),
        )
        .persist()
    )
    dist = scores.groupBy("_lang", "score_q").agg(
        F.count(F.lit(1)).cast("long").alias("_cnt")
    )
    w = (
        Window.partitionBy("_lang")
        .orderBy("score_q")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = dist.withColumn("_cum", F.sum("_cnt").over(w))
    nl = dist.groupBy("_lang").agg(F.sum("_cnt").cast("long").alias("_nd"))
    cuts = (
        cum.join(F.broadcast(nl), "_lang")
        .groupBy("_lang")
        .agg(
            F.min(
                F.when(
                    F.col("_cum") >= F.expr("(_nd + 2) DIV 3"),
                    F.col("score_q"),
                )
            ).alias("_t1"),
            F.min(
                F.when(
                    F.col("_cum") >= F.expr("(2 * _nd + 2) DIV 3"),
                    F.col("score_q"),
                )
            ).alias("_t2"),
        )
    )
    return scores.join(F.broadcast(cuts), "_lang").select(
        id_col,
        F.col("_lang").alias("lang"),
        "score_q",
        F.when(F.col("score_q") <= F.col("_t1"), F.lit("tail"))
        .when(F.col("score_q") <= F.col("_t2"), F.lit("middle"))
        .otherwise(F.lit("head"))
        .alias("ppl_bucket"),
    )


def ccnet_oracle_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> str:
    """DuckDB SQL computing the identical CCNet buckets (same LM
    quantization, same floor-division mean, same tertile cuts)."""
    return f"""
    WITH terms AS (
        SELECT {id_col}, {lang_col} AS lang, t.term
        FROM {table},
             LATERAL (SELECT unnest(string_split(regexp_replace(lower(
                 trim({text_col})), '\\s+', ' ', 'g'), ' ')) AS term) t
        WHERE t.term <> '' AND {lang_col} IS NOT NULL
    ),
    vocab AS (
        SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS c
        FROM terms GROUP BY lang, term
    ),
    tot AS (
        SELECT lang, CAST(SUM(c) AS BIGINT) AS n FROM vocab GROUP BY lang
    ),
    lp AS (
        SELECT v.lang, v.term,
               CAST(floor(ln(CAST(v.c AS DOUBLE) / t.n) * 1e6) AS BIGINT)
                   AS lq
        FROM vocab v JOIN tot t USING (lang)
    ),
    scores AS (
        SELECT tm.{id_col}, tm.lang,
               CAST((s - (((s % nt) + nt) % nt)) // nt AS BIGINT) AS score_q
        FROM (
            SELECT tm.{id_col}, tm.lang,
                   CAST(COUNT(*) AS BIGINT) AS nt,
                   CAST(SUM(lp.lq) AS BIGINT) AS s
            FROM terms tm JOIN lp ON tm.lang = lp.lang
                                  AND tm.term = lp.term
            GROUP BY tm.{id_col}, tm.lang
        ) tm
    ),
    dist AS (
        SELECT lang, score_q, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM scores GROUP BY lang, score_q
    ),
    cum AS (
        SELECT lang, score_q, cnt,
               SUM(cnt) OVER (PARTITION BY lang ORDER BY score_q
                              ROWS UNBOUNDED PRECEDING) AS c,
               SUM(cnt) OVER (PARTITION BY lang) AS nd
        FROM dist
    ),
    cuts AS (
        SELECT lang,
               MIN(CASE WHEN c >= (nd + 2) // 3 THEN score_q END) AS t1,
               MIN(CASE WHEN c >= (2 * nd + 2) // 3 THEN score_q END) AS t2
        FROM cum GROUP BY lang
    )
    SELECT s.{id_col}, s.lang, s.score_q,
           CASE WHEN s.score_q <= c.t1 THEN 'tail'
                WHEN s.score_q <= c.t2 THEN 'middle'
                ELSE 'head' END AS ppl_bucket
    FROM scores s JOIN cuts c USING (lang)
    """


def trigram_backoff_scores(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_fraction: float = 0.5,
    lam: float = 0.4,
) -> DataFrame:
    """Stupid-backoff trigram LM scoring (Brants et al. 2007, "Large
    Language Models in Machine Translation" — the web-scale LM recipe
    public corpus pipelines actually run: no discounting, a fixed
    backoff penalty λ=0.4). The LM trains on a DETERMINISTIC md5
    half of the corpus (the E33 hash-split contract), so held-out
    docs genuinely exercise the backoff chain — scoring the corpus
    on itself would make every trigram "seen":

        S(w₃|w₁w₂) = c₃/c₂pre                 if c₃ > 0
                   = λ·c₂suf/c₁(w₂)           elif c₂suf > 0
                   = λ²·(c₁(w₃)+1)/(N+|V|)    otherwise (Laplace floor
                                              for unseen unigrams —
                                              raw stupid backoff is
                                              undefined there)

    Determinism: per-trigram scores quantize to micro-nat longs
    BEFORE the exact per-doc BIGINT sum (the E49/E189 contract);
    count ratios and the λ factors use identically-parenthesized
    IEEE double ops in both engines.

    Scale shape: one tokenize pass; n-grams build IN-ROW (no
    positional self-joins); all count relations are vocab-sized with
    map-side combine; the model joins run at the distinct-trigram
    grain, never per occurrence; smoothing totals ride a broadcast
    1-row aggregate. Output: one row per doc with ≥3 tokens —
    (id, n_trigrams, sum_lq, mean_logscore). Contract: the md5 train
    half must be non-empty (an all-holdout corpus has no LM — the
    unigram floor divides by zero); any real corpus satisfies this.
    """
    if not (0.0 < train_fraction < 1.0):
        raise ValueError("train_fraction must be in (0, 1)")
    if not (0.0 < lam < 1.0):
        raise ValueError("lam must be in (0, 1)")
    from aws_dms_cdc_data_pipeline_spark.operators.partitioning import (
        fan_out_scan,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.sampling import (
        hex_threshold,
    )

    bound = hex_threshold(train_fraction)
    base = fan_out_scan(df.select(id_col, text_col)).select(
        F.col(id_col),
        (
            F.md5(F.col(id_col).cast("string")).substr(1, 4)
            < F.lit(bound)
        ).alias("_tr"),
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
            lambda x: x != F.lit(""),
        ).alias("_toks"),
    ).persist()  # consumed by the unigram/bigram/trigram legs
    uni = base.select("_tr", F.explode("_toks").alias("w"))
    # c1 feeds three plan branches (stats, the w2 leg, the w3 leg)
    # and c2 two (prefix + suffix legs) — unpersisted, Spark re-runs
    # the explode+groupBy once per consumer (the documented
    # branch-recompute rule); plan-keyed persist-and-leave policy
    c1 = uni.filter(F.col("_tr")).groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("_c1")
    ).persist()
    stats = c1.agg(
        F.sum("_c1").cast("long").alias("_N"),
        F.count(F.lit(1)).cast("long").alias("_V"),
    )
    bi = (
        base.filter(F.size("_toks") >= 2)
        .select(
            "_tr",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(_toks) - 2), "
                    "i -> struct(_toks[i] AS w1, _toks[i + 1] AS w2))"
                )
            ).alias("_g"),
        )
        .select("_tr", F.col("_g.w1"), F.col("_g.w2"))
    )
    c2 = bi.filter(F.col("_tr")).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("_c2")
    ).persist()
    tri_rows = (
        base.filter(F.size("_toks") >= 3)
        .select(
            F.col(id_col),
            "_tr",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(_toks) - 3), "
                    "i -> struct(_toks[i] AS w1, _toks[i + 1] AS w2, "
                    "_toks[i + 2] AS w3))"
                )
            ).alias("_g"),
        )
        .select(F.col(id_col), "_tr",
                F.col("_g.w1"), F.col("_g.w2"), F.col("_g.w3"))
    ).persist()  # consumed by c3 and the per-doc instance counts
    c3 = tri_rows.filter(F.col("_tr")).groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).cast("long").alias("_c3")
    )
    tri = tri_rows.groupBy(id_col, "w1", "w2", "w3").agg(
        F.count(F.lit(1)).cast("long").alias("_cnt")
    )
    lam2 = float(lam) * float(lam)
    # The count legs join DIRECTLY onto the per-doc trigram relation
    # (grain (id, trigram), _cnt-aggregated — never per occurrence).
    # A separate distinct-trigram "model" relation paid an extra
    # distinct Exchange + its own broadcast build + one more join for
    # a grain only ~1.2× smaller; _sq is a deterministic function of
    # the trigram alone, so scoring at this grain is bit-identical
    # (measured 1.27 → 1.08 s at sf0.1, oracle PASS).
    model = (
        tri
        .join(c3, ["w1", "w2", "w3"], "left")
        .join(c2.withColumnRenamed("_c2", "_c2pre"), ["w1", "w2"], "left")
        .join(
            c2.select(
                F.col("w1").alias("w2"),
                F.col("w2").alias("w3"),
                F.col("_c2").alias("_c2suf"),
            ),
            ["w2", "w3"],
            "left",
        )
        .join(
            c1.select(F.col("w").alias("w2"), F.col("_c1").alias("_c1w2")),
            ["w2"], "left",
        )
        .join(
            c1.select(F.col("w").alias("w3"), F.col("_c1").alias("_c1w3")),
            ["w3"], "left",
        )
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col), "_cnt",
            F.floor(
                F.when(
                    F.col("_c3").isNotNull(),
                    F.log(F.col("_c3").cast("double")
                          / F.col("_c2pre").cast("double")),
                ).when(
                    F.col("_c2suf").isNotNull(),
                    F.log(F.lit(float(lam))
                          * (F.col("_c2suf").cast("double")
                             / F.col("_c1w2").cast("double"))),
                ).otherwise(
                    F.log(F.lit(lam2)
                          * ((F.coalesce(F.col("_c1w3"), F.lit(0))
                              .cast("double") + F.lit(1.0))
                             / (F.col("_N").cast("double")
                                + F.col("_V").cast("double"))))
                ) * F.lit(1e6)
            ).cast("long").alias("_sq"),
        )
    )
    return (
        model
        .groupBy(id_col)
        .agg(
            F.sum("_cnt").cast("long").alias("n_trigrams"),
            F.sum(F.col("_cnt") * F.col("_sq")).cast("long").alias("sum_lq"),
        )
        .withColumn(
            "mean_logscore",
            F.col("sum_lq").cast("double") / 1e6 / F.col("n_trigrams"),
        )
    )


def trigram_backoff_oracle_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    train_fraction: float = 0.5,
    lam: float = 0.4,
) -> str:
    """DuckDB SQL computing the identical stupid-backoff scores."""
    from aws_dms_cdc_data_pipeline_spark.operators.sampling import (
        hex_threshold,
    )

    bound = hex_threshold(train_fraction)
    lam2 = float(lam) * float(lam)
    return f"""
    WITH base AS (
        SELECT {id_col},
               substr(md5(CAST({id_col} AS VARCHAR)), 1, 4) < '{bound}'
                   AS tr,
               list_filter(string_split_regex(lower({text_col}),
                                              '[^a-z0-9]+'),
                           x -> x <> '') AS toks
        FROM {table}
    ),
    c1 AS (
        SELECT t.w, CAST(COUNT(*) AS BIGINT) AS c1
        FROM base, LATERAL (SELECT unnest(toks) AS w) t
        WHERE tr GROUP BY t.w
    ),
    stats AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS v
        FROM c1
    ),
    c2 AS (
        SELECT toks[g.i] AS w1, toks[g.i + 1] AS w2,
               CAST(COUNT(*) AS BIGINT) AS c2
        FROM base, LATERAL (
            SELECT unnest(generate_series(1, len(toks) - 1)) AS i) g
        WHERE tr AND len(toks) >= 2
        GROUP BY 1, 2
    ),
    tri_rows AS (
        SELECT {id_col}, tr,
               toks[g.i] AS w1, toks[g.i + 1] AS w2, toks[g.i + 2] AS w3
        FROM base, LATERAL (
            SELECT unnest(generate_series(1, len(toks) - 2)) AS i) g
        WHERE len(toks) >= 3
    ),
    c3 AS (
        SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS c3
        FROM tri_rows WHERE tr GROUP BY w1, w2, w3
    ),
    tri AS (
        SELECT {id_col}, w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM tri_rows GROUP BY {id_col}, w1, w2, w3
    ),
    model AS (
        SELECT d.w1, d.w2, d.w3,
               CAST(floor(
                   CASE
                     WHEN c3.c3 IS NOT NULL THEN
                       ln(CAST(c3.c3 AS DOUBLE)
                          / CAST(pre.c2 AS DOUBLE))
                     WHEN suf.c2 IS NOT NULL THEN
                       ln({lam!r} * (CAST(suf.c2 AS DOUBLE)
                                     / CAST(m2.c1 AS DOUBLE)))
                     ELSE
                       ln({lam2!r} * ((CAST(COALESCE(m3.c1, 0) AS DOUBLE)
                                       + 1.0)
                                      / (CAST(s.n AS DOUBLE)
                                         + CAST(s.v AS DOUBLE))))
                   END * 1e6) AS BIGINT) AS sq
        FROM (SELECT DISTINCT w1, w2, w3 FROM tri) d
        LEFT JOIN c3 ON c3.w1 = d.w1 AND c3.w2 = d.w2 AND c3.w3 = d.w3
        LEFT JOIN c2 pre ON pre.w1 = d.w1 AND pre.w2 = d.w2
        LEFT JOIN c2 suf ON suf.w1 = d.w2 AND suf.w2 = d.w3
        LEFT JOIN c1 m2 ON m2.w = d.w2
        LEFT JOIN c1 m3 ON m3.w = d.w3
        CROSS JOIN stats s
    )
    SELECT t.{id_col},
           CAST(SUM(t.cnt) AS BIGINT) AS n_trigrams,
           CAST(SUM(t.cnt * m.sq) AS BIGINT) AS sum_lq,
           CAST(SUM(t.cnt * m.sq) AS DOUBLE) / 1e6
               / CAST(SUM(t.cnt) AS BIGINT) AS mean_logscore
    FROM tri t JOIN model m ON m.w1 = t.w1 AND m.w2 = t.w2
                           AND m.w3 = t.w3
    GROUP BY t.{id_col}
    """


def char_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document character-level Shannon entropy — the
    compressibility quality signal (gibberish scores high, repeated
    boilerplate scores low; published pipelines cut both tails, the
    same role zlib-ratio plays where a codec is available).

    Determinism (the repo's micro-nat contract, see
    :func:`unigram_logprob`): per-character log-probabilities
    quantize to integer micro-nats (``floor(ln(k/n)·1e6)``) BEFORE
    the weighted sum, so the accumulation is pure BIGINT and the
    final entropy is one integer-ratio division. Whitespace
    normalizes to single spaces first (both backends see the same
    alphabet).

    Scale shape: entirely IN-ROW column algebra — no explode, no
    shuffle, whole-stage codegen end to end; per-row work is
    O(distinct_chars × len) with distinct_chars bounded by the
    alphabet. Documents with empty normalized text are excluded.

    Returns (id, n_chars_total, entropy_q, char_entropy) where
    ``entropy_q`` is the exact BIGINT −Σ k·floor(ln(k/n)·1e6) and
    ``char_entropy`` = entropy_q / n / 1e6 nats.
    """
    norm = F.regexp_replace(
        F.lower(F.trim(F.col(text_col))), r"\s+", " "
    )
    chars = F.filter(F.split(norm, ""), lambda x: x != F.lit(""))
    n = F.size(chars)
    dc = F.array_distinct(chars)
    counts = F.transform(
        dc, lambda c: F.size(F.filter(chars, lambda x: x == c))
    )
    lnq = F.transform(
        counts,
        lambda k: F.floor(
            F.log(k.cast("double") / n.cast("double")) * F.lit(1e6)
        ).cast("long"),
    )
    ent_q = -F.aggregate(
        F.zip_with(counts, lnq, lambda k, lq: k.cast("long") * lq),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        df.select(
            F.col(id_col),
            n.cast("long").alias("n_chars_total"),
            ent_q.alias("entropy_q"),
        )
        .filter(F.col("n_chars_total") > 0)
        .select(
            id_col,
            "n_chars_total",
            "entropy_q",
            (
                F.col("entropy_q").cast("double")
                / F.col("n_chars_total").cast("double") / F.lit(1e6)
            ).alias("char_entropy"),
        )
    )
