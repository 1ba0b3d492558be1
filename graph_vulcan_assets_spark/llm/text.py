"""Text analysis operators (X4/X5): token stats, search, quality scoring,
language distribution, fingerprinting.

Everything is built-in string/regex/array expressions — codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.functions.scalars import ascii_fold_lower_sql
from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import attach_scalar, load_table


@query(
    "q_text_stats",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           round(avg(CAST(len(string_split(text, ' ')) AS DOUBLE)), 4) AS avg_tokens,
           round(avg(CAST(n_chars AS DOUBLE)), 4) AS avg_chars,
           CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_tokens,
           CAST(min(n_chars) AS BIGINT) AS min_chars
    FROM documents GROUP BY lang
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics per language (X4): token counts + char stats."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(n_tokens.cast("double")), 4).alias("avg_tokens"),
        F.round(F.avg(F.col("n_chars").cast("double")), 4).alias("avg_chars"),
        F.max(n_tokens).cast("long").alias("max_tokens"),
        F.min("n_chars").cast("long").alias("min_chars"),
    )


@query(
    "q_text_search",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE text LIKE '%join%' AND regexp_matches(text, 'merge|window')
    """,
)
def q_text_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text search (X5): LIKE + regex predicate over the corpus."""
    d = load_table(spark, sf_dir, "documents")
    return d.where(
        F.col("text").like("%join%") & F.col("text").rlike("merge|window")
    ).select("doc_id", "lang", "n_chars")


@query(
    "q_text_quality",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS n_tokens,
             n_chars,
             CASE WHEN len(string_split(text, ' ')) = 0 THEN 0.0
                  ELSE CAST(n_chars AS DOUBLE) / len(string_split(text, ' '))
             END AS chars_per_token,
             CAST(len(text) - len(replace(text, 'the', ''))
                  AS DOUBLE) / 3 AS stopword_hits
      FROM documents)
    SELECT doc_id, lang,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           round(chars_per_token, 4) AS chars_per_token,
           CAST(stopword_hits AS BIGINT) AS stopword_hits,
           n_tokens >= 20 AND chars_per_token BETWEEN 2 AND 12 AS passes_quality
    FROM scored
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring (X4 extension): length / density / stopword heuristics.

    The standard pre-training quality gate shape: cheap per-document
    features plus a boolean pass/fail — all scans, no shuffle at all.
    """
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    chars_per_token = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        F.col("n_chars").cast("double") / n_tokens
    )
    stopword_hits = (
        (F.length("text") - F.length(F.expr("replace(text, 'the', '')"))) / 3
    ).cast("long")
    return d.select(
        "doc_id",
        "lang",
        n_tokens.cast("long").alias("n_tokens"),
        F.round(chars_per_token, 4).alias("chars_per_token"),
        stopword_hits.alias("stopword_hits"),
        ((n_tokens >= 20) & chars_per_token.between(2, 12)).alias("passes_quality"),
    )


@query(
    "q_text_lang_dist",
    oracle="""
    SELECT lang, source, count(*) AS n,
           round(100.0 * count(*) / sum(count(*)) OVER (PARTITION BY source), 4)
             AS pct_of_source
    FROM documents GROUP BY lang, source
    """,
)
def q_text_lang_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language distribution per source (X4): agg + window over agg."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    agg = d.groupBy("lang", "source").agg(F.count("*").alias("n"))
    w = Window.partitionBy("source")
    return agg.select(
        "lang",
        "source",
        "n",
        F.round(100.0 * F.col("n") / F.sum("n").over(w), 4).alias("pct_of_source"),
    )


_STOPWORDS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "que"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "zh": ["de", "shi", "le"],
}


def _lang_scores(tokens):
    """Stopword-hit scores + argmax prediction — THE classifier expression,
    shared by q_lang_id (the predictor) and q_lang_confusion (its eval):
    a change to the scoring logic must reach both, or the confusion
    matrix silently evaluates a stale classifier."""

    def hits(words):
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))

    en, es = hits(_STOPWORDS["en"]), hits(_STOPWORDS["es"])
    predicted = F.when(en > es, "en").when(es > en, "es").otherwise("unknown")
    return en, es, predicted


@query(
    "q_lang_id",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             len(list_filter(string_split(text, ' '),
                 t -> t IN ('the', 'and', 'of'))) AS en_hits,
             len(list_filter(string_split(text, ' '),
                 t -> t IN ('el', 'la', 'que'))) AS es_hits
      FROM documents)
    SELECT doc_id, lang,
           CAST(en_hits AS BIGINT) AS en_hits,
           CAST(es_hits AS BIGINT) AS es_hits,
           CASE WHEN en_hits > es_hits THEN 'en'
                WHEN es_hits > en_hits THEN 'es'
                ELSE 'unknown' END AS lang_guess
    FROM scored
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language identification heuristic (X4): stopword-hit voting.

    The classic cheap lang-ID: count hits against per-language stopword
    lists, argmax wins. All higher-order array functions — JVM-side,
    linear scan, no shuffle. (Scoped to en/es here so the oracle stays
    readable; the pattern extends to any list of languages.)
    """
    d = load_table(spark, sf_dir, "documents")
    en, es, predicted = _lang_scores(F.split(F.col("text"), " "))
    return d.select(
        "doc_id",
        "lang",
        en.cast("long").alias("en_hits"),
        es.cast("long").alias("es_hits"),
        predicted.alias("lang_guess"),
    )


@query(
    "q_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))
                AS BIGINT) AS n_bpe_ish,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_whitespace,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_chars_div4
    FROM documents
    """,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (X4): whitespace + BPE-ish regex + chars/4 estimate.

    The three standard cheap token-count estimators used for corpus
    budgeting; the regex mirrors pre-tokenizer splitting (letter runs,
    digit runs, single punctuation)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), F.lit(0)))
        .cast("long")
        .alias("n_bpe_ish"),
        F.size(F.split("text", " ")).cast("long").alias("n_whitespace"),
        F.ceil(F.length("text") / 4.0).cast("long").alias("n_chars_div4"),
    )


@query(
    "q_text_fingerprint",
    # f-string oracle (ADVICE r10): the fold interpolates
    # ascii_fold_lower_sql so query and oracle derive from one definition
    oracle=f"""
    SELECT doc_id,
           -- ASCII fold, not lower() (round-10 case-mapping probe):
           -- Java's full Unicode case mapping and utf8proc's simple
           -- mapping diverge on ß/ligatures/İ/final-sigma, which would
           -- silently split this md5 one multilingual document at a
           -- time. translate('A-Z'->'a-z') is identical on both engines
           -- for EVERY input; non-ASCII chars hash verbatim — the
           -- fingerprint stays DEFINED on multilingual corpora instead
           -- of NULLing them (functions/scalars.py ascii_fold_lower).
           -- trim(text, ' '), not trim(text) (round-10 probe): DuckDB's
           -- 1-arg trim strips Unicode Zs spaces (NBSP, thin/figure
           -- space, U+3000) while Spark's strips ASCII 0x20 only — an
           -- NBSP-edged document would silently split this md5. The
           -- explicit-char form matches Spark exactly on every input.
           md5({ascii_fold_lower_sql("trim(text, ' ')")}) AS fingerprint,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (X4): canonicalize + hash.

    MD5 of the canonicalized text — both engines implement RFC-1321 MD5 so
    the digests match exactly; the canonical form (ASCII-fold + trim) is
    where dedup pipelines normalize whitespace/case. Round 10: the fold
    is translate-based, not lower() — full-vs-simple Unicode case
    mapping diverges between the engines (ß/ligatures/İ/final-sigma),
    and a fingerprint must stay defined AND cross-engine deterministic
    on multilingual text; non-ASCII chars hash verbatim.
    """
    from graph_vulcan_assets_spark.functions.scalars import ascii_fold_lower

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(ascii_fold_lower(F.trim(F.col("text")))).alias("fingerprint"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )


@query(
    "q_text_tfidf",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, term, tf, df,
             round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n)
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           tfidf, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
          FROM scored)
    WHERE rnk <= 3
    """,
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (X4): the classic keyword extractor.

    Plan: explode tokens → groupBy (doc_id, term) [one shuffle carrying
    token pairs] → term document-frequency [tiny: vocabulary-sized] joined
    back → per-doc top-k window. The idf factor is computed from exact
    integer counts through one deterministic double expression, so both
    engines produce bit-identical scores (no float summation anywhere).
    At 100 TB the df table is vocabulary-sized (≪ corpus) and the window
    is partitioned by doc_id — no global sort, no hot partition.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    scored = (
        attach_scalar(tf.join(df_, "term"), n, "n_docs")
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
                    + 1.0
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            "tfidf",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


@query(
    "q_text_repetition",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
    g AS (
      SELECT doc_id, lang,
             list_transform(range(len(t) - 2),
               i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]) AS gs
      FROM toks WHERE len(t) >= 3)
    SELECT doc_id, lang,
           CAST(len(gs) AS BIGINT) AS n_grams,
           CAST(len(list_distinct(gs)) AS BIGINT) AS n_distinct,
           round(1.0 - CAST(len(list_distinct(gs)) AS DOUBLE) / len(gs), 6)
             AS rep_ratio
    FROM g
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition (X4): duplicate 3-gram fraction.

    The standard boilerplate/repetition signal from pre-training quality
    gates (high ratio = templated or looping text). Per-document array
    expressions only — no explode, no shuffle; the corpus streams through
    a single map stage.
    """
    from graph_vulcan_assets_spark.llm.dedup import token_shingles

    d = load_table(spark, sf_dir, "documents")
    toks = F.col("t")
    grams = token_shingles(toks, 3, distinct=False)
    g = (
        d.select("doc_id", "lang", F.split("text", " ").alias("t"))
        .where(F.size(toks) >= 3)
        .select("doc_id", "lang", grams.alias("gs"))
    )
    n = F.size("gs")
    nd = F.size(F.array_distinct("gs"))
    return g.select(
        "doc_id",
        "lang",
        n.cast("long").alias("n_grams"),
        nd.cast("long").alias("n_distinct"),
        F.round(1.0 - nd.cast("double") / n, 6).alias("rep_ratio"),
    )


@query(
    "q_text_lm_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(len(t) - 1),
               i -> t[i+1] || chr(31) || t[i+2])) AS bigram
      FROM toks WHERE len(t) >= 2),
    c12 AS (SELECT bigram, count(*) AS c12 FROM bg GROUP BY bigram),
    c1 AS (
      SELECT string_split(bigram, chr(31))[1] AS w1, sum(c12) AS c1
      FROM c12 GROUP BY w1),
    model AS (
      SELECT bigram,
             CAST(round(CAST(c12 AS DOUBLE) / c1 * 1000000, 0) AS BIGINT)
               AS p_micros
      FROM c12 JOIN c1 ON string_split(bigram, chr(31))[1] = w1)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(round(CAST(sum(p_micros) AS DOUBLE) / count(*), 0) AS BIGINT)
             AS lm_score_micros
    FROM bg JOIN model USING (bigram)
    GROUP BY doc_id
    """,
)
def q_text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram LM fluency score per document (X4 family).

    The KenLM-style quality signal from pre-training pipelines (CCNet et
    al.), restated in exact integer arithmetic: train bigram conditional
    probabilities P(w2|w1) = c(w1,w2)/c(w1,*) on the corpus itself, then
    score each document by its mean conditional probability. Low scores
    flag disfluent / gibberish / boilerplate text.

    Determinism: each probability is one double division of two exact
    integer counts (IEEE-identical in both engines), quantized to integer
    micros BEFORE the per-document sum — so the aggregate is an exact
    BIGINT sum, order-independent — and the mean is emitted as INTEGER
    micros (one division + round-to-integer). No float column in the
    output at all: round(x, 6) on a double diverges between engines at
    representational half-boundaries (Java BigDecimal.valueOf shortest
    repr vs exact-binary rounding — observed at sf0.01), round(x, 0)
    does not.

    Scale shape: the model table is vocabulary-pair-sized (≪ corpus, the
    shuffle carries (bigram, count) pairs, 8-byte counts); scoring is one
    equi-join of exploded doc bigrams against the model on the bigram
    string, then a per-doc aggregate — both shuffles key on high-cardinality
    uniform keys. The corpus never moves: only bigram tokens do.
    """
    d = load_table(spark, sf_dir, "documents")
    SEP = "\x1f"
    t = F.split("text", " ")
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size(F.col("t")) - 2),
        lambda i: F.concat_ws(SEP, F.element_at(F.col("t"), i + 1), F.element_at(F.col("t"), i + 2)),
    )
    bg = (
        d.select("doc_id", t.alias("t"))
        .where(F.size(F.col("t")) >= 2)
        .select("doc_id", F.explode(bigrams).alias("bigram"))
    )
    c12 = bg.groupBy("bigram").agg(F.count("*").alias("c12"))
    c1 = (
        c12.withColumn("w1", F.split("bigram", SEP)[0])
        .groupBy("w1")
        .agg(F.sum("c12").alias("c1"))
    )
    model = (
        c12.withColumn("w1", F.split("bigram", SEP)[0])
        .join(c1, "w1")
        .select(
            "bigram",
            F.round(F.col("c12").cast("double") / F.col("c1") * 1000000, 0)
            .cast("long")
            .alias("p_micros"),
        )
    )
    return (
        bg.join(model, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(F.sum("p_micros").cast("double") / F.count("*"), 0)
            .cast("long")
            .alias("lm_score_micros"),
        )
    )


@query(
    "q_vocab_topn",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
      FROM documents)
    SELECT token, CAST(count(*) AS BIGINT) AS df
    FROM tok GROUP BY token
    ORDER BY df DESC, token
    LIMIT 50
    """,
)
def q_vocab_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary construction (X4 completion): top-50 tokens by DOCUMENT
    frequency with deterministic ties (df desc, token asc) — the
    stopword/vocab-seed discovery step a tokenizer build starts from.

    Scale shape: per-document distinct-token explode (array_distinct runs
    inside codegen before the explode, so a token repeated 1000x in one
    doc contributes one row), partial-aggregated count per token, then a
    global top-50 via TakeOrderedAndProject — per-partition top-k pruning,
    never a single-partition sort of the full vocabulary.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(F.array_distinct(F.split("text", " "))).alias("token")
    )
    return (
        tok.groupBy("token")
        .agg(F.count("*").cast("long").alias("df"))
        .orderBy(F.col("df").desc(), F.col("token"))
        .limit(50)
    )


@query(
    "q_text_search_indexed",
    oracle="""
    WITH posts AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
      FROM documents)
    SELECT doc_id, CAST(3 AS BIGINT) AS n_terms_matched
    FROM posts WHERE token IN ('dup', 'merge', 'scan')
    GROUP BY doc_id HAVING count(*) = 3
    """,
)
def q_text_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index AND search (X5 completion): documents containing ALL
    of {dup, merge, scan}, answered from token POSTINGS instead of a
    regex scan over raw text.

    q_text_search is the scan form (rlike over every byte of every
    document — at 100 TB a full-corpus read per query). The indexed form
    is the scale path: distinct (token, doc) postings, the token
    IN-filter discarding every non-query-term posting inside the explode
    stage (before anything shuffles), and the AND as count(matched
    terms) = 3 — one partial-aggregated shuffle on doc_id. In production
    the postings are a MATERIALIZED token-bucketed table, so the filter
    becomes real partition pruning and the corpus text is never re-read;
    this query is the build + probe fused (the build cost is the one-time
    indexing pass).
    """
    d = load_table(spark, sf_dir, "documents")
    posts = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("token"),
    )
    return (
        posts.where(F.col("token").isin("dup", "merge", "scan"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("k"))
        .where(F.col("k") == 3)
        .select("doc_id", F.lit(3).cast("long").alias("n_terms_matched"))
    )


# Okapi parameters, interpolated into BOTH the Spark expression and the
# oracle SQL (f-string) so tuning the constant actually changes the score
# on both sides. k1+1 and 1-b are exact in IEEE doubles for these values.
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TERMS = ("dup", "merge", "scan")


@query(
    "q_text_bm25",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
      FROM dl),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
           WHERE token IN ('dup', 'merge', 'scan') GROUP BY doc_id, token),
    df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    scored AS (
      SELECT tf.doc_id,
             CAST(round(
               ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                        / (CAST(df AS DOUBLE) + 0.5))
               * ((CAST(tf AS DOUBLE) * {_BM25_K1 + 1.0})
                  / (CAST(tf AS DOUBLE)
                     + {_BM25_K1} * ({1.0 - _BM25_B}
                                     + ({_BM25_B} * CAST(dl AS DOUBLE)) / avgdl)))
               * 1000000.0, 0) AS BIGINT) AS s_micros
      FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats)
    SELECT doc_id,
           CAST(sum(s_micros) AS BIGINT) AS bm25_micros,
           count(*) AS n_terms
    FROM scored GROUP BY doc_id
    """,
)
def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (X5 completion): Okapi scores for the fixed
    3-term query over token postings.

    The ranking layer on top of q_text_search_indexed's boolean AND: the
    same postings shape (explode, IN-filter before anything shuffles, one
    doc_id-keyed aggregate), plus the two BM25 statistics — df per query
    term (3 rows) and (n_docs, avgdl) (1 row) — both broadcast. At 100 TB
    the postings and doc-length tables are the materialized index;
    per-query cost is then proportional to the query terms' postings
    lists, never the corpus.

    Determinism: every input to the per-(doc, term) score is an exact
    integer (tf, df, dl, n_docs) or an exact ratio of BIGINT sums
    (avgdl), the score expression is structurally identical in both
    engines (IEEE ops on identical operands), and the only SUMMED float
    is pre-rounded to integer micros — so the driver hash-compare is
    exact at any partition count, the same discipline as q_text_lm_score.
    k1=1.2, b=0.75; idf is the Lucene-style ln(1 + (N - df + 0.5)/(df + 0.5)).
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*").cast("double")).alias("avgdl"),
    )
    tf = (
        tok.where(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    tfd = F.col("tf").cast("double")
    dfd = F.col("df").cast("double")
    dld = F.col("dl").cast("double")
    ndd = F.col("n_docs").cast("double")
    score = (
        F.log(1.0 + (ndd - dfd + 0.5) / (dfd + 0.5))
        * (
            (tfd * (_BM25_K1 + 1.0))
            / (tfd + _BM25_K1 * ((1.0 - _BM25_B) + (_BM25_B * dld) / F.col("avgdl")))
        )
        * 1000000.0
    )
    scored = (
        attach_scalar(
            tf.join(F.broadcast(df_), "token").join(dl, "doc_id"),
            stats.select(F.struct("n_docs", "avgdl").alias("s")),
            "__s",
        )
        .withColumn("n_docs", F.col("__s.n_docs"))
        .withColumn("avgdl", F.col("__s.avgdl"))
        .select("doc_id", F.round(score, 0).cast("long").alias("s_micros"))
    )
    return scored.groupBy("doc_id").agg(
        F.sum("s_micros").cast("long").alias("bm25_micros"),
        F.count("*").alias("n_terms"),
    )


@query(
    "q_lang_confusion",
    oracle="""
    WITH scored AS (
      SELECT lang,
             len(list_filter(string_split(text, ' '),
                 t -> t IN ('the', 'and', 'of'))) AS en_hits,
             len(list_filter(string_split(text, ' '),
                 t -> t IN ('el', 'la', 'que'))) AS es_hits
      FROM documents),
    labeled AS (
      SELECT lang AS declared,
             CASE WHEN en_hits > es_hits THEN 'en'
                  WHEN es_hits > en_hits THEN 'es'
                  ELSE 'unknown' END AS predicted
      FROM scored)
    SELECT declared, predicted, count(*) AS n_docs
    FROM labeled GROUP BY declared, predicted
    """,
)
def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation (X4 extension): confusion matrix of the
    stopword lang-ID against the table's declared language labels.

    The eval loop every heuristic filter needs before it gates a corpus:
    run the predictor, cross-tabulate against labels, read the diagonal.
    One map-side scoring pass (q_lang_id's expressions) + one tiny
    (declared, predicted) aggregate — the confusion matrix is
    languages²-sized no matter the corpus size. Exact counts, oracle
    bit-for-bit.
    """
    d = load_table(spark, sf_dir, "documents")
    _, _, predicted = _lang_scores(F.split(F.col("text"), " "))
    return (
        d.select(F.col("lang").alias("declared"), predicted.alias("predicted"))
        .groupBy("declared", "predicted")
        .agg(F.count("*").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Positional phrase search (X5 completion: ordered-adjacency form)
# ---------------------------------------------------------------------------


def phrase_search(docs: DataFrame, terms: list[str]) -> DataFrame:
    """(doc_id, n_occurrences) of the exact token phrase ``terms``.

    Positional postings form: posexplode the tokens, keep ONLY postings
    for the phrase's terms (the IN-filter runs inside the explode stage,
    before anything shuffles), normalize each term's position by its
    phrase offset, and equi-join — a phrase occurrence at position p is
    one (doc_id, p) key present in every term's postings. n-1 shuffle
    joins on (doc_id, pos), no window, no regex scan of raw text.

    In production the positional postings are a materialized index table;
    this operator fuses build + probe the same way q_text_search_indexed
    does for the unordered AND form.
    """
    if len(terms) < 2:
        raise ValueError("phrase needs >= 2 terms")
    posts = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    ).where(F.col("token").isin(list(set(terms))))
    joined = None
    for i, t in enumerate(terms):
        part = posts.where(F.col("token") == t).select(
            "doc_id", (F.col("pos") - i).alias("p0")
        )
        joined = part if joined is None else joined.join(part, ["doc_id", "p0"])
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )


@query(
    "q_text_search_phrase",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    posts AS (
      SELECT doc_id,
             unnest(range(1, len(t) + 1)) AS pos,
             unnest(t) AS token
      FROM toks),
    a AS (SELECT doc_id, pos FROM posts WHERE token = 'order'),
    b AS (SELECT doc_id, pos - 1 AS pos FROM posts WHERE token = 'fast')
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM a JOIN b USING (doc_id, pos)
    GROUP BY doc_id
    """,
)
def q_text_search_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase search for "order fast" over positional postings.

    The phrase is chosen from the synthetic corpus' frequent bigrams so
    the adjacency join is provably exercised at every SF (vacuity lesson
    from round-2 ADVICE on q_join_asof_tolerance)."""
    d = load_table(spark, sf_dir, "documents")
    return phrase_search(d, ["order", "fast"])
