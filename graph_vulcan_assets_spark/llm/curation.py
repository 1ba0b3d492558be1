"""Training-data curation operators (SURVEY §2.11 extension): deterministic
split assignment, stratified sampling, corpus mixing, benchmark
decontamination, and sequence packing.

These are the dataset-assembly steps that sit between the cleaning/dedup
stages (llm/dedup.py, llm/text.py) and a training run. Everything is
hash-deterministic — two engines (or two cluster runs) produce identical
assignments — and shuffle-aware: sampling and splitting are stateless
map-only scans; packing windows are sharded so no single task sees the
whole corpus; the decontamination join broadcasts the (small) eval side.

No counterpart exists in the reference (a streaming asset-inventory ETL —
cmd/graph-vulcan-assets/main.go); these extend the engine toward the
LLM-pipeline surface the brief calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.functions.scalars import (
    ascii_fold_lower,
    ascii_fold_lower_sql,
)
from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import attach_scalar, load_table

# MD5 is the cross-engine deterministic hash (both Spark and DuckDB are
# RFC-1321 compliant, so hex digests compare identically). The hex digest
# is uniform, so comparing its prefix against a hex threshold implements
# "keep with probability p" deterministically: p = threshold / 256 when
# thresholding the first two hex chars.
def _fingerprint(col):
    return F.md5(col.cast("string"))


def assign_split(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Append (bucket, split) columns derived ONLY from the row's key hash.

    Because the assignment is a pure row-local function, it is invariant
    under corpus growth/shrinkage: adding or removing other documents never
    reassigns an existing one (tested in tests/test_curation.py)."""
    fp = _fingerprint(F.col(key_col))
    return df.withColumn("bucket", F.substring(fp, 1, 2)).withColumn(
        "split",
        F.when(fp < "e6", "train").when(fp < "f6", "validation").otherwise("test"),
    )


@query(
    "q_split_train_test",
    oracle="""
    WITH h AS (
      SELECT doc_id, lang, source, md5(CAST(doc_id AS VARCHAR)) AS fp
      FROM documents)
    SELECT doc_id, lang, source,
           substr(fp, 1, 2) AS bucket,
           CASE WHEN fp < 'e6' THEN 'train'
                WHEN fp < 'f6' THEN 'validation'
                ELSE 'test' END AS split
    FROM h
    """,
)
def q_split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/validation/test split by content-key hash.

    The split is a pure function of the stable document key — no RNG, no
    state, no shuffle: adding documents never reassigns existing ones, and
    every engine computes the same assignment. Thresholds are hex-string
    prefixes of the uniform MD5 digest ('e6'/'f6' ≈ 90/6/4%). Map-only:
    survives any scale trivially.
    """
    d = load_table(spark, sf_dir, "documents")
    return assign_split(d).select("doc_id", "lang", "source", "bucket", "split")


@query(
    "q_sample_stratified",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn,
             count(*) OVER (PARTITION BY lang) AS n_lang
      FROM documents)
    SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn, CAST(n_lang AS BIGINT) AS n_lang
    FROM ranked
    WHERE rn <= ceil(0.1 * n_lang)
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size stratified sample: first ceil(10%) of each language by hash
    rank.

    Unlike Bernoulli sampling (``df.sample``/``sampleBy``), ranking the
    stratum by a content hash gives an exact per-stratum size AND
    determinism across runs/engines. One shuffle on the stratum key; the
    rank window never sees more than a stratum per task. For strata too
    large for a single partition's sort, the hash-threshold form
    (q_corpus_mix) is the constant-memory fallback.
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(_fingerprint(F.col("doc_id")), "doc_id")
    wc = Window.partitionBy("lang")
    ranked = d.select(
        "doc_id",
        "lang",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count("*").over(wc).cast("long").alias("n_lang"),
    )
    return ranked.where(F.col("rn") <= F.ceil(0.1 * F.col("n_lang")))


@query(
    "q_corpus_mix",
    oracle="""
    WITH rated AS (
      SELECT doc_id, lang, source,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS p
      FROM documents)
    SELECT doc_id, lang, source,
           CAST(CASE WHEN lang = 'en' THEN 1.0
                     WHEN lang IN ('de', 'fr') THEN 0.5
                     ELSE 0.25 END AS DOUBLE) AS mix_rate
    FROM rated
    WHERE lang = 'en'
       OR (lang IN ('de', 'fr') AND p < '80')
       OR (lang NOT IN ('en', 'de', 'fr') AND p < '40')
    """,
)
def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixing: down-sample strata to target rates by hash
    threshold.

    The standard pre-training mixture step (e.g. up-weight English, down-
    weight others) as a stateless filter: keep a row iff its hash prefix
    falls below the stratum's rate threshold. Constant memory, map-only,
    no shuffle — the scale path when strata are too big to rank
    (cf. q_sample_stratified). Rates: en 1.0, de/fr 0.5, rest 0.25 —
    EXACT bucket fractions (strict '<' over the 256 two-hex-digit
    prefixes keeps 128/256 and 64/256; an inclusive '<=' would keep
    129/256 and 65/256, silently disagreeing with the emitted mix_rate
    any loss-reweighting consumer divides by).
    """
    d = load_table(spark, sf_dir, "documents")
    mix_rate = (
        F.when(F.col("lang") == "en", F.lit(1.0))
        .when(F.col("lang").isin("de", "fr"), F.lit(0.5))
        .otherwise(F.lit(0.25))
    )
    p = F.substring(_fingerprint(F.col("doc_id")), 1, 2)
    keep = (
        F.when(F.col("lang") == "en", F.lit(True))
        .when(F.col("lang").isin("de", "fr"), p < "80")
        .otherwise(p < "40")
    )
    return d.where(keep).select("doc_id", "lang", "source", mix_rate.alias("mix_rate"))


@query(
    "q_decontaminate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(len(t) - 4),
               i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                    || ' ' || t[i+4] || ' ' || t[i+5]))) AS s
      FROM toks WHERE len(t) >= 5),
    ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 19 = 0),
    tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 19 <> 0)
    SELECT tr.doc_id AS doc_id,
           CAST(count(*) AS BIGINT) AS n_overlap
    FROM tr JOIN ev USING (s)
    GROUP BY tr.doc_id
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing 5-gram shingles
    with a held-out eval set.

    The eval set (doc_id % 19 = 0 here; in production, the benchmark
    corpus) contributes its distinct 5-grams; training docs joining any of
    them are contaminated, scored by overlapping-shingle count. The join is
    a broadcast of the eval shingle set — eval benchmarks are tiny next to
    a 100 TB corpus, so the training side streams map-side with no shuffle.
    If the eval side ever outgrew broadcast, the same plan shuffles on the
    shingle hash (cf. minhash_signatures' hash-narrowing trick in
    llm/dedup.py for keeping the shuffle width at 8 bytes).

    Non-vacuous at sf0.01: the planted near-duplicate documents put 4
    contaminated docs / ~180 overlap hits in the answer.
    """
    d = load_table(spark, sf_dir, "documents")
    # the shared shingle pipeline (_shingle5) — the exact and Bloom
    # decontamination paths must flag the SAME shingle universe, so
    # neither re-implements the gram definition
    shingled = _shingle5(d)
    ev = shingled.where(F.col("doc_id") % 19 == 0).select("s").distinct()
    tr = shingled.where(F.col("doc_id") % 19 != 0)
    return (
        tr.join(F.broadcast(ev), "s")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_overlap"))
    )


# Token budget per packed training sequence. Small relative to the ~54-token
# synthetic docs so packs are plentiful at every test SF; at real scale this
# is the model context length (2k/8k/...).
_PACK_BUDGET = 512


@query(
    "q_pack_sequences",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
             md5(CAST(doc_id AS VARCHAR)) AS fp,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents),
    placed AS (
      SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
             sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY fp, doc_id
               ROWS UNBOUNDED PRECEDING) - n_tokens AS start_tok
      FROM sized)
    SELECT doc_id, shard, n_tokens,
           CAST(floor(start_tok / {_PACK_BUDGET}) AS BIGINT) AS pack_no,
           CAST(start_tok % {_PACK_BUDGET} AS BIGINT) AS pack_offset
    FROM placed
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: shuffle documents deterministically, then greedily
    fill fixed token-budget packs.

    The training-batch assembly step: order documents by content hash
    (= deterministic global shuffle), run a per-shard cumulative token
    count, and assign each document to pack floor(start/budget) with its
    offset inside the pack. Sharding by the hash's first nibble keeps each
    running-sum window to 1/16th of the corpus — no global sort, no
    single-task bottleneck; widen the shard prefix for bigger corpora.
    Documents may straddle a pack boundary (standard concat-then-chunk
    packing); the (pack_no, pack_offset) pair is exactly what a loader
    needs to slice them.
    """
    d = load_table(spark, sf_dir, "documents")
    fp = _fingerprint(F.col("doc_id"))
    sized = d.select(
        "doc_id",
        F.substring(fp, 1, 1).alias("shard"),
        fp.alias("fp"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("fp", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = sized.select(
        "doc_id",
        "shard",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_tok"),
    )
    return placed.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(F.col("start_tok") / _PACK_BUDGET).cast("long").alias("pack_no"),
        (F.col("start_tok") % _PACK_BUDGET).cast("long").alias("pack_offset"),
    )


# Shared PII regexes — restricted to the syntax subset Java regex (Spark)
# and RE2 (DuckDB) interpret identically: character classes, bounded
# repetition, alternation. No lookaround, no backreferences.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IP_RE = r"([0-9]{1,3}\.){3}[0-9]{1,3}"
_LONGNUM_RE = r"[0-9]{13,19}"


@query(
    "q_pii_redact",
    oracle=f"""
    WITH raw AS (
      -- translate fold, not lower() (round-10 case-mapping probe): the
      -- synthesized email local-part feeds an md5, and Java-vs-utf8proc
      -- case mapping diverges on ß/ligatures/İ/final-sigma names; the
      -- ASCII fold is identical on both engines for every input
      -- (functions/scalars.py ascii_fold_lower)
      SELECT c_custkey,
             'contact ' || c_name || ' <' ||
             {ascii_fold_lower_sql("replace(c_name, '#', '.')")} ||
             '@example.com> ip 10.' || CAST(c_custkey % 240 AS VARCHAR) || '.' ||
             CAST(c_custkey % 250 AS VARCHAR) || '.' ||
             CAST(c_custkey % 100 AS VARCHAR) || ' card ' ||
             CAST(4111111111111000 + c_custkey % 1000 AS VARCHAR) AS t
      FROM customer)
    SELECT c_custkey,
           CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_IP_RE}')) AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(t, '{_LONGNUM_RE}')) AS BIGINT) AS n_longnums,
           md5(regexp_replace(regexp_replace(regexp_replace(
               t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                  '{_IP_RE}', '<IP>', 'g'),
                  '{_LONGNUM_RE}', '<NUM>', 'g')) AS redacted_md5
    FROM raw
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (curation): regex-scrub emails, IPv4s, long digit runs.

    The documents corpus is synthetic word-soup with no PII, so the input
    text is synthesized deterministically from customer rows (name-derived
    email, key-derived IP and card number) — the redaction logic is then
    genuinely exercised: every row contains all three PII classes, and the
    md5 of the redacted text proves byte-identical scrubbing across
    engines. Map-only scan: zero shuffles, redaction happens inside one
    codegen stage. Redaction order matters (email first — its local part
    contains digit runs; then IPs; then bare long numbers).
    """
    c = load_table(spark, sf_dir, "customer")
    t = F.concat(
        F.lit("contact "),
        F.col("c_name"),
        F.lit(" <"),
        # translate fold, not lower() — see the oracle comment
        ascii_fold_lower(F.replace(F.col("c_name"), F.lit("#"), F.lit("."))),
        F.lit("@example.com> ip 10."),
        (F.col("c_custkey") % 240).cast("string"),
        F.lit("."),
        (F.col("c_custkey") % 250).cast("string"),
        F.lit("."),
        (F.col("c_custkey") % 100).cast("string"),
        F.lit(" card "),
        (F.lit(4111111111111000) + F.col("c_custkey") % 1000).cast("string"),
    )
    raw = c.select("c_custkey", t.alias("t"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>"),
            _IP_RE,
            "<IP>",
        ),
        _LONGNUM_RE,
        "<NUM>",
    )
    return raw.select(
        "c_custkey",
        F.size(F.regexp_extract_all("t", F.lit(_EMAIL_RE), F.lit(0))).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(_IP_RE), F.lit(0))).cast("long").alias("n_ips"),
        F.size(F.regexp_extract_all("t", F.lit(_LONGNUM_RE), F.lit(0))).cast("long").alias("n_longnums"),
        F.md5(redacted).alias("redacted_md5"),
    )


@query(
    "q_chunk_documents",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    chunks AS (
      SELECT doc_id,
             i // 50 AS chunk_idx,
             t[i + 1 : i + 60] AS chunk
      FROM toks, unnest(range(0, len(t), 50)) AS u(i))
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
           md5(array_to_string(chunk, ' ')) AS chunk_md5
    FROM chunks
    """,
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget document chunking with overlap: 60-token windows every
    50 tokens (10-token overlap) — the pretraining/RAG preprocessing step
    between cleaning and packing.

    Map-only: chunk starts come from `sequence(0, n-1, 50)` exploded
    JVM-side, each chunk is an array slice of the already-split token
    column — the text is tokenized ONCE per document, not per chunk, and
    nothing shuffles (plan has no Exchange; chunking at 100 TB is
    embarrassingly parallel). Chunks surface as md5 so the oracle compares
    fixed-width digests, not chunk text.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.col("t")
    out = (
        d.select("doc_id", F.split("text", " ").alias("t"))
        .select(
            "doc_id",
            toks.alias("t"),
            F.explode(F.sequence(F.lit(0), F.size(toks) - 1, F.lit(50))).alias("start"),
        )
        .select(
            "doc_id",
            (F.col("start") / 50).cast("long").alias("chunk_idx"),
            F.slice(toks, F.col("start") + 1, 60).alias("chunk"),
        )
    )
    return out.select(
        "doc_id",
        "chunk_idx",
        F.size("chunk").cast("long").alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", F.col("chunk"))).alias("chunk_md5"),
    )


@query(
    "q_split_leakage_safe",
    oracle="""
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id < 200),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(len(t) - 2),
               i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS shingles
      FROM toks WHERE len(t) >= 3),
    pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / (len(a.shingles) + len(b.shingles)
               - len(list_intersect(a.shingles, b.shingles))) >= 0.5),
    edges AS (
      SELECT a_id AS u, b_id AS v FROM pairs
      UNION SELECT b_id, a_id FROM pairs),
    reach AS (
      SELECT u AS node, u AS lbl FROM edges
      UNION
      SELECT e.u AS node, r.lbl
      FROM reach r JOIN edges e ON e.v = r.node),
    comp AS (SELECT node AS doc_id, min(lbl) AS component FROM reach GROUP BY node),
    keyed AS (
      SELECT d.doc_id,
             CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS group_key
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
    SELECT doc_id, group_key,
           CASE WHEN md5(CAST(group_key AS VARCHAR)) < 'e6' THEN 'train'
                WHEN md5(CAST(group_key AS VARCHAR)) < 'f6' THEN 'validation'
                ELSE 'test' END AS split
    FROM keyed
    """,
)
def q_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/test split: near-duplicate GROUPS, not documents,
    are the unit of assignment — two near-identical documents can never
    straddle train and test (the contamination mode a plain per-doc hash
    split cannot prevent, and the reason eval numbers inflate silently).

    Composition: exact-Jaccard near-dup edges (bounded pairset, as in
    q_dedup_clusters) → connected components → each document keyed by its
    component's min doc_id (singletons key as themselves) → the SAME
    hash-threshold assignment as q_split_train_test, applied to the group
    key. Scale: the component labels are a doc_id-keyed table (≪ corpus);
    everything else is the map-only hash split. The oracle recomputes the
    components with a recursive CTE and must land every doc in the same
    split — group-atomicity is the tested property.
    """
    from graph_vulcan_assets_spark.llm.clustering import connected_components
    from graph_vulcan_assets_spark.llm.dedup import q_dedup_ngram

    d = load_table(spark, sf_dir, "documents")
    pairs = (
        q_dedup_ngram(spark, sf_dir).where(F.col("jaccard") >= 0.5).select("a_id", "b_id")
    )
    comps = connected_components(pairs).select(
        F.col("node").alias("doc_id"), "component"
    )
    keyed = (
        d.select("doc_id")
        .join(comps, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).cast("long").alias("group_key"),
        )
    )
    fp = _fingerprint(F.col("group_key"))
    return keyed.withColumn(
        "split",
        F.when(fp < "e6", "train").when(fp < "f6", "validation").otherwise("test"),
    )


def _shingle5(d: DataFrame) -> DataFrame:
    """Distinct 5-gram shingles per document — shared by the exact and
    Bloom decontamination paths so both flag the same shingle universe."""
    toks = F.col("t")
    shingle = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(1, 6)]
    )
    return (
        d.select("doc_id", F.split("text", " ").alias("t"))
        .where(F.size(toks) >= 5)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(F.sequence(F.lit(0), F.size(toks) - 5), shingle)
                )
            ).alias("s"),
        )
    )


# Bloom geometry: 2^18 bits (4096 longs) / 5 hash functions. For the eval
# shingle cardinalities here (thousands) the theoretical false-positive
# rate is < 1e-4; the filter table is 32 KiB — broadcastable at any scale.
_BLOOM_BITS = 1 << 18
_BLOOM_HASHES = 5


def bloom_build(keys: DataFrame, key_col: str = "s") -> DataFrame:
    """Aggregate a string-key set into a Bloom filter as (word_idx, word)
    rows: k hashed bit positions per key, OR-ed into 64-bit words.

    Pure DataFrame ops (xxhash64 → pmod → shiftleft → bit_or): the filter
    IS a tiny table, so 'broadcast the eval set' becomes 'broadcast 4096
    longs' no matter how many keys went in — the decontamination scale
    path when the eval corpus itself outgrows broadcast.
    """
    pos = F.explode(
        F.array(
            *[
                F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(_BLOOM_BITS))
                for i in range(_BLOOM_HASHES)
            ]
        )
    ).alias("pos")
    positions = keys.select(pos)
    return (
        positions.select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_probe(probes: DataFrame, bloom: DataFrame, key_col: str = "s") -> DataFrame:
    """Keep probe rows whose key tests positive in the filter (all k bits
    set). Superset of the true members — no false negatives by
    construction; false-positive rate set by the filter geometry.

    Bag semantics: duplicate probe rows are preserved (each carries a
    per-row surrogate id through the explode/group, so two identical
    input rows yield two identical output rows).
    """
    probes = probes.withColumn("__probe_id", F.monotonically_increasing_id())
    with_pos = probes.withColumn(
        "__pos",
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(_BLOOM_BITS))
                    for i in range(_BLOOM_HASHES)
                ]
            )
        ),
    ).select(
        *probes.columns,
        (F.col("__pos") / 64).cast("long").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))").alias("mask"),
    )
    joined = with_pos.join(F.broadcast(bloom), "word_idx", "left")
    hit = (F.col("word").isNotNull() & (F.col("word").bitwiseAND(F.col("mask")) != 0)).cast("int")
    out_cols = [c for c in probes.columns if c != "__probe_id"]
    return (
        joined.groupBy(*probes.columns)
        .agg(F.sum(hit).alias("__hits"))
        .where(F.col("__hits") == _BLOOM_HASHES)
        .select(*out_cols)
    )


@query("q_decontaminate_bloom")  # rows-only: xxhash64 has no DuckDB twin
def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination (the scale path of q_decontaminate):
    the eval set is represented by a 32 KiB bit table instead of its
    shingle set, so membership testing never shuffles or broadcasts eval
    text — only the filter.

    Candidates are a SUPERSET of the exact answer (Bloom filters have no
    false negatives; tests/test_curation.py proves containment and that
    the false-positive inflation stays under 1% on the real corpus). In a
    production pipeline the candidates then confirm against the exact
    shingle set — a join that now touches only the candidate sliver.
    """
    d = load_table(spark, sf_dir, "documents")
    sh = _shingle5(d)
    ev = sh.where(F.col("doc_id") % 19 == 0).select("s").distinct()
    tr = sh.where(F.col("doc_id") % 19 != 0)
    bloom = bloom_build(ev)
    flagged = bloom_probe(tr, bloom)
    return flagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_candidate_overlap")
    )


# -- round-3 additions: training-order assembly ------------------------------
#
# The steps after mixing/packing that an actual pre-training data build
# needs: a deterministic global shuffle into shards (training order), a
# temperature-resampled language mixture (UniMax-style upsampling), and
# length-bucketed batch assembly (padding efficiency). All arithmetic is
# integer or IEEE-exact (sqrt, division), so assignments are bit-identical
# across engines and cluster runs.

_KNUTH = 2654435761  # Knuth multiplicative hash constant (2^32 / phi)
_SHARDS = 16


def _knuth32(col):
    """((doc_id pmod 2^31) * K) mod 2^32 — the multiplicative hash with an
    overflow guard: a raw doc_id * K exceeds int64 once doc_id passes
    ~3.47e9 (reachable in a 100 TB corpus), which ANSI engines reject and
    non-ANSI ones silently wrap NEGATIVE — breaking shard in [0,16) and
    every u < t acceptance test. Reducing mod 2^31 first caps the product
    at ~5.7e18 < 2^63 on both engines; for doc_id < 2^31 the value is
    bit-identical to the unreduced form. pmod, not %: a NEGATIVE id
    (corrupt bits — ids are opaque 64-bit values at scale) reduces
    non-negative here while DuckDB's % keeps the sign, so the oracles
    spell the sign-safe ((x % m) + m) % m form explicitly (extreme-id
    probe, round 6)."""
    return (F.pmod(col, F.lit(2147483648)) * F.lit(_KNUTH)) % F.lit(4294967296)


@query(
    "q_corpus_shuffle",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, lang, ((((doc_id % 2147483648) + 2147483648) % 2147483648) * {_KNUTH}) % 4294967296 AS h
      FROM documents)
    SELECT doc_id, lang,
           CAST(h // 268435456 AS BIGINT) AS shard,
           CAST(row_number() OVER (
                  PARTITION BY h // 268435456 ORDER BY h, doc_id)
                AS BIGINT) AS pos
    FROM h
    """,
)
def q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle + sharding for training order.

    Multiplicative hashing (Knuth constant, TOP 4 bits — the low bits of
    a*x mod 2^32 just stripe sequential ids) scatters documents into 16
    shards, each internally ordered by hash: the 'shuffle once, then read
    shards sequentially' layout every pre-training run starts from.

    Scale shape: shard assignment is map-only; the per-shard position is
    ONE window partitioned by shard — 16 balanced partitions, each sorted
    independently (range-partition sort at 100 TB, no single-task
    funnel). Reproducible: same corpus → same order, no RNG state.
    """
    d = load_table(spark, sf_dir, "documents")
    h = _knuth32(F.col("doc_id"))
    shard = F.floor(h / F.lit(268435456)).cast("long")
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        d.select("doc_id", "lang", h.alias("h"))
        .withColumn("shard", shard)
        .select(
            "doc_id",
            "lang",
            "shard",
            F.row_number().over(w).cast("long").alias("pos"),
        )
    )


@query(
    "q_mix_temperature",
    oracle=f"""
    WITH counts AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_lang FROM documents GROUP BY lang),
    rates AS (
      SELECT lang, n_lang,
             sqrt(CAST((SELECT max(n_lang) FROM counts) AS DOUBLE) / n_lang) AS rate
      FROM counts),
    perdoc AS (
      SELECT d.doc_id, d.lang, r.rate,
             CAST(floor(r.rate) AS BIGINT) AS base_copies,
             ((((d.doc_id % 2147483648) + 2147483648) % 2147483648) * {_KNUTH}) % 65536 AS u,
             CAST(floor((r.rate - floor(r.rate)) * 65536) AS BIGINT) AS t
      FROM documents d JOIN rates r USING (lang))
    SELECT doc_id, lang,
           base_copies + CASE WHEN u < t THEN 1 ELSE 0 END AS n_copies
    FROM perdoc
    WHERE base_copies + CASE WHEN u < t THEN 1 ELSE 0 END > 0
    """,
)
def q_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-resampled language mixture (τ = 0.5, UniMax-style):
    upsample low-resource languages toward the largest one by
    sqrt(N_max / N_lang) expected copies per document.

    Determinism across engines: sqrt and the long→double division are
    IEEE-exact operations (unlike pow, whose libm results differ by ulps
    between JVM and C++), and the fractional copy is decided by an
    integer Knuth hash of doc_id against floor(frac·65536) — no float
    comparison ever crosses an engine boundary.

    Scale shape: the per-language rate table is lang-cardinality-sized
    and broadcast; the per-doc step is map-only. Materializing the copies
    is a posexplode over n_copies downstream; this operator emits the
    assignment (the thing worth checking), not the blown-up corpus.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").cast("long").alias("n_lang"))
    n_max = counts.agg(F.max("n_lang").alias("n_max"))
    rates = attach_scalar(counts, n_max, "n_max").select(
        "lang",
        F.sqrt(F.col("n_max").cast("double") / F.col("n_lang")).alias("rate"),
    )
    base = F.floor("rate").cast("long")
    u = _knuth32(F.col("doc_id")) % F.lit(65536)
    t = F.floor((F.col("rate") - F.floor("rate")) * 65536).cast("long")
    out = (
        d.join(F.broadcast(rates), "lang")
        .select(
            "doc_id",
            "lang",
            (base + F.when(u < t, 1).otherwise(0)).alias("n_copies"),
        )
        .where(F.col("n_copies") > 0)
    )
    return out


def _counting_rank(lens: DataFrame, value_col: str = "n_tokens") -> DataFrame:
    """Distributed counting rank shared by q_length_buckets and
    q_quantile_filter: global rank equivalent to ORDER BY (value, doc_id)
    without a single-partition window. Rows rank WITHIN their own value
    (window partitioned by the value — one task per distinct value); a
    tiny value histogram supplies each value's cumulative offset via
    broadcast; rank = offset + intra-rank. The only serial window runs
    over the histogram (distinct-value-sized at any scale). Returns the
    input columns + (rn, n). Shared so a fix to the rank machinery cannot
    apply to one caller and silently skip the other."""
    hist = lens.groupBy(value_col).agg(F.count("*").alias("cnt"))
    wh = Window.orderBy(value_col).rowsBetween(Window.unboundedPreceding, -1)
    offsets = hist.select(
        value_col,
        F.coalesce(F.sum("cnt").over(wh), F.lit(0)).alias("offset"),
        F.sum("cnt").over(
            Window.orderBy(value_col).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    wi = Window.partitionBy(value_col).orderBy("doc_id")
    return lens.join(F.broadcast(offsets), value_col).select(
        *lens.columns,
        (F.col("offset") + F.row_number().over(wi)).alias("rn"),
        "n",
    )


@query(
    "q_length_buckets",
    oracle="""
    WITH lens AS (
      -- text IS NOT NULL: a NULL-text document has no token count; the
      -- Spark side drops it structurally (NULL n_tokens never matches the
      -- counting-rank equi-join) while a window-based oracle would rank it
      -- NULLS LAST, shifting n and every band edge
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents WHERE text IS NOT NULL),
    ranked AS (
      SELECT doc_id, n_tokens,
             row_number() OVER (ORDER BY n_tokens, doc_id) AS rn,
             count(*) OVER () AS n
      FROM lens),
    bucketed AS (
      SELECT doc_id, n_tokens, rn, n,
             CAST(((rn - 1) * 8) // n AS BIGINT) AS bucket
      FROM ranked)
    SELECT doc_id, n_tokens, bucket,
           CAST((rn - 1 - (bucket * n + 7) // 8) // 32 AS BIGINT) AS batch_no
    FROM bucketed
    """,
)
def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch assembly: rank documents by token count into
    8 equal-depth buckets, then cut each bucket into 32-document batches —
    the padding-efficiency step before packing (similar-length documents
    batch together, so pad-to-longest wastes the least).

    The global rank is computed as a COUNTING RANK, not a total-order
    window (which collapses to one partition): documents rank within
    their own length value (window partitioned by n_tokens — distributed,
    one task per length), and a tiny per-length histogram provides each
    length's cumulative offset via broadcast. rank = offset + intra-rank
    reproduces ORDER BY (n_tokens, doc_id) exactly. The only serial
    window runs over the length histogram (thousands of rows at any
    scale); bucket and batch numbers are then pure arithmetic on the
    rank (bucket b starts at rank ceil(b·n/8) + 1), no further shuffle.
    Worst case is a single dominant length value serializing its
    intra-rank — the inherent skew of equal-depth bucketing.
    """
    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    lens = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    ranked = _counting_rank(lens).select("doc_id", "n_tokens", "rn", "n")
    bucketed = ranked.withColumn(
        "bucket", F.floor(((F.col("rn") - 1) * 8) / F.col("n")).cast("long")
    )
    bucket_start = F.floor((F.col("bucket") * F.col("n") + 7) / 8)  # ceil(b*n/8)
    return bucketed.select(
        "doc_id",
        "n_tokens",
        "bucket",
        F.floor((F.col("rn") - 1 - bucket_start) / 32).cast("long").alias("batch_no"),
    )


@query(
    "q_quantile_filter",
    oracle="""
    WITH lens AS (
      SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents WHERE text IS NOT NULL),
    ranked AS (
      SELECT doc_id, lang, n_tokens,
             row_number() OVER (ORDER BY n_tokens, doc_id) AS rn,
             count(*) OVER () AS n
      FROM lens)
    SELECT doc_id, lang, n_tokens
    FROM ranked
    WHERE rn > n * 5 // 100 AND rn <= n * 95 // 100
    """,
)
def q_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-band quality filter: drop the shortest 5% and longest 5%
    of documents by token count — the standard outlier trim before
    training (truncated pages and concatenation accidents live in the
    tails).

    Exact rank-based percentiles (not approx sketches) with the same
    distributed counting rank as q_length_buckets: per-length intra-rank
    windows + broadcast cumulative offsets — no single-partition window,
    and the band edges are integer arithmetic on the rank, identical in
    both engines (no float percentile interpolation to diverge on).
    """
    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    lens = d.select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    ranked = _counting_rank(lens)
    lo = F.floor(F.col("n") * 5 / 100)
    hi = F.floor(F.col("n") * 95 / 100)
    return ranked.where((F.col("rn") > lo) & (F.col("rn") <= hi)).select(
        "doc_id", "lang", "n_tokens"
    )


@query(
    "q_mix_materialize",
    oracle=f"""
    WITH counts AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_lang FROM documents GROUP BY lang),
    rates AS (
      SELECT lang,
             sqrt(CAST((SELECT max(n_lang) FROM counts) AS DOUBLE) / n_lang) AS rate
      FROM counts),
    perdoc AS (
      SELECT d.doc_id, d.lang,
             CAST(floor(r.rate) AS BIGINT)
               + CASE WHEN ((((d.doc_id % 2147483648) + 2147483648) % 2147483648) * {_KNUTH}) % 65536
                           < CAST(floor((r.rate - floor(r.rate)) * 65536) AS BIGINT)
                      THEN 1 ELSE 0 END AS n_copies
      FROM documents d JOIN rates r USING (lang))
    SELECT doc_id, lang, CAST(u.i AS BIGINT) AS copy_idx
    FROM perdoc, unnest(range(n_copies)) AS u(i)
    WHERE n_copies > 0
    """,
)
def q_mix_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized temperature mixture (the explode step after
    q_mix_temperature): one output row per (document, copy) — the
    physical epoch-construction form where an upsampled document really
    appears n_copies times in the training stream.

    JVM-side `sequence` explode of the per-doc copy count — the blowup
    happens inside codegen after the broadcast rate join, so the pipeline
    is still map-only per input row; output volume equals the resampled
    corpus size by construction.
    """
    # compose the assignment query — one sampling rule, one place to
    # change it; this is literally its explode step
    assigned = q_mix_temperature(spark, sf_dir)
    return assigned.select(
        "doc_id",
        "lang",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("n_copies") - 1)).alias(
            "copy_idx"
        ),
    )


@query(
    "q_cap_per_source",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn,
             count(*) OVER (PARTITION BY source) AS n_source
      FROM documents)
    SELECT doc_id, source, CAST(rn AS BIGINT) AS rn,
           CAST(n_source AS BIGINT) AS n_source
    FROM ranked WHERE rn <= 12
    """,
)
def q_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap: keep at most 12 docs per source by
    deterministic hash rank — the anti-domination step that stops one
    crawled domain from swamping the mixture (the absolute-count sibling
    of q_sample_stratified's fractional trim).

    Same counting discipline as the stratified sampler: rank within the
    source by content hash (stable across runs/engines, no RNG state),
    one shuffle on the cap key; a source below the cap passes through
    whole. The cap (12) sits below every synthetic source's size (~25 per
    source at sf0.01) so the exclusion branch is provably exercised at
    every SF — the vacuity lesson from round-2 ADVICE. At 100 TB the rank window sees one source per task — for a
    pathologically hot single source, the quantile-band form
    (q_quantile_filter's counting rank) is the constant-memory fallback.
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(_fingerprint(F.col("doc_id")), "doc_id")
    wc = Window.partitionBy("source")
    ranked = d.select(
        "doc_id",
        "source",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count("*").over(wc).cast("long").alias("n_source"),
    )
    return ranked.where(F.col("rn") <= 12)
