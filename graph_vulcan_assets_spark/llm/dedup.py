"""Deduplication operators (X1/X2): exact and near-duplicate detection.

Training-data pipelines dedup at corpus scale; everything here is
shuffle-on-hash, no driver-side state, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.llm.embeddings import cosine_sql as _cosine_sql
from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import load_table

# MinHash parameters: 8 independent hash slots grouped into 4 bands of 2.
_MINHASH_HASHES = 8
_MINHASH_BAND_SIZE = 2


@query(
    "q_dedup_exact",
    oracle="""
    SELECT doc_id, lang, source
    FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      FROM documents)
    WHERE rn = 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (X1): keep the lowest doc_id per identical text.

    Spark side groups on sha2(text) so the shuffle key is a fixed-width
    256-bit digest instead of the full document — at 100 TB that's the
    difference between shuffling hashes and shuffling the corpus. The
    oracle partitions by raw text (same answer absent SHA-256 collisions).
    """
    # argmin-as-aggregate (round 7, the q_win_last_event rationale): the
    # representative row per digest is min_by, a partial/final aggregate
    # pair — the shuffle carries one candidate per (digest, map
    # partition), so a duplicate-heavy corpus (the dedup TARGET) reduces
    # map-side instead of funneling every copy into one partition sort
    d = load_table(spark, sf_dir, "documents")
    keep = F.min_by(F.struct("doc_id", "lang", "source"), F.col("doc_id"))
    return (
        d.groupBy(F.sha2(F.col("text"), 256).alias("h"))
        .agg(keep.alias("b"))
        .select(
            F.col("b.doc_id").alias("doc_id"),
            F.col("b.lang").alias("lang"),
            F.col("b.source").alias("source"),
        )
    )




def prefix_fingerprint(text_col: str = "text", n_tokens: int = 5):
    """5-token-prefix SHA-256 — the incremental-dedup key (catches
    re-crawls differing only in trailing boilerplate). ONE definition,
    shared by q_dedup_incremental and the streaming CorpusIngest sink
    (streaming/corpus_ingest.py): if the two keys diverge, the batch
    query and the streaming intake silently disagree about what counts
    as a duplicate."""
    return F.sha2(
        F.concat_ws(" ", F.slice(F.split(F.col(text_col), " "), 1, n_tokens)), 256
    )


def token_shingles(tokens, n: int, distinct: bool = True):
    """Array of n-token space-joined shingles over a pre-split token array
    column — THE shingle builder, shared by the exact-Jaccard, boilerplate
    and containment dedup queries and q_text_repetition (llm/text.py).
    One definition so a fix to the windowing arithmetic (the sequence
    upper bound is the classic off-by-one) cannot reach one caller and
    silently skip another. Caller filters ``F.size(tokens) >= n`` first
    (an undersized array would otherwise yield one partial shingle).
    minhash_signatures keeps its slice-based variant (it needs the
    empty-doc guard and materialized token column for its own reasons)."""
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(tokens, i + k) for k in range(1, n + 1)]
    )
    arr = F.transform(F.sequence(F.lit(0), F.size(tokens) - n), gram)
    return F.array_distinct(arr) if distinct else arr


def minhash_signatures(docs: DataFrame, n_hashes: int = _MINHASH_HASHES) -> DataFrame:
    """Per-document MinHash signature over 3-token shingles.

    Pipeline (all built-in expressions): tokenize → 3-gram shingles →
    xxhash64 with H different seeds → min per seed. One explode + one
    groupBy(doc_id); the shuffle carries (doc_id, shingle-hash) pairs.

    The token array is materialized as a physical column before shingling:
    referencing the raw split() expression inside the per-index lambda
    would re-split the text for every shingle (O(tokens²) per document).
    """
    tokenized = docs.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    toks = F.col("toks")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - 3, F.lit(0)))
    shingle = lambda i: F.array_join(F.slice(toks, i + 1, 3), " ")  # noqa: E731
    # no distinct(): min() is duplicate-insensitive, so deduplicating the
    # exploded shingles would only add a full extra shuffle
    shingled = tokenized.where(n >= 3).select(
        "doc_id", F.explode(F.transform(idx, shingle)).alias("shingle")
    )
    # hash each variable-length shingle string ONCE, then derive the H
    # minhash slots by re-hashing the fixed 8-byte result with the slot id
    # as seed — the permutation family costs H long-hashes instead of H
    # string-hashes per shingle
    mixed = shingled.select("doc_id", F.xxhash64(F.col("shingle")).alias("base"))
    return mixed.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.col("base"), F.lit(i))).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    )


@query("q_dedup_near")
def q_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection (X2, rows-only): MinHash + LSH banding.

    Shingle → MinHash signature (H=8) → band the signature (4 bands of 2) →
    self-join documents sharing a band bucket → estimate Jaccard from the
    full signatures. The band join is an equi-join on (band_id, band_hash):
    shuffle-partitionable and skew-safe, never an O(n²) cross join.
    Rows-only: MinHash is a randomized sketch, no deterministic SQL oracle.
    """
    d = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(d)
    hash_cols = [f"h{i}" for i in range(_MINHASH_HASHES)]
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(
                    *[
                        F.col(hash_cols[b * _MINHASH_BAND_SIZE + j])
                        for j in range(_MINHASH_BAND_SIZE)
                    ]
                ).alias("band_hash"),
            )
            for b in range(_MINHASH_HASHES // _MINHASH_BAND_SIZE)
        ]
    )
    banded = sig.select("doc_id", *hash_cols, F.explode(bands).alias("band")).select(
        "doc_id", *hash_cols, F.col("band.band_id").alias("band_id"), F.col("band.band_hash").alias("band_hash")
    )
    left = banded.select(
        F.col("doc_id").alias("a_id"),
        *[F.col(h).alias(f"a_{h}") for h in hash_cols],
        "band_id",
        "band_hash",
    )
    right = banded.select(
        F.col("doc_id").alias("b_id"),
        *[F.col(h).alias(f"b_{h}") for h in hash_cols],
        "band_id",
        "band_hash",
    )
    matches = F.aggregate(
        F.array(*[(F.col(f"a_{h}") == F.col(f"b_{h}")).cast("int") for h in hash_cols]),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        left.join(right, ["band_id", "band_hash"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", matches.alias("n_matching"))
        .distinct()
        .withColumn(
            "jaccard_est", F.round(F.col("n_matching") / float(_MINHASH_HASHES), 4)
        )
    )


@query(
    "q_dedup_ngram",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id < 200),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(len(t) - 2),
               i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS shingles
      FROM toks WHERE len(t) >= 3)
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 / (len(a.shingles) + len(b.shingles)
                    - len(list_intersect(a.shingles, b.shingles))), 6) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.shingles, b.shingles)) > 0
    """,
)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard similarity (X2): 3-gram shingle sets, bounded
    pairset, oracle-checked.

    The exact counterpart to MinHash: distinct 3-gram sets per document,
    pairwise |A∩B| / |A∪B|. Bounded to doc_id < 200 because all-pairs exact
    Jaccard is quadratic — the MinHash/LSH path (q_dedup_near) is the
    scale variant; this one is its ground-truth. The bound is 200 so the
    pairset covers the planted near-duplicates at every test SF (at
    sf0.01 they sit above doc_id 40).
    """
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    toks = F.split(F.col("text"), " ")
    shingled = d.select("doc_id", toks.alias("t")).where(F.size("t") >= 3).select(
        "doc_id", token_shingles(F.col("t"), 3).alias("shingles")
    )
    a = shingled.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("a_sh"))
    b = shingled.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("b_sh"))
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    union = F.size("a_sh") + F.size("b_sh") - inter
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .where(inter > 0)
        .select(
            "a_id",
            "b_id",
            F.round(inter.cast("double") / union, 6).alias("jaccard"),
        )
    )


@query(
    "q_dedup_embed",
    oracle=f"""
    WITH dv AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE vec_id < 200 AND {_cosine_sql("embedding")})
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           round(list_dot_product(a.e, b.e)
                 / (sqrt(list_dot_product(a.e, a.e))
                    * sqrt(list_dot_product(b.e, b.e))), 6) AS cos
    FROM dv a JOIN dv b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.e, b.e)
          / (sqrt(list_dot_product(a.e, a.e))
             * sqrt(list_dot_product(b.e, b.e))) > 0.4
    """,
)
def q_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup (X2): semantic duplicate pairs above a
    cosine threshold, bounded subset with exact oracle.

    The scale path for the full corpus is q_sim_lsh_bucketed (hyperplane
    LSH); this bounded brute-force variant is its oracle-checkable
    ground truth.

    Gated through :func:`embeddings.cosine_embeddings` (oracle:
    ``cosine_sql``) like every other embedding consumer — round-6 close
    of the last ungated vector path: a zero vector inside the id subset
    is 0/0 under ANSI, and a NaN component makes the cosine NaN, which
    both engines' ``> 0.4`` would pass (NaN sorts greater) — a silently
    bogus pair. The id bound alone only protected the test fixture,
    not the operator.
    """
    from graph_vulcan_assets_spark.llm.embeddings import cosine_embeddings
    from graph_vulcan_assets_spark.llm.similarity import dot, l2_norm

    e = cosine_embeddings(load_table(spark, sf_dir, "embeddings")).where(
        F.col("vec_id") < 200
    )
    a = e.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_vec"))
    b = e.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_vec"))
    cos = dot(F.col("a_vec"), F.col("b_vec")) / (
        l2_norm(F.col("a_vec")) * l2_norm(F.col("b_vec"))
    )
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .withColumn("cos_raw", cos)
        .where(F.col("cos_raw") > 0.4)
        .select("a_id", "b_id", F.round("cos_raw", 6).alias("cos"))
    )


@query("q_dedup_simhash")
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints (X2 family, rows-only): 16-bit token-weight hash.

    Each document's tokens vote per bit position (+1 if the token's hash has
    the bit set, −1 otherwise); the sign per position forms the fingerprint.
    Pure explode + groupBy + bit arithmetic — no UDFs. Rows-only: the
    bit-mixing has no clean SQL-oracle mirror.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    bits = 16
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.xxhash64("token"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(bits)
        ]
    )
    fingerprint = F.aggregate(
        F.array(*[F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0)) for b in range(bits)]),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x.cast("long"),
    )
    return votes.select("doc_id", fingerprint.alias("simhash"))


@query(
    "q_dedup_boilerplate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(len(t) - 4),
               i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
                    t[i+4] || ' ' || t[i+5])) AS gs
      FROM toks WHERE len(t) >= 5),
    pairs AS (SELECT doc_id, unnest(gs) AS s FROM sh),
    dfreq AS (SELECT s, count(*) AS df FROM pairs GROUP BY s)
    SELECT doc_id,
           count(*) AS n_shingles,
           CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
           round(CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS boiler_frac
    FROM pairs JOIN dfreq USING (s)
    GROUP BY doc_id
    """,
)
def q_dedup_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-shingle (boilerplate) detection (X2 family).

    The line-dedup/boilerplate-removal shape from web-corpus pipelines
    (CCNet-style), adapted to token 5-gram windows since the synthetic
    corpus has no line structure: a shingle appearing in ≥2 distinct
    documents is boilerplate; each document reports its boilerplate
    fraction. Plan: per-row shingle arrays (map-only) → explode distinct
    shingles → document-frequency aggregation [shuffle on shingle] →
    equi-join back [same key, same partitioning] → per-doc aggregation.
    The shuffles carry shingle strings; at 100 TB swap the string for
    xxhash64(shingle) — kept as strings here so the DuckDB oracle can
    mirror the query exactly.
    """
    d = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    grams = token_shingles(F.col("t"), 5)
    pairs = (
        d.select("doc_id", t.alias("t"))
        .where(F.size("t") >= 5)
        .select("doc_id", F.explode(grams).alias("s"))
    )
    dfreq = pairs.groupBy("s").agg(F.count("*").alias("df"))
    is_boiler = F.when(F.col("df") >= 2, 1).otherwise(0)
    return (
        pairs.join(dfreq, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(is_boiler).cast("long").alias("n_boiler"),
            F.round(
                F.sum(is_boiler).cast("double") / F.count("*"), 6
            ).alias("boiler_frac"),
        )
    )


@query(
    "q_dedup_incremental",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, lang, source,
             array_to_string((string_split(text, ' '))[1:5], ' ') AS fp
      FROM documents),
    hist AS (
      SELECT DISTINCT fp FROM keyed WHERE doc_id % 5 < 4),
    batch AS (
      SELECT * FROM keyed WHERE doc_id % 5 = 4),
    fresh AS (
      SELECT b.* FROM batch b ANTI JOIN hist h ON b.fp = h.fp)
    SELECT doc_id, lang, source
    FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      FROM fresh)
    WHERE rn = 1
    """,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: a new batch against the historical corpus.

    The production shape of X1: history is NOT rescanned as text — it is
    represented by its distinct fingerprint set (in a real pipeline, a
    persisted compact table maintained across runs), and the new batch
    anti-joins against it, then dedups within itself. Per-ingest cost is
    O(batch + |history fingerprints|), never O(history text) — the batch
    analog of the O(batch) streaming-seed fix (streaming/ingest.py).

    The dedup key is a 5-token PREFIX fingerprint (prefix fingerprinting
    catches re-crawls that differ only in trailing boilerplate; the
    testdata has no byte-identical duplicates, so whole-text hashing
    would make this check vacuous — the prefix key really removes rows
    at sf0.01: 4 batch docs suppressed by history, plus within-batch
    collapses). Spark shuffles the sha2-256 digest of the prefix, never
    text; the oracle keys on the raw prefix (same answer absent SHA-256
    collisions). The batch/history split is doc_id mod 5 — deterministic
    and non-degenerate at every sf.
    """
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select("doc_id", "lang", "source", prefix_fingerprint().alias("fp"))
    hist = keyed.where(F.col("doc_id") % 5 < 4).select("fp").distinct()
    batch = keyed.where(F.col("doc_id") % 5 == 4)
    fresh = batch.join(hist, "fp", "left_anti")
    # argmin-as-aggregate, same as q_dedup_exact
    keep = F.min_by(F.struct("doc_id", "lang", "source"), F.col("doc_id"))
    return (
        fresh.groupBy("fp")
        .agg(keep.alias("b"))
        .select(
            F.col("b.doc_id").alias("doc_id"),
            F.col("b.lang").alias("lang"),
            F.col("b.source").alias("source"),
        )
    )


@query(
    "q_dedup_containment",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(len(t) - 2),
               i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))) AS s
      FROM toks WHERE len(t) >= 3),
    kept AS (
      SELECT s FROM sh GROUP BY s HAVING count(*) <= 50),
    posts AS (SELECT doc_id, s FROM sh JOIN kept USING (s)),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM posts GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             CAST(count(*) AS BIGINT) AS n_common
      FROM posts a JOIN posts b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT c.a_id, c.b_id,
           round(CAST(c.n_common AS DOUBLE) / least(sa.n_sh, sb.n_sh), 6)
             AS containment
    FROM common c
    JOIN sizes sa ON sa.doc_id = c.a_id
    JOIN sizes sb ON sb.doc_id = c.b_id
    WHERE CAST(c.n_common AS DOUBLE) / least(sa.n_sh, sb.n_sh) >= 0.5
    """,
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment dedup (X2 completion): flag pairs where the SMALLER
    document's 3-gram shingle set is ≥50% contained in the other —
    catches doc-inside-doc duplication (quotes, mirrors, boilerplate
    expansions) that symmetric Jaccard under-scores when sizes differ.

    Scale shape — this is the exact-scoring pass that runs AFTER LSH
    candidate generation, built so it also stands alone: shingles become
    postings (shingle → doc), STOP-SHINGLES with document frequency > 50
    are dropped (a shingle shared by thousands of docs contributes
    quadratic pairs and zero dedup signal — the df-cap is the standard
    postings guard), and pairs emerge from the postings SELF-EQUI-JOIN on
    the shingle — shuffle-partitionable by shingle hash, never a cross
    join. Per-pair common counts then join two broadcastable size tables.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    posts = (
        d.select("doc_id", toks.alias("t"))
        .where(F.size("t") >= 3)
        .select("doc_id", F.explode(token_shingles(F.col("t"), 3)).alias("s"))
    )
    kept = posts.groupBy("s").agg(F.count("*").alias("df")).where(F.col("df") <= 50)
    posts = posts.join(kept.select("s"), "s")
    sizes = posts.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_sh"))
    a = posts.select(F.col("doc_id").alias("a_id"), "s")
    b = posts.select(F.col("doc_id").alias("b_id"), "s")
    common = (
        a.join(b, "s")
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("a_id"), F.col("n_sh").alias("a_n"))
    sb = sizes.select(F.col("doc_id").alias("b_id"), F.col("n_sh").alias("b_n"))
    cont = F.col("n_common").cast("double") / F.least("a_n", "b_n")
    return (
        common.join(sa, "a_id")
        .join(sb, "b_id")
        .where(cont >= 0.5)
        .select("a_id", "b_id", F.round(cont, 6).alias("containment"))
    )
