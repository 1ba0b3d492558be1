"""Byte-pair-encoding tokenizer training and encoding, distributed.

Tokenizer training is the canonical pre-training corpus job the repo's
token-count estimators (llm/text.py q_token_count) approximate: learn the
top merge rules from corpus statistics, then tokenize with them. Classic
BPE (Sennrich et al. 2016) is a greedy loop — count adjacent symbol pairs
weighted by word frequency, merge the most frequent pair, repeat — and
shards naturally:

- The symbol table is the DISTINCT-WORD table with counts, not the corpus:
  every count and every merge applies per distinct word once, weighted by
  its frequency. At 100 TB the corpus is huge but the distinct-word table
  is vocabulary-sized; only the initial word count ever scans the corpus.
- Each training iteration is one partial-aggregated shuffle on the pair
  (map-side combine does the heavy lifting); the winning pair attaches to
  every vocab row via a BROADCAST crossJoin of the 1-row argmax — no per-
  iteration driver round-trip. (Round 12 measured the scalar-subquery
  attach here and REJECTED it: between checkpoints the iterations nest,
  and nested scalar subqueries re-evaluate per nesting level while
  identical broadcast subtrees are deduped by exchange reuse within the
  one plan — the subquery form was ~1.4x slower on the 12-merge train.)
  Merging is a pure fold expression over each word's symbol array,
  guarded by an O(len) adjacency scan so only words that contain the
  winning pair pay the quadratic fold; no Python touches a row.
- Encoding joins documents' words against the trained distinct-word
  tokenization — an equi-join on the word, never re-running merges per
  occurrence. The learned merge list itself is a model artifact
  (n_merges rows), fetched once to parameterize the encoder.

Greedy left-to-right fold semantics match the reference algorithm:
"abab" under merge (a,b) becomes [ab, ab]; "aaa" under (a,a) becomes
[aa, a].
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import load_table

# Lineage truncation cadence for the iterative merge loop (kmeans idiom).
# Round 12, measured on the 12-merge train at sf0.1 (min of 3, same host):
# every 2 -> 4.45 s, 3 -> 4.79, 4 -> 4.93-5.11, 6 -> 8.07, 1 -> 4.74.
# Between checkpoints iteration i's argmax job re-executes the fold chain
# since the last checkpoint, so a short cadence wins once the fold is
# guarded; a persist()-per-iteration variant (no eager materialization at
# all) nests 12 broadcast builds recursively and hangs - rejected.
_CHECKPOINT_EVERY = 2


# Pre-token length cap, the same bound real BPE trainers apply (e.g.
# HuggingFace tokenizers' max_token_length): the per-merge symbol rewrite
# is a Catalyst array fold whose repeated-concat cost is QUADRATIC in word
# length, so one pathological unbroken run (a 100 KB base64 blob, a
# minified-JS line) would stall training for the whole corpus (round-5
# hostile sweep: a single 100k-char word hung q_bpe_merges). 256 chars is
# ~30x the longest real word; dropped words are noise, not vocabulary.
MAX_WORD_CHARS = 256


def word_counts(docs: DataFrame) -> DataFrame:
    """(w, cnt): distinct whitespace words with corpus frequencies.
    Words longer than :data:`MAX_WORD_CHARS` are dropped (see above)."""
    return (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .where((F.length("w") > 0) & (F.length("w") <= MAX_WORD_CHARS))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )


def pair_counts(vocab: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent-symbol pair totals over (syms, cnt) vocab."""
    syms = F.col("syms")
    idx = F.sequence(F.lit(1), F.size(syms) - 1)
    pairs = vocab.where(F.size(syms) >= 2).select(
        "cnt",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(syms, i).alias("a"),
                    F.element_at(syms, i + 1).alias("b"),
                ),
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.sum("cnt").alias("cnt")
    )


def _merge_expr(syms: Column, a: Column, b: Column) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) into a+b via a fold.

    The fold appends each symbol unless the accumulator currently ends
    with ``a`` and the incoming symbol is ``b`` — then the tail is
    replaced by the merged symbol. A just-merged tail CAN serve as the
    left side of the next match (correct: "abab" -> [ab, ab]).

    Guarded (round 12): the fold's repeated array concat is O(len²) in
    copies, but on any given iteration the vast majority of vocab words
    do not contain the winning pair at all — an O(len) adjacency scan
    (zip_with each symbol with its successor, exists) skips the fold for
    them. Words that do contain the pair fold exactly as before, so the
    result is identical; zip_with pads the successor array's tail with
    NULL, whose (x==a)&(NULL==b) term is NULL — ignored by the
    any-true exists semantics."""
    has_pair = F.exists(
        F.zip_with(
            syms,
            F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
            lambda x, y: (x == a) & (y == b),
        ),
        lambda t: t,
    )
    folded = F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (x == b),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(a, b))),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return F.when(has_pair, folded).otherwise(syms)


def bpe_train(docs: DataFrame, n_merges: int) -> tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` BPE merge rules from the corpus, fully in
    DataFrames.

    Returns (merges, vocab): merges as a (rank, left, right, cnt)
    DataFrame in learned order; vocab as the final (w, cnt, syms)
    distinct-word table tokenized under all learned merges. Ties break on
    (count desc, a asc, b asc), a total order, so training is
    deterministic corpus-wide. Precondition: the corpus supports at least
    ``n_merges`` merges (any real text corpus does); if pairs exhaust
    early the remaining ranks simply don't appear.
    """
    vocab = (
        word_counts(docs)
        .withColumn("syms", F.split(F.col("w"), ""))
        .localCheckpoint(eager=True)
    )
    merge_steps: list[DataFrame] = []
    for it in range(n_merges):
        best = (
            pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .select(
                F.col("a").alias("ma"),
                F.col("b").alias("mb"),
                F.col("cnt").alias("mcnt"),
            )
        )
        merge_steps.append(
            best.select(
                F.lit(it).alias("rank"),
                F.col("ma").alias("left"),
                F.col("mb").alias("right"),
                F.col("mcnt").cast("long").alias("cnt"),
            )
        )
        vocab = (
            vocab.crossJoin(F.broadcast(best))
            .withColumn("syms", _merge_expr(F.col("syms"), F.col("ma"), F.col("mb")))
            .drop("ma", "mb", "mcnt")
        )
        if (it + 1) % _CHECKPOINT_EVERY == 0 or it == n_merges - 1:
            vocab = vocab.localCheckpoint(eager=True)
    merges = merge_steps[0]
    for step in merge_steps[1:]:
        merges = merges.unionByName(step)
    return merges, vocab


def bpe_encode_words(vocab: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Tokenize a (w, cnt, syms) word table under an ordered merge list
    (driver-known model artifact, e.g. ``merges_df.collect()``)."""
    out = vocab
    for it, (a, b) in enumerate(merges):
        out = out.withColumn("syms", _merge_expr(F.col("syms"), F.lit(a), F.lit(b)))
        if (it + 1) % _CHECKPOINT_EVERY == 0:
            out = out.localCheckpoint(eager=True)
    return out


_Q_BPE_MERGES = 12


@query(
    "q_bpe_pairs",
    oracle=f"""
    WITH words AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    wc AS (SELECT w, count(*) AS cnt FROM words
           WHERE len(w) >= 2 AND len(w) <= {MAX_WORD_CHARS} GROUP BY w),
    pairs AS (SELECT substr(w, i, 2) AS pair, cnt
              FROM wc, unnest(range(1, len(w))) AS u(i))
    SELECT pair, CAST(sum(cnt) AS BIGINT) AS cnt
    FROM pairs GROUP BY pair
    """,
)
def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iteration-0 BPE statistics: adjacent character-pair frequencies
    weighted by word counts — the exact table the first merge argmaxes
    over. Oracle-checked; the iterative loop itself is q_bpe_merges."""
    d = load_table(spark, sf_dir, "documents")
    vocab = word_counts(d).withColumn("syms", F.split(F.col("w"), ""))
    return pair_counts(vocab).select(
        F.concat("a", "b").alias("pair"), F.col("cnt").cast("long").alias("cnt")
    )


@query("q_bpe_merges")
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 12 learned BPE merges (rows-only: the greedy argmax loop is
    not SQL-expressible; determinism + correctness are pinned against a
    pure-Python reference implementation in tests/test_bpe.py)."""
    d = load_table(spark, sf_dir, "documents")
    merges, _ = bpe_train(d, _Q_BPE_MERGES)
    return merges.select(
        "rank", "left", "right", F.concat("left", "right").alias("merged"), "cnt"
    )


@query("q_bpe_encode")
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BPE token counts under the learned merges (rows-only).

    Encodes the DISTINCT-word table during training, then aggregates per
    document through an equi-join on the word — the corpus text is never
    re-tokenized per occurrence. Output: (doc_id, n_tokens_bpe,
    n_tokens_char) — the char count is the merge-free baseline, so the
    learned tokenizer's compression is visible per row.

    Words over :data:`MAX_WORD_CHARS` are excluded from TRAINING (the
    quadratic-fold cap) but must still COUNT here: the join is a LEFT
    join with a char-length fallback (exactly what BPE yields on a word
    none of the learned merges apply to), so a pathological token makes
    its document's counts conservative instead of silently deleting the
    document's row — a row loss a downstream doc_id join would never
    detect."""
    d = load_table(spark, sf_dir, "documents")
    _, vocab = bpe_train(d, _Q_BPE_MERGES)
    # shuffle-hash hint: the checkpointed vocab reports default stats, so
    # the planner would pick a sort-merge join and SORT the exploded
    # corpus words. A broadcast would be wrong the other way — the
    # distinct-word table grows with the corpus (Heaps' law), and a
    # forced broadcast dies at Spark's 8 GB limit on a crawl-scale
    # corpus. Shuffle-hash sorts nothing and builds its hash table
    # per-partition (vocab/N per task), so it survives any vocab size.
    encoded = vocab.select("w", F.size("syms").alias("n_bpe")).hint("shuffle_hash")
    words = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).where(F.length("w") > 0)
    return (
        words.join(encoded, "w", "left")
        .select(
            "doc_id",
            F.coalesce("n_bpe", F.length("w")).alias("n_bpe"),
            F.length("w").alias("n_char"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("n_bpe").cast("long").alias("n_tokens_bpe"),
            F.sum("n_char").cast("long").alias("n_tokens_char"),
        )
    )
