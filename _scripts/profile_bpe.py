"""Phase profile of q_bpe_encode at $SPARK_GRAFT_SF_DIR: times the initial
word-count checkpoint, each training iteration's argmax+attach, the
checkpoints, and the final encode join separately (guide §1: know where
the seconds go before changing anything)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graph_vulcan_assets_spark.llm import bpe  # noqa: E402
from graph_vulcan_assets_spark.session import get_spark  # noqa: E402
from graph_vulcan_assets_spark.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="gvas-profile-bpe")
    docs = load_table(spark, sf_dir, "documents")

    # warm
    bpe.q_bpe_encode(spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()

    t0 = time.perf_counter()
    vocab = (
        bpe.word_counts(docs)
        .withColumn("syms", F.split(F.col("w"), ""))
        .localCheckpoint(eager=True)
    )
    t1 = time.perf_counter()
    print(f"PHASE word_counts+checkpoint: {t1 - t0:.3f}s  rows={vocab.count()}")
    npairs = bpe.pair_counts(vocab).count()
    print(f"  distinct pairs at iter0: {npairs}")

    merge_steps = []
    for it in range(bpe._Q_BPE_MERGES):
        ta = time.perf_counter()
        best = (
            bpe.pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .select(
                F.col("a").alias("ma"),
                F.col("b").alias("mb"),
                F.col("cnt").alias("mcnt"),
            )
        )
        merge_steps.append(best)
        vocab = (
            vocab.crossJoin(F.broadcast(best))
            .withColumn("syms", bpe._merge_expr(F.col("syms"), F.col("ma"), F.col("mb")))
            .drop("ma", "mb", "mcnt")
        )
        tb = time.perf_counter()
        ck = ""
        if (it + 1) % bpe._CHECKPOINT_EVERY == 0 or it == bpe._Q_BPE_MERGES - 1:
            vocab = vocab.localCheckpoint(eager=True)
            ck = f" checkpoint: {time.perf_counter() - tb:.3f}s"
        print(f"PHASE iter {it}: build {tb - ta:.3f}s{ck}")

    t2 = time.perf_counter()
    encoded = vocab.select("w", F.size("syms").alias("n_bpe")).hint("shuffle_hash")
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w")).where(
        F.length("w") > 0
    )
    out = (
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
    out.write.format("noop").mode("overwrite").save()
    t3 = time.perf_counter()
    print(f"PHASE encode join: {t3 - t2:.3f}s")
    print(f"TOTAL: {t3 - t0:.3f}s")


if __name__ == "__main__":
    main()
