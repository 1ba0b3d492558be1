"""End-to-end demo: raw corpus → dedup → quality gate → decontaminate →
split → pack — the dataset-assembly path of a pre-training pipeline.

Every stage is the registered operator the driver checks, chained on the
documents table:

  1. exact + near-duplicate removal (sha-256 groups, MinHash/LSH pairs →
     connected components → keep cluster minimum);
  2. quality gate (length/density heuristics) + repetition filter;
  3. benchmark decontamination (drop docs sharing 5-grams with the eval
     hold-out);
  4. deterministic hash split into train/validation/test;
  5. deterministic shuffle + token-budget sequence packing of the train
     split.

Run: python examples/demo_curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graph_vulcan_assets_spark.llm import clustering, curation, dedup  # noqa: E402
from graph_vulcan_assets_spark.registry import all_queries  # noqa: E402
from graph_vulcan_assets_spark.session import get_spark  # noqa: E402
from graph_vulcan_assets_spark.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="gvas-curation-demo", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()
    print(f"corpus: {n0} documents")

    # 1. exact dedup, then near-dup clusters → drop non-minimum members
    survivors = qs["q_dedup_exact"](spark, sf_dir).select("doc_id")
    pairs = qs["q_dedup_near"](spark, sf_dir).where(F.col("jaccard_est") >= 0.5)
    comps = clustering.connected_components(pairs)
    dupes = comps.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    deduped = survivors.join(dupes, "doc_id", "left_anti")
    n1 = deduped.count()
    print(f"after dedup: {n1} (-{n0 - n1})")

    # 1b. exact-substring span cleanup: shared >=8-token passages removed
    # from every non-owner survivor (doc-level dedup can't catch these)
    from graph_vulcan_assets_spark.llm import spans as spans_mod

    n_spanned_raw = (
        spans_mod.duplicated_spans(docs).select("doc_id").distinct().count()
    )
    n_spanned_left = (
        spans_mod.duplicated_spans(docs.join(deduped, "doc_id"))
        .select("doc_id").distinct().count()
    )
    print(
        f"span cleanup: {n_spanned_raw} raw docs carried shared passages; "
        f"{n_spanned_left} remain after doc-level dedup (would be excised)"
    )

    # 2. quality + repetition gates
    quality_ok = (
        qs["q_text_quality"](spark, sf_dir).where("passes_quality").select("doc_id")
    )
    low_rep = (
        qs["q_text_repetition"](spark, sf_dir)
        .where(F.col("rep_ratio") < 0.05)
        .select("doc_id")
    )
    gated = deduped.join(quality_ok, "doc_id").join(low_rep, "doc_id")
    n2 = gated.count()
    print(f"after quality+repetition gates: {n2} (-{n1 - n2})")

    # 2b. model-based quality gate (hashed linear classifier) on top of
    # the heuristics — the CCNet/FineWeb-style learned-filter stage
    model_ok = qs["q_quality_classifier"](spark, sf_dir).where("keep").select("doc_id")
    gated = gated.join(model_ok, "doc_id")
    n2b = gated.count()
    print(f"after classifier gate: {n2b} (-{n2 - n2b})")

    # 3. decontamination vs the eval hold-out
    contaminated = qs["q_decontaminate"](spark, sf_dir).select("doc_id")
    clean = gated.join(contaminated, "doc_id", "left_anti")
    n3 = clean.count()
    print(f"after decontamination: {n3} (-{n2b - n3})")

    # 4. deterministic split
    split = curation.assign_split(clean.join(docs, "doc_id"))
    print("split sizes:", {r["split"]: r["n"] for r in
                           split.groupBy("split").agg(F.count("*").alias("n")).collect()})

    # 5. pack the train split into token-budget sequences
    packs = qs["q_pack_sequences"](spark, sf_dir).join(
        split.where(F.col("split") == "train").select("doc_id"), "doc_id"
    )
    stats = packs.agg(
        F.countDistinct("shard", "pack_no").alias("n_packs"),
        F.sum("n_tokens").alias("total_tokens"),
    ).collect()[0]
    print(f"train packing: {stats['n_packs']} packs, {stats['total_tokens']} tokens")

    # 6. temperature-resampled language mixture of the clean train set
    mix = qs["q_mix_temperature"](spark, sf_dir).join(
        split.where(F.col("split") == "train").select("doc_id"), "doc_id"
    )
    by_lang = {
        r["lang"]: r["copies"]
        for r in mix.groupBy("lang").agg(F.sum("n_copies").alias("copies")).collect()
    }
    print(f"temperature mix (tau=0.5) copies by lang: {by_lang}")

    # 7. deterministic shuffle into training-order shards
    order = qs["q_corpus_shuffle"](spark, sf_dir).join(mix.select("doc_id"), "doc_id")
    shards = order.groupBy("shard").agg(F.count("*").alias("n")).orderBy("shard")
    sizes = [r["n"] for r in shards.collect()]
    print(f"training order: {len(sizes)} shards, sizes {min(sizes)}..{max(sizes)}")

    # 8. tokenizer budget report: train a 12-merge BPE on the clean set
    # and report the token budget vs the character baseline
    from graph_vulcan_assets_spark.llm import bpe

    merges_df, vocab = bpe.bpe_train(clean.join(docs, "doc_id"), 12)
    enc = vocab.select(F.col("cnt") * F.size("syms"), F.col("cnt") * F.length("w"))
    tot_bpe, tot_char = enc.groupBy().sum().collect()[0]
    print(f"tokenizer: 12 merges learned; {tot_bpe} BPE tokens vs {tot_char} chars "
          f"({100.0 * tot_bpe / tot_char:.1f}%)")


if __name__ == "__main__":
    main()
