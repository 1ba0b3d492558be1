"""Regenerate PLANS_r{N}.md (round via SPARK_GRAFT_ROUND, default 2) — physical-plan audit of the headline queries."""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from graph_vulcan_assets_spark.registry import all_queries  # noqa: E402
from graph_vulcan_assets_spark.session import get_spark  # noqa: E402


def _nonquery_plan_dfs(spark, sf_dir):
    """Plan-audit rows for the bench entries that are not registry queries
    (VERDICT r4 #4): the temporal replay and the four storage-layer ops.
    Built over a SMALL store (plan shape is SF-independent; the timed
    bench sizes them for asymptotics, this audit only needs the dataflow)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from graph_vulcan_assets_spark.plans.fixtures import random_messages
    from graph_vulcan_assets_spark.plans.temporal import (
        RAW_SCHEMA,
        replay_raw,
        tag_union_state,
    )
    from graph_vulcan_assets_spark.sources.bucketstore import BucketTable
    from graph_vulcan_assets_spark.sources.secondary_index import SecondaryIndex
    from graph_vulcan_assets_spark.tables import load_table

    raw = spark.createDataFrame(random_messages(7, n=500), schema=RAW_SCHEMA)
    yield "temporal_replay_20k_events", tag_union_state(replay_raw(raw))

    root = tempfile.mkdtemp(prefix="gvas_plans_store_")
    try:
        events = load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", "value"
        )
        t = BucketTable(spark, os.path.join(root, "ev"), key_cols=["event_id"], n_buckets=16)
        t.upsert(events)
        batch = events.where(
            F.pmod(F.xxhash64("event_id"), F.lit(16)).cast("int") < 1
        ).withColumn("value", F.col("value") + F.lit(1))
        yield "store_upsert_small_touch", t.merge_plan(batch)
        yield "store_full_rewrite", events
        t.upsert(batch)
        prev, head = t.commits()[-2], t.commits()[-1]
        feed = t.changes(prev, head)
        yield "store_cdf_read", feed
        idx = SecondaryIndex(spark, os.path.join(root, "idx"), t, column="user_id")
        stale, fresh = idx.delta_plans(feed)
        yield "store_index_refresh", stale.unionByName(fresh)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    rnd = os.environ.get("SPARK_GRAFT_ROUND", "2")
    spark = get_spark(master="local[8]")
    qs = all_queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lines = [
        f"# PLANS_r{rnd} — physical-plan audit of the headline queries",
        "",
        "Generated from `.explain('formatted')` at sf0.1 (local[8], AQE on).",
        "Regenerate: `python _scripts/gen_plans.py` (this file is a snapshot).",
        "",
        "| query | joins | aggregates | window | exchanges | pushed filters |",
        "|---|---|---|---|---|---|",
    ]
    # non-headline operators whose plan shape is worth auditing each round
    extra = [
        "q_split_train_test",
        "q_sample_stratified",
        "q_corpus_mix",
        "q_decontaminate",
        "q_pack_sequences",
        "q_graph_ancestors",
        "q_multimodal_features",
        # round-3 additions
        "q_corpus_shuffle",
        "q_mix_temperature",
        "q_length_buckets",
        "q_vocab_topn",
        "q_keyset_page",
        "q_session_window",
        "q_dedup_containment",
        "q_text_search_indexed",
        "q_join_asof_tolerance",
        "q_quantile_filter",
        "q_mix_materialize",
        "q_pq_codes",
        "q_pq_adc_topk",
        "q_recursive_cte",
        # round-3 late additions (sketches/quality/normalize/bm25/semdedup/dq
        # are also in HEADLINE where they carry timings; the rest here)
        "q_text_normalize",
        "q_classifier_route",
        "q_dq_checks",
        "q_embed_matryoshka",
        "q_lang_confusion",
        "q_sim_mrl_rerank",
        "q_timeseries_gapfill",
        "q_timeseries_interpolate",
        "q_anomaly_zscore",
    ]
    def plan_dfs():
        seen = set()
        for name in HEADLINE + [x for x in extra if x in qs]:
            if name not in seen:  # HEADLINE and extra overlap
                seen.add(name)
                yield name, qs[name](spark, sf_dir)
        yield from _nonquery_plan_dfs(spark, sf_dir)

    for name, df in plan_dfs():
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        p = buf.getvalue()
        joins = sorted(set(re.findall(r"(\w+Join\w*) ", p)))
        aggs = len(re.findall(r"\(\d+\) \w*Aggregate", p))
        wins = len(re.findall(r"\(\d+\) Window", p)) + p.count("WindowGroupLimit")
        exch = len(re.findall(r"\(\d+\) (?:Broadcast)?Exchange", p))
        pushed = (
            "yes"
            if "PushedFilters: [" in p and not re.search(r"PushedFilters: \[\]", p)
            else "—"
        )
        lines.append(
            f"| `{name}` | {', '.join(joins) if joins else '—'} | {aggs} | {wins} | {exch} | {pushed} |"
        )
    lines += [
        "",
        "Invariants enforced by `tests/test_plans.py`: no CartesianProduct /",
        "BroadcastNestedLoopJoin anywhere in pair-generating operators; filter",
        "pushdown and column pruning reach the Parquet scan; top-k compiles to",
        "WindowGroupLimit / TakeOrderedAndProject; aggregates are partial+final.",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), f"PLANS_r{rnd}.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
