"""End-to-end demo: stream ingestion → state → query API → time travel.

What a user of adevinta/graph-vulcan-assets does with Kafka + the REST
inventory, done here with Structured Streaming + DataFrames:

  1. fixture messages arrive as micro-batches (file source standing in for
     the Kafka topic);
  2. each batch incrementally updates the temporal graph state
     (idempotent foreachBatch — effective exactly-once);
  3. the inventory read API answers the reference's query surface;
  4. the history module answers time-travel questions the reference can't.

Run: python examples/demo_temporal_pipeline.py
"""

from __future__ import annotations

import datetime
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_vulcan_assets_spark.plans import fixtures  # noqa: E402
from graph_vulcan_assets_spark.plans.api import InventoryAPI  # noqa: E402
from graph_vulcan_assets_spark.plans.history import asset_history, assets_as_of  # noqa: E402
from graph_vulcan_assets_spark.plans.temporal import RAW_SCHEMA, decode_events  # noqa: E402
from graph_vulcan_assets_spark.session import get_spark  # noqa: E402
from graph_vulcan_assets_spark.streaming.ingest import TemporalGraphStream  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="gvas-demo", master="local[4]", shuffle_partitions=4)
    msgs = fixtures.golden_messages()

    with tempfile.TemporaryDirectory() as td:
        # 1-2. stream the fixture in three micro-batches into graph state
        input_dir = os.path.join(td, "input")
        os.makedirs(input_dir)
        import json

        base = 1_700_000_000
        for i in range(3):
            path = os.path.join(input_dir, f"chunk-{i}.json")
            with open(path, "w") as f:
                for m in msgs[i * 5 : (i + 1) * 5]:
                    row = dict(m)
                    row["ts"] = m["ts"].isoformat()
                    f.write(json.dumps(row) + "\n")
            os.utime(path, (base + 10 * i, base + 10 * i))

        stream = TemporalGraphStream(spark, os.path.join(td, "state"))
        q = stream.run_file_stream(input_dir, os.path.join(td, "ckpt"))
        q.awaitTermination(120)
        state = stream.read_state()
        print(f"\n== ingested {len(msgs)} messages in {len(stream._applied_batches())} micro-batches")

        # 3. the reference's query surface
        api = InventoryAPI(state)
        print("\n== assets ==")
        api.assets().show(truncate=False)
        print("== owners of h1.example.com ==")
        api.owners("Hostname", "h1.example.com").show(truncate=False)
        print("== parents of h1.example.com (AWS account edges) ==")
        api.parents("Hostname", "h1.example.com").show(truncate=False)

        # 4. time travel: h1 was expired at minute 27, then resurrected —
        #    the current-state valid_at cannot see the expiry; history can
        raw = spark.createDataFrame(msgs, schema=RAW_SCHEMA)
        hist = asset_history(decode_events(raw))
        t = datetime.datetime(2024, 3, 1, 0, 27)
        print(f"== snapshot as of {t} (history: h1 shows EXPIRED) ==")
        assets_as_of(hist, t).orderBy("type", "identifier").show(truncate=False)


if __name__ == "__main__":
    main()
