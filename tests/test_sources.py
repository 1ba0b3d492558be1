"""Format round-trips: csv / jsonl / orc readers reproduce the parquet
source exactly (schema-pinned, no inference)."""

from __future__ import annotations

from graph_vulcan_assets_spark.sources.readers import (
    read_csv,
    read_jsonl,
    read_orc,
    write_round_trip_formats,
)
from graph_vulcan_assets_spark.tables import load_table


def test_round_trip_all_formats(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "nation")
    paths = write_round_trip_formats(src, str(tmp_path))
    expected = sorted(tuple(r) for r in src.collect())

    got_csv = read_csv(spark, paths["csv"], src.schema)
    got_json = read_jsonl(spark, paths["json"], src.schema)
    got_orc = read_orc(spark, paths["orc"])
    for got in (got_csv, got_json, got_orc):
        assert got.schema == src.schema
        assert sorted(tuple(r) for r in got.collect()) == expected
