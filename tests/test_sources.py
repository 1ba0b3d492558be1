"""Format round-trips: csv / jsonl / orc readers reproduce the parquet
source exactly (schema-pinned, no inference)."""

from __future__ import annotations

from graph_vulcan_assets_spark.sources.readers import (
    _CSV_NULL,
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

    got_csv = read_csv(spark, paths["csv"], src.schema, null_value=_CSV_NULL)
    got_json = read_jsonl(spark, paths["json"], src.schema)
    got_orc = read_orc(spark, paths["orc"])
    for got in (got_csv, got_json, got_orc):
        assert got.schema == src.schema
        assert sorted(tuple(r) for r in got.collect()) == expected


def test_read_csv_null_conventions(spark, tmp_path):
    """The \\N sentinel is scoped to this repo's round trip (round-5
    advice): by default an EXTERNALLY produced CSV that encodes NULL as an
    empty field reads NULL back as NULL (Spark's standard convention),
    and a literal \\N field stays the two-character string. Opting in via
    null_value=_CSV_NULL flips both: \\N becomes NULL and the empty field
    becomes '' (the round-trip files' on-disk convention)."""
    import pyspark.sql.types as T

    p = tmp_path / "ext"
    p.mkdir()
    (p / "part.csv").write_text('id,name\n1,\n2,\\N\n3,x\n4,""\n')
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )

    default = {r["id"]: r["name"] for r in read_csv(spark, str(p), schema).collect()}
    assert default == {1: None, 2: "\\N", 3: "x", 4: None}

    # with the sentinel: \N → NULL, QUOTED empty ("" — what this repo's
    # writers emit for '') → ''; an unquoted empty field stays NULL under
    # both conventions (it is inherently ambiguous in CSV)
    sentinel = {
        r["id"]: r["name"]
        for r in read_csv(spark, str(p), schema, null_value=_CSV_NULL).collect()
    }
    assert sentinel == {1: None, 2: None, 3: "x", 4: ""}
