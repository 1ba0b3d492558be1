"""Read-API tests over replayed state — mirrors the reference's readback
verification queries (main_test.go:439-540, inventory_test.go:77-950)."""

from __future__ import annotations

import datetime

from graph_vulcan_assets_spark.plans import fixtures
from graph_vulcan_assets_spark.plans.api import InventoryAPI
from graph_vulcan_assets_spark.plans.temporal import RAW_SCHEMA, replay_raw


def build_api(spark):
    raw = spark.createDataFrame(fixtures.golden_messages(), schema=RAW_SCHEMA)
    return InventoryAPI(replay_raw(raw))


def ts(minutes):
    return datetime.datetime(2024, 3, 1) + datetime.timedelta(minutes=minutes)


def test_exact_match_never_prefix(spark):
    api = build_api(spark)
    assert api.assets("Hostname", "h1.example.com").count() == 1
    # partial identifier → empty (inventory_test.go:299-314)
    assert api.assets("Hostname", "h1").count() == 0
    assert api.teams("t1").count() == 1
    assert api.teams("t").count() == 0


def test_valid_at_point_in_time(spark):
    api = build_api(spark)
    # valid_at compares against the CURRENT row interval — the store keeps
    # no interval history (inventory.go:173-193, inventory_test.go:291-298).
    # Resurrected h1's interval is [0, Unexpired]: covers any t >= 0.
    assert api.assets("Hostname", "h1.example.com", valid_at=ts(20)).count() == 1
    assert api.assets("Hostname", "h1.example.com", valid_at=ts(27)).count() == 1
    # before creation → invisible
    assert api.assets("Hostname", "h1.example.com", valid_at=ts(-1)).count() == 0
    # img:latest ended at 70: interval [60, 70]
    assert api.assets("DockerImage", "img:latest", valid_at=ts(65)).count() == 1
    assert api.assets("DockerImage", "img:latest", valid_at=ts(75)).count() == 0


def test_owners_join(spark):
    api = build_api(spark)
    owners = {r["team_id"]: (r["end_time"], r["team_name"])
              for r in api.owners("Hostname", "h1.example.com").collect()}
    assert owners["t1"] == (None, "Team One")          # resurrected, active
    assert owners["t2"][0] == ts(25)                   # ended at 25
    assert owners["t2"][1] == "Team Two"


def test_parents_children_traversal(spark):
    api = build_api(spark)
    arn1 = "arn:aws:iam::000000000001:root"
    parents = api.parents("Hostname", "h1.example.com").collect()
    assert [(p["parent_type"], p["parent_identifier"]) for p in parents] == [
        ("AWSAccount", arn1)
    ]
    kids = api.children("AWSAccount", arn1).collect()
    assert [(c["child_type"], c["child_identifier"]) for c in kids] == [
        ("Hostname", "h1.example.com")
    ]


def test_id_roundtrip_traversals(spark):
    """Id-keyed API surface (inventory.go:497-628): assets() surfaces a
    deterministic surrogate id; the traversals accept it; edge ids resolve
    back to identifiers — main_test.go:524-540's readback joins."""
    api = build_api(spark)
    h1 = api.assets("Hostname", "h1.example.com").collect()[0]
    assert isinstance(h1["id"], int)

    # natural-key call and id-keyed call return identical edge sets
    by_key = api.parents("Hostname", "h1.example.com").collect()
    by_id = api.parents(asset_id=h1["id"]).collect()
    assert [(r["parent_type"], r["parent_identifier"]) for r in by_key] == [
        (r["parent_type"], r["parent_identifier"]) for r in by_id
    ]

    # edge carries parent_id/child_id; parent_id resolves to the account
    edge = by_id[0]
    assert edge["child_id"] == h1["id"]
    acct = api.asset_by_id(edge["parent_id"]).collect()
    assert len(acct) == 1
    assert (acct[0]["type"], acct[0]["identifier"]) == (
        "AWSAccount",
        "arn:aws:iam::000000000001:root",
    )
    # children by id from the resolved parent
    kids = api.children(asset_id=edge["parent_id"]).collect()
    assert [(c["child_type"], c["child_identifier"]) for c in kids] == [
        ("Hostname", "h1.example.com")
    ]

    # owners by id: same rows as the natural-key form; team_ref resolves
    own_key = api.owners("Hostname", "h1.example.com").collect()
    own_id = api.owners(asset_id=h1["id"]).collect()
    assert {r["team_id"] for r in own_key} == {r["team_id"] for r in own_id}
    t = api.team_by_id(own_id[0]["team_ref"]).collect()
    assert len(t) == 1 and t[0]["identifier"] == own_id[0]["team_id"]

    # ids are deterministic across a fresh replay (no sequence state)
    api2 = build_api(spark)
    h1_again = api2.assets("Hostname", "h1.example.com").collect()[0]
    assert h1_again["id"] == h1["id"]


def test_pagination(spark):
    api = build_api(spark)
    all_assets = [
        (r["type"], r["identifier"]) for r in api.assets().collect()
    ]
    paged = []
    page = 0
    while True:
        rows = api.assets(page=page, size=2).collect()
        if not rows:
            break
        paged.extend((r["type"], r["identifier"]) for r in rows)
        page += 1
    assert paged == sorted(all_assets)
    # size=0 disables pagination (inventory.go:149-163)
    assert api.assets(page=5, size=0).count() == len(all_assets)


def test_assets_after_keyset_walk(spark):
    """Walking the full asset listing by keyset cursor visits exactly the
    offset-paginated sequence, page by page."""
    msgs = fixtures.golden_messages()
    state = replay_raw(spark.createDataFrame(msgs, schema=RAW_SCHEMA))
    api = InventoryAPI(state)

    want = [
        (r["type"], r["identifier"])
        for r in api.assets().orderBy("type", "identifier").collect()
    ]
    got, cursor = [], None
    while True:
        page = [
            (r["type"], r["identifier"])
            for r in api.assets_after(cursor, size=3).collect()
        ]
        if not page:
            break
        got.extend(page)
        cursor = page[-1]
    assert got == want and len(got) > 3  # multiple pages actually walked
