"""Event-stream fixtures for the temporal-graph tests.

`golden_messages()` is an original scenario script covering the behavior
matrix of the reference's end-to-end golden test
(cmd/graph-vulcan-assets/testdata/messages.json + expected state in
main_test.go:158-372): multi-team ownership, AWS annotations in short and
long form, expire-one-of-two-owners, expire-last-owner cascade,
expire-then-recreate resurrection, no-op expires of nonexistent entities,
re-expire of an already-expired asset, and gate rejects (bad version,
missing header, malformed key).

`random_messages(seed)` generates adversarial random event sequences for
the batch-replay ≡ sequential-interpreter equivalence property.
"""

from __future__ import annotations

import datetime
import json
import random

AWS_ANNOTATION_KEY = "autodiscovery/security/aws-account"
_T0 = datetime.datetime(2024, 3, 1, 0, 0, 0)


def _ts(minutes: int) -> datetime.datetime:
    return _T0 + datetime.timedelta(minutes=minutes)


def _meta(version: str, atype: str, ident: str) -> list[dict]:
    return [
        {"key": "version", "value": version},
        {"key": "type", "value": atype},
        {"key": "identifier", "value": ident},
    ]


def refresh_msg(
    seq: int,
    minutes: int,
    team: str,
    team_name: str,
    atype: str,
    ident: str,
    annotations: list[tuple[str, str]] | None = None,
    version: str = "v0.2.0",
) -> dict:
    payload = {
        "Id": f"asset-{ident}",
        "Team": {"Id": team, "Name": team_name, "Description": "", "Tag": ""},
        "Alias": "",
        "Rolfp": "R:0/O:0/L:0/F:0/P:0+S:0",
        "Scannable": True,
        "AssetType": atype,
        "Identifier": ident,
        "Annotations": [{"Key": k, "Value": v} for k, v in (annotations or [])],
    }
    return {
        "seq": seq,
        "ts": _ts(minutes),
        "key": f"{team}/asset-{ident}",
        "value": json.dumps(payload),
        "metadata": _meta(version, atype, ident),
    }


def tombstone_msg(
    seq: int, minutes: int, team: str, atype: str, ident: str, version: str = "v0.2.0"
) -> dict:
    return {
        "seq": seq,
        "ts": _ts(minutes),
        "key": f"{team}/asset-{ident}",
        "value": None,
        "metadata": _meta(version, atype, ident),
    }


def golden_messages() -> list[dict]:
    aws_short = ("000000000001", "arn:aws:iam::000000000001:root")
    aws_long = "arn:aws:iam::000000000002:root"
    return [
        # h1 created by t1 with short-form AWS annotation
        refresh_msg(1, 0, "t1", "Team One", "Hostname", "h1.example.com",
                    [(AWS_ANNOTATION_KEY, aws_short[0]), ("other/key", "ignored")]),
        # h1 also owned by t2
        refresh_msg(2, 5, "t2", "Team Two", "Hostname", "h1.example.com"),
        # h2 created by t1 with long-form AWS annotation
        refresh_msg(3, 10, "t1", "Team One", "Hostname", "h2.example.com",
                    [(AWS_ANNOTATION_KEY, aws_long)]),
        # h1 refreshed by t1 (last_seen advances; owns start_time preserved)
        refresh_msg(4, 15, "t1", "Team One (renamed)", "Hostname", "h1.example.com",
                    [(AWS_ANNOTATION_KEY, aws_short[0])]),
        # expire one of two owners: h1 stays alive, t1 owns ends
        tombstone_msg(5, 20, "t1", "Hostname", "h1.example.com"),
        # expire last owner: h1 expires, its AWS edge expires
        tombstone_msg(6, 25, "t2", "Hostname", "h1.example.com"),
        # recreate h1 by t1: resurrection — first_seen/start_time preserved
        refresh_msg(7, 30, "t1", "Team One", "Hostname", "h1.example.com"),
        # no-op: tombstone for an asset that never existed
        tombstone_msg(8, 35, "t1", "Hostname", "ghost.example.com"),
        # no-op: tombstone from a team that never existed
        tombstone_msg(9, 40, "t9", "Hostname", "h2.example.com"),
        # gate rejects: unsupported major version
        refresh_msg(10, 45, "t1", "Team One", "Hostname", "v1.example.com",
                    version="v1.0.0"),
        # gate rejects: missing identifier header
        {
            "seq": 11,
            "ts": _ts(50),
            "key": "t1/asset-x",
            "value": None,
            "metadata": [
                {"key": "version", "value": "v0.2.0"},
                {"key": "type", "value": "Hostname"},
            ],
        },
        # gate rejects: malformed key (no slash)
        {
            "seq": 12,
            "ts": _ts(55),
            "key": "nokeyseparator",
            "value": None,
            "metadata": _meta("v0.2.0", "Hostname", "h2.example.com"),
        },
        # h3 created then expired by its only team → cascade to its edge
        refresh_msg(13, 60, "t3", "Team Three", "DockerImage", "img:latest",
                    [(AWS_ANNOTATION_KEY, "000000000003")]),
        tombstone_msg(14, 65, "t3", "DockerImage", "img:latest"),
        # re-expire an already-expired asset: times advance, edge expiry sticks
        tombstone_msg(15, 70, "t3", "DockerImage", "img:latest"),
    ]


def random_messages(seed: int, n: int = 120) -> list[dict]:
    """Adversarial random sequences over small entity pools (high collision
    probability ⇒ deep upsert/expire/resurrect interleavings)."""
    rng = random.Random(seed)
    teams = [f"t{i}" for i in range(4)] + ["ghost-team"]
    idents = [f"a{i}.example.com" for i in range(5)]
    accounts = ["000000000001", "arn:aws:iam::000000000002:root", "bad-account!"]
    msgs: list[dict] = []
    for seq in range(1, n + 1):
        minutes = seq
        team = rng.choice(teams)
        ident = rng.choice(idents)
        atype = rng.choice(["Hostname", "DockerImage"])
        kind = rng.random()
        if kind < 0.55:
            anns = []
            if rng.random() < 0.4:
                anns.append((AWS_ANNOTATION_KEY, rng.choice(accounts)))
            if rng.random() < 0.1:
                anns.append(("other/key", "x"))
            version = "v0.1.0" if rng.random() < 0.9 else "v1.0.0"
            msgs.append(
                refresh_msg(seq, minutes, team, f"Team {team}", atype, ident, anns, version)
            )
        else:
            msgs.append(tombstone_msg(seq, minutes, team, atype, ident))
    return msgs


def skewed_messages(seed: int, n: int = 8000, n_assets: int = 200, hot_frac: float = 0.5) -> list[dict]:
    """Hot-key stream: ONE asset receives ``hot_frac`` of all events
    (realistic for a popular host being re-scanned constantly); the rest
    spread uniformly over ``n_assets - 1`` identifiers. Pair with
    ``uniform_messages`` at equal n/n_assets for skew stress comparisons."""
    rng = random.Random(seed)
    idents = [f"h{i}.example.com" for i in range(n_assets)]
    teams = [f"t{i}" for i in range(8)]
    msgs: list[dict] = []
    for seq in range(1, n + 1):
        ident = idents[0] if rng.random() < hot_frac else rng.choice(idents[1:])
        team = rng.choice(teams)
        if rng.random() < 0.8:
            anns = [(AWS_ANNOTATION_KEY, "000000000001")] if rng.random() < 0.3 else []
            msgs.append(
                refresh_msg(seq, seq, team, f"Team {team}", "Hostname", ident, anns, "v0.1.0")
            )
        else:
            msgs.append(tombstone_msg(seq, seq, team, "Hostname", ident))
    return msgs


def uniform_messages(seed: int, n: int = 8000, n_assets: int = 200) -> list[dict]:
    """Control stream for skew stress: same event mix as
    ``skewed_messages`` but keys uniform over all ``n_assets``."""
    return skewed_messages(seed, n=n, n_assets=n_assets, hot_frac=0.0)


def adversarial_messages(seed: int, n: int = 40) -> list[dict]:
    """Property-test streams beyond ``random_messages``' mix: a tiny key
    pool with heavy tombstone weight produces LONG resurrection chains
    (expire→recreate→expire...), multiple teams owning the same asset with
    interleaved expiries, and — via a clock that only advances about half
    the time — runs of distinct events sharing one timestamp, so ordering
    must come from ``seq`` alone (same-ts seq ties)."""
    rng = random.Random(seed)
    idents = ["r0.example.com", "r1.example.com", "r2.example.com"]
    teams = ["tA", "tB", "tC"]
    accounts = ["000000000001", "arn:aws:iam::000000000002:root"]
    msgs: list[dict] = []
    minutes = 0
    for seq in range(1, n + 1):
        if rng.random() < 0.5:
            minutes += 1  # else: tie with the previous event's timestamp
        ident = rng.choice(idents)
        team = rng.choice(teams)
        atype = rng.choice(["Hostname", "DockerImage"])
        if rng.random() < 0.55:
            anns = (
                [(AWS_ANNOTATION_KEY, rng.choice(accounts))]
                if rng.random() < 0.5
                else []
            )
            msgs.append(
                refresh_msg(seq, minutes, team, f"Team {team}", atype, ident, anns, "v0.1.0")
            )
        else:
            msgs.append(tombstone_msg(seq, minutes, team, atype, ident))
    return msgs


def disjoint_messages(prefix: str, seq0: int, n: int) -> list[dict]:
    """``n`` refreshes over ``n`` BRAND-NEW identifiers (``prefix``-scoped,
    never reused): pure state growth that touches nothing pre-existing.
    Drives the sink load rehearsal — accumulated state grows while each
    subsequent batch's touched-key set stays constant-size. AWS-account
    parents are prefix-scoped too: a REUSED parent is legitimately
    O(its accumulated fan-out) to touch (its index pointers cover every
    child bucket it ever gained), which would confound the pure
    state-growth measurement."""
    msgs: list[dict] = []
    for i in range(n):
        seq = seq0 + i
        team = f"t{i % 4}"
        anns = (
            [(AWS_ANNOTATION_KEY, f"arn:aws:iam::{prefix}-{(i // 3) % 3}:root")]
            if i % 3 == 0
            else []
        )
        msgs.append(
            refresh_msg(seq, seq, team, f"Team {team}", "Hostname",
                        f"{prefix}-{i}.example.com", anns, "v0.1.0")
        )
    return msgs
