"""Sequential reference interpreter for the temporal-graph semantics.

A deliberately simple, single-threaded Python state machine that applies
events one at a time — the same contract as the reference's blocking
consumer loop (stream/kafka/kafka.go:69-105 feeding
cmd/graph-vulcan-assets/main.go:95-364). It exists purely as a test oracle:
the distributed batch replay (plans/temporal.py) and the streaming
incremental apply must produce exactly this state for any event sequence.
"""

from __future__ import annotations

import datetime
import json
import re
from dataclasses import dataclass, field

UNEXPIRED = datetime.datetime(9999, 12, 12, 23, 59, 59)
AWS_ANNOTATION_KEY = "autodiscovery/security/aws-account"
_SHORT_AWS_RE = re.compile(r"^[0-9]{12}$")
_LONG_AWS_RE = re.compile(r"^arn:aws:iam::[0-9]{12}:root$")
_SEMVER_MAJOR0 = re.compile(r"^v?(\d+)(\.[^.]*){2,}$")


@dataclass
class Asset:
    first_seen: datetime.datetime
    last_seen: datetime.datetime
    expiration: datetime.datetime


@dataclass
class Owns:
    start_time: datetime.datetime
    end_time: datetime.datetime | None


@dataclass
class Edge:
    first_seen: datetime.datetime
    last_seen: datetime.datetime
    expiration: datetime.datetime


@dataclass
class State:
    assets: dict[tuple[str, str], Asset] = field(default_factory=dict)
    teams: dict[str, str] = field(default_factory=dict)  # id -> name
    owns: dict[tuple[str, str, str], Owns] = field(default_factory=dict)
    # (child_type, child_id, parent_type, parent_id) -> Edge
    edges: dict[tuple[str, str, str, str], Edge] = field(default_factory=dict)


def _version_ok(version: str | None) -> bool:
    if version is None:
        return False
    m = _SEMVER_MAJOR0.match(version)
    if not m:
        return False
    try:
        return int(m.group(1)) == 0
    except ValueError:
        return False


def normalize_aws(account: str) -> str | None:
    if _LONG_AWS_RE.match(account):
        return account
    if _SHORT_AWS_RE.match(account):
        return f"arn:aws:iam::{account}:root"
    return None


def apply_message(state: State, msg: dict) -> None:
    """Apply one raw message {seq, ts, key, value, metadata} to the state."""
    meta = {m["key"]: m["value"] for m in (msg.get("metadata") or [])}
    version, atype, ident = meta.get("version"), meta.get("type"), meta.get("identifier")
    if not (version and atype and ident) or not _version_ok(version):
        return  # dead-letter split (engine deviation from halt-on-error)
    key = msg.get("key") or ""
    parts = key.split("/")
    if len(parts) != 2:
        return
    key_team = parts[0]
    now = msg["ts"]

    if msg.get("value") is None:
        _expire(state, atype, ident, key_team, now)
        return

    payload = json.loads(msg["value"])
    team_id = (payload.get("Team") or {}).get("Id") or key_team
    team_name = (payload.get("Team") or {}).get("Name")
    annotations = payload.get("Annotations") or []

    _refresh_asset(state, atype, ident, now)
    state.teams[team_id] = team_name
    _set_owner(state, atype, ident, team_id, now)
    for ann in annotations:
        if ann.get("Key") != AWS_ANNOTATION_KEY:
            continue
        arn = normalize_aws(ann.get("Value") or "")
        if arn is None:
            continue  # dead-letter (reference halts)
        _refresh_asset(state, "AWSAccount", arn, now)
        edge_key = (atype, ident, "AWSAccount", arn)
        edge = state.edges.get(edge_key)
        if edge is None:
            state.edges[edge_key] = Edge(now, now, UNEXPIRED)
        else:
            edge.last_seen, edge.expiration = now, UNEXPIRED


def _refresh_asset(state: State, atype: str, ident: str, now) -> None:
    a = state.assets.get((atype, ident))
    if a is None:
        state.assets[(atype, ident)] = Asset(now, now, UNEXPIRED)
    else:
        a.last_seen, a.expiration = now, UNEXPIRED


def _set_owner(state: State, atype: str, ident: str, team_id: str, now) -> None:
    o = state.owns.get((atype, ident, team_id))
    start = o.start_time if o is not None else now  # main.go:199-218
    state.owns[(atype, ident, team_id)] = Owns(start, None)


def _expire(state: State, atype: str, ident: str, team_id: str, now) -> None:
    asset = state.assets.get((atype, ident))
    if asset is None:
        return  # main.go:276-279
    if team_id not in state.teams:
        return  # main.go:289-292

    active = False
    for (at, idn, t), o in state.owns.items():
        if (at, idn) != (atype, ident):
            continue
        if t != team_id:
            if o.end_time is None:
                active = True
            continue
        o.end_time = now  # keep start_time — main.go:300-317
    if active:
        return  # main.go:319-323

    asset.last_seen = asset.expiration = now  # main.go:326-329
    for ekey, e in state.edges.items():
        ct, ci, pt, pi = ekey
        if (ct, ci) != (atype, ident) and (pt, pi) != (atype, ident):
            continue
        if e.expiration <= now:
            continue  # skip already expired — main.go:338,354
        e.last_seen = e.expiration = now


def run(messages: list[dict]) -> State:
    state = State()
    for msg in sorted(messages, key=lambda m: m["seq"]):
        apply_message(state, msg)
    return state
