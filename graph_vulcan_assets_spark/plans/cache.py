"""Result-set cache keyed by a normalized plan fingerprint + input state.

The warehouse pattern behind "query result cache" buttons: a query whose
logical plan AND input files are unchanged returns the materialized
result instead of recomputing. At 100 TB the win is not latency but
repeated-scan suppression — dashboards re-issuing the same rollup every
few minutes re-read nothing.

Fingerprint = sha256 over
  - the ANALYZED logical plan string with expression ids CANONICALLY
    RENUMBERED (#123 differs across sessions for the same query, so raw
    ids can't key a cache — but ERASING them entirely collapses distinct
    plans: ``s = '#1'`` vs ``s = '#2'`` literals, and self-join
    conditions distinguished only by expression identity like
    ``a#1 < a#5`` vs ``a#5 < a#1``, must NOT share a key. Each distinct
    ``#<n>`` token maps to ``#e0``, ``#e1``, … in order of first
    appearance, so attribute identity and literal text survive while
    session-specific numbering cancels out), and
  - each input file's (path, size, mtime) — so ANY change to the backing
    data invalidates, while a byte-identical re-register hits.

Correctness stance: the fingerprint is a conservative key — false MISSES
(a cosmetic plan difference) cost a recompute; false HITS are prevented
by hashing the full normalized plan, which encodes schema, filters,
expressions, attribute identity, and input paths. Reference scope: the
reference has no query cache (every read is an HTTP round trip,
inventory/inventory.go); this is engine generalization.
"""

from __future__ import annotations

import hashlib
import json
import os
import re

from pyspark.sql import DataFrame, SparkSession

# Attribute references print as ``name#id`` / ``sum(x)#id`` — only a
# ``#<n>`` preceded by an identifier-ish char is an expression id; a bare
# `` #1`` is literal text and must survive verbatim (else ``s = '#1'`` and
# ``s = '#2'`` collide).
_EXPR_ID = re.compile(r"(?<=[\w)\]])#(\d+)")


def _renumber_expr_ids(plan: str) -> str:
    """Map each distinct ``#<n>`` to ``#e0``, ``#e1``, … by first
    appearance — canonical across sessions, collision-free within a plan."""
    seen: dict[str, str] = {}

    def sub(m: re.Match[str]) -> str:
        return seen.setdefault(m.group(1), f"#e{len(seen)}")

    return _EXPR_ID.sub(sub, plan)


def plan_fingerprint(df: DataFrame) -> str:
    """Stable digest of the analyzed plan + input-file state."""
    plan = df._jdf.queryExecution().analyzed().toString()
    normalized = _renumber_expr_ids(plan)
    files = []
    for f in sorted(df.inputFiles()):
        local = f.removeprefix("file:")
        try:
            st = os.stat(local)
            files.append((f, st.st_size, int(st.st_mtime_ns)))
        except OSError:
            files.append((f, -1, -1))
    payload = json.dumps({"plan": normalized, "files": files}, sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()


class ResultCache:
    """Materialized-result cache under ``root``; entries are parquet dirs
    committed marker-last (a crash mid-write leaves a miss, never a
    truncated hit)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _paths(self, fp: str) -> tuple[str, str]:
        return os.path.join(self.root, fp), os.path.join(self.root, f"{fp}.ok")

    def lookup(self, df: DataFrame) -> DataFrame | None:
        """The cached result, or None on miss."""
        data, marker = self._paths(plan_fingerprint(df))
        if os.path.exists(marker):
            return self.spark.read.schema(df.schema).parquet(data)
        return None

    def get_or_compute(self, df: DataFrame) -> DataFrame:
        hit = self.lookup(df)
        if hit is not None:
            return hit
        data, marker = self._paths(plan_fingerprint(df))
        df.write.mode("overwrite").parquet(data)
        with open(marker, "w") as f:
            f.write("ok")
        return self.spark.read.schema(df.schema).parquet(data)
