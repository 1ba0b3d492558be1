"""Result-set cache keyed by a normalized plan fingerprint + input state.

The warehouse pattern behind "query result cache" buttons: a query whose
logical plan AND input files are unchanged returns the materialized
result instead of recomputing. At 100 TB the win is not latency but
repeated-scan suppression — dashboards re-issuing the same rollup every
few minutes re-read nothing.

Fingerprint = sha256 over
  - Catalyst's CANONICALIZED analyzed plan (``QueryPlan.canonicalized`` —
    the machinery Spark itself uses for plan equality: expression ids are
    renumbered deterministically per plan, attribute names normalized,
    literal text preserved). Session-specific expr ids cancel out while
    ``s = '#1'`` vs ``s = '#2'`` literals — even ``'x#1'`` forms whose
    text imitates an attribute reference — and self-join conditions
    distinguished only by which side's attribute is referenced all stay
    distinct. Regex normalization of the plan STRING cannot get this
    right (any literal whose text matches the id pattern collides one way
    or the other); the tree-level canonicalization can.
  - the result schema json — canonicalization erases output aliases, and
    a hit must serve the exact column names the caller's plan declares
    (the materialized parquet is re-read by name), and
  - each input file's (path, size, mtime) — so ANY change to the backing
    data invalidates, while a byte-identical re-register hits.

Correctness stance: the fingerprint is a conservative key — false MISSES
(a cosmetic plan difference) cost a recompute; false HITS are prevented
by hashing the full canonicalized plan, which encodes structure, filters,
expressions, attribute identity, and literals, plus the output schema and
input paths. Reference scope: the reference has no query cache (every
read is an HTTP round trip, inventory/inventory.go); this is engine
generalization.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession


def plan_fingerprint(df: DataFrame) -> str:
    """Stable digest of the canonicalized plan + schema + input-file state."""
    normalized = (
        df._jdf.queryExecution().analyzed().canonicalized().toString()
        + "\nschema:"
        + df.schema.json()
    )
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
