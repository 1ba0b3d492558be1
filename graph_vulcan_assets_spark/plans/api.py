"""Read API over the temporal-graph state — the engine's equivalent of the
reference's REST query surface (inventory/inventory.go:149-628).

Every endpoint is a DataFrame transformation over the state tables produced
by `plans.temporal.replay` (or maintained by `streaming.ingest`):

| Reference endpoint                  | Method here   | Cite |
|-------------------------------------|---------------|------|
| GET /v1/assets?asset_type&asset_identifier&valid_at&page&size | assets()   | inventory.go:173-193 |
| GET /v1/teams?team_identifier&page&size                       | teams()    | inventory.go:236-253 |
| GET /v1/assets/{id}/parents?page&size                         | parents()  | inventory.go:497-524 |
| GET /v1/assets/{id}/children?page&size                        | children() | inventory.go:572-599 |
| GET /v1/assets/{id}/owners?page&size                          | owners()   | inventory.go:603-628 |

Filters are exact-match only (partial identifiers return nothing —
inventory_test.go:299-314); `valid_at` keeps rows whose
[first_seen, expiration] interval covers the instant
(inventory_test.go:291-298); pagination is page/size with size=0 meaning
"no pagination" (inventory.go:115-120,149-163), realized as a
deterministic ORDER BY natural key + LIMIT/OFFSET.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _paginate(df: DataFrame, order_cols: list[str], page: int | None, size: int | None) -> DataFrame:
    out = df.orderBy(*order_cols)
    if size:  # size=0 or None disables pagination (inventory.go:149-163)
        out = out.offset((page or 0) * size).limit(size)
    return out


class InventoryAPI:
    def __init__(self, state: dict[str, DataFrame]):
        self.state = state

    def assets(
        self,
        asset_type: str | None = None,
        identifier: str | None = None,
        valid_at: datetime.datetime | None = None,
        page: int | None = None,
        size: int | None = None,
    ) -> DataFrame:
        df = self.state["assets"]
        if asset_type:
            df = df.where(F.col("type") == asset_type)
        if identifier:
            df = df.where(F.col("identifier") == identifier)
        if valid_at is not None:
            df = df.where(
                (F.col("first_seen") <= F.lit(valid_at))
                & (F.col("expiration") >= F.lit(valid_at))
            )
        return _paginate(df, ["type", "identifier"], page, size)

    def teams(
        self,
        identifier: str | None = None,
        page: int | None = None,
        size: int | None = None,
    ) -> DataFrame:
        df = self.state["teams"]
        if identifier:
            df = df.where(F.col("identifier") == identifier)
        return _paginate(df, ["identifier"], page, size)

    def owners(
        self, asset_type: str, identifier: str, page: int | None = None, size: int | None = None
    ) -> DataFrame:
        """Owns edges of an asset joined with team rows (owns ⋈ teams —
        the reference's N+1 lookup collapsed into one broadcast join)."""
        owns = self.state["owns"].where(
            (F.col("type") == asset_type) & (F.col("asset_identifier") == identifier)
        )
        teams = self.state["teams"].select(
            F.col("identifier").alias("team_id"), F.col("name").alias("team_name")
        )
        return _paginate(
            owns.join(F.broadcast(teams), "team_id", "left"),
            ["team_id"],
            page,
            size,
        )

    def parents(
        self, asset_type: str, identifier: str, page: int | None = None, size: int | None = None
    ) -> DataFrame:
        """Outgoing parent_of edges: the asset as CHILD (inventory.go:497-524)."""
        df = self.state["parent_of"].where(
            (F.col("child_type") == asset_type)
            & (F.col("child_identifier") == identifier)
        )
        return _paginate(df, ["parent_type", "parent_identifier"], page, size)

    def children(
        self, asset_type: str, identifier: str, page: int | None = None, size: int | None = None
    ) -> DataFrame:
        """Incoming parent_of edges: the asset as PARENT (inventory.go:572-599)."""
        df = self.state["parent_of"].where(
            (F.col("parent_type") == asset_type)
            & (F.col("parent_identifier") == identifier)
        )
        return _paginate(df, ["child_type", "child_identifier"], page, size)
