"""Regenerate CATALOG.md: one row per registered query — name, module,
oracle status, and the docstring's first sentence. The auditable index of
the full query surface (SURVEY.md §2 tells the story; this is the
mechanical inventory)."""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_vulcan_assets_spark.registry import all_oracle_sql, all_queries  # noqa: E402


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.strip().split())
    for stop in (". ", ".\n"):
        if stop in text:
            return text[: text.index(stop) + 1]
    return text if len(text) < 160 else text[:157] + "..."


def main() -> None:
    qs = all_queries()
    oracles = all_oracle_sql()
    lines = [
        "# CATALOG — registered query inventory",
        "",
        "Auto-generated: `python _scripts/gen_catalog.py`. One row per",
        "registry entry; `oracle` = driver-checkable DuckDB parity SQL",
        "exists (rows-only entries list their reason in the docstring).",
        "",
        f"**{len(qs)} queries, {len(oracles)} with oracles.**",
        "",
        "| query | module | oracle | what |",
        "|---|---|---|---|",
    ]
    for name, fn in qs.items():
        mod = fn.__module__.replace("graph_vulcan_assets_spark.", "")
        has = "yes" if name in oracles else "rows-only"
        desc = first_sentence(inspect.getdoc(fn)).replace("|", "\\|")
        lines.append(f"| `{name}` | `{mod}` | {has} | {desc} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "CATALOG.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(qs)} queries)")


if __name__ == "__main__":
    main()
