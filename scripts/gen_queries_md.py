#!/usr/bin/env python
"""Generate QUERIES.md from the registry (one row per query: name,
oracle status, description)."""

import sys

sys.path.insert(0, ".")

from impractical_impala_spark.registry import all_queries  # noqa: E402


def main() -> None:
    qs = all_queries()
    lines = [
        "# QUERIES — driver-checkable inventory (auto-generated)",
        "",
        f"{len(qs)} queries; regenerate with `python scripts/gen_queries_md.py`.",
        "",
        "| query | oracle | description |",
        "|---|---|---|",
    ]
    for name in sorted(qs):
        q = qs[name]
        oracle = "DuckDB SQL" if q.oracle else "rows-only"
        lines.append(f"| `{name}` | {oracle} | {q.doc} |")
    with open("QUERIES.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote QUERIES.md with {len(qs)} queries")


if __name__ == "__main__":
    main()
