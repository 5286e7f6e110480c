"""Regenerate QUERIES.md — the index of every registered query.
Run from the repo root: python tools/gen_queries_md.py"""
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_pipeline_with_hdfs_sql_integration_spark.registry import all_queries


def main() -> None:
    specs = all_queries()
    by_module = defaultdict(list)
    for spec in specs.values():
        by_module[spec.fn.__module__.rsplit(".", 1)[-1]].append(spec)
    out = [
        "# QUERIES — every registered operator query",
        "",
        f"{len(specs)} queries; "
        f"{sum(1 for s in specs.values() if s.oracle)} with a DuckDB value oracle, "
        f"{sum(1 for s in specs.values() if not s.oracle)} rows-only "
        "(non-SQL-expressible paths, each unit-tested instead).",
        "",
        "Auto-generated (`python tools/gen_queries_md.py`). The driver runs every",
        "query AND its oracle side-by-side at sf0.01; tests/test_oracle_parity.py",
        "mirrors that locally at sf0.001.",
        "",
    ]
    for module in sorted(by_module):
        out.append(f"## plans/{module}.py")
        out.append("")
        for spec in sorted(by_module[module], key=lambda s: s.name):
            oracle = "oracled" if spec.oracle else "rows-only"
            tags = ", ".join(spec.tags)
            doc = " ".join(spec.doc.split())
            out.append(f"- **`{spec.name}`** ({oracle}; {tags}) — {doc}")
        out.append("")
    Path(__file__).resolve().parent.parent.joinpath("QUERIES.md").write_text("\n".join(out))
    print(f"wrote QUERIES.md: {len(specs)} queries")


if __name__ == "__main__":
    main()
