"""Run any registered query from the command line.

    python tools/run_query.py <query-name> [--sf-dir DIR] [--explain] [--limit N]
    python tools/run_query.py --list
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", nargs="?", help="query name (see --list)")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    ap.add_argument("--limit", type=int, default=20)
    ap.add_argument("--explain", action="store_true", help="print the physical plan too")
    ap.add_argument("--list", action="store_true", help="list registered queries")
    args = ap.parse_args()

    from data_pipeline_with_hdfs_sql_integration_spark.registry import all_queries

    specs = all_queries()
    if args.list or not args.name:
        for name, spec in sorted(specs.items()):
            kind = "oracled" if spec.oracle else "rows-only"
            print(f"{name:32s} [{kind}] {', '.join(spec.tags)}")
        return
    if args.name not in specs:
        sys.exit(f"unknown query {args.name!r}; try --list")

    from data_pipeline_with_hdfs_sql_integration_spark.session import get_spark

    spark = get_spark("dps-run")
    df = specs[args.name].fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    rows = df.collect()  # one execution serves both the preview and the count
    preview = df.limit(0).sparkSession.createDataFrame(rows[: args.limit], df.schema)
    preview.show(args.limit, truncate=False)
    print(f"({len(rows)} rows total)")


if __name__ == "__main__":
    main()
