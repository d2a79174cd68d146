#!/usr/bin/env python
"""spark-submit entry for ANY registered analytics query.

Every operator in the engine is exposed in the driver registry
(`__spark_entry__.queries()`); this job runs one by name over a
testdata-shaped directory of parquet tables and writes (or shows) the
result — so a user can run every query the engine supports without
writing code.

Cluster:

    spark-submit --py-files paper2llm_spark.zip,__spark_entry__.py \
        jobs/run_query.py --query dedup_lsh_clusters \
        --sf-dir <tables dir> --output <parquet dir>

Local smoke:

    python jobs/run_query.py --query text_quality_score \
        --sf-dir /root/testdata/sf0.01 --cpus 8

    python jobs/run_query.py --list
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", help="registered query name (see --list)")
    ap.add_argument("--list", action="store_true", help="print query names")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--output", default=None,
                    help="parquet output dir; omit to print 20 rows")
    ap.add_argument("--cpus", type=int, default=None,
                    help="local[N] when no cluster master is provided")
    args = ap.parse_args()

    import __spark_entry__ as entry

    registry = entry.queries()
    if args.list or not args.query:
        for name in sorted(registry):
            print(name)
        return
    if args.query not in registry:
        sys.exit(f"unknown query {args.query!r}; use --list")

    from paper2llm_spark.session import get_spark

    spark = get_spark(app_name=f"p2l-{args.query}", cpus=args.cpus)
    t0 = time.time()
    df = registry[args.query](spark, args.sf_dir)
    if args.output:
        df.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
    else:
        df.show(20, truncate=40)
        n = df.count()
    print(json.dumps({
        "query": args.query, "rows": n,
        "wall_s": round(time.time() - t0, 3), "sf_dir": args.sf_dir,
    }))


if __name__ == "__main__":
    main()
