"""Dev tool: probe every registered DuckDB dual at sf0.01 and print the
queries eligible for the meta_registry_digest cohort (all output columns
in the cross-engine-exact cast set {BIGINT/INT, VARCHAR, BOOLEAN, DATE},
bounded output, bounded runtime), with their sorted column lists — the
literal table frozen into operators/webdigest.py.

Run:  python scripts/gen_digest_cohort.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
# types whose ::VARCHAR text is identical in Spark's CAST(x AS STRING)
OK_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "VARCHAR",
            "BOOLEAN", "DATE", "HUGEINT", "UBIGINT"}
MAX_ROWS = 60_000
MAX_SEC = 2.5


def main() -> None:
    import __spark_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{SF_DIR}/{t}.parquet')"
        )
    eligible: list[tuple[str, list[str], int, float]] = []
    skipped: list[tuple[str, str]] = []
    for name, (_fn, sql) in sorted(entry_mod._registry().items()):
        if sql is None:
            skipped.append((name, "no dual"))
            continue
        try:
            rel = con.sql(sql)
            cols = list(rel.columns)
            types = [str(t) for t in rel.types]
        except Exception as e:  # noqa: BLE001
            skipped.append((name, f"bind error: {e}"))
            continue
        bad = [f"{c}:{t}" for c, t in zip(cols, types)
               if t.split("(")[0] not in OK_TYPES]
        if bad:
            skipped.append((name, "types " + ",".join(bad)))
            continue
        t0 = time.monotonic()
        try:
            n = con.sql(f"SELECT count(*) FROM ({sql})").fetchone()[0]
        except Exception as e:  # noqa: BLE001
            skipped.append((name, f"run error: {e}"))
            continue
        dt = time.monotonic() - t0
        if n > MAX_ROWS:
            skipped.append((name, f"{n} rows"))
            continue
        if dt > MAX_SEC:
            skipped.append((name, f"{dt:.1f}s dual"))
            continue
        eligible.append((name, sorted(cols), n, dt))

    print(f"# eligible: {len(eligible)}   skipped: {len(skipped)}")
    print("COHORT_CANDIDATES = {")
    for name, cols, n, dt in eligible:
        print(f"    {name!r}: {tuple(cols)!r},  # {n} rows, {dt:.2f}s")
    print("}")
    print("\n# skipped:")
    for name, why in skipped:
        print(f"#   {name}: {why}")


if __name__ == "__main__":
    main()
