"""Dev tool: probe every registered DuckDB dual at a given SF and print
the queries eligible for the meta_registry_digest cohort with their
frozen (column, kind) lists — the literal table in
operators/webdigest.py.

Admission rule (the frozen canonicalization contract, see
webdigest.py): every output column must be in the cross-engine-exact
set — kind 's' = BIGINT/INT/VARCHAR/BOOLEAN/DATE (plain cast to text
is identical in Spark and DuckDB), kind 't' = TIMESTAMP (epoch-millis
bigint text).  DOUBLE/DECIMAL are never admitted (float text is a
cross-engine seam).  Output and dual runtime are bounded so the meta
query stays an audit-harness cost, not a corpus pass.

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
S_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "VARCHAR",
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
    eligible: list[tuple[str, list, int, float]] = []
    skipped: list[tuple[str, str]] = []
    for name, (_fn, sql) in sorted(entry_mod._registry().items()):
        if name == "meta_registry_digest":
            continue
        if sql is None:
            skipped.append((name, "no dual"))
            continue
        try:
            rel = con.sql(sql)
            kinds, bad = [], []
            for c, t in zip(rel.columns, [str(x) for x in rel.types]):
                base = str(t).split("(")[0]
                if base in S_TYPES:
                    kinds.append((c, "s"))
                elif base == "TIMESTAMP":
                    kinds.append((c, "t"))
                else:
                    bad.append(f"{c}:{t}")
            if bad:
                skipped.append((name, "types " + ",".join(bad)))
                continue
            t0 = time.monotonic()
            n = con.sql(f"SELECT count(*) FROM ({sql})").fetchone()[0]
            dt = time.monotonic() - t0
        except Exception as e:  # noqa: BLE001
            skipped.append((name, f"error: {str(e)[:80]}"))
            continue
        if n > MAX_ROWS:
            skipped.append((name, f"{n} rows"))
            continue
        if dt > MAX_SEC:
            skipped.append((name, f"{dt:.1f}s dual"))
            continue
        eligible.append((name, sorted(kinds), n, dt))

    print(f"# eligible: {len(eligible)}   skipped: {len(skipped)}")
    print("COHORT_CANDIDATES = {")
    for name, kinds, n, dt in eligible:
        body = ", ".join(f"({c!r}, {k!r})" for c, k in kinds)
        print(f"    {name!r}: ({body},),  # {n} rows, {dt:.2f}s")
    print("}")
    print("\n# skipped:")
    for name, why in skipped:
        print(f"#   {name}: {why}")


if __name__ == "__main__":
    main()
