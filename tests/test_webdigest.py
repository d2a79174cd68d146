"""meta_registry_digest — frozen-canonicalization replay, corruption
detection, and cohort schema drift gates.

The digest's whole value is that a hash-green driver row certifies 71
member queries at once; these tests prove (a) the canonicalization is
the documented one (Python replay byte-for-byte), (b) a single changed
value changes the digest (the gate is not vacuous), and (c) the frozen
(column, kind) table matches the live Spark schemas so an operator
edit cannot silently desynchronize the dual."""

from __future__ import annotations

import datetime
import hashlib

import pytest
from pyspark.sql import functions as F

from paper2llm_spark.operators.webdigest import (
    COHORT, NULL_TOKEN, SEP, digest_frame,
)

SF = "/root/testdata/sf0.001"


def _replay(rows: list[list[str]]) -> str:
    lines = sorted(SEP.join(r) for r in rows)
    return hashlib.md5("\n".join(lines).encode("utf-8")).hexdigest()


def test_digest_replays_python_md5(spark):
    df = spark.createDataFrame(
        [(3, "b", None), (1, "a", "x"), (2, None, "y")],
        "k bigint, s string, t string",
    )
    kinds = (("k", "s"), ("s", "s"), ("t", "s"))
    n, dg = digest_frame(df, kinds)
    assert n == 3
    want = _replay(
        [["3", "b", NULL_TOKEN], ["1", "a", "x"], ["2", NULL_TOKEN, "y"]]
    )
    assert dg == want


def test_digest_timestamp_kind_is_epoch_millis(spark):
    ts = datetime.datetime(2026, 1, 2, 3, 4, 5, 123000)
    df = spark.createDataFrame([(1, ts), (2, None)], "k bigint, w timestamp")
    kinds = (("k", "s"), ("w", "t"))
    n, dg = digest_frame(df, kinds)
    assert n == 2
    millis = str(int(ts.replace(tzinfo=datetime.timezone.utc).timestamp() * 1000))
    assert dg == _replay([["1", millis], ["2", NULL_TOKEN]])


def test_digest_detects_single_value_corruption(spark):
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "k bigint, v string"
    )
    kinds = (("k", "s"), ("v", "s"))
    _, clean = digest_frame(base, kinds)
    corrupted = base.withColumn(
        "v", F.when(F.col("k") == 57, F.lit("v58")).otherwise(F.col("v"))
    )
    _, dirty = digest_frame(corrupted, kinds)
    assert clean != dirty
    # row-count alone would NOT catch it — the digest must
    assert base.count() == corrupted.count()


def test_digest_empty_result_is_stable(spark):
    df = spark.createDataFrame([], "k bigint, v string")
    n, dg = digest_frame(df, (("k", "s"), ("v", "s")))
    assert n == 0
    assert dg == hashlib.md5(b"").hexdigest()


def test_cohort_members_registered_with_duals():
    import __spark_entry__ as e

    reg = e._registry()
    assert "meta_registry_digest" in list(reg)[:50]
    for name in COHORT:
        assert name in reg, name
        assert reg[name][1] is not None, f"{name}: no dual"


@pytest.mark.parametrize("name", sorted(COHORT))
def test_cohort_kinds_match_live_spark_schema(spark, name):
    """Frozen (column, kind) table vs the live Spark schema: sorted
    column names identical; 't' exactly for timestamps; floats/
    decimals/arrays/binaries never admitted."""
    import __spark_entry__ as e

    fn, _sql = e._registry()[name]
    df = fn(spark, SF)
    kinds = dict(COHORT[name])
    assert sorted(df.columns) == sorted(kinds), name
    for c, t in df.dtypes:
        if t.startswith("timestamp"):
            assert kinds[c] == "t", (name, c, t)
        else:
            assert kinds[c] == "s", (name, c, t)
            assert not t.startswith(
                ("double", "float", "decimal", "array", "binary", "map")
            ), (name, c, t)
