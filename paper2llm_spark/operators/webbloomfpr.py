"""Bloom-filter false-positive-rate audit — empirical FPR of the
ingest prefilter against the fill-factor law (Bloom CACM 1970 gives
the classic approximation; the exact fill-based form
``FPR = (bits_set / m)^k`` is how production filters are actually
monitored — Broder & Mitzenmacher's survey §2.1; the last member of
the sketch-audit family beside MinHash error and the HyperBall
ledger).

Composes the registered `dedup_bloom_prefilter` machinery verbatim
(same bit synthesis, same even-slice filter membership) and audits
it: of the documents whose digest is GENUINELY absent from the
filter (anti-joined on the exact digest set — planted exact-dup
twins of seen docs are true positives, not negatives), how many
does the filter wrongly flag?

Semantics (frozen): one output row —

* ``m = BLOOM_BITS``, ``k = BLOOM_K``, ``n_seen`` (distinct member
  digests), ``bits_set``, ``fill_micro = bits_set * 1e6 div m``
* ``n_neg`` / ``n_fp`` — exact counts over the true negatives
* ``fpr_micro = n_fp * 1e6 div max(n_neg, 1)``
* ``theory_micro = fill_micro^3 div 1e12`` — the EXACT fill-based
  expectation ``(bits_set/m)^k`` in pure integer arithmetic (k = 3;
  fill_micro <= 1e6 so the cube stays under 2^63 — no float
  anywhere in this audit)

Plan shape (the scale story): the composed prefilter's broadcast
bit-set join does the probing; the audit adds the distinct-digest
anti-join (broadcast of the member digest list — bounded by the
slice size at fixture scale, a digest-keyed join at corpus scale)
and collapses to one row.  Zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .webfilter import (
    BLOOM_BITS, BLOOM_K, _SEEN_PRED, _probe_bits, bloom_prefilter_frame,
)

MICRO = 1_000_000


def bloom_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    ).select("doc_id", "text")
    digests = docs.select("doc_id", F.md5("text").alias("dg"))
    seen = digests.filter(F.expr(_SEEN_PRED))
    seen_digests = seen.select("dg").distinct()
    flags = bloom_prefilter_frame(docs)
    negatives = (
        digests.join(F.broadcast(seen_digests), "dg", "left_anti")
        .select("doc_id")
        .join(flags, "doc_id")
    )
    neg_agg = negatives.agg(
        F.count("*").cast("bigint").alias("n_neg"),
        F.sum(F.col("maybe_seen").cast("int")).cast("bigint")
        .alias("n_fp"),
    )
    bits_set = (
        seen.select(F.explode(_probe_bits(F.col("dg"))).alias("pb"))
        .select(F.col("pb.bit").alias("bit"))
        .distinct()
        .agg(F.count("*").cast("bigint").alias("bits_set"))
    )
    n_seen = seen_digests.agg(
        F.count("*").cast("bigint").alias("n_seen")
    )
    return (
        neg_agg.crossJoin(F.broadcast(bits_set))
        .crossJoin(F.broadcast(n_seen))
        .select(
            F.lit(BLOOM_BITS).cast("bigint").alias("m"),
            F.lit(BLOOM_K).cast("bigint").alias("k"),
            "n_seen",
            "bits_set",
            F.expr(f"bits_set * {MICRO} div {BLOOM_BITS}")
            .cast("bigint").alias("fill_micro"),
            "n_neg",
            "n_fp",
            F.expr(f"n_fp * {MICRO} div greatest(n_neg, 1)")
            .cast("bigint").alias("fpr_micro"),
            F.expr(
                f"(bits_set * {MICRO} div {BLOOM_BITS})"
                f" * (bits_set * {MICRO} div {BLOOM_BITS})"
                f" * (bits_set * {MICRO} div {BLOOM_BITS})"
                f" div 1000000000000"
            ).cast("bigint").alias("theory_micro"),
        )
    )


from ..functions.text import sql_hash60  # noqa: E402

_BIT = "(" + sql_hash60("dg || ':' || i") + f" % {BLOOM_BITS})"

BLOOM_FPR_SQL = f"""
WITH d AS (SELECT doc_id, md5(text) AS dg FROM documents),
seen AS (SELECT doc_id, dg FROM d WHERE {_SEEN_PRED}),
seen_digests AS (SELECT DISTINCT dg FROM seen),
bits AS (
  SELECT count(*)::BIGINT AS bits_set FROM (
    SELECT DISTINCT {_BIT} AS bit
    FROM seen CROSS JOIN range(0, {BLOOM_K}) t(i)
  )
),
probe_bits AS (
  SELECT doc_id, count(*)::BIGINT AS n_hits
  FROM (
    SELECT p.doc_id, p.bit FROM (
      SELECT doc_id, {_BIT} AS bit
      FROM d CROSS JOIN range(0, {BLOOM_K}) t(i)
    ) p
    JOIN (SELECT DISTINCT {_BIT} AS bit
          FROM seen CROSS JOIN range(0, {BLOOM_K}) t(i)) b
      USING (bit)
  ) GROUP BY doc_id
),
negatives AS (
  SELECT d.doc_id,
         coalesce(pb.n_hits, 0) = {BLOOM_K} AS maybe_seen
  FROM d
  ANTI JOIN seen_digests s ON s.dg = d.dg
  LEFT JOIN probe_bits pb USING (doc_id)
),
agg AS (
  SELECT count(*)::BIGINT AS n_neg,
         sum(maybe_seen::INT)::BIGINT AS n_fp
  FROM negatives
),
ns AS (SELECT count(*)::BIGINT AS n_seen FROM seen_digests)
SELECT {BLOOM_BITS}::BIGINT AS m, {BLOOM_K}::BIGINT AS k,
       n_seen, bits_set,
       (bits_set * {MICRO} // {BLOOM_BITS})::BIGINT AS fill_micro,
       n_neg, n_fp,
       (n_fp * {MICRO} // greatest(n_neg, 1))::BIGINT AS fpr_micro,
       ((bits_set * {MICRO} // {BLOOM_BITS})
        * (bits_set * {MICRO} // {BLOOM_BITS})
        * (bits_set * {MICRO} // {BLOOM_BITS})
        // 1000000000000)::BIGINT AS theory_micro
FROM agg, bits, ns
"""


QUERIES: dict[str, tuple] = {
    "sketch_bloom_fpr": (bloom_fpr, BLOOM_FPR_SQL),
}
