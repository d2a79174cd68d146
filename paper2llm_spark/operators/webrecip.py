"""Link reciprocity — the share of a node's out-links that link back
(Serrano et al. 2007; Broder et al.'s bow-tie analyses report it as a
basic web-graph health number).  Crawl curation uses it as a
link-farm signal next to TrustRank: organic link neighborhoods are
mostly one-directional (reciprocity a few percent), while nepotistic
rings and mutual-admiration farms push it toward 1.

Frozen graph: the SALSA blocked synthetic edges
(``websalsa._blocked_edges`` — hash targets confined to id blocks of
``SALSA_G``), which guarantee a healthy deterministic mix of
reciprocated and unreciprocated edges at every scale factor
(within-block targeting makes back-edges ~K/G likely instead of ~K/n,
so the signal cannot vanish as the corpus grows).

Exact outputs per node: out-degree, reciprocated count, and
``recip_micro = n_recip * 1e6 div n_out``.

Plan shape (the scale story): reciprocity is ONE self-equi-join of the
edge list on the reversed key pair — edges are two-bigint short rows,
the join shuffles on (src, dst) vs (dst, src) hash keys, and the
groupBy(src) is map-side combinable.  The edge list is materialized
once (``localCheckpoint``) so the join's two sides share the scan.
No windows, no Python, no driver state.

Reference scope anchor: beyond-reference web-scale operator
(link-analysis tier); companion of `web_trustrank` (spam mass) and
`web_outlink_hostgraph`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .websalsa import SALSA_G, SALSA_OUT_K, _blocked_edges
from ..functions.text import sql_hash60

MICRO = 1_000_000


def reciprocity_frame(nodes: DataFrame) -> DataFrame:
    e = _blocked_edges(nodes).localCheckpoint()
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    out = e.groupBy("src").agg(F.count("*").cast("bigint").alias("n_out"))
    rec = (
        e.join(rev, ["src", "dst"])
        .groupBy("src")
        .agg(F.count("*").cast("bigint").alias("n_recip"))
    )
    return out.join(rec, "src", "left").select(
        F.col("src").alias("doc_id"),
        "n_out",
        F.coalesce("n_recip", F.lit(0)).cast("bigint").alias("n_recip"),
    ).withColumn(
        "recip_micro", F.expr(f"(n_recip * {MICRO}) div n_out"),
    )


def reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    return reciprocity_frame(nodes)


def _recip_sql() -> str:
    h = sql_hash60("src || ':' || k")
    ks = ", ".join(f"({k})" for k in range(SALSA_OUT_K))
    return f"""
WITH e0 AS (
  SELECT src, (src // {SALSA_G}) * {SALSA_G} + ({h}) % {SALSA_G} AS dst
  FROM (SELECT doc_id AS src FROM documents), (VALUES {ks}) t(k)
),
e AS (SELECT DISTINCT src, dst FROM e0 WHERE dst <> src),
r AS (
  SELECT a.src, count(*)::BIGINT AS n_recip
  FROM e a JOIN e b ON b.src = a.dst AND b.dst = a.src
  GROUP BY 1
),
o AS (SELECT src, count(*)::BIGINT AS n_out FROM e GROUP BY 1)
SELECT o.src AS doc_id, o.n_out,
       coalesce(r.n_recip, 0)::BIGINT AS n_recip,
       ((coalesce(r.n_recip, 0) * {MICRO}) // o.n_out)::BIGINT
         AS recip_micro
FROM o LEFT JOIN r ON r.src = o.src
"""


RECIPROCITY_SQL = _recip_sql()


QUERIES: dict[str, tuple] = {
    "web_link_reciprocity": (reciprocity, RECIPROCITY_SQL),
}
