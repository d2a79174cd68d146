"""Redirect-chain resolution — collapse HTTP 3xx chains to their final
landing URL.  Every crawler does this before dedup/indexing (Common
Crawl records redirects as separate WARC entries; Heritrix and
Nutch both cap chains — historically at hop limits like 5-8 — and
mark loops), and URL-level dedup is wrong without it: the chain head
and the landing page are the same document.

Semantics (frozen): the redirect map f sends a URL to its target if
it has one, else to itself (terminal).  Resolution applies f exactly
8 times — f^8 — counting only real moves as hops (a terminal absorbs:
once landed, hops stop growing).  A chain shorter than 8 lands on its
terminal with hops = true length and ``resolved = true``; a loop
never terminates, reports hops = 8 and ``resolved = false`` (its
final_url is whatever node the 8th move reaches — deterministic,
loop length divides in).  Only URLs that themselves redirect are
emitted (identity rows are noise).

The driver corpus has no redirect column, so the registered query
plants both shapes in-engine, identically in the dual: doc_id % 16
in {1,2,3} chains down to the multiple-of-16 terminal (lengths 1-3),
and doc_id % 97 in {95,96} forms a 2-cycle (the loop case); targets
are kept only when the target doc exists in the corpus.

Plan shape (the scale story): pointer doubling — 3 self-joins of the
(url -> pointer, hops) map compute f^8 in log2(8) = 3 rounds instead
of 8 sequential joins; each round's shuffle rows are two URLs and a
bigint.  At 10^12 URLs every round is one hash-partitioned equi-join
on the pointer (no broadcast of anything corpus-sized), and raising
the hop cap to 2^k costs k rounds, not 2^k — the same discipline as
this repo's connected-components (operators/webcomponents.py).  The
dual walks 8 sequential steps in a recursive CTE; both formulations
are exactly f^8 with absorbing terminals, so the hash gate proves
the doubling algebra, not just the output shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_DOUBLINGS = 3  # f^(2^3) = f^8


def _urls(docs: DataFrame) -> DataFrame:
    return docs.select(
        F.concat(F.lit("https://r.test/"), F.col("doc_id").cast("string"))
        .alias("url"),
        "doc_id",
    )


def synth_redirect_edges(docs: DataFrame) -> DataFrame:
    """(src, dst) redirect edges: chains mod 16, a 2-cycle mod 97."""
    doc_id = F.col("doc_id")
    target_id = (
        F.when(doc_id % 97 == 95, doc_id + 1)
        .when(doc_id % 97 == 96, doc_id - 1)
        .when((doc_id % 16 >= 1) & (doc_id % 16 <= 3), doc_id - 1)
    )
    raw = docs.select(
        F.concat(F.lit("https://r.test/"), doc_id.cast("string"))
        .alias("src"),
        target_id.alias("tid"),
    ).where(F.col("tid").isNotNull())
    exists = docs.select(F.col("doc_id").alias("tid"))
    return raw.join(exists, "tid").select(
        "src",
        F.concat(F.lit("https://r.test/"), F.col("tid").cast("string"))
        .alias("dst"),
    )


def resolve_chains_frame(urls: DataFrame, edges: DataFrame) -> DataFrame:
    """urls(url), edges(src,dst) -> (url, final_url, hops, resolved).

    Each doubling round self-joins the map with itself, so without
    materialization the lineage doubles per round and m0 is recomputed
    2^r times (the classic iterative-DataFrame trap); ``localCheckpoint``
    after every round keeps each round exactly one join over the
    PREVIOUS round's result — the same discipline as this repo's
    pointer-doubling CC (operators/webcomponents.py) and HITS
    (operators/webgraph.py).
    """
    edges = edges.localCheckpoint()
    m = (
        urls.select("url")
        .join(edges, urls["url"] == edges["src"], "left")
        .select(
            "url",
            F.coalesce("dst", "url").alias("p"),
            F.when(F.col("dst").isNull(), F.lit(0)).otherwise(F.lit(1))
            .cast("long").alias("hops"),
        )
        .localCheckpoint()
    )
    for _ in range(N_DOUBLINGS):
        a, b = m.alias("a"), m.alias("b")
        m = a.join(b, F.col("a.p") == F.col("b.url")).select(
            F.col("a.url").alias("url"),
            F.col("b.p").alias("p"),
            (F.col("a.hops") + F.col("b.hops")).alias("hops"),
        ).localCheckpoint()
    out = m.where(F.col("hops") >= 1).join(
        edges.select(F.col("src").alias("p"),
                     F.lit(False).alias("has_out")),
        "p", "left",
    )
    return out.select(
        "url",
        F.col("p").alias("final_url"),
        "hops",
        F.col("has_out").isNull().alias("resolved"),
    )


def redirect_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return resolve_chains_frame(_urls(docs), synth_redirect_edges(docs))


REDIRECT_CHAINS_SQL = """
WITH RECURSIVE edges AS (
  SELECT 'https://r.test/' || d.doc_id AS src,
         'https://r.test/' || t.tid AS dst
  FROM (
    SELECT doc_id,
      CASE WHEN doc_id % 97 = 95 THEN doc_id + 1
           WHEN doc_id % 97 = 96 THEN doc_id - 1
           WHEN doc_id % 16 BETWEEN 1 AND 3 THEN doc_id - 1
      END AS tid
    FROM documents
  ) d
  JOIN (SELECT doc_id AS tid FROM documents) t USING (tid)
  WHERE d.tid IS NOT NULL
),
walk(url, cur, hops, step) AS (
  SELECT 'https://r.test/' || doc_id, 'https://r.test/' || doc_id, 0, 0
  FROM documents
  UNION ALL
  SELECT w.url, coalesce(e.dst, w.cur),
         w.hops + CASE WHEN e.dst IS NULL THEN 0 ELSE 1 END,
         w.step + 1
  FROM walk w LEFT JOIN edges e ON e.src = w.cur
  WHERE w.step < 8
)
SELECT w.url, w.cur AS final_url, w.hops::BIGINT AS hops,
       (e.src IS NULL) AS resolved
FROM walk w LEFT JOIN edges e ON e.src = w.cur
WHERE w.step = 8 AND w.hops >= 1
"""


QUERIES: dict[str, tuple] = {
    "web_redirect_chains": (redirect_chains, REDIRECT_CHAINS_SQL),
}
