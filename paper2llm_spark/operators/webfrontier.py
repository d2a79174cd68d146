"""Crawl-frontier politeness scheduler — the fetch-queue planner of a
Nutch/Heritrix-shape crawler (Mohr et al. 2004; Nutch's
``partition.url.mode=byHost`` + queue interleaving): assign every
candidate URL to a fetch shard such that

* ALL of a host's URLs land in one shard (per-host serialization — a
  polite crawler never fetches one host from two workers);
* within a host, URLs are ranked by priority (here ``n_chars`` desc,
  ``doc_id`` tiebreak — a stand-in for OPIC/PageRank scores) giving
  ``seq_in_host``: the k-th wave in which this host is touched;
* within a shard, the global fetch order interleaves hosts round-robin
  (ORDER BY ``seq_in_host`` first), so consecutive fetches from the
  same host are automatically spaced by one full wave of other hosts —
  the politeness delay emerges from the ordering instead of sleeps.

Plan shape (the scale story): two window exchanges, zero joins.  The
first partitions by ``host`` (true web-scale key: ~10^8 hosts for
10^12 urls).  The second partitions by ``shard`` — deliberately only
``N_SHARDS`` partitions, because a fetch queue IS a sequential
consumer: one queue per fetcher thread is the frontier's natural
parallelism, and ``N_SHARDS`` scales with the fetcher fleet, not with
the corpus.  Rows carry (url, host, 3 ints) — the page payload never
enters the frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import portable_hash60

N_SHARDS = 8


def crawl_frontier_frame(docs: DataFrame) -> DataFrame:
    cand = docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".test/"),
            F.col("doc_id"),
        ).alias("url"),
        F.concat(F.col("source"), F.lit(".test")).alias("host"),
        F.col("n_chars").cast("bigint").alias("priority"),
        "doc_id",
    )
    cand = cand.withColumn(
        "shard", (portable_hash60(F.col("host")) % N_SHARDS).cast("int")
    )
    w_host = Window.partitionBy("host").orderBy(
        F.col("priority").desc(), F.col("doc_id")
    )
    cand = cand.withColumn(
        "seq_in_host", F.row_number().over(w_host).cast("bigint")
    )
    w_shard = Window.partitionBy("shard").orderBy(
        F.col("seq_in_host"), F.col("host"), F.col("doc_id")
    )
    return cand.withColumn(
        "fetch_seq", F.row_number().over(w_shard).cast("bigint")
    ).select("url", "host", "shard", "seq_in_host", "fetch_seq")


def crawl_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return crawl_frontier_frame(docs)


CRAWL_FRONTIER_SQL = f"""
WITH cand AS (
  SELECT 'https://' || source || '.test/' || doc_id AS url,
         source || '.test' AS host,
         n_chars::BIGINT AS priority,
         doc_id,
         ((('0x' || substr(md5(source || '.test'), 1, 15))::BIGINT)
          % {N_SHARDS})::INT AS shard
  FROM documents
),
ranked AS (
  SELECT url, host, shard,
         row_number() OVER (PARTITION BY host
                            ORDER BY priority DESC, doc_id)::BIGINT
           AS seq_in_host,
         doc_id
  FROM cand
)
SELECT url, host, shard, seq_in_host,
       row_number() OVER (PARTITION BY shard
                          ORDER BY seq_in_host, host, doc_id)::BIGINT
         AS fetch_seq
FROM ranked
"""


QUERIES: dict[str, tuple] = {
    "web_crawl_frontier": (crawl_frontier, CRAWL_FRONTIER_SQL),
}
