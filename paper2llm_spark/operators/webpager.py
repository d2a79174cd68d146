"""Pagination chain reconstruction (``rel="next"`` sequences; the
pagination contract search engines consumed for a decade and
multi-page articles still declare).  Extraction-tier: a crawl that
treats page 2..N of an article as independent documents fragments
content, double-counts boilerplate, and poisons dedup — stitching
requires recovering each chain and every member's POSITION in it.

Semantics (frozen): pages declare ``<link rel="next" href="...">``;
the chain graph is a functional forest (each node at most one
successor).  Reconstruction is Wyllie's pointer-doubling list ranking
(Wyllie 1979; the JaJa textbook PRAM algorithm): initialize ``p =
next | self``, ``d = 1 | 0``; each round ``d += d(p); p = p(p)``.
``DOUBLE_ROUNDS = 3`` handles chains up to 2^3+1 members (synthesized
max 4).  After doubling, ``p`` is the chain TAIL (the canonical chain
id — every member agrees on it), ``d`` the distance to it; ``chain_len
= max(d)+1`` per tail and ``pos = chain_len - 1 - d``.  A WITHHELD
declaration (a hash roll drops the head's next on some >=3-part
chains) splits the chain into a singleton plus a shorter chain, each
re-ranking against its own tail — the planted polarity that certifies
missing links split rather than corrupt.  Output: ``(url, chain_tail, pos,
chain_len)``.

The corpus has no html column: the registered query synthesizes
chains in-engine (``chain = doc_id div 4``, parts ``0..L-1`` with
``L = 2 + hash % 3``; a hash roll withholds one mid-chain next).

Plan shape (the scale story): extraction is one codegen regexp
projection; each doubling round is ONE self-equi-join of (url, p, d)
short rows — 3 rounds reconstruct 10^9-member forests in 3 shuffles
of 3-column rows, the PRAM bound made relational; the tail groupBy is
map-side combinable.  Page payloads are dropped before the first
exchange; zero Python (plan-asserted).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60

DOUBLE_ROUNDS = 3
_NEXT_RX = r'<link rel="next" href="([^"]+)">'


def _h(expr: Column, salt: str) -> Column:
    return portable_hash60(F.concat(expr.cast("string"), F.lit(":" + salt)))


def synth_paged(docs: DataFrame) -> DataFrame:
    chain = F.expr("doc_id div 4")
    part = F.col("doc_id") % 4
    chain_len = 2 + _h(chain, "plen") % 3          # 2..4 parts
    url = F.concat(
        F.lit("https://pager.test/a"), chain, F.lit("/p"), part
    )
    nxt_url = F.concat(
        F.lit("https://pager.test/a"), chain, F.lit("/p"), part + 1
    )
    withhold = (_h(chain, "pbrk") % 5 == 0) & (part == 0) \
        & (chain_len >= 3)
    head = F.when(
        (part < chain_len - 1) & ~withhold,
        F.concat(F.lit('<link rel="next" href="'), nxt_url, F.lit('">')),
    ).otherwise(F.lit(""))
    return docs.filter(part < chain_len).select(
        url.alias("url"),
        F.encode(
            F.concat(F.lit("<html><head>"), head,
                     F.lit("</head><body>x</body></html>")),
            "utf-8",
        ).alias("html"),
    )


def chain_frame(pages: DataFrame) -> DataFrame:
    page = F.decode(F.col("html"), "utf-8")
    r = pages.select(
        "url",
        F.regexp_extract(page, _NEXT_RX, 1).alias("nxt"),
    ).select(
        "url",
        F.when(F.col("nxt") != "", F.col("nxt")).otherwise(F.col("url"))
        .alias("p"),
        F.when(F.col("nxt") != "", F.lit(1)).otherwise(F.lit(0))
        .cast("bigint").alias("d"),
    )
    for _ in range(DOUBLE_ROUNDS):
        other = r.select(
            F.col("url").alias("p"),
            F.col("p").alias("pp"),
            F.col("d").alias("dd"),
        )
        r = r.join(other, "p").select(
            "url",
            F.col("pp").alias("p"),
            (F.col("d") + F.col("dd")).alias("d"),
        )
    lens = r.groupBy("p").agg(
        (F.max("d") + 1).cast("bigint").alias("chain_len")
    )
    return r.join(lens, "p").select(
        "url",
        F.col("p").alias("chain_tail"),
        (F.col("chain_len") - 1 - F.col("d")).cast("bigint").alias("pos"),
        "chain_len",
    )


def pagination_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return chain_frame(synth_paged(docs))


def _pager_sql() -> str:
    hlen = sql_hash60("(doc_id // 4)::VARCHAR || ':plen'")
    hbrk = sql_hash60("(doc_id // 4)::VARCHAR || ':pbrk'")
    ctes = [
        f"""pages AS (
  SELECT 'https://pager.test/a' || (doc_id // 4)::VARCHAR
           || '/p' || (doc_id % 4)::VARCHAR AS url,
         CASE WHEN doc_id % 4 < (2 + {hlen} % 3) - 1
                   AND NOT (({hbrk} % 5 = 0) AND doc_id % 4 = 0
                            AND (2 + {hlen} % 3) >= 3)
              THEN 'https://pager.test/a' || (doc_id // 4)::VARCHAR
                     || '/p' || (doc_id % 4 + 1)::VARCHAR
              ELSE '' END AS nxt
  FROM documents
  WHERE doc_id % 4 < 2 + {hlen} % 3
),
r0 AS (
  SELECT url,
         CASE WHEN nxt <> '' THEN nxt ELSE url END AS p,
         (CASE WHEN nxt <> '' THEN 1 ELSE 0 END)::BIGINT AS d
  FROM pages
)"""
    ]
    for i in range(1, DOUBLE_ROUNDS + 1):
        pr = i - 1
        ctes.append(
            f"""r{i} AS (SELECT a.url, b.p AS p, a.d + b.d AS d
       FROM r{pr} a JOIN r{pr} b ON b.url = a.p)"""
        )
    last = f"r{DOUBLE_ROUNDS}"
    return (
        "WITH " + ",\n".join(ctes)
        + f""",
lens AS (SELECT p, (max(d) + 1)::BIGINT AS chain_len
         FROM {last} GROUP BY 1)
SELECT r.url, r.p AS chain_tail,
       (l.chain_len - 1 - r.d)::BIGINT AS pos, l.chain_len
FROM {last} r JOIN lens l USING (p)"""
    )


PAGER_SQL = _pager_sql()


QUERIES: dict[str, tuple] = {
    "web_pagination_chains": (pagination_chains, PAGER_SQL),
}
