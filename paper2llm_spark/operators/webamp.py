"""AMP ↔ canonical pairing — duplicate-surface reconciliation for the
AMP ecosystem (the AMP HTML spec's required dual linking:
``<link rel="amphtml">`` on the canonical page and
``<link rel="canonical">`` on its AMP twin).  Every AMP page is a
DELIBERATE near-duplicate of its canonical; a crawl that doesn't
reconcile the pairs double-counts content, and the integrity check —
is the linkage RECIPROCAL? — separates real AMP deployments from
scraper copies that paste an amphtml tag without the backlink.

Semantics (frozen): from every page extract the amphtml href and the
canonical href (quoted-subset extractor contract, '' when absent);
a PAIR is a page P declaring amphtml=A joined to an existing page A;
``reciprocal`` is true when A's canonical declaration points back at
exactly P.  Output: ``(canonical_url, amp_url, reciprocal)``.

The corpus has no html column: the registered query synthesizes
canonical/AMP twin pages in-engine (even doc_id = canonical, odd =
its twin); hash rolls independently withhold the amphtml declaration
(those pairs must NOT be emitted) and the backlink (emitted with
``reciprocal = false``) — both polarities and the join direction are
driver-certified.

Plan shape (the scale story): extraction is one codegen projection;
the pair join is a single equi-join on url over (url, href) SHORT
rows — the page payload is dropped before the exchange; reciprocity
is a column comparison inside the same join, not a second join.
Zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60


def _h(expr: Column, salt: str) -> Column:
    return portable_hash60(F.concat(expr.cast("string"), F.lit(":" + salt)))


def synth_amp_pages(docs: DataFrame) -> DataFrame:
    doc_id = F.col("doc_id")
    k = F.expr("doc_id div 2")
    base = F.concat(F.lit("https://amp.test/page"), k)
    amp_url = F.concat(base, F.lit("/amp"))
    is_amp = (doc_id % 2) == 1
    declare_amp = _h(k, "ampd") % 4 != 0
    declare_canon = _h(k, "ampc") % 3 != 0
    head = F.when(
        ~is_amp & declare_amp,
        F.concat(F.lit('<link rel="amphtml" href="'), amp_url, F.lit('">')),
    ).when(
        is_amp & declare_canon,
        F.concat(F.lit('<link rel="canonical" href="'), base, F.lit('">')),
    ).otherwise(F.lit(""))
    return docs.select(
        F.when(is_amp, amp_url).otherwise(base).alias("url"),
        F.encode(
            F.concat(F.lit("<html><head>"), head,
                     F.lit("</head><body>x</body></html>")),
            "utf-8",
        ).alias("html"),
    )


_AMP_RX = r'<link rel="amphtml" href="([^"]+)">'
_CANON_RX = r'<link rel="canonical" href="([^"]+)">'


def amp_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return amp_pairs_frame(synth_amp_pages(docs))


def amp_pairs_frame(pages: DataFrame) -> DataFrame:
    page = F.decode(F.col("html"), "utf-8")
    ex = pages.select(
        "url",
        F.regexp_extract(page, _AMP_RX, 1).alias("amp_href"),
        F.regexp_extract(page, _CANON_RX, 1).alias("canon_href"),
    )
    canon = ex.filter(F.col("amp_href") != "").select(
        F.col("url").alias("canonical_url"), "amp_href"
    )
    amp = ex.select(F.col("url").alias("amp_url"), "canon_href")
    return (
        canon.join(amp, canon.amp_href == amp.amp_url)
        .select(
            "canonical_url",
            "amp_url",
            (F.col("canon_href") == F.col("canonical_url")).alias(
                "reciprocal"
            ),
        )
    )


_ROLL_D = sql_hash60("(doc_id // 2) || ':ampd'")
_ROLL_C = sql_hash60("(doc_id // 2) || ':ampc'")

AMP_SQL = f"""
WITH synth AS (
  SELECT CASE WHEN doc_id % 2 = 1
              THEN 'https://amp.test/page' || (doc_id // 2) || '/amp'
              ELSE 'https://amp.test/page' || (doc_id // 2) END AS url,
         CASE
           WHEN doc_id % 2 = 0 AND ({_ROLL_D}) % 4 <> 0 THEN
             '<link rel="amphtml" href="https://amp.test/page'
             || (doc_id // 2) || '/amp">'
           WHEN doc_id % 2 = 1 AND ({_ROLL_C}) % 3 <> 0 THEN
             '<link rel="canonical" href="https://amp.test/page'
             || (doc_id // 2) || '">'
           ELSE '' END AS head
  FROM documents
),
ex AS (
  SELECT url,
         coalesce(regexp_extract(head, '{_AMP_RX}', 1), '') AS amp_href,
         coalesce(regexp_extract(head, '{_CANON_RX}', 1), '') AS canon_href
  FROM synth
)
SELECT c.url AS canonical_url, a.url AS amp_url,
       a.canon_href = c.url AS reciprocal
FROM ex c JOIN ex a ON c.amp_href = a.url
WHERE c.amp_href <> ''
"""


QUERIES: dict[str, tuple] = {
    "web_amp_pairs": (amp_pairs, AMP_SQL),
}
