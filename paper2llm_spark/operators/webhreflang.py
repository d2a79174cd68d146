"""hreflang translation-cluster mining — the DECLARED cross-language
alignment layer (Google's rel-alternate-hreflang spec; the W3C/WHATWG
``<link rel="alternate" hreflang>`` mechanism).  Complements
CCAligned's URL-pattern inference (webccalign.py): sites that declare
their translations give exact clusters with no URL heuristics, and
multilingual corpus builders (ParaCrawl's site-level mining, MADLAD
cleanup) harvest these before falling back to inference.

Semantics (frozen): edges are ``<link rel="alternate"
hreflang="xx" href="URL">`` declarations (frozen attribute order,
quoted values — the webmeta.py extractor-generality contract);
declarations are treated as UNDIRECTED evidence and clusters are
CONNECTED COMPONENTS, because real sites declare sparsely (A→B→C
chains where only adjacent pairs are declared must still cluster) —
the fixture plants both full-mesh and chain-shaped declaration
patterns, plus declaration-free pages that must come back as
singletons.  Output per page: ``(url, cluster, n_members)`` with
``cluster`` = lexicographic min url of the component (own url for
singletons).

The driver corpus has no html column: the registered query
synthesizes 4-language site groups in-engine (the webccalign.py
group structure) with hash-rolled full/chain/absent declarations.

Plan shape (the scale story): edge extraction is one codegen
regexp_extract_all + explode in the scan task; clustering reuses
dedup.py's ``connected_components`` — min-label + pointer doubling,
two map-side-combinable short-key shuffles per round,
localCheckpointed lineage, O(log diameter) rounds (chains are the
reason: pure hop propagation is O(diameter)); cluster sizes come
from one window over the label table.  Nothing corpus-sized is
broadcast or collected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60
from .dedup import connected_components

LANGS = ("en", "fr", "de", "es")


def _h(expr: Column, salt: str) -> Column:
    return portable_hash60(F.concat(expr.cast("string"), F.lit(":" + salt)))


def _member_url(g: Column, lang: Column) -> Column:
    return F.concat(
        F.lit("https://site"), g % 20, F.lit(".test/"), lang,
        F.lit("/page"), g,
    )


def synth_hreflang_pages(docs: DataFrame) -> DataFrame:
    doc_id = F.col("doc_id")
    g = F.expr("doc_id div 4")
    li = (doc_id % 4).cast("int")
    lang = (
        F.when(li == 0, LANGS[0]).when(li == 1, LANGS[1])
        .when(li == 2, LANGS[2]).otherwise(LANGS[3])
    )
    url = _member_url(g, lang)

    def link(to_i: int) -> Column:
        to_lang = F.lit(LANGS[to_i])
        return F.concat(
            F.lit('<link rel="alternate" hreflang="'), to_lang,
            F.lit('" href="'), _member_url(g, to_lang), F.lit('">'),
        )

    # full mesh: declare the other three; chain: declare (i+1) % 4 only
    others = [
        F.when(li != i, link(i)).otherwise(F.lit("")) for i in range(4)
    ]
    full = F.concat(*others)
    nxt = (doc_id + 1) % 4
    chain = F.concat(
        *[F.when(nxt == i, link(i)).otherwise(F.lit("")) for i in range(4)]
    )
    mode = _h(g, "hrf") % 3  # 0: absent, 1: chain, 2: full
    head = F.when(mode == 0, F.lit("")).when(mode == 1, chain).otherwise(full)
    return docs.select(
        url.alias("url"),
        F.encode(
            F.concat(F.lit("<html><head>"), head,
                     F.lit("</head><body>x</body></html>")),
            "utf-8",
        ).alias("html"),
    )


_LINK_RX = r'<link rel="alternate" hreflang="[a-z]+" href="([^"]+)">'


def hreflang_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return hreflang_frame(synth_hreflang_pages(docs))


def hreflang_frame(pages: DataFrame) -> DataFrame:
    edges = pages.select(
        "url",
        F.explode(F.expr(
            f"regexp_extract_all(decode(html, 'utf-8'), '{_LINK_RX}', 1)"
        )).alias("target"),
    ).filter(F.col("target") != F.col("url"))
    comp = connected_components(edges)
    out = (
        pages.select("url")
        .join(comp.withColumnRenamed("node", "url"), "url", "left")
        .select(
            "url", F.coalesce(F.col("cluster"), F.col("url")).alias("cluster")
        )
    )
    n = F.count(F.lit(1)).over(Window.partitionBy("cluster"))
    return out.select("url", "cluster", n.cast("bigint").alias("n_members"))


_ROLL_MODE = sql_hash60("(doc_id // 4) || ':hrf'")
_MEMBER = (
    "'https://site' || ((doc_id // 4) % 20) || '.test/' || {lang}"
    " || '/page' || (doc_id // 4)"
)
_LANG_EXPR = "(['en','fr','de','es'])[{i}]"

HREFLANG_SQL = f"""
WITH RECURSIVE synth AS (
  SELECT doc_id,
         {_MEMBER.format(lang=_LANG_EXPR.format(i='(doc_id % 4) + 1'))} AS url,
         CASE ({_ROLL_MODE}) % 3
           WHEN 0 THEN ''
           WHEN 1 THEN
             '<link rel="alternate" hreflang="' ||
             {_LANG_EXPR.format(i='((doc_id + 1) % 4) + 1')} ||
             '" href="' ||
             {_MEMBER.format(lang=_LANG_EXPR.format(i='((doc_id + 1) % 4) + 1'))} ||
             '">'
           ELSE (
             SELECT string_agg(
               '<link rel="alternate" hreflang="' ||
               {_LANG_EXPR.format(i='o.i + 1')} || '" href="' ||
               {_MEMBER.format(lang=_LANG_EXPR.format(i='o.i + 1'))} || '">',
               '' ORDER BY o.i)
             FROM (SELECT unnest(range(0, 4)) AS i) o
             WHERE o.i <> doc_id % 4
           )
         END AS head
  FROM documents
),
pages AS (SELECT url, head FROM synth),
edges0 AS (
  SELECT url, t AS target
  FROM pages, unnest(regexp_extract_all(head, '{_LINK_RX}', 1)) AS u(t)
  WHERE t <> url
),
edges AS (
  SELECT url AS src, target AS dst FROM edges0
  UNION ALL
  SELECT target, url FROM edges0
),
walk(node, root) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, w.root FROM walk w JOIN edges e ON e.src = w.node
),
comp AS (SELECT node, min(root) AS cluster FROM walk GROUP BY node),
lab AS (
  SELECT p.url, coalesce(c.cluster, p.url) AS cluster
  FROM pages p LEFT JOIN comp c ON c.node = p.url
)
SELECT url, cluster,
       (count(*) OVER (PARTITION BY cluster))::BIGINT AS n_members
FROM lab
"""


QUERIES: dict[str, tuple] = {
    "web_hreflang_clusters": (hreflang_clusters, HREFLANG_SQL),
}
