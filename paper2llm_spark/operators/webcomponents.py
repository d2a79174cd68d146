"""Host-graph connected components — site-cluster discovery over the
crawl's host-level link graph (the Common-Crawl "web graph" release
ships exactly this artifact; mirror detection, seed-list expansion and
per-site crawl budgeting all consume it).

Composition, not new machinery: edges come from
``webgraph.outlinks_frame`` (codegen anchor extraction; the one
corpus-sized exchange carries (src_host, dst_host, partial count)
short rows) and components from ``dedup.connected_components``
(min-label propagation WITH pointer doubling — O(log diameter) rounds,
loud failure beyond diameter ~2^20, lineage localCheckpointed).  The
component stage runs on the |hosts|-bounded graph, orders of magnitude
smaller than the corpus; the size/representative joins touch only that
host table.

The shared ``_synth_linked_pages`` target universe is one dense blob
(every source reaches every h-host), which would collapse to a single
vacuous component — so this operator synthesizes COMMUNITY-structured
pages instead: each source is hash-assigned to one of ``NC``
communities and its anchors only target that community's ``CH`` hosts,
giving a deterministic multi-component graph (sources sharing a
community connect through shared targets; communities never touch).
Component labels are min host strings (ASCII lexicographic — identical
ordering in both engines), the DuckDB dual is a recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60
from .dedup import connected_components
from .webgraph import outlinks_frame

NC = 5         # host communities (expected number of components)
CH = 8         # target hosts per community
CC_OUT_K = 4   # synthesized anchors per page


def _synth_community_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    comm = (portable_hash60(F.col("source")) % NC).cast("string")
    anchors = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(CC_OUT_K - 1)),
            lambda k: F.concat(
                F.lit('<a href="https://c'), comm, F.lit("h"),
                (
                    portable_hash60(
                        F.concat(F.col("doc_id").cast("string"), F.lit("#"),
                                 k.cast("string"))
                    )
                    % CH
                ).cast("string"),
                F.lit('.test/x/'), F.col("doc_id").cast("string"),
                F.lit('">ref</a>'),
            ),
        ),
        "",
    )
    return docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".test/"),
            F.col("doc_id").cast("string")
        ).alias("url"),
        F.encode(
            F.concat(F.lit("<html><body>"), anchors,
                     F.lit("</body></html>")), "UTF-8",
        ).alias("html"),
    )


def host_components_frame(pages: DataFrame) -> DataFrame:
    edges = outlinks_frame(pages).select("src_host", "dst_host")
    comp = connected_components(edges)
    sizes = comp.groupBy("cluster").agg(
        F.count("*").alias("n_hosts")
    )
    return comp.join(sizes, "cluster").select(
        F.col("node").alias("host"),
        F.col("cluster").alias("component"),
        "n_hosts",
        (F.col("node") == F.col("cluster")).cast("int").alias("is_rep"),
    )


def host_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    return host_components_frame(_synth_community_pages(spark, sf_dir))


_CC_HASH = sql_hash60("doc_id || '#' || k")
_COMM = f"({sql_hash60('source')} % {NC})"

HOST_COMPONENTS_SQL = f"""
WITH RECURSIVE p AS (
  SELECT source || '.test' AS src_host,
         '<html><body>' ||
         (SELECT string_agg('<a href="https://c' || {_COMM} || 'h'
                            || ({_CC_HASH}) % {CH} || '.test/x/' || doc_id
                            || '">ref</a>', '' ORDER BY k)
          FROM range(0, {CC_OUT_K}) t(k)) || '</body></html>' AS html
  FROM documents
),
e0 AS (
  SELECT DISTINCT src_host,
         regexp_extract(unnest(regexp_extract_all(html,
             '(?i)<a\\b[^>]*?href\\s*=\\s*["'']([^"'']+)["'']', 1)),
             'https://([^/]+)/', 1) AS dst_host
  FROM p
),
edges AS (
  SELECT src_host AS src, dst_host AS dst FROM e0
  UNION
  SELECT dst_host, src_host FROM e0
),
walk(node, root) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, w.root FROM walk w JOIN edges e ON e.src = w.node
),
comp AS (SELECT node, min(root) AS component FROM walk GROUP BY node),
sizes AS (
  SELECT component, count(*)::BIGINT AS n_hosts FROM comp GROUP BY component
)
SELECT c.node AS host, c.component, s.n_hosts,
       (c.node = c.component)::INT AS is_rep
FROM comp c JOIN sizes s USING (component)
"""


QUERIES: dict[str, tuple] = {
    "web_host_components": (host_components, HOST_COMPONENTS_SQL),
}
