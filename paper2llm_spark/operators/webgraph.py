"""Web-graph centrality over the corpus link graph (SURVEY.md §2.11).

Common-Crawl-scale curation ranks hosts/pages by link centrality
(OPIC / harmonic / PageRank are the published CC rankings) and uses
the score as a crawl-priority and quality prior.  The driver corpus
has no link column, so the registered query derives a deterministic
synthetic graph *in-engine* — each document links to ``PR_OUT_K``
pseudo-random targets chosen by the portable 60-bit hash, the same
templated-corpus technique the flagship oracle uses — and both engines
build byte-identical edge lists from ``documents.doc_id`` alone.

The iteration is the classic distributed PageRank shape, with the plan
that survives 10^12 nodes:

* the edge list is materialized ONCE (``localCheckpoint``) with its
  out-degree attached — per-iteration lineage is two narrow columns,
  never a re-derivation of the graph;
* each round shuffles only ``(dst, bigint)`` contribution rows through
  one map-side-combinable ``groupBy`` — rank state never carries text
  or edge payloads;
* ranks travel as exact bigint micro-units with integer division
  (``rank div deg``, ``(85 * s) div 100``), so results are independent
  of float summation order across partitions AND bit-identical to the
  DuckDB dual's unrolled-CTE rounds — float PageRank can never
  hash-match across engines;
* dangling/unlinked nodes re-enter every round via a left join against
  the node list (they hold the 0.15 base mass).

At real scale the edge list is a bucketed table partitioned by ``src``
so the per-round join is co-located, and iterations stop on an L1
residual; the fixed ``PR_ITERS`` here keeps the DuckDB dual a finite
CTE unroll.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60

PR_OUT_K = 3      # synthetic out-links per node
PR_ITERS = 3      # fixed Lloyd-style unroll so the dual is finite CTEs
PR_BASE = 150_000          # 0.15 in micro-units
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # 0.85 as an exact ratio
PR_INIT = 1_000_000        # initial rank, micro-units


def _nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # id-only scan; first real step is an exchange, so no spread
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")


def synth_edges(nodes: DataFrame, n_nodes: int) -> DataFrame:
    """Deterministic (src, dst) edges: ``PR_OUT_K`` hash-chosen targets
    per node, self-loops dropped, duplicates collapsed."""
    ks = F.array(*[F.lit(k) for k in range(PR_OUT_K)])
    return (
        nodes.select(F.col("doc_id").alias("src"), F.explode(ks).alias("k"))
        .select(
            "src",
            (
                portable_hash60(
                    F.concat(
                        F.col("src").cast("string"),
                        F.lit(":"),
                        F.col("k").cast("string"),
                    )
                )
                % n_nodes
            ).alias("dst"),
        )
        .filter(F.col("dst") != F.col("src"))
        .distinct()
    )


def pagerank_frame(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """``PR_ITERS`` exact-integer PageRank rounds over (nodes, edges)."""
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ed = edges.join(deg, "src").localCheckpoint()
    ranks = nodes.select(
        "doc_id", F.lit(PR_INIT).cast("bigint").alias("rank_micro")
    )
    for _ in range(PR_ITERS):
        contrib = ed.join(
            ranks.withColumnRenamed("doc_id", "src"), "src"
        ).select("dst", F.expr("rank_micro div deg").alias("c"))
        sums = (
            contrib.groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .withColumnRenamed("dst", "doc_id")
        )
        ranks = (
            nodes.join(sums, "doc_id", "left")
            .select(
                "doc_id",
                (
                    F.lit(PR_BASE)
                    + F.expr(
                        f"({PR_DAMP_NUM} * coalesce(s, 0)) div {PR_DAMP_DEN}"
                    )
                )
                .cast("bigint")
                .alias("rank_micro"),
            )
        )
    return ranks


def pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = _nodes(spark, sf_dir)
    n = nodes.count()
    return pagerank_frame(nodes, synth_edges(nodes, n))


def _pagerank_sql() -> str:
    h = sql_hash60("src || ':' || k")
    ks = ", ".join(f"({k})" for k in range(PR_OUT_K))
    ctes = [
        f"""n AS (SELECT count(*) AS n FROM documents),
e0 AS (SELECT doc_id AS src, ({h}) % n.n AS dst
       FROM documents, n, (VALUES {ks}) t(k)),
e AS (SELECT DISTINCT src, dst FROM e0 WHERE dst <> src),
deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
r0 AS (SELECT doc_id, {PR_INIT}::BIGINT AS rank_micro FROM documents)"""
    ]
    for i in range(1, PR_ITERS + 1):
        ctes.append(
            f"""c{i} AS (SELECT e.dst, sum(r.rank_micro // d.deg) AS s
       FROM e JOIN deg d USING (src)
       JOIN r{i - 1} r ON r.doc_id = e.src GROUP BY 1),
r{i} AS (SELECT d.doc_id,
              ({PR_BASE} + ({PR_DAMP_NUM} * coalesce(c{i}.s, 0))
                           // {PR_DAMP_DEN})::BIGINT AS rank_micro
       FROM documents d LEFT JOIN c{i} ON c{i}.dst = d.doc_id)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT doc_id, rank_micro FROM r{PR_ITERS}"
    )


PAGERANK_SQL = _pagerank_sql()


# ---------------------------------------------------------------------------
# outlink extraction -> host-level link graph
# ---------------------------------------------------------------------------

OL_OUT_K = 4       # synthesized anchors per page
OL_HOSTS = 16      # synthetic target-host universe


def outlinks_frame(pages: DataFrame) -> DataFrame:
    """(url, html:binary) pages -> host-level link graph.

    The crawl-frontier aggregation every CC-style pipeline runs before
    centrality: decode the payload, pull every ``<a href>`` target with
    one ``regexp_extract_all`` (codegen, scan task), explode to edge
    rows carrying only two short host strings, and count per
    (src_host, dst_host).  The single shuffle moves (host, host, 1)
    partial counts — never html — and map-side combine collapses the
    per-page fanout before the exchange.  Output is |hosts|^2-bounded.
    """
    host = lambda c: F.regexp_extract(c, r"https://([^/]+)/", 1)  # noqa: E731
    # same anchor grammar as html_extract._LINK_RE: case-insensitive,
    # either quote style, href at any attribute position
    hrefs = F.expr(
        r"""regexp_extract_all(decode(html, 'UTF-8'),
                               '(?i)<a\\b[^>]*?href\\s*=\\s*["\']([^"\']+)["\']', 1)"""
    )
    return (
        pages.select(host(F.col("url")).alias("src_host"),
                     F.explode(hrefs).alias("href"))
        .select("src_host", host(F.col("href")).alias("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )


def _synth_linked_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> pages whose html carries OL_OUT_K deterministic
    anchors (hash-chosen target hosts), built in SQL so the DuckDB dual
    synthesizes byte-identical payloads."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    anchors = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(OL_OUT_K - 1)),
            lambda k: F.concat(
                F.lit('<a href="https://h'),
                (
                    portable_hash60(
                        F.concat(F.col("doc_id").cast("string"), F.lit("#"),
                                 k.cast("string"))
                    )
                    % OL_HOSTS
                ).cast("string"),
                F.lit('.test/d/'),
                F.col("doc_id").cast("string"),
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
            F.concat(
                F.lit("<html><body><p>"), F.col("text"), F.lit("</p>"),
                anchors, F.lit("</body></html>"),
            ),
            "UTF-8",
        ).alias("html"),
    )


def outlink_hostgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    return outlinks_frame(_synth_linked_pages(spark, sf_dir))


_OL_HASH = sql_hash60("doc_id || '#' || k")

OUTLINK_HOSTGRAPH_SQL = f"""
WITH p AS (
  SELECT source || '.test' AS src_host,
         '<html><body><p>' || text || '</p>' ||
         (SELECT string_agg('<a href="https://h' || ({_OL_HASH}) % {OL_HOSTS}
                            || '.test/d/' || doc_id || '">ref</a>', ''
                            ORDER BY k)
          FROM range(0, {OL_OUT_K}) t(k)) || '</body></html>' AS html
  FROM documents
),
e AS (
  SELECT src_host,
         regexp_extract(unnest(regexp_extract_all(html,
             '(?i)<a\\b[^>]*?href\\s*=\\s*["'']([^"'']+)["'']', 1)),
             'https://([^/]+)/', 1) AS dst_host
  FROM p
)
SELECT src_host, dst_host, count(*)::BIGINT AS n_links
FROM e GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# HITS hubs & authorities
# ---------------------------------------------------------------------------

HITS_ITERS = 3
HITS_SCALE = 1_000_000


def hits_frame(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """``HITS_ITERS`` exact-integer HITS rounds (Kleinberg 1999,
    "Authoritative sources in a hyperlinked environment") — the other
    classic crawl-priority centrality (authority ≈ content quality,
    hub ≈ directory quality).

    Same scale discipline as :func:`pagerank_frame`: the edge list is
    checkpointed ONCE; each half-round shuffles only (node, bigint)
    contribution rows through a map-side-combinable groupBy.  The
    per-round normalization (divide by the max — HITS diverges without
    it) stays exact AND distributed: the 1-row max is crossJoin-
    **broadcast** back (never a driver collect), and scores renormalize
    as ``v * 1e6 div max`` — integer arithmetic, bit-identical to the
    dual's unrolled CTEs regardless of partial-sum order.
    """
    ed = edges.localCheckpoint()
    hub = nodes.select(
        "doc_id", F.lit(HITS_SCALE).cast("bigint").alias("hub")
    )

    def half_round(scores: DataFrame, col: str, key_in: str,
                   key_out: str, out: str) -> DataFrame:
        raw = (
            ed.join(scores.withColumnRenamed("doc_id", key_in), key_in)
            .groupBy(key_out)
            .agg(F.sum(col).alias("s"))
            .withColumnRenamed(key_out, "doc_id")
        )
        filled = nodes.join(raw, "doc_id", "left").select(
            "doc_id", F.coalesce("s", F.lit(0)).cast("bigint").alias("s")
        )
        mx = filled.agg(F.max("s").alias("mx"))
        return filled.crossJoin(F.broadcast(mx)).select(
            "doc_id",
            F.expr(f"(s * {HITS_SCALE}) div greatest(mx, 1)")
            .cast("bigint").alias(out),
        )

    for _ in range(HITS_ITERS):
        auth = half_round(hub, "hub", "src", "dst", "auth")
        hub = half_round(auth, "auth", "dst", "src", "hub")
    return hub.join(auth, "doc_id").select(
        "doc_id", F.col("hub").alias("hub_micro"),
        F.col("auth").alias("auth_micro"),
    )


def hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = _nodes(spark, sf_dir)
    n = nodes.count()
    return hits_frame(nodes, synth_edges(nodes, n))


def _hits_sql() -> str:
    h = sql_hash60("src || ':' || k")
    ks = ", ".join(f"({k})" for k in range(PR_OUT_K))
    ctes = [
        f"""n AS (SELECT count(*) AS n FROM documents),
e0 AS (SELECT doc_id AS src, ({h}) % n.n AS dst
       FROM documents, n, (VALUES {ks}) t(k)),
e AS MATERIALIZED (SELECT DISTINCT src, dst FROM e0 WHERE dst <> src),
h0 AS (SELECT doc_id, {HITS_SCALE}::BIGINT AS hub FROM documents)"""
    ]
    for i in range(1, HITS_ITERS + 1):
        p = i - 1
        ctes.append(
            f"""ar{i} AS MATERIALIZED (SELECT d.doc_id,
                   coalesce((SELECT sum(h.hub) FROM e
                             JOIN h{p} h ON h.doc_id = e.src
                             WHERE e.dst = d.doc_id), 0)::BIGINT AS s
            FROM documents d),
a{i} AS MATERIALIZED (SELECT doc_id,
                ((s * {HITS_SCALE})
                 // greatest((SELECT max(s) FROM ar{i}), 1))::BIGINT AS auth
         FROM ar{i}),
hr{i} AS MATERIALIZED (SELECT d.doc_id,
                 coalesce((SELECT sum(a.auth) FROM e
                           JOIN a{i} a ON a.doc_id = e.dst
                           WHERE e.src = d.doc_id), 0)::BIGINT AS s
          FROM documents d),
h{i} AS MATERIALIZED (SELECT doc_id,
                ((s * {HITS_SCALE})
                 // greatest((SELECT max(s) FROM hr{i}), 1))::BIGINT AS hub
         FROM hr{i})"""
        )
    last = HITS_ITERS
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT h.doc_id, h.hub AS hub_micro, a.auth AS auth_micro
FROM h{last} h JOIN a{last} a USING (doc_id)"""
    )


HITS_SQL = _hits_sql()


QUERIES: dict[str, tuple] = {
    "web_pagerank": (pagerank, PAGERANK_SQL),
    "web_outlink_hostgraph": (outlink_hostgraph, OUTLINK_HOSTGRAPH_SQL),
    "web_hits_scores": (hits_scores, HITS_SQL),
}
