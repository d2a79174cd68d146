"""Co-citation and bibliographic coupling over the corpus link graph
(Small 1973, "Co-citation in the scientific literature"; Kessler 1963,
"Bibliographic coupling between scientific papers").

The two classic second-order link-similarity measures, and the
standard related-page signals on the web graph (Dean & Henzinger
WWW 1999 built "find related pages" from exactly these):

* **co-citation** — targets (a, b) are similar when many pages link
  to BOTH (they are cited together);
* **bibliographic coupling** — sources (a, b) are similar when their
  outlink sets overlap (they cite the same things).

Semantics (frozen): over the same deterministic synthetic link graph
as PageRank/HITS (``webgraph.synth_edges``: 3 hash-chosen outlinks
per doc) UNIONed with a planted hub pattern — docs with
``doc_id % 8 in (0,1,2)`` each also link to their group's two hub
pages ``(doc_id div 8)*8 + 5`` and ``... + 6`` (mod n; hub slots are
disjoint from participant slots so no self-loops arise) — giving
every group a co-cited hub pair (count 3) and three coupled source
pairs (count >= 2).  A pair is emitted when its count >= 2, with
``kind = 'cocite'`` (target pair) or ``'couple'`` (source pair),
``id_a < id_b``.

Plan shape (the scale story): both measures are ONE self-join of the
edge list on the shared endpoint followed by a map-side-combinable
pair count — shuffle rows are two bigints.  The quadratic hazard is
the join fanout C(degree, 2) on hot endpoints (a nav page linked by
every page of a big site makes every page-pair a coupling candidate),
so each side is DEGREE-CAPPED before its self-join: sources with
out-degree > DEG_CAP are dropped from co-citation, targets with
in-degree > DEG_CAP from coupling — the identical pre-join cap
discipline as dedup.py's n-gram Jaccard and webwinnow's MOSS pairs
(a page linked by 10^7 others contributes 10^14 pairs and zero
signal).  At 10^12 edges the plan is two hash equi-joins on bigint
keys plus two short-row aggregates; nothing is ever broadcast or
collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import sql_hash60
from .webgraph import PR_OUT_K, _nodes, synth_edges

DEG_CAP = 64     # pre-join degree cap on the shared endpoint
MIN_COUNT = 2    # emit pairs co-occurring at least twice
GROUP = 8        # planted hub-group width


def _hub_edges(nodes: DataFrame, n_nodes: int) -> DataFrame:
    part = nodes.filter(F.col("doc_id") % GROUP < 3)
    hubs = F.array(
        (F.col("doc_id") - F.col("doc_id") % GROUP + 5) % n_nodes,
        (F.col("doc_id") - F.col("doc_id") % GROUP + 6) % n_nodes,
    )
    return part.select(
        F.col("doc_id").alias("src"), F.explode(hubs).alias("dst")
    )


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = _nodes(spark, sf_dir)
    n = nodes.count()
    # materialize ONCE: both measures (and both sides of each self-join)
    # reuse the edge list — without this the synth+distinct subtree
    # re-executes 8x (webgraph.py's localCheckpoint discipline)
    return (
        synth_edges(nodes, n)
        .unionByName(_hub_edges(nodes, n))
        .distinct()
        .localCheckpoint()
    )


def _pair_counts(e: DataFrame, on: str, pair: str, kind: str) -> DataFrame:
    """Self-join on ``on``; count distinct co-occurring ``pair`` values.
    Degree cap applied BEFORE the join bounds fanout by construction."""
    deg = e.groupBy(on).agg(F.count(F.lit(1)).alias("deg"))
    capped = e.join(
        deg.filter(F.col("deg") <= DEG_CAP).select(on), on, "inner"
    )
    a, b = capped.alias("a"), capped.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{on}") == F.col(f"b.{on}"))
            & (F.col(f"a.{pair}") < F.col(f"b.{pair}")),
        )
        .groupBy(
            F.col(f"a.{pair}").alias("id_a"), F.col(f"b.{pair}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .filter(F.col("cnt") >= MIN_COUNT)
        .select(F.lit(kind).alias("kind"), "id_a", "id_b", "cnt")
    )


def cocitation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges(spark, sf_dir)
    cocite = _pair_counts(e, "src", "dst", "cocite")
    couple = _pair_counts(e, "dst", "src", "couple")
    return cocite.unionByName(couple)


def _cocite_sql() -> str:
    h = sql_hash60("src || ':' || k")
    ks = ", ".join(f"({k})" for k in range(PR_OUT_K))
    return f"""
WITH n AS (SELECT count(*) AS n FROM documents),
e0 AS (SELECT doc_id AS src, ({h}) % n.n AS dst
       FROM documents, n, (VALUES {ks}) t(k)),
hub AS (SELECT doc_id AS src,
               (doc_id - doc_id % {GROUP} + 5 + u.o) % n.n AS dst
        FROM documents, n, (VALUES (0), (1)) u(o)
        WHERE doc_id % {GROUP} < 3),
e AS (SELECT DISTINCT src, dst FROM
        (SELECT src, dst FROM e0 WHERE dst <> src
         UNION ALL SELECT src, dst FROM hub)),
srcok AS (SELECT src FROM e GROUP BY 1 HAVING count(*) <= {DEG_CAP}),
dstok AS (SELECT dst FROM e GROUP BY 1 HAVING count(*) <= {DEG_CAP}),
ec AS (SELECT e.src, e.dst FROM e JOIN srcok USING (src)),
eb AS (SELECT e.src, e.dst FROM e JOIN dstok USING (dst)),
cocite AS (
  SELECT a.dst AS id_a, b.dst AS id_b, count(*)::BIGINT AS cnt
  FROM ec a JOIN ec b ON a.src = b.src AND a.dst < b.dst
  GROUP BY 1, 2 HAVING count(*) >= {MIN_COUNT}
),
couple AS (
  SELECT a.src AS id_a, b.src AS id_b, count(*)::BIGINT AS cnt
  FROM eb a JOIN eb b ON a.dst = b.dst AND a.src < b.src
  GROUP BY 1, 2 HAVING count(*) >= {MIN_COUNT}
)
SELECT 'cocite' AS kind, id_a, id_b, cnt FROM cocite
UNION ALL
SELECT 'couple' AS kind, id_a, id_b, cnt FROM couple
"""


COCITE_SQL = _cocite_sql()


QUERIES: dict[str, tuple] = {
    "web_cocitation_pairs": (cocitation_pairs, COCITE_SQL),
}
