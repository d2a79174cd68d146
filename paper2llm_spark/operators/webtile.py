"""TextTiling topic segmentation (Hearst, CL 1997) — lexical-cohesion
valleys as topic boundaries.  The content-aware complement of this
repo's length-based passage chunking (webchunk.py): RAG splitters and
sequence packers that cut mid-topic destroy retrieval locality, and
TextTiling is the canonical model-free segmenter every splitter
library descends from.

Semantics (frozen): token-sequences of ``W = 10`` tokens (``seq = pos
div W``); block comparison at every internal gap ``g`` (between seq
g-1 and g) over ``K = 3`` sequences a side, end-clipped as in the
paper.  Cohesion = block cosine over term counts, in micro-units via
ONE shape-identical double expression:
``floor(dot * 1e6 / sqrt(nl * nr) + 0.5)`` with integer dot/norms.
Depth score uses the first-neighbor form ``max(0, sim(g-1)-sim(g)) +
max(0, sim(g+1)-sim(g))`` (missing neighbor contributes 0) — the
common simplification of Hearst's hill-climb, which walks plateaus in
driver-order and is frozen here to the order-free variant.  Boundary
iff ``depth > mean - sigma div 2`` computed per doc over its gap sims
(Hearst's own cutoff); mean is the exact integer floor, sigma is one
shape-identical ``floor(sqrt(double(n*ss - s*s)) / n + 0.5)``.  Docs
with fewer than two sequences have no gaps and emit no row (the paper
has nothing to segment).  Output per doc: ``(doc_id, n_seqs, n_gaps,
n_boundaries, top_gap, max_depth_micro)`` with ``top_gap`` the
deepest gap (ties -> lower index).

Plan shape (the scale story): every stage is keyed by doc_id (+seq/
gap/term) — counts collapse token rows map-side; the K-fanout explode
multiplies only the COLLAPSED (doc, seq, term, count) rows, never raw
tokens; block vectors, dot and norms are three short-row aggs sharing
the (doc_id, gap) key family; the depth/threshold passes are windows
and aggs over ~tokens/W rows per doc.  Raw text never rides an
exchange; zero Python (plan-asserted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, tokens

TILE_W = 10   # tokens per token-sequence
TILE_K = 3    # block size, sequences per side
MICRO = 1_000_000

_SIM = (
    "cast(floor(cast(dot as double) * 1000000.0 / "
    "sqrt(cast(nl as double) * cast(nr as double)) + 0.5) as bigint)"
)


def tile_frame(docs: DataFrame) -> DataFrame:
    toks = docs.select(
        "doc_id",
        F.posexplode(tokens(F.col("text"))).alias("pos", "w"),
    ).select(
        "doc_id", F.expr(f"pos div {TILE_W}").alias("seq"), "w"
    )
    counts = toks.groupBy("doc_id", "seq", "w").agg(
        F.count(F.lit(1)).alias("c")
    ).localCheckpoint()
    nseq = counts.groupBy("doc_id").agg(
        (F.max("seq") + 1).cast("bigint").alias("n_seqs")
    )
    cn = counts.join(nseq, "doc_id").filter(F.col("n_seqs") >= 2)
    left = cn.select(
        "doc_id", "w", "c", "n_seqs",
        F.explode(
            F.sequence(F.col("seq") + 1, F.col("seq") + TILE_K)
        ).alias("g"),
    ).filter(F.col("g") <= F.col("n_seqs") - 1)
    right = cn.select(
        "doc_id", "w", "c", "n_seqs",
        F.explode(
            F.sequence(F.col("seq") - TILE_K + 1, F.col("seq"))
        ).alias("g"),
    ).filter(F.col("g") >= 1)
    lvec = left.groupBy("doc_id", "g", "w").agg(F.sum("c").alias("cl"))
    rvec = right.groupBy("doc_id", "g", "w").agg(F.sum("c").alias("cr"))
    dot = (
        lvec.join(rvec, ["doc_id", "g", "w"])
        .groupBy("doc_id", "g")
        .agg(F.sum(F.col("cl") * F.col("cr")).alias("dot"))
    )
    nl = lvec.groupBy("doc_id", "g").agg(
        F.sum(F.col("cl") * F.col("cl")).alias("nl")
    )
    nr = rvec.groupBy("doc_id", "g").agg(
        F.sum(F.col("cr") * F.col("cr")).alias("nr")
    )
    sims = (
        nl.join(nr, ["doc_id", "g"])
        .join(dot, ["doc_id", "g"], "left")
        .select(
            "doc_id", "g",
            F.expr(
                f"case when coalesce(dot, 0) = 0 then 0L else {_SIM} end"
            ).alias("sim"),
        )
    )
    wg = Window.partitionBy("doc_id").orderBy("g")
    depths = sims.select(
        "doc_id", "g", "sim",
        (
            F.greatest(
                F.lit(0),
                F.coalesce(F.lag("sim").over(wg), F.col("sim"))
                - F.col("sim"),
            )
            + F.greatest(
                F.lit(0),
                F.coalesce(F.lead("sim").over(wg), F.col("sim"))
                - F.col("sim"),
            )
        ).cast("bigint").alias("depth"),
    )
    stats = depths.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum("sim").alias("s"),
        F.sum(F.col("sim") * F.col("sim")).alias("ss"),
    ).select(
        "doc_id", "n_gaps",
        (
            F.expr("s div n_gaps")
            - F.expr(
                "cast(floor(sqrt(cast(n_gaps as double) * cast(ss as"
                " double) - cast(s as double) * cast(s as double))"
                " / cast(n_gaps as double) + 0.5) as bigint) div 2"
            )
        ).alias("thr"),
    )
    wr = Window.partitionBy("doc_id").orderBy(
        F.col("depth").desc(), F.col("g").asc()
    )
    per_doc = (
        depths.join(stats, "doc_id")
        .withColumn("is_b", (F.col("depth") > F.col("thr")).cast("int"))
        .withColumn("rn", F.row_number().over(wr))
    )
    agg = per_doc.groupBy("doc_id").agg(
        F.max("n_gaps").alias("n_gaps"),
        F.sum("is_b").cast("bigint").alias("n_boundaries"),
        F.max(F.when(F.col("rn") == 1, F.col("g"))).cast("bigint")
        .alias("top_gap"),
        F.max("depth").alias("max_depth_micro"),
    )
    return agg.join(nseq, "doc_id").select(
        "doc_id", "n_seqs", "n_gaps", "n_boundaries", "top_gap",
        "max_depth_micro",
    )


def texttile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return tile_frame(docs.select("doc_id", "text"))


_TOKLIST = SQL_TOKENS.format(expr="text")
_SIM_SQL = (
    "floor(dot::DOUBLE * 1000000.0 / "
    "sqrt(nl::DOUBLE * nr::DOUBLE) + 0.5)::BIGINT"
)

TEXTTILE_SQL = f"""
WITH toks AS (
  SELECT doc_id, (pi - 1) // {TILE_W} AS seq, w
  FROM (SELECT doc_id,
               unnest(range(1, len(tok) + 1)) AS pi,
               unnest(tok) AS w
        FROM (SELECT doc_id, {_TOKLIST} AS tok FROM documents))
),
counts AS (SELECT doc_id, seq, w, count(*)::BIGINT AS c
           FROM toks GROUP BY 1, 2, 3),
nseq AS (SELECT doc_id, (max(seq) + 1)::BIGINT AS n_seqs
         FROM counts GROUP BY 1),
cn AS (SELECT c.*, n.n_seqs FROM counts c JOIN nseq n USING (doc_id)
       WHERE n.n_seqs >= 2),
lft AS (
  SELECT doc_id, w, c, g
  FROM (SELECT doc_id, w, c, n_seqs,
               unnest(range(seq + 1, seq + {TILE_K} + 1)) AS g
        FROM cn)
  WHERE g <= n_seqs - 1
),
rgt AS (
  SELECT doc_id, w, c, g
  FROM (SELECT doc_id, w, c, n_seqs,
               unnest(range(seq - {TILE_K} + 1, seq + 1)) AS g
        FROM cn)
  WHERE g >= 1
),
lvec AS (SELECT doc_id, g, w, sum(c)::BIGINT AS cl
         FROM lft GROUP BY 1, 2, 3),
rvec AS (SELECT doc_id, g, w, sum(c)::BIGINT AS cr
         FROM rgt GROUP BY 1, 2, 3),
dt AS (SELECT l.doc_id, l.g, sum(l.cl * r.cr)::BIGINT AS dot
       FROM lvec l JOIN rvec r
         ON r.doc_id = l.doc_id AND r.g = l.g AND r.w = l.w
       GROUP BY 1, 2),
nlv AS (SELECT doc_id, g, sum(cl * cl)::BIGINT AS nl
        FROM lvec GROUP BY 1, 2),
nrv AS (SELECT doc_id, g, sum(cr * cr)::BIGINT AS nr
        FROM rvec GROUP BY 1, 2),
sims AS (
  SELECT n1.doc_id, n1.g,
         CASE WHEN coalesce(d.dot, 0) = 0 THEN 0
              ELSE {_SIM_SQL} END AS sim
  FROM nlv n1 JOIN nrv USING (doc_id, g)
  LEFT JOIN dt d USING (doc_id, g)
),
depths AS (
  SELECT doc_id, g, sim,
         (greatest(0, coalesce(lag(sim) OVER w, sim) - sim)
          + greatest(0, coalesce(lead(sim) OVER w, sim) - sim))::BIGINT
           AS depth
  FROM sims
  WINDOW w AS (PARTITION BY doc_id ORDER BY g)
),
stats AS (
  SELECT doc_id, count(*)::BIGINT AS n_gaps,
         (sum(sim) // count(*)
          - floor(sqrt(count(*)::DOUBLE * sum(sim * sim)::DOUBLE
                       - sum(sim)::DOUBLE * sum(sim)::DOUBLE)
                  / count(*)::DOUBLE + 0.5)::BIGINT // 2) AS thr
  FROM depths GROUP BY 1
),
ranked AS (
  SELECT d.doc_id, d.g, d.depth, s.n_gaps, s.thr,
         row_number() OVER (PARTITION BY d.doc_id
                            ORDER BY d.depth DESC, d.g) AS rn
  FROM depths d JOIN stats s USING (doc_id)
)
SELECT r.doc_id, n.n_seqs, max(r.n_gaps)::BIGINT AS n_gaps,
       sum(CASE WHEN r.depth > r.thr THEN 1 ELSE 0 END)::BIGINT
         AS n_boundaries,
       max(CASE WHEN r.rn = 1 THEN r.g END)::BIGINT AS top_gap,
       max(r.depth)::BIGINT AS max_depth_micro
FROM ranked r JOIN nseq n USING (doc_id)
GROUP BY r.doc_id, n.n_seqs
"""


QUERIES: dict[str, tuple] = {
    "text_topic_tiles": (texttile, TEXTTILE_SQL),
}
