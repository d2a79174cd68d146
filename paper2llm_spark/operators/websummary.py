"""Luhn significant-sentence scoring (Luhn, IBM J. R&D 1958 — "The
Automatic Creation of Literature Abstracts", the original extractive
summarizer and still the baseline every survey starts from).  For a
training-data pipeline the per-doc best-sentence score doubles as a
topical-coherence signal: word-salad and boilerplate docs have no
dense cluster of repeated content words, so their best span score
collapses.

Semantics (frozen): sentences split by the websentence.py discipline
(terminator+space -> U+0001 sentinel, trim, drop empties).
**Significant word** = lowercased whitespace token that is NOT in the
frozen GOPHER_REQ_STOPWORDS list and occurs >= 2 times IN THE DOC
(Luhn's frequency band, floor only — his upper cut is the stopword
list's job).  Within a sentence, significant-word positions cluster
into **spans**: consecutive positions join iff separated by <= 4
non-significant words (``pos - prev <= 5``, the paper's bracketing
rule).  Span score = ``cnt^2 * 1e6 div span_len`` (Luhn's
significance factor as exact integer micro-units), sentence score =
max span, doc winner = highest-scoring sentence (ties -> lower
index).  Docs whose words are all insignificant emit the ``-1/0``
sentinel row (never dropped, never NULL ints); that polarity is
PLANTED in-engine — every ``doc_id % 101 == 0`` doc re-enters with an
8-unique-token body.

Plan shape (the scale story): token rows are 4 short ints (doc, sent,
pos, word-hash-free string) — the in-doc frequency groupBy and the
significant-position semi-join share the (doc_id, w) key; the
gaps-and-islands break/cluster pass is ONE window over (doc_id,
sidx); every later agg collapses monotonically (spans -> sentences ->
docs).  No broadcast of anything corpus-sized, zero Python
(plan-asserted).  This is the relational form of Luhn's scan — the
array-HOF alternative is O(len^2) per doc and loses at book-length
outliers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, tokens
from .webquality import GOPHER_REQ_STOPWORDS

MICRO = 1_000_000
SIG_FREQ = 2
LUHN_GAP = 4          # max insignificant words inside a span
PLANT_MOD = 101
PLANT_BASE = 50_000_000
_SENT_BOUND = r"([.!?]) "


def _sents(col):
    marked = F.regexp_replace(col, _SENT_BOUND, "$1\x01")
    return F.filter(
        F.transform(F.split(marked, "\x01"), lambda s: F.trim(s)),
        lambda s: s != "",
    )


def luhn_frame(docs: DataFrame) -> DataFrame:
    seg = docs.select(
        "doc_id", _sents(F.col("text")).alias("sents")
    ).filter(F.size("sents") > 0)
    base = seg.select(
        "doc_id", F.size("sents").cast("bigint").alias("n_sents")
    ).localCheckpoint()
    toks = (
        seg.select("doc_id", F.posexplode("sents").alias("sidx", "sent"))
        .select(
            "doc_id", "sidx",
            F.posexplode(tokens(F.col("sent"))).alias("pos", "w"),
        )
    )
    wf = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("cnt"))
    sig = wf.filter(
        (F.col("cnt") >= SIG_FREQ)
        & ~F.col("w").isin(*GOPHER_REQ_STOPWORDS)
    ).select("doc_id", "w")
    nsig = sig.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sig")
    )
    sigtok = toks.join(sig, ["doc_id", "w"]).select("doc_id", "sidx", "pos")
    ws = Window.partitionBy("doc_id", "sidx").orderBy("pos")
    brk = sigtok.select(
        "doc_id", "sidx", "pos",
        F.when(
            F.col("pos") - F.lag("pos").over(ws) > LUHN_GAP + 1, F.lit(1)
        ).otherwise(F.lit(0)).alias("brk"),
    )
    clustered = brk.select(
        "doc_id", "sidx", "pos",
        F.sum("brk").over(
            ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cl"),
    )
    spans = clustered.groupBy("doc_id", "sidx", "cl").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("pos").alias("f"),
        F.max("pos").alias("l"),
    )
    sent_score = (
        spans.select(
            "doc_id", "sidx",
            F.expr(f"cnt * cnt * {MICRO} div (l - f + 1)")
            .cast("bigint").alias("score"),
        )
        .groupBy("doc_id", "sidx")
        .agg(F.max("score").alias("score"))
    )
    wr = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("sidx").asc()
    )
    best = (
        sent_score.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("sidx").cast("bigint").alias("best_sent"),
            F.col("score").alias("best_score_micro"),
        )
    )
    return (
        base.join(best, "doc_id", "left")
        .join(nsig, "doc_id", "left")
        .select(
            "doc_id", "n_sents",
            F.coalesce("n_sig", F.lit(0)).cast("bigint").alias("n_sig"),
            F.coalesce("best_sent", F.lit(-1)).cast("bigint")
            .alias("best_sent"),
            F.coalesce("best_score_micro", F.lit(0)).cast("bigint")
            .alias("best_score_micro"),
        )
    )


def luhn_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    base = docs.select("doc_id", "text")
    plant = (
        base.filter(F.col("doc_id") % PLANT_MOD == 0)
        .select(
            (F.col("doc_id") + PLANT_BASE).alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(8)),
                    lambda k: F.concat(
                        F.lit("uq"),
                        F.col("doc_id").cast("string"),
                        F.lit("x"),
                        k.cast("string"),
                    ),
                ),
            ).alias("text"),
        )
    )
    return luhn_frame(base.unionByName(plant))


_STOP_IN = ", ".join(f"'{w}'" for w in GOPHER_REQ_STOPWORDS)
_TOKLIST = SQL_TOKENS.format(expr="sent")

LUHN_SUMMARY_SQL = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {PLANT_BASE},
         array_to_string(
           list_transform(range(1, 9),
             k -> 'uq' || doc_id::VARCHAR || 'x' || k::VARCHAR), ' ')
  FROM documents WHERE doc_id % {PLANT_MOD} = 0
),
seg AS (
  SELECT doc_id,
         list_filter(
           list_transform(
             string_split(
               regexp_replace(text, '{_SENT_BOUND}', '\\1' || chr(1), 'g'),
               chr(1)),
             s -> trim(s)),
           s -> s <> '') AS sents
  FROM corpus
),
base AS (SELECT doc_id, len(sents)::BIGINT AS n_sents FROM seg
         WHERE len(sents) > 0),
sentrows AS (
  SELECT doc_id,
         unnest(range(1, len(sents) + 1)) - 1 AS sidx,
         unnest(sents) AS sent
  FROM seg
),
sentoks AS (SELECT doc_id, sidx, {_TOKLIST} AS tok FROM sentrows),
toks AS (
  SELECT doc_id, sidx,
         unnest(range(1, len(tok) + 1)) - 1 AS pos,
         unnest(tok) AS w
  FROM sentoks
),
wf AS (SELECT doc_id, w, count(*) AS cnt FROM toks GROUP BY 1, 2),
sig AS (SELECT doc_id, w FROM wf
        WHERE cnt >= {SIG_FREQ} AND w NOT IN ({_STOP_IN})),
nsig AS (SELECT doc_id, count(*)::BIGINT AS n_sig FROM sig GROUP BY 1),
sigtok AS (
  SELECT t.doc_id, t.sidx, t.pos FROM toks t JOIN sig s
      ON s.doc_id = t.doc_id AND s.w = t.w
),
brk AS (
  SELECT doc_id, sidx, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id, sidx
                                        ORDER BY pos) > {LUHN_GAP} + 1
              THEN 1 ELSE 0 END AS brk
  FROM sigtok
),
clustered AS (
  SELECT doc_id, sidx, pos,
         sum(brk) OVER (PARTITION BY doc_id, sidx ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS cl
  FROM brk
),
spans AS (
  SELECT doc_id, sidx, cl, count(*) AS cnt, min(pos) AS f, max(pos) AS l
  FROM clustered GROUP BY 1, 2, 3
),
sent_score AS (
  SELECT doc_id, sidx,
         max((cnt * cnt * {MICRO}) // (l - f + 1))::BIGINT AS score
  FROM spans GROUP BY 1, 2
),
best AS (
  SELECT doc_id, sidx::BIGINT AS best_sent, score
  FROM (SELECT doc_id, sidx, score,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, sidx) AS rn
        FROM sent_score)
  WHERE rn = 1
)
SELECT b.doc_id, b.n_sents,
       coalesce(n.n_sig, 0)::BIGINT AS n_sig,
       coalesce(t.best_sent, -1)::BIGINT AS best_sent,
       coalesce(t.score, 0)::BIGINT AS best_score_micro
FROM base b LEFT JOIN best t USING (doc_id) LEFT JOIN nsig n USING (doc_id)
"""


QUERIES: dict[str, tuple] = {
    "text_luhn_summary": (luhn_summary, LUHN_SUMMARY_SQL),
}
