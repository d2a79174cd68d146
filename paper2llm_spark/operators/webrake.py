"""RAKE — Rapid Automatic Keyword Extraction (Rose, Engel, Cramer &
Cowley 2010, in "Text Mining: Applications and Theory").  The
standard unsupervised per-document keyword extractor: candidate
phrases are maximal runs of content words between stopword/delimiter
boundaries; each word scores ``deg(w)/freq(w)`` where ``freq`` is the
word's occurrence count in the document's candidate phrases and
``deg`` sums the lengths of the phrases it appears in (so words that
co-occur in long phrases score high — RAKE's documented long-phrase
bias); a phrase scores the sum of its member word scores.  Corpus
pipelines run it to attach topic keywords per page (dataset cards,
search facets, cluster labels).

Semantics (frozen): lowercased whitespace tokens (the fixture corpus
is pre-tokenized prose, so whitespace stands in for RAKE's
punctuation+stopword delimiter set); the stopword list is the frozen
GOPHER_REQ_STOPWORDS table (webquality.py) — the delimiter-list
choice is RAKE's tunable, the algorithm is not; word score in exact
integer micro-units ``1_000_000 · deg div freq``; phrase score =
sum of member scores WITH multiplicity (a repeated word counts each
time, faithful to the paper's phrase scoring); emitted: the TOP-1
phrase per document, ties broken by lexicographically smallest
phrase (deterministic across engines; tied rows are value-identical
so the winner's identity cannot diverge).  Documents whose tokens
are all stopwords yield no row.

Plan shape (the scale story): RAKE is embarrassingly per-document —
every window and aggregate keys on ``doc_id`` (+ a phrase/word
subkey), so all four exchanges carry SHORT rows (ids, positions,
single words) and repartition *within* the same doc-hashed space;
the ``text`` column is dropped at the first projection and never
rides an exchange.  At 10^12 docs each stage is a map-side-
combinable agg or a bounded window over one document's tokens —
nothing global, no broadcast, no Python.  (A fused single-pass HOF
variant would trade the exchanges for an interpreted per-row fold;
the exchanged rows here are ~24 bytes, the cheaper side of that
trade at scale.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, tokens
from .webquality import GOPHER_REQ_STOPWORDS

_STOP_IN = ", ".join(f"'{w}'" for w in GOPHER_REQ_STOPWORDS)


def rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return rake_frame(docs)


def rake_frame(docs: DataFrame) -> DataFrame:
    ex = docs.select("doc_id", tokens(F.col("text")).alias("tok")).select(
        "doc_id", F.posexplode("tok").alias("pos", "w")
    )
    is_stop = F.col("w").isin(*GOPHER_REQ_STOPWORDS)
    run = Window.partitionBy("doc_id").orderBy("pos")
    content = (
        ex.select(
            "doc_id",
            "pos",
            "w",
            F.sum(is_stop.cast("int")).over(run).alias("pid"),
            is_stop.alias("is_stop"),
        )
        .filter(~F.col("is_stop"))
        .drop("is_stop")
    )
    plen = F.count(F.lit(1)).over(Window.partitionBy("doc_id", "pid"))
    cl = content.select("doc_id", "pos", "w", "pid", plen.alias("plen"))
    wscore = (
        cl.groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg"))
        .select(
            "doc_id", "w", F.expr("1000000 * deg div freq").alias("wscore")
        )
    )
    ph = (
        cl.join(wscore, ["doc_id", "w"])
        .groupBy("doc_id", "pid")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s.getField("w"),
                ),
            ).alias("phrase"),
            F.sum("wscore").cast("bigint").alias("score_micro"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(
            F.col("score_micro").desc(), F.col("phrase").asc()
        )
    )
    return (
        ph.select("doc_id", "phrase", "score_micro", rn.alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


_TOK = SQL_TOKENS.format(expr="text")

RAKE_SQL = f"""
WITH t AS (SELECT doc_id, {_TOK} AS tok FROM documents),
ex AS (SELECT doc_id,
              unnest(range(0, len(tok))) AS pos,
              unnest(tok) AS w
       FROM t),
f AS (SELECT doc_id, pos, w,
             (CASE WHEN w IN ({_STOP_IN}) THEN 1 ELSE 0 END) AS is_stop
      FROM ex),
pidt AS (SELECT doc_id, pos, w, is_stop,
                sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos) AS pid
         FROM f),
cl AS (SELECT doc_id, pos, w, pid,
              count(*) OVER (PARTITION BY doc_id, pid) AS plen
       FROM pidt WHERE is_stop = 0),
ws AS (SELECT doc_id, w,
              1000000 * sum(plen) // count(*) AS wscore
       FROM cl GROUP BY 1, 2),
ph AS (SELECT c.doc_id, c.pid,
              string_agg(c.w, ' ' ORDER BY c.pos) AS phrase,
              sum(ws.wscore)::BIGINT AS score_micro
       FROM cl c JOIN ws ON ws.doc_id = c.doc_id AND ws.w = c.w
       GROUP BY 1, 2),
r AS (SELECT doc_id, phrase, score_micro,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score_micro DESC, phrase ASC) AS rn
      FROM ph)
SELECT doc_id, phrase, score_micro FROM r WHERE rn = 1
"""


QUERIES: dict[str, tuple] = {
    "text_rake_keywords": (rake_keywords, RAKE_SQL),
}
