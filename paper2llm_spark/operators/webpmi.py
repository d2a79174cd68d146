"""PMI collocation mining (Church & Hanks 1990, "Word association
norms, mutual information, and lexicography") — the classic
association score behind collocation dictionaries, phrase-table
seeding, and tokenizer-merge diagnostics (a BPE merge IS a
high-PMI bigram; auditing the corpus's top PMI pairs predicts
which merges a tokenizer will learn).

Semantics (frozen): lowercased whitespace tokens; adjacent-bigram
counts ``c12`` with positional marginals from the SAME bigram table
(``c1`` = count of w1 as a left element, ``c2`` = count of w2 as a
right element, ``N`` = total bigrams — the marginals normalize
exactly, no off-by-boundary mismatch against unigram counts);
bigrams with ``c12 >= MIN_COUNT`` score::

    pmi_micro = floor( ln( (c12 · N) / (c1 · c2) ) · 1e6 + 0.5 )

— one shape-identical double ``ln`` over an exactly-integer ratio
then micro-nat rounding, the proven weblm.py discipline (bigint `/`
yields double in both engines; the double shapes are identical by
construction, so the hash holds).  Output:
``(w1, w2, c12, pmi_micro)``.

Plan shape (the scale story): the bigram groupBy is the operator's
ONE corpus-sized exchange (map-side combinable — the Web-1T shape);
both marginals and N are DERIVED from the collapsed bigram table
(vocabulary²-bounded in theory, Heaps-bounded in practice, tiny next
to the corpus), re-entering by broadcast-sized joins Catalyst plans
from stats.  The integer products ``c12·N`` and ``c1·c2`` stay under
2^63 for any corpus where the bigram table itself is storable
(c <= N <= 2^31 keeps both products < 2^62).  Zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, sql_ngrams, tokens, word_ngrams

MIN_COUNT = 5


def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return pmi_frame(docs)


def pmi_frame(docs: DataFrame) -> DataFrame:
    tok = docs.select(tokens(F.col("text")).alias("tok"))
    big = (
        tok.select(F.explode(word_ngrams(F.col("tok"), 2)).alias("g"))
        .select(
            F.substring_index("g", " ", 1).alias("w1"),
            F.substring_index("g", " ", -1).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    big = big.localCheckpoint()  # marginals + N + the scored join all reuse it
    left = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
    right = big.groupBy("w2").agg(F.sum("c12").alias("c2"))
    total = big.agg(F.sum("c12").alias("n"))
    return (
        big.filter(F.col("c12") >= MIN_COUNT)
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("bigint").alias("c12"),
            F.floor(
                F.log((F.col("c12") * F.col("n")) / (F.col("c1") * F.col("c2")))
                * 1e6
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("pmi_micro"),
        )
    )


_TOK = SQL_TOKENS.format(expr="text")
_BIGRAMS = sql_ngrams("tok", 2)

PMI_SQL = f"""
WITH t AS (SELECT {_TOK} AS tok FROM documents),
ex AS (SELECT g FROM (SELECT {_BIGRAMS} AS gs FROM t), unnest(gs) AS u(g)),
big AS (
  SELECT split_part(g, ' ', 1) AS w1, split_part(g, ' ', 2) AS w2,
         count(*) AS c12
  FROM ex GROUP BY 1, 2
),
l AS (SELECT w1, sum(c12) AS c1 FROM big GROUP BY 1),
r AS (SELECT w2, sum(c12) AS c2 FROM big GROUP BY 1),
n AS (SELECT sum(c12) AS n FROM big)
SELECT big.w1, big.w2, big.c12::BIGINT AS c12,
       floor(ln((big.c12 * n.n) / (l.c1 * r.c2)) * 1e6 + 0.5)::BIGINT
         AS pmi_micro
FROM big JOIN l USING (w1) JOIN r USING (w2), n
WHERE big.c12 >= {MIN_COUNT}
"""


QUERIES: dict[str, tuple] = {
    "corpus_pmi_collocations": (pmi_collocations, PMI_SQL),
}
