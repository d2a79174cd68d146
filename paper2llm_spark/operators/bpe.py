"""Distributed BPE tokenizer training (SURVEY.md §2.11).

Byte-pair encoding (Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units") is the tokenizer-training step every
LLM data pipeline runs after curation.  The published algorithm is
inherently sequential per round (count all adjacent symbol pairs, merge
the most frequent, repeat), but the DATA layout makes it
cluster-friendly: training operates on the WORD-TYPE table, not the
corpus — so the only corpus-sized pass is the initial word count.

Scale shape (the plan that survives 100 TB):

* pass 0 is a map-side-combinable ``groupBy(token)`` — the classic
  word-count exchange of short partial rows; the result is Heaps-law
  bounded (~10^8 word types at web scale, thousands here) and is
  ``localCheckpoint``-ed so the 2·N_MERGES later jobs replay vocab-sized
  lineage, never the corpus scan;
* each round is ONE map-side-combinable pair-count ``groupBy`` over the
  word-type rows plus a **1-row driver argmax** (the bounded-driver-state
  pattern the k-means quantizer uses: O(1) rows per round, never data);
* merge application is a narrow per-row ``replace`` — no shuffle.

Exactness: the symbol state is a delimiter-bracketed string
(``\\x1f sym \\x1e`` per symbol), so applying merge (a, b) is a literal
``replace('\\x1f a \\x1e\\x1f b \\x1e' -> '\\x1f ab \\x1e')``: both
engines scan left-to-right non-overlapping, which IS the reference
greedy merge order ("aaaa" + (a,a) -> [aa, aa]), and the bracketing
means adjacent matches never share boundary characters (the classic
space-joined encoding fails exactly there) and needs no lookarounds
(RE2 — the DuckDB regex engine — has none).  Pair counts are exact
bigint sums; the argmax tie-break is (count desc, left asc, right asc),
so the learned merge table is bit-deterministic in both engines.

The registered query returns the segmented word-type table after
``BPE_MERGES`` rounds — (word, count, segmentation, n_symbols) — which
transitively verifies every learned merge: one wrong argmax in either
engine reshapes thousands of segmentations and the hash gate fails.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, tokens

BPE_MERGES = 8
_L = "\x1f"  # symbol open bracket (unit separator)
_R = "\x1e"  # symbol close bracket (record separator)
_SYM_RE = f"{_L}([^{_R}]*){_R}"


def _word_counts(docs: DataFrame) -> DataFrame:
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def _symbolize(wc: DataFrame) -> DataFrame:
    w = F.col("w")
    chars = F.transform(
        F.sequence(F.lit(1), F.length(w)), lambda i: w.substr(i, F.lit(1))
    )
    s = F.array_join(
        F.transform(chars, lambda c: F.concat(F.lit(_L), c, F.lit(_R))), ""
    )
    return wc.select("w", "cnt", s.alias("s"))


def _pair_counts(words: DataFrame) -> DataFrame:
    ls = F.regexp_extract_all(F.col("s"), F.lit(_SYM_RE), 1)
    staged = words.select("cnt", ls.alias("ls"))
    # sequence(1, 0) DESCENDS in Spark: single-symbol words must yield
    # an empty pair index, so start at 0 and drop it
    idx = F.filter(
        F.sequence(F.lit(0), F.size("ls") - 1), lambda i: i >= 1
    )
    pairs = staged.select(
        "cnt",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at("ls", i).alias("a"),
                    F.element_at("ls", i + 1).alias("b"),
                ),
            )
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.a").alias("a"), F.col("p.b").alias("b")
    ).agg(F.sum("cnt").alias("pc"))


def bpe_train_frame(docs: DataFrame) -> tuple[DataFrame, list[tuple]]:
    """Run ``BPE_MERGES`` rounds; returns (segmented word-type frame,
    learned merge list [(round, left, right, pair_count), ...])."""
    words = _symbolize(_word_counts(docs)).localCheckpoint()
    merges: list[tuple] = []
    for r in range(1, BPE_MERGES + 1):
        best = (
            _pair_counts(words)
            .orderBy(F.col("pc").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, pc = best[0]["a"], best[0]["b"], best[0]["pc"]
        merges.append((r, a, b, int(pc)))
        words = words.withColumn(
            "s",
            F.replace(
                F.col("s"),
                F.lit(f"{_L}{a}{_R}{_L}{b}{_R}"),
                F.lit(f"{_L}{a}{b}{_R}"),
            ),
        )
    ls = F.regexp_extract_all(F.col("s"), F.lit(_SYM_RE), 1)
    seg = words.select("w", "cnt", ls.alias("ls")).select(
        "w",
        "cnt",
        F.array_join("ls", " ").alias("segmentation"),
        F.size("ls").cast("bigint").alias("n_symbols"),
    )
    return seg, merges


def bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seg, _merges = bpe_train_frame(docs)
    return seg


_TOK = SQL_TOKENS.format(expr="text")


def _bpe_sql() -> str:
    # \x1f/\x1e embedded raw in the SQL literal; chr() would also work
    # but raw keeps the pattern strings identical to the Spark side
    sym_re = _SYM_RE
    ctes = [
        f"""wc AS (
  SELECT tok AS w, count(*)::BIGINT AS cnt
  FROM (SELECT unnest({_TOK}) AS tok FROM documents)
  GROUP BY tok
),
w0 AS (
  SELECT w, cnt,
         array_to_string(list_transform(range(1, length(w) + 1),
                         i -> '{_L}' || w[i:i] || '{_R}'), '') AS s
  FROM wc
)"""
    ]
    for r in range(1, BPE_MERGES + 1):
        p = r - 1
        ctes.append(
            f"""e{r} AS (
  SELECT cnt,
         unnest(list_transform(range(1, len(ls)), i -> ls[i])) AS a,
         unnest(list_transform(range(1, len(ls)), i -> ls[i+1])) AS b
  FROM (SELECT cnt, regexp_extract_all(s, '{sym_re}', 1) AS ls FROM w{p})
),
m{r} AS (
  SELECT a, b, sum(cnt)::BIGINT AS pc FROM e{r}
  GROUP BY a, b ORDER BY pc DESC, a, b LIMIT 1
),
w{r} AS (
  -- LEFT JOIN ON TRUE + coalesce: if the corpus exhausts its pair
  -- vocabulary before BPE_MERGES rounds, m{r} is empty — a plain
  -- cross join would empty every later CTE, while the Spark side
  -- break()s and keeps the current segmentation.  Fall back to the
  -- previous round's s identically here.
  SELECT w, cnt,
         coalesce(replace(s, '{_L}' || a || '{_R}{_L}' || b || '{_R}',
                 '{_L}' || a || b || '{_R}'), s) AS s
  FROM w{p} LEFT JOIN m{r} ON TRUE
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT w, cnt,
       array_to_string(regexp_extract_all(s, '{sym_re}', 1), ' ')
         AS segmentation,
       len(regexp_extract_all(s, '{sym_re}', 1))::BIGINT AS n_symbols
FROM w{BPE_MERGES}"""
    )


BPE_TRAIN_SQL = _bpe_sql()


# ---------------------------------------------------------------------------
# apply the trained tokenizer: per-document BPE token count / fertility
# ---------------------------------------------------------------------------

def bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens-per-document under the trained BPE vocabulary, plus
    fertility (BPE tokens per word) — the number every tokenizer
    budget/mixture computation needs ("how many training tokens is
    this corpus?").

    Composition, not recomputation: the segmented word-type table from
    :func:`bpe_train_frame` is vocab-sized, so applying the tokenizer
    corpus-wide is ONE explode + a **broadcast** join on the word +
    a map-side-combinable groupBy(doc_id) of bigint sums — the same
    short-row exchange as a word count.  Re-segmenting every token
    occurrence (8 string replaces × corpus tokens) would do Heaps-law
    times more string work for the same answer.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    seg, _merges = bpe_train_frame(docs)
    ex = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("w")
    )
    joined = ex.join(F.broadcast(seg.select("w", "n_symbols")), "w")
    agg = joined.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_words"),
        F.sum("n_symbols").alias("bpe_tokens"),
    )
    fert = F.floor(
        F.col("bpe_tokens") / F.col("n_words") * 10000 + F.lit(0.5)
    ) / 10000
    return agg.select("doc_id", "n_words", "bpe_tokens", fert.alias("fertility"))


BPE_TOKEN_COUNT_SQL = f"""
WITH seg AS ({BPE_TRAIN_SQL}),
ex AS (SELECT doc_id, unnest({_TOK}) AS w FROM documents),
a AS (
  SELECT doc_id, count(*)::BIGINT AS n_words,
         sum(n_symbols)::BIGINT AS bpe_tokens
  FROM ex JOIN seg USING (w)
  GROUP BY doc_id
)
SELECT doc_id, n_words, bpe_tokens,
       floor(bpe_tokens / n_words * 10000 + 0.5) / 10000 AS fertility
FROM a
"""


QUERIES: dict[str, tuple] = {
    "text_bpe_train": (bpe_train, BPE_TRAIN_SQL),
    "text_bpe_token_count": (bpe_token_count, BPE_TOKEN_COUNT_SQL),
}
