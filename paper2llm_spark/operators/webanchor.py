"""Anchor-text aggregation per target host (SURVEY.md §2.11).

The other half of the link signal `operators/webgraph.py` starts:
centrality ranks hosts by WHO links to them, anchor-text aggregation
describes WHAT the web calls them.  Common Crawl's own host metadata,
classic IR (anchor text is the strongest document descriptor known to
search ranking — Brin & Page 1998 §2.2), and modern curation both use
the aggregated anchor vocabulary of a host as a quality/topic prior
that needs no content fetch.  This operator emits the top-K anchor
terms per destination host with exact counts and a deterministic rank.

Scale shape (the plan that survives a 10^12-edge crawl):

* anchor elements are pulled scan-side with ONE codegen
  ``regexp_extract_all`` over the decoded payload (same grammar as
  `webgraph.outlinks_frame`, extended to capture the element body);
  href/text parsing is two more codegen ``regexp_extract`` calls —
  zero Python anywhere;
* the explode emits (dst_host, term) short rows; the first groupBy is
  map-side combinable, so the only corpus-sized exchange carries
  partial counts, never html or anchor strings;
* the top-K is a ``row_number`` window over the AGGREGATED
  (host, term, count) rows — vocabulary-bounded state, not
  corpus-bounded; ordering is (count desc, term asc), bit-deterministic
  in both engines with no float anywhere.

The driver corpus has no link column, so the registered query extends
the `webgraph` synthetic pages with hash-chosen anchor TEXT: anchor k
of document d links to host ``h{hash % OL_HOSTS}`` and carries two
consecutive tokens of the document starting at a hash-chosen offset —
both engines synthesize byte-identical payloads from ``documents``
alone, so term counts and ranks discriminate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60, tokens
from .webgraph import OL_HOSTS, OL_OUT_K

ANCHOR_TOP_K = 5


def anchor_terms_frame(pages: DataFrame) -> DataFrame:
    """(url, html:binary) pages -> top-K anchor terms per target host."""
    els = F.expr(
        r"""regexp_extract_all(decode(html, 'UTF-8'),
            '(?i)<a\\b[^>]*?href\\s*=\\s*["\'][^"\']+["\'][^>]*>[^<]*</a>', 0)"""
    )
    href = F.regexp_extract(
        F.col("el"), r"""(?i)href\s*=\s*["']([^"']+)["']""", 1
    )
    atext = F.regexp_extract(F.col("el"), r">([^<]*)</a>", 1)
    pairs = (
        pages.select(F.explode(els).alias("el"))
        .select(
            F.regexp_extract(href, r"https://([^/]+)/", 1).alias("dst_host"),
            F.explode(tokens(atext)).alias("term"),
        )
    )
    counted = pairs.groupBy("dst_host", "term").agg(
        F.count("*").cast("bigint").alias("n_mentions")
    )
    w = Window.partitionBy("dst_host").orderBy(
        F.col("n_mentions").desc(), F.col("term")
    )
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= ANCHOR_TOP_K)
        .select("dst_host", "rank", "term", "n_mentions")
    )


def _synth_anchored_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> pages whose html carries OL_OUT_K anchors with
    hash-chosen target hosts AND hash-chosen two-token anchor text
    (byte-identical to the dual's synthesis)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    n_tok = F.size("toks")

    def anchor(k):
        h = portable_hash60(
            F.concat(F.col("doc_id").cast("string"), F.lit("#"),
                     k.cast("string"))
        )
        off = (
            portable_hash60(
                F.concat(F.col("doc_id").cast("string"), F.lit("@"),
                         k.cast("string"))
            )
            % F.greatest(n_tok - 1, F.lit(1))
        ).cast("int")
        return F.concat(
            F.lit('<a href="https://h'),
            (h % OL_HOSTS).cast("string"),
            F.lit('.test/d/'),
            F.col("doc_id").cast("string"),
            F.lit('">'),
            F.array_join(F.slice(F.col("toks"), off + 1, 2), " "),
            F.lit("</a>"),
        )

    anchors = F.array_join(
        F.transform(F.sequence(F.lit(0), F.lit(OL_OUT_K - 1)), anchor), ""
    )
    return docs.select(
        F.encode(
            F.concat(F.lit("<html><body>"), anchors, F.lit("</body></html>")),
            "UTF-8",
        ).alias("html"),
    )


def anchor_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    return anchor_terms_frame(_synth_anchored_pages(spark, sf_dir))


_AT_TOK = (
    "list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0)"
)
_A_HASH = sql_hash60("doc_id || '#' || k")

ANCHOR_TEXT_SQL = f"""
WITH t AS (
  SELECT doc_id, {_AT_TOK} AS tok FROM documents
),
p AS (
  SELECT
    '<html><body>' ||
    (SELECT string_agg(
        '<a href="https://h' || ({_A_HASH}) % {OL_HOSTS}
        || '.test/d/' || doc_id || '">'
        || array_to_string(
             tok[(({sql_hash60("doc_id || '@' || k")})
                   % greatest(len(tok) - 1, 1) + 1)
                :(({sql_hash60("doc_id || '@' || k")})
                   % greatest(len(tok) - 1, 1) + 2)], ' ')
        || '</a>', '' ORDER BY k)
     FROM range(0, {OL_OUT_K}) r(k)) || '</body></html>' AS html
  FROM t
),
els AS (
  SELECT unnest(regexp_extract_all(html,
      '(?i)<a\\b[^>]*?href\\s*=\\s*["''][^"'']+["''][^>]*>[^<]*</a>', 0)) AS el
  FROM p
),
pairs AS (
  SELECT regexp_extract(regexp_extract(el,
             'href\\s*=\\s*["'']([^"'']+)["'']', 1),
             'https://([^/]+)/', 1) AS dst_host,
         unnest(list_filter(string_split_regex(
             lower(regexp_extract(el, '>([^<]*)</a>', 1)), '\\s+'),
             x -> length(x) > 0)) AS term
  FROM els
),
counted AS (
  SELECT dst_host, term, count(*)::BIGINT AS n_mentions
  FROM pairs GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY dst_host
                               ORDER BY n_mentions DESC, term) AS rank
  FROM counted
)
SELECT dst_host, rank, term, n_mentions
FROM ranked WHERE rank <= {ANCHOR_TOP_K}
"""


QUERIES: dict[str, tuple] = {
    "web_anchor_text": (anchor_text, ANCHOR_TEXT_SQL),
}
