"""PII detection + redaction — the privacy pass every released web
corpus runs before publication (BigScience ROOTS redacts emails and
IPs; FineWeb's pipeline anonymizes emails and public IPs with fixed
placeholder tokens; The Stack v2 strips emails/keys from code).

Semantics (frozen): three regex classes, counted on the ORIGINAL
text, then redacted sequentially (email -> IPv4 -> phone) with fixed
placeholder tokens ``<EMAIL>`` / ``<IP>`` / ``<PHONE>``:

* email — ``[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}``
* IPv4  — ``\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b``
* phone — ``\\b\\d{3}-\\d{3}-\\d{4}\\b`` (NANP dashed form)

The three patterns use only constructs on which Java regex (Spark)
and RE2 (DuckDB) agree exactly — ASCII ``\\d``/``\\b``, greedy
character classes, bounded repetition — and both engines match
leftmost with identical greedy semantics on these shapes, so counts
AND redacted bytes are cross-engine exact; the dual hashes the full
redacted text (md5) so redaction is checked byte-for-byte without
shipping it.  DuckDB's ``regexp_replace`` needs the explicit ``'g'``
flag to match Spark's replace-all default.

The driver corpus has no PII, so the registered query plants it
in-engine: a 4-way hash roll appends (0) an email + private IP,
(1) a phone + email, (2) two IPs, or (3) nothing — every class,
multi-hit docs, and the clean branch are exercised, with the plant
derived from ``doc_id`` identically in the DuckDB dual.

Plan shape (the scale story): counts and the 3-deep replace chain are
ONE codegen projection in the scan task — zero joins, zero exchanges,
zero Python (plan-asserted).  Redaction rides the ingest scan the way
RPv2 computes its signal battery: at 10^12 documents the operator
adds no shuffle, and the regexes are DFA-compilable (no backtracking
blowup class).  Reference seam: the reference sanitizes extracted
Markdown before export (src/core/text/bibtex-sanitizer.ts); this is
the corpus-side analogue of that scrub stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"

_TOKENS = (("<EMAIL>", EMAIL_RE), ("<IP>", IP_RE), ("<PHONE>", PHONE_RE))


def pii_redact_frame(docs: DataFrame) -> DataFrame:
    """doc_id, text -> per-class counts + md5 of the redacted text."""
    body = F.col("text")
    n_email = F.regexp_count(body, F.lit(EMAIL_RE)).cast("long")
    n_ip = F.regexp_count(body, F.lit(IP_RE)).cast("long")
    n_phone = F.regexp_count(body, F.lit(PHONE_RE)).cast("long")
    red = body
    for token, pat in _TOKENS:
        red = F.regexp_replace(red, pat, token)
    return docs.select(
        "doc_id",
        n_email.alias("n_email"),
        n_ip.alias("n_ip"),
        n_phone.alias("n_phone"),
        (n_email + n_ip + n_phone).cast("long").alias("n_pii"),
        F.length(red).cast("long").alias("redacted_len"),
        F.md5(red).alias("redacted_md5"),
    )


def synth_pii_docs(docs: DataFrame) -> DataFrame:
    roll = portable_hash60(
        F.concat(F.col("doc_id").cast("string"), F.lit(":pii"))
    ) % 4
    did = F.col("doc_id").cast("string")
    planted = (
        F.when(
            roll == 0,
            F.concat(
                F.col("text"),
                F.lit(" Contact user"), did,
                F.lit("@example.com or 10.0.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(" today."),
            ),
        )
        .when(
            roll == 1,
            F.concat(
                F.col("text"),
                F.lit(" Call 555-867-5309 or write admin@test.org."),
            ),
        )
        .when(
            roll == 2,
            F.concat(
                F.col("text"),
                F.lit(" Origin server 192.168.1.77 sits behind 8.8.8.8."),
            ),
        )
        .otherwise(F.col("text"))
    )
    return docs.select("doc_id", planted.alias("text"))


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return pii_redact_frame(synth_pii_docs(docs))


_ROLL = sql_hash60("doc_id || ':pii'")

_PLANT_SQL = (
    "CASE WHEN " + _ROLL + " % 4 = 0 THEN text"
    " || ' Contact user' || doc_id || '@example.com or 10.0.0.'"
    " || (doc_id % 256) || ' today.'"
    " WHEN " + _ROLL + " % 4 = 1"
    " THEN text || ' Call 555-867-5309 or write admin@test.org.'"
    " WHEN " + _ROLL + " % 4 = 2"
    " THEN text || ' Origin server 192.168.1.77 sits behind 8.8.8.8.'"
    " ELSE text END"
)

PII_REDACT_SQL = (
    "WITH planted AS (SELECT doc_id, " + _PLANT_SQL + " AS body"
    " FROM documents),\n"
    "f AS (SELECT doc_id,\n"
    "  length(regexp_extract_all(body, '" + EMAIL_RE + "'))::BIGINT"
    " AS n_email,\n"
    "  length(regexp_extract_all(body, '" + IP_RE + "'))::BIGINT"
    " AS n_ip,\n"
    "  length(regexp_extract_all(body, '" + PHONE_RE + "'))::BIGINT"
    " AS n_phone,\n"
    "  regexp_replace(regexp_replace(regexp_replace(body,\n"
    "    '" + EMAIL_RE + "', '<EMAIL>', 'g'),\n"
    "    '" + IP_RE + "', '<IP>', 'g'),\n"
    "    '" + PHONE_RE + "', '<PHONE>', 'g') AS red\n"
    " FROM planted)\n"
    "SELECT doc_id, n_email, n_ip, n_phone,\n"
    "  (n_email + n_ip + n_phone)::BIGINT AS n_pii,\n"
    "  length(red)::BIGINT AS redacted_len,\n"
    "  md5(red) AS redacted_md5\n"
    "FROM f"
)


QUERIES: dict[str, tuple] = {
    "text_pii_redact": (pii_redact, PII_REDACT_SQL),
}
