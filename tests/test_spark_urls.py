"""Spark URL-algebra expressions vs the Python oracle (P1-P5, F3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from paper2llm_spark.operators import urls as spark_urls
from paper2llm_spark.oracle import urls as oracle_urls

URLS = [
    "https://arxiv.org/abs/2401.00042",
    "https://arxiv.org/html/2401.00042",
    "https://arxiv.org/pdf/2401.00042.pdf",
    "https://arxiv.org/abs/cs/9901001",
    "https://openreview.net/forum?id=AbCd123",
    "https://openreview.net/pdf?id=ZZ99",
    "https://openreview.net/attachment?id=Q1&name=supp",
    "https://openreview.net/forum",
    "https://aclanthology.org/2024.acl-long.123",
    "https://aclanthology.org/P19-1001",
    "https://www.biorxiv.org/content/10.1101/2024.01.01.573456v2",
    "https://www.biorxiv.org/content/10.1101/2024.01.01.573456",
    "https://www.medrxiv.org/content/10.1101/2023.12.12.571234v1",
    "https://papers.nips.cc/paper_files/paper/2023/hash/abc123-Abstract.html",
    "https://papers.neurips.cc/paper/2019/hash/deadbeef-Abstract.html",
    "https://proceedings.mlr.press/v202/smith23a.html",
    "https://proceedings.mlr.press/v139/jones21b",
    "https://example.com/files/mypaper.pdf",
    "https://example.com/files/mypaper",
    "https://example.com/",
]


def _spark_results(spark, col_fn):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    rows = df.select("url", col_fn(F.col("url")).alias("out")).collect()
    return {r["url"]: r["out"] for r in rows}


def test_domain_dispatch_matches_oracle(spark):
    got = _spark_results(spark, spark_urls.repo_domain)
    for u in URLS:
        handler = oracle_urls.get_handler(u)
        expected = handler["domain"] if handler else None
        assert got[u] == expected, u


def test_normalize_matches_oracle(spark):
    got = _spark_results(spark, spark_urls.normalize_pdf_url)
    for u in URLS:
        assert got[u] == oracle_urls.normalize_url(u), u


def test_filename_matches_oracle(spark):
    got = _spark_results(spark, spark_urls.repo_file_name)
    for u in URLS:
        assert got[u] == oracle_urls.url_file_name(u), u


def test_validate_matches_oracle(spark):
    got = _spark_results(spark, spark_urls.validate_url)
    for u in URLS:
        assert got[u] == oracle_urls.validate_url(u), u
