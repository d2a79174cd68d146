"""End-to-end extraction pipeline (C1) + checkpoint/resume (C4) + lineage (C2).

The linear DAG of SURVEY.md §3.4::

    scan(pages) -> anti-join checkpoint -> lang/payload filter
      -> chunk-plan + spread (shuffle #1, explicit skew control)
      -> mapInPandas parse -> per-page SQL ops (narrow)
      -> groupBy(url) sorted collect_list (shuffle #2)
      -> assemble (SQL) -> enhance (pUDF) -> split (pUDF) -> bibtex (pUDF)
      -> write output + lineage + checkpoint commit

Resumability: documents hash into ``n_buckets`` by url; buckets are
processed in ``n_groups`` commit groups. Each group appends its output,
lineage rows, and a checkpoint row per bucket; a restarted run anti-joins
completed buckets out of the input (north_rule requirement) so a killed
job never reprocesses committed work.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.assemble import assemble_documents
from ..operators.enhance import convert_udf
from ..operators.parse import DEFAULT_CHUNK_PAGES, parse_pages
from ..schema import CHECKPOINT
from ..sources.pages import read_pages, select_extractable, with_bucket

OUTPUT_COLUMNS = [
    "url", "markdown", "main_content", "backmatter", "appendix", "title",
    "page_count", "image_references", "model", "bibtex", "bibtex_key",
    "bibtex_formatted", "title_validation", "err", "bucket",
]


def extract_documents(
    pages: DataFrame,
    *,
    mode: str = "placeholder",
    chunk_pages: int = DEFAULT_CHUNK_PAGES,
    spread_partitions: int | None = None,
    langs: tuple[str, ...] = ("en",),
    giant_bytes: int | None = None,
) -> DataFrame:
    """pages table (url, warc_ts, html, text, lang) -> extracted rows.

    Pure transformation — no writes; reusable by tests, the driver entry
    and the checkpointed runner below.
    """
    selected = select_extractable(pages, langs=langs)
    parse_kwargs = {} if giant_bytes is None else {"giant_bytes": giant_bytes}
    page_rows = parse_pages(selected, chunk_pages, spread_partitions, **parse_kwargs)
    docs = assemble_documents(page_rows)

    # quarantined rows carry err != null and null markdown; the UDF passes
    # None through, so one linear plan serves both outcomes. The combined
    # convert stage runs enhance -> split -> bibtex in ONE Arrow hop: the
    # multi-MB markdown crosses Python<->JVM twice total instead of the
    # 3+ crossings three chained UDFs would cost (operators/enhance.py).
    docs = docs.withColumn("res", convert_udf(mode))

    return docs.select(
        "url",
        F.col("res.markdown").alias("markdown"),
        F.col("res.main_content").alias("main_content"),
        F.col("res.backmatter").alias("backmatter"),
        F.col("res.appendix").alias("appendix"),
        F.col("res.title").alias("title"),
        "page_count",
        "image_references",
        "model",
        F.col("res.bibtex").alias("bibtex"),
        F.col("res.bibtex_key").alias("bibtex_key"),
        F.col("res.bibtex_formatted").alias("bibtex_formatted"),
        F.col("res.title_validation").alias("title_validation"),
        "err",
        "bytes_in",
        "parse_partition",
        "parse_wall_ms",
    )


def _lineage_rows(result: DataFrame, run_id: str) -> DataFrame:
    """Per-parse-partition lineage (north_star): partition_id, url_range,
    doc_count, bytes_in/out, wall_ms."""
    return result.groupBy(F.col("parse_partition").alias("partition_id")).agg(
        F.concat_ws("..", F.min("url"), F.max("url")).alias("url_range"),
        F.count("*").alias("doc_count"),
        F.sum("bytes_in").alias("bytes_in"),
        F.sum(F.octet_length(F.coalesce(F.col("markdown"), F.lit("")))).alias("bytes_out"),
        F.max("parse_wall_ms").alias("wall_ms"),
    ).select(
        "partition_id", "url_range", "doc_count", "bytes_in", "bytes_out",
        "wall_ms", F.lit(run_id).alias("run_id"),
        F.current_timestamp().alias("ts"),
    )


class CheckpointedExtractJob:
    """Bucket-committed runner: resumable, lineage-emitting."""

    def __init__(
        self,
        spark: SparkSession,
        input_path: str,
        output_dir: str,
        *,
        fmt: str = "parquet",
        mode: str = "placeholder",
        n_buckets: int = 64,
        n_groups: int = 8,
        chunk_pages: int = DEFAULT_CHUNK_PAGES,
        langs: tuple[str, ...] = ("en",),
    ):
        self.spark = spark
        self.input_path = input_path
        self.output_dir = output_dir
        self.fmt = fmt
        self.mode = mode
        self.n_buckets = n_buckets
        self.n_groups = n_groups
        self.chunk_pages = chunk_pages
        self.langs = langs
        self.out_path = os.path.join(output_dir, "extracted")
        self.lineage_path = os.path.join(output_dir, "lineage")
        self.checkpoint_path = os.path.join(output_dir, "checkpoint")

    # -- checkpoint table ---------------------------------------------------
    def completed_buckets(self) -> set[int]:
        try:
            rows = self.spark.read.parquet(self.checkpoint_path).collect()
        except Exception:
            return set()
        return {r["bucket"] for r in rows if r["status"] == "done"}

    def _mark_done(self, buckets: list[int], run_id: str) -> None:
        rows = [(b, "done", run_id, None) for b in buckets]
        df = self.spark.createDataFrame(rows, CHECKPOINT).withColumn(
            "ts", F.current_timestamp()
        )
        df.write.mode("append").parquet(self.checkpoint_path)

    # -- run ------------------------------------------------------------------
    def run(self, max_groups: int | None = None) -> dict:
        """Process remaining bucket groups; ``max_groups`` limits how many
        commit groups this invocation handles (the kill-and-resume test
        uses it to simulate a mid-run abort)."""
        run_id = uuid.uuid4().hex[:12]
        t0 = time.monotonic()
        pages = read_pages(self.spark, self.input_path, self.fmt)
        if "bucket" not in pages.columns:
            # unbucketed input: compute the logical bucket on the fly —
            # each commit group then re-scans the table (fine locally /
            # for small backfills). Bucketed layouts (sources.pages
            # .with_bucket at write time) skip this: the group filter
            # hits the physical partition column and PRUNES the scan, so
            # the whole run reads the table exactly once in total.
            pages = with_bucket(pages, self.n_buckets)

        done = self.completed_buckets()
        groups: list[list[int]] = [
            [b for b in range(g, self.n_buckets, self.n_groups) if b not in done]
            for g in range(self.n_groups)
        ]
        groups = [g for g in groups if g]
        if max_groups is not None:
            groups = groups[:max_groups]

        processed = 0
        for group in groups:
            subset = pages.filter(F.col("bucket").isin(group))
            result = extract_documents(
                subset, mode=self.mode, chunk_pages=self.chunk_pages,
                langs=self.langs,
            ).withColumn(
                # bucket is a pure function of url — recompute, don't join
                "bucket",
                F.pmod(F.xxhash64("url"), F.lit(self.n_buckets)).cast("int"),
            )
            result = result.cache()
            try:
                result.select(*OUTPUT_COLUMNS).write.mode("append").parquet(
                    self.out_path
                )
                _lineage_rows(result, run_id).write.mode("append").parquet(
                    self.lineage_path
                )
            finally:
                result.unpersist()
            self._mark_done(group, run_id)
            processed += 1

        return {
            "run_id": run_id,
            "groups_processed": processed,
            "wall_s": round(time.monotonic() - t0, 3),
        }
