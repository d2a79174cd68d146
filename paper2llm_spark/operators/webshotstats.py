"""Per-video shot statistics — the shot-length profile derived from
the boundary stream (the editing-rhythm descriptor of film/video
analytics: average shot length is THE cut-rate statistic — Cutting
et al. 2010 tracked it across a century of film; in a corpus
pipeline it separates static footage from rapid-cut content before
sampling frames for captioning).

Composes `mm_shot_boundaries` verbatim — the lag-window hamming
detector is re-certified under this row — and closes the
multimodal family's arc: synthesize frames -> hash -> detect
boundaries -> summarize rhythm.

Semantics (frozen): per doc: ``n_frames`` by the `mm_frame_sample`
rule (``max(bytes div 10, 1)``); ``n_boundaries`` from the
composed detector (0 for single-shot docs — kept via left join);
``n_shots = n_boundaries + 1``;
``mean_shot_len_micro = n_frames * 1e6 div n_shots``;
``max_shot_len`` — the longest run between boundaries (boundary
positions define segments ``[0, b1), [b1, b2), ..., [bk, n)``),
computed from the boundary list with first/last segments included.

Plan shape (the scale story): the detector's one
hashpartitioning(doc_id) window is the composed cost; the audit
adds a per-doc collect of boundary positions (bounded by
frames/SHOT_LEN per doc), one array fold for the max segment, and
a doc_id left join of short rows.  Zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .mmdup import MM_SHOT_SQL, shot_boundaries_frame

MICRO = 1_000_000


def shot_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    frames = docs.select(
        "doc_id",
        F.expr(
            "greatest(cast(length(payload) as bigint) div 10,"
            " cast(1 as bigint))"
        ).alias("n_frames"),
    )
    bounds = shot_boundaries_frame(docs).groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_boundaries"),
        F.sort_array(F.collect_list("frame_idx")).alias("bs"),
    )
    joined = frames.join(bounds, "doc_id", "left").select(
        "doc_id",
        "n_frames",
        F.coalesce("n_boundaries", F.lit(0)).cast("bigint")
        .alias("n_boundaries"),
        F.coalesce("bs", F.expr("cast(array() as array<bigint>)"))
        .alias("bs"),
    )
    seg_max = (
        "aggregate(sequence(0, size(bs)),"
        " named_struct('prev', cast(0 as bigint), 'mx', cast(0 as bigint)),"
        " (acc, i) -> named_struct("
        "   'prev', if(i < size(bs), element_at(bs, i + 1), n_frames),"
        "   'mx', greatest(acc.mx,"
        "     if(i < size(bs), element_at(bs, i + 1), n_frames)"
        "       - acc.prev)),"
        " acc -> acc.mx)"
    )
    return joined.select(
        "doc_id",
        "n_frames",
        "n_boundaries",
        F.expr("n_boundaries + 1").cast("bigint").alias("n_shots"),
        F.expr(f"n_frames * {MICRO} div (n_boundaries + 1)")
        .cast("bigint").alias("mean_shot_len_micro"),
        F.expr(seg_max).cast("bigint").alias("max_shot_len"),
    )


SHOT_STATS_SQL = f"""
WITH frames AS (
  SELECT doc_id,
         greatest(octet_length(text::BLOB) // 10, 1)::BIGINT AS n_frames
  FROM documents
),
bounds AS (
  SELECT doc_id, count(*)::BIGINT AS n_boundaries,
         list_sort(list(frame_idx)) AS bs
  FROM ({MM_SHOT_SQL})
  GROUP BY doc_id
),
joined AS (
  SELECT f.doc_id, f.n_frames,
         coalesce(b.n_boundaries, 0)::BIGINT AS n_boundaries,
         coalesce(b.bs, []) AS bs
  FROM frames f LEFT JOIN bounds b USING (doc_id)
)
SELECT doc_id, n_frames, n_boundaries,
       (n_boundaries + 1)::BIGINT AS n_shots,
       (n_frames * {MICRO} // (n_boundaries + 1))::BIGINT
         AS mean_shot_len_micro,
       list_max(
         list_transform(range(0, len(bs) + 1),
           i -> (CASE WHEN i < len(bs) THEN bs[i + 1] ELSE n_frames END)
                - (CASE WHEN i = 0 THEN 0 ELSE bs[i] END))
       )::BIGINT AS max_shot_len
FROM joined
"""


QUERIES: dict[str, tuple] = {
    "mm_shot_stats": (shot_stats, SHOT_STATS_SQL),
}
