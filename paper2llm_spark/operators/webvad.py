"""Energy-threshold voice-activity detection over PCM frames — the
first tier of every speech pipeline (ITU-T G.729 Annex B and ETSI AMR
VAD both open with a frame-energy gate; silence removal is to audio
corpora what boilerplate stripping is to web text: the bulk-volume
cut before any model runs).

The container has no audio codecs, so — per this repo's multimodal
discipline (operators/multimodal.py: decode seams stubbed, plumbing
real) — the PCM is a deterministic in-engine synthesis and the
operator certifies the VAD DATAFLOW engine-identically: framing,
the exact-integer energy fold, thresholding, and speech-segment
merging.  A real decoder drops in by replacing the synthesis CTE
with a mapInPandas decode of the binary column.

Semantics (frozen): per doc, ``N_FRAMES = 8`` frames of ``FRAME =
160`` samples (10 ms at 16 kHz).  Frame f is a speech frame iff
``hash60(doc ':f' f) % 3 != 0`` — its samples are uniform in
[-1000, 1000], silence frames in [-10, 10]:
``s_i = hash60(doc ':s' i) % (2*amp + 1) - amp``.  Energy =
``sum(s^2) div FRAME`` (exact bigint); speech iff ``energy >
ENERGY_MIN = 10000`` (silence measures ~33, speech ~333k — three
orders of separation, so the synthesis can never flake the gate).
Adjacent speech frames merge into SEGMENTS (gaps-and-islands:
``frame - row_number`` over speech frames is constant per run).
Output per doc: ``(doc_id, n_frames, n_speech, n_segments,
longest_seg)``.

Plan shape (the scale story): the synthesis + energy fold run in
ONE vectorized mapInPandas Arrow pass (the webcdc seam discipline:
the declarative HOF fold paid the interpreted ~10µs/sample tax —
measured 56 s for 6.4M samples at sf0.1 — while the Arrow batch
does the same 8 energies per doc in bulk Python; this is ALSO where
a real PCM decoder plugs in, so the seam is the production shape
twice over); sample rows NEVER exist as rows, only the 8 frame
energies per doc do; the island merge is one window + groupBy over
(doc, speech-frame) short rows, exchanges keyed by doc_id
(plan-asserted: exactly one MapInPandas, no row-at-a-time Python).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import portable_hash60, sql_hash60

FRAME = 160
N_FRAMES = 8
ENERGY_MIN = 10_000


def _h60(sv: str) -> int:
    return int(hashlib.md5(sv.encode()).hexdigest()[:15], 16)


def _doc_energies(doc_id: int) -> list[int]:
    """The frozen synthesis, replayed in bulk Python (identical to the
    DuckDB dual's per-sample md5 arithmetic)."""
    out = []
    for f in range(N_FRAMES):
        amp = 1000 if _h60(f"{doc_id}:f{f}") % 3 != 0 else 10
        m = 2 * amp + 1
        acc = 0
        for i in range(f * FRAME, (f + 1) * FRAME):
            sv = _h60(f"{doc_id}:s{i}") % m - amp
            acc += sv * sv
        out.append(acc // FRAME)
    return out


_ES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("es", T.ArrayType(T.LongType())),
])


def _energies_arrow(docs: DataFrame) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = [int(d) for d in batch["doc_id"]]
            yield pd.DataFrame(
                {"doc_id": ids, "es": [_doc_energies(d) for d in ids]}
            )

    return docs.select("doc_id").mapInPandas(gen, schema=_ES_SCHEMA)


def vad_frame(docs: DataFrame) -> DataFrame:
    energies = _energies_arrow(docs)
    frames = energies.select(
        "doc_id",
        F.posexplode("es").alias("f", "e"),
    ).select(
        "doc_id", "f", (F.col("e") > ENERGY_MIN).alias("speech")
    )
    sp = frames.filter("speech")
    wr = Window.partitionBy("doc_id").orderBy("f")
    runs = sp.select(
        "doc_id", "f",
        (F.col("f") - F.row_number().over(wr)).alias("run"),
    )
    segs = runs.groupBy("doc_id", "run").agg(
        F.count(F.lit(1)).cast("bigint").alias("seg_len")
    )
    per_doc = segs.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.sum("seg_len").cast("bigint").alias("n_speech"),
        F.max("seg_len").cast("bigint").alias("longest_seg"),
    )
    return (
        # doc universe from the INPUT, not from energies — re-using the
        # Arrow output here would run the synthesis pass a second time
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.lit(N_FRAMES).cast("bigint").alias("n_frames"),
            F.coalesce("n_speech", F.lit(0)).cast("bigint")
            .alias("n_speech"),
            F.coalesce("n_segments", F.lit(0)).cast("bigint")
            .alias("n_segments"),
            F.coalesce("longest_seg", F.lit(0)).cast("bigint")
            .alias("longest_seg"),
        )
    )


def audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id"
    ).repartition(spark.sparkContext.defaultParallelism)
    return vad_frame(docs)


def _energy_sql(f: int) -> str:
    amp = (f"(CASE WHEN {sql_hash60(f_expr_f(f))} % 3 != 0"
           " THEN 1000 ELSE 10 END)")
    samp = sql_hash60("doc_id::VARCHAR || ':s' || i::VARCHAR")
    return (
        f"(list_sum(list_transform(range({f * FRAME}, {(f + 1) * FRAME}),"
        f" i -> (({samp} % (2 * {amp} + 1) - {amp})"
        f" * ({samp} % (2 * {amp} + 1) - {amp}))))::BIGINT // {FRAME})"
    )


def f_expr_f(f: int) -> str:
    return f"doc_id::VARCHAR || ':f{f}'"


def _vad_sql() -> str:
    es = ", ".join(_energy_sql(f) for f in range(N_FRAMES))
    return f"""
WITH energies AS (
  SELECT doc_id, [{es}] AS es FROM documents
),
frames AS (
  SELECT doc_id,
         unnest(range(0, {N_FRAMES})) AS f,
         unnest(es) AS e
  FROM energies
),
sp AS (SELECT doc_id, f FROM frames WHERE e > {ENERGY_MIN}),
runs AS (
  SELECT doc_id, f,
         f - row_number() OVER (PARTITION BY doc_id ORDER BY f) AS run
  FROM sp
),
segs AS (SELECT doc_id, run, count(*)::BIGINT AS seg_len
         FROM runs GROUP BY 1, 2),
per_doc AS (
  SELECT doc_id, count(*)::BIGINT AS n_segments,
         sum(seg_len)::BIGINT AS n_speech,
         max(seg_len)::BIGINT AS longest_seg
  FROM segs GROUP BY 1
)
SELECT e.doc_id, {N_FRAMES}::BIGINT AS n_frames,
       coalesce(p.n_speech, 0)::BIGINT AS n_speech,
       coalesce(p.n_segments, 0)::BIGINT AS n_segments,
       coalesce(p.longest_seg, 0)::BIGINT AS longest_seg
FROM energies e LEFT JOIN per_doc p USING (doc_id)
"""


VAD_SQL = _vad_sql()


QUERIES: dict[str, tuple] = {
    "mm_audio_vad": (audio_vad, VAD_SQL),
}
