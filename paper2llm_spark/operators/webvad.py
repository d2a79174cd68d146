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

Plan shape (the scale story): synthesis + framing + the energy fold
are array HOFs in the scan projection — sample rows NEVER exist as
rows, only the 8 frame energies per doc do; the island merge is one
window + groupBy over (doc, speech-frame) short rows.  One exchange
family keyed by doc_id; zero Python (plan-asserted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60

FRAME = 160
N_FRAMES = 8
ENERGY_MIN = 10_000


def _frame_amp(doc_col, f: int):
    """Frame f's amplitude — ONE md5 per (doc, frame)."""
    return F.when(
        portable_hash60(
            F.concat(doc_col.cast("string"), F.lit(f":f{f}"))
        ) % 3 != 0,
        F.lit(1000),
    ).otherwise(F.lit(10))


def _frame_energy(doc_col, amp, f: int):
    """Exact bigint energy of frame f: fold over FRAME synthesized
    samples inside one aggregate HOF.  ``amp`` must be a STAGED bound
    attribute — HOF lambdas are interpreted with no CSE, so an inlined
    amp expression re-runs its md5 once PER SAMPLE (measured ~2x the
    whole query at sf0.1; the webindex staging lesson applies to
    scalar subexpressions too, not just arrays)."""
    return F.aggregate(
        F.sequence(F.lit(f * FRAME), F.lit((f + 1) * FRAME - 1)),
        F.lit(0).cast("bigint"),
        lambda acc, i: acc + (
            lambda s: s * s
        )(
            portable_hash60(
                F.concat(doc_col.cast("string"), F.lit(":s"),
                         i.cast("string"))
            ) % (2 * amp + 1) - amp
        ),
    ) / FRAME


def vad_frame(docs: DataFrame) -> DataFrame:
    staged_amps = docs.select(
        "doc_id",
        *[
            _frame_amp(F.col("doc_id"), f).alias(f"amp{f}")
            for f in range(N_FRAMES)
        ],
    )
    energies = staged_amps.select(
        "doc_id",
        F.array(*[
            F.floor(
                _frame_energy(F.col("doc_id"), F.col(f"amp{f}"), f)
            ).cast("bigint")
            for f in range(N_FRAMES)
        ]).alias("es"),
    )
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
        energies.select("doc_id")
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
