"""Content-defined chunking — the LBFS rolling-window scheme
(Muthitacharoen et al. SOSP'01) with the **gear-table rolling hash**
of the FastCDC family (Xia et al. ATC'16): cut a document wherever
the fingerprint of the trailing ``W``-char window hits a magic
residue, so chunk boundaries depend only on LOCAL content — insert
one paragraph into a page and every chunk digest after the next
resync point stays identical, which is what makes chunk-level storage
dedup work for dataset versioning (the same reason Common Crawl
re-snapshots dedupe well at the chunk level while whole-file digests
all change).

The gear hash: a 256-entry md5-seeded table ``GEAR`` (the repo's
literal-table discipline — PQ codebooks, DSIR buckets — so both
engines hold the identical table), window fingerprint
``h_i = sum_{k=0}^{W-1} GEAR[c_{i-k}] * 2^k`` and the boundary rule
masks the HIGH bits (``(h >> 20) % M == 0``) — FastCDC's own trick:
the low ``log2(M)`` bits of the sum see only the low-order gear
entries (weights ``2^k`` zero them mod M), so a low-bit mask is
biased; the shifted mask restores the 1/M expected density (measured:
the low-bit rule fired half as often on the bench corpus).

Execution (measured, not guessed): the per-position fingerprint is a
CONVOLUTION of the gear-mapped code array with the weight vector, so
the Spark side runs it as vectorized numpy inside ONE ``mapInPandas``
Arrow pass — the sanctioned Python seam (same as the NFC pass in
``webnormalize.py``).  The previous declarative form (one interpreted
HOF lambda per position — md5 or gear alike, the lambda interpreter
is the cost, not the hash) measured **14.3 s vs 0.33 s (43x)** on a
50x-long-doc corpus at local[32]; at real web-page lengths the Arrow
path is the production constant.  Codes are Unicode codepoints mod
256 (vectorized via utf-32 reinterpretation), positions/lengths are
CHAR-based — exactly the DuckDB dual's ``unicode(text[i:i]) % 256``
and ``substr`` semantics, so the cross-engine hash gate stays exact.

Expected chunk length is ``M`` chars with no min/max clamp (classic
LBFS; FastCDC's normalized chunking would add thresholds, not change
the plan).  Plan shape: scan -> ONE ArrowEvalPython/mapInPandas stage
-> rows; ZERO exchanges, joins (plan-asserted).  A downstream
``groupBy(chunk_md5)`` (the storage dedup map) is the caller's one
short-row exchange.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

W_CDC = 16     # rolling window, chars
M_CDC = 64     # boundary modulus -> expected chunk length, chars
SHIFT_CDC = 20  # mask the high bits (FastCDC zero-padding trick)

# md5-seeded 40-bit gear entries: identical literal table in both engines
GEAR = [int(hashlib.md5(bytes([b])).hexdigest()[:10], 16) for b in range(256)]


def _chunker(batches):
    import numpy as np
    import pandas as pd

    gear = np.array(GEAR, dtype=np.int64)
    wts = (1 << np.arange(W_CDC, dtype=np.int64))
    for b in batches:
        out: dict[str, list] = {
            "doc_id": [], "chunk_idx": [], "chunk_start": [],
            "chunk_len": [], "chunk_md5": [],
        }
        for doc_id, text in zip(b["doc_id"], b["text"]):
            n = len(text)
            if n < 1:
                continue
            if n >= W_CDC:
                # one uint32 per CHAR (utf-32), mod 256 -> gear index;
                # char-positional, matching substr in both engines
                codes = (
                    np.frombuffer(
                        text.encode("utf-32-le"), dtype=np.uint32
                    ).astype(np.int64)
                    % 256
                )
                h = np.convolve(gear[codes], wts, mode="valid")
                cuts = (
                    np.nonzero((h >> SHIFT_CDC) % M_CDC == 0)[0] + W_CDC
                ).tolist()
            else:
                cuts = []
            if not cuts or cuts[-1] != n:
                cuts.append(n)
            prev = 1
            for j, cpos in enumerate(cuts, start=1):
                chunk = text[prev - 1:cpos]
                out["doc_id"].append(doc_id)
                out["chunk_idx"].append(j)
                out["chunk_start"].append(prev)
                out["chunk_len"].append(cpos - prev + 1)
                out["chunk_md5"].append(
                    hashlib.md5(chunk.encode("utf-8")).hexdigest()
                )
                prev = cpos + 1
        yield pd.DataFrame(out)


def cdc_chunks_frame(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", "text").mapInPandas(
        _chunker,
        schema=(
            "doc_id bigint, chunk_idx bigint, chunk_start bigint, "
            "chunk_len bigint, chunk_md5 string"
        ),
    )


def cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return cdc_chunks_frame(docs)


_GEAR_SQL = "[" + ",".join(str(g) for g in GEAR) + "]"
_TERMS = " + ".join(f"garr[i - {k}] * {1 << k}" for k in range(W_CDC))

CDC_SQL = f"""
WITH t AS (
  SELECT doc_id, text, length(text)::BIGINT AS n
  FROM documents WHERE length(text) >= 1
),
g AS (
  SELECT doc_id, text, n,
         CASE WHEN n >= {W_CDC} THEN
           list_transform(range(1, n::INT + 1),
             i -> ({_GEAR_SQL})[(unicode(text[i:i]) % 256) + 1])
         ELSE [] END AS garr
  FROM t
),
bp AS (
  SELECT doc_id, text, n,
    CASE WHEN n >= {W_CDC} THEN
      list_filter(range({W_CDC}, n::INT + 1),
        i -> (({_TERMS}) >> {SHIFT_CDC}) % {M_CDC} = 0)
    ELSE [] END AS cuts
  FROM g
),
b2 AS (
  SELECT doc_id, text, n,
    CASE WHEN len(cuts) > 0 AND cuts[-1] = n THEN cuts
         ELSE list_append(cuts, n::INT) END AS bounds
  FROM bp
),
c AS (
  SELECT doc_id, text, bounds,
         unnest(range(1, len(bounds) + 1)) AS j
  FROM b2
),
s AS (
  SELECT doc_id, text, j::BIGINT AS chunk_idx,
         CASE WHEN j = 1 THEN 1
              ELSE bounds[(j-1)::INT] + 1 END AS start,
         bounds[j::INT]
           - (CASE WHEN j = 1 THEN 1 ELSE bounds[(j-1)::INT] + 1 END) + 1
           AS clen
  FROM c
)
SELECT doc_id, chunk_idx,
       start::BIGINT AS chunk_start,
       clen::BIGINT AS chunk_len,
       md5(substr(text, start::INT, clen::INT)) AS chunk_md5
FROM s
"""


QUERIES: dict[str, tuple] = {
    "dedup_cdc_chunks": (cdc_chunks, CDC_SQL),
}
