"""Deduplication operators over the ``documents`` table.

Training-data-pipeline staples, each with a DuckDB oracle (the driver's
correctness gate) and a scale note (how the plan behaves at 10^12 docs):

* exact dedup          — hash-groupBy on content digest; one shuffle on a
  short key, map-side partial agg; survives any scale.
* MinHash signatures   — per-doc scalar expressions (no shuffle at all).
* MinHash-LSH pairs    — band -> bucket equi-join; the join key is the
  band hash, so candidate generation is O(bucket²) not O(n²).
* n-gram Jaccard       — shared-shingle equi-join + count ratio; the
  shingle join is the classic inverted-index plan.
* SimHash              — explode(token x bit) -> two partial aggs;
  bounded by tokens*64 intermediate rows, all map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    SQL_TOKENS,
    SQL_TRIGRAMS,
    portable_hash60,
    sql_hash60,
    tokens,
    word_trigrams,
)

N_MINHASH = 8
N_BANDS = 4  # 2 rows per band


def _docs(spark: SparkSession, sf_dir: str, spread: bool = True) -> DataFrame:
    # the local testdata table is a single parquet file (one row group =
    # one input split); spread it so per-doc scalar work parallelizes —
    # at cluster scale the scan already has many splits and this exchange
    # is round-robin over small text rows. Operators whose first real
    # step is itself an exchange (or whose map work is one cheap digest)
    # pass spread=False: shuffling the full text column "for parallelism"
    # is exactly the gratuitous corpus-sized exchange that kills a 100 TB
    # run.
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if spread:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative (min doc_id) per exact-content group + group size.

    No spread exchange: the groupBy's map-side partial agg collapses
    text -> (md5, min, count) inside the scan task, so the only shuffle
    carries 48-byte rows. Measured 3x faster than the spread variant at
    sf0.1 — and at 100 TB the spread variant would shuffle the corpus.
    """
    return (
        _docs(spark, sf_dir, spread=False)
        .groupBy(F.md5("text").alias("content_md5"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("dup_count"),
        )
    )


DEDUP_EXACT_SQL = """
SELECT md5(text) AS content_md5,
       min(doc_id) AS keep_doc_id,
       count(*) AS dup_count
FROM documents
GROUP BY md5(text)
"""


# ---------------------------------------------------------------------------
# MinHash signatures + LSH candidate pairs
# ---------------------------------------------------------------------------

_MH_INIT = 1 << 62  # > any seeded hash; marks "no shingles" after the fold

# Universal hashing: one md5 per shingle, then h_i = (A[i]*h32 + B[i]) % P
# per seed — integer math instead of 8 digests (classic MinHash family;
# A[i]*h32 < 2^63 so the arithmetic is exact int64 in both engines).
MH_PRIME = 4294967311  # smallest prime > 2^32
_MH_A = [
    1 + int(__import__("hashlib").md5(f"mhA:{i}".encode()).hexdigest()[:7], 16)
    for i in range(N_MINHASH)
]
_MH_B = [
    int(__import__("hashlib").md5(f"mhB:{i}".encode()).hexdigest()[:7], 16)
    for i in range(N_MINHASH)
]


def _hash32(col) -> "F.Column":
    """32-bit md5-derived base hash (DuckDB twin:
    ``('0x' || substr(md5(x), 1, 8))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def _minhash_array(shingles) -> "F.Column":
    """All N_MINHASH minimums in ONE pass over the shingles.

    A naive per-seed ``array_min(transform(...))`` column gets its shingle
    subexpression inlined by Catalyst's projection collapse, re-running
    tokenize+trigram N_MINHASH times per row; this fold visits each
    shingle once, computes ONE md5, and derives the 8 seeded values
    arithmetically.

    Two-step shape matters: higher-order lambdas are interpreted with no
    common-subexpression elimination, so putting ``_hash32(s)`` inside the
    fold's seeded-hash array re-evaluates the md5 8x per shingle (measured
    5.5x slower at sf0.1). Hashing into a staged array first binds each
    digest to a lambda variable, which IS evaluated once."""
    hashed = F.transform(shingles, _hash32)
    folded = F.aggregate(
        hashed,
        F.array_repeat(F.lit(_MH_INIT).cast("bigint"), N_MINHASH),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    (F.lit(_MH_A[i]) * h + F.lit(_MH_B[i])) % F.lit(MH_PRIME)
                    for i in range(N_MINHASH)
                ]
            ),
            lambda a, b: F.least(a, b),
        ),
    )
    # empty shingle list -> NULL per seed (matches DuckDB list_min([]))
    return F.transform(
        folded, lambda v: F.when(v != F.lit(_MH_INIT), v)
    )


def _shingled(df: DataFrame) -> DataFrame:
    """doc_id + word-trigram shingles, via STAGED projections.

    Staging matters: tokens and trigrams must become bound attributes
    before reuse — higher-order-function lambdas are interpreted (no
    whole-stage codegen, no common-subexpression elimination), so an
    inlined tokens expression re-runs the tokenizer per element_at call
    (measured 60x slower on sf0.1)."""
    return df.select("doc_id", tokens(F.col("text")).alias("tok")).select(
        "doc_id", word_trigrams(F.col("tok")).alias("shingles")
    )


def _with_minhash(df: DataFrame) -> DataFrame:
    sig = _shingled(df).select(
        "doc_id", _minhash_array(F.col("shingles")).alias("sig")
    )
    return sig.select(
        "doc_id",
        *[F.element_at("sig", i + 1).alias(f"mh{i}") for i in range(N_MINHASH)],
    )


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _with_minhash(_docs(spark, sf_dir))


def _minhash_sql_columns() -> str:
    tok = SQL_TOKENS.format(expr="text")
    tri = SQL_TRIGRAMS.format(tok="tok")
    cols = [
        f"list_min(list_transform(hs, h -> ({_MH_A[i]} * h + {_MH_B[i]}) % {MH_PRIME}))"
        f" AS mh{i}"
        for i in range(N_MINHASH)
    ]
    return (
        f"WITH t AS (SELECT doc_id, {tok} AS tok FROM documents),\n"
        f"s AS (SELECT doc_id, {tri} AS tri FROM t),\n"
        f"h AS (SELECT doc_id, list_transform(tri,"
        f" x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS hs FROM s)\n"
        f"SELECT doc_id, {', '.join(cols)} FROM h"
    )


MINHASH_SQL = _minhash_sql_columns()


def lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs sharing any (band, band-hash) bucket; a<b, distinct.

    Scale path: the self-join keys on the band hash — at 10^12 docs this
    is a shuffle on short keys with bucket-bounded fanout, never a cross
    join.
    """
    # one signature pass -> 4 band hashes per row -> posexplode; the
    # union-of-4-selects alternative re-evaluates the signature subtree
    # per band (measured ~9x slower)
    sig = _shingled(_docs(spark, sf_dir)).select(
        "doc_id", _minhash_array(F.col("shingles")).alias("sig")
    )
    # concat_ws SKIPS nulls while DuckDB `||` propagates them, so guard
    # the no-shingle case explicitly: null signature -> no band rows
    # (equivalent to DuckDB, where NULL band hashes never satisfy the
    # equi-join).
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.when(
                F.element_at("sig", 1).isNotNull(),
                F.array(
                    *[
                        F.md5(
                            F.concat_ws(
                                ",",
                                F.element_at("sig", 2 * b + 1),
                                F.element_at("sig", 2 * b + 2),
                            )
                        )
                        for b in range(N_BANDS)
                    ]
                ),
            )
        ).alias("band", "band_hash"),
    )
    left = bands.alias("a")
    right = bands.alias("b")
    return (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


LSH_PAIRS_SQL = f"""
WITH sig AS ({MINHASH_SQL}),
bands AS (
  SELECT doc_id, 0 AS band, md5(mh0::VARCHAR || ',' || mh1::VARCHAR) AS band_hash FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band, md5(mh2::VARCHAR || ',' || mh3::VARCHAR) FROM sig
  UNION ALL
  SELECT doc_id, 2 AS band, md5(mh4::VARCHAR || ',' || mh5::VARCHAR) FROM sig
  UNION ALL
  SELECT doc_id, 3 AS band, md5(mh6::VARCHAR || ',' || mh7::VARCHAR) FROM sig
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
"""


LSH_VERIFY_MIN = 0.5  # keep pairs whose estimated Jaccard >= this


def lsh_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage MinHash dedup (the production shape: LSH candidates,
    then SIGNATURE VERIFICATION): estimated Jaccard = fraction of
    matching signature components, computed from the signatures already
    in flight — the documents themselves are never re-read or re-hashed
    for verification.

    The signatures ride through the band join (8 bigints per row, 4
    band copies — constant-size baggage), so verification adds zero
    joins and zero extra scans to the candidate plan; false-positive
    band collisions are dropped before any expensive downstream
    (clustering, canonical-pick) sees them.
    """
    sig = _shingled(_docs(spark, sf_dir)).select(
        "doc_id", _minhash_array(F.col("shingles")).alias("sig")
    )
    bands = sig.select(
        "doc_id",
        "sig",
        F.posexplode(
            F.when(
                F.element_at("sig", 1).isNotNull(),
                F.array(
                    *[
                        F.md5(
                            F.concat_ws(
                                ",",
                                F.element_at("sig", 2 * b + 1),
                                F.element_at("sig", 2 * b + 2),
                            )
                        )
                        for b in range(N_BANDS)
                    ]
                ),
            )
        ).alias("band", "band_hash"),
    )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    matches = F.aggregate(
        F.zip_with(
            "sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        cand.select(
            "doc_a",
            "doc_b",
            F.round(matches / F.lit(float(N_MINHASH)), 4).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= LSH_VERIFY_MIN)
    )


_MH_MATCH_TERMS = " + ".join(
    f"(CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END)" for i in range(N_MINHASH)
)

LSH_VERIFIED_SQL = f"""
WITH sig AS ({MINHASH_SQL}),
bands AS (
  SELECT doc_id, 0 AS band, md5(mh0::VARCHAR || ',' || mh1::VARCHAR) AS band_hash FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band, md5(mh2::VARCHAR || ',' || mh3::VARCHAR) FROM sig
  UNION ALL
  SELECT doc_id, 2 AS band, md5(mh4::VARCHAR || ',' || mh5::VARCHAR) FROM sig
  UNION ALL
  SELECT doc_id, 3 AS band, md5(mh6::VARCHAR || ',' || mh7::VARCHAR) FROM sig
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
est AS (
  SELECT doc_a, doc_b,
         round(({_MH_MATCH_TERMS}) / {float(N_MINHASH)}, 4) AS est_jaccard
  FROM cand JOIN sig a ON a.doc_id = doc_a JOIN sig b ON b.doc_id = doc_b
)
SELECT doc_a, doc_b, est_jaccard FROM est WHERE est_jaccard >= {LSH_VERIFY_MIN}
"""


# ---------------------------------------------------------------------------
# LSH duplicate clusters (connected components + canonical doc)
# ---------------------------------------------------------------------------

CC_MAX_ITERS = 20


def connected_components(edges: DataFrame) -> DataFrame:
    """Connected components of an undirected graph by min-label
    propagation with pointer doubling: each round does one hop
    (``label(v) <- min(label(v), min over neighbors)``) then one
    shortcut (``label(v) <- label(label(v))``) until fixpoint. Returns
    (node, cluster) for every node with >= 1 edge.

    The shortcut step is the scale-critical piece: pure hop propagation
    converges in O(diameter) rounds, so an adversarial chain-shaped dup
    graph (scraper mirrors of mirrors) would blow any fixed round cap.
    Hop+shortcut doubles the propagated distance per round — the
    distance-to-min grows ~2^k, so CC_MAX_ITERS=20 covers diameters up
    to ~2 million, and the loop still exits early (changed==0) on the
    dense diameter-1 families that dominate real LSH output. Same
    complexity class as alternating large-star/small-star contraction
    (Kiveris et al., "Connected Components in MapReduce") with one
    fewer join per round.

    Each iteration is two short-key shuffles (attach labels to edge
    sources, min-combine per destination) — both map-side combinable —
    plus two broadcast-free equi-joins on the label table (hop
    write-back, then the label-to-label shortcut); ``localCheckpoint``
    truncates the lineage so the plan does not grow with the iteration
    count. The driver-side loop iterates over DataFrame handles only —
    no row data ever reaches the driver (the convergence check is an
    agg down to one long)."""
    # materialize the edge list ONCE: the loop's joins and convergence
    # counts re-execute their inputs every iteration, and `edges` is
    # typically an expensive subtree (the full LSH candidate pipeline) —
    # without this checkpoint each round re-runs it from the scan
    # (measured 2.7x slower end-to-end at sf0.1)
    both = (
        edges.union(edges.select(edges.columns[1], edges.columns[0]))
        .toDF("src", "dst")
        .localCheckpoint()
    )
    labels = (
        both.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(CC_MAX_ITERS):
        neighbor_min = (
            both.join(labels, both.src == labels.node)
            .groupBy("dst")
            .agg(F.min("label").alias("nmin"))
        )
        hop = labels.join(
            neighbor_min, labels.node == neighbor_min.dst, "left"
        ).select(
            "node",
            F.col("label").alias("old"),
            F.least(
                F.col("label"), F.coalesce("nmin", F.col("label"))
            ).alias("label"),
        )
        # pointer doubling: label <- label(label). The parent side is
        # the same table re-keyed by node, so this is a self equi-join
        # on the (short) label key.
        parent = hop.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        new_labels = (
            hop.join(parent, hop.label == parent.pnode, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("plabel", F.col("label"))
                ).alias("label"),
                (
                    F.least(
                        F.col("label"), F.coalesce("plabel", F.col("label"))
                    )
                    < F.col("old")
                ).alias("changed"),
            )
            .localCheckpoint()
        )
        n_changed = new_labels.agg(
            F.sum(F.col("changed").cast("long")).alias("c")
        ).first()["c"]
        labels = new_labels.drop("changed")
        if not n_changed:
            break
    else:
        # a silent partial result would mislabel clusters; with pointer
        # doubling this cap corresponds to diameter ~2^CC_MAX_ITERS, so
        # hitting it means the input is not a plausible dup graph —
        # fail loudly rather than return wrong labels
        raise RuntimeError(
            f"connected_components did not converge in {CC_MAX_ITERS} "
            "hop+shortcut rounds (diameter beyond ~2^20); inspect the "
            "edge list — this is not a plausible duplicate graph"
        )
    return labels.select("node", F.col("label").alias("cluster"))


def lsh_duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve LSH candidate pairs into duplicate clusters and pick the
    canonical document (min doc_id) per cluster — the step that turns
    pair-finding into an actionable keep/drop decision for a training
    corpus. Output: one row per document with its cluster id and
    whether it is the kept representative.

    Scale: the pair graph is the (bounded) LSH join output, orders of
    magnitude smaller than the corpus; components converge in
    O(cluster diameter) rounds; the final left join back onto documents
    is a shuffle on doc_id (or a broadcast when the dup graph is small
    relative to the corpus, the common case)."""
    pairs = lsh_candidate_pairs(spark, sf_dir)
    comp = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    docs = _docs(spark, sf_dir).select("doc_id")
    return docs.join(comp, docs.doc_id == comp.node, "left").select(
        "doc_id",
        F.coalesce("cluster", F.col("doc_id")).alias("cluster"),
        (
            F.col("doc_id") == F.coalesce("cluster", F.col("doc_id"))
        ).alias("keep"),
    )


LSH_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS ({LSH_PAIRS_SQL}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
walk(node, root) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, w.root FROM walk w JOIN edges e ON e.src = w.node
),
comp AS (SELECT node, min(root) AS cluster FROM walk GROUP BY node)
SELECT d.doc_id,
       coalesce(c.cluster, d.doc_id) AS cluster,
       d.doc_id = coalesce(c.cluster, d.doc_id) AS keep
FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup
# ---------------------------------------------------------------------------

JACCARD_THRESHOLD = 0.35
# Shingle document-frequency cap: the inverted-index self-join is
# quadratic in per-shingle df — one stop-shingle ("of the and") in 10^6
# docs would alone create a 10^12-row join bucket. Shingles with df >
# DF_CAP are dropped from the SHARED count before the join (sizes keep
# the full distinct-shingle counts, so capped jaccard only ever
# under-estimates, and only for pairs whose overlap hides in
# stop-shingles that carry no dedup signal). Join fanout per shingle is
# then bounded by C(DF_CAP, 2). The hot-shingle set is tiny by
# definition (few shingles can exceed the cap), so it broadcasts.
# On the test fixture max df = 7, so the cap provably changes nothing
# at sf<=0.1 while making the plan survive a hot-shingle corpus
# (tests/test_plan_quality.py asserts the bounded fanout).
SHINGLE_DF_CAP = 64


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs with word-trigram Jaccard >= threshold via the inverted-index
    plan: explode shingles, drop shingles with document frequency >
    SHINGLE_DF_CAP, equi-join on shingle, count shared, divide by
    |A| + |B| - shared.

    Plan: POSTING LISTS, not a self-join. One tokenize pass feeds
    groupBy(shingle) -> (sorted doc list, df); hot shingles (df > cap)
    drop; each surviving list expands to its C(df, 2) <= C(cap, 2)
    ordered pairs via array transforms (JVM-side, no Python); a final
    map-side-combinable groupBy counts shared shingles per pair. The
    classic exploded self-join evaluates the tokenizer subtree once per
    join SIDE — two full corpus passes (measured ~2x at sf0.1); this
    shape tokenizes once and shuffles twice on short keys.

    Memory note for 10^12 docs: a naive single-pass agg grows each
    posting buffer to the shingle's RAW df before any cap can apply —
    a stop-shingle with df ~ 10^8 is a multi-GB collect_list buffer
    and an executor OOM. So the hot set is computed FIRST with a cheap
    map-side-combinable count pass (8-byte partial rows, no lists
    anywhere), broadcast (hot shingles are few by definition — the cap
    bounds how many can exist: at most total_shingles / DF_CAP), and
    anti-joined away BEFORE the posting aggregation, so every
    collect_list buffer is <= DF_CAP elements by construction. The
    price is one extra tokenize pass over the corpus; the win is that
    peak executor memory no longer depends on the df distribution at
    all (plan-asserted: the LeftAnti broadcast join sits below the
    posting aggregate in tests/test_plan_quality.py)."""
    docs = _shingled(_docs(spark, sf_dir))
    sizes = docs.select(
        "doc_id", F.size(F.array_distinct("shingles")).alias("n_shingles")
    )
    exploded = docs.select(
        "doc_id", F.explode(F.array_distinct("shingles")).alias("shingle")
    )
    hot = (
        exploded.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > SHINGLE_DF_CAP)
        .select("shingle")
    )
    pruned = exploded.join(F.broadcast(hot), "shingle", "left_anti")
    postings = (
        pruned.groupBy("shingle")
        .agg(F.count("*").alias("df"), F.collect_list("doc_id").alias("docs"))
        .filter(F.col("df") >= 2)
        .select(F.array_sort("docs").alias("docs"))
    )
    pair = F.explode(
        F.flatten(
            F.transform(
                F.col("docs"),
                lambda x, i: F.transform(
                    F.slice(
                        F.col("docs"),
                        i + 2,
                        F.greatest(F.size(F.col("docs")) - i - 1, F.lit(0)),
                    ),
                    lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
                ),
            )
        )
    )
    shared = (
        postings.select(pair.alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count("*").alias("shared"))
    )
    return (
        shared.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n_shingles", "na")
        .join(sizes.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("n_shingles", "nb")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 4
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


NGRAM_JACCARD_SQL = f"""
WITH t AS (SELECT doc_id, {SQL_TOKENS.format(expr="text")} AS tok FROM documents),
s AS (SELECT doc_id, list_distinct({SQL_TRIGRAMS.format(tok="tok")}) AS shingles FROM t),
sizes AS (SELECT doc_id, len(shingles) AS n_shingles FROM s),
ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM s),
dfreq AS (SELECT shingle, count(*) AS df FROM ex GROUP BY 1),
kept AS (SELECT ex.doc_id, ex.shingle FROM ex JOIN dfreq USING (shingle)
         WHERE df <= {SHINGLE_DF_CAP}),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(shared / (sa.n_shingles + sb.n_shingles - shared), 4) AS jaccard
FROM shared
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(shared / (sa.n_shingles + sb.n_shingles - shared), 4) >= {JACCARD_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# SimHash (60-bit)
# ---------------------------------------------------------------------------

def simhash60(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash over distinct tokens (weight 1 per distinct token).

    Plan: a pure scan-side fold — ZERO exchanges. Per-doc bit-ONES
    counts accumulate in one `aggregate` pass over the token array (one
    md5 per token, then a getbit/zip_with step over a shared bit-index
    sequence), and the sign rule uses the integer identity
    s_j = 2*ones_j - n >= 0  <=>  2*ones_j >= n, so the whole query is
    scan -> project. The bit loop lives INSIDE the higher-order lambda
    (getbit over a sequence), keeping the expression tree ~20 nodes:
    an unrolled 60-branch CASE tree costs ~2 s of driver-side analysis
    per job. Rejected shapes, measured at sf0.01/sf0.1: explode(token)
    -> groupBy(doc) with 60 sum aggs shuffles docs x 61 columns;
    explode(bit) materializes tokens x 60 rows and shuffles twice
    (~11x); both also lose the zero-exchange property this fold has.
    """
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.array_distinct(tokens(F.col("text"))).alias("toks")
    )
    bits = F.sequence(F.lit(0), F.lit(59))
    hs = F.transform(F.col("toks"), lambda t: portable_hash60(t))
    ones = F.aggregate(
        hs,
        F.array_repeat(F.lit(0).cast("bigint"), 60),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                bits, lambda j: F.call_function("getbit", h, j).cast("bigint")
            ),
            lambda a, b: a + b,
        ),
    )
    staged = docs.select(
        "doc_id", F.size("toks").alias("n"), ones.alias("ones")
    )
    packed = F.aggregate(
        F.zip_with(
            F.col("ones"),
            bits,
            lambda o, j: F.when(
                o * 2 >= F.col("n"),
                F.call_function(
                    "shiftleft", F.lit(1).cast("bigint"), j.cast("int")
                ),
            ).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda a, v: a + v,
    )
    return staged.select("doc_id", packed.alias("simhash"))


SIMHASH_SQL = f"""
WITH t AS (SELECT doc_id, list_distinct({SQL_TOKENS.format(expr="text")}) AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
h AS (SELECT doc_id, {sql_hash60("token")} AS h FROM tok),
bits AS (
  SELECT doc_id, bit, CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END AS contrib
  FROM h, (SELECT unnest(range(0, 60)) AS bit)
),
sums AS (SELECT doc_id, bit, sum(contrib) AS s FROM bits GROUP BY 1, 2)
SELECT doc_id,
       sum(CASE WHEN s >= 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
FROM sums GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# SimHash near-dup pairs (banded hamming join)
# ---------------------------------------------------------------------------

SIMHASH_HAM_MAX = 3
SIMHASH_BANDS = 4  # 4 x 15-bit chunks of the 60-bit hash
_CHUNK_BITS = 60 // SIMHASH_BANDS
_CHUNK_MASK = (1 << _CHUNK_BITS) - 1


def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance <= SIMHASH_HAM_MAX,
    via the banded equi-join: split the 60-bit hash into 4 x 15-bit
    chunks; any pair within hamming 3 differs in at most 3 chunks, so by
    pigeonhole it collides on at least one — the band join has EXACT
    recall at this radius while keying the shuffle on short ints
    (bucket-bounded fanout, the same scale shape as the MinHash-LSH
    join; no all-pairs comparison ever materializes).

    The signature frame is persisted because BOTH self-join sides need
    it and the scan-side fold in :func:`simhash60` leaves no exchange
    for AQE to reuse: without the persist the fold (one md5 per token)
    runs twice. Signatures are 16 bytes/doc — at 10^12 docs a
    production run writes them to a table between the two stages; the
    persist is the single-job equivalent (MEMORY_AND_DISK, spill-safe).
    """
    from pyspark import StorageLevel

    sig = simhash60(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", _CHUNK_BITS * b)
                    .bitwiseAND(F.lit(_CHUNK_MASK))
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("band", "chunk"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.chunk") == F.col("b.chunk"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.bit_count(
            F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
        ).cast("bigint").alias("ham"),
    )
    return cand.filter(F.col("ham") <= SIMHASH_HAM_MAX).distinct()


SIMHASH_PAIRS_SQL = f"""
WITH s AS ({SIMHASH_SQL}),
bands AS (
  SELECT doc_id, simhash, band,
         (simhash >> ({_CHUNK_BITS} * band)) & {_CHUNK_MASK} AS chunk
  FROM s, (SELECT unnest(range(0, {SIMHASH_BANDS})) AS band)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         bit_count(xor(a.simhash, b.simhash))::BIGINT AS ham
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.chunk = b.chunk
              AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, ham FROM cand WHERE ham <= {SIMHASH_HAM_MAX}
"""


QUERIES: dict[str, tuple] = {
    "dedup_exact": (dedup_exact, DEDUP_EXACT_SQL),
    "dedup_minhash_signatures": (minhash_signatures, MINHASH_SQL),
    "dedup_lsh_pairs": (lsh_candidate_pairs, LSH_PAIRS_SQL),
    "dedup_lsh_verified": (lsh_verified_pairs, LSH_VERIFIED_SQL),
    "dedup_lsh_clusters": (lsh_duplicate_clusters, LSH_CLUSTERS_SQL),
    "dedup_ngram_jaccard": (ngram_jaccard_pairs, NGRAM_JACCARD_SQL),
    "dedup_simhash60": (simhash60, SIMHASH_SQL),
    "dedup_simhash_pairs": (simhash_pairs, SIMHASH_PAIRS_SQL),
}
