"""Semantic tests for distributed BPE training: replay the reference
greedy algorithm (Sennrich et al. 2016) in plain Python on a crafted
corpus and demand identical merges and segmentations."""

from __future__ import annotations

from paper2llm_spark.operators.bpe import (
    BPE_MERGES,
    bpe_train_frame,
)

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _replay(word_counts: dict[str, int], n_rounds: int):
    words = {w: [c for c in w] for w in word_counts}
    merges = []
    for r in range(1, n_rounds + 1):
        pairs: dict[tuple, int] = {}
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = (
                    pairs.get((syms[i], syms[i + 1]), 0) + word_counts[w]
                )
        if not pairs:
            break
        (a, b), pc = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((r, a, b, pc))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, {w: " ".join(s) for w, s in words.items()}


def test_bpe_matches_reference_greedy(spark):
    # Sennrich's canonical example vocabulary
    corpus = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    text = " ".join(corpus)
    docs = spark.createDataFrame([(1, text, "en", "s0", len(text))], DOC_SCHEMA)
    seg, merges = bpe_train_frame(docs)
    wc = {w: corpus.count(w) for w in set(corpus)}
    want_merges, want_seg = _replay(wc, BPE_MERGES)
    assert merges == want_merges, (merges, want_merges)
    got = {r["w"]: r["segmentation"] for r in seg.collect()}
    assert got == want_seg


def test_bpe_overlapping_pair_is_greedy_left_to_right(spark):
    # "aaaa" + merge (a,a): greedy left-to-right gives [aa, aa], and
    # "aaa" gives [aa, a] — the boundary-sharing failure mode of
    # space-joined encodings
    text = " ".join(["aaaa"] * 3 + ["aaa"] * 2)
    docs = spark.createDataFrame([(1, text, "en", "s0", len(text))], DOC_SCHEMA)
    seg, merges = bpe_train_frame(docs)
    got = {r["w"]: (r["segmentation"], r["n_symbols"]) for r in seg.collect()}
    assert merges[0][1:3] == ("a", "a")
    # after round 1: aaaa -> aa aa, aaa -> aa a; round 2 merges (aa, aa)
    assert merges[1][1:3] == ("aa", "aa")
    assert got["aaaa"] == ("aaaa", 1) or got["aaaa"][1] == 1
    assert got["aaa"][0].startswith("aa")


def test_bpe_token_count_composition(spark, tmp_path):
    """Fertility over a crafted corpus: write a tiny documents.parquet,
    run the full train+apply composition, and check sums against the
    replayed segmentations."""
    corpus = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    docs = [
        (1, " ".join(corpus[:8]), "en", "s0", 0),
        (2, " ".join(corpus[8:]), "en", "s0", 0),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(docs, DOC_SCHEMA).write.parquet(f"{sf}/documents.parquet")

    from paper2llm_spark.operators.bpe import bpe_token_count

    wc = {w: corpus.count(w) for w in set(corpus)}
    _, want_seg = _replay(wc, BPE_MERGES)
    n_sym = {w: len(s.split()) for w, s in want_seg.items()}
    out = {r["doc_id"]: r for r in bpe_token_count(spark, sf).collect()}
    for doc_id, text, *_ in docs:
        words = text.split()
        want_tokens = sum(n_sym[w] for w in words)
        assert out[doc_id]["n_words"] == len(words)
        assert out[doc_id]["bpe_tokens"] == want_tokens
