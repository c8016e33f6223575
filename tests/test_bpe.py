"""Distributed BPE trainer/encoder vs a driver-side mirror of the
reference algorithm (Sennrich et al. 2016's get_stats/merge loop with
this engine's deterministic tie-break: count DESC, pair lexicographic
ASC). Training is iterative — this differential gate is its
correctness story (no SQL twin exists for a data-dependent loop)."""

from __future__ import annotations

import random

from webscrape_neko_jirushi_spark.text import bpe


def _mirror_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    syms = list(word) + [bpe.END]
    for a, b in merges:
        out: list[str] = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return syms


def _mirror_train(
    freqs: dict[str, int], n_merges: int, min_freq: int = 2
) -> list[tuple[str, str]]:
    vocab = {w: list(w) + [bpe.END] for w in freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        stats: dict[tuple[str, str], int] = {}
        for w, f in freqs.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + f
        if not stats:
            break
        best = min(stats, key=lambda p: (-stats[p], p))
        if stats[best] < min_freq:
            break
        merges.append(best)
        a, b = best
        for w in vocab:
            out: list[str] = []
            for s in vocab[w]:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            vocab[w] = out
    return merges


def _freq_df(spark, freqs: dict[str, int]):
    return spark.createDataFrame(
        list(freqs.items()), "word string, freq long"
    )


def test_bpe_train_matches_mirror_on_classic_corpus(spark):
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    got = bpe.bpe_train(_freq_df(spark, freqs), n_merges=10)
    want = _mirror_train(freqs, 10)
    assert got == want
    assert ("e", "s") in got  # the classic first merge of this corpus


def test_bpe_train_matches_mirror_on_random_corpora(spark):
    rng = random.Random(7)
    alphabet = "abcde"
    for trial in range(3):
        freqs = {
            "".join(
                rng.choice(alphabet) for _ in range(rng.randint(1, 7))
            ): rng.randint(1, 9)
            for _ in range(25)
        }
        got = bpe.bpe_train(_freq_df(spark, freqs), n_merges=8)
        want = _mirror_train(freqs, 8)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_bpe_train_early_stop_on_min_freq(spark):
    freqs = {"ab": 1, "cd": 1}
    assert bpe.bpe_train(_freq_df(spark, freqs), n_merges=5, min_freq=3) == []
    # min_freq=1 merges everything mergeable
    assert len(bpe.bpe_train(_freq_df(spark, freqs), n_merges=50, min_freq=1)) > 0


def test_bpe_segment_matches_mirror(spark):
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "stow": 1}
    merges = _mirror_train(freqs, 6)
    seg = {
        r["word"]: (list(r["tokens"]), r["n_tokens"])
        for r in bpe.bpe_segment(_freq_df(spark, freqs), merges).collect()
    }
    for w in freqs:
        want = _mirror_encode(w, merges)
        assert seg[w] == (want, len(want)), w


def test_bpe_doc_token_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "low low lower"),
            (2, "newest widest"),
            (3, ""),
            (4, "low"),
        ],
        "doc_id long, text string",
    )
    wf = bpe.word_frequencies(docs)
    merges = bpe.bpe_train(wf, n_merges=6)
    seg = bpe.bpe_segment(wf, merges)
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe.bpe_doc_token_counts(docs, seg).collect()
    }
    enc = {w: len(_mirror_encode(w, merges)) for w in ["low", "lower", "newest", "widest"]}
    assert got == {
        1: 2 * enc["low"] + enc["lower"],
        2: enc["newest"] + enc["widest"],
        3: 0,
        4: enc["low"],
    }
