"""Distributed BPE tokenizer training + encoding (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units").

A pretraining pipeline doesn't just COUNT tokens (``analysis.
token_count``) — it trains the tokenizer on the corpus it curated.
The classic trainer is a driver-side loop over a word-frequency dict;
at 100 TB the distinct-word table itself is distributed (Zipf or not,
a multilingual crawl yields 10^8+ types), so the training state must
live in the cluster:

- the corpus reduces ONCE to ``(word, freq)`` (one shuffle; everything
  after is vocabulary-proportional, corpus-independent);
- each merge round is (a) a map-side adjacent-pair explode weighted by
  ``freq``, (b) one hash aggregate + ``TakeOrdered(1)`` for the best
  pair — count DESC, then (a, b) lexicographic, a DETERMINISTIC
  tie-break where the reference implementation's ``max(dict)`` is
  arbitrary — and (c) a map-side fold that rewrites every symbol
  array, ``localCheckpoint``ed to truncate lineage (the
  ``connected_components`` discipline: j rounds must not stack j
  plans);
- the fold (``_merge_fold``) is left-to-right non-overlapping — the
  exact semantics of the reference's ``re.sub`` merge — expressed as
  ``F.aggregate`` over the symbols with a NULL-safe ``F.get`` last-
  element probe (ANSI mode: ``element_at(-1)`` on the empty
  accumulator would throw inside the un-short-circuited AND).

Encoding (``bpe_segment``) applies the ordered merge list per
DISTINCT word in one Arrow ``mapInPandas`` pass (the rank-dict
algorithm every production tokenizer uses — 30 chained fold
expressions per word would codegen but not win), then doc-level token
counts come from an explode + broadcast join against the segmented
vocabulary, never re-segmenting per occurrence.

Training is iterative (driver-bounded collect of ONE row per round,
like the CC convergence scan) and therefore has no single-statement
SQL twin: correctness is pinned by differential tests against a
driver-side mirror of the reference algorithm on generated corpora
(``tests/test_bpe.py``), the documented weaker gate for iterative
operators. Beyond the reference scraper (no text analytics there);
first-class per the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

END = "</w>"  # end-of-word sentinel symbol (its own symbol, merged like any other)


def word_frequencies(
    documents: DataFrame, text_col: str = "text"
) -> DataFrame:
    """``(word, freq)`` over whitespace-split words — the ONE
    corpus-proportional pass; training is vocabulary-proportional
    from here on."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    return (
        documents.filter(F.trim(F.col(text_col)) != "")
        .select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _init_syms(word: Column) -> Column:
    """Characters + the end-of-word sentinel."""
    return F.concat(F.split(word, ""), F.array(F.lit(END)))


def _merge_fold(syms: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping replacement of the adjacent pair
    (a, b) by the fused symbol — one fold, no Python. ``F.get`` (not
    ``element_at``) so the empty-accumulator probe yields NULL instead
    of an ANSI index error."""
    fused = a + b
    last = lambda acc: F.get(acc, F.size(acc) - 1)  # noqa: E731
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (last(acc) == F.lit(a)) & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(fused))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<a,b>> of adjacent symbol pairs (empty for 1-symbol
    words) — ``sequence`` is guarded because ANSI ``sequence(1, 0)``
    counts DOWN rather than yielding empty."""
    idx = F.when(
        F.size(syms) > 1, F.sequence(F.lit(1), F.size(syms) - 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.struct(
            F.get(syms, i - 1).alias("a"), F.get(syms, i).alias("b")
        ),
    )


def bpe_train(
    word_freqs: DataFrame,
    n_merges: int,
    min_freq: int = 2,
    word_col: str = "word",
    freq_col: str = "freq",
) -> list[tuple[str, str]]:
    """Train ``n_merges`` BPE merge rules over a distributed
    ``(word, freq)`` table. Returns the ORDERED merge list (the
    tokenizer artifact). Stops early when the best remaining pair's
    corpus frequency drops below ``min_freq``.

    Per round: one pair-count aggregate over the vocabulary + one
    ``TakeOrdered(1)`` (a single row to the driver — bounded, like the
    CC convergence scan) + one map-side fold rewrite, checkpointed."""
    if n_merges < 0:
        raise ValueError(f"bpe_train: n_merges {n_merges} < 0")
    vocab = word_freqs.select(
        F.col(word_col).alias("word"),
        F.col(freq_col).cast("long").alias("freq"),
        _init_syms(F.col(word_col)).alias("syms"),
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (
            vocab.select("freq", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .first()
        )
        if best is None or best["cnt"] < min_freq:
            break
        a, b = best["a"], best["b"]
        merges.append((a, b))
        vocab = vocab.withColumn(
            "syms", _merge_fold(F.col("syms"), a, b)
        ).localCheckpoint(eager=True)
    return merges


def bpe_segment(
    word_freqs: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
) -> DataFrame:
    """Segment every distinct word under an ordered merge list:
    ``(word, tokens: array<string>, n_tokens)``. One Arrow
    ``mapInPandas`` pass over the vocabulary — the merge list rides a
    broadcast variable (not the closure), and each word applies merges
    in training order (the reference encoder's semantics)."""
    spark = word_freqs.sparkSession
    bc = spark.sparkContext.broadcast(list(merges))

    out_schema = T.StructType(
        [
            T.StructField("word", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.StringType())),
            T.StructField("n_tokens", T.IntegerType()),
        ]
    )

    def seg(batches):
        rules = bc.value

        def encode(word: str) -> list[str]:
            syms = list(word) + [END]
            for a, b in rules:
                out: list[str] = []
                for s in syms:
                    if out and out[-1] == a and s == b:
                        out[-1] = a + b
                    else:
                        out.append(s)
                syms = out
            return syms

        for pdf in batches:
            toks = [encode(w) for w in pdf[word_col]]
            yield pdf[[word_col]].rename(columns={word_col: "word"}).assign(
                tokens=toks, n_tokens=[len(t) for t in toks]
            )

    return word_freqs.select(word_col).distinct().mapInPandas(seg, out_schema)


def bpe_doc_token_counts(
    documents: DataFrame,
    segments: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BPE token count: explode doc words, broadcast-join
    the segmented vocabulary (segment each TYPE once, join per
    occurrence — never re-encode per occurrence), sum. Empty docs
    count 0."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    occ = documents.select(
        F.col(id_col),
        F.explode(
            F.when(F.trim(F.col(text_col)) != "", words).otherwise(
                F.array().cast("array<string>")
            )
        ).alias("word"),
    )
    joined = occ.join(
        F.broadcast(segments.select("word", "n_tokens")), "word", "left"
    )
    per_doc = joined.groupBy(id_col).agg(
        F.sum("n_tokens").cast("long").alias("n_bpe_tokens")
    )
    return (
        documents.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bpe_tokens", F.lit(0)).alias("n_bpe_tokens"),
        )
    )
