"""Distributed BPE tokenizer training (byte-pair-encoding merges).

The classic algorithm (Sennrich et al., public literature): start from
characters, repeatedly merge the most frequent adjacent symbol pair.
The distributed formulation exploits the standard trick that BPE
statistics live on the WORD-FREQUENCY table, not the corpus: a 100 TB
corpus collapses to a vocabulary-sized (word, freq) table in one
aggregate, and every merge iteration is then

    bigram count:  explode adjacent symbol pairs, sum freq   (small)
    argmax:        1-row global top (count desc, pair asc)   (driver)
    merge apply:   per-word symbol-array rewrite             (map-only)

so the expensive corpus scan happens exactly once, and the loop runs
over data proportional to the vocabulary. Ties break lexicographically
— training is bit-reproducible on any cluster (same corpus, same
merges), which ad-hoc hash-ordered implementations lose.

The merge rewrite is a left-to-right scan with a skip flag — expressed
as an `aggregate` HOF over indices (pure JVM, no Python in the loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) — the only corpus-sized pass."""
    from crane_spark.functions.text import tokens

    return (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """Split each word into characters plus the end-of-word marker."""
    return words.select(
        "word",
        "freq",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END))
        ).alias("syms"),
    )


def _pair_counts(seqs: DataFrame) -> DataFrame:
    pairs = F.expr(
        "transform(sequence(1, size(syms) - 1), i -> struct(syms[i - 1] AS a, syms[i] AS b))"
    )
    return (
        seqs.filter(F.size("syms") >= 2)
        .select("freq", F.explode(pairs).alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.sum("freq").alias("n"))
    )


def _merge_expr(a: str, b: str) -> str:
    """Left-to-right adjacent-pair merge as an aggregate HOF: the
    accumulator carries the rebuilt array and a skip flag for the
    position consumed by the previous merge."""
    qa, qb = a.replace("'", "\\'"), b.replace("'", "\\'")
    return f"""
    aggregate(
      sequence(1, size(syms)),
      named_struct('out', array_remove(array(''), ''), 'skip', false),
      (acc, i) -> CASE
        WHEN acc.skip THEN named_struct('out', acc.out, 'skip', false)
        WHEN i < size(syms) AND element_at(syms, i) = '{qa}'
             AND element_at(syms, i + 1) = '{qb}'
          THEN named_struct('out', concat(acc.out, array('{qa}{qb}')), 'skip', true)
        ELSE named_struct('out', concat(acc.out, array(element_at(syms, i))), 'skip', false)
      END,
      acc -> acc.out)
    """


# Vocabularies at or under this size train all merge rounds driver-
# side in one pass over the collected (word, freq) table — the same
# adaptive-local pattern as connected_components' union-find: the
# iteration data is vocabulary-sized by construction, and when it fits
# comfortably in one process, 2 cluster jobs per merge round are pure
# scheduling overhead (measured 6x on the 8-round training query).
# Larger vocabularies keep the distributed loop.
LOCAL_VOCAB_MAX = 200_000


def _bpe_train_local(
    rows: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str, int]]:
    """Classic in-memory BPE over the word-frequency table; argmax tie
    break (count desc, pair lexicographic asc) and the left-to-right
    skip-one merge rewrite are IDENTICAL to the distributed loop —
    regime equality is pinned in tests/test_bpe.py."""
    seqs: list[tuple[list[str], int]] = [
        (list(word) + [END], freq) for word, freq in rows
    ]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in seqs:
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                counts[pair] = counts.get(pair, 0) + freq
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, n))
        ab = a + b
        nxt: list[tuple[list[str], int]] = []
        for syms, freq in seqs:
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt.append((out, freq))
        seqs = nxt
    return merges


def bpe_train(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    checkpoint_every: int = 4,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(left, right, freq)]
    in merge order. Deterministic: ties on count break toward the
    lexicographically smallest pair."""
    # Materialize the vocabulary-sized table once: the regime gate,
    # the collect (local path), and the loop partitioning all reuse it
    # without re-running the corpus aggregate.
    words = word_freqs(docs, text_col).localCheckpoint(eager=True)
    n_words = int(words.count())
    if n_words <= LOCAL_VOCAB_MAX:
        return _bpe_train_local(
            [(r["word"], int(r["freq"])) for r in words.collect()], n_merges
        )
    # The iteration runs on vocabulary-sized data; right-size its
    # partitioning ONCE so each of the ~2 jobs per merge round
    # schedules a handful of tasks, not defaultParallelism empty ones
    # (tiny-vocab corpora: measured 3x on the whole loop). ~64k words
    # per partition keeps even a 10M-word vocabulary under 200 tasks.
    n_parts = max(1, min(n_words // 65536 + 1,
                         words.sparkSession.sparkContext.defaultParallelism))
    seqs = (
        _initial_symbols(words).coalesce(n_parts).localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str, int]] = []
    for step in range(n_merges):
        top = (
            _pair_counts(seqs)
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = top[0]["a"], top[0]["b"], top[0]["n"]
        merges.append((a, b, int(n)))
        seqs = seqs.select(
            "word", "freq", F.expr(_merge_expr(a, b)).alias("syms")
        )
        # Bound lineage growth across iterations (each merge nests
        # another HOF); same cadence rationale as the k-means loop.
        if (step + 1) % checkpoint_every == 0:
            seqs = seqs.localCheckpoint(eager=True)
    return merges


def apply_merges(
    seqs_or_docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """Tokenize with a learned merge table: replay merges in order
    (the inference side of BPE). Accepts a raw documents frame."""
    seqs = _initial_symbols(word_freqs(seqs_or_docs, text_col))
    for a, b, _ in merges:
        seqs = seqs.select("word", "freq", F.expr(_merge_expr(a, b)).alias("syms"))
    return seqs
