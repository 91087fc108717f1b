"""Byte-pair-encoding tokenizer: train on the corpus, encode at scale.

The classic Sennrich et al. (2016) algorithm, organized the way real
trainers (subword-nmt, sentencepiece) actually run:

- **The corpus-scale part is ONE aggregation.**  BPE training never
  touches documents — it works on the WORD FREQUENCY TABLE, which is
  bounded by vocabulary (Heaps' law: a few hundred thousand types even
  at 100 TB).  Spark computes `word → count` (map-side partials, one
  shuffle), truncated to the top `max_word_types` by (count desc,
  word asc) for determinism; the driver trains merges on that table in
  plain Python.
- **Merge training is inherently sequential** (each merge changes the
  next pair count), so it belongs on the driver — distributing it
  would serialize anyway.  Deterministic: ties broken by pair
  lexicographic order.
- **Encoding is the per-row hot path**: applying the learned merge
  ranks to each word (the greedy lowest-rank-first loop).  That's an
  iterative string rewrite no Catalyst expression expresses, so it is
  the textbook Arrow `mapInPandas` case — the merge table broadcasts
  via closure capture, each batch encodes in pure Python over columnar
  pandas, no state, no shuffle.

Vocabulary = single characters + one symbol per merge + the
end-of-word marker; `decode` (driver-side) inverts `encode` exactly.
"""

from __future__ import annotations

import functools as _functools
from typing import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: End-of-word marker (the subword-nmt convention `</w>`).
EOW = "</w>"


def word_frequencies(
    docs: DataFrame, text_col: str = "text", max_word_types: int = 65536
) -> list[tuple[str, int]]:
    """(word, count) driver-side table — the only corpus-wide pass.

    Deterministic truncation: (count desc, word asc).  Dropped tail
    types still ENCODE fine later (character fallback); they just
    don't influence merge selection — same trade every real trainer
    makes with a minimum-frequency cutoff.
    """
    rows = (
        docs.select(F.explode(F.split(text_col, " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(max_word_types)
        .collect()
    )
    return [(r["w"], int(r["c"])) for r in rows]


def train_bpe(
    word_freqs: list[tuple[str, int]], n_merges: int = 200
) -> list[tuple[str, str]]:
    """Learn `n_merges` merges from a word-frequency table.

    Pure deterministic Python: each round counts adjacent symbol
    pairs weighted by word frequency, merges the most frequent pair
    (lexicographic tie-break), stops early when no pair repeats.
    """
    vocab = {tuple(w) + (EOW,): c for w, c in word_freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        # highest count wins; ties go to the lexicographically
        # smallest pair — fully deterministic
        top = max(pairs.values())
        best_pair = min(p for p, c in pairs.items() if c == top)
        if top < 2:
            break
        merges.append(best_pair)
        a, b = best_pair
        ab = a + b
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def encode_documents(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, bpe_tokens array<string>, n_bpe_tokens) per document.

    Greedy lowest-rank-first application of the learned merges — the
    exact subword-nmt encoder — in Arrow batches.  The merge table is
    a few KB captured in the closure; per-word results are memoized
    per batch (Zipf makes the cache hit rate enormous).
    """
    ranks = {pair: i for i, pair in enumerate(merges)}

    def _encode(batches: Iterator) -> Iterator:
        import pandas as pd

        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks_col, n_col = [], []
            for text in pdf[text_col]:
                out: list[str] = []
                # NULL text encodes to zero tokens (the DuckDB twin's
                # string_split(NULL) → no rows), never to the literal
                # 'None'/'nan' word str() would manufacture
                words = [] if pd.isna(text) else str(text).split(" ")
                for w in words:
                    if w == "":
                        continue
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        cache[w] = enc
                    out.extend(enc)
                toks_col.append(out)
                n_col.append(len(out))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "bpe_tokens": toks_col,
                    "n_bpe_tokens": n_col,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        _encode,
        schema=f"{id_col} long, bpe_tokens array<string>, n_bpe_tokens long",
    )


def decode_tokens(tokens: list[str]) -> str:
    """Exact inverse of encoding: concatenate, split words at EOW."""
    return "".join(tokens).replace(EOW, " ").rstrip(" ")


# -- Oracle-twin trainer (driver-hash path) ----------------------------------

#: Delimiters the DuckDB oracle wraps symbols in when it replays the
#: encoder as a rank-ordered replace() fold (\x1f sym \x1e); corpus
#: symbols must never contain them or the replay is ambiguous.
_ORACLE_OPEN = "\x1f"
_ORACLE_CLOSE = "\x1e"


def train_bpe_from_parquet(
    sf_dir: str,
    n_merges: int = 48,
    max_word_types: int = 65536,
) -> list[tuple[str, str]]:
    """Spark-free twin of `word_frequencies` + `train_bpe` for oracle
    construction: reads `documents.parquet` with pyarrow, builds the
    same (count desc, word asc)-truncated word-frequency table, and
    runs the same deterministic merge learner — so the query builder
    and the DuckDB oracle generator inject IDENTICAL merges (the
    `train_centroids_from_parquet` contract, memoized per argument
    tuple + file (mtime_ns, size)).

    Raises if any word type contains the oracle's symbol delimiters
    (U+001F/U+001E) — the replace()-fold replay would be ambiguous.
    """
    import os

    st = os.stat(f"{sf_dir}/documents.parquet")
    got = _train_bpe_cached(
        sf_dir, n_merges, max_word_types, st.st_mtime_ns, st.st_size
    )
    return [tuple(m) for m in got]


@_functools.lru_cache(maxsize=8)
def _train_bpe_cached(
    sf_dir: str,
    n_merges: int,
    max_word_types: int,
    mtime_ns: int,
    size: int,
) -> list[tuple[str, str]]:
    from collections import Counter

    import pyarrow.parquet as pq

    texts = (
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
        .column("text")
        .to_pylist()
    )
    wc: Counter = Counter(
        w for t in texts for w in (t or "").split(" ") if w != ""
    )
    bad = [w for w in wc if _ORACLE_OPEN in w or _ORACLE_CLOSE in w]
    if bad:
        raise ValueError(
            f"{len(bad)} word types contain U+001F/U+001E; the oracle "
            f"replace()-fold replay cannot represent them: {bad[:3]!r}"
        )
    wf = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:max_word_types]
    return train_bpe(wf, n_merges=n_merges)
