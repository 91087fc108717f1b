"""Benchmark decontamination: flag corpus documents that share long
word n-grams with an evaluation set.

The standard training-data hygiene pass (GPT-3 appendix C / PaLM /
Llama dedup-and-decontaminate recipes, all public): an eval example
"leaks" into the training corpus if a document contains any of the
eval set's 8-grams, so those documents must be dropped or masked
before training.  The reference pipeline has no analog (it curates
mobility data); this is part of the beyond-reference LLM-data stack.

Scale shape: the corpus side is 100 TB, the eval side is benchmarks —
a few MB of text, thousands of distinct 8-grams.  So the right plan
is: reduce the eval side to a distinct-gram-hash set ONCE, fold it
into a single array row, broadcast it, and test each corpus document
row-locally (`array_intersect` of the doc's gram hashes against the
broadcast array).  Zero shuffle on the corpus side, no explode, no
join key — the whole pass pipelines into the corpus scan.  For eval
sets too big to fold into one array (~millions of grams), `via_join`
explodes doc grams and broadcast-semi-joins instead: still
broadcast-sized right side, one groupBy(doc_id) shuffle on the left.

Gram hashing reuses the portable md5-60bit-mod-2^31-1 scheme shared
with the MinHash stack (dedup/minhash.py), so the operator is
oracle-checkable: DuckDB replays the identical hash arithmetic.
A 31-bit hash collision can flag a clean document with probability
≈ |eval grams| × |doc grams| / 2^31 — for real decontamination runs
that's the safe direction (over-dropping, never under-dropping).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..dedup.minhash import shingle_hash, shingles

#: Decontamination gram length — the published convention is 8-13;
#: 8 is the GPT-3 / PaLM choice.
DEFAULT_N = 8


def gram_hashes(text: Column, n: int = DEFAULT_N) -> Column:
    """Distinct hashed word n-grams of one document (row-local).

    Documents shorter than `n` words hash their whole text as a single
    gram (the `shingles` short-doc convention), so tiny eval examples
    still decontaminate exact copies of themselves.

    Column-level form for SMALL frames (the eval side): the inline
    split violates `shingles`' bound-column contract — each element_at
    re-tokenizes the row — so the CORPUS side must go through
    `with_gram_hashes` instead, which binds the token array first.
    """
    toks = F.split(text, " ")
    return F.transform(shingles(toks, text, n), shingle_hash)


def with_gram_hashes(
    docs: DataFrame, n: int = DEFAULT_N, out_col: str = "_ghs"
) -> DataFrame:
    """docs + `out_col` (array<long> of distinct gram hashes) with the
    token array BOUND as a real column first — the corpus-side form
    (Catalyst does no CSE inside HOF lambdas; an inline split would
    re-tokenize the document for every element_at, the measured 4×
    `shingles` slowdown, paid over EVERY corpus row here)."""
    return (
        docs.withColumn("_toks", F.split(F.col("text"), " "))
        .withColumn(
            out_col,
            F.transform(
                shingles(F.col("_toks"), F.col("text"), n), shingle_hash
            ),
        )
        .drop("_toks")
    )


def eval_gram_set(eval_docs: DataFrame, n: int = DEFAULT_N) -> DataFrame:
    """One row holding the sorted distinct gram-hash array of the eval
    set — the broadcastable decontamination dictionary."""
    return (
        eval_docs.select(
            F.explode(gram_hashes(F.col("text"), n)).alias("h")
        )
        .agg(F.array_sort(F.collect_set("h")).alias("eval_grams"))
    )


#: above this many distinct eval grams, `mark_contaminated` switches
#: from the in-row array plan to the broadcast-hash-join plan —
#: array_intersect walks the WHOLE dictionary per corpus row
#: (O(|eval|) per row: the scale-curve part decomposition measured the
#: array plan at 7.0×/decade when eval and corpus grow together, vs
#: ≤1.8× for the join plan), while a broadcast hash join builds the
#: probe set once per task and costs O(1) per doc gram
ARRAY_PLAN_MAX_GRAMS = 4096


def mark_contaminated(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = DEFAULT_N,
    id_col: str = "doc_id",
    max_array_grams: int = ARRAY_PLAN_MAX_GRAMS,
    plan: str = "auto",
) -> DataFrame:
    """Corpus docs + (contam_hits, contaminated).

    `contam_hits` = number of DISTINCT eval grams the document
    contains; `contaminated` = contam_hits > 0.  `plan`:

    * "array" — broadcast-ARRAY plan: the dictionary folds into one
      in-row array (a 1-row broadcast built INSIDE the plan — fully
      lazy, no build-time job) and each corpus doc tests row-locally
      via array_intersect: zero corpus shuffle, no explode, the whole
      pass pipelines into the corpus scan.
    * "join" — broadcast-hash-JOIN plan
      (`mark_contaminated_via_join`, also fully lazy):
      array_intersect's per-row dictionary walk turns
      O(corpus × eval) exactly when both sides grow together, while
      the join probes a per-task hash set at O(1) per gram and
      shuffles only the HITS (post-join, tiny).
    * "auto" (default) — pick by dictionary size: ≤ `max_array_grams`
      distinct eval grams → array, else join.  Adaptivity needs the
      size, so auto runs ONE eager job over the EVAL side at build
      time (small by definition; the collected row is then reused as
      the broadcast dictionary, never recomputed).  Callers composing
      fully-lazy pipelines force a side instead — a forced side runs
      ZERO Spark jobs at build time.

    All plans produce identical values (locked by test).
    """
    if plan not in ("auto", "array", "join"):
        raise ValueError(f"plan must be auto|array|join, got {plan!r}")
    if plan == "join":
        return mark_contaminated_via_join(docs, eval_docs, n, id_col)
    if plan == "array":
        # the dictionary stays a (1-row) DataFrame: the eval aggregate
        # runs inside the returned plan at execution time
        dict_row = F.broadcast(eval_gram_set(eval_docs, n))
        return _array_plan(docs, dict_row, n)
    collected = eval_gram_set(eval_docs, n).collect()
    eval_grams = collected[0]["eval_grams"] if collected else []
    if len(eval_grams) > max_array_grams:
        return mark_contaminated_via_join(docs, eval_docs, n, id_col)
    spark = docs.sparkSession
    from ..sources.localrel import values_df

    dict_row = F.broadcast(
        values_df(
            spark, [([int(h) for h in eval_grams],)], "eval_grams array<bigint>"
        )
    )
    return _array_plan(docs, dict_row, n)


def _array_plan(docs: DataFrame, dict_row: DataFrame, n: int) -> DataFrame:
    """The in-row array_intersect scoring pass over a 1-row broadcast
    dictionary frame (literal row in auto mode, lazy eval-side
    aggregate in forced-array mode — same values either way)."""
    hits = F.size(F.array_intersect(F.col("_ghs"), F.col("eval_grams")))
    return (
        with_gram_hashes(docs, n)
        .join(dict_row)
        .withColumn("contam_hits", hits.cast("long"))
        .withColumn("contaminated", F.col("contam_hits") > 0)
        .drop("eval_grams", "_ghs")
    )


def mark_contaminated_via_join(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = DEFAULT_N,
    id_col: str = "doc_id",
) -> DataFrame:
    """Join-shaped variant for eval sets too large to fold into one
    in-row array: explode corpus grams, broadcast-join the distinct
    eval grams, re-aggregate per document.  Same output contract as
    `mark_contaminated` (checked equal in tests).  Requires `id_col`
    to be unique per document (the re-aggregate groups by it; the
    array plan scores each ROW independently instead)."""
    eval_grams = (
        eval_docs.select(F.explode(gram_hashes(F.col("text"), n)).alias("h"))
        .distinct()
    )
    hits = (
        with_gram_hashes(docs, n)
        .select(id_col, F.explode(F.col("_ghs")).alias("h"))
        .join(F.broadcast(eval_grams), "h")
        .groupBy(id_col)
        # countDistinct, not count(1): gram_hashes dedups per row, so
        # the two only differ when two DISTINCT grams of one doc
        # collide to the same 31-bit hash — countDistinct keeps this
        # plan's answer equal to the array plan's
        # size(array_intersect(...)) under that collision too
        .agg(F.countDistinct("h").alias("contam_hits"))
    )
    return (
        docs.join(hits, id_col, "left")
        .withColumn(
            "contam_hits", F.coalesce(F.col("contam_hits"), F.lit(0))
        )
        .withColumn("contaminated", F.col("contam_hits") > 0)
    )
