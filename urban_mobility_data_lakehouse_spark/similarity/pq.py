"""Product quantization (PQ) for embedding compression + ADC search.

The fourth rung of the ANN ladder (brute force → LSH → IVF → PQ), and
the one that makes 100 TB of embeddings *storable*: each D-dim float
vector becomes M small codes (here 64 dims → 16 codes of 5 bits each,
a ~25× compression over float32), and the corpus-wide scan runs against
the codes with asymmetric distance computation (ADC: exact query vs
quantized corpus — Jegou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011).

Spark-first shape, mirroring `ivf.py`:

- *Train*: per-subspace Lloyd's on the same bounded lowest-vec_id
  sample the IVF trainer uses — driver-sized numpy work, seeded and
  deterministic, with a pyarrow twin (`train_pq_from_parquet`) that
  reproduces the codebooks bit-identically for oracle construction.
- *Encode*: one row-local pass.  The flat codebook (M×KSUB entries)
  rides along as a single broadcast array column; per-subspace argmin
  runs inside higher-order functions (slice → fold squared L2 → strict
  `<` keeps the lowest code on ties).  NO shuffle, no Python, no giant
  literal tree in codegen.
- *Search (ADC + re-rank)*: broadcast the exact query vectors over the
  encoded corpus; the approximate distance is a fold over subspaces of
  "query subvector vs looked-up codeword" squared L2 — row-local over
  the compressed codes, which is the pass that scans 100 TB.  The top
  `SHORTLIST` candidates per query (a bounded set) are then re-ranked
  with EXACT squared L2 against their full vectors — the standard
  IVFADC deployment shape: compressed scan for candidates, exact math
  only on the shortlist.  (On this synthetic near-isotropic corpus
  pure ADC ordering is data-limited — recall@3 ≈ 0.3 at any sane code
  budget because neighbors are barely separated — while the
  shortlist-50 re-rank recovers recall 1.0; the quality tests assert
  exactly that split.)

Every float operation is an index-ordered left fold with a 0.0 seed, so
the DuckDB oracle (`queries/similarity.py`) replays it bit-for-bit with
`list_reduce(list_transform(generate_series(...)))` and inlined
codebook literals.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from .ivf import lloyd
from .knn import _as_double

DIM = 64
M = 16  # subspaces
DSUB = DIM // M  # dims per subspace
KSUB = 32  # codewords per subspace
SHORTLIST = 50  # ADC candidates per query fed to the exact re-rank


def train_pq(
    embeddings: DataFrame,
    m: int = M,
    ksub: int = KSUB,
    seed: int = 42,
    sample_size: int = 2048,
    n_iter: int = 10,
) -> list[list[list[float]]]:
    """codebooks[j][c] = codeword c of subspace j (float64 lists).

    Same deterministic sample as the IVF trainer (lowest vec_ids);
    each subspace trains an independent seeded Lloyd's (seed + j).
    """
    import numpy as np

    pdf = (
        embeddings.orderBy("vec_id")
        .limit(sample_size)
        .select(_as_double(F.col("embedding")).alias("e"))
        .toPandas()
    )
    x = np.array(pdf["e"].tolist(), dtype=np.float64)
    dsub = x.shape[1] // m
    return [
        lloyd(x[:, j * dsub : (j + 1) * dsub], n_cells=ksub, seed=seed + j,
              n_iter=n_iter)
        for j in range(m)
    ]


import functools


def train_pq_from_parquet(
    sf_dir: str,
    m: int = M,
    ksub: int = KSUB,
    seed: int = 42,
    sample_size: int = 2048,
    n_iter: int = 10,
) -> list[list[list[float]]]:
    """Spark-free twin of `train_pq` (pyarrow read, stable lowest-vec_id
    sample, identical `lloyd`) — bit-identical codebooks, for oracles.
    Memoized per argument tuple plus the file's (mtime_ns, size), same
    contract as `ivf.train_centroids_from_parquet`: a regenerated
    parquet busts the cache, and each call gets a fresh copy so caller
    mutation cannot poison later consumers."""
    import os

    st = os.stat(f"{sf_dir}/embeddings.parquet")
    got = _train_pq_cached(
        sf_dir, m, ksub, seed, sample_size, n_iter,
        st.st_mtime_ns, st.st_size,
    )
    return [[list(cw) for cw in book] for book in got]


@functools.lru_cache(maxsize=32)
def _train_pq_cached(
    sf_dir: str,
    m: int,
    ksub: int,
    seed: int,
    sample_size: int,
    n_iter: int,
    _mtime_ns: int,
    _size: int,
) -> list[list[list[float]]]:
    import numpy as np
    import pyarrow.parquet as pq_

    tbl = pq_.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    vec_ids = np.asarray(tbl.column("vec_id").to_pylist())
    embs = tbl.column("embedding").to_pylist()
    order = np.argsort(vec_ids, kind="stable")[:sample_size]
    x = np.array([embs[i] for i in order], dtype=np.float64)
    dsub = x.shape[1] // m
    return [
        lloyd(x[:, j * dsub : (j + 1) * dsub], n_cells=ksub, seed=seed + j,
              n_iter=n_iter)
        for j in range(m)
    ]


def _flat_codebook_row(
    spark: SparkSession, codebooks: list[list[list[float]]]
) -> DataFrame:
    """ONE row holding the flat codebook as array<array<double>> in
    (j, c) order — entry j*KSUB + c is codeword c of subspace j.
    Broadcast-cross-joined onto the corpus, the same no-literal-tree
    trick as `ivf.centroid_table`."""
    flat = [
        [float(v) for v in cw] for book in codebooks for cw in book
    ]
    from ..sources.localrel import values_df

    return values_df(spark, [(flat,)], "cbs array<array<double>>")


def _sub_l2(a_slice: Column, cw: Column) -> Column:
    """Squared L2 between a subvector slice and a codeword: 0.0-seeded
    index-ordered fold (the engine-portable shape)."""
    return F.aggregate(
        F.zip_with(a_slice, cw, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def encode_pq_hof(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    m: int = M,
    ksub: int = KSUB,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Higher-order-function twin of `encode_pq` (the pre-Arrow form),
    kept as the reference implementation the bit-identity test pins the
    Arrow path against — and as living documentation of the fold order
    both must reproduce.

    (vec_id, codes array<int>) — codes[j] = argmin_c l2(sub_j, cw).
    argmin = `array_min` over (d2, c) structs: each candidate distance
    is computed ONCE, and struct ordering breaks exact-distance ties by
    the LOWEST code — the same tie the oracle's `ORDER BY d2, c` picks.
    """
    dsub = len(codebooks[0][0])
    spark = embeddings.sparkSession
    emb = F.col("emb")

    def best_code(j: Column) -> Column:
        sub = F.slice(emb, j * dsub + 1, dsub)
        return F.array_min(
            F.transform(
                F.sequence(F.lit(0), F.lit(ksub - 1)),
                lambda c: F.struct(
                    _sub_l2(sub, F.col("cbs")[j * ksub + c]).alias("d"),
                    c.alias("c"),
                ),
            )
        )["c"]

    return (
        embeddings.select(
            "vec_id",
            *keep_cols,
            _as_double(F.col("embedding")).alias("emb"),
        )
        .join(F.broadcast(_flat_codebook_row(spark, codebooks)))
        .select(
            "vec_id",
            *keep_cols,
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)), best_code
            ).alias("codes"),
        )
    )


def encode_pq(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    m: int = M,
    ksub: int = KSUB,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(vec_id, codes array<int>) — codes[j] = argmin_c l2(sub_j, cw),
    as an Arrow `mapInPandas` batch.

    Spark evaluates HOF lambdas per array element (~µs each), so the
    HOF encode costs M·KSUB·DSUB ≈ 2048 interpreted evals per vector —
    the same interpreted-linear-algebra trap the round-6 curve caught
    in IVF assignment.  The numpy path reproduces the EXACT semantics:
    each candidate distance accumulates (x−c)² over dims in index
    order from a 0.0 seed (identical IEEE op order to `_sub_l2`'s left
    fold), and `argmin`'s first-minimum rule is the struct ordering's
    lowest-code tie-break.  Bit-identity vs `encode_pq_hof` is
    test-locked (`test_ann.py`), which keeps the inlined-literal
    DuckDB oracle replay exact."""
    import numpy as np

    dsub = len(codebooks[0][0])
    cw = [np.array(book, dtype=np.float64) for book in codebooks]
    in_schema = embeddings.schema
    keep_types = {
        k: in_schema[k].dataType.simpleString() for k in keep_cols
    }
    out_schema = ", ".join(
        ["vec_id long"]
        + [f"{k} {t}" for k, t in keep_types.items()]
        + ["codes array<int>"]
    )

    def _enc(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            n = x.shape[0]
            codes = np.empty((n, m), dtype=np.int32)
            for j in range(m):
                sub = x[:, j * dsub : (j + 1) * dsub]
                acc = np.zeros((n, ksub), dtype=np.float64)
                for d in range(dsub):
                    diff = sub[:, d][:, None] - cw[j][None, :, d]
                    acc += diff * diff
                codes[:, j] = acc.argmin(axis=1)  # first min → lowest c
            out = {"vec_id": pdf["vec_id"]}
            for k in keep_cols:
                out[k] = pdf[k]
            out["codes"] = list(codes)
            yield pd.DataFrame(out)

    return embeddings.select(
        "vec_id", *keep_cols, "embedding"
    ).mapInPandas(_enc, schema=out_schema)


def knn_pq(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 3,
    m: int = M,
    ksub: int = KSUB,
    seed: int = 42,
    shortlist: int = SHORTLIST,
    codebooks: list[list[list[float]]] | None = None,
    q_rows: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """ADC-shortlist + exact-re-rank top-k (the IVFADC deployment
    shape): the compressed-code scan picks `shortlist` candidates per
    query by approximate squared L2; only those rows are re-ranked with
    exact squared L2 against their full vectors.

    Output (query_id, neighbor_id, l2_dist, rank) — l2_dist is the
    EXACT squared L2 of the returned neighbors, rounded to 4.
    """
    codebooks = codebooks or train_pq(
        embeddings, m=m, ksub=ksub, seed=seed
    )
    dsub = len(codebooks[0][0])

    queries = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        _as_double(F.col("embedding")).alias("emb_q"),
    )
    # ADC as an Arrow batch over the encoded corpus: the HOF form
    # (aggregate over j of a zip_with fold) costs M·DSUB interpreted
    # evals per (query, neighbor) pair.  The per-query (m × ksub)
    # distance TABLE is tiny and query count is bounded, so it is
    # precomputed driver-side with the identical fold order (0.0 seed,
    # (q−c)² accumulated in dim order), and the scan is a j-ordered
    # sum of table lookups — the same left-fold ((0+s0)+s1)+… the HOF
    # plan executes, so adc doubles are bit-identical and the DuckDB
    # oracle replay stays exact.
    import numpy as np

    if q_rows is None:
        from .knn import collect_queries

        q_rows = collect_queries(embeddings, n_queries)
    tables = {}
    for qid, qe in q_rows:
        t = np.zeros((m, ksub), dtype=np.float64)
        for j in range(m):
            for d in range(dsub):
                diff = qe[j * dsub + d] - np.asarray(
                    codebooks[j], dtype=np.float64
                )[:, d]
                t[j] += diff * diff
        tables[qid] = t

    # Fused encode+ADC: the corpus used to cross the Python boundary
    # twice (encode_pq's mapInPandas emitting codes, then a second
    # mapInPandas re-reading them for ADC).  One Arrow crossing now
    # encodes the batch (identical numpy body to encode_pq — locked
    # bit-identical to the HOF twin) and immediately scores it; the
    # codes never round-trip through Arrow (int32 vs int64 dtype is
    # index-only, distances are table lookups either way).
    cw = [np.array(book, dtype=np.float64) for book in codebooks]

    def _enc_adc(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            nrows = x.shape[0]
            codes = np.empty((nrows, m), dtype=np.int64)
            for j in range(m):
                sub = x[:, j * dsub : (j + 1) * dsub]
                acc = np.zeros((nrows, ksub), dtype=np.float64)
                for d in range(dsub):
                    diff = sub[:, d][:, None] - cw[j][None, :, d]
                    acc += diff * diff
                codes[:, j] = acc.argmin(axis=1)  # first min → lowest c
            nbr = pdf["vec_id"].to_numpy()
            frames = []
            for qid, _qe in q_rows:
                acc = np.zeros(nrows, dtype=np.float64)
                t = tables[qid]
                for j in range(m):
                    acc = acc + t[j][codes[:, j]]
                keep = nbr != qid
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": nbr[keep],
                            "adc": acc[keep],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    scored = embeddings.select("vec_id", "embedding").mapInPandas(
        _enc_adc, schema="query_id long, neighbor_id long, adc double"
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc()
    )
    short = (
        scored.withColumn("srank", F.row_number().over(w_adc))
        .filter(F.col("srank") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    # exact re-rank: the shortlist is n_queries × shortlist rows —
    # broadcast it against the full-vector table, so only candidate
    # rows ever see exact math
    full = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        _as_double(F.col("embedding")).alias("emb_b"),
    )
    rer = (
        full.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            _sub_l2(F.col("emb_q"), F.col("emb_b")).alias("l2"),
        )
    )
    w_l2 = Window.partitionBy("query_id").orderBy(
        F.col("l2").asc(), F.col("neighbor_id").asc()
    )
    return (
        rer.withColumn("rank", F.row_number().over(w_l2))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("l2", 4).alias("l2_dist"),
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )
