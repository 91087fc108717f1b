"""PySpark-native analytics engine with the capability surface of
fblanco90/Urban-Mobility-Data-Lakehouse (a DuckDB/DuckLake medallion
lakehouse), re-expressed Spark-first.

Layout:
    session      — tuned SparkSession factory (AQE, Arrow, shuffle sizing)
    sources/     — readers/writers: schema-on-read CSV bronze, parquet,
                   partitioned lakehouse tables, quality log
    operators/   — relational operator builders (joins, aggs, windows, topk)
    functions/   — scalar function library (cleaning, datetime, spatial)
    queries/     — the oracle-checked query registry (driver contract)
    plans/       — physical-plan inspection helpers (pushdown/broadcast asserts)
    pipeline/    — the medallion mobility pipeline (bronze→silver→gold)
    ml/          — typical-day KMeans clustering dataflow
    text/        — text analysis (lang-id, quality, tokens, fingerprints)
    dedup/       — exact + near-duplicate detection (minhash/simhash/jaccard)
    similarity/  — embedding similarity search (brute-force + LSH)
    multimodal/  — binary-column plumbing (decode steps stubbed)
    streaming/   — Structured Streaming analogs of the daily batch loop
"""

__version__ = "0.1.0"
