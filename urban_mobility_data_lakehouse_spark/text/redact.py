"""PII redaction for training corpora — pure Catalyst regexp chains.

Before text reaches a training shard, a pipeline scrubs the obvious
identifier classes.  Every rule here is a `regexp_replace` Column
expression (JVM codegen, row-local, no shuffle, no UDF), so redaction
runs at scan speed and composes with the rest of the documents
pipeline (quality → lang-id → dedup → redact → pack).

Deliberately pattern-based, not model-based: regexes catch the
high-volume mechanical classes (emails, URLs, phone-ish number runs,
IBANs, card-shaped digit runs, IPs).  A learned NER pass would be a
`mapInPandas` stage downstream — out of scope here, the multimodal
module shows that plumbing shape.

Rule order matters: URLs before emails (a URL may embed `user@host`),
IBAN/card before generic phone runs (both are digit runs; the longer,
more specific shapes must win first).  `redact_text` applies them in
that order; each replacement is a typed placeholder token (``<EMAIL>``
et al.) so downstream token statistics stay meaningful and redaction
counts are measurable with plain `split`/`size` expressions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# (placeholder, pattern) in application order — see module docstring.
RULES: tuple[tuple[str, str], ...] = (
    ("<URL>", r"(?i)\bhttps?://[^\s<>]+"),
    ("<EMAIL>", r"(?i)\b[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}\b"),
    ("<IBAN>", r"\b[A-Z]{2}\d{2}(?:\s?[A-Z0-9]{4}){3,8}\b"),
    ("<CARD>", r"\b\d{4}(?:[ -]\d{4}){3}\b"),
    ("<IP>", r"\b\d{1,3}(?:\.\d{1,3}){3}\b"),
    # no \b before '+': both sides are non-word chars, so \b\+ never
    # matches — guard with a lookbehind instead (Java regex)
    ("<PHONE>", r"(?<![\w+])\+?\d[\d ()./-]{7,}\d\b"),
)


def redact_text(col: Column) -> Column:
    """Apply every redaction rule, in order, as one expression chain."""
    out = col
    for placeholder, pattern in RULES:
        out = F.regexp_replace(out, pattern, placeholder)
    return out


def redact_documents(
    documents: DataFrame, text_col: str = "text"
) -> DataFrame:
    """documents + `text` redacted in place + `n_redactions` (how many
    replacements the scrub actually performed — the audit metric a
    curation pipeline tracks per batch).

    Counts come from `regexp_count` on the intermediate text right
    before each rule applies — NOT from counting placeholder tokens in
    the output, which would also count `<EMAIL>`-style literals already
    present in the source and inflate the metric.  Counting on the
    intermediate (not original) text keeps the count consistent with
    what each rule can still match after earlier rules consumed their
    spans (an email inside a URL is one `<URL>`, not two hits).
    """
    out = F.col(text_col)
    n: Column = F.lit(0)
    for placeholder, pattern in RULES:
        n = n + F.regexp_count(out, F.lit(pattern))
        out = F.regexp_replace(out, pattern, placeholder)
    return documents.withColumn("n_redactions", n.cast("long")).withColumn(
        text_col, out
    )
