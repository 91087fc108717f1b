"""Iceberg-style hidden partitioning: partition TRANSFORMS.

The reference lakehouse (like most Hive-layout stores) partitions by a
physical column the user must both populate and predicate on —
`WHERE day = '2024-03-07'` prunes, `WHERE ts >= '2024-03-07 09:00'`
scans everything.  Iceberg's fix (spec §"Partition Transforms",
apache/iceberg PartitionSpec) is to declare the partition as a
FUNCTION of a source column — `days(ts)`, `bucket(16, user_id)`,
`truncate(4, code)` — and keep it hidden: writers derive the value
automatically, readers predicate on the RAW column, and the engine
maps those predicates through the transform to partition ranges.

This module is the transform algebra; `Lakehouse.set_partition_spec`
wires it into the write/read paths:

- `derive()` — the Spark Column computing the partition value (always
  rendered as a STRING: partition values live in directory names and
  the commit-log part_map).
- `value_of(lit)` — the Python twin: the partition value a literal
  falls in.  Must agree with `derive()` exactly; each transform is
  built from engine-portable primitives (epoch-microsecond
  arithmetic, md5, substring) for that reason.
- `partition_survives(spec, predicates, value)` — driver-side pruning:
  False only when the transform PROVES no row of the partition can
  match.  Range predicates prune through ORDER-PRESERVING transforms
  (days/months/hours/truncate — Iceberg's monotonicity argument);
  bucket prunes only `=` / `in`.  Unknown operators and literals that
  fail to parse never prune (conservative), and the residual filter
  downstream re-applies the real predicate either way.

Timestamp semantics: `days`/`months`/`hours` bucket the INSTANT —
`floor(unix_micros / unit)` — not the session-zone rendering, so the
partition layout is timezone-independent (Iceberg's choice).  Python
literals: naive datetimes are taken as UTC (the engine's session
factory pins UTC); tz-aware datetimes convert exactly.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import re
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column

HIDDEN_PREFIX = "_p_"

_EPOCH = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
_US = {"hours": 3_600_000_000, "days": 86_400_000_000}


def _to_utc(lit) -> _dt.datetime:
    if isinstance(lit, str):
        lit = _dt.datetime.fromisoformat(lit)
    if isinstance(lit, _dt.datetime):
        if lit.tzinfo is None:
            return lit.replace(tzinfo=_dt.timezone.utc)
        return lit.astimezone(_dt.timezone.utc)
    if isinstance(lit, _dt.date):
        return _dt.datetime(
            lit.year, lit.month, lit.day, tzinfo=_dt.timezone.utc
        )
    raise TypeError(f"not a timestamp literal: {lit!r}")


def _epoch_micros(lit) -> int:
    return int((_to_utc(lit) - _EPOCH) / _dt.timedelta(microseconds=1))


@dataclass(frozen=True)
class PartitionSpec:
    transform: str  # identity | hours | days | months | bucket | truncate
    source: str
    n: int | None = None  # bucket count / truncate width

    @property
    def hidden_col(self) -> str:
        return f"{HIDDEN_PREFIX}{self.transform}_{self.source}"

    def to_json(self) -> dict:
        return {"transform": self.transform, "source": self.source,
                "n": self.n}

    @staticmethod
    def from_json(d: dict) -> "PartitionSpec":
        return PartitionSpec(d["transform"], d["source"], d.get("n"))

    # -- Spark side -------------------------------------------------
    def derive(self, df) -> Column:
        """Partition value of the source column, as a string Column.
        Each form is the exact JVM twin of `value_of`.  `df` supplies
        the source dtype (truncate is substring for strings, floored
        arithmetic for integers — Iceberg's split)."""
        col = F.col(self.source)
        t = self.transform
        if t == "identity":
            return col.cast("string")
        if t in ("hours", "days"):
            # instant bucketing: TZ-independent, floor handles pre-1970
            return F.floor(
                F.unix_micros(col.cast("timestamp")) / F.lit(_US[t])
            ).cast("long").cast("string")
        if t == "months":
            # TZ-independent: UTC epoch day → calendar fields of a DATE
            day = F.floor(
                F.unix_micros(col.cast("timestamp"))
                / F.lit(_US["days"])
            ).cast("int")
            d = F.date_add(F.lit(_dt.date(1970, 1, 1)), day)
            return (
                (F.year(d) - 1970) * 12 + F.month(d) - 1
            ).cast("long").cast("string")
        if t == "bucket":
            # engine-portable hash (same md5-60bit trick as bloom.py)
            return (
                F.conv(
                    F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
                ).cast("long") % self.n
            ).cast("string")
        if t == "truncate":
            dtype = dict(df.dtypes).get(self.source, "string")
            if dtype in ("tinyint", "smallint", "int", "bigint"):
                # pmod semantics: truncate toward -inf, matches Python %
                return (
                    (col - F.pmod(col, F.lit(self.n)))
                    .cast("long")
                    .cast("string")
                )
            return F.substring(col, 1, self.n)
        raise ValueError(f"unknown transform {t!r}")

    # -- Python twin ------------------------------------------------
    def value_of(self, lit) -> str:
        t = self.transform
        if t == "identity":
            return str(lit)
        if t in ("hours", "days"):
            return str(_epoch_micros(lit) // _US[t])
        if t == "months":
            day = _epoch_micros(lit) // _US["days"]
            d = _dt.date(1970, 1, 1) + _dt.timedelta(days=day)
            return str((d.year - 1970) * 12 + d.month - 1)
        if t == "bucket":
            h = int(
                hashlib.md5(str(lit).encode()).hexdigest()[:15], 16
            )
            return str(h % self.n)
        if t == "truncate":
            if isinstance(lit, int):
                return str(lit - (lit % self.n))
            return str(lit)[: self.n]
        raise ValueError(f"unknown transform {t!r}")

    # -- ordering for range pruning --------------------------------
    @property
    def ordered(self) -> bool:
        """Order-preserving transforms admit range pruning; bucket
        does not (Iceberg's monotone-transform rule).  Identity is
        ordered only when values compare correctly as rendered — we
        claim it for nothing and let identity prune `=`/`in` only
        (min/max file stats already cover identity ranges)."""
        return self.transform in ("hours", "days", "months", "truncate")

    def value_below(self, value: str, bound: str) -> bool:
        """True only if partition `value` is PROVABLY below `bound` in
        the source domain's order (and symmetrically for the caller's
        flipped use).  Temporal transforms render integers — exact.
        Truncate serves BOTH int and string columns from one spec, and
        their orders disagree on numeric-looking strings ('10' < '9'
        lexicographically); since the spec doesn't know the column
        dtype, a range prunes only when numeric AND lexicographic
        order agree it's out of range — sound for either column type,
        merely weaker where they disagree."""
        if self.transform in ("hours", "days", "months"):
            return int(value) < int(bound)
        lex = value < bound
        try:
            num = int(value) < int(bound)
        except ValueError:
            num = lex  # not both ints ⇒ only lex order is plausible
        return lex and num


_SPEC_RE = re.compile(
    r"^\s*(identity|hours|days|months|bucket|truncate)\s*\(\s*"
    r"(?:(\d+)\s*,\s*)?([A-Za-z_][A-Za-z0-9_]*)\s*\)\s*$"
)


def parse_spec(s: str) -> PartitionSpec:
    """`"days(ts)"`, `"bucket(16, user_id)"`, `"truncate(4, code)"`,
    `"identity(day)"` → PartitionSpec."""
    m = _SPEC_RE.match(s)
    if not m:
        raise ValueError(
            f"bad partition spec {s!r}: expected transform(col) or "
            "transform(N, col) with transform in identity/hours/days/"
            "months/bucket/truncate"
        )
    t, n, col = m.groups()
    if t in ("bucket", "truncate"):
        if n is None:
            raise ValueError(f"{t} needs a parameter: {t}(N, col)")
        return PartitionSpec(t, col, int(n))
    if n is not None:
        raise ValueError(f"{t} takes no parameter: {t}(col)")
    return PartitionSpec(t, col)


def localize_predicates(predicates, tzname: str):
    """Pin naive datetime/date literals to the live Spark session
    timezone before pruning.  Spark's residual filter interprets a
    naive literal in `spark.sql.session.timeZone`; the pruning twin
    must read it the SAME way or a non-UTC session could prune the
    boundary partition whose last hours the residual still matches.
    tz-aware and non-temporal literals pass through untouched."""
    from zoneinfo import ZoneInfo

    tz = ZoneInfo(tzname)

    def fix(lit):
        if isinstance(lit, _dt.datetime) and lit.tzinfo is None:
            return lit.replace(tzinfo=tz)
        if isinstance(lit, _dt.date) and not isinstance(
            lit, _dt.datetime
        ):
            return _dt.datetime(
                lit.year, lit.month, lit.day, tzinfo=tz
            )
        return lit

    out = []
    for col, op, lit in predicates:
        if op == "in" and isinstance(lit, (list, tuple, set)):
            out.append((col, op, [fix(v) for v in lit]))
        else:
            out.append((col, op, fix(lit)))
    return out


def partition_survives(
    spec: PartitionSpec, predicates, value: str
) -> bool:
    """True unless some predicate on the spec's SOURCE column proves
    partition `value` holds no matching row.  Conservative on every
    unknown: unparseable literal, unsupported operator, non-ordered
    transform under a range — all survive.  `>`/`<` map to the
    INCLUSIVE partition bound (a strict row bound still admits rows
    elsewhere in the boundary partition)."""
    for col, op, lit in predicates:
        if col != spec.source:
            continue
        try:
            if op in ("=", "=="):
                if spec.value_of(lit) != value:
                    return False
            elif op == "in":
                vals = {spec.value_of(v) for v in lit}
                if value not in vals:
                    return False
            elif op in (">", ">=") and spec.ordered:
                if spec.value_below(value, spec.value_of(lit)):
                    return False
            elif op in ("<", "<=") and spec.ordered:
                if spec.value_below(spec.value_of(lit), value):
                    return False
        except Exception:
            continue  # can't reason about it ⇒ cannot prune on it
    return True
