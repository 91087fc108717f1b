"""Datetime expression library (SURVEY.md §2.8 date/time rows).

The mobility pipeline's temporal semantics: YYYYMMDD strings → dates,
date+hour → Europe/Madrid instants (DST-correct), holiday year-shift via
make_date, ISO weekday classification.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def parse_yyyymmdd(col: Column) -> Column:
    """strptime(x,'%Y%m%d') with try-semantics: NULL on garbage
    (mobility_ingestion_pipeline.py:544,550,558)."""
    return F.try_to_timestamp(col, F.lit("yyyyMMdd")).cast("date")


def parse_ddmmyyyy(col: Column) -> Column:
    """Work-calendar 'Dia' format DD/MM/YYYY (…:327-338)."""
    return F.try_to_timestamp(col, F.lit("dd/MM/yyyy")).cast("date")


def period_timestamp(date_col: Column, hour_col: Column) -> Column:
    """date + hour-interval → TIMESTAMP (…:549-558).

    With spark.sql.session.timeZone=Europe/Madrid this reproduces the
    reference's AT TIME ZONE semantics including DST days (23/25-hour
    days appear naturally because the timestamp is built from wall-clock
    date+hour in the session zone).
    """
    return F.to_timestamp(date_col) + F.make_interval(
        hours=hour_col.cast("int")
    )


def force_year(date_col: Column, year: int) -> Column:
    """MAKE_DATE(year, MONTH(d), DAY(d)) holiday year-shift (…:331-335)."""
    return F.make_date(
        F.lit(year), F.month(date_col), F.dayofmonth(date_col)
    )


def is_weekend(date_col: Column) -> Column:
    """EXTRACT(ISODOW) >= 6 (1_sprint1...ipynb:3491-3492): Spark weekday()
    is Monday=0 … Sunday=6, so ISODOW>=6 ⇔ weekday()>=5."""
    return F.weekday(date_col) >= 5


def day_name(date_col: Column) -> Column:
    """dayname(date) (mobility_ingestion_pipeline.py:738)."""
    return F.date_format(date_col, "EEEE")


def date_sequence(start: str, end: str) -> Column:
    """pd.date_range analog: inclusive date array, to explode() into a
    driver-free date spine (…:403-411 did this driver-side via XCom)."""
    return F.sequence(
        F.lit(start).cast("date"),
        F.lit(end).cast("date"),
        F.expr("interval 1 day"),
    )
