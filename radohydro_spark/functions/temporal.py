"""Temporal scalar functions: date ranges (F1), filename→timestamp (F8).

All built-in column expressions — JVM-side, codegen'd, no UDFs
(SURVEY.md §2.2/§2.8 C1-C4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_FMT = {"hours": "yyyyMMddHH", "days": "yyyyMMdd", "minutes": "yyyyMMddHHmm"}


def filename_digits(name: Column | str) -> Column:
    """Concatenation of all digit runs in a filename — the engine form of
    the reference's ``re.findall(r'\\d+', filename)`` concat loop
    (reference radohydro.py:64-71)."""
    c = F.col(name) if isinstance(name, str) else name
    return F.regexp_replace(c, "[^0-9]", "")


def filename_to_ts(name: Column | str, date_type: str = "hours") -> Column:
    """Parse an archive-member filename into a timestamp (F8; reference
    radohydro.py:64-78, three format variants by ``date_type``).

    Two-digit-year day names (REGNIE ``raYYMMDD``, reference
    radohydro.py:434 ``members_daily[2:8]`` with ``%y%m%d``) are handled by
    the 'days2' variant.
    """
    digits = filename_digits(name)
    if date_type == "days2":
        return F.to_timestamp(F.substring(digits, 1, 6), "yyMMdd")
    fmt = _FMT[date_type]
    return F.to_timestamp(F.substring(digits, 1, len(fmt)), fmt)


def date_range(
    spark: SparkSession, start: str, end: str, step: str = "1 day"
) -> DataFrame:
    """Inclusive date sequence as a DataFrame (F1; reference
    ``daterange`` generator radohydro.py:39-46) via ``sequence``+``explode``
    — lazy, no driver-side list."""
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_timestamp(F.lit(start)),
                F.to_timestamp(F.lit(end)),
                F.expr(f"interval {step}"),
            )
        ).alias("dt")
    )
