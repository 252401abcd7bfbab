from radohydro_spark.functions.temporal import date_range, filename_digits, filename_to_ts

__all__ = ["date_range", "filename_digits", "filename_to_ts"]
