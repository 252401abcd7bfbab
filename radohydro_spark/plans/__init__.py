from radohydro_spark.plans.pipeline import precip_timeseries

__all__ = ["precip_timeseries"]
