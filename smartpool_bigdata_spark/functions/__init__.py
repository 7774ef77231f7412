from smartpool_bigdata_spark.functions.stable import stable_avg, stable_sum

__all__ = ["stable_avg", "stable_sum"]
