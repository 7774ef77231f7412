"""Medallion pipeline composition (Bronze → Silver → Gold)."""

from smartpool_bigdata_spark.pipelines.medallion import MedallionPipeline

__all__ = ["MedallionPipeline"]
