from flink_repartition_watermark_example_spark.operators.windowed import windowed_agg, windowed_count

__all__ = ["windowed_agg", "windowed_count"]
