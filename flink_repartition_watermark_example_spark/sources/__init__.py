from flink_repartition_watermark_example_spark.sources.tables import load_table, register_views
from flink_repartition_watermark_example_spark.sources.generator import pageviews, skewed_pageview_partitions

__all__ = ["load_table", "register_views", "pageviews", "skewed_pageview_partitions"]
