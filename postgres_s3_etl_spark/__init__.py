"""PySpark-native analytics engine with the capabilities of
yaroyazeed/postgres-s3-ETL (reference at /root/reference), rebuilt
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst,
plus the large-scale training-data operators (dedup, similarity
search, text analysis, multimodal plumbing) a 100 TB pipeline needs.
"""

from postgres_s3_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
