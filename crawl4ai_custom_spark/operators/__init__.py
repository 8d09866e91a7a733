"""Spark operators built on the pure kernel (crawl4ai_custom_spark.kernel)."""
