from crawl4ai_spark.corpus.fakeshop import generate_fakeshop, fakeshop_spark_df  # noqa: F401
