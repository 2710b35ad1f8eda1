from crawl4ai_spark.engine.frontier import CrawlConfig, CrawlEngine  # noqa: F401
from crawl4ai_spark.engine.tables import SnapshotTable, Warehouse  # noqa: F401
