from crawl4ai_spark.extraction.html_parser import extract_page  # noqa: F401
from crawl4ai_spark.extraction.extract import extract_pages, PAGE_SCHEMA  # noqa: F401
