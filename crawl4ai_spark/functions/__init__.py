from crawl4ai_spark.functions.urlnorm import (  # noqa: F401
    normalize_url_for_deep_crawl,
    get_base_domain,
    is_external_url,
    normalize_urls_udf,
    base_domain_udf,
)
