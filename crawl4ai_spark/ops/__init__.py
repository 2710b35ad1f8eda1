"""Training-data pipeline operators (dedup, similarity, text analysis,
corpus quality/decontamination/PII, multimodal plumbing) — first-class
components of the engine alongside the crawl loop: a 100 TB crawl
output is only useful once deduplicated, quality-scored, decontaminated
against eval sets, and searchable."""
