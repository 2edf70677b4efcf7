"""Relational building blocks of the crawl iteration (dedup, politeness)
plus the training-data pipeline operators (dedup/similarity/text)."""
