"""Sources/sinks: pages corpus normalization and crawl state checkpointing."""
