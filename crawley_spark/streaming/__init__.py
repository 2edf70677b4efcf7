"""Structured Streaming surface for the crawl engine.

The batch engine (engine.crawl) is an iterative BFS driver; this package is
the *continuous-ingestion* complement: pages arrive as files dropped into a
directory (the WARC-drop pattern of a fetch tier), and the same extraction /
dedup / politeness kernels run incrementally over the stream.
"""

from .dedup import run_incremental_dedup  # noqa: F401
from .ingest import (  # noqa: F401
    extract_links_stream,
    host_window_metrics,
    pace_fetches,
    run_discovery,
    stream_pages,
)
