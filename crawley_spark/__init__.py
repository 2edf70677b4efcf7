"""crawley_spark — a PySpark-native distributed crawl engine.

A from-scratch reimplementation of the capabilities of s0rg/crawley
(reference at /root/reference, Go) as a distributed URL-frontier + fetch
scheduler over corpus tables of Common-Crawl-style pages. See SURVEY.md for
the full operator inventory and architecture.
"""

from .config import CrawlConfig  # noqa: F401

__version__ = "0.1.0"
