"""Pure-Python row kernels (no Spark imports).

These reproduce the reference's per-URL / per-page semantics exactly and are
wrapped by Arrow-batched pandas UDFs one layer up (crawley_spark.functions).
"""

from . import clean, cssx, gourl, htmlx, jsx, paths, robotsx, sitemapx  # noqa: F401
