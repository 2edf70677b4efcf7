import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from crawley_spark.session import get_spark

    s = get_spark(app_name="crawley-tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()


def pages_to_df(spark, pages: dict):
    """Convert an interp-style {url: Page} dict to a corpus DataFrame with
    the BASELINE.json input_hint schema + the optional fixture columns."""
    import datetime

    from crawley_spark.kernels.htmlx import extract_text

    rows = []
    ts = datetime.datetime(2026, 1, 1)
    for url, p in pages.items():
        html = p.body.encode("utf-8", "surrogateescape") if p.body is not None else None
        text = extract_text(p.body) if p.body is not None else None
        rows.append((url, ts, html, text, "en", p.content_type, p.status))
    return spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, lang string, "
        "content_type string, status int",
    )
