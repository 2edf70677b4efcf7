"""Per-URL text extraction over the pages corpus + the byte-identical
invariant check (BASELINE.json input_hint: "per-row invariant vs the
reference: byte-identical extracted text per url").

The extraction kernel (kernels.htmlx.extract_text: text tokens outside
script/style raw text, entity-decoded, document order) runs as an
Arrow-batched stage; ``verify_text_invariant`` re-extracts from ``html`` and
compares against the corpus ``text`` column byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TEXT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("extracted_text", T.StringType()),
    ]
)


def extract_text_df(pages: DataFrame) -> DataFrame:
    def fn(batches):
        import pandas as pd

        from ..kernels.htmlx import extract_text

        for pdf in batches:
            texts = []
            for html in pdf["html"].values:
                if html is None:
                    texts.append(None)
                else:
                    texts.append(extract_text(bytes(html).decode("utf-8", "surrogateescape")))
            yield pd.DataFrame({"url": pdf["url"].values, "extracted_text": texts})

    return pages.select("url", "html").mapInPandas(fn, TEXT_SCHEMA)


def verify_text_invariant(pages: DataFrame) -> DataFrame:
    """Rows where re-extracted text != the corpus text column (byte compare
    on UTF-8). Empty result ⇒ invariant holds."""
    ext = extract_text_df(pages)
    joined = pages.select("url", "text").join(ext, "url")
    return joined.filter(
        ~(
            (F.col("text").isNull() & F.col("extracted_text").isNull())
            | (F.encode(F.col("text"), "utf-8") == F.encode(F.col("extracted_text"), "utf-8"))
        )
    )
