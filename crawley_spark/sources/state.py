"""Crawl state checkpointing (north_rule: frontier, seen shards, results,
per-partition lineage + metrics checkpoint each iteration; a killed job
resumes exactly).

The store is an append-only directory layout compatible in spirit with an
Iceberg catalog (snapshot-per-iteration, atomic commit via the manifest
file written last); the sandbox has no Iceberg runtime jar, so the concrete
format is parquet + a JSON manifest. The API is format-agnostic: swap
``_write``/``_read`` for ``writeTo(table).append()`` / ``spark.table`` under
an Iceberg catalog and nothing else changes.

Layout::

    {root}/state.json                      # committed manifest (written last)
    {root}/results/iter=N/...parquet       # append-only emissions
    {root}/seen/iter=N/...parquet          # seen-set deltas, bucket column
    {root}/frontier/iter=N/...parquet      # full next-frontier snapshot
    {root}/metrics/iter=N/...parquet       # per-iteration + per-partition lineage

Commit protocol: write all four tables for iteration N, then atomically
replace state.json (os.replace). On resume, only iterations <= the committed
manifest are read — a crash mid-iteration leaves orphan files that are
ignored and overwritten on the next attempt.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEEN_BUCKETS = 64

RESULTS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("iter", T.IntegerType()),
    ]
)

SEEN_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("url_key", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("bucket", T.IntegerType()),
    ]
)

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("rank", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("can_fetch", T.BooleanType()),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("iter", T.IntegerType()),
        T.StructField("metric", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("value", T.LongType()),
    ]
)

BLOOM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("bitmap", T.BinaryType()),
    ]
)


def with_bucket(df: DataFrame, col: str = "url_key") -> DataFrame:
    return df.withColumn("bucket", F.pmod(F.xxhash64(F.col(col)), F.lit(SEEN_BUCKETS)).cast("int"))


class CrawlState:
    def __init__(self, spark: SparkSession, root: str | None = None):
        self.spark = spark
        self._tmp = root is None
        self.root = root or tempfile.mkdtemp(prefix="crawley_state_")
        os.makedirs(self.root, exist_ok=True)
        self.manifest = {"iteration": -1, "rank_offsets": {}, "seq_offsets": {}, "done": False}

    # -- manifest --
    @property
    def manifest_path(self) -> str:
        return os.path.join(self.root, "state.json")

    def load_manifest(self) -> bool:
        if not os.path.exists(self.manifest_path):
            return False
        with open(self.manifest_path) as f:
            self.manifest = json.load(f)
        return True

    def commit(self, iteration: int, rank_offsets: dict, seq_offsets: dict, done: bool) -> None:
        self.manifest = {
            "iteration": iteration,
            "rank_offsets": rank_offsets,
            "seq_offsets": seq_offsets,
            "done": done,
        }
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f)
        os.replace(tmp, self.manifest_path)

    # -- table io --
    def _dir(self, table: str, iteration: int) -> str:
        return os.path.join(self.root, table, f"iter={iteration}")

    def write(self, table: str, iteration: int, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(self._dir(table, iteration))

    def write_local(self, table: str, iteration: int, rows: list, schema: T.StructType) -> None:
        """Driver-local rows → parquet via pyarrow directly (no Spark job —
        a local createDataFrame costs one Python-worker round-trip per
        default-parallelism partition, ~4s/write at local[32]). Used for the
        tiny driver-side tables: metrics and the iteration-0 bootstrap."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        _PA = {"string": pa.string(), "long": pa.int64(), "integer": pa.int32(), "boolean": pa.bool_()}
        pa_schema = pa.schema([(f.name, _PA[f.dataType.typeName()]) for f in schema.fields])
        cols = list(zip(*rows)) if rows else [[] for _ in schema.fields]
        table_arr = pa.table(
            {f.name: pa.array(list(c), type=_PA[f.dataType.typeName()]) for f, c in zip(schema.fields, cols)}
        )
        d = self._dir(table, iteration)
        os.makedirs(d, exist_ok=True)
        pq.write_table(table_arr, os.path.join(d, "part-00000.parquet"))
        with open(os.path.join(d, "_SUCCESS"), "w"):
            pass

    def write_local_binary(self, table: str, iteration: int, shards: list) -> None:
        """[(bucket:int, bitmap:bytes)] → parquet (Bloom shard deltas)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pa.table(
            {
                "bucket": pa.array([b for b, _ in shards], type=pa.int32()),
                "bitmap": pa.array([m for _, m in shards], type=pa.binary()),
            }
        )
        d = self._dir(table, iteration)
        os.makedirs(d, exist_ok=True)
        pq.write_table(t, os.path.join(d, "part-00000.parquet"))
        with open(os.path.join(d, "_SUCCESS"), "w"):
            pass

    def _read_upto(self, table: str, schema: T.StructType, upto: int) -> DataFrame:
        dirs = [
            self._dir(table, i)
            for i in range(upto + 1)
            if os.path.exists(os.path.join(self._dir(table, i), "_SUCCESS"))
        ]
        if not dirs:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*dirs)

    def results(self, upto: int | None = None) -> DataFrame:
        return self._read_upto("results", RESULTS_SCHEMA, self._upto(upto))

    def seen(self, upto: int | None = None) -> DataFrame:
        return self._read_upto("seen", SEEN_SCHEMA, self._upto(upto))

    def metrics(self, upto: int | None = None) -> DataFrame:
        return self._read_upto("metrics", METRICS_SCHEMA, self._upto(upto))

    def frontier(self, iteration: int) -> DataFrame:
        path = self._dir("frontier", iteration)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            return self.spark.createDataFrame([], FRONTIER_SCHEMA)
        return self.spark.read.schema(FRONTIER_SCHEMA).parquet(path)

    def _upto(self, upto: int | None) -> int:
        return self.manifest["iteration"] if upto is None else upto

    def cleanup(self) -> None:
        if self._tmp:
            shutil.rmtree(self.root, ignore_errors=True)
