"""Host-salted politeness scheduler (Q2).

The reference sleeps ``cfg.Delay`` before every fetch in each worker
(crawler.go:368-370) with MaxConnsPerHost = workers (client/http.go:31) —
wall-clock rate shaping. In iterative batch mode the equivalent budget is a
per-(run, host) fetch quota per iteration: ``quota = budget_ms / delay_ms``.
Rows beyond the quota spill back into the frontier for the next iteration.

Semantics: deferral never changes the final URL-seen set or per-URL results
(enqueue/emit decisions are order-independent given the dedup key — SURVEY.md
§2.6 Q2); it can permute emission *seq* relative to the canonical reference
order, so parity runs use an unlimited budget (no deferral).

Skew handling: the slot window partitions by (run, host); assignment is
rank-stable. The subsequent fetch join is salted by ``salt_hot_hosts`` so one
hot host's quota of fetches does not pin a single task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def schedule(frontier: DataFrame, quotas: dict) -> tuple[DataFrame, DataFrame]:
    """Split the frontier into (now, deferred) by per-run host quotas.

    quotas: run_id → max fetches per host per iteration (None = unlimited).
    """
    if not any(q is not None for q in quotas.values()):
        return frontier, frontier.limit(0)
    from ..plans.ordering import sql_long_map

    w = Window.partitionBy("run_id", "host").orderBy("rank")
    slotted = frontier.withColumn("_slot", F.row_number().over(w))
    qmap = sql_long_map(
        {run: int(q) if q is not None else 2**62 for run, q in quotas.items()}
    )
    cond = F.col("_slot") <= F.element_at(qmap, F.col("run_id"))
    now = slotted.filter(cond).drop("_slot")
    deferred = slotted.filter(~cond).drop("_slot")
    return now, deferred


def salt_hot_hosts(df: DataFrame, salt_k: int = 16) -> DataFrame:
    """Explicit repartition on a salted host key before the fetch join
    (north_rule): spreads a hot host's rows over ``salt_k`` partitions while
    keeping co-residence for everything else."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    salted = F.concat_ws(
        "#", F.col("host"), F.pmod(F.xxhash64(F.col("url")), F.lit(salt_k)).cast("string")
    )
    return df.repartition(n, salted)
