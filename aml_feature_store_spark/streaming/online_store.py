"""Online feature store: streaming sink + point-lookup surface
(SURVEY §2.1 S5/S6; reference Redis hash store,
flink_job/aml_stream_processor.py:203-221, api/main.py:327-363).

Spark-first: the online store is a **latest-value table** keyed by entity,
maintained by ``foreachBatch`` last-write-wins merge. With Delta/Iceberg
on the classpath this is ``MERGE INTO``; this environment has neither, so
the merge is emulated with read → anti-join → union → overwrite on a
parquet dir (same semantics, not atomic — documented). TTL is a read-time
predicate on feature_timestamp, exactly the 24 h Redis EXPIRE semantics.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.pit import latest_snapshot

TTL_SECONDS_DEFAULT = 86400  # reference: EXPIRE 86400


class OnlineStore:
    """Latest-value feature table on a parquet path."""

    def __init__(self, spark: SparkSession, path: str,
                 entity_col: str = "user_id", ts_col: str = "feature_ts") -> None:
        self.spark = spark
        self.path = path
        self.entity_col = entity_col
        self.ts_col = ts_col

    def _exists(self) -> bool:
        return os.path.exists(os.path.join(self.path, "_SUCCESS"))

    def merge(self, batch: DataFrame) -> None:
        """Last-write-wins upsert of a feature batch (the foreachBatch body)."""
        new = latest_snapshot(
            batch, self.entity_col, self.ts_col, tiebreak_col=self.ts_col
        )
        if self._exists():
            cur = self.spark.read.parquet(self.path)
            keep = cur.join(
                new.select(self.entity_col), self.entity_col, "left_anti"
            )
            merged = keep.unionByName(new)
        else:
            merged = new
        # parquet has no MERGE (Delta would): fully materialize the merged
        # result into a staging dir FIRST, then swap directories. The write
        # still reads the current table, but the current table is never
        # overwritten mid-read — a lost cache block / executor failure
        # during the write just recomputes from the intact source, instead
        # of corrupting the store.
        staging = f"{self.path}.staging.{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(staging)
        old = f"{self.path}.old.{uuid.uuid4().hex[:8]}"
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(staging, self.path)
        if os.path.exists(old):
            shutil.rmtree(old)

    def foreach_batch(self):
        """Adapter for stream.writeStream.foreachBatch(...)."""

        def fn(batch_df: DataFrame, _epoch_id: int) -> None:
            self.merge(batch_df)

        return fn

    def read(self, ttl_s: int = TTL_SECONDS_DEFAULT,
             now_expr: str | None = None) -> DataFrame:
        """TTL-filtered online view: rows whose feature_ts is within ttl of
        `now` (default: the table's max feature_ts — deterministic for
        tests; pass now_expr='current_timestamp()' in production)."""
        df = self.spark.read.parquet(self.path)
        if now_expr is None:
            mx = df.agg(F.max(self.ts_col)).collect()[0][0]
            now = F.lit(mx)
        else:
            now = F.expr(now_expr)
        return df.filter(
            F.unix_millis(now) - F.unix_millis(F.col(self.ts_col)) <= ttl_s * 1000
        )

    def lookup(self, entity_ids: list, ttl_s: int = TTL_SECONDS_DEFAULT) -> DataFrame:
        """Point lookup (J1): the API-serving read path, with zero-defaults
        left to the caller's coalesce (api/main.py:345-361 semantics)."""
        return self.read(ttl_s).filter(F.col(self.entity_col).isin(entity_ids))
