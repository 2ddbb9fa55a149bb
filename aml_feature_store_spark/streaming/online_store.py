"""Online feature store: streaming sink + point-lookup surface
(SURVEY §2.1 S5/S6; reference Redis hash store,
flink_job/aml_stream_processor.py:203-221, api/main.py:327-363).

Spark-first: the online store is a **latest-value table** keyed by entity,
maintained by ``foreachBatch`` last-write-wins merge. With Delta/Iceberg
on the classpath this is ``MERGE INTO``; this environment has neither, so
the merge is emulated with read → anti-join → union → staged write →
directory swap on a parquet dir. The swap is two renames, so a crash can
interrupt it — every entry point first runs deterministic recovery
(roll back a half-swap from the well-known ``.old`` dir, drop orphan
``.staging.*`` dirs), under a single-writer assumption. TTL is a
read-time predicate on feature_timestamp, exactly the 24 h Redis EXPIRE
semantics.
"""

from __future__ import annotations

import glob
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

    @property
    def _old(self) -> str:
        # WELL-KNOWN previous-version name (not uuid-suffixed) so crash
        # recovery is deterministic: at most one .old can exist, and its
        # meaning is unambiguous from which paths are present.
        return f"{self.path}.old"

    def _recover(self) -> None:
        """Repair any interrupted swap (single-writer assumption — one
        streaming query owns the store). Cases:
        - path missing + .old present: a crash hit between the two swap
          renames — roll back to the previous version (the batch that was
          being merged will be replayed by the stream; last-write-wins
          merge makes the replay idempotent).
        - path + .old both present: crash after the swap, before cleanup
          — the swap completed, drop the previous version.
        - orphan .staging.* dirs: failed/interrupted staging writes —
          drop them."""
        if os.path.exists(self._old):
            if os.path.exists(self.path):
                shutil.rmtree(self._old)
            else:
                os.rename(self._old, self.path)
        for orphan in glob.glob(f"{self.path}.staging.*"):
            shutil.rmtree(orphan, ignore_errors=True)

    def merge(self, batch: DataFrame) -> None:
        """Last-write-wins upsert of a feature batch (the foreachBatch body)."""
        self._recover()
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
        try:
            merged.write.mode("overwrite").parquet(staging)
        except BaseException:
            shutil.rmtree(staging, ignore_errors=True)
            raise
        moved = False
        if os.path.exists(self.path):
            os.rename(self.path, self._old)
            moved = True
        try:
            os.rename(staging, self.path)
        except BaseException:
            # roll the previous version back so the store never vanishes
            if moved and not os.path.exists(self.path):
                os.rename(self._old, self.path)
            shutil.rmtree(staging, ignore_errors=True)
            raise
        if moved:
            shutil.rmtree(self._old, ignore_errors=True)

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
        self._recover()
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
