"""Bucketed co-located join: zero Exchange in the physical plan."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from aml_feature_store_spark.sources import load_table
from aml_feature_store_spark.sources.bucketed import bucketed_join, write_bucketed


def test_bucketed_join_no_shuffle(spark, tmp_path):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    agg1 = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    agg2 = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(25,2)")).cast("double").alias("s")
    )
    write_bucketed(agg1, "b_left", "user_id", 8, path=str(tmp_path / "l"))
    write_bucketed(agg2, "b_right", "user_id", 8, path=str(tmp_path / "r"))
    # tiny tables would broadcast (also shuffle-free, but proves nothing);
    # disable broadcast so the SortMergeJoin path exercises the bucketing
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "b_left", "b_right", "user_id")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        import re

        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan
        assert "SortMergeJoin" in plan
        # result correctness
        assert j.count() == agg1.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")
