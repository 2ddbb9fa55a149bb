"""Generate a scaled-up events table for scaling benchmarks.

Usage: python tools/gen_scale.py [n_events] [out_dir]

Default: 1,000,000 events (10x the shipped sf0.1) into
/root/repo/.scale/sf1/events.parquet. bench.py picks the directory up via
$SPARK_GRAFT_SCALE_DIR (same default) and appends a "scale" section to
its JSON line when present.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1")
    )
    from aml_feature_store_spark.session import get_spark
    from aml_feature_store_spark.sources.generator import generate_events

    spark = get_spark("gen-scale")
    df = generate_events(spark, n=n, n_users=max(150, n * 15 // 1000))
    os.makedirs(out, exist_ok=True)
    df.coalesce(8).write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))
    print(f"wrote {n} events to {out}/events.parquet")


if __name__ == "__main__":
    main()
