"""Ad-hoc single-query profiler: time a registered query at a given dir
with the same noop-sink discipline bench.py uses (N warm + M timed).

Usage: python tools/profile_one.py <query> [dir] [repeats]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/sf10"
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    import __spark_entry__ as entry
    from aml_feature_store_spark.session import get_spark

    spark = get_spark("profile-one")
    qs = entry.queries()
    fn = qs[name]
    samples = []
    for i in range(repeats + 1):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        samples.append(round(dt, 3))
        print(("warm " if i == 0 else "timed") + f" {dt:.3f}s", flush=True)
    print(f"{name}: min={min(samples[1:]):.3f}s samples={samples}")


if __name__ == "__main__":
    main()
