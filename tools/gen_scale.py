"""Generate scaled-up tables for scaling benchmarks.

Usage: python tools/gen_scale.py [n_events] [out_dir] [--llm] [--hot]
       [--llm-only]

--skew makes user 0 own 25% of all events (the adversarial hot-key
anchor bench.py reads from .scale/skew).

--llm-only writes just the documents/embeddings tables sized from
n_events (for adding LLM anchors to a dir whose events already exist,
e.g. the 100x dir: `python tools/gen_scale.py 10000000 .scale/sf10
--llm-only` writes 500k docs / 200k embeddings).

--hot pins n_users=150 (the hot-key anchor bench.py reads from
.scale/hot: ~220-row 24h frames instead of ~2-row).

Default: 1,000,000 events (10x the shipped sf0.1) into
/root/repo/.scale/sf1/events.parquet; with --llm (default for the
standard out dir) also 10x documents (50k) and embeddings (20k) so the
LSH/IVF scale anchors get measured. bench.py picks the directory up via
$SPARK_GRAFT_SCALE_DIR (same default) and appends a "scale" section to
its JSON line when present; the LLM queries join that section when the
documents/embeddings files exist.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    n = int(args[0]) if args else 1_000_000
    default_out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale",
        "sf1",
    )
    out = args[1] if len(args) > 1 else default_out
    llm = "--llm" in flags or (out == default_out and "--no-llm" not in flags)
    from aml_feature_store_spark.session import get_spark
    from aml_feature_store_spark.sources.generator import (
        generate_documents,
        generate_embeddings,
        generate_events,
    )

    spark = get_spark("gen-scale")
    os.makedirs(out, exist_ok=True)
    if "--llm-only" in flags:
        llm = True
    else:
        n_users = 150 if "--hot" in flags else max(150, n * 15 // 1000)
        hot_frac = 0.25 if "--skew" in flags else 0.0
        df = generate_events(spark, n=n, n_users=n_users, hot_frac=hot_frac)
        df.coalesce(8).write.mode("overwrite").parquet(
            os.path.join(out, "events.parquet")
        )
        print(f"wrote {n} events to {out}/events.parquet")
    if llm:
        n_docs = max(500, n // 20)
        n_vecs = max(500, n // 50)
        # r8 LSH skew anchors: --dup-exact=F plants an exact-copy cluster
        # of F·n_docs (every band bucket holds F of the corpus);
        # --gray=F plants a sub-threshold near-clique (candidate blowup,
        # empty verified output). See generate_documents.
        exact_frac = gray_frac = 0.0
        for a in flags:
            if a.startswith("--dup-exact="):
                exact_frac = float(a.split("=", 1)[1])
            if a.startswith("--gray="):
                gray_frac = float(a.split("=", 1)[1])
        generate_documents(
            spark, n=n_docs, exact_dup_frac=exact_frac, gray_frac=gray_frac
        ).coalesce(4).write.mode("overwrite").parquet(
            os.path.join(out, "documents.parquet")
        )
        generate_embeddings(spark, n=n_vecs).coalesce(4).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, "embeddings.parquet"))
        print(f"wrote {n_docs} documents and {n_vecs} embeddings to {out}")


if __name__ == "__main__":
    main()
