"""Dump `.explain("formatted")` for the r14-touched queries into
plans/r14/<name>_{before,after}.txt.  `--suffix before` is run from a
clone of the pre-optimization HEAD (45cab93), `--suffix after` from
this tree; sf0.001, 8 shuffle partitions (the PLANS.md convention)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAMES = (
    "dedup_minhash_dedup_apply",
    "dedup_minhash_production_audit",
    "dedup_simhash_hamming",
    "dedup_graph_triangles",
    "multimodal_ahash_neardup",
    "pipeline_mime_routing",
    "pipeline_crawl_ingest_e2e",
    "ev_rfm_segments",
    "profile_sequence_gaps",
    "simsearch_pq_adc_topk",
    "simsearch_ivfpq_adc_topk",
    "dedup_minhash_incremental_screen",
    "dedup_minhash_lsh",
    # session 3 (the *_before dumps for these two were generated
    # from the pre-change formulations inline, not from this script —
    # see the AB scripts; the _after dumps match this tree.
    # dedup_graph_triangles, listed above, was also re-touched in
    # session 3 and its _after dump regenerated):
    "text_bpe_encode",
    "dedup_segment_blocks",
)


def main() -> int:
    suffix = sys.argv[sys.argv.index("--suffix") + 1]
    out_dir = sys.argv[sys.argv.index("--out") + 1]
    from parquet_to_sql_spark.plans.bucketing import formatted_plan
    from parquet_to_sql_spark.queries.registry import all_queries
    from parquet_to_sql_spark.session import get_spark

    spark = get_spark(app_name=f"plans-r14-{suffix}", shuffle_partitions=8)
    qs = all_queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in NAMES:
        plan = formatted_plan(qs[name].build(spark, "/root/testdata/sf0.001"))
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, len(plan))
        spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
