"""One-session A/B (optimization r14): dedup_segment_blocks,
text_bigram_lm_scores and text_backoff_lm_scores with vs without the
conditional rebalance of their narrow corpus input (the r14 change;
the 'old' variant monkeypatches rebalance_for_compute to identity,
which is exactly the r13 shape — the queries changed in no other
way).  Interleaved, noop sink, same session; output identity asserted
per query.

Outcome (plans/r14/AB_rebalance_rows.json): dedup_segment_blocks won
(0.759 -> 0.674 s) and keeps the rebalance; BOTH LM rows regressed
(+19% / +65% — the vocabulary-sized pair groupBy's map-side combine
emits up to 32 partials per key when the map side widens) and were
REVERTED to the unrebalanced shape, so for them old == new if re-run
against the final tree.

Usage: python scripts/ab_rebalance_rows.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAMES = (
    "dedup_segment_blocks",
    "text_bigram_lm_scores",
    "text_backoff_lm_scores",
)


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import parquet_to_sql_spark.operators.text as ot
    from parquet_to_sql_spark.queries.registry import all_queries
    from parquet_to_sql_spark.session import get_spark

    spark = get_spark(app_name="ab-rebalance-rows")
    qs = all_queries()
    real_rebalance = ot.rebalance_for_compute

    def build(name, variant):
        if variant == "old":
            ot.rebalance_for_compute = lambda df: df
        try:
            return qs[name].build(spark, sf_dir)
        finally:
            ot.rebalance_for_compute = real_rebalance

    out = {}
    for name in NAMES:
        a = {tuple(map(str, r)) for r in build(name, "old").collect()}
        b = {tuple(map(str, r)) for r in build(name, "new").collect()}
        assert a == b, f"{name}: variants disagree ({len(a ^ b)} rows)"
        spark.catalog.clearCache()
        for v in ("old", "new"):
            build(name, v).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
        samples = {"old": [], "new": []}
        for _ in range(reps):
            for v in samples:
                t0 = time.monotonic()
                build(name, v).write.format("noop").mode("overwrite").save()
                samples[v].append(round(time.monotonic() - t0, 3))
                spark.catalog.clearCache()

        def med(xs):
            s = sorted(xs)
            m = len(s) // 2
            return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

        out[name] = {
            v: {"median": round(med(xs), 3), "min": min(xs), "samples": xs}
            for v, xs in samples.items()
        }
        out[name]["identical_output"] = True
    out["loadavg"] = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps(out, indent=2))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
