"""Scale evidence for the heavy dedup family (optimization r14,
VERDICT r13 'Next round' #3): the sf0.1 bench cannot demonstrate
parallel scaling (every fixed cost dominates; SCALING.json ratios sit
at ~1), so this sidecar measures the five heaviest dedup headline
queries on a 10x corpus at BOTH core counts and records the ratios.

The 10x corpus ("sf1-equivalent") is a pure deterministic function of
the read-only sf0.1 fixture: 10 vocabulary-disjoint shards, each
isomorphic to the sf0.1 documents corpus — shard c > 0 suffixes every
whitespace token with the shard digit (disjoint 31-bit hash spaces up
to negligible collisions) and offsets doc ids by c * N.  Per-document
statistics, near-dup cluster sizes and graph density per cluster are
PRESERVED; the number of clusters grows 10x, so total work scales
linearly — the honest "same corpus family, more of it" construction
(inflating cluster sizes instead would change the workload's
complexity class, not its scale).

No result caching anywhere: the corpus parquet is (re)written by this
script into a scratch dir, every timed run computes from that parquet
through the same registered query builders the bench uses, and caches
are cleared between reps.

Usage:
    python scripts/scale_evidence.py [--reps 3] [--out SCALE_EVIDENCE_r14.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = (
    "dedup_minhash_dedup_apply",
    "dedup_minhash_production_audit",
    "dedup_ngram_jaccard_hashed",
    "dedup_graph_triangles",
    "dedup_span_excision_apply",
    "dedup_repeated_spans",
)

SHARDS = 10  # overridden by --shards
SRC = "/root/testdata/sf0.1/documents.parquet"
SCRATCH = "/tmp/spark_graft_sf1_equiv"


def build_corpus() -> str:
    """Write the 10x corpus parquet; returns its directory."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(SRC)
    n = t.num_rows
    doc_id = t.column("doc_id").to_pylist()
    text = t.column("text").to_pylist()
    lang = t.column("lang").to_pylist()
    source = t.column("source").to_pylist()

    ids, txts, langs, srcs, nchars = [], [], [], [], []
    for c in range(SHARDS):
        for i in range(n):
            ids.append(doc_id[i] + c * n)
            if c == 0:
                s = text[i]
            else:
                # suffix every token with the shard digit: same token
                # count, same near-dup structure, disjoint hash space
                s = " ".join(w + str(c) for w in text[i].split(" "))
            txts.append(s)
            langs.append(lang[i])
            srcs.append(source[i])
            nchars.append(len(s))
    out = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(txts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(srcs, pa.string()),
            "n_chars": pa.array(nchars, pa.int64()),
        }
    )
    os.makedirs(SCRATCH, exist_ok=True)
    pq.write_table(out, os.path.join(SCRATCH, "documents.parquet"))
    return SCRATCH


def run_at(cpus: int, reps: int) -> dict:
    from pyspark.sql import SparkSession

    from parquet_to_sql_spark.session import RUNTIME_CONFS

    builder = (
        SparkSession.builder.appName(f"scale-evidence-{cpus}")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    from parquet_to_sql_spark.queries.registry import all_queries

    qs = all_queries()
    out: dict[str, dict] = {}
    for name in QUERIES:
        build = qs[name].build
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        build(spark, SCRATCH).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        xs = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"timed:{name}")
            t0 = time.monotonic()
            build(spark, SCRATCH).write.format("noop").mode("overwrite").save()
            xs.append(round(time.monotonic() - t0, 3))
            spark.catalog.clearCache()
        xs_sorted = sorted(xs)
        mid = len(xs_sorted) // 2
        med = (
            xs_sorted[mid]
            if len(xs_sorted) % 2
            else (xs_sorted[mid - 1] + xs_sorted[mid]) / 2
        )
        out[name] = {"median": round(med, 3), "min": xs_sorted[0], "samples": xs}
        print(f"  [{cpus} cores] {name}: median {med:.3f}s {xs}")
    spark.stop()
    return out


def main() -> int:
    global SHARDS, QUERIES
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="SCALE_EVIDENCE_r14.json")
    ap.add_argument("--shards", type=int, default=10)
    ap.add_argument("--queries", nargs="*", default=list(QUERIES))
    args = ap.parse_args()
    SHARDS = args.shards
    QUERIES = tuple(args.queries)

    print(f"building {SHARDS}x corpus ...")
    build_corpus()
    loadavg = [round(x, 2) for x in os.getloadavg()]
    res = {}
    for cpus in (32, 8):
        print(f"running at {cpus} cores ...")
        res[str(cpus)] = run_at(cpus, args.reps)
    ratios = {
        name: round(res["8"][name]["median"] / res["32"][name]["median"], 2)
        for name in QUERIES
    }
    artifact = {
        "what": (
            "heavy dedup headline queries on the deterministic "
            f"{SHARDS}x ({SHARDS} vocabulary-disjoint shards) expansion of the "
            "sf0.1 documents corpus, 8 vs 32 cores, noop sink, "
            f"{args.reps}-rep medians after warmup"
        ),
        "corpus": {
            "docs": SHARDS * 5000, "shards": SHARDS,
            "construction": "scripts/scale_evidence.py build_corpus (pure function of /root/testdata/sf0.1/documents.parquet)",
        },
        "loadavg_start": loadavg,
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "cores32": res["32"],
        "cores8": res["8"],
        "speedup_8c_over_32c": ratios,
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, args.out), "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact["speedup_8c_over_32c"], indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
