"""Empirical scaling sweep: run the headline queries at sf0.001 /
sf0.01 / sf0.1 (10x data per step) and report each query's runtime
growth on the top step — the measurement-side complement to the
static plan audit (the audit proves the plan SHAPE is scale-safe;
this proves the measured cost actually follows it at 100x fixture
range).

A query whose sf0.01 -> sf0.1 wall-clock ratio exceeds the flag
threshold is growing super-linearly past the noise floor — either a
plan regression the static gate can't see (e.g. a cached relation
spilling, a skewed key emerging in bigger data) or fixed costs no
longer dominating.  The 10x-data linear reference is ratio ~10; the
default flag threshold of 20 leaves 2x headroom for shuffle
constants and host noise.

Usage:
    python scripts/scale_sweep.py              # headline queries
    python scripts/scale_sweep.py dedup_ q1    # name substrings
    python scripts/scale_sweep.py --write      # also write SCALING.json
Exit code 1 if any query exceeds the flag threshold.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIRS = {
    "0.001": "/root/testdata/sf0.001",
    "0.01": "/root/testdata/sf0.01",
    "0.1": "/root/testdata/sf0.1",
}
FLAG_RATIO = 20.0  # top-step growth for 10x data; linear ~10
REPS = 3

_ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.json"
)


def median(xs: list[float]) -> float:
    s = sorted(xs)
    mid = len(s) // 2
    return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2


def main(argv: list[str]) -> int:
    from parquet_to_sql_spark.queries.registry import all_queries
    from parquet_to_sql_spark.session import get_spark

    write = "--write" in argv
    argv = [a for a in argv if a != "--write"]

    spark = get_spark()
    qs = all_queries()
    names = [
        n for n, q in sorted(qs.items())
        if (q.headline if not argv else any(a in n for a in argv))
    ]
    report: dict[str, dict] = {}
    flagged: list[str] = []
    for n in names:
        row: dict[str, float] = {}
        for sf, d in SF_DIRS.items():
            build = qs[n].build
            try:
                build(spark, d).collect()  # warm: JIT + codegen
                spark.catalog.clearCache()
                xs = []
                for _ in range(REPS):
                    t0 = time.monotonic()
                    build(spark, d).collect()
                    xs.append(time.monotonic() - t0)
                    spark.catalog.clearCache()
                row[sf] = round(median(xs), 3)
            except Exception as exc:
                print(f"{n:38s} ERROR at sf{sf}: {type(exc).__name__}")
                row[sf] = -1.0
        if row.get("0.01", -1) > 0 and row.get("0.1", -1) > 0:
            ratio = round(row["0.1"] / row["0.01"], 2)
        else:
            ratio = -1.0
        row["top_step_ratio"] = ratio
        report[n] = row
        flag = ""
        if ratio > FLAG_RATIO:
            flag = f" SUPER-LINEAR ({ratio}x for 10x data)!"
            flagged.append(n)
        elif ratio <= 0:
            # a query that ERRORS at any scale factor is the most
            # broken a scale gate can see — never a pass (r6 review)
            flag = " ERRORED!"
            flagged.append(n)
        print(
            f"{n:38s} {row['0.001']:7.3f} {row['0.01']:7.3f} "
            f"{row['0.1']:7.3f}  x{ratio}{flag}"
        )
    if write:
        with open(_ARTIFACT, "w") as f:
            json.dump(
                {"flag_ratio": FLAG_RATIO, "reps": REPS, "queries": report},
                f,
                indent=1,
            )
            f.write("\n")
        print(f"wrote {_ARTIFACT}")
    if flagged:
        print(f"\nSUPER-LINEAR growth past the flag threshold: {flagged}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
