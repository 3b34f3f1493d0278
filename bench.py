"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  The LAST stdout line is one compact JSON
summary (the driver captures only the final ~2 KB of output —
VERDICT r07 #2: the r7 line with inline per-query spreads outgrew
that capture and truncated):
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: median_sec, ...}, "reps": N, "sf": 0.1,
   "loadavg_start": [...], "loadavg_end": [...],
   "control": {"median": s, "spread": [lo, hi]}}
Per-query [min, max] spreads and raw samples are printed as an
EARLIER detail line and written to BENCH_DETAIL.json alongside.

Noise adjudication (VERDICT r07 #3): `loadavg_*` records external
host load at run boundaries, and `control` times a data-independent
fixed computation (spark.range sum — pure JVM work, no scan, no
shuffle of interest, untouched by any operator change) with the same
rep discipline; a control spread drifting between rounds proves host
wave, not regression, from the artifact alone.

Methodology (BASELINE.md): warm SparkSession, one warmup execution of
EVERY headline query (so one-time JVM JIT / codegen compilation is
excluded — round 3 change; rounds 1-2 warmed only one query, so their
per-query numbers carry ~0.5-3.5 s of first-execution compiler cost),
then $SPARK_GRAFT_BENCH_REPS (default 5) timed cold-cache .collect()
passes per headline query (build + execute + materialize; caches
cleared between queries).  Per-query value = MEDIAN across reps
(round-4 change: single-shot numbers showed ±20-35% run-to-run noise
— the q1/q5 'regressions' flagged in VERDICT r03); per-query
[min, max] spread is reported alongside so noise is visible instead
of argued about.  An import-path throughput probe (COPY text
rendering of lineitem, the reference's core workload) is included as
`import_render_lineitem`.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parquet_to_sql_spark.catalog import load_table  # noqa: E402
from parquet_to_sql_spark.normalize import copy_lines  # noqa: E402
from parquet_to_sql_spark.queries.registry import all_queries  # noqa: E402
from parquet_to_sql_spark.session import get_spark  # noqa: E402


def import_render_lineitem(spark, sf_dir):
    """Import-path stand-in: render every lineitem row to COPY text
    (the reference's whole job, minus the Postgres socket).

    REBALANCE-hinted before rendering: the fixture is a single row
    group, so without it the whole render runs in ONE task.  Round 3
    measured the shuffle as strictly slower; re-measured round 4 with
    7 reps the parallel render wins in isolation (median 1.98 s
    serial vs ~1.4 s) and ties within noise inside the bench loop —
    and a rebalance before a COPY-shaped write is the shape you want
    anyway (bounds per-writer batch size).  The HINT (not an explicit
    repartition(n)) keeps it AQE-managed: coalesced or split to the
    advisory partition size at any input scale instead of pinning a
    local-fixture width."""
    import pyspark.sql.functions as F

    return copy_lines(load_table(spark, sf_dir, "lineitem").hint("rebalance")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("line")).alias("total_bytes"),
    )


def multimodal_png_decode_throughput(spark, sf_dir):
    """Decode-throughput probe (VERDICT r09 "what's wrong" #2): the
    real media decoders are the only CPU-bound per-byte Python stages
    in the repo, so an unnoticed 10x regression would hide from the
    query-engine-shaped headliners.  Encodes + decodes 512 fixed
    128x128 RGB PNGs (~25 MB of pixels, filter type cycling over all
    five) inside mapInPandas — the same executor-side path as the
    gate query, at sizes where throughput, not per-asset overhead,
    dominates.  Fixed work independent of sf: this row tracks MB/s of
    the codec, not data scale."""
    from typing import Iterator

    import pandas as pd

    n_img, w, h = 512, 128, 128

    def enc_dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from parquet_to_sql_spark.operators.png import png_decode, png_encode

        for pdf in batches:
            ok = 0
            px_bytes = 0
            for i in pdf["id"]:
                i = int(i)
                base = np.arange(w * h * 3, dtype=np.uint32)
                px = ((base * 7 + i * 31) % 256).astype(np.uint8).tobytes()
                payload = png_encode(w, h, px, 3, filter_type=i % 5)
                _, _, _, out = png_decode(payload)
                ok += out == px
                px_bytes += len(out)
            yield pd.DataFrame({"ok": [ok], "px_bytes": [px_bytes]})

    import pyspark.sql.functions as F

    return (
        spark.range(0, n_img, 1, 32)
        .mapInPandas(enc_dec, schema="ok long, px_bytes long")
        .agg(F.sum("ok").alias("n_ok"), F.sum("px_bytes").alias("px_bytes"))
    )


def multimodal_jpeg_decode_throughput(spark, sf_dir):
    """JPEG twin of the PNG decode probe: encodes + decodes 256 fixed
    96x96 grayscale baseline JPEGs (~2.3 MB of pixels; entropy decode
    is the JPEG-side ceiling the way unfiltering is PNG's).  Fixed
    work independent of sf."""
    from typing import Iterator

    import pandas as pd

    n_img, w, h = 256, 96, 96

    def enc_dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from parquet_to_sql_spark.operators.jpeg import jpeg_decode, jpeg_encode

        for pdf in batches:
            ok = 0
            px_bytes = 0
            for i in pdf["id"]:
                i = int(i)
                base = np.arange(w * h, dtype=np.uint32)
                px = ((base // 64 * 11 + i * 31) % 256).astype(np.uint8).tobytes()
                payload = jpeg_encode(w, h, px, 1, quant=8)
                _, _, _, out = jpeg_decode(payload)
                ok += len(out) == len(px)
                px_bytes += len(out)
            yield pd.DataFrame({"ok": [ok], "px_bytes": [px_bytes]})

    import pyspark.sql.functions as F

    return (
        spark.range(0, n_img, 1, 32)
        .mapInPandas(enc_dec, schema="ok long, px_bytes long")
        .agg(F.sum("ok").alias("n_ok"), F.sum("px_bytes").alias("px_bytes"))
    )


def multimodal_jpeg_progressive_decode_throughput(spark, sf_dir):
    """Progressive (SOF2) twin of the JPEG decode probe: encodes +
    decodes 256 fixed 96x96 grayscale PROGRESSIVE JPEGs with the
    default spectral-selection + successive-approximation script (6
    scans for grayscale).  The progressive path decodes each scan
    through the canonical per-bit reader — inherently several passes
    over the coefficients versus baseline's single multi-symbol LUT
    pass — so this row pins its own honest (lower) MB/s rather than
    letting it hide behind the baseline row.  Fixed work independent
    of sf."""
    from typing import Iterator

    import pandas as pd

    n_img, w, h = 256, 96, 96

    def enc_dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from parquet_to_sql_spark.operators.jpeg import (
            jpeg_decode,
            jpeg_encode_progressive,
        )

        for pdf in batches:
            ok = 0
            px_bytes = 0
            for i in pdf["id"]:
                i = int(i)
                base = np.arange(w * h, dtype=np.uint32)
                px = ((base // 64 * 11 + i * 31) % 256).astype(np.uint8).tobytes()
                payload = jpeg_encode_progressive(w, h, px, 1, quant=8)
                _, _, _, out = jpeg_decode(payload)
                ok += len(out) == len(px)
                px_bytes += len(out)
            yield pd.DataFrame({"ok": [ok], "px_bytes": [px_bytes]})

    import pyspark.sql.functions as F

    return (
        spark.range(0, n_img, 1, 32)
        .mapInPandas(enc_dec, schema="ok long, px_bytes long")
        .agg(F.sum("ok").alias("n_ok"), F.sum("px_bytes").alias("px_bytes"))
    )


def multimodal_gif_decode_throughput(spark, sf_dir):
    """GIF twin of the decode probes (round 13): encodes + decodes
    256 fixed 128x128 256-color GIFs (~12.5 MB of decoded RGB
    pixels; LZW decompression is the GIF-side per-byte ceiling the
    way entropy decode is JPEG's).  Content is blocky-plus-noise so
    the LZW table exercises realistic growth/clear cycles rather
    than degenerate runs.  Fixed work independent of sf: this row
    tracks MB/s of the codec, not data scale."""
    from typing import Iterator

    import pandas as pd

    n_img, w, h = 256, 128, 128

    def enc_dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from parquet_to_sql_spark.operators.gif import gif_decode, gif_encode

        for pdf in batches:
            ok = 0
            px_bytes = 0
            for i in pdf["id"]:
                i = int(i)
                pal = [
                    bytes(((k * 7 + i) % 256, (k * 11) % 256, k))
                    for k in range(256)
                ]
                base = np.arange(w * h, dtype=np.uint32)
                idx = (
                    (base // 16 * 7 + (base * 131 + i * 31) % 8) % 256
                ).astype(np.uint8).tobytes()
                payload = gif_encode(w, h, idx, pal)
                _, _, _, out = gif_decode(payload)
                ok += len(out) == w * h * 3
                px_bytes += len(out)
            yield pd.DataFrame({"ok": [ok], "px_bytes": [px_bytes]})

    import pyspark.sql.functions as F

    return (
        spark.range(0, n_img, 1, 32)
        .mapInPandas(enc_dec, schema="ok long, px_bytes long")
        .agg(F.sum("ok").alias("n_ok"), F.sum("px_bytes").alias("px_bytes"))
    )


def multimodal_webp_lossless_decode_throughput(spark, sf_dir):
    """VP8L twin of the decode probes (round 13): encodes + decodes
    128 fixed 64x64 RGBA lossless WebPs (~2.1 MB of pixels) through
    the full container path.  VP8L reads up to four prefix symbols
    per pixel (green/red/blue/alpha), so its per-pixel cost is
    inherently above the single-symbol codecs — this row pins its
    own honest MB/s (root-table prefix decode, buffered bit reader)
    rather than hiding it behind the other rows.  Fixed work
    independent of sf."""
    from typing import Iterator

    import pandas as pd

    n_img, w, h = 128, 64, 64

    def enc_dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from parquet_to_sql_spark.operators.vp8l import (
            vp8l_encode,
            webp_decode,
            webp_wrap_vp8l,
        )

        for pdf in batches:
            ok = 0
            px_bytes = 0
            for i in pdf["id"]:
                i = int(i)
                base = np.arange(w * h * 4, dtype=np.uint32)
                px = ((base * 13 + i * 31) % 256).astype(np.uint8).tobytes()
                payload = webp_wrap_vp8l(
                    vp8l_encode(w, h, px, transforms=("subtract_green",))
                )
                _, _, _, out = webp_decode(payload)
                ok += out == px
                px_bytes += len(out)
            yield pd.DataFrame({"ok": [ok], "px_bytes": [px_bytes]})

    import pyspark.sql.functions as F

    return (
        spark.range(0, n_img, 1, 32)
        .mapInPandas(enc_dec, schema="ok long, px_bytes long")
        .agg(F.sum("ok").alias("n_ok"), F.sum("px_bytes").alias("px_bytes"))
    )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    # External-noise indicator: sampled BEFORE any Spark work, so it
    # reflects the host, not this benchmark's own 32-thread load
    # (sampling after warmup polluted the r8 closing run's value).
    loadavg_start = [round(x, 2) for x in os.getloadavg()]

    spark = get_spark(app_name="bench")
    headline = {n: q.build for n, q in sorted(all_queries().items()) if q.headline}
    headline["import_render_lineitem"] = import_render_lineitem
    headline["multimodal_png_decode_throughput"] = multimodal_png_decode_throughput
    headline["multimodal_jpeg_decode_throughput"] = multimodal_jpeg_decode_throughput
    headline["multimodal_gif_decode_throughput"] = multimodal_gif_decode_throughput
    headline["multimodal_webp_lossless_decode_throughput"] = (
        multimodal_webp_lossless_decode_throughput
    )
    headline["multimodal_jpeg_progressive_decode_throughput"] = (
        multimodal_jpeg_progressive_decode_throughput
    )

    # Layout twins: identical logical query over raw parquet vs tables
    # bucketed on the join key. Bucket materialization is load-time
    # work, so it happens here, OUTSIDE the timed loop.
    from parquet_to_sql_spark.catalog import load_table as _lt
    from parquet_to_sql_spark.plans.bucketing import (
        materialize_bucketed,
        order_revenue_join,
    )

    bucketed = materialize_bucketed(spark, sf_dir)
    headline["join_orderkey_shuffled"] = lambda s, d: order_revenue_join(
        _lt(s, d, "orders"), _lt(s, d, "lineitem")
    )
    headline["join_orderkey_bucketed"] = lambda s, d: order_revenue_join(
        s.table(bucketed["orders"]), s.table(bucketed["lineitem"])
    )

    # warmup: run EVERY headline query once — JVM JIT and whole-stage
    # codegen compilation are one-time session costs (measured ~3.5 s
    # for the higher-order-function-heavy dedup query alone) that a
    # long-lived cluster amortizes to zero; timing them measures the
    # compiler, not the plan.  Caches are cleared after each warmup so
    # the timed pass still pays every scan, shuffle, and fold.
    for build in headline.values():
        build(spark, sf_dir).collect()
        spark.catalog.clearCache()

    # Data-independent noise control: pure JVM range-sum, no table
    # scan, unaffected by any operator/plan change in this repo.
    # Timed with the same rep discipline so host waves show up in the
    # artifact itself.
    import pyspark.sql.functions as F

    def control(s):
        return s.range(0, 1 << 24, 1, 32).agg(F.sum("id").alias("s"))

    control(spark).collect()  # warmup, same as the headliners

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5")))
    samples: dict[str, list[float]] = {n: [] for n in headline}
    control_samples: list[float] = []
    for _ in range(reps):
        t0 = time.monotonic()
        control(spark).collect()
        control_samples.append(time.monotonic() - t0)
        for name, build in headline.items():
            t0 = time.monotonic()
            build(spark, sf_dir).collect()
            samples[name].append(time.monotonic() - t0)
            # operators may cache intermediates (e.g. the dedup shingle
            # relation); release between queries so a long bench loop
            # doesn't accumulate executor memory
            spark.catalog.clearCache()
    loadavg_end = [round(x, 2) for x in os.getloadavg()]

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2

    timings = {n: round(median(xs), 3) for n, xs in samples.items()}
    spread = {n: [round(min(xs), 3), round(max(xs), 3)] for n, xs in samples.items()}

    total = round(sum(timings.values()), 3)
    detail = {
        "metric": "headline_queries_detail",
        "spread": spread,
        "samples": {n: [round(x, 3) for x in xs] for n, xs in samples.items()},
        "control_samples": [round(x, 3) for x in control_samples],
        "loadavg_start": loadavg_start,
        "loadavg_end": loadavg_end,
        "reps": reps,
        "sf": sf,
    }
    summary = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "reps": reps,
        "sf": sf,
        "loadavg_start": loadavg_start,
        "loadavg_end": loadavg_end,
        "control": {
            "median": round(median(control_samples), 3),
            "spread": [
                round(min(control_samples), 3),
                round(max(control_samples), 3),
            ],
        },
    }
    # Sidecar keeps the full detail queryable even if stdout scrolls.
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=2)
    print(json.dumps(detail))
    # The summary MUST be the final line and stay well under the
    # driver's ~2 KB tail capture (currently ~1.3 KB at 29 queries).
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
