"""Full-registry scaling-slope sweep: sf0.01 → sf0.1 → ~sf0.5
(VERDICT r11 #4).

scale_probe.py fits exponents for a curated headline subset at
x1..x8 of sf0.1; the judge asked for the COMPLETE registry measured
across three scale points with a per-query fitted slope, so silent
superlinearity can't hide in the untested tail. The ~sf0.5 point is a
scratch-dir derivation (scale_probe.build_fixture at factor 5 — the
seeded, decorrelated replica scheme: shifted keys, rotated text
classes, jittered vectors; /root/testdata is never written).

Per query and scale: noop-sink materialization like bench.py; queries
whose largest-scale first shot exceeds 0.8 s get lower-median-of-3 at
every scale (one-sided GC/page-cache noise — same rationale as
bench.py), others single-shot. Fitted:

- ``alpha``      = log(t_0.5/t_0.01) / log(50)  — full-range slope,
  overhead-contaminated at the small end (reported for context);
- ``alpha_tail`` = log(t_0.5/t_0.1) / log(5)    — the decision value:
  fixed job overhead has amortized, so this approximates the
  data-proportional exponent. ~1 = linear scale-out; >>1 = a blowup
  100× more data turns fatal.

Writes one JSON object to BENCH_SLOPES.json (repo root) unless an
output path is given; outliers + explanations land in SCALE.md.

Usage: python scripts/slope_sweep.py [out_json] [queries_csv]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SCALES = [
    (0.01, "/root/testdata/sf0.01"),
    (0.1, "/root/testdata/sf0.1"),
    (0.5, "/tmp/spark_graft_sf05"),  # derived: build_fixture(factor=5)
]


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_json = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        root, "BENCH_SLOPES.json")
    from scale_probe import build_fixture

    from etl_work_flow_for_big_data_spark.queries import load_all
    from etl_work_flow_for_big_data_spark.session import get_spark

    spark = get_spark("slope-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    queries = (sys.argv[2].split(",") if len(sys.argv) > 2
               else sorted(registry))

    build_fixture(spark, 5, SCALES[-1][1])

    # bench.py's warmups: JVM/codegen + Python worker pool
    spark.range(1000).selectExpr("sum(id)").collect()

    def _ident(it):
        yield from it

    slots = spark.sparkContext.defaultParallelism
    spark.range(slots, numPartitions=slots).mapInPandas(
        _ident, "id long").write.mode("overwrite").format("noop").save()

    def run(spec, sf_dir: str) -> float:
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    results: dict[str, dict] = {}
    for name in queries:
        spec = registry[name]
        row: dict = {}
        try:
            big_first = run(spec, SCALES[-1][1])
        except Exception as exc:  # noqa: BLE001 — isolation like bench.py
            results[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
            print(f"{name}: ERROR {results[name]['error']}", file=sys.stderr)
            continue
        heavy = big_first > 0.8
        for sf, d in SCALES:
            if sf == 0.5:
                shots = [big_first]
            else:
                shots = [run(spec, d)]
            if heavy:
                shots += [run(spec, d) for _ in range(2)]
            row[str(sf)] = round(sorted(shots)[0 if len(shots) == 1
                                               else (len(shots) - 1) // 2], 3)
        t001, t01, t05 = row["0.01"], row["0.1"], row["0.5"]
        row["alpha"] = round(
            math.log(max(t05, 1e-9) / max(t001, 1e-9)) / math.log(50), 2)
        row["alpha_tail"] = round(
            math.log(max(t05, 1e-9) / max(t01, 1e-9)) / math.log(5), 2)
        results[name] = row
        print(f"{name:28s} 0.01:{t001:6.2f}  0.1:{t01:6.2f}  "
              f"0.5:{t05:6.2f}  a={row['alpha']:5.2f}  "
              f"tail={row['alpha_tail']:5.2f}", flush=True)

    with open(out_json, "w") as f:
        json.dump({"metric": "scaling_slopes", "scales": [s for s, _ in SCALES],
                   "queries": results}, f, indent=1, sort_keys=True)
    print(f"written {out_json}", flush=True)


if __name__ == "__main__":
    main()
