"""Spark-vs-Spark invariance sweep: every registered query must return
the same result multiset when (a) the plan is rebuilt from scratch in
the same session, and (b) the physical execution changes underneath it
(shuffle partition count, AQE on/off).

The DuckDB oracle sweeps prove cross-engine agreement on ONE physical
configuration; this sweep targets the two failure classes the oracle
can't see arriving:

- **plan-build nondeterminism** — state captured at plan-build time
  varying between builds. The round-6 MinHash bug was exactly this: a
  signature lambda captured a Column instead of its bound seed, so the
  hash family changed per plan build and candidate sets flapped
  across sessions while any single session's oracle compare passed.
- **partition-count dependence** — order-dependent aggregation
  (first/collect_list without an order, non-commutative merges)
  returns different results at 3 shuffle partitions than at 32. The
  driver, the tests, and a production cluster all run different
  parallelism, so results must be a pure function of the data.
- **execution-path dependence (r8)** — whole-stage codegen vs the
  interpreted expression evaluator, and the vectorized vs row-based
  parquet decoder. Spark falls back to BOTH alternates on its own
  (codegen: method-size/field-count limits, codegen bugs; vectorized
  reader: complex types, schema evolution corners), so a query whose
  result depends on which path ran would flap at scale exactly where
  plans get big. Config C disables both and must match config A.

Approximate sketches (HLL, approx-percentile) are partition-invariant
by construction (register-wise-max / mergeable-summary merges), so no
query is exempted; a sketch query failing config B is a real finding.

Usage: python scripts/invariance_sweep.py [sf_dir]   (default sf0.001)
Exit non-zero on any mismatch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from etl_work_flow_for_big_data_spark.queries import load_all
    from etl_work_flow_for_big_data_spark.session import get_spark
    from parity import _canon

    spark = get_spark("invariance-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    # (label, runtime confs) — both are runtime-settable SQL confs, so
    # one session serves every configuration; conf A runs twice to
    # split plan-build nondeterminism from partition dependence.
    base = {
        "spark.sql.shuffle.partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
        "spark.sql.codegen.wholeStage": spark.conf.get("spark.sql.codegen.wholeStage"),
        "spark.sql.codegen.factoryMode": spark.conf.get("spark.sql.codegen.factoryMode"),
        "spark.sql.parquet.enableVectorizedReader": spark.conf.get(
            "spark.sql.parquet.enableVectorizedReader"),
    }
    skinny = {
        "spark.sql.shuffle.partitions": "3",
        "spark.sql.adaptive.enabled": "false",
    }
    interpreted = {
        # NO_CODEGEN forces the interpreted evaluator even for single
        # expressions (wholeStage=false alone still compiles leaf
        # expressions); the row-based parquet reader decodes each value
        # through a different code path than the vectorized batch one.
        "spark.sql.codegen.wholeStage": "false",
        "spark.sql.codegen.factoryMode": "NO_CODEGEN",
        "spark.sql.parquet.enableVectorizedReader": "false",
    }

    def run(name, confs):
        for k, v in confs.items():
            spark.conf.set(k, v)
        try:
            return _canon(registry[name].fn(spark, sf_dir).toArrow())
        finally:
            for k, v in base.items():
                spark.conf.set(k, v)

    failures = []
    for i, name in enumerate(registry):
        a1 = run(name, base)
        a2 = run(name, base)
        b = run(name, skinny)
        c = run(name, interpreted)
        if not a1.equals(a2):
            failures.append((name, "plan-rebuild nondeterminism"))
            print(f"{name}: FAIL rebuild determinism", flush=True)
        elif not a1.equals(b):
            diff = int((a1 != b).any(axis=1).sum()) if len(a1) == len(b) else -1
            failures.append((name, f"partition dependence ({len(a1)} vs {len(b)} rows, {diff} diff)"))
            print(f"{name}: FAIL partition invariance "
                  f"({len(a1)} vs {len(b)} rows)", flush=True)
        elif not a1.equals(c):
            diff = int((a1 != c).any(axis=1).sum()) if len(a1) == len(c) else -1
            failures.append((name, f"execution-path dependence ({len(a1)} vs {len(c)} rows, {diff} diff)"))
            print(f"{name}: FAIL codegen/reader invariance "
                  f"({len(a1)} vs {len(c)} rows)", flush=True)
        else:
            print(f"{i + 1:3d} {name}: ok", flush=True)
    print(f"\n{len(registry) - len(failures)}/{len(registry)} invariant", flush=True)
    if failures:
        for name, why in failures:
            print(f"  {name}: {why}")
        sys.exit(1)


if __name__ == "__main__":
    main()
