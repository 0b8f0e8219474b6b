"""Same-session interleaved med-of-5 A/B attribution (SCALE.md method).

VERDICT r11 #1: five join-family queries read 2.2-5.1x their first
records on the driver's r11 bench with ZERO code change (the r11 diff
touches no relational/join query), while the builder's same-day
committed record read 1.0-1.3x — the signature of machine-day drift,
not regression. This script settles it the way every prior bench
dispute was settled (r8 sim-family, r10 rate_charge/window_session):
ONE session, a warm pass, then N interleaved rounds of
[control, suspect1, ..suspectK], lower-median per query. Interleaving
means any transient load hits control and suspects alike; a suspect
that is genuinely slower shows a ratio the control doesn't.

Per-query "first records" are re-derived from the committed history
(BENCH_r01 + every committed BENCH_LOCAL.json revision, earliest
appearance wins) so the comparison basis is reproducible, not
hand-copied.

Writes BENCH_AB.json (repo root) unless an output path is given;
bench.py attaches the committed record under "ab_attribution" so the
per-round BENCH_r{N} capture carries its own attribution evidence.

An optional git revision (3rd arg, or $SPARK_GRAFT_AB_REF) adds a
second basis: that revision's committed BENCH_LOCAL.json. The first
records can embed since-priced semantic changes (rate_charge's r9
decimal-rounding change costs ~0.37 s by design, SCALE.md), so the
last same-code builder-committed record is the basis that actually
answers "did this round regress anything".

Usage: python scripts/ab_attrib.py [out_json] [rounds] [ref_rev]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# default suspect set (the r11 dispute); override per-investigation
# with SPARK_GRAFT_AB_SUSPECTS=a,b,c — r13 runs it on the dedup family
# (dedup_apply 3.55×, dedup_passages 3.21× round-over-round, VERDICT
# r12 what's-wrong #2)
SUSPECTS = os.environ.get(
    "SPARK_GRAFT_AB_SUSPECTS",
    "join_range,join_semi,rate_charge,join_salted,join_left",
).split(",")
CONTROL = os.environ.get("SPARK_GRAFT_AB_CONTROL", "topk")
# stable, code-untouched for many rounds


def first_records() -> dict[str, float]:
    first: dict[str, float] = {}
    try:
        r1 = json.load(open(os.path.join(ROOT, "BENCH_r01.json")))
        first.update(r1["parsed"]["queries"])
    except Exception:  # noqa: BLE001 — history probe, best-effort
        pass
    shas = subprocess.run(
        ["git", "log", "--reverse", "--format=%H", "--follow", "--",
         "BENCH_LOCAL.json"],
        capture_output=True, text=True, cwd=ROOT,
    ).stdout.split()
    for sha in shas:
        try:
            txt = subprocess.run(
                ["git", "show", f"{sha}:BENCH_LOCAL.json"],
                capture_output=True, text=True, cwd=ROOT,
            ).stdout
            rec = json.loads(txt)
        except Exception:  # noqa: BLE001
            continue
        for k, v in rec.get("queries", {}).items():
            first.setdefault(k, v)
    return first


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "BENCH_AB.json")
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from etl_work_flow_for_big_data_spark.queries import load_all
    from etl_work_flow_for_big_data_spark.session import get_spark

    spark = get_spark("ab-attrib")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    # identical warmups to bench.py: JVM/codegen, parquet footers,
    # Python worker pool (the r9 cold-fork lesson)
    spark.range(1000).selectExpr("sum(id)").collect()
    from etl_work_flow_for_big_data_spark.catalog import TABLES, load_table

    for t in TABLES:
        _ = load_table(spark, sf_dir, t).schema

    def _ident(it):
        yield from it

    slots = spark.sparkContext.defaultParallelism
    spark.range(slots, numPartitions=slots).mapInPandas(
        _ident, "id long"
    ).write.mode("overwrite").format("noop").save()

    names = [CONTROL] + SUSPECTS

    def run(name: str) -> float:
        t0 = time.perf_counter()
        registry[name].fn(spark, sf_dir).write.mode("overwrite").format(
            "noop").save()
        return time.perf_counter() - t0

    for n in names:  # warm pass, untimed
        run(n)
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(rounds):
        for n in names:
            samples[n].append(run(n))

    med = {n: sorted(v)[(len(v) - 1) // 2] for n, v in samples.items()}
    first = first_records()
    ref_rev = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_AB_REF")
    ref: dict[str, float] = {}
    if ref_rev:
        try:
            ref = json.loads(subprocess.run(
                ["git", "show", f"{ref_rev}:BENCH_LOCAL.json"],
                capture_output=True, text=True, cwd=ROOT,
            ).stdout).get("queries", {})
        except Exception:  # noqa: BLE001 — missing rev: first-only
            ref = {}
    rec = {
        "metric": "ab_attribution",
        "sf_dir": sf_dir,
        "rounds": rounds,
        "control": CONTROL,
        "control_med_sec": round(med[CONTROL], 3),
        "control_vs_first": round(med[CONTROL] / first[CONTROL], 2)
        if first.get(CONTROL) else None,
        "queries": {},
    }
    if ref:
        rec["ref_rev"] = ref_rev
        rec["control_vs_ref"] = round(med[CONTROL] / ref[CONTROL], 2) \
            if ref.get(CONTROL) else None
    for n in SUSPECTS:
        ratio = round(med[n] / first[n], 2) if first.get(n) else None
        entry = {
            "med_sec": round(med[n], 3),
            "samples_sec": [round(x, 3) for x in samples[n]],
            "first_record_sec": first.get(n),
            "vs_first": ratio,
            # host drift moves control and suspect alike; a suspect
            # whose drift-normalized ratio stays <=1.3 has not moved
            "vs_first_drift_normalized": round(
                ratio / max(med[CONTROL] / first[CONTROL], 1e-9), 2)
            if ratio and first.get(CONTROL) else None,
        }
        if ref.get(n) and rec.get("control_vs_ref"):
            r = med[n] / ref[n]
            entry["vs_ref"] = round(r, 2)
            entry["vs_ref_drift_normalized"] = round(
                r / rec["control_vs_ref"], 2)
        rec["queries"][n] = entry
        print(f"{n}: {entry}", file=sys.stderr)
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
