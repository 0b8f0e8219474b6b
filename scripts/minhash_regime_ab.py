"""dedup_minhash regime attribution (VERDICT r13 what's-wrong #1).

The r13 size gate re-enabled Catalyst's broadcast plan for the three
corpus joins in minhash_lsh_pairs when the parquet footer proves the
corpus dim-sized (sf0.1: 5,000 docs x 4,096 B priced = 20.5 MiB <=
32 MiB budget) — and the committed BENCH_r13 number went 1.46 s ->
7.02 s, the opposite of the r12 done-criterion ("recover r11 times"),
with no A/B attached. This script settles it the way every prior bench
dispute was settled (SCALE.md method): ONE session, a warm pass, then
N interleaved rounds of [control, bcast-regime, merge-regime,
dedup_ngram], lower-median per variant. Interleaving means transient
host load hits all variants alike; a regime that is genuinely slower
shows a ratio the control doesn't.

Variants measured (the ONLY difference is the corpus_rows argument the
size gate reads — same data, same session, same hash family):

- mh_bcast: corpus_rows = footer count -> gate clears at sf0.1 ->
  hints omitted -> Catalyst auto-broadcasts all three corpus joins
  (the committed r13 plan).
- mh_merge: corpus_rows = None -> gate pins every corpus join to
  sort-merge (the r12 plan).
- dedup_ngram: the registered query, unchanged — r13 showed 1.48x
  round-over-round drift on an untouched code path; re-measured here
  per the r14 work order.

x10 axis: scale_probe's decorrelated documents replication (translate
maps keep duplicate DENSITY constant, so the candidate volume grows
linearly like real data). At x10 the gate would pin merge (50k docs x
4 KiB = 205 MiB > budget); the probe FORCES each regime via
corpus_rows (footer-true value for merge, sentinel 1 for broadcast) to
measure whether the gate's cutoff points the right way — if broadcast
is already slower before it OOMs, the gate should flip well below the
memory cliff.

Usage: python scripts/minhash_regime_ab.py [out_json] [rounds]
Writes {sf01: {...}, x10: {...}} with per-variant med + samples.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/minhash_ab_r14.json"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from etl_work_flow_for_big_data_spark.catalog import (
        TABLES,
        load_table,
        table_row_count,
    )
    from etl_work_flow_for_big_data_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from etl_work_flow_for_big_data_spark.queries import load_all
    from etl_work_flow_for_big_data_spark.session import get_spark

    spark = get_spark("minhash-regime-ab")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    # identical warmups to bench.py / ab_attrib.py
    spark.range(1000).selectExpr("sum(id)").collect()
    for t in TABLES:
        _ = load_table(spark, sf_dir, t).schema

    def _ident(it):
        yield from it

    slots = spark.sparkContext.defaultParallelism
    spark.range(slots, numPartitions=slots).mapInPandas(
        _ident, "id long"
    ).write.mode("overwrite").format("noop").save()

    def _noop(df) -> float:
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    def probe(docs_dir: str, label: str, n_rounds: int = rounds) -> dict:
        n_docs = table_row_count(docs_dir, "documents")

        def mh(corpus_rows):
            d = load_table(spark, docs_dir, "documents")
            return minhash_lsh_pairs(
                d, "text", "doc_id", k=5, n_hashes=12, n_bands=4,
                threshold=0.5, corpus_rows=corpus_rows,
            )

        variants = {
            "control_topk": lambda: registry["topk"].fn(spark, sf_dir),
            # sentinel 1 clears the gate unconditionally -> broadcast
            "mh_bcast": lambda: mh(1),
            "mh_merge": lambda: mh(None),
            "dedup_ngram": lambda: registry["dedup_ngram"].fn(
                spark, sf_dir),
        }
        for fn in variants.values():  # warm pass, untimed
            _noop(fn())
        samples: dict[str, list[float]] = {n: [] for n in variants}
        for _ in range(n_rounds):
            for n, fn in variants.items():
                samples[n].append(_noop(fn()))
        med = {n: sorted(v)[(len(v) - 1) // 2] for n, v in samples.items()}
        rec = {
            "n_docs": n_docs,
            "med_sec": {n: round(m, 3) for n, m in med.items()},
            "samples_sec": {
                n: [round(x, 3) for x in v] for n, v in samples.items()
            },
            "bcast_over_merge": round(med["mh_bcast"] / med["mh_merge"], 2),
        }
        print(f"[{label}] {json.dumps(rec['med_sec'])} "
              f"bcast/merge={rec['bcast_over_merge']}", file=sys.stderr)
        return rec

    out = {"sf01": probe(sf_dir, "sf0.1")}

    # x10 decorrelated documents fixture (scale_probe derivation)
    os.environ["SPARK_GRAFT_PROBE_TABLES"] = "documents"
    from scripts.scale_probe import build_fixture

    x10_dir = "/tmp/minhash_ab_x10"
    build_fixture(spark, 10, x10_dir)
    out["x10"] = probe(x10_dir, "x10", n_rounds=max(3, rounds - 2))

    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
