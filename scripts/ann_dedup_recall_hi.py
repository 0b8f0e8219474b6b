"""ANN-dedup recall at the PRODUCTION operating point (VERDICT r13 #5).

The r13 recall record (docs/ann_dedup_recall_r13.json) measured the
multi-probe LIFT at the fixtures' own similarity tail (threshold 0.4,
where their max pair cos is ~0.51) — honest, but real corpus dedup
runs at cos >= ~0.9, where plane-agreement probability per pair is
much higher and the recall-vs-cost tradeoff looks different. This
probe plants SYNTHETIC near-duplicates with exactly controlled cosine
into the x16 decorrelated corpus and measures, per configuration of
the three knobs ann_near_dup_pairs exposes (n_planes, multi_probe,
n_tables):

- planted-pair recall overall and per cosine band (0.90 / 0.93 /
  0.96 / 0.99) — ground truth is the planted set, so no O(n²) exact
  pass is needed at probe scale;
- verified-candidate volume (threshold=-1 run: every candidate the
  bucket join emits survives, so its count IS the verify cost — the
  real cost driver at 100 TB);
- wall seconds (context only at this scale).

Planting: for each sampled base vector v, pick a deterministic random
unit r (seeded rng), orthogonalize u = norm(r - (r.w)w) against
w = v/|v|, emit v' = |v|(cos t . w + sin t . u) — cos(v, v') = cos t
EXACTLY, so each planted pair's similarity is chosen, not sampled.
Planted ids are base_id + 10^14 (collision-free with the replica
shift of 10^10 per replica).

Theory check the numbers should land near: per-table plane agreement
for a pair at angle t is s = (1 - t/pi); P[caught] =
  single:      s^p
  multi-probe: s^p + p s^(p-1)(1-s)
  L tables:    1 - (1 - s^p)^L
At cos 0.9 (t=0.451 rad): s=0.856, p=8 -> single 0.29, h1 0.68,
L=2 0.50, L=4 0.75; at cos 0.99: single 0.77 (p=8).

Usage: python scripts/ann_dedup_recall_hi.py [out_json] [factor]
Default factor 16 (~32k corpus + 2,000 planted rows).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

N_PLANT = 2000
PLANT_SHIFT = 10**14
COS_BANDS = [0.90, 0.93, 0.96, 0.99]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ann_dedup_recall_hi.json"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    os.environ.setdefault("SPARK_GRAFT_PROBE_TABLES", "embeddings")
    from scale_probe import build_fixture  # noqa: E402

    from etl_work_flow_for_big_data_spark.functions.vectors import (
        is_valid_embedding,
    )
    from etl_work_flow_for_big_data_spark.operators.similarity import (
        ann_near_dup_pairs,
    )
    from etl_work_flow_for_big_data_spark.session import get_spark

    spark = get_spark("ann-dedup-recall-hi")
    spark.sparkContext.setLogLevel("ERROR")
    fix_dir = f"/tmp/spark_graft_scale_x{factor}"
    build_fixture(spark, factor, fix_dir)

    corpus = (
        spark.read.parquet(os.path.join(fix_dir, "embeddings.parquet"))
        .filter(is_valid_embedding(F.col("embedding"), dim=64))
        .select("vec_id", "embedding")
    )

    # deterministic spread of base vectors across replicas
    spread = ((F.col("vec_id") % 100_003) * 2654435761) % 9973
    bases = (corpus.orderBy(spread, "vec_id").limit(N_PLANT)
             .collect())

    rng = np.random.default_rng(140514)
    planted_rows = []
    truth: dict[tuple[int, int], float] = {}
    for i, row in enumerate(bases):
        v = np.asarray(row.embedding, dtype=np.float64)
        nv = np.linalg.norm(v)
        w = v / nv
        r = rng.standard_normal(64)
        u = r - (r @ w) * w
        u /= np.linalg.norm(u)
        c = COS_BANDS[i % len(COS_BANDS)]
        t = math.acos(c)
        vp = nv * (math.cos(t) * w + math.sin(t) * u)
        pid = row.vec_id + PLANT_SHIFT
        planted_rows.append((pid, [float(x) for x in vp]))
        lo, hi = sorted((row.vec_id, pid))
        truth[(lo, hi)] = c
    planted = spark.createDataFrame(
        planted_rows, "vec_id long, embedding array<float>")
    df = corpus.unionByName(planted).cache()
    n = df.count()

    record: dict = {
        "corpus_vectors": n, "n_planted": len(truth), "factor": factor,
        "cos_bands": COS_BANDS, "configs": [],
    }
    planted_ids = {p for p, _ in truth} | {q for _, q in truth}

    configs = []
    for n_planes in (8, 12, 16):
        configs.append(dict(n_planes=n_planes))
        configs.append(dict(n_planes=n_planes, multi_probe=True))
        configs.append(dict(n_planes=n_planes, n_tables=2))
        configs.append(dict(n_planes=n_planes, n_tables=4))
    configs.append(dict(n_planes=12, multi_probe=True, n_tables=2))

    for kw in configs:
        t0 = time.perf_counter()
        res = ann_near_dup_pairs(
            df, "vec_id", "embedding", threshold=0.9, dim=64,
            corpus_rows=n, **kw,
        )
        # planted ids are the only ones >= PLANT_SHIFT — a range
        # predicate, not a 4,000-literal In list
        got = {
            (r.d1, r.d2)
            for r in res.filter(
                (F.col("d1") >= PLANT_SHIFT) | (F.col("d2") >= PLANT_SHIFT)
            ).collect()
        }
        wall = time.perf_counter() - t0
        found = {p for p in truth if p in got}
        per_band = {}
        for c in COS_BANDS:
            band = [p for p, bc in truth.items() if bc == c]
            per_band[str(c)] = round(
                sum(p in found for p in band) / len(band), 3)
        # verify-cost proxy: candidate volume = the same join at
        # threshold -1 (every bucket-candidate survives the filter)
        n_cand = ann_near_dup_pairs(
            df, "vec_id", "embedding", threshold=-1.0, dim=64,
            corpus_rows=n, **kw,
        ).count()
        entry = {
            **{k: kw.get(k) for k in ("n_planes", "multi_probe", "n_tables")},
            "recall_overall": round(len(found) / len(truth), 3),
            "recall_by_cos": per_band,
            "cand_pairs": n_cand,
            "wall_sec": round(wall, 2),
        }
        record["configs"].append(entry)
        print(entry, file=sys.stderr)

    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
