"""Adversarial dup-graph probe for connected_components at volume.

The x16 curves in SCALE.md measure the operator on fixture-shaped dup
graphs (many small near-dup clusters — the realistic corpus shape).
The star-CC worst case is the opposite: ONE giant component holding
most of the corpus, shaped so min-label locality is useless — a long
shuffled-id chain (diameter = n, the shape that makes label
propagation O(n) rounds) whose middle node also roots a huge star fan
(the skew shape that funnels a single groupBy key), plus background
isolated pairs. This probe (VERDICT r9 next-round #5) generates that
"broom" graph at x1/x4/x16/x64 of the 10k-node baseline, runs the
default large-star/small-star algorithm, and records per size:

- rounds actually executed (via connected_components' stats param) —
  the O(log n) claim, checked directly: rounds must grow by ~constant
  per 4x size step, not multiply;
- wall seconds and the fitted tail exponent alpha;
- full-label correctness against a driver-side union-find oracle
  (exact, at every size — the probe is worthless if the fast
  convergence it measures is convergence to wrong labels).

Usage: python scripts/cc_probe.py [out_json] [sizes_csv]
Defaults: sizes 10000,40000,160000,640000 (~2-6 min on idle local[32]).
"""

from __future__ import annotations

import json
import math
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def broom_edges(n: int, rng: random.Random) -> list[tuple[int, int]]:
    """Chain over 50% of nodes, star fan of 40% rooted at the chain's
    middle, isolated pairs over the rest — ids globally shuffled so
    no labeling shortcut follows from id locality."""
    ids = list(range(n))
    rng.shuffle(ids)
    n_chain = n // 2
    edges = [(ids[i - 1], ids[i]) for i in range(1, n_chain)]
    center = ids[n_chain // 2]
    n_star = int(n * 0.4)
    edges += [(center, ids[j]) for j in range(n_chain, n_chain + n_star)]
    rest = ids[n_chain + n_star:]
    edges += list(zip(rest[::2], rest[1::2]))
    return edges


def union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cc_probe.json"
    sizes = ([int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2
             else [10_000, 40_000, 160_000, 640_000])

    from etl_work_flow_for_big_data_spark.operators.dedup import (
        connected_components,
    )
    from etl_work_flow_for_big_data_spark.session import get_spark

    spark = get_spark("cc-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    record: dict = {}
    prev = None
    for n in sizes:
        rng = random.Random(4242)
        edges = broom_edges(n, rng)
        pairs = spark.createDataFrame(edges, "d1 long, d2 long")
        stats: dict = {}
        t0 = time.perf_counter()
        labels = {
            r.id: r.component
            for r in connected_components(pairs, stats=stats).collect()
        }
        wall = time.perf_counter() - t0
        want = union_find(edges)
        assert labels == want, (
            f"n={n}: {sum(1 for k in want if labels.get(k) != want[k])} "
            f"mislabeled nodes"
        )
        entry = {"edges": len(edges), "rounds": stats["rounds"],
                 "wall_sec": round(wall, 2),
                 "log2_n": round(math.log2(n), 1)}
        if prev:
            entry["alpha_step"] = round(
                math.log(wall / prev[1]) / math.log(n / prev[0]), 2)
        record[str(n)] = entry
        prev = (n, wall)
        print(f"n={n}: rounds={stats['rounds']} wall={wall:.2f}s "
              f"(log2 n = {math.log2(n):.1f})", file=sys.stderr)
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
