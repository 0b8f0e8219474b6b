"""Deterministic trials of the seeded fuzz sweep as a regression net.

scripts/fuzz_parity.py samples random fixture shapes (the driver
regenerates every fixture between rounds, so this is the
round-boundary threat model). Two trials are pinned here:

- Seed 60001 (flat keys) exposed two real gate risks at round-6
  close: a zero-norm vector landing in an LSH bucket ANSI-crashed the
  pure-Catalyst cosine (vectors.py now try_divides, mirroring duck's
  natively-NULL double division), and multibyte names diverged
  byte-based duck levenshtein from codepoint-based Spark
  (text_editdist now pins the byte level). The NULLS FIRST pin on
  window_analytic's nullable date key came from the same sweep.
- Seed 70002 (zipf-skew keys, round 7): one hot key owns ~50% of
  events.user_id / orders.o_custkey / lineitem.l_orderkey rows — the
  key-DISTRIBUTION pathology the value sweeps can't reach. Pins
  result-invariance of the skew paths (AQE skew-join splits,
  salted_join's salt fan-out, window partitions funneling half a
  table) against the exact oracle.
- Seed 70026 (skew, round-7 extended sweep): generated a
  ``'\\xa0 \\r '`` document whose normalize mirror hashed as '' on
  duck (one-argument trim strips Unicode whitespace) but '\\xa0' on
  Spark (trim strips only 0x20) — dedup_exact/text_fingerprint
  diverged. The mirrors now pass duck's explicit trim set ``' '``;
  this seed keeps the NBSP-margin shape in the net. (The pinned
  seeds' shapes depend on the generator pools staying byte-stable —
  extend coverage via NEW mode flags or the adversarial corpus, not
  by mutating _CTRL/_WORDS.)
- Seed 70104 (skew + wide_ts, round 7): events.ts lives on a
  Dec-1969/Jan-1970 timeline (negative-epoch seconds through every
  window bucket division) and o_orderdate/l_shipdate draw the
  1901/2262 extremes (pandas ns-bound edges through the parity
  layer), on top of the hot-key skew — the swept 70101-70116 range
  was clean, and this trial keeps both modes composed in the net.
- Seed 80008 (skew + wide_ts + null_heavy, round 8): the density
  axis — 30-50% of EVERY nullable column NULL simultaneously (join
  keys, agg inputs, window order keys at once, see _nullify),
  composed with the hot-key and extreme-timestamp modes. Pins the
  COUNT-vs-COUNT(col) splits, null-key join drops, and mostly-NULL
  window order frames against the exact oracle; the 80001-80040
  sweep (20 null-heavy trials) ran clean.
- Seed 80096 (skew + wide_ts + null_heavy + tiny, round 8): the
  cardinality axis — every non-dim table independently truncated to
  0/1/2 rows (see _truncate) on top of the three other modes. Pins
  the empty-input behaviors the axis forced into the operators when
  it was introduced (rollup/cube/grouping-sets zero-rows-on-empty
  oracle pins, gapfill's NULL-bounds early return, profile_columns'
  COALESCE(SUM, 0) contract).
- Seed 80118 (skew + null_heavy, round-8 second matrix pass): the
  null-heavy draw shrank a join_range tier group to ONE lineitem whose
  l_extendedprice * rate product is exactly 150.855 — Spark's
  round(double, 2) rounds the double's SHORTEST DECIMAL REPR
  (BigDecimal.valueOf → HALF_UP: 150.86) while DuckDB rounds the
  binary value (just under .855: 150.85). Products of 2-dec columns
  are 4/6-dec fixed-point, so small-group product-sums can land on
  .xx5 even though the fixtures' own numerics are 2-dec. Fixed by
  routing every ROUND(SUM(product), 2) through integer-exact
  `rounded_sum` on both engines (functions/text.py); this seed keeps
  the 1-row-group boundary shape in the net.
- Seed 80112 (all five modes composed, round 8): adds the astral
  text axis — supplementary-plane splices (emoji, ZWJ sequences,
  regional-indicator pairs, math alphanumerics) in documents.text,
  events.event_type, customer.c_name (see _astralize). Pins
  codepoint-vs-byte alignment past the BMP: tokenization, shingle
  boundaries, UTF-8 hashing, regex over supplementary codepoints —
  under every other pathology at once.

- Seeds 90003/90008/90020 (round-9 bignum axis, see BIGNUM_TRIALS
  below): price columns magnified across the 2^52/2^63 fixed-point
  boundaries found the ANSI-long-overflow class — every TERM a legal
  long, but the SUM (seed 90008/90020, try_add) or the ·2 rescale
  (seed 90003, try_multiply) crossing 2^63, a loud task kill where
  DuckDB's HUGEINT widens. Fixed by decimal(38,0) accumulators in
  rounded_sum/rounded_mean; the pins sweep the rounded-aggregate
  family only (magnified plain double sums are inherently
  order-dependent — out of the parity contract by design).

- Seeds 90208/90308 (round-9 wave 11): the string-LENGTH axis
  (longtext — 1k-32k-char runs: single-char, alternating-pair,
  one-hot-shingle, multi-byte, digit, long word streams in
  documents.text / events.event_type / events.props) and the
  duplicate-DENSITY axis (dupstorm — ~40% of documents and ~30% of
  embeddings replicated as exact/near duplicates, ~20% of events as
  full-row duplicates), each composed with skew+widets+null. Both
  waves ran clean (8 trials × 85-86 oracles each); the pins hold the
  sampled extremes — Java-regex-vs-RE2 agreement on long subjects,
  shingle/minhash behavior at 10k+ shingles per doc, and dedup/rank
  determinism when duplicate clusters dominate.

- Seed 90604 (round-9 ragged axis, six modes composed): wrong-width
  embeddings (0/1/32/63/65/128-dim rows among the contract's 64, see
  _raggedize). The axis's manual debut found a SILENT divergence:
  the oracle's list-indexed dot computes a prefix cosine against a
  longer vector where the fixed-width kernel excludes the row
  (sim_pairs under-returned), and Spark's ANSI element_at dies on a
  short vector where DuckDB's NULL projection buckets it. Fixed by
  making width part of the cosine domain on BOTH sides
  (is_valid_embedding dim=64 / len(embedding) = 64, incl. the LSH
  signature CTEs); the 90601-90608 burn-in wave ran clean and this
  pin keeps the class composed with widets+null+astral+longtext.

Re-running the seeds keeps the fixed classes fixed; deeper
exploration stays in the script (more trials, any seed).
"""

from __future__ import annotations

import os
import random
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from fuzz_parity import gen_tables  # noqa: E402

# (seed, skew, wide_ts, null_heavy, tiny, astral, longtext, dupstorm,
#  ragged)
TRIALS = [
    (60001, False, False, False, False, False, False, False, False),
    (70002, True, False, False, False, False, False, False, False),
    (70026, True, False, False, False, False, False, False, False),
    (70104, True, True, False, False, False, False, False, False),
    (80008, True, True, True, False, False, False, False, False),
    (80096, True, True, True, True, False, False, False, False),
    (80112, True, True, True, True, True, False, False, False),
    (80118, True, False, True, False, False, False, False, False),
    # r9 wave 11 pins: the most-composed passing trial of each new
    # axis — longtext (1k-32k-char strings) and dupstorm (duplicate
    # clusters dominating the corpus), each under skew+widets+null.
    (90208, True, True, True, False, False, True, False, False),
    (90308, True, True, True, False, False, False, True, False),
    # r9 ragged pin: the six-axis composition from the burn-in wave —
    # wrong-width vectors (the axis that found the silent prefix-
    # cosine oracle divergence) under widets+null+astral+longtext.
    (90604, False, True, True, False, True, True, False, True),
]


@pytest.fixture(
    scope="module",
    params=TRIALS,
    ids=[
        f"seed{s}-{'skew' if k else 'flat'}{'-widets' if w else ''}"
        f"{'-null' if nh else ''}{'-tiny' if t else ''}{'-astral' if a else ''}"
        f"{'-longtext' if lt else ''}{'-dupstorm' if ds else ''}"
        f"{'-ragged' if rg else ''}"
        for s, k, w, nh, t, a, lt, ds, rg in TRIALS
    ],
)
def fuzz_trial(request, spark, tmp_path_factory):
    (seed, skew, wide_ts, null_heavy, tiny, astral, longtext, dupstorm,
     ragged) = request.param
    tmp = str(tmp_path_factory.mktemp(f"fuzz_{seed}"))
    tables = gen_tables(
        random.Random(seed), skew=skew, wide_ts=wide_ts,
        null_heavy=null_heavy, tiny=tiny, astral=astral,
        longtext=longtext, dupstorm=dupstorm, ragged=ragged,
    )
    con = duckdb.connect()
    for name, (rows, schema) in tables.items():
        (
            spark.createDataFrame(rows, schema)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(tmp, f"{name}.parquet"))
        )
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{tmp}/{name}.parquet/*.parquet')"
        )
    yield tmp, con
    con.close()


def _names():
    from etl_work_flow_for_big_data_spark.queries import load_all

    return sorted(load_all())


@pytest.mark.parametrize("name", _names())
def test_fuzz_trial_parity(name, spark, fuzz_trial):
    from etl_work_flow_for_big_data_spark.queries import load_all
    from tests.parity import compare

    fuzz_dir, fuzz_duck = fuzz_trial
    spec = load_all()[name]
    compare(spec.fn(spark, fuzz_dir), fuzz_duck.sql(spec.oracle))


# r9 bignum axis pins (seeds 90001+, _magnify): price columns scaled
# by a per-trial factor spanning the 2^52 half-add-guard and 2^63
# try_cast boundaries of the fixed-point rounded aggregates. The three
# pinned seeds are the ANSI-long-overflow finds from the 24-trial
# sweep — valid long TERMS whose decimal-width SUM/rescale killed the
# task under ANSI while DuckDB's HUGEINT widened (fixed by the
# decimal(38,0) accumulators in rounded_sum/rounded_mean). Only the
# rounded-aggregate family is swept: magnified values make PLAIN
# double sums order-dependent in their final ulps, an inherent-FP
# class both engines are entitled to (see _magnify's docstring).
BIGNUM_TRIALS = [
    (90003, False, True, False, False, False),
    (90008, True, True, True, False, False),
    (90020, True, True, False, False, True),
]

BIGNUM_QUERIES = [
    "rate_charge", "join_star", "join_range", "agg_groupby",
    "tpch_q3_shipping_priority", "tpch_q5_local_supplier_volume",
    "tpch_q10_returned_items",
]


@pytest.fixture(
    scope="module",
    params=BIGNUM_TRIALS,
    ids=[f"seed{s}-bignum" for s, *_ in BIGNUM_TRIALS],
)
def bignum_trial(request, spark, tmp_path_factory):
    seed, skew, wide_ts, null_heavy, tiny, astral = request.param
    tmp = str(tmp_path_factory.mktemp(f"bignum_{seed}"))
    tables = gen_tables(
        random.Random(seed), skew=skew, wide_ts=wide_ts,
        null_heavy=null_heavy, tiny=tiny, astral=astral, bignum=True,
    )
    con = duckdb.connect()
    for name, (rows, schema) in tables.items():
        (
            spark.createDataFrame(rows, schema)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(tmp, f"{name}.parquet"))
        )
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{tmp}/{name}.parquet/*.parquet')"
        )
    yield tmp, con
    con.close()


@pytest.mark.parametrize("name", BIGNUM_QUERIES)
def test_bignum_trial_parity(name, spark, bignum_trial):
    from etl_work_flow_for_big_data_spark.queries import load_all
    from tests.parity import compare

    fuzz_dir, fuzz_duck = bignum_trial
    spec = load_all()[name]
    compare(spec.fn(spark, fuzz_dir), fuzz_duck.sql(spec.oracle))


# r10 drift axis pin (seed 100002, write_drifted): the SHAPE axis —
# drifted tables are written as TWO-FILE parquet directories whose
# footers disagree (a column missing from one file, an id column
# INT32 in one file, fields reordered; see DRIFT_TARGETS). Its first
# wave found a real ORACLE nondeterminism, not an engine bug: under
# dupstorm's full-row duplicate events, window_session's
# gaps-and-islands SQL ordered its LAG pass and its cumulative-sum
# pass by the non-unique ts independently — over a multi-file scan
# DuckDB's tie order differed BETWEEN the passes run-to-run, splitting
# one session into two (31 vs 32 rows, flapping). Fixed by threading a
# ROW_NUMBER from the LAG pass into the cum-sum ORDER BY (a unique,
# pass-consistent key). The pin replays the find's exact layout
# (drift+dupstorm) over the whole registry.
# Per-pin FROZEN target dicts: each pin replays its wave's exact
# layout, and the drift draws continue the table rng in
# tables-iteration order — extending the live DRIFT_TARGETS after a
# pin (lineitem in r10, the dims+embeddings in r11) must not re-deal
# an earlier pin's pathologies.
_DRIFT_TARGETS_R10 = {
    "documents": {"droppable": ["source", "n_chars"],
                  "narrowable": ["doc_id"]},
    "events": {"droppable": ["props", "value"],
               "narrowable": ["event_id", "user_id"]},
    "orders": {"droppable": ["o_orderpriority", "o_orderstatus"],
               "narrowable": ["o_orderkey", "o_custkey"]},
}
# r11 extension wave (seeds 110001-110016, clean): customer/supplier/
# part/embeddings joined the targets. Seed 110001 is pinned because it
# composes drift with RAGGED — a drifted embeddings footer (INT32
# vec_id from an old writer, label missing from one file) whose rows
# carry wrong-width vectors, so the validity domain must hold across
# the schema seam. Targets frozen as of r11.
_DRIFT_TARGETS_R11 = dict(
    _DRIFT_TARGETS_R10,
    lineitem={"droppable": ["l_returnflag", "l_tax"],
              "narrowable": ["l_orderkey", "l_suppkey"]},
    customer={"droppable": ["c_mktsegment", "c_acctbal"],
              "narrowable": ["c_custkey"]},
    supplier={"droppable": ["s_acctbal"],
              "narrowable": ["s_suppkey"]},
    part={"droppable": ["p_type", "p_retailprice"],
          "narrowable": ["p_partkey"]},
    embeddings={"droppable": ["label"],
                "narrowable": ["vec_id"]},
)
DRIFT_TRIALS = [
    (100002, {"dupstorm": True}, _DRIFT_TARGETS_R10),
    (110001, {"wide_ts": True, "null_heavy": True, "longtext": True,
              "ragged": True}, _DRIFT_TARGETS_R11),
]


@pytest.fixture(
    scope="module",
    params=DRIFT_TRIALS,
    ids=[f"seed{s}-drift" for s, _, _ in DRIFT_TRIALS],
)
def drift_trial(request, spark, tmp_path_factory):
    from fuzz_parity import write_drifted

    seed, modes, DRIFT_TARGETS = request.param
    tmp = str(tmp_path_factory.mktemp(f"drift_{seed}"))
    rng = random.Random(seed)
    tables = gen_tables(rng, **modes)
    con = duckdb.connect()
    # same iteration order as the sweep's main(): the drift draws
    # continue the table rng, so order is part of the seed's identity
    for name, (rows, schema) in tables.items():
        dest = os.path.join(tmp, f"{name}.parquet")
        if name in DRIFT_TARGETS:
            write_drifted(spark, rows, schema, dest, DRIFT_TARGETS[name], rng)
        else:
            (
                spark.createDataFrame(rows, schema)
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(dest)
            )
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{tmp}/{name}.parquet/*.parquet', "
            f"union_by_name=true)"
        )
    yield tmp, con
    con.close()


@pytest.mark.parametrize("name", _names())
def test_drift_trial_parity(name, spark, drift_trial):
    from etl_work_flow_for_big_data_spark.queries import load_all
    from tests.parity import compare

    drift_dir, drift_duck = drift_trial
    spec = load_all()[name]
    compare(spec.fn(spark, drift_dir), drift_duck.sql(spec.oracle))
