"""Property-style invariants for the dedup family (I1/I2) — relations
that must hold for ANY corpus, pinned on deterministic generated docs
plus targeted edge shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_work_flow_for_big_data_spark.operators.dedup import (
    apply_near_dedup,
    dedup_exact,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)

def _doc(i: int, n: int = 12) -> str:
    # token-disjoint across docs: no accidental cross-doc shingles
    return " ".join(f"t{i}x{j}" for j in range(n))


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, _doc(i)) for i in range(20)]
    # exact duplicates of docs 0 and 1
    rows += [(100, _doc(0)), (101, _doc(1))]
    # a near-duplicate of doc 2: same first 10 tokens, different tail
    # (6 of 8 shingles shared -> jaccard 0.6)
    rows += [(102, _doc(2, n=10) + " omega psi")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_round4_ratio_is_exact_at_half_boundaries(spark):
    """Integer-exact HALF_UP rounding of a ratio to 4 decimals,
    including exactly-half cases where double ROUND diverges between
    engines (e.g. 67/160 = 0.41875 → 0.4188; double(0.41875) is a
    hair below half and Spark's F.round gives 0.4187). Cross-checked
    against DuckDB's mirror fragment on the same (num, den) pairs."""
    import duckdb
    from decimal import ROUND_HALF_UP, Decimal

    from etl_work_flow_for_big_data_spark.functions.text import round4_ratio

    cases = [(67, 160), (1, 3), (4999, 9999), (1, 20000), (3, 20000), (5, 8), (7, 7)]
    df = spark.createDataFrame(cases, "num long, den long")
    got = {
        (r["num"], r["den"]): r["q"]
        for r in df.select(
            "num", "den", round4_ratio(F.col("num"), F.col("den")).alias("q")
        ).collect()
    }
    con = duckdb.connect()
    for num, den in cases:
        want = float(
            (Decimal(num) / Decimal(den)).quantize(
                Decimal("0.0001"), rounding=ROUND_HALF_UP
            )
        )
        assert got[(num, den)] == want, (num, den)
        duck = con.sql(
            f"SELECT ((20000*{num} + {den}) // (2*{den})) / 10000.0"
        ).fetchone()[0]
        assert duck == want, (num, den)


def test_round4_ratio_property_matches_decimal(spark):
    """Hypothesis sweep: round4_ratio == Decimal HALF_UP for arbitrary
    integer ratios across the realistic magnitude range (counts up to
    ~1e7 tokens/shingles per doc), and the DuckDB mirror agrees."""
    from decimal import ROUND_HALF_UP, Decimal

    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from etl_work_flow_for_big_data_spark.functions.text import round4_ratio

    pairs = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000_000),
            st.integers(min_value=1, max_value=10_000_000),
        ),
        min_size=1,
        max_size=50,
    )

    con = duckdb.connect()

    @settings(max_examples=20, deadline=None)
    @given(pairs)
    def check(cases):
        df = spark.createDataFrame(cases, "num long, den long")
        got = {
            (r["num"], r["den"]): r["q"]
            for r in df.select(
                "num", "den", round4_ratio(F.col("num"), F.col("den")).alias("q")
            ).collect()
        }
        # BIGINT casts mirror the real oracles, where num/den come from
        # len()/COUNT(*) (already BIGINT) — bare VALUES literals type
        # as INT32 and 20000*num would overflow
        vals = ", ".join(f"({n}::BIGINT, {d}::BIGINT)" for n, d in cases)
        duck = {
            (n, d): q
            for n, d, q in con.sql(
                f"SELECT num, den, ((20000*num + den) // (2*den)) / 10000.0 "
                f"FROM (VALUES {vals}) AS t(num, den)"
            ).fetchall()
        }
        for n, d in cases:
            want = float(
                (Decimal(n) / Decimal(d)).quantize(
                    Decimal("0.0001"), rounding=ROUND_HALF_UP
                )
            )
            assert got[(n, d)] == want == duck[(n, d)], (n, d)

    check()


def test_minhash_signature_matches_documented_formula(spark):
    """Pin the signature to the EXACT documented hash family: word
    i%8 of md5((i//8) + '#' + shingle), min over the shingle set —
    recomputed here with hashlib. Regression for the pyspark lambda
    trap: a transform lambda with a bound-default second parameter
    (``lambda s, _seed=seed:``) silently receives the element INDEX
    Column instead of the default, turning the seed prefix into the
    Column's repr and the hash family into a per-plan-build artifact
    (cross-engine AND cross-session divergent; caught by the sf0.1
    oracle sweep in round 6)."""
    import hashlib

    from etl_work_flow_for_big_data_spark.functions.text import (
        minhash_signature,
        shingles,
    )

    df = spark.createDataFrame(
        [("alpha beta gamma delta epsilon zeta eta theta",)], "text string"
    )
    row = (
        df.select(shingles(F.col("text"), 5).alias("sh"))
        .select(F.col("sh"), minhash_signature(F.col("sh"), 12).alias("sig"))
        .collect()[0]
    )
    expect = [
        min(
            hashlib.md5(f"{i // 8}#{s}".encode()).hexdigest()[
                (i % 8) * 4 : (i % 8) * 4 + 4
            ]
            for s in row["sh"]
        )
        for i in range(12)
    ]
    assert row["sig"] == expect


def test_exact_duplicates_always_pair(corpus):
    """Identical text ⇒ identical shingle sets ⇒ jaccard 1.0 pair in
    BOTH the exact n-gram path and the MinHash-LSH path (identical
    signatures collide in every band)."""
    for fn in (ngram_jaccard_pairs, minhash_lsh_pairs):
        pairs = {
            (r["d1"], r["d2"]): r["jaccard"]
            for r in fn(corpus, "text", "doc_id", k=5, threshold=0.5).collect()
        }
        assert pairs[(0, 100)] == 1.0, fn.__name__
        assert pairs[(1, 101)] == 1.0, fn.__name__


def test_minhash_candidates_subset_of_exact(corpus):
    """LSH pairs are a SUBSET of the exact-Jaccard pairs at the same
    threshold (banding can miss candidates, never invent them — the
    verify step guarantees it)."""
    exact = {
        (r["d1"], r["d2"])
        for r in ngram_jaccard_pairs(
            corpus, "text", "doc_id", k=5, threshold=0.5
        ).collect()
    }
    lsh = {
        (r["d1"], r["d2"])
        for r in minhash_lsh_pairs(
            corpus, "text", "doc_id", k=5, threshold=0.5
        ).collect()
    }
    assert lsh <= exact
    assert (0, 100) in lsh  # and it's not trivially empty


def test_apply_near_dedup_idempotent(corpus):
    """Applying the same pair set twice changes nothing the second
    time, and keepers (min ids) always survive."""
    pairs = ngram_jaccard_pairs(corpus, "text", "doc_id", k=5, threshold=0.5)
    once = apply_near_dedup(corpus, pairs, "doc_id")
    twice = apply_near_dedup(once, pairs, "doc_id")
    ids_once = sorted(r["doc_id"] for r in once.collect())
    ids_twice = sorted(r["doc_id"] for r in twice.collect())
    assert ids_once == ids_twice
    assert 0 in ids_once and 1 in ids_once  # min-id keepers survive
    assert 100 not in ids_once and 101 not in ids_once


def test_dedup_exact_partitions_corpus(corpus):
    """Every doc belongs to exactly one digest group; group sizes sum
    to the corpus size; keeper is the min id of its group."""
    groups = dedup_exact(corpus, "text", "doc_id").collect()
    assert sum(r["n_copies"] for r in groups) == corpus.count()
    by_keeper = {r["keeper_id"]: r["n_copies"] for r in groups}
    assert by_keeper[0] == 2 and by_keeper[1] == 2  # dup pairs
    assert 100 not in by_keeper and 101 not in by_keeper


def test_split_assign_is_total_and_deterministic(spark, sf_dir):
    """Every doc gets exactly one split; assignment is a pure function
    of the id (stable across runs and partitionings)."""
    from etl_work_flow_for_big_data_spark.queries import load_all

    q = load_all()["split_assign"].fn
    a = {r["doc_id"]: r["split"] for r in q(spark, sf_dir).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in q(spark, sf_dir).repartition(7).collect()
    }
    assert a == b
    counts = {}
    for s in a.values():
        counts[s] = counts.get(s, 0) + 1
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > counts.get("val", 0)


def test_fetch_url_without_host_raises():
    from etl_work_flow_for_big_data_spark.sources.registry import DEFAULT

    with pytest.raises(ValueError, match="host"):
        DEFAULT.fetch("ftp", "ftp:///no-host-here", "/tmp/x")


def _brute_force_pairs(rows, k, threshold, max_df=None):
    """Pure-Python reference for ngram_jaccard_pairs semantics."""
    sh = {}
    for i, text in rows:
        toks = [t for t in text.split(" ") if t]
        sh[i] = {
            " ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)
        }
    if max_df is not None:
        from collections import Counter

        df_counts = Counter(s for ss in sh.values() for s in ss)
        sh = {i: {s for s in ss if df_counts[s] <= max_df} for i, ss in sh.items()}
    out = {}
    ids = sorted(sh)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if union and round(inter / union, 4) >= threshold:
                out[(a, b)] = round(inter / union, 4)
    return out


def test_both_strategies_match_brute_force(spark):
    """The bounded (posting-list) and unbounded (self-join) pair
    strategies both reproduce the brute-force set-Jaccard reference on
    a corpus mixing boilerplate (hot shingles), near-dups, exact dups,
    and sub-k-token shorts."""
    boiler = "the quick brown fox jumps"  # shared 5-gram boilerplate
    rows = [
        (1, boiler + " alpha beta gamma delta"),
        (2, boiler + " alpha beta gamma delta"),      # exact dup of 1
        (3, boiler + " alpha beta gamma EPSILON"),    # near-dup of 1
        (4, boiler + " zeta eta theta iota"),
        (5, boiler + " kappa lambda mu nu"),
        (6, "wholly unrelated words that still span five tokens here"),
        (7, "too short"),                              # < k tokens: no shingles
        (8, boiler),                                   # boilerplate only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for max_df in (None, 3):
        want = _brute_force_pairs(rows, k=5, threshold=0.3, max_df=max_df)
        got = {
            (r["d1"], r["d2"]): r["jaccard"]
            for r in ngram_jaccard_pairs(
                df, "text", "doc_id", k=5, threshold=0.3, max_df=max_df
            ).collect()
        }
        assert got == want, f"max_df={max_df}"


@pytest.mark.parametrize("out_dec", [2, 4])
def test_rounded_mean_property_matches_decimal(spark, out_dec):
    """Hypothesis sweep: rounded_mean == Decimal HALF-away-from-zero of
    the exact cents mean, for signed 2-dec inputs over small groups
    (the shape where ROUND(AVG(..), d) hits exact half boundaries —
    fuzz seed 61016: a 2-row group averaging -5739.725), and the
    DuckDB mirror agrees cell-for-cell. The mirror SQL is built by
    the PRODUCTION ``_duck_round_avg`` — not a hand-inlined copy —
    so the three-way contract (Spark expr, duck mirror, Decimal
    ground truth) is pinned for both deployed scales (out_dec=2 for
    price columns, 4 for avg_disc)."""
    from decimal import ROUND_HALF_UP, Decimal

    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from etl_work_flow_for_big_data_spark.functions.text import rounded_mean
    from etl_work_flow_for_big_data_spark.queries.relational import _duck_round_avg

    groups = st.lists(
        st.lists(
            st.integers(min_value=-10_000_000, max_value=10_000_000),  # cents
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=8,
    )

    con = duckdb.connect()
    quantum = Decimal(1).scaleb(-out_dec)

    @settings(max_examples=15, deadline=None)
    @given(groups)
    def check(cents_groups):
        rows = [
            (gi, c / 100.0) for gi, grp in enumerate(cents_groups) for c in grp
        ]
        df = spark.createDataFrame(rows, "g int, x double")
        got = {
            r["g"]: r["m"]
            for r in df.groupBy("g")
            .agg(rounded_mean(F.col("x"), out_dec).alias("m"))
            .collect()
        }
        vals = ", ".join(f"({g}, {x!r}::DOUBLE)" for g, x in rows)
        duck = {
            g: m
            for g, m in con.sql(
                f"SELECT g, {_duck_round_avg('x', out_dec)}"
                f" FROM (VALUES {vals}) AS t(g, x) GROUP BY g"
            ).fetchall()
        }
        for gi, grp in enumerate(cents_groups):
            total = sum(grp)
            exact = Decimal(total) / Decimal(100 * len(grp))
            # HALF_UP on |value|, sign reapplied = half away from zero,
            # which is what BOTH engines do for negative halves
            want = float(
                (abs(exact)).quantize(quantum, rounding=ROUND_HALF_UP)
            ) * (1 if total >= 0 else -1) + 0.0
            assert got[gi] == want, (gi, grp, got[gi], want)
            assert duck[gi] == want, (gi, grp, duck[gi], want)

    check()


def test_rounded_sum_property_matches_decimal(spark):
    """Hypothesis sweep: rounded_sum == Decimal HALF-away-from-zero of
    the exact micros sum, for signed 6-dec inputs (the product scale
    the rating queries manufacture: price × (1−disc) × (1+tax)), and
    the DuckDB mirror (production ``_duck_round_sum``) agrees
    cell-for-cell. Small groups land exactly on .xx5 boundaries (fuzz
    seed 80118's class); micros drawn as integers so the Decimal
    ground truth is exact."""
    from decimal import ROUND_HALF_UP, Decimal

    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from etl_work_flow_for_big_data_spark.functions.text import rounded_sum
    from etl_work_flow_for_big_data_spark.queries.relational import _duck_round_sum

    groups = st.lists(
        st.lists(
            st.integers(min_value=-10**12, max_value=10**12),  # micros
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=8,
    )

    con = duckdb.connect()
    quantum = Decimal("0.01")

    @settings(max_examples=15, deadline=None)
    @given(groups)
    def check(micros_groups):
        rows = [
            (gi, m / 1e6) for gi, grp in enumerate(micros_groups) for m in grp
        ]
        df = spark.createDataFrame(rows, "g int, x double")
        got = {
            r["g"]: r["s"]
            for r in df.groupBy("g")
            .agg(rounded_sum(F.col("x"), 6).alias("s"))
            .collect()
        }
        vals = ", ".join(f"({g}, {x!r}::DOUBLE)" for g, x in rows)
        duck = {
            g: s
            for g, s in con.sql(
                f"SELECT g, {_duck_round_sum('x', 6)}"
                f" FROM (VALUES {vals}) AS t(g, x) GROUP BY g"
            ).fetchall()
        }
        for gi, grp in enumerate(micros_groups):
            total = sum(grp)
            exact = Decimal(total).scaleb(-6)
            want = float(
                abs(exact).quantize(quantum, rounding=ROUND_HALF_UP)
            ) * (1 if total >= 0 else -1) + 0.0
            assert got[gi] == want, (gi, grp, got[gi], want)
            assert duck[gi] == want, (gi, grp, duck[gi], want)

    check()


def test_rounded_sum_large_group_no_drift(spark):
    """The r8-judge drift finding: summing doubles BEFORE rounding
    accumulates ~ulp·√n random-walk error (~10-100 scaled units on
    150k-row groups at in_dec=6), so a large group whose true 6-dec
    sum lands exactly on a .xx5 boundary could round either way
    depending on drift direction. Per-term long summation (r9 fix)
    is drift-free at any group size — pin a 150k-row group whose
    tail term is chosen so the exact micros sum ≡ 5000 (mod 10000),
    i.e. exactly on the half boundary at out_dec=2, and assert the
    Decimal half-away-from-zero answer."""
    from decimal import ROUND_HALF_UP, Decimal

    from etl_work_flow_for_big_data_spark.functions.text import rounded_sum

    # 149_999 copies of 123.456784 plus one tail term chosen so the
    # exact sum's third decimal is 5 (a .xx5 boundary at out_dec=2).
    n, t_micros = 149_999, 123_456_784
    base = n * t_micros                       # exact micros so far
    tail = (5000 - base % 10_000) % 10_000 + 123_450_000
    total = base + tail
    assert total % 10_000 == 5_000            # exactly on .xx5
    exact = Decimal(total).scaleb(-6)
    want = float(abs(exact).quantize(
        Decimal("0.01"), rounding=ROUND_HALF_UP)) * (1 if total >= 0 else -1)

    df = spark.range(n + 1).selectExpr(
        f"CASE WHEN id < {n} THEN {t_micros}/1e6 ELSE {tail}/1e6 END AS x"
    )
    [row] = df.agg(rounded_sum(F.col("x"), 6).alias("s")).collect()
    assert row["s"] == want, (row["s"], want, str(exact))


def test_rounded_sum_decimal_headroom_past_long(spark):
    """The 100-TB contract: the flagship in_dec=6 charge column's
    scaled sum passes 2^63 around SF 5000 — a long accumulator dies
    with an ANSI overflow exactly where the engine is meant to run.
    The decimal(38,0) accumulator (mirroring duck's SUM(BIGINT) →
    HUGEINT widening) must return the exact rounded sum instead.
    Three terms of 4e18 scaled units sum to 1.2e19 > 2^63."""
    import duckdb

    from etl_work_flow_for_big_data_spark.functions.text import rounded_sum
    from etl_work_flow_for_big_data_spark.queries.relational import _duck_round_sum

    x = 4.0e12  # x * 10^6 = 4e18 per term; 3 terms overflow a long sum
    df = spark.createDataFrame([(x,), (x,), (x,)], "v double")
    [row] = df.agg(rounded_sum(F.col("v"), 6).alias("s")).collect()
    assert row["s"] == 1.2e13

    [(duck,)] = duckdb.sql(
        f"SELECT {_duck_round_sum('v', 6)} FROM "
        f"(VALUES ({x!r}::DOUBLE), ({x!r}), ({x!r})) AS t(v)"
    ).fetchall()
    assert duck == row["s"]


def test_scaled_long_term_cross_engine_total_identity(spark):
    """_scaled_long_term(x, s) must equal DuckDB's
    TRY_CAST(ROUND(x*s, 0) AS BIGINT) for EVERY double — the per-term
    contract both rounded aggregates stand on. Targeted values walk
    every regime boundary: exact integers and half-integers below
    2^52 (the signed-half add), odd/even-mantissa integers just past
    2^52 (where adding 0.5 would round-to-even UP and the guard must
    suppress it), the 2^63 try_cast overflow edge, and the nonfinite/
    signed-zero totality cases.

    HARNESS TRAP (cost an hour in r9): DuckDB 1.0's UNQUOTED numeric
    literal parse ('SELECT 4503599627370495.5::DOUBLE') goes through
    the DECIMAL-literal path and lands ONE ULP LOW for >=16-sig-digit
    values, which masquerades as broken ROUND/addition at the 2^52
    boundary. The QUOTED string cast (''...''::DOUBLE) parses
    bit-exactly, matching python/Spark — so this test (and any future
    boundary harness) must feed duck doubles as quoted strings. The
    production oracles are immune: their doubles arrive via parquet,
    and embedded SQL literals are short/exact."""
    import duckdb

    from etl_work_flow_for_big_data_spark.functions.text import _scaled_long_term

    two52, two63 = float(2**52), float(2**63)
    vals = [
        0.0, -0.0, 1.0, -1.0, 0.5, -0.5, 2.5, -2.5,          # halves
        150.855, -150.855, 3017.1 * 0.05,                     # seed-80118 shapes
        two52 - 1.0, two52 - 0.5, two52, two52 + 1.0,         # guard edge
        two52 + 3.0,                                          # odd mantissa past 2^52
        two63 / 2, two63 - 1024.0, two63, two63 * 2,          # long range edge
        -two63, -(two63 * 2), 1e300, -1e300,                  # far overflow
        float("nan"), float("inf"), float("-inf"),            # nonfinite
        None,                                                 # NULL
    ]
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "i int, v double")
    got = {
        r["i"]: r["t"]
        for r in df.select("i", _scaled_long_term(F.col("v"), 1).alias("t")).collect()
    }
    def _lit(v):
        # QUOTED string casts only — see the harness trap above
        return "NULL" if v is None else f"'{v!r}'"

    sql_vals = ", ".join(f"({i}, {_lit(v)}::DOUBLE)" for i, v in rows)
    duck = {
        i: t
        for i, t in duckdb.sql(
            f"SELECT i, TRY_CAST(ROUND(v * 1.0, 0) AS BIGINT) "
            f"FROM (VALUES {sql_vals}) AS t(i, v)"
        ).fetchall()
    }
    for i, v in rows:
        assert got[i] == duck[i], (v, got[i], duck[i])
