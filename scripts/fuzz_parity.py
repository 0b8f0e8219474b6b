"""Seeded cross-engine fuzz: random fixture tables → full family
parity sweep per trial.

The driver regenerates every fixture between rounds, so the real
robustness question is "does the oracle contract hold on tables we
have never seen?". The adversarial fixtures pin the shapes already
found divergent; this script samples NEW shapes: random unicode /
control-char / empty / NULL strings, ±Inf/NaN/huge/-0.0 doubles,
negative and NULL keys, dangling foreign keys, malformed and
fractional JSON, degenerate embeddings. Each trial is fully
deterministic from its seed — a failure report names the seed, so any
divergence is replayable.

Usage: python scripts/fuzz_parity.py [n_trials] [base_seed]
[forced_modes_csv] [queries_csv]
(base_seed convention: round N uses N*10000+1. Mode flags per trial
are drawn from a seed-derived rng — skew/wide_ts/null_heavy at 50%,
tiny/astral/ragged/drift at 25%, longtext/dupstorm at 30% — so a wave
of ANY
size samples every axis and its compositions; the flags are a pure
function of the seed, so a failure replays from the seed alone. The
pre-r9 harness used index-bit rotation (%2 skew, %4 wide_ts, ...),
which needed 2^k trials to reach axis k. forced_modes_csv turns a
mode on for EVERY trial — used by the bignum axis, which is only
meaningful against the rounded-aggregate queries_csv subset (see
_magnify), and by single-axis burn-in waves for new modes.)
Writes parquet under /tmp, never touches /root/testdata.
"""

from __future__ import annotations

import datetime as dt
import os
import random
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import duckdb  # noqa: E402

_CTRL = ["\x00", "\x01", "\x08", "\x0b", "\x0c", "\x1f", "\x7f", "\t", "\n", "\r",
         # Unicode line terminators: Java regex $ (and \s-class trims)
         # treats these as line ends where RE2/duck does not — the
         # exact class behind the parse_json \A..\z anchor fix
         "\u2028", "\u2029", "\u0085"]
_WORDS = ["alpha", "beta", "gamma", "東京", "naïve", "s=v", "p|q", '"q"', "\\esc", ""]


def _rand_text(rng: random.Random, allow_null: bool = True) -> str | None:
    roll = rng.random()
    if allow_null and roll < 0.08:
        return None
    n = rng.randrange(0, 12)
    parts = []
    for _ in range(n):
        r = rng.random()
        if r < 0.15:
            parts.append(rng.choice(_CTRL))
        elif r < 0.3:
            parts.append(chr(rng.randrange(0x20, 0x2FF)))
        else:
            parts.append(rng.choice(_WORDS))
    return " ".join(parts) if rng.random() < 0.5 else "".join(parts)


def _rand_double(rng: random.Random) -> float | None:
    """NULL/NaN/±Inf/-0.0 probe totality; finite values keep the
    fixtures' 2-DECIMAL contract (verified against the generated
    parquet: every fixture numeric is a 2-dec value). A sum of 2-dec
    doubles never lands near a ROUND(x, 2) half boundary, so Spark's
    BigDecimal-HALF_UP and duck's rescale rounding agree; fuzzing
    6-dec values manufactures the inherent-FP divergence the fixture
    contract excludes (seed 60006 hit SUM = 29294.685 exactly —
    Spark 29294.68, duck 29294.69). ±1e308 finites are also out:
    two of them in one SUM group overflow order-dependently
    ((h+h)-h = inf but (h-h)+h = h), while ±Inf mixes are safe — any
    accumulation order reaches the same NaN/±Inf because NaN is
    sticky and finite addends never un-saturate an infinity."""
    roll = rng.random()
    if roll < 0.08:
        return None
    if roll < 0.12:
        return float("nan")
    if roll < 0.16:
        return float("inf") if rng.random() < 0.5 else float("-inf")
    if roll < 0.20:
        return rng.choice([0.0, -0.0, 1e-300])
    return round(rng.uniform(-1e5, 1e5), 2)


def _rand_props(rng: random.Random) -> str | None:
    roll = rng.random()
    if roll < 0.1:
        return None
    if roll < 0.2:
        return rng.choice(["not json", "{", "[1,2", "", "nul\x00l", "{]"])
    k = rng.choice(
        ["7", "-12", "0", "12.5", '"12"', '"1e2"', '" 42 "', '"abc"',
         "null", "1e2", "true", '"0x1A"', "99999999999999",
         # line-terminator-wrapped digits: Java $ / try_cast trim
         # these as line ends, RE2 / duck trim does not
         '"12\u2028"', '"-3\u2029"', '"4\u0085"', '"\u20287"']
    )
    return "{\"k\": %s}" % k


# Extreme-timestamp pools for wide_ts mode: negative epochs (floor-vs-
# trunc division on pre-1970 seconds is a classic engine divergence),
# exact epoch zero, and the pandas ns-bound edges the parity layer's
# Arrow conversion must survive. events.ts draws ONLY the near-epoch
# pool — in wide mode the whole events timeline shifts to Dec 1969 /
# Jan 1970, because ts_gapfill's dense grid is min..max ts by
# contract and a 1901..2262 span is ~3.2M hours PER event_type: seed
# 70103 OOM'd the harness JVM collecting that grid for parity. The
# far pair still reaches o_orderdate / l_shipdate (filters, date
# arithmetic, as-of joins — no dense grid on those columns).
_WIDE_TS_NEAR = [
    dt.datetime(1969, 12, 31, 23, 30, 1),
    dt.datetime(1969, 12, 31, 22, 59, 59, 123456),
    dt.datetime(1970, 1, 1, 0, 0, 0),
    dt.datetime(1969, 12, 25, 2, 56, 15),
    dt.datetime(1970, 1, 3, 13, 0, 7),
]
_WIDE_TS_FAR = _WIDE_TS_NEAR[:3] + [
    dt.datetime(1901, 1, 1, 0, 0, 1),
    dt.datetime(2262, 4, 11, 23, 47, 1),
]


def _rand_ts(rng: random.Random, wide: bool = False, far: bool = True) -> dt.datetime | None:
    if rng.random() < 0.08:
        return None
    # wide mode consumes one extra rng draw per non-null call; wide=False
    # stays byte-identical to the r6/r7 pinned seeds
    if wide:
        if rng.random() < 0.3:
            return rng.choice(_WIDE_TS_FAR if far else _WIDE_TS_NEAR)
        base = dt.datetime(2024, 1, 1) if far else dt.datetime(1969, 12, 1)
        span = (90 if far else 61) * 86400
        return base + dt.timedelta(seconds=rng.randrange(0, span), microseconds=rng.choice([0, 0, 123456]))
    base = dt.datetime(2024, 1, 1)
    return base + dt.timedelta(seconds=rng.randrange(0, 90 * 86400), microseconds=rng.choice([0, 0, 123456]))


# Nullable column INDICES per generated table for null_heavy mode —
# every column the schema allows to be NULL except primary ids
# (the fixture contract keeps ids non-null). Join keys (user_id,
# o_custkey, l_orderkey), agg inputs, and window order keys (ts) are
# all included, so the density pathology hits them simultaneously.
_NULLABLE = {
    "events": [1, 2, 3, 4, 5],
    "documents": [1, 2, 3, 4],
    "embeddings": [1, 2],
    "customer": [1, 2, 3, 4],
    "orders": [1, 2, 3, 4, 5],
    "lineitem": [0, 4, 5, 6, 7, 8, 9, 10],
}


# Supplementary-plane pool for astral mode: plain emoji (one
# codepoint, surrogate PAIR in any UTF-16 engine), a skin-tone
# modifier sequence, a ZWJ sequence, a regional-indicator flag pair,
# mathematical alphanumerics, and an Egyptian hieroglyph — the
# codepoint-vs-byte-vs-code-unit pathologies the BMP pools
# (_WORDS/_CTRL, all <= U+02FF) cannot reach.
_ASTRAL = ["\U0001F600", "\U0001F680\U0001F30D", "\U0001D518\U0001D52B",
           "\U0001F44D\U0001F3FD", "\U0001F1FA\U0001F1F8",
           "\U0001D7D8\U0001D7D9", "\U0001F9D1\u200d\U0001F4BB",
           "\U00013000", "\U0001F4AF"]


def _astralize(tables: dict, rng: random.Random) -> dict:
    """astral mode: splice supplementary-plane text (emoji, surrogate
    pairs, ZWJ/flag sequences, math alphanumerics) into the
    text-bearing columns the text/dedup suite consumes —
    documents.text, events.event_type, customer.c_name. Probes
    codepoint-vs-byte alignment past the BMP: length/substring
    semantics, regex ``.`` over supplementary codepoints, shingle
    boundaries, UTF-8 hashing. Post-pass, so the base generator's rng
    consumption (and every pinned seed) stays byte-identical with the
    mode off; documents.n_chars is recomputed (Python codepoint
    length) whenever a splice changes the text, and the forced
    doc 0/1 exact duplicate is re-applied so the dedup family stays
    non-vacuous under splicing."""
    out = dict(tables)
    targets = {"documents": [1], "events": [3], "customer": [1]}
    for name, idxs in targets.items():
        rows, schema = tables[name]
        new_rows = []
        for r in rows:
            r = list(r)
            for j in idxs:
                if r[j] is not None and rng.random() < 0.6:
                    a = rng.choice(_ASTRAL)
                    roll = rng.random()
                    if roll < 0.34:
                        r[j] = a + r[j]
                    elif roll < 0.67:
                        r[j] = r[j] + a
                    else:
                        mid = len(r[j]) // 2
                        r[j] = r[j][:mid] + a + r[j][mid:]
                    if name == "documents":
                        r[4] = len(r[1])
            new_rows.append(tuple(r))
        if name == "documents" and len(new_rows) >= 4 and new_rows[0][1] is not None:
            # mirror gen_tables' forced exact duplicate
            new_rows[1] = (new_rows[1][0],) + new_rows[0][1:]
        out[name] = (new_rows, schema)
    return out


def _truncate(tables: dict, rng: random.Random) -> dict:
    """tiny mode: cardinality degeneracy — every non-dim table is
    independently truncated to 0, 1, or 2 rows. The base generator
    never draws below 3 rows per table, so empty-input behavior is an
    unsampled axis: empty window partitions, aggs over zero groups,
    joins with an empty side, gapfill with no min/max ts, dedup over
    an empty corpus, ANN with no vectors, centroid seeding with fewer
    points than k. At 100 TB this is the partition-pruned-to-nothing
    read, not a corner case. Post-pass (keeps pinned seeds
    byte-identical with the mode off); dims stay intact."""
    out = dict(tables)
    for name in ("events", "documents", "embeddings", "customer",
                 "orders", "lineitem"):
        rows, schema = tables[name]
        n = rng.choice([0, 0, 1, 2])
        out[name] = (rows[:n], schema)
    return out


def _magnify(tables: dict, rng: random.Random) -> dict:
    """bignum mode (r9, the extreme-magnitude axis): multiply the two
    price columns the fixed-point rounded aggregates consume —
    lineitem.l_extendedprice, orders.o_totalprice — by one factor per
    trial, log-sampled across the decades that straddle every
    boundary in the rounded_sum/rounded_mean contract:

    - 1e5-1e7: scaled terms cross 2^52, the ``_scaled_long_term``
      half-add guard boundary (above it doubles are integers and the
      +0.5 must NOT be added);
    - 1e8-1e9: terms cross 2^63 — the try_cast-NULL band, and valid
      terms large enough that a group SUM needs 128-bit headroom
      (the decimal(38,0) accumulator; a long accumulator dies with an
      ANSI overflow here while DuckDB's HUGEINT sails through);
    - 1e12: every term over-long — the all-NULL-path totality check.

    Deliberately a TARGETED axis: run it with the rounded-aggregate
    query subset (see main's queries_csv arg), because magnified
    values make plain double SUMs order-dependent in their final ulps
    — an inherent-FP divergence both engines are entitled to, exactly
    the class the base generator's ±1e5 2-dec contract exists to
    exclude (see _rand_double). Post-pass; None/NaN/±Inf pass
    through untouched so the totality draws keep their meaning."""
    factor = rng.choice([1e5, 1e6, 1e7, 1e8, 1e9, 1e12])
    out = dict(tables)
    for name, idx in (("lineitem", 5), ("orders", 3)):
        rows, schema = tables[name]
        out[name] = (
            [
                tuple(
                    v * factor if j == idx and isinstance(v, float) else v
                    for j, v in enumerate(r)
                )
                for r in rows
            ],
            schema,
        )
    return out


def _long_run(rng: random.Random, cap: int = 32768) -> str:
    """One pathological long string, 1k-32k chars (log-sampled).
    Shapes chosen for what they break: single-char runs (regex
    quantifier stress), alternating two-char patterns, a SINGLE
    repeated token (one shingle owning the whole posting list —
    the max_df hot-shingle path), multi-byte runs (UTF-8 length vs
    codepoint length at volume), digit runs, and long realistic
    word streams (shingle windows over genuinely long docs)."""
    n = min(cap, int(2 ** rng.uniform(10, 15)))
    kind = rng.random()
    if kind < 0.18:
        return "a" * n
    if kind < 0.36:
        return "ab" * (n // 2)
    if kind < 0.52:
        return ("tok%d " % rng.randrange(3)) * (n // 5)
    if kind < 0.68:
        return "東京χΨ" * (n // 4)
    if kind < 0.82:
        return "1234567890" * (n // 10)
    return " ".join(rng.choice(_WORDS) or "w" for _ in range(n // 6))


def _elongate(tables: dict, rng: random.Random) -> dict:
    """longtext mode (r9 wave 11, the string-LENGTH axis): splice
    1k-32k-char pathological strings into the text-bearing columns.
    The base pools top out at ~12 short words, so every regex,
    shingle window, tokenizer, JSON parser and substring in the
    engine has only ever seen sub-100-char inputs from the fuzzer —
    while a real corpus doc is kilobytes. Probes: Java-regex vs RE2
    behavior on long subjects (backtracking vs linear scan must still
    AGREE on matches), shingling/minhash over documents with 10k+
    shingles, hot-shingle posting lists (a single repeated token),
    fixed-point/tokenize kernels at length, get_json_object over a
    long (valid) JSON string value, and parse failure agreement on
    long INVALID payloads. Targets: documents.text (full length,
    n_chars recomputed, forced doc-0/1 duplicate re-applied),
    events.event_type (capped 4k — it is also a group/route key, so
    runaway key width would just slow the sweep), events.props (half
    long-valid-JSON, half long-invalid). Post-pass — rng consumption
    with the mode off is untouched, so every pinned seed stands."""
    out = dict(tables)
    rows, schema = tables["documents"]
    new_rows = []
    row0_changed = False
    for i, r in enumerate(rows):
        r = list(r)
        if r[1] is not None and rng.random() < 0.5:
            run = _long_run(rng)
            roll = rng.random()
            if roll < 0.4:
                r[1] = run
            elif roll < 0.7:
                r[1] = run + r[1]
            else:
                r[1] = r[1] + run
            r[4] = len(r[1])
            if i == 0:
                row0_changed = True
        new_rows.append(tuple(r))
    # mirror gen_tables' forced exact duplicate — but ONLY when row 0's
    # text was actually elongated here AND row 1 still carries text
    # (r10 fix: the unconditional overwrite discarded row 1's own
    # elongation when row 0 drew no change, and resurrected a text a
    # prior null_heavy pass had nulled — both narrowed the sampled
    # pathology space; rng consumption is untouched, pinned seeds stand)
    if (
        len(new_rows) >= 4
        and row0_changed
        and new_rows[0][1] is not None
        and new_rows[1][1] is not None
    ):
        new_rows[1] = (new_rows[1][0],) + new_rows[0][1:]
    out["documents"] = (new_rows, schema)

    ev_rows, ev_schema = tables["events"]
    new_ev = []
    for r in ev_rows:
        r = list(r)
        if r[3] is not None and rng.random() < 0.3:
            r[3] = _long_run(rng, cap=4096)
        if r[5] is not None and rng.random() < 0.3:
            if rng.random() < 0.5:
                # long VALID JSON: quote-free run so no escaping needed
                r[5] = '{"k":"' + "a" * int(2 ** rng.uniform(10, 14)) + '"}'
            else:
                r[5] = _long_run(rng)
        new_ev.append(tuple(r))
    out["events"] = (new_ev, ev_schema)
    return out


def _dupstorm(tables: dict, rng: random.Random) -> dict:
    """dupstorm mode (r9 wave 11, the duplicate-DENSITY axis): the
    base generator forces exactly ONE exact document duplicate, so
    the dedup family has only ever been fuzzed at duplicate rate
    ~2/n. A crawl corpus is the opposite — duplicate clusters
    dominate. Replicates ~40% of documents 1-3× each (exact copy /
    one-char edit / suffix noise → exact-dup, near-dup and
    cluster-transitivity paths all hot at once), ~30% of embeddings
    (exact or one-coordinate +1e-3 perturbation → cosine ≈ 1
    candidate explosion in LSH buckets and IVF cells), and ~20% of
    events as FULL-ROW duplicates (same event_id — distinct counts,
    and window ranks over identical rows must stay multiset-
    deterministic: identical input rows get distinct ranks in some
    order, but the output row-multiset cannot depend on which).
    Post-pass; new doc/vec ids continue past the max so id
    uniqueness holds where the base generator provided it."""
    out = dict(tables)
    rows, schema = tables["documents"]
    max_id = max((r[0] for r in rows), default=-1)
    new_rows, ctr = list(rows), 0
    for r in rows:
        if r[1] is None or rng.random() > 0.4:
            continue
        for _ in range(rng.randrange(1, 4)):
            ctr += 1
            text, roll = r[1], rng.random()
            if roll < 0.4:
                pass  # exact copy
            elif roll < 0.7 and text:
                i = rng.randrange(len(text))
                text = text[:i] + rng.choice("xyz") + text[i + 1:]
            else:
                text = text + " " + rng.choice(["alpha", "beta", "東京"])
            new_rows.append((max_id + ctr, text, r[2], r[3], len(text)))
    out["documents"] = (new_rows, schema)

    erows, eschema = tables["embeddings"]
    emax = max((r[0] for r in erows), default=-1)
    new_e, ctr = list(erows), 0
    for r in erows:
        if rng.random() > 0.3:
            continue
        ctr += 1
        v = r[1]
        if v is not None and rng.random() < 0.5:
            v = list(v)
            j = rng.randrange(len(v))
            v[j] = round(v[j] + 1e-3, 4)
        new_e.append((emax + ctr, v, r[2]))
    out["embeddings"] = (new_e, eschema)

    evrows, evschema = tables["events"]
    new_ev = list(evrows)
    for r in evrows:
        if rng.random() < 0.2:
            new_ev.append(r)
    out["events"] = (new_ev, evschema)
    return out


def _raggedize(tables: dict, rng: random.Random) -> dict:
    """ragged mode (r9, the vector-WIDTH axis): re-draw ~25% of
    non-NULL embeddings at a wrong width (0/1/32/63/65/128 instead of
    the contract's 64). Found a real divergence class on its manual
    debut: the oracle's list-indexed dot computes a PREFIX cosine
    against a longer vector (and a NULL-element sum against a shorter
    one) where the fixed-width kernel excludes the row — sim_pairs
    silently returned fewer rows than the oracle until width became
    part of the domain filter on BOTH sides (is_valid_embedding
    dim=64 / ``len(embedding) = 64``). At 100 TB a corrupt upstream
    batch WILL ship wrong-width vectors; the domain filter is what
    keeps that a non-event. Post-pass; rng consumption with the mode
    off is untouched."""
    out = dict(tables)
    rows, schema = tables["embeddings"]
    new_rows = []
    for r in rows:
        if r[1] is not None and rng.random() < 0.25:
            d = rng.choice([0, 1, 32, 63, 65, 128])
            r = (r[0], [round(rng.uniform(-1, 1), 4) for _ in range(d)], r[2])
        new_rows.append(r)
    out["embeddings"] = (new_rows, schema)
    return out


def _nullify(tables: dict, rng: random.Random) -> dict:
    """null_heavy mode: re-draw 30-50% of EVERY nullable column to
    NULL simultaneously (rate drawn once per table). The base
    generator's ~8% per-column NULLs probe value totality; this
    probes DENSITY — COUNT vs COUNT(col) splits, null-key join drops,
    window frames ordered by mostly-NULL keys, agg groups that are
    entirely NULL. Post-pass over the generated rows, so the base
    generator's rng consumption (and the r6/r7 pinned seeds) stays
    byte-identical when the mode is off."""
    out = dict(tables)
    for name, idxs in _NULLABLE.items():
        rows, schema = tables[name]
        rate = 0.3 + 0.2 * rng.random()
        out[name] = (
            [
                tuple(
                    None if j in idxs and rng.random() < rate else v
                    for j, v in enumerate(r)
                )
                for r in rows
            ],
            schema,
        )
    return out


#: drift mode (r10 wave 12, the SHAPE axis): every earlier axis
#: mutates VALUES; none mutates the files' schemas — yet a real lake
#: is a directory written by many jobs over months (columns added
#: over time, ids INT32 from an old writer and INT64 from the new
#: one, fields reordered). Per drifted table: which non-key nullable
#: columns a file may be missing, and which id columns may narrow to
#: INT32 when their values fit.
DRIFT_TARGETS = {
    "documents": {"droppable": ["source", "n_chars"],
                  "narrowable": ["doc_id"]},
    "events": {"droppable": ["props", "value"],
               "narrowable": ["event_id", "user_id"]},
    "orders": {"droppable": ["o_orderpriority", "o_orderstatus"],
               "narrowable": ["o_orderkey", "o_custkey"]},
    # r10 extension (post-pin; the 100002 pin freezes its own 3-table
    # dict): the fact table most queries join/aggregate — INT32 keys
    # from an old writer under the widened read is the highest-value
    # drift shape. Droppables are value columns every consumer already
    # handles as NULL (the null_heavy equivalence class).
    "lineitem": {"droppable": ["l_returnflag", "l_tax"],
                 "narrowable": ["l_orderkey", "l_suppkey"]},
    # r11 extension (VERDICT r10 next-round #5): the remaining dims +
    # embeddings. The array<float> column itself never drifts (list-
    # type unification is not a lake-evolution shape); what drifts is
    # the id (INT32 old writer) and the label — composed with the
    # ragged axis this is the previously-untested combination: a
    # widened-footer read whose ROWS carry wrong-width vectors, so the
    # domain filter (is_valid_embedding) must hold across the schema
    # seam.
    "customer": {"droppable": ["c_mktsegment", "c_acctbal"],
                 "narrowable": ["c_custkey"]},
    "supplier": {"droppable": ["s_acctbal"],
                 "narrowable": ["s_suppkey"]},
    "part": {"droppable": ["p_type", "p_retailprice"],
             "narrowable": ["p_partkey"]},
    "embeddings": {"droppable": ["label"],
                   "narrowable": ["vec_id"]},
}


def write_drifted(spark, rows, schema: str, dest: str, spec: dict,
                  rng: random.Random) -> None:
    """Write one table as a TWO-FILE parquet directory whose footers
    disagree: the second half of the rows is written by a simulated
    "other ingest job" that may drop a nullable non-key column, write
    an id column as INT32, and/or reorder fields — composed per trial.
    Which half lands first alphabetically is also drawn, because the
    engine contract under test (catalog._drifted_schema by-name
    widest-type union, mirrored by duck's union_by_name) must be
    file-order independent — Spark's default "random footer wins"
    inference is exactly the bug this axis exists to keep out.

    Rows are split positionally, not by key, so every value pathology
    the earlier axes planted lands on both sides of the schema seam.
    """
    from pyspark.sql import functions as F

    cols = [c.strip().split(" ", 1)[0].strip("`")
            for c in schema.split(",")]
    if len(rows) < 4:
        (spark.createDataFrame(rows, schema).coalesce(1)
         .write.mode("overwrite").parquet(dest))
        return
    cut = len(rows) // 2
    df_a = spark.createDataFrame(rows[:cut], schema)
    df_b = spark.createDataFrame(rows[cut:], schema)
    drop = rng.random() < 0.7
    narrow = rng.random() < 0.7
    reorder = rng.random() < 0.7
    # draw every flag first (pure function of the rng stream), then
    # guarantee at least one pathology so a drift trial never
    # degenerates to a uniform two-file write
    if not (drop or narrow or reorder):
        reorder = True
    bcols = list(df_b.columns)
    if drop:
        bcols.remove(rng.choice(spec["droppable"]))
    if reorder:
        rng.shuffle(bcols)
    narrowed: set[str] = set()
    if narrow:
        victim = rng.choice(spec["narrowable"])
        vals = [r[cols.index(victim)] for r in rows[cut:]]
        if all(v is None or -(2 ** 31) <= v < 2 ** 31 for v in vals):
            narrowed = {victim}
    df_b = df_b.select(*[
        F.col(c).cast("int").alias(c) if c in narrowed else F.col(c)
        for c in bcols
    ])
    b_first = rng.random() < 0.5
    halves = [df_a, df_b]
    if b_first:
        halves.reverse()
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest)
    for i, half in enumerate(halves):
        staging = dest + f"__stage{i}"
        half.coalesce(1).write.mode("overwrite").parquet(staging)
        part = next(f for f in sorted(os.listdir(staging))
                    if f.endswith(".parquet"))
        shutil.move(os.path.join(staging, part),
                    os.path.join(dest, f"part-{i:03d}.parquet"))
        shutil.rmtree(staging, ignore_errors=True)


def gen_tables(rng: random.Random, skew: bool = False, wide_ts: bool = False,
               null_heavy: bool = False, tiny: bool = False,
               astral: bool = False,
               bignum: bool = False,
               longtext: bool = False,
               dupstorm: bool = False,
               ragged: bool = False) -> dict[str, tuple[list, str]]:
    """``skew=True`` switches every join/group key column to a
    zipf-shaped draw where ONE hot key owns ~50% of rows (events.
    user_id, orders.o_custkey, lineitem.l_orderkey) — the
    key-DISTRIBUTION pathology the value-pathology sweep can't reach:
    hash-agg spill paths, skewed shuffle joins, window partitions
    funneling half the table through one partition, and AQE skew-join
    splits must all be result-invariant.

    ``wide_ts=True`` shifts events.ts to a near-epoch timeline
    (negative-epoch seconds exercise floor-vs-trunc bucket division
    in every window query while the gapfill grid stays small — see
    _WIDE_TS_NEAR) and lets o_orderdate / l_shipdate draw the far
    1901/2262 extremes (filters, date arithmetic, Arrow ns bounds).

    ``null_heavy=True`` (r8, the density axis) re-draws 30-50% of
    every nullable column — join keys, agg inputs, window order keys
    at once — to NULL in a post-pass (see ``_nullify``).

    ``tiny=True`` (r8, the cardinality axis) truncates every non-dim
    table to 0/1/2 rows in a post-pass (see ``_truncate``); the base
    generator never draws below 3 rows, so empty-input operator
    behavior is otherwise unsampled.

    ``astral=True`` (r8, the supplementary-plane text axis) splices
    emoji / surrogate-pair / ZWJ-sequence text into the text-bearing
    columns in a post-pass (see ``_astralize``); the base pools top
    out at U+02FF.

    ``bignum=True`` (r9, the extreme-magnitude axis) multiplies the
    price columns by a per-trial factor spanning the 2^52 / 2^63
    fixed-point boundaries in a post-pass (see ``_magnify``); run it
    against the rounded-aggregate query subset only.

    ``longtext=True`` (r9 wave 11, the string-length axis) splices
    1k-32k-char pathological strings into documents.text /
    events.event_type / events.props in a post-pass (see
    ``_elongate``); the base pools top out at ~100 chars.

    ``dupstorm=True`` (r9 wave 11, the duplicate-density axis)
    replicates ~40% of documents, ~30% of embeddings and ~20% of
    events as exact / near duplicates in a post-pass (see
    ``_dupstorm``); the base generator forces only one duplicate.

    ``ragged=True`` (r9, the vector-width axis) re-draws ~25% of
    embeddings at a wrong width in a post-pass (see ``_raggedize``);
    the base generator always draws the contract's 64.

    All flags default False and keep rng consumption byte-identical
    to the pinned r6/r7 seeds. Post-pass order: nullify, astralize,
    magnify, elongate, dupstorm, truncate (density before splicing
    before magnitude before length before duplication before
    cardinality, so a tiny table's surviving rows still carry the
    composed pathologies, and dupstorm replicates the ALREADY-long
    texts)."""

    def _key(hot, draw):
        # 50% hot key, else the table's normal draw; short-circuit
        # keeps skew=False rng consumption byte-identical to r6 seeds
        return hot if skew and rng.random() < 0.5 else draw()

    n_ev = rng.randrange(8, 40)
    events = [
        (i, _rand_ts(rng, wide_ts, far=False),
         _key(7, lambda: rng.choice([None, rng.randrange(-50, 50), rng.randrange(0, 9_007_199_254_740_993)])),
         _rand_text(rng), _rand_double(rng), _rand_props(rng))
        for i in range(n_ev)
    ]
    n_doc = rng.randrange(6, 30)
    docs = []
    for i in range(n_doc):
        text = _rand_text(rng)
        docs.append(
            (i, text, rng.choice(["en", "xx", None, ""]),
             rng.choice(["web", "books", "code", None]),
             None if text is None else len(text))
        )
    # force a couple of exact duplicates so the dedup family is non-vacuous
    if n_doc >= 4 and docs[0][1] is not None:
        docs[1] = (1,) + docs[0][1:]
    dim = 64  # the fixture contract (TESTDATA.md) — LSH planes assume it
    embs = []
    for i in range(rng.randrange(6, 25)):
        roll = rng.random()
        if roll < 0.08:
            v = None
        elif roll < 0.14:
            v = [0.0] * dim
        elif roll < 0.2:
            v = [float("nan")] * dim
        else:
            v = [round(rng.uniform(-1, 1), 4) for _ in range(dim)]
        embs.append((i, v, rng.choice(["a", "b", None])))
    n_cust = rng.randrange(3, 10)
    cust = [
        (i, _rand_text(rng), rng.choice([None, rng.randrange(0, 6)]),
         _rand_double(rng), rng.choice(["BUILDING", "AUTOMOBILE", "", None]))
        for i in range(1, n_cust + 1)
    ]
    n_ord = rng.randrange(4, 16)
    orders = [
        (i, _key(2, lambda: rng.choice([None, rng.randrange(0, n_cust + 4)])),
         rng.choice(["O", "F", "P", None]), _rand_double(rng), _rand_ts(rng, wide_ts),
         rng.choice(["1-URGENT", "5-LOW", "3-MEDIUM", "2-HIGH", None, ""]))
        for i in range(1, n_ord + 1)
    ]
    li = []
    for i in range(rng.randrange(6, 30)):
        li.append(
            (_key(1, lambda: rng.randrange(1, n_ord + 3)),
             rng.randrange(1, 6), rng.randrange(1, 5),
             i + 1,
             rng.choice([None, round(rng.uniform(-10, 60), 1)]),
             rng.choice([None, round(rng.uniform(-100, 5000), 2)]),
             rng.choice([None, round(rng.uniform(0, 0.6), 2)]),
             rng.choice([None, round(rng.uniform(0, 0.2), 2)]),
             rng.choice(["N", "R", "A", None]),
             rng.choice(["O", "F", None]),
             _rand_ts(rng, wide_ts))
        )
    tables = {
        "events": (events, "event_id long, ts timestamp, user_id long, "
                   "event_type string, value double, props string"),
        "documents": (docs, "doc_id long, text string, lang string, "
                      "source string, n_chars long"),
        "embeddings": (embs, "vec_id long, embedding array<float>, label string"),
        "customer": (cust, "c_custkey long, c_name string, c_nationkey int, "
                     "c_acctbal double, c_mktsegment string"),
        "orders": (orders, "o_orderkey long, o_custkey long, o_orderstatus string, "
                   "o_totalprice double, o_orderdate timestamp, o_orderpriority string"),
        "lineitem": (li, "l_orderkey long, l_partkey long, l_suppkey long, "
                     "l_linenumber int, l_quantity double, l_extendedprice double, "
                     "l_discount double, l_tax double, l_returnflag string, "
                     "l_linestatus string, l_shipdate timestamp"),
        "region": ([(0, "AFRICA"), (1, "AMERICA"), (2, None)],
                   "r_regionkey int, r_name string"),
        "nation": ([(0, "ALGERIA", 0), (1, "BRAZIL", 1), (2, None, None), (3, "CHINA", 9)],
                   "n_nationkey int, n_name string, n_regionkey int"),
        "supplier": ([(1, "Supplier#1", 0, 10.0), (2, None, None, None),
                      (3, "Supplier#3", 1, -5.0), (4, "Supplier#4", 2, 0.0)],
                     "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"),
        # 4 static rows (not 3): write_drifted needs ≥4 rows to split
        # into a two-file drifted directory, so a 3-row part could
        # never exercise the r11 drift target (static literals — no
        # rng draws, pinned-seed table streams unchanged)
        "part": ([(1, "part one", "Brand#1", "TYPE A", 5, 10.0),
                  (2, None, None, None, None, None),
                  (3, "promo part", "Brand#2", "PROMO X", 50, 99.99),
                  (4, "spare part", "Brand#3", "TYPE B", 12, 25.0)],
                 "p_partkey long, p_name string, p_brand string, p_type string, "
                 "p_size int, p_retailprice double"),
    }
    if null_heavy:
        tables = _nullify(tables, rng)
    if astral:
        tables = _astralize(tables, rng)
    if bignum:
        tables = _magnify(tables, rng)
    if longtext:
        tables = _elongate(tables, rng)
    if dupstorm:
        tables = _dupstorm(tables, rng)
    if ragged:
        tables = _raggedize(tables, rng)
    if tiny:
        tables = _truncate(tables, rng)
    return tables


def main() -> None:
    # argv parsed here, not at module level: tests/test_fuzz_parity.py
    # imports gen_tables and must not see pytest's argv.
    # Seed convention: round N sweeps base N*10000+1 (r6 used
    # 60001-60020; r7 70001+) so every round's trials are FRESH shapes
    # — the sweep's value is finding new divergence classes, and
    # re-running last round's seeds only re-proves the pinned fixes.
    # The swept range is recorded in SCALE.md each round. Mode flags
    # are seed-derived per trial (see the loop below) so waves of any
    # size sample every axis and its compositions.
    # NOTE (r10): the r9 switch to seed-derived flags means pre-r9
    # wave seeds recorded in SCALE.md (70001+, 80001+) no longer
    # replay with the same modes through this CLI — the seed now
    # derives different flags than the old index-bit scheme produced.
    # Historical waves replay only through the explicit-flag pins in
    # tests/test_fuzz_parity.py, which pass modes to gen_tables
    # directly.
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    base_seed = int(sys.argv[2]) if len(sys.argv) > 2 else 80001
    # argv[3]: comma-separated mode flags FORCED on for every trial
    # (the seed-derived flags still compose on top) — the bignum
    # axis is opt-in this way because it is only meaningful against
    # the rounded-aggregate subset (see _magnify). argv[4]: that
    # query subset (comma-separated names; default = whole registry).
    forced = set(sys.argv[3].split(",")) if len(sys.argv) > 3 and sys.argv[3] else set()
    only_queries = sys.argv[4].split(",") if len(sys.argv) > 4 else None

    from etl_work_flow_for_big_data_spark.queries import load_all
    from etl_work_flow_for_big_data_spark.session import get_spark
    from parity import compare

    spark = get_spark("fuzz-parity")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    failures: list[tuple[int, str, str]] = []

    for trial in range(n_trials):
        seed = base_seed + trial
        # Mode flags are drawn from a SEPARATE seed-derived rng (NOT
        # the table rng — its consumption must stay byte-identical to
        # every pinned seed), so any wave size samples every axis:
        # the old index-bit rotation needed 2^k trials to reach axis
        # k, which left the r9 axes forced-only. A failed trial
        # replays from its seed alone — the flags are a pure function
        # of the seed (and the printed mode string names them).
        mrng = random.Random((seed * 2654435761) % 2**32)
        skew = mrng.random() < 0.5
        wide_ts = mrng.random() < 0.5
        null_heavy = mrng.random() < 0.5
        tiny = mrng.random() < 0.25
        astral = mrng.random() < 0.25
        # draw BEFORE or-ing the forced flags: a skipped draw would
        # shift the later ones, and the flags must stay a pure
        # function of the seed whatever forced set a rerun passes
        longtext = mrng.random() < 0.3 or "longtext" in forced
        dupstorm = mrng.random() < 0.3 or "dupstorm" in forced
        ragged = mrng.random() < 0.25 or "ragged" in forced
        # drift draws LAST so every pre-r10 flag keeps its seed-derived
        # value (appending a draw never shifts earlier ones)
        drift = mrng.random() < 0.25 or "drift" in forced
        bignum = "bignum" in forced
        rng = random.Random(seed)
        tables = gen_tables(rng, skew=skew, wide_ts=wide_ts,
                            null_heavy=null_heavy, tiny=tiny, astral=astral,
                            bignum=bignum, longtext=longtext,
                            dupstorm=dupstorm, ragged=ragged)
        tmp = tempfile.mkdtemp(prefix=f"fuzz_parity_{seed}_")
        try:
            for name, (rows, schema) in tables.items():
                dest = os.path.join(tmp, f"{name}.parquet")
                if drift and name in DRIFT_TARGETS:
                    write_drifted(spark, rows, schema, dest,
                                  DRIFT_TARGETS[name], rng)
                else:
                    (spark.createDataFrame(rows, schema).coalesce(1)
                     .write.mode("overwrite").parquet(dest))
            con = duckdb.connect()
            # union_by_name mirrors the engine's by-name widest-type
            # footer resolution (catalog._drifted_schema) on drifted
            # directories; identical footers make it a no-op
            ubn = ", union_by_name=true" if drift else ""
            for name in tables:
                con.sql(f"CREATE VIEW {name} AS SELECT * FROM "
                        f"read_parquet('{tmp}/{name}.parquet/*.parquet'{ubn})")
            n_ok = 0
            swept = ({q: registry[q] for q in only_queries}
                     if only_queries else registry)
            for qname, spec in swept.items():
                try:
                    compare(spec.fn(spark, tmp), con.sql(spec.oracle))
                    n_ok += 1
                except AssertionError as ex:
                    failures.append((seed, qname, str(ex)[:300]))
                    print(f"seed={seed} {qname}: DIVERGE {str(ex)[:160]}", flush=True)
                except Exception as ex:  # noqa: BLE001 — report, keep fuzzing
                    failures.append((seed, qname, f"{type(ex).__name__}: {ex}"[:300]))
                    print(f"seed={seed} {qname}: ERROR {type(ex).__name__}: {str(ex)[:160]}", flush=True)
            con.close()
            mode = ("skew" if skew else "flat") + ("+widets" if wide_ts else "") \
                + ("+null" if null_heavy else "") + ("+tiny" if tiny else "") \
                + ("+astral" if astral else "") + ("+bignum" if bignum else "") \
                + ("+longtext" if longtext else "") + ("+dupstorm" if dupstorm else "") \
                + ("+ragged" if ragged else "") + ("+drift" if drift else "")
            print(f"trial seed={seed} [{mode}]: {n_ok}/{len(swept)} ok", flush=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    print(f"\n{n_trials} trials, {len(failures)} failures")
    if failures:
        for seed, q, msg in failures[:40]:
            print(f"  seed={seed} {q}: {msg[:200]}")
        sys.exit(1)


if __name__ == "__main__":
    main()
