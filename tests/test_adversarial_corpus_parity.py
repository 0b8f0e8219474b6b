"""Oracle parity for the text/dedup and packets/windows families on an
ADVERSARIAL corpus —
document shapes the driver-generated fixtures do not currently contain
but could after a regeneration (the r5 ADVICE negative-user-id episode
is the precedent): empty text, whitespace-only, single token, NULL
text, unicode, non-space whitespace, heavy repetition, near-dup tails.

Found in round 6 via exactly this probe:
- DuckDB ``list_reduce`` ERRORS on an empty list (zero-token doc) —
  the text_quality / dedup_simhash oracles now use ``list_sum``;
- DuckDB ``array_to_string([])`` is NULL where Spark ``array_join``
  is '' — the text_chunk oracle now COALESCEs;
- ``round4_ratio`` NULLs on a zero denominator via ``try_mod``
  (ANSI-mode ``pmod(a, 0)`` raises and would kill the task).
"""

from __future__ import annotations

import os

import duckdb
import pytest

ADVERSARIAL_DOCS = [
    (1, "", "en", "webz", 0),
    (2, "   ", "en", "webz", 3),
    (3, "single", "de", "webz", 6),
    (4, "the the the the the", "en", "webz", 19),
    (5, "naïve café über 東京 emoji 🚀 mix the of", "mix", "webz", 40),
    (6, None, "en", "webz", None),
    (7, "a\tb\nc d e f g h i j k l", "en", "webz", 23),
    (8, "tok " * 2000, "en", "webz", 8000),
    (9, "tok " * 2000 + "tail", "en", "webz", 8004),
    # multibyte payload spanning several 64-byte frames: 東 is 3 bytes,
    # so the frame boundary splits a character — pins the hex-view
    # (byte-true) frame/resize hashing against char-based slicing
    (10, "東" * 50 + " tail words here", "ja", "webz", 166),
    # vertical tab + Turkish İ: Java \s includes \x0B where RE2's does
    # not (normalize_text pins an explicit class), and full-Unicode
    # lower() diverges on İ (normalize_text ASCII-folds via translate)
    (11, "Mixed\x0bCase İstanbul I TEXT here", "tr", "webz", 30),
    # leading NBSP / ideographic space: duck's ONE-argument trim strips
    # Unicode whitespace where Spark trim strips only 0x20, so a
    # default-trim normalize mirror hashed this as '' on duck and as
    # '\xa0' on Spark (fuzz seed 70026) — the mirrors now pass duck's
    # explicit trim set ' '; NBSP stays canonical content on both
    (12, "\xa0 \r ", "en", "webz", 4),
    (13, "　ideographic　margins　", "ja", "webz", 21),
]

#: every registered query that reads ONLY the documents table
TEXT_FAMILY = [
    "mm_binary_meta",
    "mm_decode",
    "mm_features",
    "mm_frames",
    "mm_resize",
    "split_assign",
    "pack_sequences",
    "pack_sequences_bucketed",
    "mix_weighted",
    "text_tokens",
    "text_token_regex",
    "text_quality",
    "text_lang_id",
    "text_fingerprint",
    "text_chunk",
    "text_scrub",
    "dedup_exact",
    "dedup_ngram",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_apply",
    "dedup_passages",
    "dedup_components",
]


@pytest.fixture(scope="module")
def adversarial_dir(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("adversarial"))
    (
        spark.createDataFrame(
            ADVERSARIAL_DOCS,
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(tmp, "documents.parquet"))
    )
    return tmp


@pytest.fixture(scope="module")
def adversarial_duck(adversarial_dir):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{adversarial_dir}/documents.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", TEXT_FAMILY)
def test_adversarial_parity(name, spark, adversarial_dir, adversarial_duck):
    from etl_work_flow_for_big_data_spark.queries import load_all
    from tests.parity import compare

    spec = load_all()[name]
    compare(spec.fn(spark, adversarial_dir), adversarial_duck.sql(spec.oracle))


# ---------------------------------------------------------------------------
# events family — shapes found divergent (and fixed) in round 6:
# huge/Inf/NaN value (ANSI cents cast would kill the task), NULL
# user_id/event_type/ts/props, negative user_id (r5 advice), newline in
# event_type (wire-frame injection → payload NULL), JSON-escape chars,
# malformed JSON, JSON-string-typed k.

import datetime as _dt

_TS = _dt.datetime(2024, 1, 1)
ADVERSARIAL_EVENTS = [
    (0, _TS, 13, "error", 185.22, '{"k": 87}'),
    (1, _TS, -7, "signup", 106.03, '{"k": 0}'),
    (2, _TS, None, "purchase", 9.64, '{"k": 12}'),
    (3, _TS, 0, None, None, None),
    (4, _TS, 9007199254740993, "view", -0.0, '{"k": -1}'),
    (5, None, 5, "s=v weird=type", 1e308, "not json"),
    (6, _TS, 20, "p|pipe\nnl", 0.005, '{"k": null}'),
    (7, _TS, 25, "", 100000.5, "{}"),
    (8, _TS, 31, 'q"uo\\te\tx', float("nan"), '{"k": "12"}'),
    (9, _TS, 33, "ok", float("inf"), '{"k": "abc"}'),
    # round-6 review additions: \b/\f/raw-control bytes exercise the
    # full Jackson escape set (a hand replace-chain oracle covering
    # only \\ " \n \t \r diverged here), and fractional / scientific /
    # whitespace-wrapped k pin the integer-shape cast gate (duck
    # TRY_CAST rounds '12.5'→13 and accepts '1e2' where Spark
    # try_cast yields NULL).
    (10, _TS, 41, "b\x08f\x0cc\x01d\x1f", 1.0, '{"k": 12.5}'),
    (11, _TS, 43, "del\x7f\x00nul", 2.0, '{"k": "1e2"}'),
    (12, _TS, 47, "ok2", 3.0, '{"k": " 12 "}'),
    # form-feed-wrapped digits: Spark's bare try_cast trims the full
    # Java control-char set where duck's 4-char trim does not — both
    # sides now share one btrim+regex gate, so this is NULL everywhere
    (13, _TS, 53, "ok3", 4.0, '{"k": "\\f42"}'),
]

#: registered queries that read ONLY the events table
EVENTS_FAMILY = [
    "agg_grouping_sets",
    "case_map",
    "cast_types",
    "filter_bitmask",
    "filter_required",
    "join_asof",
    "null_handling",
    "parse_json",
    "parse_kv",
    "project_rename",
    "route_assign",
    "serialize_json",
    "serialize_kv",
    "ts_gapfill",
    "window_range_frame",
    "window_session",
    "window_sliding",
    "window_tumbling",
]


@pytest.fixture(scope="module")
def adversarial_events_dir(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("adversarial_events"))
    (
        spark.createDataFrame(
            ADVERSARIAL_EVENTS,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(tmp, "events.parquet"))
    )
    return tmp


@pytest.fixture(scope="module")
def adversarial_events_duck(adversarial_events_dir):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{adversarial_events_dir}/events.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", EVENTS_FAMILY)
def test_adversarial_events_parity(
    name, spark, adversarial_events_dir, adversarial_events_duck
):
    from etl_work_flow_for_big_data_spark.queries import load_all
    from tests.parity import compare

    spec = load_all()[name]
    compare(
        spec.fn(spark, adversarial_events_dir),
        adversarial_events_duck.sql(spec.oracle),
    )


def test_ts_gapfill_span_guard(spark, tmp_path):
    """One corrupt 1901 timestamp in a 2024 table must raise the
    dense-grid span guard (a clear error naming the bounds), not OOM
    building a centuries-of-empty-hours grid per event_type — fuzz
    seed 70103 killed the harness JVM exactly this way."""
    import datetime as dt

    from etl_work_flow_for_big_data_spark.queries import load_all

    rows = [
        (0, dt.datetime(1901, 1, 1, 0, 0, 1), 1, "a", 1.0, None),
        (1, dt.datetime(2024, 1, 1), 1, "a", 2.0, None),
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(str(tmp_path), "events.parquet"))
    with pytest.raises(ValueError, match="gapfill.*span|polluting"):
        load_all()["ts_gapfill"].fn(spark, str(tmp_path))


# ---------------------------------------------------------------------------
# embeddings family — degenerate vectors (round 6): NULL embedding
# (crashed _as_matrix with a ragged-array ValueError), zero vector
# (0/0 cosine), NaN components (SQL engines order NaN above everything;
# numpy rejects it), NULL label, huge-but-finite components. The
# kernel-backed queries treat these as out of domain on both sides
# (is_valid_embedding / the validity CTE); the pure-Catalyst LSH
# queries are consistent by construction and unfiltered.

import random as _random

_random.seed(7)


def _vec():
    return [round(_random.uniform(-1, 1), 3) for _ in range(64)]


ADVERSARIAL_EMBEDDINGS = [(i, _vec(), i % 3) for i in range(30)] + [
    (100, [0.0] * 64, 0),
    (101, None, 1),
    (102, _vec(), None),
    (103, [float("nan")] * 64, 2),
    (104, [1e30] * 64, 0),
]

EMBEDDINGS_FAMILY = [
    "sim_topk",
    "sim_pairs",
    "sim_ivf_topk",
    "sim_ann_lsh",
    "sim_ann_multiprobe",
]


@pytest.fixture(scope="module")
def adversarial_embeddings_dir(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("adversarial_embeddings"))
    (
        spark.createDataFrame(
            ADVERSARIAL_EMBEDDINGS,
            "vec_id long, embedding array<float>, label int",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(tmp, "embeddings.parquet"))
    )
    return tmp


@pytest.fixture(scope="module")
def adversarial_embeddings_duck(adversarial_embeddings_dir):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{adversarial_embeddings_dir}/embeddings.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", EMBEDDINGS_FAMILY)
def test_adversarial_embeddings_parity(
    name, spark, adversarial_embeddings_dir, adversarial_embeddings_duck
):
    from etl_work_flow_for_big_data_spark.queries import load_all
    from tests.parity import compare

    spec = load_all()[name]
    compare(
        spec.fn(spark, adversarial_embeddings_dir),
        adversarial_embeddings_duck.sql(spec.oracle),
    )


# ---------------------------------------------------------------------------
# relational tables — NULL keys/attrs, dangling foreign keys, negative
# quantities/balances, empty strings (round 6). Found and fixed here:
# nullable-boolean dtype flip (is_urgent / approx_ok — one NULL turns a
# pandas bool column into object/float, breaking the whole column's
# value hash → both are now COALESCEd non-null), NTILE null ordering
# (Spark windows sort NULLS FIRST ascending, DuckDB defaults NULLS
# LAST → oracle pins NULLS FIRST), and the approx-quantile check
# (relative error is undefined at a zero median — ANSI DIVIDE_BY_ZERO
# — so approx_ok is now the estimate-present claim both engines can
# derive, with the 2% accuracy assertion in test_oracle_parity.py).

_D = _dt.datetime


def _relational_rows():
    return {
        "region": (
            [(0, "AFRICA"), (1, "AMERICA"), (2, None)],
            "r_regionkey int, r_name string",
        ),
        "nation": (
            [(0, "ALGERIA", 0), (1, "BRAZIL", 1), (2, None, None), (3, "CHINA", 9)],
            "n_nationkey int, n_name string, n_regionkey int",
        ),
        "customer": (
            [
                (1, "Customer#1", 0, 100.5, "BUILDING"),
                (2, "Customer#2", 1, -50.25, "AUTOMOBILE"),
                (3, None, None, None, None),
                (4, "Customer#4", 9, 0.0, "BUILDING"),
                (5, "Customer#5", 2, 200.0, ""),
            ],
            "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
            "c_mktsegment string",
        ),
        "supplier": (
            [(1, "Supplier#1", 0, 10.0), (2, None, None, None), (3, "Supplier#3", 1, -5.0)],
            "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
        ),
        "part": (
            [
                (1, "part one", "Brand#1", "TYPE A", 5, 10.0),
                (2, None, None, None, None, None),
                (3, "promo part", "Brand#2", "PROMO X", 50, 99.99),
            ],
            "p_partkey long, p_name string, p_brand string, p_type string, "
            "p_size int, p_retailprice double",
        ),
        "orders": (
            [
                (1, 1, "O", 1000.0, _D(1995, 1, 1), "1-URGENT"),
                (2, 2, "F", 100000.5, _D(1996, 6, 15), "5-LOW"),
                (3, None, None, None, None, None),
                (4, 9, "O", 50.0, _D(1997, 3, 1), "3-MEDIUM"),
                (5, 3, "P", 200.25, _D(1995, 12, 31), "2-HIGH"),
            ],
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ),
        "lineitem": (
            [
                (1, 1, 1, 1, 10.0, 100.0, 0.05, 0.02, "N", "O", _D(1995, 2, 1)),
                (1, 3, 3, 2, -3.0, 50.0, 0.0, 0.0, "R", "F", _D(1995, 2, 10)),
                (2, 2, 1, 1, None, None, None, None, None, None, None),
                (3, 1, 2, 1, 5.0, 500.0, 0.5, 0.1, "A", "F", _D(1996, 7, 1)),
                (4, 9, 9, 1, 7.0, 70.0, 0.07, 0.01, "N", "O", _D(1997, 3, 5)),
                (9, 1, 1, 1, 2.0, 20.0, 0.02, 0.0, "N", "O", _D(1998, 1, 1)),
            ],
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
            "l_quantity double, l_extendedprice double, l_discount double, "
            "l_tax double, l_returnflag string, l_linestatus string, "
            "l_shipdate timestamp",
        ),
        "events": (
            [(0, _D(2024, 1, 1), 13, "error", 185.22, '{"k": 7}')],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ),
    }


def _relational_query_names():
    from etl_work_flow_for_big_data_spark.queries import load_all

    return sorted(
        n
        for n, s in load_all().items()
        if not any(t in s.oracle for t in ("documents", "embeddings"))
    )


@pytest.fixture(scope="module")
def adversarial_relational_dir(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("adversarial_relational"))
    for name, (rows, schema) in _relational_rows().items():
        (
            spark.createDataFrame(rows, schema)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(tmp, f"{name}.parquet"))
        )
    return tmp


@pytest.fixture(scope="module")
def adversarial_relational_duck(adversarial_relational_dir):
    con = duckdb.connect()
    for name in _relational_rows():
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{adversarial_relational_dir}/{name}.parquet/*.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _relational_query_names())
def test_adversarial_relational_parity(
    name, spark, adversarial_relational_dir, adversarial_relational_duck
):
    from etl_work_flow_for_big_data_spark.queries import load_all
    from tests.parity import compare

    spec = load_all()[name]
    compare(
        spec.fn(spark, adversarial_relational_dir),
        adversarial_relational_duck.sql(spec.oracle),
    )
