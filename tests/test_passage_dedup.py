"""Passage-level dedup semantics on planted geometry (r10): the
boilerplate remover document-level dedup cannot see — two DISTINCT
pages sharing a 32-token footer are not document duplicates, but the
footer must survive exactly once, in the lexicographically-first
(doc_id, pos) slot."""

from __future__ import annotations

import hashlib

from etl_work_flow_for_big_data_spark.operators.dedup import passage_dedup

W = 32


def _words(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


FOOTER = _words("footer", W)          # exactly one window
BODY_A = _words("alpha", W)           # unique windows
BODY_B = _words("beta", W)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_shared_footer_kept_once_in_first_slot(spark):
    # doc 1: body A + footer; doc 2: body B + footer (same footer
    # window); doc 3: footer only (a pure-boilerplate page)
    df = spark.createDataFrame(
        [
            (1, BODY_A + " " + FOOTER),
            (2, BODY_B + " " + FOOTER),
            (3, FOOTER),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_passages, r.n_dup, r.n_removed, r.clean_hash)
        for r in passage_dedup(df, "text", "doc_id", window_tokens=W).collect()
    }
    # footer hash occurs 3x; first occurrence is (1, 1) — doc 1 pos 1
    assert got[1] == (2, 1, 0, _md5(BODY_A + " " + FOOTER))
    assert got[2] == (2, 1, 1, _md5(BODY_B))
    # doc 3 loses its only passage: clean_hash is md5('') by contract
    assert got[3] == (1, 1, 1, _md5(""))


def test_unique_docs_untouched_and_partial_last_window(spark):
    # 40 tokens = one full window + one 8-token tail window; all unique
    text = _words("solo", 40)
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    [r] = passage_dedup(df, "text", "doc_id", window_tokens=W).collect()
    assert (r.n_passages, r.n_dup, r.n_removed) == (2, 0, 0)
    assert r.clean_hash == _md5(text)


def test_empty_and_null_docs_absent(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "   "), (4, "one two")],
        "doc_id long, text string",
    )
    got = {r.doc_id for r in
           passage_dedup(df, "text", "doc_id", window_tokens=W).collect()}
    assert got == {4}


def test_partition_count_invariant(spark):
    rows = [(i, _words("shared", W) if i % 2 else _words(f"u{i}", W))
            for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(tuple(r) for r in
               passage_dedup(df.repartition(2), "text", "doc_id").collect())
    b = sorted(tuple(r) for r in
               passage_dedup(df.repartition(13), "text", "doc_id").collect())
    assert a == b
    # rows are (doc_id, n_passages, n_dup, n_removed, clean_hash):
    # the shared passage survives exactly once across the odd docs
    shared_keepers = [
        r for r in a if r[0] % 2 and r[4] == _md5(_words("shared", W))
    ]
    assert len(shared_keepers) == 1 and shared_keepers[0][0] == 1
    assert all(r[4] == _md5("") for r in a if r[0] % 2 and r[0] != 1)
