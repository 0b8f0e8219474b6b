"""Similarity-operator unit tests (I3): executor-side block-grid
pairing in cosine_pairs (pair-once across any grid shape, no driver
relay) and NaN (zero-norm vector) semantics parity with the engines."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_work_flow_for_big_data_spark.operators.similarity import cosine_pairs


@pytest.fixture(scope="module")
def vecs(spark):
    # 20 deterministic 4-dim vectors with plenty of high-cosine pairs
    rows = [
        (i, [float((i % 5) + 1), float((i % 3) + 1), 1.0, float(i % 2)])
        for i in range(20)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_blocked_equals_single_pass(vecs):
    """Splitting the corpus into many blocks (block_size=3 → 7 blocks,
    a 7×7 grid) must produce the identical pair set as the one-block
    grid — each unordered pair emitted exactly once, in the block
    owning its larger id."""
    full = sorted(
        (r["d1"], r["d2"], r["cos_sim"])
        for r in cosine_pairs(vecs, "vec_id", "embedding", 0.8).collect()
    )
    blocked = sorted(
        (r["d1"], r["d2"], r["cos_sim"])
        for r in cosine_pairs(
            vecs, "vec_id", "embedding", 0.8, block_size=3
        ).collect()
    )
    assert full == blocked
    assert len(full) > 0
    assert all(d1 < d2 for d1, d2, _ in full)


def test_non_integral_id_rejected_up_front(spark):
    """ADVICE r2: with string ids a numeric pmod blocking silently
    collected empty blocks and emitted zero pairs. The kernel's
    pair-once contract is int64-id-based, so non-integral ids now fail
    loudly at the operator boundary instead."""
    rows = [(f"doc-{i}", [1.0, float(i % 3)]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    with pytest.raises(ValueError, match="integral id column"):
        cosine_pairs(df, "vec_id", "embedding", 0.8, block_size=3)


def test_blocked_with_n_hint_and_negative_ids(spark):
    """xxhash64 blocking partitions ANY integral id (negatives
    included — plain pmod on a negative id is fine, but hash blocking
    must stay pair-complete), and n_hint replaces the sizing count()
    without changing results."""
    rows = [
        (i - 10, [float((i % 5) + 1), float((i % 3) + 1), 1.0, float(i % 2)])
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    full = sorted(
        (r["d1"], r["d2"], r["cos_sim"])
        for r in cosine_pairs(df, "vec_id", "embedding", 0.8).collect()
    )
    blocked = sorted(
        (r["d1"], r["d2"], r["cos_sim"])
        for r in cosine_pairs(
            df, "vec_id", "embedding", 0.8, block_size=3, n_hint=20
        ).collect()
    )
    assert full == blocked
    assert len(full) > 0


def test_zero_norm_vector_excluded_by_contract(spark):
    """A zero vector yields NaN cosine (0/0). Arrow coerces NaN→NULL on
    transfer (pandas NaN == missing), so 'keep NaN like the engines'
    cannot round-trip the kernel; the documented contract instead is
    that zero-norm vectors never pair, enforced EXPLICITLY in the
    kernel (ADVICE r1, kernels.py) — not as a silent prefilter
    side-effect, and identically with or without a prefilter."""
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 1.0]), (3, [1.0, 0.9])],
        "vec_id long, embedding array<float>",
    )
    rows = {
        (r["d1"], r["d2"]): r["cos_sim"]
        for r in cosine_pairs(df, "vec_id", "embedding", 0.9).collect()
    }
    assert (2, 3) in rows and rows[(2, 3)] >= 0.9
    assert (1, 2) not in rows and (1, 3) not in rows

    # no-prefilter path (mode='all', raw kernel) applies the same rule
    from etl_work_flow_for_big_data_spark.functions.kernels import (
        pairwise_cosine,
    )

    corpus = [(1, [0.0, 0.0]), (2, [1.0, 1.0]), (3, [1.0, 0.9])]
    raw = pairwise_cosine(df, "vec_id", "embedding", corpus, mode="all").collect()
    assert all(not math.isnan(r["cos_raw"]) for r in raw)
    assert {(r["d1"], r["d2"]) for r in raw} == {(2, 3), (3, 2)}


class TestKmeansRefine:
    """Spherical k-means refinement (I3): Lloyd iterations improve the
    clustering objective and ivf_topk composes with refined centroids."""

    @pytest.fixture(scope="class")
    def two_clusters(self, spark):
        # two tight direction-clusters; ids 0 and 1 (the initial
        # centroids) land one in each
        rows = [(0, [1.0, 0.0, 0.1, 0.0]), (1, [0.0, 1.0, 0.0, 0.1])]
        for i in range(2, 30):
            if i % 2 == 0:
                rows.append((i, [1.0, 0.05 * (i % 5), 0.1, 0.0]))
            else:
                rows.append((i, [0.05 * (i % 5), 1.0, 0.0, 0.1]))
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_objective_improves(self, two_clusters):
        from etl_work_flow_for_big_data_spark.operators.similarity import (
            kmeans_inertia,
            kmeans_refine,
        )

        init = [
            (r["vec_id"], list(r["embedding"]))
            for r in two_clusters.filter("vec_id < 2").collect()
        ]
        before = kmeans_inertia(two_clusters, "vec_id", "embedding", init)
        refined = kmeans_refine(two_clusters, "vec_id", "embedding", init, iters=2)
        after = kmeans_inertia(two_clusters, "vec_id", "embedding", refined)
        assert after >= before - 1e-12
        assert len(refined) == 2
        assert all(len(v) == 4 for _, v in refined)
        # centroids moved toward their cluster means (no longer the
        # raw seed vectors)
        assert refined[0][1] != init[0][1]

    def test_ivf_with_refinement_finds_same_cluster_neighbors(self, two_clusters):
        from etl_work_flow_for_big_data_spark.operators.similarity import ivf_topk

        out = ivf_topk(
            two_clusters,
            [4, 5],
            "vec_id",
            "embedding",
            n_centroids=2,
            k=3,
            kmeans_iters=2,
        ).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r["q_vec_id"], []).append(r["c_vec_id"])
        # even-id query gets even-id neighbors (its direction cluster),
        # odd gets odd
        assert all(c % 2 == 0 for c in by_q[4])
        assert all(c % 2 == 1 for c in by_q[5])

    def test_empty_cluster_keeps_previous_centroid(self, spark):
        from etl_work_flow_for_big_data_spark.operators.similarity import (
            kmeans_refine,
        )

        df = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [1.0, 0.01]), (2, [1.0, 0.02])],
            "vec_id long, embedding array<float>",
        )
        # centroid 99 is far from every vector -> empty cluster
        init = [(0, [1.0, 0.0]), (99, [-1.0, 0.0])]
        refined = kmeans_refine(df, "vec_id", "embedding", init, iters=1)
        got = dict(refined)
        assert got[99] == [-1.0, 0.0]  # unchanged
        assert got[0] != [1.0, 0.0]  # moved to the members' mean

    # -- r11 property pins (VERDICT r10 stretch #7): iters>0 is
    # library-only (FP-order exempts refined means from a hash
    # oracle, correctly), so its SEMANTICS are pinned by properties
    # instead of values.

    def test_inertia_non_decreasing_per_lloyd_iteration(self, two_clusters):
        """Lloyd's invariant: each assign+recenter step cannot worsen
        the spherical objective. Checked per ITERATION (not just
        end-to-end) by refining cumulatively and scoring after each
        step; small FP slack because means re-associate across
        partitions."""
        from etl_work_flow_for_big_data_spark.operators.similarity import (
            kmeans_inertia,
            kmeans_refine,
        )

        cents = [
            (r["vec_id"], list(r["embedding"]))
            for r in two_clusters.filter("vec_id < 2").collect()
        ]
        objective = [
            kmeans_inertia(two_clusters, "vec_id", "embedding", cents)
        ]
        for _ in range(3):
            cents = kmeans_refine(
                two_clusters, "vec_id", "embedding", cents, iters=1
            )
            objective.append(
                kmeans_inertia(two_clusters, "vec_id", "embedding", cents)
            )
        for before, after in zip(objective, objective[1:]):
            assert after >= before - 1e-9, objective

    def test_assignment_deterministic_at_fixed_centroids(self, two_clusters):
        """At fixed centroids the assignment step (rounded cosine +
        centroid-id tie-break) is a pure function of the data — two
        runs over the same frame must agree label-for-label. This is
        the half of Lloyd that IS hash-oracle-able, and the reason
        ivf_topk at iters=0 can carry a hard oracle at all."""
        from etl_work_flow_for_big_data_spark.operators.similarity import (
            _ivf_scored_assign,
        )

        def labels():
            _, _, _, assigned = _ivf_scored_assign(
                two_clusters, "vec_id", "embedding",
                n_centroids=2, kmeans_iters=0,
            )
            return {
                r["vec_id"]: r["cluster"]
                for r in assigned.collect()
            }

        a, b = labels(), labels()
        assert a == b and len(a) == two_clusters.count()


def test_multiprobe_recall_superset(spark):
    """Multi-probe candidates are a strict superset of single-probe
    candidates (same buckets probed plus 8 Hamming-1 neighbors), so
    per-query recall vs the exact answer can only improve."""
    from etl_work_flow_for_big_data_spark.operators.similarity import ann_lsh_topk

    rows = [
        (i, [float(((i * 7 + j * 3) % 13) - 6) for j in range(8)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id < 4")
    single = ann_lsh_topk(q, df, "vec_id", "embedding", k=50, n_planes=8, dim=8)
    multi = ann_lsh_topk(
        q, df, "vec_id", "embedding", k=50, n_planes=8, dim=8, multi_probe=True
    )
    s = {(r["q_vec_id"], r["c_vec_id"]) for r in single.collect()}
    m = {(r["q_vec_id"], r["c_vec_id"]) for r in multi.collect()}
    assert s <= m
    assert len(m) > len(s)  # probing actually widened the net


def test_ann_near_dup_pairs_probe_lattice(spark):
    """The dedup-pair family's containment lattice (r13): single-probe
    ⊆ Hamming-1 multi-probe ⊆ exact all-pairs — every ANN pair is a
    true pair (verify step is exact cosine), and widening the probe
    set only ADDS pairs. Identical planted vectors share every plane,
    so even single-probe must catch them."""
    from etl_work_flow_for_big_data_spark.operators.similarity import (
        ann_near_dup_pairs,
        cosine_pairs,
    )

    rows = [
        (i, [float(((i * 7 + j * 3) % 13) - 6) for j in range(8)])
        for i in range(80)
    ]
    rows.append((900, rows[5][1]))  # planted exact duplicate of id 5
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def pairs(**kw):
        return {
            (r["d1"], r["d2"])
            for r in ann_near_dup_pairs(
                df, "vec_id", "embedding", threshold=0.4, n_planes=8,
                dim=8, **kw,
            ).collect()
        }

    single = pairs()
    h1 = pairs(multi_probe=True)
    l2 = pairs(n_tables=2)
    l4 = pairs(n_tables=4)
    exact = {
        (r["d1"], r["d2"])
        for r in cosine_pairs(
            df, "vec_id", "embedding", threshold=0.4, dim=8
        ).collect()
    }
    assert single <= h1 <= exact
    # L-tables lever: table 0 of every L-table family IS the
    # single-table family, so candidates grow monotonically with L
    # and stay inside the exact set
    assert single <= l2 <= l4 <= exact
    assert (5, 900) in single  # identical vectors: same bucket, caught
    assert len(h1) > len(single)  # probing actually widened the net
    assert len(l4) > len(single)  # extra tables actually widened the net


def test_ragged_leading_row_cannot_hijack_batch_dim(spark):
    """A corrupted (wrong-dimension) row must only degrade ITSELF.

    _as_matrix used to take the batch width from the first well-formed
    row, so a short row leading an Arrow batch NaN-blanked every good
    row behind it (silently dropping the whole batch's pairs) and a
    long one could IndexError the fold. The width now comes from the
    caller's expected dim (broadcast corpus / paired block) or, absent
    that, the batch's modal length — either way the single ragged row
    becomes the NaN row, never the dim-setter. coalesce(1) forces all
    rows into ONE batch with the ragged row first (ids ascending), the
    exact hijack layout."""
    from etl_work_flow_for_big_data_spark.operators.similarity import (
        cosine_pairs,
    )

    rows = [
        (0, [1.0, 0.0, 0.0]),  # ragged: corpus is 2-dim
        (1, [1.0, 1.0]),
        (2, [1.0, 0.9]),
        (3, [7.0]* 9),         # ragged long: must not IndexError the fold
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).coalesce(1)

    got = {
        (r["d1"], r["d2"]): r["cos_sim"]
        for r in cosine_pairs(df, "vec_id", "embedding", 0.9).collect()
    }
    assert (1, 2) in got and got[(1, 2)] >= 0.9
    assert not any(0 in p or 3 in p for p in got)

    from etl_work_flow_for_big_data_spark.functions.kernels import (
        pairwise_cosine,
    )

    corpus = [(1, [1.0, 1.0]), (2, [1.0, 0.9])]
    raw = pairwise_cosine(df, "vec_id", "embedding", corpus, mode="pairs").collect()
    assert {(r["d1"], r["d2"]) for r in raw} == {(1, 2)}

    # modal inference (no expected dim): ties break toward the larger
    # width, deterministically — row order must not matter
    import pandas as pd

    from etl_work_flow_for_big_data_spark.functions.kernels import _as_matrix

    m = _as_matrix(pd.Series([[1.0, 2.0, 3.0], [4.0, 5.0], [6.0, 7.0]]))
    assert m.shape == (3, 2)
    t = _as_matrix(pd.Series([[1.0], [2.0, 3.0]]))
    assert t.shape == (2, 2)


def test_contract_dim_overrides_majority_corrupt_block(spark):
    """With the contract ``dim`` passed, even a block where corrupted
    same-width rows OUTNUMBER the good ones cannot hijack the width —
    without it, modal inference would pick the corrupt majority's
    width and silently NaN the in-contract rows (partition-dependent
    output, which the invariance axis forbids). sim_pairs passes the
    fixture dim for exactly this reason."""
    rows = [
        (0, [9.0, 9.0, 9.0]),  # corrupt majority: three 3-dim rows
        (1, [8.0, 8.0, 8.0]),
        (2, [7.0, 7.0, 7.0]),
        (3, [1.0, 1.0]),       # in-contract 2-dim pair
        (4, [1.0, 0.9]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).coalesce(1)
    got = {
        (r["d1"], r["d2"])
        for r in cosine_pairs(df, "vec_id", "embedding", 0.9, dim=2).collect()
    }
    assert (3, 4) in got
    assert all(p == (3, 4) for p in got)


def test_ann_recall_pinned_on_planted_neighbors(spark):
    """Recall@5 is a TRACKED number, not just a superset relation.

    The r6 MinHash-seed bug proved the failure mode is real: a hash
    family can drift (per-plan-build seeds, banding changes) without
    any correctness test going red, silently destroying recall. This
    pin makes that a red test. The fixture is deterministic planted
    geometry, not the driver's random embeddings: isotropic random
    vectors have no genuinely-near neighbors (their exact top-5 sit
    near cos 0.5, where any sublinear ANN legitimately has ~0 recall
    — measured 0.00/0.20 on sf0.01), while LSH's contract is recall
    of NEAR neighbors. Each query q gets 5 planted neighbors at exact
    angle cos=0.99 (w = v*cos(phi) + u*sin(phi), u unit orthogonal),
    where theory gives single-probe recall ~(1-phi/pi)^8 ~ 0.69 and
    Hamming-1 multiprobe ~0.95 for 8 planes."""
    import numpy as np

    from etl_work_flow_for_big_data_spark.operators.similarity import (
        ann_lsh_topk,
        topk_cosine,
    )

    rng = np.random.default_rng(7701)
    dim, cos_target = 64, 0.99
    sin_target = math.sqrt(1.0 - cos_target**2)
    rows = []
    vid = 1000
    for qi in range(8):  # 8 queries x 5 planted + 40 background
        v = rng.standard_normal(dim)
        v /= np.linalg.norm(v)
        rows.append((qi, [float(x) for x in v]))
        for _ in range(5):
            u = rng.standard_normal(dim)
            u -= (u @ v) * v
            u /= np.linalg.norm(u)
            w = cos_target * v + sin_target * u
            rows.append((vid, [float(x) for x in w]))
            vid += 1
    for _ in range(40):
        b = rng.standard_normal(dim)
        rows.append((vid, [float(x / np.linalg.norm(b)) for x in b]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id < 8")
    truth = {
        (r["q_vec_id"], r["c_vec_id"])
        for r in topk_cosine(q, df, "vec_id", "embedding", k=5).collect()
    }
    assert len(truth) == 40  # 8 queries x top-5 (the planted neighbors)

    def recall(multi_probe: bool) -> float:
        got = {
            (r["q_vec_id"], r["c_vec_id"])
            for r in ann_lsh_topk(
                q, df, "vec_id", "embedding", k=5, multi_probe=multi_probe
            ).collect()
        }
        return len(got & truth) / len(truth)

    single, multi = recall(False), recall(True)
    # deterministic fixture + deterministic md5 hash family => these
    # are exact, stable numbers (measured single=0.90, multi=1.00);
    # the floors leave margin only for a deliberate parameter retune,
    # not for silent hash-family drift
    assert single >= 0.6, f"single-probe recall@5 regressed: {single}"
    assert multi >= 0.8, f"multiprobe recall@5 regressed: {multi}"
    assert multi >= single


def test_score_block_two_phase_bit_identical_to_pure_fold():
    """The r9 two-phase kernel (BLAS candidate pass + exact fold
    rescore of survivors) must emit EXACTLY the pure fold path's
    pairs and bit-identical cos_raw values — across modes, prefilter
    positions (below/inside/above the score mass), and degenerate
    rows (zero vectors → NaN cosine, NaN rows). The margin admits
    extra candidates but phase 2 re-judges every one with the exact
    fold, so results cannot depend on which phase ran."""
    import numpy as np
    import pandas as pd

    from etl_work_flow_for_big_data_spark.functions import kernels as K

    def pure_fold(ids_a, A, ids_b, B, norms_b, mode, prefilter):
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = K._fold_dot(A, B) / np.sqrt(
                K._fold_norm_sq(A)[:, None] * norms_b[None, :]
            )
        if mode == "pairs":
            keep = ids_a[:, None] < ids_b[None, :]
        elif mode == "all":
            keep = ids_a[:, None] != ids_b[None, :]
        else:
            keep = np.ones((len(ids_a), len(ids_b)), dtype=bool)
        keep &= ~np.isnan(cos)
        if prefilter is not None:
            keep &= cos >= prefilter
        r, c = np.nonzero(keep)
        return pd.DataFrame(
            {"d1": ids_a[r], "d2": ids_b[c], "cos_raw": cos[r, c]}
        )

    rng = np.random.default_rng(7)
    for trial in range(10):
        n, m = int(rng.integers(1, 200)), int(rng.integers(1, 300))
        A = rng.normal(size=(n, 64))
        B = rng.normal(size=(m, 64))
        for M in (A, B):
            for _ in range(3):
                M[rng.integers(0, M.shape[0])] = 0.0
                M[rng.integers(0, M.shape[0])] = np.nan
        ids_a = rng.integers(0, 500, n)
        ids_b = rng.integers(0, 500, m)
        nb = K._fold_norm_sq(B)
        for mode in ("pairs", "all", "full"):
            for pf in (0.4 - 1e-6, -0.2, 0.9999):
                want = pure_fold(ids_a, A, ids_b, B, nb, mode, pf)
                got = K._score_block(ids_a, A, ids_b, B, nb, mode, pf)
                key = ["d1", "d2", "cos_raw"]
                assert want.sort_values(key).reset_index(drop=True).equals(
                    got.sort_values(key).reset_index(drop=True)
                ), (trial, mode, pf)


def test_cosine_pairs_survives_downstream_column_pruning(spark):
    """Regression (r9, found by dedup_embedding): x and y sides of the
    pair grid derive from one `src` plan, so identically-named
    pass-through columns carried IDENTICAL attribute ids into the
    cogroup — and a consumer that reads only part of the UDF output
    (here: just d2, the anti-join drop-set shape) let Catalyst prune
    the right child's pid/pv as 'already provided by the left',
    crashing the kernel with KeyError('pv'). The y side now realiases
    to fresh attribute ids; consuming any single output column must
    work."""
    from etl_work_flow_for_big_data_spark.operators.similarity import cosine_pairs

    rows = [(i, [float(i == j) for j in range(8)]) for i in range(6)]
    rows += [(100, [1.0] + [0.0] * 7)]  # exact duplicate direction of vec 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = cosine_pairs(df, "vec_id", "embedding", threshold=0.9, dim=8)
    drop = {r["d2"] for r in pairs.select("d2").distinct().collect()}
    assert drop == {100}


class TestIvfNprobe:
    """nprobe — the standard IVF recall lever (r10): a true neighbor
    just across a cluster boundary is found by also searching the
    query's 2nd..nth nearest clusters; only the query side fans out."""

    @pytest.fixture(scope="class")
    def boundary_corpus(self, spark):
        # centroid directions e0, e1; query 10 sits in cluster 0;
        # its TRUE nearest neighbor 20 leans toward e1 just enough to
        # be ASSIGNED to cluster 1 while still closest to the query —
        # the cross-boundary miss nprobe exists for. Background
        # vectors fill both clusters.
        rows = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (10, [0.9, 0.40, 0.0, 0.0]),   # query: cluster 0
            (20, [0.72, 0.73, 0.0, 0.0]),  # its nearest; cluster 1
            (30, [1.0, 0.05, 0.2, 0.0]),   # cluster-0 background
            (31, [0.95, 0.0, 0.0, 0.2]),
            (40, [0.0, 1.0, 0.2, 0.0]),    # cluster-1 background
            (41, [0.05, 0.95, 0.0, 0.2]),
        ]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )

    def _neighbors(self, corpus, nprobe):
        from etl_work_flow_for_big_data_spark.operators.similarity import (
            ivf_topk,
        )

        out = ivf_topk(
            corpus, [10], "vec_id", "embedding",
            n_centroids=2, k=1, nprobe=nprobe,
        ).collect()
        return [(r["q_vec_id"], r["rank"], r["c_vec_id"]) for r in out]

    def test_nprobe_recovers_cross_boundary_neighbor(self, boundary_corpus):
        # single-probe searches cluster 0 only -> best is a background
        # vector; nprobe=2 reaches cluster 1 and finds the true top-1
        assert self._neighbors(boundary_corpus, 1)[0][2] != 20
        assert self._neighbors(boundary_corpus, 2)[0] == (10, 1, 20)

    def test_nprobe_equals_one_matches_default(self, boundary_corpus):
        from etl_work_flow_for_big_data_spark.operators.similarity import (
            ivf_topk,
        )

        a = sorted(
            tuple(r)
            for r in ivf_topk(
                boundary_corpus, [10, 30], "vec_id", "embedding",
                n_centroids=2, k=3,
            ).collect()
        )
        b = sorted(
            tuple(r)
            for r in ivf_topk(
                boundary_corpus, [10, 30], "vec_id", "embedding",
                n_centroids=2, k=3, nprobe=1,
            ).collect()
        )
        assert a == b

    def test_nprobe_validates(self, boundary_corpus):
        from etl_work_flow_for_big_data_spark.operators.similarity import (
            ivf_topk,
        )

        with pytest.raises(ValueError, match="nprobe"):
            ivf_topk(boundary_corpus, [10], "vec_id", "embedding", nprobe=0)

    def test_nprobe_composes_with_refinement(self, boundary_corpus):
        from etl_work_flow_for_big_data_spark.operators.similarity import (
            ivf_topk,
        )

        out = ivf_topk(
            boundary_corpus, [10], "vec_id", "embedding",
            n_centroids=2, k=1, kmeans_iters=2, nprobe=2,
        ).collect()
        assert [(r["q_vec_id"], r["rank"], r["c_vec_id"]) for r in out] == [
            (10, 1, 20)
        ]


def test_quantize_embedding_contract(spark):
    """Int8 quantization invariants: |q| ≤ 127 with the max-magnitude
    component hitting exactly ±127, scale reconstructs magnitudes to
    within half a step, and cosine on q matches cosine on the floats
    to quantization error (scale cancellation — the property that lets
    ANN rank without dequantizing)."""
    import math

    from etl_work_flow_for_big_data_spark.functions.vectors import (
        cosine,
        quantize_embedding,
    )

    df = spark.createDataFrame(
        [
            (1, [0.5, -1.0, 0.25, 0.0]),
            (2, [0.51, -0.98, 0.26, 0.01]),   # near-dup of 1
            (3, [-0.1, 0.0, 2.0, -2.0]),      # tie at max magnitude
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {
        r["vec_id"]: r
        for r in df.select(
            "vec_id",
            "embedding",
            quantize_embedding(F.col("embedding")).alias("qz"),
        ).collect()
    }
    for r in rows.values():
        q, scale = r["qz"]["q"], r["qz"]["scale"]
        assert max(abs(x) for x in q) == 127
        assert all(abs(x) <= 127 for x in q)
        # dequantized components reconstruct within half a step
        for orig, qi in zip(r["embedding"], q):
            assert abs(qi * scale - orig) <= scale / 2 + 1e-12
    # scale-invariance: cosine(q1, q2) ≈ cosine(v1, v2)
    got = (
        df.alias("a").join(df.alias("b"), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("i"),
            F.col("b.vec_id").alias("j"),
            cosine(F.col("a.embedding"), F.col("b.embedding")).alias("cf"),
            cosine(
                quantize_embedding(F.col("a.embedding"))["q"],
                quantize_embedding(F.col("b.embedding"))["q"],
            ).alias("cq"),
        )
        .collect()
    )
    assert len(got) == 3
    for r in got:
        assert math.isfinite(r["cq"]) and abs(r["cq"] - r["cf"]) < 0.01, r


def test_quantize_embedding_is_total(spark):
    """r11 ADVICE: out-of-domain rows — zero vector, NaN or inf
    component, NULL array — yield a NULL struct instead of an ANSI
    divide/cast error killing the task (the module's totality
    convention, matching cosine's try_divide fix); valid rows take the
    byte-identical arithmetic path as before."""
    from etl_work_flow_for_big_data_spark.functions.vectors import (
        quantize_embedding,
    )

    df = spark.createDataFrame(
        [
            (1, [0.5, -1.0]),
            (2, [0.0, 0.0]),
            (3, [float("nan"), 1.0]),
            (4, [float("inf"), 1.0]),
            (5, None),
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {
        r["vec_id"]: r["qz"]
        for r in df.select(
            "vec_id", quantize_embedding(F.col("embedding")).alias("qz")
        ).collect()
    }
    # valid row: mx=1.0 → q = [round(63.5), -127] = [64, -127] (HALF_UP)
    assert rows[1] is not None
    assert list(rows[1]["q"]) == [64, -127]
    assert abs(rows[1]["scale"] - 1.0 / 127.0) < 1e-15
    for bad in (2, 3, 4, 5):
        assert rows[bad] is None, bad
