"""Vector/embedding functions (SURVEY.md §2.I I3/I5).

Pure Catalyst higher-order expressions over ``array<float>`` columns —
no UDFs, no ml-lib dependency. All arithmetic is double-precision with
left-to-right accumulation so an oracle that mirrors the formula
reproduces bit-identical results (FP addition is order-sensitive; we
fix the order instead of hoping).

At 100 TB: these are narrow per-row expressions; the join strategy of
the calling operator (broadcast queries / LSH buckets) is what decides
cost — see operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in doubles, accumulated left-to-right (DuckDB mirror:
    ``list_reduce(list_transform(range(1, len(a)+1), i ->
    CAST(a[i] AS DOUBLE) * CAST(b[i] AS DOUBLE)), (x,y) -> x+y)``)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_sq(a: Column) -> Column:
    return dot(a, a)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity = dot / sqrt(|a|²·|b|²), TOTAL: a zero-norm
    side yields NULL instead of an ANSI DIVIDE_BY_ZERO that kills the
    task — under Spark 4's ANSI default a plain ``/`` made one zero
    vector landing in an LSH bucket abort the whole query (found by
    the seeded fuzz sweep). ``try_divide`` exactly mirrors DuckDB,
    whose double division by zero is natively NULL (x/0.0 → NULL,
    0.0/0.0 → NULL — probed, not assumed), so the unfiltered
    pure-Catalyst paths stay engine-identical; NaN components still
    propagate NaN on both engines and sort as greatest on both."""
    return F.try_divide(dot(a, b), F.sqrt(norm_sq(a) * norm_sq(b)))


def is_valid_embedding(a: Column, dim: int | None = None) -> Column:
    """The domain where cosine is defined: a non-NULL vector with a
    finite, strictly positive self-dot — and, when ``dim`` is given,
    exactly that width. Excludes NULL vectors, zero vectors (0/0
    cosine), vectors with NaN/Inf components, and (with ``dim``)
    wrong-width vectors — all of which diverge between engines and
    none of which is a meaningful similarity candidate. The width
    check matters: a list-indexed SQL mirror silently computes a
    PREFIX dot against a longer vector (found by the r9 ragged
    probe — Spark's fixed-width kernel excluded a 32-dim row while
    the oracle paired it), so width is part of the domain, not an
    assumption.

    DuckDB mirror: ``isfinite(<selfdot>) AND <selfdot> > 0``
    (a NULL self-dot fails both), plus ``len(v) = <dim>``.
    """
    sd = norm_sq(a)
    ok = (
        sd.isNotNull()
        & ~F.isnan(sd)
        & (sd != F.lit(float("inf")))
        & (sd > 0)
    )
    if dim is not None:
        ok = ok & (F.size(a) == dim)
    return ok


def lsh_hyperplane_sig(
    vec_sql: str, n_planes: int = 8, dim: int = 64, plane_offset: int = 0
) -> Column:
    """Deterministic random-hyperplane LSH signature (int bucket id)
    for the vector column named by ``vec_sql``.

    Plane weights are pseudo-random ints derived from md5 —
    ``w(p,i) = (int(md5(p_i)[:4], 16) % 1001) - 500`` — so any engine
    mirroring the formula computes identical buckets. Bit p of the
    signature is set iff the projection of ``vec`` onto plane p is
    ≥ 0. Cosine-preserving: near vectors collide with high probability.

    ``plane_offset`` selects an INDEPENDENT hash family from the same
    md5 stream (planes ``offset .. offset+n_planes-1``): table t of an
    L-table LSH uses ``offset = t * n_planes``, giving L families that
    are deterministic, non-overlapping, and mirrorable by any engine
    that follows the same formula. Bit positions inside the signature
    stay 0-based regardless of offset, so every table yields a
    comparable ``[0, 2^planes)`` bucket id.

    DuckDB mirror: same double-precision left-to-right fold with
    ``CAST('0x' || substring(md5(p || '_' || i), 1, 4) AS INT)``.

    The weights are row-independent CONSTANTS, so they are materialized
    at plan-build time (hashlib md5 — verified identical to the engine
    md5 on these ASCII keys) and embedded as a literal matrix: the
    inlined-md5 form recomputed planes×dim interpreted md5 calls PER
    ROW (512/row at the defaults), measured ~2× this query's cost.
    """
    import hashlib

    def w(p: int, i: int) -> int:
        return int(hashlib.md5(f"{p}_{i}".encode()).hexdigest()[:4], 16) % 1001 - 500

    weights = ", ".join(
        "array(" + ", ".join(str(w(p, i)) for i in range(1, dim + 1)) + ")"
        for p in range(plane_offset, plane_offset + n_planes)
    )
    return F.expr(
        f"""
        element_at(transform(array(array({weights})), ws ->
          aggregate(sequence(0, {n_planes - 1}), 0, (sig, p) -> sig + IF(
            aggregate(sequence(1, {dim}), CAST(0.0 AS DOUBLE),
              (acc, i) -> acc +
                element_at(element_at(ws, p + 1), i)
                * CAST(element_at({vec_sql}, i) AS DOUBLE)
            ) >= 0, shiftleft(1, p), 0))
        ), 1)
        """
    )


def quantize_embedding(a: Column) -> Column:
    """Symmetric int8 quantization of a float embedding — the 100-TB
    storage/bandwidth lever for ANN: an int8 posting list scans ~4×
    less than float32 (and ~8× less than float64), and COSINE IS
    SCALE-INVARIANT, so ranking on the quantized vectors needs no
    dequantization at all (per-vector scale = max|x|/127 cancels out
    of dot/√(n·n)).

    Returns ``struct(scale double, q array<int>)`` where
    ``q_i = round((x_i · 127) / max|x|)`` — by construction
    |q_i| ≤ 127, so no clamp branch exists to diverge. The arithmetic
    order is FIXED ((x·127)/mx, not x/(mx/127)) because the two
    associations differ in floating point and the oracle must mirror
    bit-for-bit. Rounding: Spark's ROUND on double is BigDecimal
    HALF_UP (= half away from zero) on the exact binary value;
    DuckDB's round() on double is the same half-away-from-zero —
    fuzz-swept, not assumed. Domain: callers filter with
    :func:`is_valid_embedding` first (a zero vector has no scale).
    TOTAL anyway (r11 advice, the module's try_divide convention): an
    out-of-domain row — zero vector, NaN or ±inf component — yields a
    NULL struct instead of an ANSI divide/cast error killing the task;
    in-domain arithmetic is byte-identical to before (the validity
    test gates the same `/` and ANSI cast, so valid rows take the
    exact same expression path the oracle mirrors).

    DuckDB mirror::

        SELECT list_max(list_transform(v, x -> abs(CAST(x AS DOUBLE))))
                 / 127.0                                        AS scale,
               list_transform(v, x -> CAST(round(
                 (CAST(x AS DOUBLE) * 127.0) /
                 list_max(list_transform(v, x -> abs(CAST(x AS DOUBLE))))
               ) AS INT))                                       AS q
    """
    mx = F.array_max(F.transform(a, lambda x: F.abs(x.cast("double"))))
    q = F.transform(
        a, lambda x: F.round((x.cast("double") * F.lit(127.0)) / mx).cast("int")
    )
    # mx > 0 excludes the zero vector; a NaN component makes mx NaN
    # (NaN is greatest in Spark's double ordering) and an inf component
    # makes mx inf — both fail the finite test, so inside the valid
    # branch every |q_i| <= 127 and the ANSI cast cannot throw
    valid = (mx > 0) & ~F.isnan(mx) & (mx < F.lit(float("inf")))
    return F.when(
        valid, F.struct((mx / F.lit(127.0)).alias("scale"), q.alias("q"))
    )
