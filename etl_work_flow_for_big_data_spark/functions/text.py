"""Text-analysis functions for LLM-training-data pipelines
(SURVEY.md §2.I I1-I4): tokenization, shingling, MinHash, SimHash,
language scoring, quality metrics, fingerprinting.

All pure Catalyst expressions (split/transform/aggregate/md5) — no
Python UDFs, so they whole-stage-codegen and shuffle nothing beyond
what the calling query asks for. Hashes use md5 hex (cross-engine
deterministic: identical in DuckDB), with numeric variants via
``conv(hex, 16, 10)``.

At 100 TB: everything here is per-row (narrow); the expensive parts of
dedup are the joins in :mod:`..operators.dedup`, not these functions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny English stopword set for language scoring (word-soup fixture
#: vocabulary includes 'the' and 'a'; real deployments swap in a per-
#: language list — the operator shape is what matters)
EN_STOPWORDS = ["the", "a", "of", "to", "and", "in"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization; drops empty tokens."""
    return F.filter(F.split(text, " "), lambda t: F.length(t) > 0)


def distinct_tokens(text: Column) -> Column:
    return F.array_distinct(tokens(text))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_tokens(text: Column, pattern: str = "[a-z]+|[0-9]+") -> Column:
    """Regex-based (BPE-ish) token extraction; count with F.size."""
    return F.regexp_extract_all(text, F.lit(pattern), 0)


def shingles(text: Column, k: int = 5) -> Column:
    """Distinct word k-gram shingles (space-joined).

    The token array is bound ONCE as a lambda variable (via a 1-element
    array transform): naively referencing ``tokens(text)`` in the size
    bound and the slice source makes Catalyst re-tokenize per shingle —
    no common-subexpression elimination across lambda bodies — measured
    5× slower on the dedup family at sf0.1."""

    def build(t: Column) -> Column:
        # guard: fewer than k tokens → NO shingles. (sequence(1, n-k+1)
        # with n<k counts DOWN in Spark — [1, 0] — and slice(start=0)
        # throws; the naive greatest(...,0) bound had this latent crash)
        idx = F.sequence(F.lit(1), F.size(t) - (k - 1))
        return F.when(
            F.size(t) >= k,
            F.array_distinct(
                F.transform(idx, lambda i: F.array_join(F.slice(t, i, k), " "))
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(tokens(text)), build), 1)


def hash_hex(col: Column, prefix: str = "") -> Column:
    """md5 hex of (prefix || col) — cross-engine deterministic."""
    return F.md5(F.concat(F.lit(prefix), col)) if prefix else F.md5(col)


def hash_int16(col: Column) -> Column:
    """16-bit int from the first 4 md5 hex chars (DuckDB mirror:
    ``CAST('0x' || substring(md5(x),1,4) AS INT)``)."""
    return F.conv(F.substring(F.md5(col), 1, 4), 16, 10).cast("int")


def round4_ratio(num: Column, den: Column) -> Column:
    """``round(num/den, 4)`` (HALF_UP) computed in exact integer
    arithmetic for integral ``num``/``den`` (``den > 0``).

    Why not ``F.round(num/den, 4)``: double rounding diverges between
    engines at half boundaries — Spark rounds the binary expansion of
    the quotient (BigDecimal HALF_UP) while DuckDB rounds the rescaled
    double, so a ratio within 1 ulp of ``.xxxx5`` can flip either way
    (caught by the sf0.1 oracle sweep on ``text_quality``). Integer
    form: ``(20000*num + den) intdiv (2*den) / 10000.0`` — both
    engines then divide identical integers and emit bit-identical
    doubles. intdiv is expressed as ``(a - pmod(a, b)) / b``: the
    double division is exact because the true quotient is integral and
    < 2^53. Exactness bound: ``20000*num + den < 2^53`` (holds through
    num ~ 4.5e11 — far beyond any per-document count).

    DuckDB mirror: ``((20000*(num) + (den)) // (2*(den))) / 10000.0``
    (DuckDB ``len``/COUNT are already BIGINT).

    ``den = 0`` (e.g. a zero-token document) yields NULL, matching
    DuckDB's ``// 0`` — via ``try_mod``, because under ANSI mode
    (Spark 4 default) a plain ``pmod(a, 0)`` ERRORS and one degenerate
    record must not kill the task. num/den are non-negative by
    contract, so try_mod's %-semantics equal pmod here.
    """
    a = F.lit(20000) * num.cast("long") + den.cast("long")
    b = F.lit(2) * den.cast("long")
    return (a - F.try_mod(a, b)) / b / F.lit(10000.0)


def _scaled_long_term(x: Column, scale: int) -> Column:
    """``x·scale`` rounded half-away-from-zero to long, PER TERM, in
    pure codegen arithmetic: ``trunc(v + sign(v)·0.5)`` (double→long
    cast truncates toward zero, so adding a signed half implements
    half-away exactly). This matches DuckDB's ``ROUND`` — which rounds
    the BINARY double half away from zero — at every representable
    point, unlike ``F.round``, whose BigDecimal HALF_UP on the
    double's shortest DECIMAL repr both diverges on repr-boundary
    values (the seed-80118 class) and costs a per-row BigDecimal
    allocation (~1.7× on rate_charge at sf0.1, measured r9).

    The signed half is only added while ``|v| < 2^52``: above that,
    every double IS an integer (round is the identity on both
    engines) and ``v + 0.5`` would round-to-nearest-even UP for odd
    mantissas, mis-rounding where duck doesn't. NaN/±Inf fall through
    the guard to ``v + 0.0`` and try_cast to NULL, duck's TRY_CAST
    mirroring; an over-long v is NULL on both for the same reason
    (Spark try_cast range check, duck TRY_CAST range check on the
    SAME double) — EXCEPT the one double exactly at 2^63, where
    Spark's range check compares against Long.MaxValue.toDouble
    (which rounds UP to 2^63) and SATURATES to long max while duck
    rejects to NULL; the explicit ``w < 2^63`` guard pins duck's
    behavior (found by the r9 boundary-identity pin; -2^63 is a
    legal long and needs no guard). The full cross-engine identity —
    every regime, both engines, one formula — is pinned by
    ``test_scaled_long_term_cross_engine_total_identity``."""
    v = x * F.lit(float(scale))
    half = F.when(
        F.abs(v) < F.lit(float(2**52)), F.signum(v) * F.lit(0.5)
    ).otherwise(F.lit(0.0))
    w = v + half
    return F.when(w < F.lit(float(2**63)), w.try_cast("long"))


def rounded_mean(x: Column, out_dec: int) -> Column:
    """``ROUND(AVG(x), out_dec)`` (HALF away from zero) computed
    integer-exactly for inputs under the fixtures' 2-DECIMAL numeric
    contract — an AGGREGATE expression.

    Why not ``F.round(F.avg(x), d)``: an average of 2-dec values over
    a small group can land EXACTLY on a rounding half boundary (a
    2-row group summing to -11479.45 averages to -5739.725), where
    Spark's BigDecimal HALF_UP on the binary expansion and DuckDB's
    rescaled-double rounding split — found by fuzz seed 61016. Fix as
    in ``round4_ratio``: make both engines divide identical integers.
    ``C = SUM(ROUND(x·100) as long)`` is PER-TERM integer-exact: each
    2-dec term scaled by 100 sits within one ulp of its integer (never
    near .5 — a double ≤ ~4.5e13 scaled has ulp < 0.5 ≪ the 0.5 gap),
    so both engines round every term to the identical long, and the
    long SUM is drift-free at ANY group size. (The earlier
    ``ROUND(SUM(x)·100)``-after-a-double-sum form was only exact while
    the SCALED SUM stayed within double's exact-integer range, 2^53,
    and accumulated ~ulp·√n random-walk drift on large groups — the
    r8-judge advice item this replaces.) Then half-away rounding to
    ``d`` decimals is exact integer arithmetic:
    ``round(C·10^(d-2)/(100·n·10^(d-2)), d) = sign · ((2|D| + n)
    intdiv 2n) / 10^d`` with ``D = C·10^(d-2)``. intdiv is Spark's
    ``div`` (IntegralDivide — exact over the decimal(38,0)
    accumulator, result long; the earlier ``(a - try_mod(a,b))/b``
    double-division form lost exactness once ``2|D|+n`` crossed
    2^53, where the DuckDB mirror's HUGEINT ``//`` stayed exact).
    Under ANSI, ``div`` by a zero divisor ERRORS, so the zero-count
    case is when-guarded to NULL. An
    all-NULL group propagates NULL. A ±Inf/NaN/over-long TERM —
    outside the fixed-point contract — try_casts to NULL and is
    SKIPPED by both SUM and the matching COUNT (n counts the casted
    term, not x, so the divisor always matches the summed population;
    duck's TRY_CAST mirrors the NULL).

    MAGNITUDE CONTRACT: the accumulator and the ``·10^(out_dec-2)``
    rescale run in ``decimal(38,0)`` — a long would overflow in the
    ``2·|SUM(x)·100|·10^(out_dec-2)`` intermediate while every INPUT
    term is a legal long (r9 bignum fuzz seeds 90003/90008/90020:
    ANSI kills the task where duck's HUGEINT widens; same class the
    decimal accumulator fixed in ``rounded_sum``). The final
    ``div`` collapses back to long, which fits whenever the OUTPUT
    does: q = mean·10^out_dec ≤ max-term·10^(out_dec-2) < 2^63 by
    the per-term bound. Per-TERM bound: |x|·100 < 2^52 (~4.5e13)
    keeps each term's ulp below 0.5 so the per-term round is
    unambiguous on both engines (above that the round is the
    identity on both — see ``_scaled_long_term``); over-long terms
    try_cast to NULL and are skipped by BOTH the sum and the
    matching COUNT on both engines.

    DuckDB mirror (``_duck_round_avg`` in ``queries/relational.py``,
    same aliases; T = TRY_CAST(ROUND(x*100, 0) AS BIGINT))::

        (CASE WHEN SUM(T) < 0 THEN -1 ELSE 1 END)
        * ((2*abs(SUM(T))*10^(d-2) + COUNT(T)) // (2*COUNT(T)))
        / 10^d.0
    """
    if out_dec < 2:
        raise ValueError("out_dec must be >= the 2-dec input contract")
    term = _scaled_long_term(x, 100)
    c = F.sum(term.cast("decimal(38,0)"))
    d = c * F.lit(10 ** (out_dec - 2))
    n = F.count(term)
    a = F.abs(d) * 2 + n
    b = n * 2
    q = F.when(b != 0, F.call_function("div", a, b))
    sign = F.when(d < 0, F.lit(-1.0)).when(d >= 0, F.lit(1.0))
    return sign * q / F.lit(float(10**out_dec))


def rounded_sum(x: Column, in_dec: int, out_dec: int = 2) -> Column:
    """``ROUND(SUM(x), out_dec)`` (HALF away from zero) computed
    integer-exactly for inputs on an ``in_dec``-decimal fixed-point
    contract (``in_dec > out_dec``) — an AGGREGATE expression.

    Why not ``F.round(F.sum(x), 2)``: the fixtures' numerics are 2-dec,
    and a sum of 2-dec values never nears a 2-dec half boundary — but
    the queries MANUFACTURE finer fixed-point through products
    (``l_extendedprice * rate`` is 4-dec, ``· (1+l_tax)`` is 6-dec),
    and a small group's product-sum can land exactly on ``.xx5``
    (fuzz seed 80118: a null-heavy trial shrank a tier group to ONE
    line, summing ``3017.1 * 0.05 = 150.855`` — Spark's BigDecimal
    HALF_UP on the double's shortest decimal repr gave 150.86, duck's
    rescaled-binary rounding 150.85). Same construction as
    ``rounded_mean``: ``C = SUM(ROUND(x·10^in_dec) as long)`` is
    PER-TERM integer-exact — each in_dec-fixed-point term scaled to
    integer sits within one ulp of it (never near .5 while the term's
    ulp < 0.5, see the per-term bound below), so both engines round
    every term to the identical long and the long SUM is drift-free
    at ANY group size. (The earlier ``ROUND(SUM(x)·10^in_dec)``-after-
    a-double-sum form accumulated ~ulp·√n random-walk drift — ~10-100
    scaled units on 150k-row groups at in_dec=6 — leaving a residual
    cross-engine divergence band when the true sum lay near a .xx5
    boundary, and was only exact below double's 2^53 integer range:
    the r8-judge advice item this replaces.) Then half-away rounding
    to ``out_dec`` is exact long arithmetic:
    ``sign · ((2|C| + P) div 2P) / 10^out_dec`` with
    ``P = 10^(in_dec-out_dec)``. ``div`` is by a nonzero constant, so
    no ANSI zero-divisor guard is needed.

    MAGNITUDE CONTRACT: the accumulator is ``decimal(38,0)`` — NOT
    long — because the flagship in_dec=6 charge column overflows a
    long sum at the very scale this engine targets (sf0.1 sums to
    ~2e8 → ~2e14 at the 100-TB SF≈1e5, i.e. |SUM·10^6| ≈ 2e20 ≫
    2^63; ANSI would kill the job loudly right where it matters).
    decimal(38) gives 1e38 of headroom, mirroring duck's
    SUM(BIGINT)→HUGEINT widening, and the final ``div`` collapses
    back to long — which must fit, i.e. |SUM|·10^out_dec < 2^63, a
    bound the OUTPUT (a rounded sum a human reads) satisfies by
    construction. Per-TERM bound: ``|x|·10^in_dec < 2^52`` keeps each
    term's ulp below 0.5 so the per-term round is unambiguous on both
    engines (above 2^52 the term is integral and the round is the
    identity on both — see ``_scaled_long_term``); a ±Inf/NaN/
    over-long term try_casts to NULL and is skipped by the sum on
    BOTH engines (duck's TRY_CAST mirrors the NULL).
    NULL/empty/all-invalid groups propagate NULL on both engines.

    DuckDB mirror: ``_duck_round_sum`` in ``queries/relational.py``.
    """
    if in_dec <= out_dec:
        raise ValueError("in_dec must exceed out_dec (plain ROUND is "
                         "already exact for sums at the input scale)")
    term = _scaled_long_term(x, 10 ** in_dec)
    c = F.sum(term.cast("decimal(38,0)"))
    p = 10 ** (in_dec - out_dec)
    q = F.call_function("div", F.abs(c) * 2 + F.lit(p), F.lit(2 * p))
    sign = F.when(c < 0, F.lit(-1.0)).when(c >= 0, F.lit(1.0))
    return sign * q / F.lit(float(10 ** out_dec))


def minhash_signature(shingle_arr: Column, n_hashes: int = 12) -> Column:
    """MinHash signature: hash function i is the lexicographic min over
    the shingle set of the i-th 4-hex-char WORD of
    ``md5((i div 8) # shingle)`` — one md5 yields 8 independent 16-bit
    hash functions, so 12 hashes cost 2 md5 evaluations per shingle
    instead of 12 (md5 dominates the signature stage; measured ~2.5×
    on dedup_minhash at sf0.1). Hex-string minima are order-isomorphic
    to numeric minima and identical across engines; the per-seed md5
    arrays are bound once (no CSE across Catalyst lambdas).

    DuckDB mirror: ``substring(md5((__i // 8) || '#' || __s),
    (__i % 8) * 4 + 1, 4)``.
    """
    n_seeds = (n_hashes + 7) // 8

    # Bind the seed through a factory so the transform lambda keeps
    # exactly ONE parameter. The obvious `lambda s, _seed=seed: ...`
    # is a trap: pyspark counts the lambda's parameters (defaults
    # included) and a two-parameter lambda receives the element INDEX
    # as its second argument — the bound default is silently replaced
    # by an unevaluated Column whose f-string repr ("Column<'y_N'>#")
    # becomes the hash prefix, with N from a per-plan-build counter.
    # That made the hash family differ from the documented formula AND
    # vary across plan builds (caught by the sf0.1 oracle sweep as a
    # candidate-set mismatch; sf0.01 passed by luck).
    def _seed_md5(seed: int):
        prefix = f"{seed}#"
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    seed_arrays = [
        F.transform(shingle_arr, _seed_md5(seed)) for seed in range(n_seeds)
    ]

    def build(hs: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(n_hashes - 1)),
            lambda i: F.array_min(
                F.transform(
                    F.element_at(hs, F.floor(i / 8).cast("int") + 1),
                    lambda h: F.substr(h, (i % 8) * 4 + 1, F.lit(4)),
                )
            ),
        )

    return F.element_at(F.transform(F.array(F.array(*seed_arrays)), build), 1)


def minhash_bands(sig: Column, n_bands: int = 4, rows_per_band: int = 3) -> Column:
    """LSH band keys: concat of each band's signature rows, prefixed by
    the band index (docs sharing any band key are candidate pairs)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.concat(
            b.cast("string"),
            F.lit(":"),
            F.array_join(F.slice(sig, b * rows_per_band + 1, rows_per_band), "|"),
        ),
    )


def simhash16_expr(tokens_sql: str) -> str:
    """Spark SQL expression text for the 16-bit SimHash of a
    distinct-token array expression ``tokens_sql``. (String form because
    ``shiftleft``'s Python DSL wrapper needs literal shift amounts.)

    The per-token md5 word does not depend on the bit index, so it is
    hashed ONCE into a bound array (the 1-element-array binding trick —
    Catalyst does no CSE across lambda bodies; inlining the hash in the
    per-bit vote re-ran md5 16× per token, measured ~3× the whole
    query). The 16 bit-votes then fold over plain ints.

    DuckDB mirror uses ``list_reduce``/``list_transform`` and
    ``CAST('0x'||... AS INT)`` — see queries/text.py.
    """
    return f"""
    element_at(transform(
      array(transform({tokens_sql},
                      t -> CAST(conv(substring(md5(t), 1, 4), 16, 10) AS INT))),
      hs -> aggregate(
        sequence(0, 15), 0,
        (acc, j) -> acc + IF(
          aggregate(hs, 0, (a, h) -> a + IF(((h >> j) & 1) = 1, 1, -1)) > 0,
          shiftleft(1, j), 0))
    ), 1)
    """


def simhash32_expr(tokens_sql: str) -> str:
    """32-bit SimHash of a distinct-token array expression — the
    BANDED streaming gate's fingerprint (streaming/windows.py
    ``near_dedup_within_watermark(mode="banded")``), split there into
    two 16-bit bands. Same construction as :func:`simhash16_expr`
    (one md5 word per token via the 1-element-array binding trick,
    then per-bit majority votes) widened to 8 hex chars / 32 bit
    positions; the word and the fold run in BIGINT because
    ``shiftleft(1, 31)`` overflows a signed INT.

    Why a wider hash exists at all: banding a 16-bit fingerprint into
    two 8-bit keys gives each band only 256 possible values, so a
    band's dedup state SATURATES after 256 distinct values in the
    horizon and the gate would reject everything — 16-bit bands
    (65,536 values each) keep the false-collision rate workable at
    realistic ingest volumes."""
    return f"""
    element_at(transform(
      array(transform({tokens_sql},
                      t -> CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT))),
      hs -> aggregate(
        sequence(0, 31), CAST(0 AS BIGINT),
        (acc, j) -> acc + IF(
          aggregate(hs, 0, (a, h) -> a + IF(((h >> j) & 1) = 1, 1, -1)) > 0,
          shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT)))
    ), 1)
    """


def stopword_count(text: Column, stopwords: list[str] | None = None) -> Column:
    """Number of tokens that are stopwords (integral — pair with
    ``round4_ratio`` for a cross-engine-exact ratio)."""
    sw = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(sw, t)))


#: ASCII case-fold alphabet for translate() — see normalize_text
_AZ_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_AZ_LOWER = "abcdefghijklmnopqrstuvwxyz"


def normalize_text(text: Column) -> Column:
    """ASCII case-fold + whitespace collapse + trim (the fingerprint
    canonical form). Folds via per-char ``translate``, NOT ``lower()``:
    Spark lowercases with the full Unicode mapping (İ → i+U+0307,
    context-sensitive final sigma in ΣΑΣ) while DuckDB applies the
    simple per-codepoint mapping (İ → i), so a ``lower()``-based
    fingerprint diverges on such text — found by the seeded fuzz
    sweep (seed 60002, a document containing İ). ``translate`` is
    per-character in both engines, and ASCII-only folding is the
    documented canonical form: non-ASCII case variants hash as
    distinct documents, identically everywhere.

    The whitespace collapse uses an EXPLICIT class, not ``\\s``: Java
    regex ``\\s`` includes vertical tab (0x0B) where DuckDB's RE2
    ``\\s`` does not, so a ``\\s+``-based collapse diverges on a
    ``\\x0B``-bearing document (review follow-up to the fuzz sweep —
    the fuzz control-char pool happened to omit 0x0B). The class
    spells out Java's exact set; RE2 writes the same set as
    ``[ \\t\\n\\r\\f\\v]``.

    The final trim strips ASCII space ONLY (after the collapse, any
    leading/trailing whitespace-class run has already become one
    ' '): Spark's ``trim`` strips exactly 0x20, but DuckDB's
    one-argument ``trim`` strips *Unicode* whitespace — NBSP and
    U+3000 included — so a default-trim mirror deletes a leading
    NBSP that the canonical form deliberately keeps (NBSP is not in
    the collapse class). Found by fuzz seed 70026 (a ``'\\xa0 \\r '``
    document hashed as empty on duck, non-empty on Spark); the
    mirror must pass duck's explicit trim char set ``' '``.

    DuckDB mirror: ``trim(regexp_replace(translate(text, 'A..Z',
    'a..z'), '[ \\t\\n\\r\\f\\v]+', ' ', 'g'), ' ')``."""
    return F.trim(
        F.regexp_replace(
            F.translate(text, _AZ_UPPER, _AZ_LOWER), "[ \t\n\r\f\x0B]+", " "
        )
    )


def fingerprint(text: Column) -> Column:
    """Whole-document fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(text))


def min_shingle_fingerprint(text: Column, k: int = 5) -> Column:
    """Winnowing-style robust fingerprint: min md5 over k-gram shingles
    (stable under local edits away from the minimal shingle)."""
    return F.array_min(F.transform(shingles(text, k), lambda s: F.md5(s)))
