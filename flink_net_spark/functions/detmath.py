"""Deterministic transcendental math as paired expression builders.

The round-7/8 driver reds (``text_unigram_nll``, ``text_bigram_nll``) came
from one defect class: an oracle contract of the form
``CAST(ROUND((ln(a) - ln(b)) * 1e6) AS BIGINT)`` evaluated with each
engine's *libm* ``ln``.  Unlike ``sqrt``/``+``/``*``/``/``, ``ln`` is NOT
required by IEEE 754 to be correctly rounded, so DuckDB's and the JVM's
results may differ in the last ulp — and a 1-ulp difference next to a
``.5 * 1e-6`` quantization boundary flips the rounded integer, failing the
value-hash gate even though both engines are "right".

Fix (generalizing the ``_BACKOFF_NEG_LN_04`` injected-literal precedent,
text.py:744): stop calling libm at all.  ``ln`` of a positive BIGINT is
computed by an EXPLICIT expression using only IEEE-correctly-rounded
operations (integer ops, double ``+ - * /``) plus Python-injected double
literals, with byte-identical operation order in both engines:

    k   = length(bin(c)) - 1          -- floor(log2 c), exact integer math
    m   = CAST(c AS DOUBLE) / 2^k     -- 2^k from a 63-literal exact table
    z   = (m - 1) / (m + 1)           -- z in [0, 1/3]
    ln m = (2z) * (1 + z^2/3 + z^4/5 + ...)   -- atanh Horner, 13 terms
    ln c = k * LN2 + ln m

Every step is a correctly-rounded IEEE-754 double op on both engines (the
JVM is strict-FP; DuckDB's vectorized interpreter runs each SQL operator as
its own kernel, so no compiler can contract a multiply-add across them),
and every constant is the same decimal literal parsed to the same double.
Two engines evaluating this expression therefore produce BIT-IDENTICAL
doubles — representation independence by construction, not by libm luck.

Accuracy: truncation error of the 13-term series at z = 1/3 is
~3e-15; with k ≤ 62 the k·LN2 term adds ≤ ~2e-15 — total ~1e-14 absolute,
seven orders below the 1e-6 micro-nat quantization, so the semantic value
is indistinguishable from true ln while the cross-engine contract is exact.

Scale: ~40 flops of straight-line column arithmetic per row, fully inside
whole-stage codegen / DuckDB vectorization — no UDF, no lookup join, no
driver round-trip, valid for any count up to 2^62 (far beyond a 100 TB
corpus' token total).
"""

from __future__ import annotations

import math

# Shared double literals.  repr() gives the shortest round-tripping decimal,
# and both engines parse a decimal/scientific literal to the nearest double,
# so each constant is the SAME 64-bit value everywhere.  The 'e0' suffix
# forces DOUBLE typing (a bare `1.0` is DECIMAL in both Spark and DuckDB).


def dlit(x: float) -> str:
    """Render a Python float as a literal BOTH engines parse to the same
    64-bit double (repr round-trips; 'e0' forces DOUBLE, not DECIMAL)."""
    s = repr(float(x))
    if "e" not in s and "E" not in s:
        s += "e0"
    return s


_dlit = dlit


LN2_LIT = _dlit(math.log(2.0))  # 0.6931471805599453e0

# Exact powers of two, 2^0 .. 2^62 (all exactly representable as doubles);
# indexed by k+1 (both engines use 1-based array indexing here).
_POW2_LITS = [_dlit(float(1 << k)) for k in range(63)]

# atanh series coefficients 1/1, 1/3, ..., 1/25 (13 terms).
_SERIES_LITS = [_dlit(1.0 / (2 * i + 1)) for i in range(13)]


def _horner(z2: str) -> str:
    """(1 + z2*(1/3 + z2*(1/5 + ...))) with explicit, shared op order."""
    expr = _SERIES_LITS[-1]
    for coef in reversed(_SERIES_LITS[:-1]):
        expr = f"({coef} + {z2} * {expr})"
    return expr


# The five steps as (suffix, template) pairs; {c} is the BIGINT count column
# and {p} the per-call column prefix.  Both dialects share every template
# except the power-of-two table lookup (array indexing syntax differs).
def _steps(c: str, p: str, pow2_lookup: str) -> list[tuple[str, str]]:
    return [
        (f"{p}_k", f"(length(bin(CAST({c} AS BIGINT))) - 1)"),
        (f"{p}_m", f"(CAST({c} AS DOUBLE) / {pow2_lookup})"),
        (f"{p}_z", f"(({p}_m - 1e0) / ({p}_m + 1e0))"),
        (f"{p}_z2", f"({p}_z * {p}_z)"),
        (
            f"{p}_ln",
            f"(CAST({p}_k AS DOUBLE) * {LN2_LIT}"
            f" + (2e0 * {p}_z) * {_horner(p + '_z2')})",
        ),
    ]


def spark_det_ln_cols(c: str, prefix: str) -> list[tuple[str, str]]:
    """Spark: [(col_name, sql_expr)] chain computing ``ln(c)`` into
    ``{prefix}_ln``; apply in order with ``df.withColumn(name, F.expr(e))``.
    ``c`` must be a simple column of positive BIGINTs."""
    arr = "array(" + ", ".join(_POW2_LITS) + ")"
    lookup = f"element_at({arr}, CAST({prefix}_k AS INT) + 1)"
    return _steps(c, prefix, lookup)


def duckdb_det_ln_cols(c: str, prefix: str) -> list[tuple[str, str]]:
    """DuckDB: same chain; emit as lateral-alias select items
    (``expr AS name``) in order — DuckDB resolves aliases left-to-right
    within one SELECT list."""
    arr = "[" + ", ".join(_POW2_LITS) + "]"
    lookup = f"({arr})[{prefix}_k + 1]"
    return _steps(c, prefix, lookup)


def duckdb_det_ln_select(c: str, prefix: str) -> str:
    """The DuckDB chain rendered as ``expr AS name, ...`` select items."""
    return ", ".join(f"{e} AS {n}" for n, e in duckdb_det_ln_cols(c, prefix))


def spark_with_det_ln(df, c: str, prefix: str):
    """Apply the Spark chain to ``df``, adding ``{prefix}_ln`` (plus the
    intermediate ``_k/_m/_z/_z2`` columns — select them away afterwards)."""
    import pyspark.sql.functions as F

    for name, expr in spark_det_ln_cols(c, prefix):
        df = df.withColumn(name, F.expr(expr))
    return df


def py_det_ln(c: int) -> float:
    """Python mirror with the identical op order — the executable spec both
    SQL renderings are tested against (CPython floats are IEEE doubles with
    per-op correct rounding, like both engines)."""
    k = c.bit_length() - 1
    m = float(c) / float(1 << k)
    z = (m - 1.0) / (m + 1.0)
    z2 = z * z
    coefs = [1.0 / (2 * i + 1) for i in range(13)]
    s = coefs[-1]
    for coef in reversed(coefs[:-1]):
        s = coef + z2 * s
    return float(k) * float(LN2_LIT) + (2.0 * z) * s


# -- det-ln over POSITIVE DOUBLES in [2^-61, 2) ------------------------------
# The BIGINT chain above covers ln of a raw count; interpolated LMs
# (Kneser-Ney) need ln of a PROBABILITY that is a *sum* of exact-rational
# terms — a computed double, not a count.  Same trick, different exponent
# extraction: for x in [2^-61, 2), q = x * 2^61 is EXACT (power-of-two
# multiply only shifts the exponent; q < 2^62 so no overflow), so
# floor(log2 x) + 61 = bit-length(trunc(q)) - 1 by the same bin() both
# engines already share (truncation cannot cross a power-of-two boundary).
# m = x * 2^(-k) is again an exact exponent shift into [1, 2), and the
# atanh series is reused verbatim.  Every op is correctly-rounded IEEE
# double arithmetic with byte-identical order, so the result is
# bit-identical across engines for bit-identical inputs — which the
# callers guarantee by building x from BIGINTs with a fixed division/
# multiply/add order (each of those ops IS correctly rounded, unlike ln).
#
# Only the trunc-cast spelling differs per dialect: Spark CAST(double AS
# BIGINT) truncates toward zero, DuckDB's rounds half-even, so DuckDB goes
# through trunc() (exact) first.

_P61_LIT = _dlit(float(1 << 61))


def _stepsd(x: str, p: str, trunc_cast: str, pow2_lookup: str) -> list[tuple[str, str]]:
    return [
        (f"{p}_k", f"(length(bin({trunc_cast})) - 62)"),
        (f"{p}_m", f"({x} * {pow2_lookup})"),
        (f"{p}_z", f"(({p}_m - 1e0) / ({p}_m + 1e0))"),
        (f"{p}_z2", f"({p}_z * {p}_z)"),
        (
            f"{p}_ln",
            f"(CAST({p}_k AS DOUBLE) * {LN2_LIT}"
            f" + (2e0 * {p}_z) * {_horner(p + '_z2')})",
        ),
    ]


def spark_det_lnd_cols(x: str, prefix: str) -> list[tuple[str, str]]:
    """Spark: [(col_name, sql_expr)] chain computing ``ln(x)`` into
    ``{prefix}_ln`` for a simple DOUBLE column ``x`` in [2^-61, 2)."""
    arr = "array(" + ", ".join(_POW2_LITS) + ")"
    trunc_cast = f"CAST({x} * {_P61_LIT} AS BIGINT)"
    # m = x * 2^(-k); -k in [0, 61] so the positive power table serves,
    # indexed 1-based at (-k) + 1 = 1 - k.
    lookup = f"element_at({arr}, CAST(1 - {prefix}_k AS INT))"
    return _stepsd(x, prefix, trunc_cast, lookup)


def duckdb_det_lnd_cols(x: str, prefix: str) -> list[tuple[str, str]]:
    arr = "[" + ", ".join(_POW2_LITS) + "]"
    trunc_cast = f"CAST(trunc({x} * {_P61_LIT}) AS BIGINT)"
    lookup = f"({arr})[1 - {prefix}_k]"
    return _stepsd(x, prefix, trunc_cast, lookup)


def duckdb_det_lnd_select(x: str, prefix: str) -> str:
    """The DuckDB double chain rendered as ``expr AS name, ...`` items."""
    return ", ".join(f"{e} AS {n}" for n, e in duckdb_det_lnd_cols(x, prefix))


def spark_with_det_lnd(df, x: str, prefix: str):
    """Apply the Spark double chain to ``df``, adding ``{prefix}_ln``."""
    import pyspark.sql.functions as F

    for name, expr in spark_det_lnd_cols(x, prefix):
        df = df.withColumn(name, F.expr(expr))
    return df


def py_det_lnd(x: float) -> float:
    """Python mirror of the double chain (executable spec for tests)."""
    j = int(x * float(1 << 61)).bit_length() - 1
    k = j - 61
    m = x * float(1 << -k)
    z = (m - 1.0) / (m + 1.0)
    z2 = z * z
    coefs = [1.0 / (2 * i + 1) for i in range(13)]
    s = coefs[-1]
    for coef in reversed(coefs[:-1]):
        s = coef + z2 * s
    return float(k) * float(LN2_LIT) + (2.0 * z) * s
