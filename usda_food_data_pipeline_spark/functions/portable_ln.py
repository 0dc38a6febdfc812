"""Portable (libm-free) natural log and exp, spelled identically in
driver Python and oracle SQL.

Why this exists (r07 verdict, What's-wrong #1): queries that round an
engine-computed ``ln`` onto a decimal grid and then rely on exact
decimal sums are only as portable as the *libm* that computed the log.
Round 6 compared JVM ``Math.log`` against the driver's DuckDB ``ln``
and lost an ULP at grid boundaries; round 7 single-sourced the Spark
literals from the *local* in-process DuckDB build — and the driver's
DuckDB build disagreed with THAT.  Any scheme that evaluates a
transcendental with somebody's libm on either side of the comparison
inherits this failure mode.

The fix is arithmetic that IEEE 754 defines bit-exactly.  ``+ - * /``
on binary64 are correctly rounded on every conforming platform (the
JVM — strict FP since Java 17/JEP 306 —, CPython floats, and every
DuckDB build), so a *fixed-form* evaluation using only those ops gives
the same bits everywhere, given the same operation order:

1. every log input in this engine is a positive BIGINT (count ratios
   decompose: ``ln(a/b) = ln_int(a) - ln_int(b)``; non-integer inputs
   scale to integer ratios first, e.g. ``0.4c/N = 2c / 5N``);
2. ``e = floor(log2(n))`` and ``p = 2**e`` come from pure integer
   comparison (a 63-row powers table in SQL, ``bit_length`` in
   Python) — no floating point at all;
3. ``m = float(n) / float(p)`` ∈ [1, 2): one correctly-rounded cast
   and one exact power-of-two scaling;
4. ``ln(m) = 2·atanh(t)``, ``t = (m-1)/(m+1)`` ∈ [0, 1/3), by a
   fixed-degree odd polynomial (Horner, terms through t^23 — tail
   < 1.2e-13, and bit-identical everywhere regardless);
5. ``ln(n) = e·LN2 + ln(m)`` with LN2 constructed as an exact integer
   ratio (6243314768165359 / 2^53 — the nearest double to ln 2), never
   parsed from a decimal literal;
6. decimal-grid snaps use ``floor(v·10^dp + 0.5)`` integer math —
   float→decimal ``round()`` implementations differ across engines,
   ``floor`` does not.

Bit-equality of the Python evaluator against the SQL chain is pinned
by tests/test_portable_ln.py over 20k+ adversarial integer ratios.

Accuracy vs a true ln is ~1e-13 absolute (plus ~e·ulp from the ln2
multiple) — irrelevant for correctness (both engines compute the SAME
value by construction) and far inside every 4/9-dp grid these queries
round onto.

At 100 TB the shape is unchanged from the portable_log scheme this
replaces: the Spark side ships bounded literal tables (distinct count
values / buckets / classes — never corpus-sized) computed driver-side
in Python; scoring joins stay broadcast; in-plan combines are plain
IEEE arithmetic inside whole-stage codegen.
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Sequence
from decimal import Decimal

# ---------------------------------------------------------------------------
# constants — constructed, never parsed
# ---------------------------------------------------------------------------

# nearest binary64 to ln(2), as an exact integer ratio (den = 2^53)
_LN2_NUM = 6243314768165359
_LN2_DEN = 9007199254740992
LN2: float = _LN2_NUM / _LN2_DEN
assert LN2 == math.log(2.0)

LN2_SQL = f"(CAST({_LN2_NUM} AS DOUBLE) / CAST({_LN2_DEN} AS DOUBLE))"

# odd-series denominators for 2·atanh(t) = 2t·(1 + t²/3 + t⁴/5 + …)
_ATANH_KS = (3, 5, 7, 9, 11, 13, 15, 17, 19, 21, 23)

# Taylor depth for the portable exp's exp(r), |r| ≤ ln(2)/2:
# tail r^14/14! < 4e-18
_EXP_DEPTH = 13

# powers-of-two lookup for floor-log2: e, 2^e for e in 0..62
POWS_CTE = (
    "pows(e, p) AS (SELECT * FROM (VALUES "
    + ", ".join(f"({e}, CAST({1 << e} AS BIGINT))" for e in range(63))
    + ") AS _pows_v(e, p))"
)

# a literal table is driver memory AND a broadcast: enforce the
# "bounded count tables only" contract — vocab- or bucket-bounded
# inputs sit orders of magnitude below this; a caller hitting it is
# collecting something corpus-sized by mistake
MAX_LITERAL_ROWS = 2_000_000


# ---------------------------------------------------------------------------
# Python evaluator (the Spark side: literal tables are built with these)
# ---------------------------------------------------------------------------


def py_ln_int(n: int) -> float:
    """ln of a positive integer — fixed-form IEEE arithmetic only.

    Mirrors the SQL chain emitted by :func:`sql_ln_select` op for op;
    every step is a correctly-rounded binary64 operation, so the result
    is bit-identical on any IEEE platform.
    """
    if n <= 0:
        raise ValueError(f"py_ln_int needs a positive integer, got {n}")
    e = n.bit_length() - 1
    p = 1 << e
    m = float(n) / float(p)
    t = (m - 1.0) / (m + 1.0)
    u = t * t
    poly = 1.0 / _ATANH_KS[-1]
    for k in reversed(_ATANH_KS[:-1]):
        poly = (1.0 / k) + (u * poly)
    return (float(e) * LN2) + ((2.0 * t) * (1.0 + (u * poly)))


def py_ln_combine(terms: Sequence[tuple[str, int]]) -> float:
    """Left-associated signed fold of integer logs:
    ``[('+', a), ('-', b), ...] -> (ln_int(a) - ln_int(b)) ...``.

    The fold order is the portability contract — SQL combines must
    spell the same left-associated expression (see callers).
    """
    sign0, n0 = terms[0]
    if sign0 != "+":
        raise ValueError("first term must be '+' (start the fold positive)")
    v = py_ln_int(n0)
    for sign, n in terms[1:]:
        if sign == "+":
            v = v + py_ln_int(n)
        elif sign == "-":
            v = v - py_ln_int(n)
        else:
            raise ValueError(f"bad sign {sign!r}")
    return v


def py_exp(v: float) -> float:
    """Portable exp: range-reduce by LN2 (k = floor(v/LN2 + 0.5)),
    Taylor-Horner on the residual, exact power-of-two scaling.
    Mirrors :func:`sql_exp_select` op for op.

    Domain: |v| ≤ 62·ln2 ≈ 42.97 (|k| ≤ 62), the range of the SQL
    chain's power-of-two lookup table.  Outside it the SQL side's
    ``pows`` lookup returns NULL, so silently returning a finite float
    here would be a latent Python/SQL divergence (r08 ADVICE) — raise
    instead; every in-engine caller feeds logs of < 2^62 integers (or
    means thereof), which sit inside the bound by construction."""
    k = math.floor((v / LN2) + 0.5)
    if abs(k) > 62:
        raise ValueError(
            f"py_exp input {v!r} needs 2^{k} scaling, outside the chain's "
            "exact power-of-two table (|k| <= 62; |v| <= ~42.97) — the SQL "
            "twin would produce NULL here, not a finite value"
        )
    r = v - (float(k) * LN2)
    poly = 1.0
    for i in range(_EXP_DEPTH, 0, -1):
        poly = 1.0 + ((r * (1.0 / i)) * poly)
    if k >= 0:
        return poly * float(1 << k)
    return poly / float(1 << (-k))


def py_grid_nanos(v: float, dp: int = 9) -> int:
    """Snap a double onto the 10^-dp grid as an integer of grid units:
    ``floor(v·10^dp + 0.5)`` — half-up toward +inf, identical in every
    engine (unlike float ``round()``, whose tie and scaling behavior
    is engine-specific)."""
    return math.floor((v * float(10**dp)) + 0.5)


def py_grid_decimal(v: float, dp: int = 9) -> Decimal:
    """Grid-snap to an exact :class:`Decimal` with scale ``dp`` (the
    literal-table value type — round-trips bit-exactly into a Spark
    DECIMAL literal)."""
    return Decimal(py_grid_nanos(v, dp)).scaleb(-dp)


def literal_table(spark, rows: Iterable[tuple], schema: str):
    """Bounded driver rows -> Spark literal DataFrame (broadcast feed).

    Enforces the bounded-collect ceiling the old portable_log module
    carried: literal tables hold distinct count values / buckets /
    classes, never corpus rows.
    """
    rows = list(rows)
    if len(rows) > MAX_LITERAL_ROWS:
        raise ValueError(
            f"literal_table received {len(rows)} rows (> {MAX_LITERAL_ROWS}): "
            "log tables must be bounded (count values / buckets / classes) "
            "— a corpus-sized input belongs in the engine, not a literal"
        )
    return spark.createDataFrame(rows, schema=schema)


# ---------------------------------------------------------------------------
# Spark column forms of the grid snap (mirror sql_grid_nanos /
# sql_grid_decimal text for text — the in-plan combine of literal ln
# doubles plus these snaps is the whole Spark-side arithmetic)
# ---------------------------------------------------------------------------


def grid_nanos_col(v, dp: int = 9):
    """Spark mirror of :func:`sql_grid_nanos`: ``floor((v * 10^dp) + 0.5)``
    — F.floor on a double returns LONG; every op is exact or correctly
    rounded identically to the oracle's text."""
    from pyspark.sql import functions as F

    return F.floor((v * F.lit(float(10**dp))) + F.lit(0.5))


def grid_decimal_col(nanos, precision: int = 18, dp: int = 9):
    """Spark mirror of :func:`sql_grid_decimal`: integer grid units ->
    DECIMAL(precision, dp) via one exact decimal multiply (never
    decimal division, whose result-type rules differ across engines)."""
    from pyspark.sql import functions as F

    one = "0." + "0" * (dp - 1) + "1"
    return (
        nanos.cast(f"decimal({precision},0)")
        * F.expr(f"CAST({one} AS DECIMAL({dp},{dp}))")
    ).cast(f"decimal({precision},{dp})")


# ---------------------------------------------------------------------------
# SQL chain generator (the oracle side)
# ---------------------------------------------------------------------------


def _sql_horner(u: str) -> str:
    expr = f"(1.0 / {_ATANH_KS[-1]}.0)"
    for k in reversed(_ATANH_KS[:-1]):
        expr = f"((1.0 / {k}.0) + ({u} * {expr}))"
    return expr


def sql_ln_select(
    input_rel: str,
    keep: Sequence[str],
    terms: dict[str, str],
    outputs: Sequence[tuple[str, str]],
) -> str:
    """Emit a SELECT computing portable integer logs over a relation.

    - ``input_rel``: SQL of the input relation (CTE name or subquery).
    - ``keep``: columns to carry through unchanged.
    - ``terms``: tag -> positive-BIGINT SQL expression; each tag yields
      an ``_ln_{tag}`` double via the fixed-form chain.
    - ``outputs``: (out_name, combine SQL over the ``_ln_*`` columns).
      Combines must be left-associated ``+``/``-`` folds to match
      :func:`py_ln_combine` (or any fixed IEEE expression mirrored on
      the Spark side).

    Requires ``pows`` (POWS_CTE) in scope.  Layered subqueries keep
    each intermediate named once (DuckDB's lateral column aliases
    cannot reference subquery-bearing aliases, so the e/p lookups get
    their own layer).
    """
    keep_sql = ", ".join(keep)
    sep = ", " if keep else ""
    l0 = (
        f"SELECT {keep_sql}{sep}"
        + ", ".join(f"CAST(({e}) AS BIGINT) AS _n_{t}" for t, e in terms.items())
        + f" FROM {input_rel}"
    )
    lk = ", ".join(
        f"(SELECT max(e) FROM pows WHERE p <= _n_{t}) AS _e_{t}, "
        f"(SELECT max(p) FROM pows WHERE p <= _n_{t}) AS _p_{t}"
        for t in terms
    )
    l1 = f"SELECT *, {lk} FROM ({l0}) _pl0"
    arith = []
    for t in terms:
        arith += [
            f"CAST(_n_{t} AS DOUBLE) / CAST(_p_{t} AS DOUBLE) AS _m_{t}",
            f"(_m_{t} - 1.0) / (_m_{t} + 1.0) AS _t_{t}",
            f"_t_{t} * _t_{t} AS _u_{t}",
            f"(CAST(_e_{t} AS DOUBLE) * {LN2_SQL}) + "
            f"((2.0 * _t_{t}) * (1.0 + (_u_{t} * {_sql_horner(f'_u_{t}')}))) "
            f"AS _ln_{t}",
        ]
    l2 = f"SELECT *, {', '.join(arith)} FROM ({l1}) _pl1"
    outs = ", ".join(f"({c}) AS {n}" for n, c in outputs)
    return f"SELECT {keep_sql}{sep}{outs} FROM ({l2}) _pl2"


def sql_exp_select(
    input_rel: str, keep: Sequence[str], v_expr: str, out: str
) -> str:
    """Emit a SELECT computing the portable exp of a double expression
    (mirrors :func:`py_exp`).  Requires ``pows`` in scope for the
    exact power-of-two scaling.

    Same |v| ≤ 62·ln2 domain as :func:`py_exp`: beyond it the ``pows``
    lookup finds no row and the result is NULL.  :func:`py_exp` raises
    on that domain instead, so a divergence can never ship silently —
    the Python side (which builds every literal table) fails loudly at
    plan-build time."""
    keep_sql = ", ".join(keep)
    sep = ", " if keep else ""
    poly = "1.0"
    for i in range(_EXP_DEPTH, 0, -1):
        poly = f"(1.0 + ((_r * (1.0 / {i}.0)) * {poly}))"
    l0 = f"SELECT {keep_sql}{sep}({v_expr}) AS _v FROM {input_rel}"
    l1 = (
        "SELECT *, CAST(floor((_v / "
        + LN2_SQL
        + ") + 0.5) AS BIGINT) AS _k FROM ("
        + l0
        + ") _pe0"
    )
    l2 = f"SELECT *, _v - (CAST(_k AS DOUBLE) * {LN2_SQL}) AS _r FROM ({l1}) _pe1"
    l3 = (
        f"SELECT *, {poly} AS _py, "
        "(SELECT CAST(p AS DOUBLE) FROM pows WHERE e = abs(_k)) AS _p2 "
        f"FROM ({l2}) _pe2"
    )
    return (
        f"SELECT {keep_sql}{sep}"
        "(CASE WHEN _k >= 0 THEN _py * _p2 ELSE _py / _p2 END) "
        f"AS {out} FROM ({l3}) _pe3"
    )


def sql_grid_nanos(v_expr: str, dp: int = 9) -> str:
    """SQL grid snap matching :func:`py_grid_nanos` and the Spark
    column form ``F.floor((v * 10^dp) + 0.5)``."""
    return f"CAST(floor((({v_expr}) * {float(10 ** dp)!r}) + 0.5) AS BIGINT)"


def sql_grid_decimal(nanos_expr: str, precision: int = 18, dp: int = 9) -> str:
    """Integer grid units -> DECIMAL(precision, dp) without decimal
    division (whose result-type rules differ across engines): one
    exact multiply by 10^-dp spelled as a small-precision decimal, one
    exact cast."""
    one = "0." + "0" * (dp - 1) + "1"
    return (
        f"CAST(CAST({nanos_expr} AS DECIMAL({precision},0)) * "
        f"CAST({one} AS DECIMAL({dp},{dp})) AS DECIMAL({precision},{dp}))"
    )


def ln_int_col(n):
    """Spark COLUMN form of the portable integer ln — the same
    fixed-form chain as :func:`py_ln_int` / :func:`sql_ln_select`,
    spelled as Catalyst expressions so it runs per row inside
    whole-stage codegen.

    This is the missing third form: :func:`py_ln_int` builds literal
    tables on the driver (right when the argument has few distinct
    values — the lm/dsir pattern), the SQL chain runs oracle-side;
    neither serves a PER-ROW-DISTINCT argument (e.g. a 48-bit hash,
    where a literal table is impossible).  Here:

    - ``e = length(bin(n)) - 1`` is the exact bit length (string op on
      the binary repr — no libm log2);
    - ``p = shiftleft(1L, e)`` is the exact power of two (integer
      shift — IEEE does not require pow() to be correctly rounded, so
      it is banned engine-wide);
    - the mantissa/atanh/Horner arithmetic mirrors the SQL text op for
      op: every individual double op is correctly rounded and the
      association order is identical, so results are bit-identical to
      :func:`py_ln_int` and the oracle chain.

    ``n`` must be a positive BIGINT column (same domain contract as
    :func:`py_ln_int`; nonpositive inputs yield nonsense, not an
    error, so callers guard — e.g. ``h + 1`` for 48-bit hashes).
    """
    from pyspark.sql import functions as F

    e = (F.length(F.bin(n)) - F.lit(1)).cast("int")
    # call_function: the Python shiftleft wrapper only takes a literal
    # shift amount; the SQL expression form shifts by a column
    p = F.call_function("shiftleft", F.lit(1).cast("bigint"), e)
    m = n.cast("double") / p.cast("double")
    t = (m - F.lit(1.0)) / (m + F.lit(1.0))
    u = t * t
    poly = F.lit(1.0 / _ATANH_KS[-1])
    for k in reversed(_ATANH_KS[:-1]):
        poly = F.lit(1.0 / k) + (u * poly)
    return (e.cast("double") * F.lit(LN2)) + (
        (F.lit(2.0) * t) * (F.lit(1.0) + (u * poly))
    )
