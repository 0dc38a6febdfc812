"""Window-rotation gate (r06 verdict task 3).

Round 6 regressed the driver correctness gate for the first time since
r04 by rotating two queries into the first-50 window whose compared
values depended on an in-engine transcendental (``ln`` rounded onto a
9-dp decimal grid): the JVM's and the driver's DuckDB's libm disagree
by an ULP on some inputs, which flips grid-boundary values — invisible
to any local gate that happens to run a libm that agrees.

This test encodes the entry requirement so the next reshuffle cannot
repeat it.  A query may sit inside the driver window only if

(a) it is oracle-checkable (exact SQL twin registered — the three-scale
    local green requirement is enforced per-run by test_oracle_gate.py
    plus the per-round tools/check_correctness.py sweeps), and
(b) its *Spark plan evaluates no transcendental function* on any path:
    log values must ride in as literals single-sourced from the
    in-process DuckDB build (functions/portable_log), never from JVM
    Math.log.  IEEE-exact functions (sqrt, basic +,-,*,/) are fine —
    IEEE 754 requires correct rounding for them, so every libm agrees.

The check inspects the ANALYZED logical plan (pre-optimizer, so
constant folding cannot hide a transcendental that Catalyst happened to
evaluate at plan time — if it is in the expression tree at all, it is
in the analyzed plan).
"""

from __future__ import annotations

import re

import pytest

from usda_food_data_pipeline_spark import registry

SF_DIR = "/root/testdata/sf0.001"

# transcendental expression heads whose results differ across libms;
# sqrt/cbrt are IEEE-correctly-rounded and therefore portable
_TRANSCENDENTAL = re.compile(
    r"\b(log|ln|log10|log2|log1p|exp|expm1|power|pow|sin|cos|tan|asin|acos|atan|atan2|sinh|cosh|tanh)\(",
    re.IGNORECASE,
)

_SPECS = {s.name: s for s in registry.specs()}
_WINDOW = registry._ORDER[:50]


def test_window_is_exactly_the_first_fifty():
    assert len(registry._ORDER) >= 50
    assert len(set(registry._ORDER)) == len(registry._ORDER)
    missing = [n for n in _WINDOW if n not in _SPECS]
    assert not missing, f"window names without a registered query: {missing}"


@pytest.mark.parametrize("name", _WINDOW)
def test_window_query_is_oracle_checked_and_transcendental_free(spark, name):
    spec = _SPECS[name]
    assert spec.oracle is not None, (
        f"{name} sits inside the driver window without an exact SQL "
        "oracle — rows-only queries belong beyond slot 50"
    )
    df = spec.fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().analyzed().toString()
    hits = sorted(set(m.group(0) for m in _TRANSCENDENTAL.finditer(plan)))
    spark.catalog.clearCache()
    assert not hits, (
        f"{name} evaluates {hits} inside the Spark plan; in-window "
        "queries must single-source transcendentals through "
        "functions/portable_log so the oracle's libm is the only one "
        "in the comparison path (r06 verdict #1)"
    )
