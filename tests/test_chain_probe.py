"""Round-11 bisect rows (r10 verdict task 1, resolved r12 per the
CORRECTNESS_r11 driver evidence): the census's domain construction must
equal the lm/dsir internals it certifies, and the probe's big-magnitude
BIGINT column must ride the exact combine path at the magnitudes the
lm/dsir nano sums occupy (the DECIMAL(38,9) bisect columns fired red in
the driver env and are resolved out — chain_probe module docstring).

The cross-engine value checks live in test_oracle_gate.py (every
registered query, including these two, runs against DuckDB per pytest
run); this file pins the *structural* claims a green gate row would
silently rest on.
"""

from __future__ import annotations

import duckdb
import pytest

from usda_food_data_pipeline_spark.functions.chain_probe import (
    _BIG_NANOS_MULT,
    PROBE_INPUTS,
    chain_probe,
    ln_domain_census,
)
from usda_food_data_pipeline_spark.functions.portable_ln import (
    py_grid_nanos,
    py_ln_int,
)
from usda_food_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_probe_big_nanos_is_the_scaled_combine(spark):
    """c4_big_nanos == c4_per_nanos · _BIG_NANOS_MULT exactly, and the
    output type is BIGINT (the driver-green form lm/dsir sums ship in;
    no DECIMAL(38,9) anywhere in the probe's output schema)."""
    df = chain_probe(spark, SF)
    assert dict(df.dtypes)["c4_big_nanos"] == "bigint"
    assert not any("decimal" in t for _, t in df.dtypes)
    rows = df.collect()
    assert len(rows) == len(PROBE_INPUTS)
    for r in rows:
        assert r["c4_big_nanos"] == r["c4_per_nanos"] * _BIG_NANOS_MULT, (
            r["probe_id"]
        )


def test_probe_big_nanos_covers_sum_magnitudes():
    """The scaled column must actually reach the ~1e15-nano magnitudes a
    real per-doc sum occupies (else the combine is only probed at toy
    magnitudes), while staying inside BIGINT."""
    combos = [
        ((py_grid_nanos(py_ln_int(a)) + py_grid_nanos(py_ln_int(b)))
         - py_grid_nanos(py_ln_int(c))) - py_grid_nanos(py_ln_int(d))
        for a, b, c, d in PROBE_INPUTS
    ]
    peak = max(abs(v) for v in combos) * _BIG_NANOS_MULT
    assert 10**15 <= peak < 2**63


@pytest.fixture(scope="module")
def census_rows(spark):
    docs = load_table(spark, SF, "documents")
    return ln_domain_census(docs).collect()


def test_census_families_and_scalars(census_rows):
    fams = {r["family"] for r in census_rows}
    assert fams == {
        "lm_bg", "lm_prev", "lm_back", "lm_5n",
        "dsir_ct1", "dsir_cq1", "dsir_nqB", "dsir_ntB",
    }
    # the two dsir totals and lm's 5N are single-row families
    for fam in ("dsir_nqB", "dsir_ntB", "lm_5n"):
        assert sum(1 for r in census_rows if r["family"] == fam) == 1


def test_census_nanos_are_py_ln_snaps(census_rows):
    for r in census_rows:
        assert r["nanos"] == py_grid_nanos(py_ln_int(r["arg"])), r


def test_census_covers_the_live_lm_domain(spark):
    """Every distinct count the lm scoring path resolves at this sf must
    appear in the census — otherwise a green census would NOT certify
    lm's arguments.  Rebuilt here independently via DuckDB (not via the
    census's own construction, which would be circular)."""
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    toks = r"list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t != '')"
    uni_vals = {
        int(v[0])
        for v in con.sql(
            f"SELECT DISTINCT c FROM (SELECT w, count(*) AS c FROM "
            f"(SELECT unnest({toks}) AS w FROM documents WHERE source='src0') GROUP BY w)"
        ).fetchall()
    }
    bg_vals = {
        int(v[0])
        for v in con.sql(
            f"""SELECT DISTINCT c FROM (
                SELECT prev, cur, count(*) AS c FROM (
                    SELECT toks[i] AS prev, toks[i+1] AS cur
                    FROM (SELECT toks, unnest(range(1, greatest(len(toks)-1,0)+1)) AS i
                          FROM (SELECT {toks} AS toks FROM documents WHERE source='src0'))
                ) GROUP BY prev, cur)"""
        ).fetchall()
    }
    con.close()
    docs = load_table(spark, SF, "documents")
    got = {(r["family"], r["arg"]) for r in ln_domain_census(docs).collect()}
    missing = (
        {("lm_prev", c) for c in uni_vals}
        | {("lm_bg", c) for c in bg_vals}
        | {("lm_back", 2 * c) for c in uni_vals | {1}}
    ) - got
    assert not missing, sorted(missing)[:10]


def test_census_covers_the_live_dsir_domain(spark):
    """The dsir twin of the lm coverage test, rebuilt in PURE PYTHON
    (hashlib md5, not either engine's hash helper — a construction bug
    mirrored into both the census and its oracle would survive an
    engine-vs-engine check, so the rebuild must be independent of
    both).  Every (ct+1, cq+1, nq+B, nt+B) argument dsir evaluates at
    this sf must appear in the census."""
    import hashlib
    import re

    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["text", "source"])
    texts = tbl.column("text").to_pylist()
    sources = tbl.column("source").to_pylist()

    def toks(t):
        return [w for w in re.split(r"\s+", (t or "").strip().lower()) if w]

    def bucket(bg):
        h = hashlib.md5(f"s31:{bg}".encode()).hexdigest()
        return int(h[:8], 16) % 4096

    cq, ct = {}, {}
    for text, src in zip(texts, sources):
        ws = toks(text)
        for a, b in zip(ws, ws[1:]):
            bkt = bucket(f"{a} {b}")
            if src == "src1":
                ct[bkt] = ct.get(bkt, 0) + 1
            else:
                cq[bkt] = cq.get(bkt, 0) + 1
    nq, nt = sum(cq.values()), sum(ct.values())
    want = (
        {("dsir_ct1", ct.get(b, 0) + 1) for b in cq}
        | {("dsir_cq1", c + 1) for c in cq.values()}
        | {("dsir_nqB", nq + 4096), ("dsir_ntB", nt + 4096)}
    )
    docs = load_table(spark, SF, "documents")
    got = {(r["family"], r["arg"]) for r in ln_domain_census(docs).collect()}
    missing = want - got
    assert not missing, sorted(missing)[:10]
    # and nothing extra in the dsir families either (domain equality,
    # not just coverage)
    extra = {g for g in got if g[0].startswith("dsir_")} - want
    assert not extra, sorted(extra)[:10]


def test_token_entropy_hand_values(spark):
    """H = ln n - (sum c*ln c)/n on the nano grid, hand-recomputed with
    the same portable chain + integer division."""
    from usda_food_data_pipeline_spark.functions.textstats import token_entropy

    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # one token repeated: H = 0
            (2, "a b c d"),          # uniform over 4: H = ln 4
            (3, "a a b"),            # 2/3, 1/3 mix
            (4, ""),                 # zero tokens: excluded
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_tokens"], r["entropy_nanos"])
           for r in token_entropy(df, "doc_id", "text").collect()}
    n = lambda x: py_grid_nanos(py_ln_int(x))  # noqa: E731
    assert set(got) == {1, 2, 3}
    # doc 1: c=4 for 'a'; H = n(4) - (4*n(4)) DIV 4 = 0
    assert got[1] == (4, 0)
    # doc 2: four tokens with c=1; ln 1 = 0 => H = n(4)
    assert got[2] == (4, n(4))
    # doc 3: c_a=2, c_b=1; H = n(3) - (2*n(2) + 1*0) DIV 3
    assert got[3] == (3, n(3) - (2 * n(2)) // 3)
