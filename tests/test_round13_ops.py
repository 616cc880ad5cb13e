"""Round-13 operators. Each Python reference below is an independent
re-derivation from the operator's spec (pandas / set algebra / pure
Python) — never the operator's own code path — so a shared bug can't
self-pass. Oracle parity at sf0.001 is covered by
test_oracle_parity.py automatically; the sf0.01 driver-scale pin lives
in the verify sweep.
"""

from __future__ import annotations

import pandas as pd

from api_weather_kafka_clickhouse_spark import registry

SPECS = registry.all_specs()


# ------------------------------------------------ er_funnel


def _customers_pdf(sf_dir: str) -> pd.DataFrame:
    import duckdb

    return duckdb.sql(
        f"""SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
            CAST(round(c_acctbal * 100) AS BIGINT) AS bal
            FROM '{sf_dir}/customer.parquet'"""
    ).fetchdf()


def test_er_funnel_matches_python_pipeline(spark, sf_dir):
    """Re-derive all four funnel stages independently: a plain-Python
    per-segment sorted-neighborhood pass, DuckDB's built-in (already
    property-pinned) damerau_levenshtein for the verify, and a
    min-union-find for the golden-record count — no Spark windows, no
    recursive CTE, no operator helper reuse."""
    import duckdb

    pdf = _customers_pdf(sf_dir)
    cand = []
    for _, g in pdf.groupby("c_mktsegment"):
        rows = sorted(
            g.itertuples(),
            key=lambda r: (f"{r.c_nationkey}|{r.c_name}", r.c_custkey),
        )
        for i, a in enumerate(rows):
            for k in range(1, 4):  # SNM_WINDOW = 4 -> offsets 1..3
                if i + k < len(rows):
                    b = rows[i + k]
                    if a.c_nationkey == b.c_nationkey and abs(a.bal - b.bal) < 50_000:
                        cand.append(
                            (a.c_custkey, b.c_custkey, a.c_name, b.c_name)
                        )
    con = duckdb.connect()
    matched = [
        (a, b)
        for a, b, na, nb in cand
        if con.execute(
            "SELECT damerau_levenshtein(?, ?)", [na, nb]
        ).fetchone()[0]
        <= 2
    ]

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in matched:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    verts = {int(v) for pair in matched for v in pair}
    merged_away = sum(1 for v in verts if find(v) != v)

    got = {
        r["stage"]: (r["stage_idx"], r["n_records"])
        for r in SPECS["er_funnel"].fn(spark, sf_dir).collect()
    }
    assert got == {
        "total_records": (0, len(pdf)),
        "snm_candidates": (1, len(cand)),
        "dl_matches": (2, len(matched)),
        "golden_records": (3, len(pdf) - merged_away),
    }
    # the fixture must actually exercise every stage transition, or the
    # funnel test passes vacuously on an all-unique corpus
    assert len(cand) > len(matched) > 0
    assert merged_away > 0
