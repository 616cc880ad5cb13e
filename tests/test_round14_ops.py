"""Round-14 operators. Each Python reference below is an independent
re-derivation from the operator's spec (pure Python / pandas / DuckDB
scalar calls) — never the operator's own code path — so a shared bug
can't self-pass. Oracle parity at sf0.001 is covered by
test_oracle_parity.py automatically; the sf0.01 driver-scale pin lives
in the verify sweep."""

from __future__ import annotations

from collections import defaultdict

import pandas as pd
import pytest

from api_weather_kafka_clickhouse_spark import registry

SPECS = registry.all_specs()


# ------------------------------------------------ er_reconcile


def _customers_pdf(sf_dir: str) -> pd.DataFrame:
    import duckdb

    return duckdb.sql(
        f"""SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
            CAST(round(c_acctbal * 100) AS BIGINT) AS bal
            FROM '{sf_dir}/customer.parquet'"""
    ).fetchdf()


def _reconcile_reference(sf_dir: str) -> dict[str, tuple[int, int]]:
    """All six stages from first principles: dict-bucketed prefix
    blocking, a plain per-segment sorted-neighborhood pass, DuckDB's
    built-in (property-pinned) damerau_levenshtein for the verify, and
    two min-union-finds — no Spark, no recursive CTE, no operator
    helper reuse."""
    import duckdb

    pdf = _customers_pdf(sf_dir)
    con = duckdb.connect()
    dl_memo: dict[tuple[str, str], int] = {}

    def dl(x: str, y: str) -> int:
        k = (x, y) if x <= y else (y, x)
        if k not in dl_memo:
            dl_memo[k] = con.execute(
                "SELECT damerau_levenshtein(?, ?)", list(k)
            ).fetchone()[0]
        return dl_memo[k]

    # streaming blocker: nation | name[:16] equality blocks, all pairs
    # within a block (the ingest path's caps only shave hot blocks)
    blocks: dict[tuple[int, str], list] = defaultdict(list)
    for r in pdf.itertuples():
        blocks[(r.c_nationkey, r.c_name[:16])].append(r)
    stream: set[tuple[int, int]] = set()
    for rows in blocks.values():
        for i, a in enumerate(rows):
            for b in rows[i + 1 :]:
                if abs(a.bal - b.bal) < 50_000 and dl(a.c_name, b.c_name) <= 2:
                    pair = (a.c_custkey, b.c_custkey)
                    stream.add((min(pair), max(pair)))

    # batch funnel: per-segment SNM window (offsets 1..3), same verify
    batch: set[tuple[int, int]] = set()
    for _, g in pdf.groupby("c_mktsegment"):
        rows = sorted(
            g.itertuples(),
            key=lambda r: (f"{r.c_nationkey}|{r.c_name}", r.c_custkey),
        )
        for i, a in enumerate(rows):
            for k in range(1, 4):  # SNM_WINDOW = 4 -> offsets 1..3
                if i + k < len(rows):
                    b = rows[i + k]
                    if (
                        a.c_nationkey == b.c_nationkey
                        and abs(a.bal - b.bal) < 50_000
                        and dl(a.c_name, b.c_name) <= 2
                    ):
                        pair = (a.c_custkey, b.c_custkey)
                        batch.add((min(pair), max(pair)))

    def components(pairs: set[tuple[int, int]]) -> dict[int, int]:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        verts = {int(v) for p in pairs for v in p}
        return {v: find(v) for v in verts}

    union_pairs = stream | batch
    comp_s = components(stream)
    comp_u = components(union_pairs)
    corrected = sum(
        1
        for k in pdf["c_custkey"]
        if comp_s.get(int(k), int(k)) != comp_u.get(int(k), int(k))
    )
    merged_away = sum(1 for v, c in comp_u.items() if v != c)
    return {
        "total_records": (0, len(pdf)),
        "stream_matches": (1, len(stream)),
        "batch_matches": (2, len(batch)),
        "batch_only_matches": (3, len(batch - stream)),
        "corrected_records": (4, corrected),
        "golden_records_after": (5, len(pdf) - merged_away),
    }


def test_er_reconcile_matches_python_pipeline(spark, sf_dir):
    want = _reconcile_reference(sf_dir)
    got = {
        r["stage"]: (r["stage_idx"], r["n_records"])
        for r in SPECS["er_reconcile"].fn(spark, sf_dir).collect()
    }
    assert got == want
    # both candidate generators must actually fire on the fixture
    assert want["stream_matches"][1] > 0
    assert want["golden_records_after"][1] < want["total_records"][1]


@pytest.mark.slow
def test_er_reconcile_full_funnel_at_driver_scale(spark):
    """sf0.01 exercises every stage TRANSITION: links only the batch
    sweep finds (the streaming blocker's prefix-edit recall gap),
    links only the blocker finds (pairs beyond SNM's w-1 adjacency),
    and records whose golden entity changes under the monotone
    repair — without this the reconcile test passes vacuously on the
    small fixture where the two generators agree."""
    sf01 = "/root/testdata/sf0.01"
    want = _reconcile_reference(sf01)
    got = {
        r["stage"]: (r["stage_idx"], r["n_records"])
        for r in SPECS["er_reconcile"].fn(spark, sf01).collect()
    }
    assert got == want
    assert want["batch_only_matches"][1] > 0
    assert want["corrected_records"][1] > 0
    assert want["stream_matches"][1] > want["batch_matches"][1]
