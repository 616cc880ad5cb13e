"""Pin the bench driver contract: the ONE JSON line must fit the
driver's tail-capture window.

The driver captures exactly the last 2000 chars of combined output
(measured across the BENCH_r07/r08/r09 artifacts: the 27-query
medians-only r7 line parsed; the ~3000-char r8/r9 lines carrying
per-query "runs" and per-stage dicts were cut mid-"queries" and
recorded "parsed": null). bench.py now emits medians-only on the
contract line and writes forensics to BENCH_DETAIL.json; this test
fails at pytest time — not driver time — if headline growth or a new
field pushes the line back over the window.
"""

from __future__ import annotations

import json

import bench


def _worst_case_line() -> str:
    # every query pinned at a worst-width value (xxx.xxx = 7 chars,
    # wider than any realistic median at sf0.1)
    names = [*bench.HEADLINE, "curation_backfill", "scd2_backfill", "er_backfill"]
    timings = {n: 999.999 for n in names}
    return json.dumps(
        {
            "metric": "headline_queries_total",
            "value": 99999.999,
            "unit": "sec",
            "queries": timings,
            "load_avg_start": [32.99, 32.99, 32.99],
            "degraded": True,
            "sf": 0.001,
        }
    )


def test_contract_line_fits_driver_tail_window() -> None:
    line = _worst_case_line()
    assert len(line) <= 1900, (
        f"bench contract line would be {len(line)} chars at worst-case "
        f"widths; the driver tail window is 2000 — move fields to "
        f"BENCH_DETAIL.json or trim the headline set"
    )


def test_headline_names_unique() -> None:
    names = [*bench.HEADLINE, "curation_backfill", "scd2_backfill", "er_backfill"]
    assert len(names) == len(set(names))


def test_forensics_fields_not_on_contract_line() -> None:
    # "runs"/"stages" are exactly what overflowed r8/r9 — they must
    # never reappear on the line (they live in BENCH_DETAIL.json)
    line = _worst_case_line()
    payload = json.loads(line)
    assert "runs" not in payload and "stages" not in payload
