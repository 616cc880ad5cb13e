"""Pin the documents.text corpus to pure ASCII (round-11 ADVICE).

Several multimodal oracles deliberately treat ``documents.text`` as a
byte payload (``strlen``/``ascii(text[i])`` in DuckDB vs
``octet_length``/Arrow-kernel bytes in Spark) and are exact only while
char codes == bytes.  mm_scene_cuts and profile_dq_rules were moved to
character semantics on both sides; for the rest, this test makes the
assumption LOUD: if the driver's synthetic corpus ever grows non-ASCII
text, this fails by name instead of the parity gate diverging silently.
"""

from __future__ import annotations

import duckdb
import pytest


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_documents_text_is_pure_ascii(sf):
    n_bad = duckdb.sql(
        f"""
        SELECT count(*) FROM '/root/testdata/{sf}/documents.parquet'
        WHERE strlen(text) <> length(text)
        """
    ).fetchone()[0]
    assert n_bad == 0, (
        f"{n_bad} non-ASCII documents in {sf}: the byte==char oracles "
        "in operators/multimodal.py need character-based rewrites "
        "(see mm_scene_cuts for the pattern)"
    )
