"""graph_tree_depth: the synthesized hierarchy is a valid rooted
tree and the distributed pointer-doubling depth equals a pure-Python
walk up the parent chain."""

from __future__ import annotations

from api_weather_kafka_clickhouse_spark import registry

SPECS = registry.all_specs()


def test_tree_depth_matches_parent_chain_walk(spark, sf_dir):
    rows = SPECS["graph_tree_depth"].fn(spark, sf_dir).collect()
    parent = {r.doc_id: r.parent for r in rows}
    depth = {r.doc_id: r.depth for r in rows}
    # rooted tree: exactly one root (0, parent NULL); parent < node
    assert parent[0] is None and depth[0] == 0
    assert all(p is not None and p < n for n, p in parent.items() if n != 0)
    # depth is the true edge count to the root
    for n in parent:
        d, cur = 0, n
        while parent[cur] is not None:
            cur = parent[cur]
            d += 1
            assert d <= len(parent)  # acyclicity guard
        assert depth[n] == d, (n, depth[n], d)


def test_tree_depth_is_logarithmic(spark, sf_dir):
    # random recursive tree: expected max depth ~ e*ln N. At N=500
    # that is ~17; a linear chain (doubling loop degenerating to
    # O(depth) rounds) would show depth near N.
    rows = SPECS["graph_tree_depth"].fn(spark, sf_dir).collect()
    max_depth = max(r.depth for r in rows)
    assert 1 <= max_depth <= 60, max_depth
