"""Round-12 focused tests: the local star contraction inside
connected_components (partition-local union-find before the
distributed stitch loop)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Row

from _kafka_streams_scaffold_spark.operators import clustering


def test_contract_partition_collapses_chain_to_star():
    """A chain inside one partition must collapse to a single star
    rooted at the minimum id, across batch boundaries."""
    batches = [
        pd.DataFrame({"src": [5, 4], "dst": [4, 3]}),
        pd.DataFrame({"src": [3, 10], "dst": [2, 11]}),
    ]
    out = pd.concat(list(clustering._contract_partition(iter(batches))))
    got = dict(zip(out["doc_id"], out["label"]))
    assert got == {2: 2, 3: 2, 4: 2, 5: 2, 10: 10, 11: 10}


def test_contract_partition_empty_yields_nothing():
    assert list(clustering._contract_partition(iter([]))) == []


def test_contract_partition_min_root_even_when_min_arrives_last():
    """Union order must not matter: the root is always the set's min,
    even when the smallest id is unioned last."""
    batches = [pd.DataFrame({"src": [7, 9, 1], "dst": [9, 8, 8]})]
    out = pd.concat(list(clustering._contract_partition(iter(batches))))
    got = dict(zip(out["doc_id"], out["label"]))
    assert got == {1: 1, 7: 1, 8: 1, 9: 1}


def test_cc_does_not_relay_through_ids_outside_nodes(spark):
    """The documented ``nodes``-restriction contract, preserved across
    the r12 contraction: an edge path a—x—b where x is NOT in
    ``nodes`` must not merge a and b (only ids present in ``nodes``
    participate in label propagation). The old loop enforced this via
    the label join; the contraction enforces it by semi-joining both
    endpoints before the union-find."""
    nodes = spark.createDataFrame([Row(doc_id=i) for i in [1, 3]])
    edges = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=2, dst=3)]  # 2 is not a node
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in clustering.connected_components(nodes, edges).collect()
    }
    assert got == {1: 1, 3: 3}


def test_cc_multi_partition_chain_converges(spark):
    """A long chain spread over many partitions exercises the
    cross-partition stitch loop (contraction alone cannot finish)."""
    n = 64
    nodes = spark.createDataFrame([Row(doc_id=i) for i in range(n)])
    edges = spark.createDataFrame(
        [Row(src=i, dst=i + 1) for i in range(n - 1)]
    ).repartition(16)
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in clustering.connected_components(nodes, edges).collect()
    }
    assert got == {i: 0 for i in range(n)}
