"""Distributed connected components over a near-duplicate pair graph —
the cluster-resolution step of large-scale dedup: pair lists say WHICH
documents are near-duplicates; keeping one representative per
*component* (not per pair) is what actually deduplicates a corpus.

Algorithm: iterative min-label propagation (the classic MapReduce /
Pregel connected-components formulation): every node starts labeled
with its own id; each round, every node takes the min of its own label
and its neighbors' labels; converges in O(diameter) rounds (near-dup
components are shallow — pairs of exact copies plus small near-dup
cliques — so 3–5 rounds in practice). Each round is ONE bucketed hash
join (labels onto the symmetric edge list) + ONE hash-routed min
reduction (`first_per_key`), both bounded-group shuffles. Convergence
is detected with a monotone invariant: labels only ever decrease, so
the fleet-wide label SUM strictly decreases until the fixed point —
one cheap `Dataset.sum()` per round instead of an old-vs-new join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from .joins import bucketed_hash_join
from .pairs import first_per_key


def connected_components(
    nodes: rd.Dataset,
    pairs: rd.Dataset,
    *,
    id_col: str = "doc_id",
    max_iters: int = 50,
    num_partitions: int = 64,
) -> rd.Dataset:
    """(nodes with ``id_col``; pairs with columns a, b) →
    Dataset (id_col, cluster_id) where cluster_id = min node id in the
    component. Singletons keep cluster_id = their own id."""
    # symmetric edge list: (src, dst) ∪ (dst, src)
    def sym_simple(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, d]), pa.int64()),
                "dst": pa.array(np.concatenate([d, a]), pa.int64()),
            }
        )

    edges = pairs.map_batches(sym_simple, batch_format="pyarrow").materialize()

    labels = nodes.map_batches(
        lambda b: pa.table(
            {
                "node": b[id_col].cast(pa.int64()),
                "label": b[id_col].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    label_schema = pa.schema([("node", pa.int64()), ("label", pa.int64())])
    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    prev_sum = None
    for _ in range(max_iters):
        # neighbor messages: label(src) proposed to dst
        msgs = bucketed_hash_join(
            edges, labels, on="src", right_on="node",
            num_buckets=num_partitions,
            left_schema=edge_schema,
            right_schema=label_schema,
        ).map_batches(
            lambda b: pa.table({"node": b["dst"], "label": b["label"]}),
            batch_format="pyarrow",
        )
        # new label = min(own, neighbors') — one hash-routed min; the
        # repartition pins the iteration's output block count (without
        # it each union+groupby round multiplies blocks and per-round
        # task overhead grows superlinearly)
        labels = first_per_key(
            labels.union(msgs), key_cols=["node"], order_cols=["label"],
            num_partitions=num_partitions,
        ).repartition(num_partitions).materialize()
        cur = labels.sum("label")
        if cur == prev_sum:  # labels are monotone non-increasing
            break
        prev_sum = cur

    return labels.map_batches(
        lambda b: pa.table({id_col: b["node"], "cluster_id": b["label"]}),
        batch_format="pyarrow",
    )
