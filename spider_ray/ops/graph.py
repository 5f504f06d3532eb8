"""Distributed connected components over a near-duplicate pair graph —
the cluster-resolution step of large-scale dedup: pair lists say WHICH
documents are near-duplicates; keeping one representative per
*component* (not per pair) is what actually deduplicates a corpus.

Algorithm: iterative min-label propagation (the classic MapReduce /
Pregel connected-components formulation): every node starts labeled
with its own id; each round, every node takes the min of its own label
and its neighbors' labels, then applies ``jumps`` pointer-jumping
passes (label ← label-of-label — the path-halving device from
union-find / the Stergiou-style short-circuiting CC formulations),
compressing label chains geometrically so long paths converge in
O(log diameter) rounds instead of O(diameter) (a 10^4-node chain
resolves in ≤9 rounds; tests/test_ops.py). Near-dup components are
shallow (exact-copy pairs plus small near-dup cliques), so typical
corpora still finish in 2–3 rounds. Each round is ONE bucketed hash
join (labels onto the symmetric edge list) + ONE hash-routed min
reduction (`first_per_key`) + ``jumps`` label-table self-joins, all
bounded-group shuffles over thin (node, label) rows. Convergence is
detected with a monotone invariant: labels only ever decrease, so the
fleet-wide label SUM strictly decreases until the fixed point — one
cheap `Dataset.sum()` per round instead of an old-vs-new join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from .joins import bucketed_hash_join
from .pairs import first_per_key


def _inline_cc(node_ids: np.ndarray, a: np.ndarray,
               b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Single-pass numpy CC for graphs small enough to sit in one
    task: same min-label + pointer-jumping algorithm, same fixpoint
    (cluster_id = min original id in the component). Labels live as
    dense sorted-id indices so ``lab[lab]`` is the jump."""
    ids = np.unique(np.concatenate([node_ids, a, b])) if len(a) else np.unique(node_ids)
    lab = np.arange(len(ids), dtype=np.int64)
    if len(a):
        ai = np.searchsorted(ids, a)
        bi = np.searchsorted(ids, b)
        while True:
            m = lab.copy()
            np.minimum.at(m, ai, lab[bi])
            np.minimum.at(m, bi, lab[ai])
            m = np.minimum(m, m[m])
            m = np.minimum(m, m[m])
            if np.array_equal(m, lab):
                break
            lab = m
    keep = np.isin(ids, node_ids)
    return ids[keep], ids[lab][keep]


def connected_components(
    nodes: rd.Dataset,
    pairs: rd.Dataset,
    *,
    id_col: str = "doc_id",
    max_iters: int = 50,
    num_partitions: int = 64,
    jumps: int = 2,
    stats: dict | None = None,
    inline_max_edges: int = 2_000_000,
) -> rd.Dataset:
    """(nodes with ``id_col``; pairs with columns a, b) →
    Dataset (id_col, cluster_id) where cluster_id = min node id in the
    component. Singletons keep cluster_id = their own id.

    ``jumps`` pointer-jumping passes run after each neighbor-min step
    (see module docstring); ``stats['rounds']`` reports the number of
    neighbor-min rounds executed when a dict is passed.

    Size-adaptive: when the edge list is at most ``inline_max_edges``
    rows (thin int64 pairs — ≤32 MB at the default), the whole graph
    solves in ONE numpy task instead of paying per-round distributed
    launch cost — the same documented small-input shortcut as the
    crawl's inline rounds (frontier.Crawler.inline_threshold); the
    distributed loop below is the at-scale shape and stays pinned by
    tests with ``inline_max_edges=0``. ``stats['rounds']`` is 0 on the
    inline path."""
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

    # Coalesce BOTH loop inputs to the loop's partition count before
    # iterating: upstream pair pipelines (minhash bands etc.) hand over
    # a hundred-plus tiny blocks, and every one of them becomes a map
    # task in EVERY round's joins — measured 178 s/round vs ~8 s/round
    # at sf0.01 purely from block count. Edges are joined every round,
    # so their block count is a per-round multiplier, not a one-off.
    edges = (
        pairs.map_batches(sym_simple, batch_format="pyarrow")
        .repartition(num_partitions)
        .materialize()
    )

    n_edges = edges.count()
    if n_edges <= 2 * inline_max_edges:  # sym list = 2× pairs
        import ray as _ray

        if n_edges:
            etbl = pa.concat_tables(
                [_ray.get(r) for r in edges.to_arrow_refs()]
            )
            src = etbl["src"].to_numpy(zero_copy_only=False)
            dst = etbl["dst"].to_numpy(zero_copy_only=False)
        else:  # no pairs: every node is its own cluster
            src = dst = np.empty(0, dtype=np.int64)
        ntbl = pa.concat_tables(
            [_ray.get(r) for r in nodes.select_columns([id_col]).to_arrow_refs()]
        )
        out_ids, out_lab = _inline_cc(
            ntbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64),
            src, dst,
        )
        if stats is not None:
            stats["rounds"] = 0
        return rd.from_arrow(
            pa.table(
                {
                    id_col: pa.array(out_ids, pa.int64()),
                    "cluster_id": pa.array(out_lab, pa.int64()),
                }
            )
        )

    labels = nodes.map_batches(
        lambda b: pa.table(
            {
                "node": b[id_col].cast(pa.int64()),
                "label": b[id_col].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).repartition(num_partitions).materialize()
    label_schema = pa.schema([("node", pa.int64()), ("label", pa.int64())])
    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    jump_schema = pa.schema([("jnode", pa.int64()), ("jlabel", pa.int64())])

    def pointer_jump(lbls: rd.Dataset) -> rd.Dataset:
        """label ← label(label): every label value is itself a node id
        (labels start as ids and only ever take min over ids), so one
        self-join of the label table resolves each pointer one hop
        further — chains compress geometrically across rounds."""
        lookup = lbls.map_batches(
            lambda b: pa.table({"jnode": b["node"], "jlabel": b["label"]}),
            batch_format="pyarrow",
        )
        return bucketed_hash_join(
            lbls, lookup, on="label", right_on="jnode",
            num_buckets=num_partitions,
            left_schema=label_schema,
            right_schema=jump_schema,
        ).map_batches(
            lambda b: pa.table({"node": b["node"], "label": b["jlabel"]}),
            batch_format="pyarrow",
        )

    prev_sum = None
    rounds = 0
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
        )
        for _j in range(jumps):
            labels = pointer_jump(labels)
        labels = labels.repartition(num_partitions).materialize()
        rounds += 1
        cur = labels.sum("label")
        if cur == prev_sum:  # labels are monotone non-increasing
            break
        prev_sum = cur
    if stats is not None:
        stats["rounds"] = rounds

    return labels.map_batches(
        lambda b: pa.table({id_col: b["node"], "cluster_id": b["label"]}),
        batch_format="pyarrow",
    )
