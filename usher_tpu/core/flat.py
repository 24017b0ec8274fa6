"""Flattened tensor view of the MAT, resident on device.

The placement kernel consumes the MAT as dense arrays:
  st [cap, P]  path-state nibble per (node slot, segregating position)
  parent, num_leaves, bfs_rank, is_leaf, active  per node slot

Node slots are stable across tree surgery: inserting a sample appends new
slots, and path states of existing nodes are unchanged by a placement
(splitting a branch redistributes branch mutations but preserves every
node's root-path state), so the big [cap, P] array is updated incrementally
-- the device never re-materializes the tree.  Order-dependent metadata
(BFS rank for tie-breaks, subtree leaf counts) is small and recomputed from
the host tree per scoring call.

The position axis P is the union of segregating sites (tree mutations +
VCF sites), padded to a lane multiple.  This mirrors the reference's
sparse-position design (only mutated positions cost anything; see
mutation-list flat maps in /root/reference/src/matOptimize/
mutation_annotated_tree.hpp:242-388) but as dense vector lanes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .nuc import N as NUC_N
from .tree import Tree, Node

_LANE = 128


def _pad_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m if n else m


def collect_positions(T: Tree, vcf=None):
    """Union of tree mutation positions and VCF site positions, sorted.

    Returns (positions int64[P], ref uint8[P], chrom str).
    """
    pos_ref: dict[int, int] = {}
    chrom = ""
    if vcf is not None:
        for site in vcf.sites:
            pos_ref[site.position] = site.ref_nuc
            chrom = chrom or site.chrom
    for node in T.breadth_first_expansion():
        for m in node.mutations:
            if m.position >= 0 and m.position not in pos_ref:
                pos_ref[m.position] = m.ref_nuc
                chrom = chrom or m.chrom
    positions = np.array(sorted(pos_ref), dtype=np.int64)
    ref = np.array([pos_ref[p] for p in positions.tolist()], dtype=np.uint8)
    return positions, ref, chrom


class FlatMAT:
    """mesh: optional jax.sharding.Mesh with ("data", "model") axes.  When
    set, the [cap, P] state arrays live sharded over "model" (the node axis)
    and the parent path-state matrix stp is maintained explicitly alongside
    st, so scoring needs no cross-shard parent gather (each node shard is
    self-contained; see parallel/mesh.py)."""

    def __init__(self, T: Tree, positions: np.ndarray, ref: np.ndarray,
                 chrom: str = "", mesh=None):
        self.tree = T
        self.mesh = mesh
        self.positions = positions
        self.pos_index = {int(p): i for i, p in enumerate(positions)}
        self.chrom = chrom
        self.P = len(positions)
        self.P_pad = _pad_to(self.P, _LANE)
        self.ref = np.zeros(self.P_pad, dtype=np.uint8)
        self.ref[: self.P] = ref

        nodes = T.depth_first_expansion()
        n = len(nodes)
        self.cap = max(_pad_to(n + max(64, n // 4), _LANE), _LANE)
        self.n_slots = 0
        self.st_host = np.zeros((self.cap, self.P_pad), dtype=np.uint8)
        self.parent_slot = np.zeros(self.cap, dtype=np.int32)
        self._slot_node: list[Node | None] = [None] * self.cap

        for node in nodes:
            slot = self.n_slots
            self.n_slots += 1
            node.slot = slot
            self._slot_node[slot] = node
            if node.parent is None:
                row = self.ref.copy()
            else:
                self.parent_slot[slot] = node.parent.slot
                row = self.st_host[node.parent.slot].copy()
            for m in node.mutations:
                if m.position >= 0:
                    row[self.pos_index[m.position]] = m.mut_nuc
            self.st_host[slot] = row

        self.root_slot = T.root.slot
        if mesh is not None:
            self.stp_host = self.st_host[self.parent_slot].copy()
            self.stp_host[self.root_slot] = self.st_host[self.root_slot]
        else:
            self.stp_host = None
        self._put_device()
        self._dirty: list[int] = []

    # --- incremental maintenance -------------------------------------------

    def _put_device(self) -> None:
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            node_sh = NamedSharding(self.mesh, P("model", None))
            self._st_dev = jax.device_put(self.st_host, node_sh)
            self._stp_dev = jax.device_put(self.stp_host, node_sh)
            self._parent_dev = jax.device_put(
                self.parent_slot, NamedSharding(self.mesh, P("model")))
        else:
            self._st_dev = jnp.asarray(self.st_host)
            self._stp_dev = None
            self._parent_dev = jnp.asarray(self.parent_slot)

    def _grow(self, min_cap: int) -> None:
        new_cap = self.cap
        while new_cap < min_cap:
            new_cap *= 2
        st = np.zeros((new_cap, self.P_pad), dtype=np.uint8)
        st[: self.cap] = self.st_host
        self.st_host = st
        par = np.zeros(new_cap, dtype=np.int32)
        par[: self.cap] = self.parent_slot
        self.parent_slot = par
        if self.stp_host is not None:
            stp = np.zeros((new_cap, self.P_pad), dtype=np.uint8)
            stp[: self.cap] = self.stp_host
            self.stp_host = stp
        self._slot_node.extend([None] * (new_cap - self.cap))
        self.cap = new_cap
        self._put_device()
        self._dirty = []

    def add_node(self, node: Node) -> int:
        """Register a newly created tree node; its path state derives from its
        (already registered) parent plus its branch mutations."""
        if self.n_slots + 1 > self.cap:
            self._grow(self.n_slots + 1)
        slot = self.n_slots
        self.n_slots += 1
        node.slot = slot
        self._slot_node[slot] = node
        parent = node.parent
        self.parent_slot[slot] = parent.slot if parent is not None else slot
        parent_row = (self.st_host[parent.slot] if parent is not None
                      else self.ref)
        row = parent_row.copy()
        for m in node.mutations:
            if m.position >= 0:
                row[self.pos_index[m.position]] = m.mut_nuc
        self.st_host[slot] = row
        if self.stp_host is not None:
            self.stp_host[slot] = parent_row
        self._dirty.append(slot)
        return slot

    def reparent(self, node: Node) -> None:
        """Record a parent change (e.g. sibling split re-grafts the best node
        under a new internal node). Path states are unchanged by placement
        surgery, only the parent pointer (and hence the node's stp row)
        moves."""
        self.parent_slot[node.slot] = node.parent.slot
        if self.stp_host is not None:
            self.stp_host[node.slot] = self.st_host[node.parent.slot]
            self._dirty.append(node.slot)
        else:
            self._dirty.append(-1)  # parent array refresh marker

    def sync(self):
        """Flush pending host-side edits to the device arrays."""
        if self._dirty:
            slots = sorted({s for s in self._dirty if s >= 0})
            if slots:
                idx = jnp.asarray(np.array(slots, dtype=np.int32))
                rows = jnp.asarray(self.st_host[slots])
                self._st_dev = self._st_dev.at[idx].set(rows)
                if self._stp_dev is not None:
                    srows = jnp.asarray(self.stp_host[slots])
                    self._stp_dev = self._stp_dev.at[idx].set(srows)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                self._parent_dev = jax.device_put(
                    self.parent_slot, NamedSharding(self.mesh, P("model")))
            else:
                self._parent_dev = jnp.asarray(self.parent_slot)
            self._dirty = []
        return self._st_dev, self._parent_dev

    def sync_mesh(self):
        """Mesh-mode flush: returns (st_dev, stp_dev), both sharded over the
        "model" axis."""
        assert self.mesh is not None
        self.sync()
        return self._st_dev, self._stp_dev

    # --- per-call metadata --------------------------------------------------

    def order_arrays(self):
        """BFS rank, subtree leaf counts, leaf/active masks per slot, plus the
        BFS node list (host) for interpreting results."""
        bfs = self.tree.breadth_first_expansion()
        active = np.zeros(self.cap, dtype=bool)
        is_leaf = np.zeros(self.cap, dtype=bool)
        bfs_rank = np.full(self.cap, -1, dtype=np.int32)
        num_leaves = np.zeros(self.cap, dtype=np.int32)
        for rank, node in enumerate(bfs):
            s = node.slot
            active[s] = True
            is_leaf[s] = node.is_leaf()
            bfs_rank[s] = rank
        # reverse-BFS leaf count accumulation
        for node in reversed(bfs):
            s = node.slot
            if node.is_leaf():
                num_leaves[s] = 1
            if node.parent is not None:
                num_leaves[node.parent.slot] += num_leaves[s]
        is_root_mask = np.zeros(self.cap, dtype=bool)
        is_root_mask[self.tree.root.slot] = True
        self.root_slot = self.tree.root.slot
        return {
            "bfs": bfs,
            "active": active,
            "is_leaf": is_leaf,
            "bfs_rank": bfs_rank,
            "num_leaves": num_leaves,
            "is_root_mask": is_root_mask,
        }

    # --- sample encoding ----------------------------------------------------

    def encode_samples(self, samples_mutations) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Mutation lists -> (g [B,P_pad] uint8 ref-filled, E bool, miss bool)."""
        B = len(samples_mutations)
        g = np.tile(self.ref, (B, 1))
        E = np.zeros((B, self.P_pad), dtype=bool)
        miss = np.zeros((B, self.P_pad), dtype=bool)
        for b, muts in enumerate(samples_mutations):
            for m in muts:
                idx = self.pos_index.get(m.position)
                if idx is None:
                    raise KeyError(f"sample position {m.position} not in MAT position set")
                E[b, idx] = True
                if m.is_missing:
                    miss[b, idx] = True
                    g[b, idx] = NUC_N
                else:
                    g[b, idx] = m.mut_nuc
        # padded tail: no entries, g=ref(0), harmless
        return g, E, miss
