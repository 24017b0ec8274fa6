"""Pandemic-scale MAT: CSR mutation lists + on-demand column materialization.

The dense FlatMAT ([cap, P] path states) cannot hold the reference's target
tree (>2M leaves x ~30k segregating sites ~ 150 GB).  BigMAT stores what the
reference's compact MAT stores (8-byte packed mutations,
/root/reference/src/matOptimize/mutation_annotated_tree.hpp:105-240) as
struct-of-arrays: parent pointers + CSR per-node mutation lists, O(N + M)
memory (~tens of MB at full scale).

Placement scoring needs per-(node, entry-position) path states only at the
batch's entry columns.  These are materialized ON DEVICE by pointer-doubling
over precomputed 2^k-ancestor tables (log2(depth) gathers of [N, C]), then
scored by the same Pallas kernel as the dense engine (ops/placement_pallas).
The no-entry aggregate terms (base / nc_base / node_num_mut) are exact
host-side precomputes over the CSR arrays, refreshed per tree epoch:

  base[n]  = sum over n's root-path positions of the no-entry score term
           = F[n] + sum_{m in M(n)} [matched ? 0 : (par!=ref) - (mut!=ref)]
  F[n]     = F[parent] + sum_{m in M(n)} [(mut!=ref) - (par!=ref)]

(level-synchronous vectorized sweep; derivation in ops/placement_pallas.py).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import placement_pallas as pp


class BigMAT:
    """Flat CSR MAT over node slots 0..N-1.

    parent    int32[N]   parent slot (root -> itself); ANY order allowed
    mut_ptr   int64[N+1] CSR row pointers into the mutation arrays
    mut_col   int32[M]   column index (into positions) per mutation
    mut_par   uint8[M]   parent-state nibble
    mut_mut   uint8[M]   mutated-state nibble (nonzero; != mut_par)
    positions int64[P]   genome coordinates (sorted)
    ref       uint8[P]   reference allele nibble per position

    INVARIANT: mutation chains must be consistent — every mutation's
    mut_par equals the path state immediately above it (what the reference
    maintains everywhere and our FS rewrite guarantees).  The base/base_spr
    aggregates telescope per-position deltas along root paths; on an
    inconsistent tree they diverge from the materialized path states and
    scores are silently wrong.  Trees straight from external sources should
    be FS-canonicalized first (FitchEngine.rewrite_mutations).
    """

    def __init__(self, parent, mut_ptr, mut_col, mut_par, mut_mut,
                 positions, ref, num_leaves=None, bfs_rank=None):
        self.parent = np.asarray(parent, dtype=np.int32)
        self.mut_ptr = np.asarray(mut_ptr, dtype=np.int64)
        self.mut_col = np.asarray(mut_col, dtype=np.int32)
        self.mut_par = np.asarray(mut_par, dtype=np.uint8)
        self.mut_mut = np.asarray(mut_mut, dtype=np.uint8)
        self.positions = np.asarray(positions, dtype=np.int64)
        self.ref = np.asarray(ref, dtype=np.uint8)
        self.N = len(self.parent)
        self.P = len(self.positions)
        self.pos_index = {int(p): i for i, p in enumerate(self.positions)}
        self._precompute(num_leaves, bfs_rank)

    # --- construction -------------------------------------------------------

    @classmethod
    def from_tree(cls, T, positions, ref):
        """Build from a host Tree (core/tree.py); node slots are BFS order so
        bfs_rank == slot, giving exact reference tie-break keys."""
        bfs = T.breadth_first_expansion()
        slot_of = {id(n): i for i, n in enumerate(bfs)}
        pos_index = {int(p): i for i, p in enumerate(positions)}
        N = len(bfs)
        parent = np.zeros(N, dtype=np.int32)
        counts = np.zeros(N + 1, dtype=np.int64)
        for i, n in enumerate(bfs):
            parent[i] = slot_of[id(n.parent)] if n.parent is not None else i
            counts[i + 1] = sum(1 for m in n.mutations if m.position >= 0)
        mut_ptr = np.cumsum(counts)
        M = int(mut_ptr[-1])
        mut_col = np.zeros(M, dtype=np.int32)
        mut_par = np.zeros(M, dtype=np.uint8)
        mut_mut = np.zeros(M, dtype=np.uint8)
        k = 0
        for n in bfs:
            for m in n.mutations:
                if m.position < 0:
                    continue
                mut_col[k] = pos_index[m.position]
                mut_par[k] = m.par_nuc
                mut_mut[k] = m.mut_nuc
                k += 1
        big = cls(parent, mut_ptr, mut_col, mut_par, mut_mut, positions, ref)
        big._nodes = bfs  # slot -> host node, for result interpretation
        return big

    # --- epoch precomputes --------------------------------------------------

    def _precompute(self, num_leaves=None, bfs_rank=None):
        N, parent = self.N, self.parent
        root_mask = parent == np.arange(N, dtype=np.int32)
        level = self._levels()
        self.level = level
        self.max_depth = int(level.max()) + 1

        # 2^k ancestor tables
        n_anc = 1
        while (1 << n_anc) < self.max_depth:
            n_anc += 1
        anc = np.zeros((n_anc, N), dtype=np.int32)
        anc[0] = parent
        for k in range(1, n_anc):
            anc[k] = anc[k - 1][anc[k - 1]]
        self.anc = anc
        self.n_anc = n_anc

        # per-mutation terms
        refm = self.ref[self.mut_col].astype(np.int32)
        mi = self.mut_mut.astype(np.int32)
        pi = self.mut_par.astype(np.int32)
        eff = mi != pi
        matched = (refm & mi) != 0
        f_delta_m = np.where(eff, (mi != refm).astype(np.int32)
                             - (pi != refm).astype(np.int32), 0)
        own_corr_m = np.where(eff & ~matched,
                              (pi != refm).astype(np.int32)
                              - (mi != refm).astype(np.int32), 0)
        nc_base_m = (eff & matched).astype(np.int32)

        mut_node = np.repeat(np.arange(N),
                             np.diff(self.mut_ptr).astype(np.int64))
        # the root's mutations are path state, not branch mutations (the
        # scorer forces stp[root] = st[root]; mapper counts node_num_mut only
        # when parent exists, usher_mapper.cpp:186) -- they contribute to F
        # (inherited term) but not to the intro/own aggregates
        root_mut = root_mask[mut_node]
        own_corr_m = np.where(root_mut, 0, own_corr_m)
        nc_base_m = np.where(root_mut, 0, nc_base_m)
        eff_branch = eff & ~root_mut
        f_delta = np.bincount(mut_node, weights=f_delta_m,
                              minlength=N).astype(np.int64)
        own_corr = np.bincount(mut_node, weights=own_corr_m,
                               minlength=N).astype(np.int64)
        self.nc_base = np.bincount(mut_node, weights=nc_base_m,
                                   minlength=N).astype(np.int32)
        self.node_num_mut = np.bincount(
            mut_node, weights=eff_branch.astype(np.int64),
            minlength=N).astype(np.int32)

        # level-synchronous prefix: F[n] = F[parent] + f_delta[n]
        F = np.zeros(N, dtype=np.int64)
        order = np.argsort(level, kind="stable")
        lvl_sorted = level[order]
        bounds = np.searchsorted(lvl_sorted, np.arange(self.max_depth + 1))
        for li in range(self.max_depth):
            idx = order[bounds[li]:bounds[li + 1]]
            if li == 0:
                F[idx] = f_delta[idx]
            else:
                F[idx] = F[parent[idx]] + f_delta[idx]
        self.base = (F + own_corr).astype(np.int32)

        # leaf / tie-break metadata
        child_count = np.bincount(parent[~root_mask], minlength=N)
        self.is_leaf = child_count == 0
        self.is_root_mask = root_mask
        self.root_slot = int(np.nonzero(root_mask)[0][0])
        if num_leaves is None:
            nl = self.is_leaf.astype(np.int64).copy()
            for li in range(self.max_depth - 1, 0, -1):
                idx = order[bounds[li]:bounds[li + 1]]
                np.add.at(nl, parent[idx], nl[idx])
            num_leaves = nl
        self.num_leaves = np.asarray(num_leaves, dtype=np.int32)
        self.bfs_rank = (np.arange(N, dtype=np.int32) if bfs_rank is None
                         else np.asarray(bfs_rank, dtype=np.int32))
        self.active = np.ones(N, dtype=bool)

        # inverted mutation index (CSC by column) for on-demand columns
        csc_order = np.argsort(self.mut_col, kind="stable")
        self.csc_node = mut_node[csc_order].astype(np.int32)
        self.csc_mut = self.mut_mut[csc_order]
        self.csc_eff = eff[csc_order]
        self.csc_ptr = np.searchsorted(self.mut_col[csc_order],
                                       np.arange(self.P + 1))

        # kept for the lazy SPR-base precompute
        self._mut_node = mut_node
        self._root_mut = root_mut
        self._level_order = order
        self._level_bounds = bounds
        self._base_spr = None

    @property
    def base_spr(self):
        """Per-node aggregate for SPR move scoring: sum over ALL positions of
        the E=1-everywhere g==ref term ((ref & A_r) == 0) — the base the SPR
        scorer (optimize/spr.py _score_moves) decomposes around, which
        differs from the placement no-entry base (A_r != ref) whenever A_r is
        a multi-bit ambiguity mask containing ref.

        Derivation: at positions without a branch mutation at n the term is
        (ref & pathstate) == 0, which telescopes over the root path exactly
        like the placement F recurrence; n's own branch positions swap in the
        bm-aware term.  nc_base is IDENTICAL between the two modes."""
        if self._base_spr is None:
            refm = self.ref[self.mut_col].astype(np.int32)
            mi = self.mut_mut.astype(np.int32)
            pi = self.mut_par.astype(np.int32)
            eff = mi != pi
            matched = (refm & mi) != 0
            miss_mi = ((refm & mi) == 0).astype(np.int64)
            miss_pi = ((refm & pi) == 0).astype(np.int64)
            g_delta_m = np.where(eff, miss_mi - miss_pi, 0)
            own_corr_m = np.where(eff & ~matched, miss_pi - miss_mi, 0)
            own_corr_m = np.where(self._root_mut, 0, own_corr_m)
            N = self.N
            g_delta = np.bincount(self._mut_node, weights=g_delta_m,
                                  minlength=N).astype(np.int64)
            own_corr = np.bincount(self._mut_node, weights=own_corr_m,
                                   minlength=N).astype(np.int64)
            G = np.zeros(N, dtype=np.int64)
            order, bounds = self._level_order, self._level_bounds
            parent = self.parent
            for li in range(self.max_depth):
                idx = order[bounds[li]:bounds[li + 1]]
                if li == 0:
                    G[idx] = g_delta[idx]
                else:
                    G[idx] = G[parent[idx]] + g_delta[idx]
            self._base_spr = (G + own_corr).astype(np.int32)
        return self._base_spr

    def score_spr_T(self, pos, gval, max_cols: int = 2048):
        """SPR-mode scoring (E=1 everywhere, no missing): score_T/nc_T for a
        batch of subtree Fitch masks given as entry deviations from ref.
        Same chunking as score_batch_T."""
        B, K = pos.shape
        kmiss = np.zeros((B, K), dtype=bool)
        score_T = np.empty((self.N, B), dtype=np.int32)
        nc_T = np.empty((self.N, B), dtype=np.int32)
        start = 0
        while start < B:
            end = start + 1
            cols = np.unique(pos[start][pos[start] < self.P])
            while end < B:
                cand = np.union1d(cols, pos[end][pos[end] < self.P])
                if len(cand) > max_cols:
                    break
                cols = cand
                end += 1
            s, n = self._score_chunk(pos[start:end], gval[start:end],
                                     kmiss[start:end], cols, spr=True)
            score_T[:, start:end] = s
            nc_T[:, start:end] = n
            start = end
        return score_T, nc_T, self.node_num_mut

    def _levels(self):
        """Exact levels: #hops to root, O(depth) vectorized gathers."""
        N = self.N
        idx = np.arange(N, dtype=np.int32)
        level = np.zeros(N, dtype=np.int32)
        at = idx.copy()
        moving = self.parent[at] != at
        iters = 0
        while moving.any():
            at = np.where(moving, self.parent[at], at)
            level += moving
            moving = self.parent[at] != at
            iters += 1
            if iters > N:
                raise ValueError("parent pointers contain a cycle")
        return level

    # --- sample encoding ----------------------------------------------------

    def sparsify(self, samples_mutations, k_slots=None):
        """Mutation lists -> (pos_cols [B,K] i32, gval [B,K] u8,
        kmiss [B,K] bool); padding slots get pos = P (mapped per-chunk)."""
        return pp.sparsify(samples_mutations, self.pos_index, self.P,
                           k_slots=k_slots)

    # --- scoring ------------------------------------------------------------

    def score_batch_T(self, pos, gval, kmiss, max_cols=2048):
        """Score a batch against every node: returns (score_T [N,B],
        num_common_T [N,B], node_num_mut [N]) numpy arrays.

        pos is in GLOBAL position-index space (>= P marks padding).  The
        batch is internally chunked so each device call touches at most
        max_cols unique columns ([N, C] on-demand state materialization).
        """
        B, K = pos.shape
        score_T = np.empty((self.N, B), dtype=np.int32)
        nc_T = np.empty((self.N, B), dtype=np.int32)
        start = 0
        while start < B:
            end = start + 1
            cols = np.unique(pos[start][pos[start] < self.P])
            while end < B:
                cand = np.union1d(cols, pos[end][pos[end] < self.P])
                if len(cand) > max_cols:
                    break
                cols = cand
                end += 1
            s, n = self._score_chunk(pos[start:end], gval[start:end],
                                     kmiss[start:end], cols)
            score_T[:, start:end] = s
            nc_T[:, start:end] = n
            start = end
        return score_T, nc_T, self.node_num_mut

    def _score_chunk(self, pos, gval, kmiss, cols, spr: bool = False):
        C = len(cols)
        # bucket the column axis to 512-multiples so chunk-to-chunk shape
        # drift doesn't retrigger compilation
        C_pad = max(128, -(-C // 512) * 512) if C > 128 else 128
        # m0: own branch-mutation allele per (node, column)
        lo = self.csc_ptr[cols]
        hi = self.csc_ptr[cols + 1]
        counts = hi - lo
        flat_idx = np.repeat(lo, counts) + _ranges(counts)
        coo_col = np.repeat(np.arange(C, dtype=np.int32), counts)
        coo_node = self.csc_node[flat_idx]
        coo_val = np.where(self.csc_eff[flat_idx], self.csc_mut[flat_idx], 0)
        m0 = np.zeros((self.N, C_pad), dtype=np.uint8)
        m0[coo_node, coo_col] = coo_val
        ref_cols = np.zeros(C_pad, dtype=np.uint8)
        ref_cols[:C] = self.ref[cols]
        # remap entry positions into column space
        col_of = np.full(self.P + 1, C_pad, dtype=np.int32)
        col_of[cols] = np.arange(C, dtype=np.int32)
        pos_cols = col_of[np.minimum(pos, self.P)]
        base = self.base_spr if spr else self.base
        score_t, nc_t = pp.score_cols_T(
            jnp.asarray(m0), jnp.asarray(self.anc), jnp.asarray(self.parent),
            np.int32(self.root_slot), jnp.asarray(ref_cols),
            jnp.asarray(base), jnp.asarray(self.nc_base),
            jnp.asarray(pos_cols), jnp.asarray(gval), jnp.asarray(kmiss),
            pos.shape[1], self.n_anc, spr=spr)
        return np.asarray(score_t), np.asarray(nc_t)

    def place_batch(self, samples_mutations, max_cols=2048):
        """Best placements for a batch: (best_score [B], best_slot [B],
        num_best [B]) with the reference tie-break and validity rules."""
        from ..ops.placement import placement_outputs
        pos, gval, kmiss = self.sparsify(samples_mutations)
        score_T, nc_T, nnm = self.score_batch_T(pos, gval, kmiss, max_cols)
        valid, _ = placement_outputs(score_T.T, nc_T.T, nnm,
                                     self.is_root_mask, self.is_leaf,
                                     self.active)
        score, valid = score_T.T, np.asarray(valid)
        vs = np.where(valid, score, 1 << 30)
        best_score = vs.min(axis=1)
        is_best = valid & (score == best_score[:, None])
        num_best = is_best.sum(axis=1)
        leaves = np.where(is_best, self.num_leaves[None, :], -1)
        best_leaves = leaves.max(axis=1)
        is_best2 = is_best & (self.num_leaves[None, :] == best_leaves[:, None])
        rank = np.where(is_best2, self.bfs_rank[None, :], -1)
        best_rank = rank.max(axis=1)
        best_slot = np.argmax(
            (self.bfs_rank[None, :] == best_rank[:, None]) & is_best2, axis=1)
        return (best_score.astype(np.int32), best_slot.astype(np.int32),
                num_best.astype(np.int32))


def _ranges(counts):
    """[0..c0-1, 0..c1-1, ...] for a vector of counts (vectorized)."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    starts = np.cumsum(counts) - counts
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


def check_chain_consistency(T) -> int:
    """Count mutations whose par_nuc differs from the path state above them
    (0 on any well-formed MAT; BigMAT's telescoped aggregates require 0).
    Debug helper for externally-sourced trees."""
    bad = 0
    stack = [(T.root, {})]
    while stack:
        node, state = stack.pop()
        new_state = state
        if node.mutations:
            new_state = dict(state)
            for m in node.mutations:
                if m.position < 0:
                    continue
                expect = state.get(m.position, m.ref_nuc)
                if node.parent is not None and m.par_nuc != expect:
                    bad += 1
                new_state[m.position] = m.mut_nuc
        for ch in node.children:
            stack.append((ch, new_state))
    return bad
