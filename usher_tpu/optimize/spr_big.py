"""CSR-backed SPR move search: the pandemic-scale MoveFinder.

The dense MoveFinder holds st/stp [N, P] on device — impossible at the
reference's >2M-leaf x ~30k-site scale.  This finder scores each source's
subtree Fitch mask as a SPARSE entry set (its deviations from the reference
row) through BigMAT.score_spr_T (core/bigmat.py: CSR + on-demand column
materialization + the spr-mode Pallas kernel), then applies the radius /
subtree / parent validity rules and the reference tie-break host-side.

Results are bit-identical to MoveFinder.find_moves (tested); sources whose
deviation count exceeds the kernel's lane budget fall back to the dense
per-source scoring of their columns (rare: a source deviates only at its
path + subtree-ambiguity positions).
"""

from __future__ import annotations

import numpy as np

from ..core.bigmat import BigMAT
from ..core.tree import Tree
from .spr import Move, MoveFinder, collapse_bonus

_MAX_K = 1024  # kernel lane budget (placement_pallas.TBK)


class BigMoveFinder(MoveFinder):
    """MoveFinder drop-in whose scoring path never materializes [N, P]
    state matrices on device."""

    def __init__(self, T: Tree, states: np.ndarray, masks: np.ndarray,
                 ref_row: np.ndarray, bfs, parent: np.ndarray,
                 chunk: int = 128, positions=None):
        # host bookkeeping only — never upload [N, P] state matrices
        self.T = T
        self.bfs = bfs
        self.parent = parent
        self.mesh = None
        self.chunk = chunk
        n = len(bfs)
        self.n = n
        self.masks = masks   # dense [n, P] uint8 OR MaskDeviations
        self.ref_row = ref_row

        T.depth_first_expansion()
        self.bfs_index = {id(node): i for i, node in enumerate(bfs)}
        self.dfs_idx = np.array([node.dfs_idx for node in bfs],
                                dtype=np.int64)
        self.dfs_end = np.array([node.dfs_end_idx for node in bfs],
                                dtype=np.int64)
        self.level = np.array([node.level for node in bfs], dtype=np.int32)

        self.adj: list[list[int]] = [[] for _ in range(n)]
        for i in range(1, n):
            self.adj[i].append(int(parent[i]))
            self.adj[parent[i]].append(i)

        if positions is None:
            positions = np.arange(masks.shape[1], dtype=np.int64)
        self.big = BigMAT.from_tree(T, positions, ref_row)
        # BigMAT slots are BFS order == our bfs indexing; verify cheaply
        if not np.array_equal(self.big.parent, parent.astype(np.int32)):
            raise AssertionError("BigMAT BFS order diverged from FitchEngine")
        self._num_leaves_h = np.asarray(self.big.num_leaves)
        self._bfs_rank_h = np.arange(self.n, dtype=np.int32)

    def _dev_of(self, si):
        """(cols, mask values) where node si's Fitch mask deviates from the
        reference row -- from a dense masks matrix or MaskDeviations."""
        if isinstance(self.masks, np.ndarray):
            cols = np.nonzero(self.masks[si] != self.ref_row)[0]
            return cols, self.masks[si][cols]
        return self.masks.deviations(si)

    def find_moves(self, radius: int, sources=None, log=None) -> list[Move]:
        n = self.n
        bfs = self.bfs
        if sources is None:
            sources = [i for i in range(1, n)]
        moves: list[Move] = []
        max_level = int(self.level.max()) if n else 0
        eff_radius = radius if radius > 0 else 2 * max_level + 2
        ref_row = self.ref_row

        for c0 in range(0, len(sources), self.chunk):
            idxs = sources[c0:c0 + self.chunk]
            B = len(idxs)
            oldcost = np.zeros(B, dtype=np.int64)
            # sparse entries: deviations of each source's Fitch mask from ref
            devs = []
            max_k = 1
            for b, si in enumerate(idxs):
                node = bfs[si]
                oldcost[b] = len(node.mutations) + collapse_bonus(node)
                cols, vals = self._dev_of(si)
                devs.append((cols, vals))
                max_k = max(max_k, len(cols))
            # bucket K to >= 64 so chunk-to-chunk deviation-count drift
            # doesn't multiply kernel compilations (the remote compile
            # service charges minutes per distinct program shape)
            K = 64
            while K < max_k:
                K *= 2
            if K > _MAX_K:
                # exceedingly deviant sources: score them via the dense
                # formula on their own columns (host fallback)
                score, nc, nnm = self._dense_rows(idxs)
            else:
                pos = np.full((B, K), self.big.P, dtype=np.int32)
                gval = np.zeros((B, K), dtype=np.uint8)
                for b, (cols, vals) in enumerate(devs):
                    pos[b, :len(cols)] = cols
                    gval[b, :len(cols)] = vals
                s_T, nc_T, nnm = self.big.score_spr_T(pos, gval)
                score, nc = s_T.T, nc_T.T

            cost, slot, hu = self._reduce(idxs, score, nc, nnm, eff_radius)
            for b, si in enumerate(idxs):
                imp = int(oldcost[b]) - int(cost[b])
                if imp > 0 and cost[b] < (1 << 29):
                    d = int(slot[b])
                    moves.append(Move(
                        src=bfs[si], dst=bfs[d], improvement=imp,
                        sibling_split=bool(hu[b]) or bfs[d].is_leaf(),
                        src_interval=(int(self.dfs_idx[si]),
                                      int(self.dfs_end[si])),
                        dst_dfs=int(self.dfs_idx[d])))
        return moves

    # -- host-side validity, radius bounding, and tie-break ------------------

    def _reduce(self, idxs, score, nc, nnm, radius):
        """Numpy mirror of _score_moves's device mask + reduction
        (optimize/spr.py:55-108), bit-identical semantics."""
        B = len(idxs)
        n = self.n
        has_unique = nc < nnm[None, :]
        nc_pos = nc > 0
        root_mask = np.zeros(n, dtype=bool)
        root_mask[0] = True
        # is_leaf passed as zeros in the dense scorer: leaves get
        # sibling-split via has_unique
        valid = (root_mask[None, :]
                 | (has_unique & nc_pos)
                 | (~has_unique))

        d = self.dfs_idx[None, :]
        lvl = self.level
        ok = np.zeros((B, n), dtype=bool)
        for b, si in enumerate(idxs):
            # lca level for every dest: deepest src-ancestor containing it
            lca_lvl = np.full(n, -1, dtype=np.int32)
            p = int(self.parent[si])
            while True:
                inside = (self.dfs_idx[p] <= self.dfs_idx) & \
                         (self.dfs_idx < self.dfs_end[p])
                lca_lvl = np.maximum(lca_lvl,
                                     np.where(inside, lvl[p], -1))
                if p == 0:
                    break
                p = int(self.parent[p])
            dist = lvl + lvl[si] - 2 * lca_lvl
            row = dist <= radius
            in_sub = (self.dfs_idx >= self.dfs_idx[si]) & \
                     (self.dfs_idx < self.dfs_end[si])
            row &= ~in_sub
            row[int(self.parent[si])] = False
            ok[b] = row
        valid = valid & ok

        big_c = np.int64(1 << 30)
        s = np.where(valid, score.astype(np.int64), big_c)
        best = s.min(axis=1)
        is_best = valid & (score == best[:, None])
        leaves_masked = np.where(is_best, self._num_leaves_h[None, :], -1)
        best_leaves = leaves_masked.max(axis=1)
        is_best2 = is_best & (self._num_leaves_h[None, :]
                              == best_leaves[:, None])
        rank_masked = np.where(is_best2, self._bfs_rank_h[None, :], -1)
        best_rank = rank_masked.max(axis=1)
        best_slot = np.argmax(
            (self._bfs_rank_h[None, :] == best_rank[:, None]) & is_best2,
            axis=1)
        hu_best = has_unique[np.arange(B), best_slot]
        return best, best_slot.astype(np.int32), hu_best

    def _dense_rows(self, idxs):
        """Fallback: dense scoring of a few extreme sources by materializing
        ALL columns for them via chunked score_spr_T with full-column entry
        sets split across multiple kernel batches."""
        B = len(idxs)
        P = self.big.P
        score = np.zeros((B, self.n), dtype=np.int32)
        nc = np.zeros((B, self.n), dtype=np.int32)
        for b, si in enumerate(idxs):
            cols, vals_all = self._dev_of(si)
            acc_s = np.zeros(self.n, dtype=np.int64)
            acc_n = np.zeros(self.n, dtype=np.int64)
            first = True
            for s0 in range(0, max(len(cols), 1), _MAX_K):
                sub = cols[s0:s0 + _MAX_K]
                K = 1
                while K < max(len(sub), 1):
                    K *= 2
                pos = np.full((1, K), P, dtype=np.int32)
                gval = np.zeros((1, K), dtype=np.uint8)
                pos[0, :len(sub)] = sub
                gval[0, :len(sub)] = vals_all[s0:s0 + _MAX_K][:len(sub)]
                s_T, nc_T, _ = self.big.score_spr_T(pos, gval)
                if first:
                    acc_s += s_T[:, 0]
                    acc_n += nc_T[:, 0]
                    first = False
                else:
                    # subsequent slices add only their corrections
                    acc_s += s_T[:, 0] - self.big.base_spr
                    acc_n += nc_T[:, 0] - self.big.nc_base
            score[b] = acc_s.astype(np.int32)
            nc[b] = acc_n.astype(np.int32)
        return score, nc, self.big.node_num_mut
