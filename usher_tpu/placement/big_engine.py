"""Pandemic-scale placement engine: PlacementEngine's interface over BigMAT.

The dense FlatMAT holds a [cap, P] path-state matrix — impossible at the
reference's target scale (>2M leaves x ~30k sites ~ 150 GB).  This engine
keeps the tree as CSR mutation lists (core/bigmat.py, O(N+M) ~ tens of MB)
and materializes path states on device only at a batch's entry columns.

Epoch discipline: tree surgery marks the engine dirty; the next scoring
call rebuilds the BigMAT snapshot (O(N+M), seconds at millions of nodes).
The batch placer (placement/sampled.py) scores whole batches against one
snapshot and re-scores only stale samples, so rebuild cost amortizes over
the batch — the same staleness tolerance as the reference's MPI leader
(place_sample.cpp:450-584).
"""

from __future__ import annotations

import numpy as np

from ..core.flat import collect_positions
from ..core.tree import Mutation, Tree
from ..ops.placement import placement_outputs
from .driver import SampleResult


class _FlatShim:
    """The minimal `.flat` surface the drivers touch (tree + slot lookup)."""

    def __init__(self, engine):
        self._engine = engine

    @property
    def tree(self):
        return self._engine.T

    @property
    def positions(self):
        return self._engine.positions

    @property
    def ref(self):
        return self._engine.ref

    @property
    def chrom(self):
        return self._engine.chrom


class BigPlacementEngine:
    """Drop-in engine for run_usher/place_batch on trees too large for the
    dense path.  Interface parity: score_samples(...), apply_placement(...),
    .flat.tree."""

    def __init__(self, T: Tree, vcf=None, extra_mutations=None,
                 max_cols: int = 2048):
        self.T = T
        self.max_cols = max_cols
        positions, ref, chrom = collect_positions(T, vcf)
        if extra_mutations:
            pos_ref = {int(p): int(r) for p, r in zip(positions, ref)}
            for m in extra_mutations:
                if m.position >= 0 and m.position not in pos_ref:
                    pos_ref[m.position] = m.ref_nuc
                    chrom = chrom or m.chrom
            positions = np.array(sorted(pos_ref), dtype=np.int64)
            ref = np.array([pos_ref[p] for p in positions.tolist()],
                           dtype=np.uint8)
        self.positions = positions
        self.ref = ref
        self.chrom = chrom
        self.flat = _FlatShim(self)
        self._big = None
        self._dirty = True

    def _ensure(self):
        if self._dirty or self._big is None:
            from ..core.bigmat import BigMAT
            self._big = BigMAT.from_tree(self.T, self.positions, self.ref)
            self._dirty = False
        return self._big

    def score_samples(self, samples_mutations, want_matrix=False,
                      exclude_slots=None):
        big = self._ensure()
        for muts in samples_mutations:
            muts.sort(key=lambda m: m.position)
        pos, gval, kmiss = big.sparsify(samples_mutations)
        score_T, nc_T, nnm = big.score_batch_T(pos, gval, kmiss,
                                               max_cols=self.max_cols)
        score = score_T.T
        nc = nc_T.T
        valid, has_unique = placement_outputs(
            score, nc, nnm, big.is_root_mask, big.is_leaf, big.active)
        valid = np.asarray(valid)
        has_unique = np.asarray(has_unique)
        if exclude_slots is not None:
            valid = valid.copy()
            for b, slot in enumerate(exclude_slots):
                if slot is not None and slot >= 0:
                    valid[b, slot] = False

        num_leaves = big.num_leaves
        bfs_rank = big.bfs_rank
        nodes = big._nodes
        results = []
        for b in range(len(samples_mutations)):
            s_row, v_row, hu_row = score[b], valid[b], has_unique[b]
            vs = np.where(v_row, s_row, 1 << 30)
            best = int(vs.min())
            tied_slots = np.nonzero(v_row & (s_row == best))[0]
            tied_slots = tied_slots[np.argsort(bfs_rank[tied_slots],
                                               kind="stable")]
            tl = num_leaves[tied_slots]
            cand = tied_slots[tl == tl.max()]
            best_slot = int(cand[np.argmax(bfs_rank[cand])])
            res = SampleResult(
                best_score=best,
                num_best=int(len(tied_slots)),
                best_node=nodes[best_slot],
                best_has_unique=bool(hu_row[best_slot]),
                tied_nodes=[nodes[s] for s in tied_slots],
                tied_has_unique=[bool(hu_row[s]) for s in tied_slots],
            )
            if want_matrix:
                # slots ARE BFS order in BigMAT.from_tree
                res.scores_bfs = s_row
                res.valid_bfs = v_row
            results.append(res)
        return results

    def apply_placement(self, sample_name: str, res: SampleResult,
                        excess: list[Mutation]) -> None:
        """Identical surgery semantics to PlacementEngine.apply_placement
        (reference usher_common.cpp:652-765); the CSR snapshot rebuilds
        lazily on the next scoring call."""
        T = self.T
        best_node = res.best_node
        if best_node.is_leaf() or res.best_has_unique:
            nid = T.new_internal_node_id()
            new_internal = T.create_node(nid, best_node.parent)
            sample_node = T.create_node(sample_name, new_internal)
            T.move_node(best_node.identifier, nid)

            curr_l1 = [m.copy() for m in best_node.mutations]
            best_node.clear_mutations()
            l1, l2, common = [], [], []
            for m1 in curr_l1:
                if not any((not m1.is_masked()) and m1.position == m2.position
                           and m1.mut_nuc == m2.mut_nuc for m2 in excess):
                    l1.append(m1.copy())
            for m1 in excess:
                matched = any((not m1.is_masked())
                              and m1.position == m2.position
                              and m1.mut_nuc == m2.mut_nuc for m2 in curr_l1)
                (common if matched else l2).append(m1.copy())
            for m in common:
                new_internal.add_mutation(m)
            for m in l1:
                best_node.add_mutation(m)
            for m in l2:
                sample_node.add_mutation(m)
        else:
            sample_node = T.create_node(sample_name, best_node.identifier)
            curr_l1 = best_node.mutations
            for m1 in excess:
                if not any((not m1.is_masked()) and m1.position == m2.position
                           and m1.mut_nuc == m2.mut_nuc for m2 in curr_l1):
                    sample_node.add_mutation(m1.copy())
        self._dirty = True
