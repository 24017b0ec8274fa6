"""No-Tree direct placement: parsimony.pb -> arrays -> place -> outputs.

The standard drivers (placement/driver.py, placement/big_engine.py) keep a
host Python Tree alongside the device arrays — at the reference's >2M-leaf
public MAT that costs minutes to build and ~GBs to hold.  This driver runs
the core usher placement flow entirely over BigMAT arrays loaded by
io/pb_arrays.py: device batch scoring with the snapshot maintained by
O(delta) incremental appends, the host oracle + surgery semantics applied
through lightweight array-backed node views, and array-native writers for
placement_stats.tsv / final-tree.nh / mutation-paths.txt.

Byte-identical outputs to `usher --bigmat` on the same inputs (tested on
the reference smoke fixture).  Scope: the serving core (-i/-v/-d/-n,
thresholds, batching); flags needing host-Tree machinery (collapse,
subtrees, clades, -M/-p, condensed handling, pb save) stay on the Tree
drivers.

Reference semantics: usher_common.cpp:310-780 (loop), usher_mapper.cpp:
167-504 (oracle, via placement/mapper.py unchanged), usher_common.cpp:
652-765 (surgery).
"""

from __future__ import annotations

import os
import sys
from dataclasses import dataclass

import numpy as np

from ..core.nuc import N as NUC_N
from ..core.tree import Mutation, MissingSample
from ..io.pb_arrays import load_mat_arrays
from ..io.vcf import read_vcf_sites
from .mapper import score_placement


def _err(*a):
    print(*a, file=sys.stderr)


class ArrayNode:
    """The minimal Node surface score_placement and the surgery logic touch,
    backed by BigMAT arrays + the driver's per-node deltas."""

    __slots__ = ("d", "slot")

    def __init__(self, d: "DirectPlacer", slot: int):
        self.d = d
        self.slot = int(slot)

    @property
    def parent(self):
        p = int(self.d.big.parent[self.slot])
        return None if p == self.slot else ArrayNode(self.d, p)

    @property
    def mutations(self):
        return self.d.mutations_of(self.slot)

    def is_leaf(self) -> bool:
        return bool(self.d.big.is_leaf[self.slot])

    @property
    def identifier(self) -> str:
        return self.d.name_of(self.slot)


@dataclass
class DirectOptions:
    outdir: str = "."
    batch_size: int = 64
    max_uncertainty: int = 1_000_000
    max_parsimony: int = 1_000_000
    no_add: bool = False


class DirectPlacer:
    def __init__(self, pb_path: str, vcf_path: str | None = None,
                 mesh=None):
        """mesh: optional jax Mesh (flattened to 1-D) — batch-axis
        shard_map composition for the device scoring calls
        (ops/interval.py; CSR metadata replicated per device)."""
        ma = load_mat_arrays(pb_path)
        self.ma = ma
        self.chrom = ma.chrom
        # internal-node counter continues the parsed numbering (node ids are
        # node_1..node_K in '(' order, matching Tree.new_internal_node_id)
        names = ma.names()
        self._names = names
        self._extra_names: list[str] = []
        self.condensed_leaves = {leaf for _, ls in ma.condensed
                                 for leaf in ls}

        self.missing: list[MissingSample] = []
        positions = ma.positions
        ref = ma.ref
        if vcf_path:
            vcf = read_vcf_sites(vcf_path)
            self.missing = self._collect_missing(vcf, set(names))
            pos_ref = dict(zip(positions.tolist(), ref.tolist()))
            for site in vcf.sites:
                pos_ref.setdefault(site.position, site.ref_nuc)
                self.chrom = self.chrom or site.chrom
            positions = np.array(sorted(pos_ref), dtype=np.int64)
            ref = np.array([pos_ref[p] for p in positions.tolist()],
                           dtype=np.uint8)
            # remap the CSR columns into the extended position space
            new_col = np.searchsorted(positions,
                                      ma.positions[ma.mut_col]).astype(
                                          np.int32)
            from ..core.bigmat import BigMAT
            self.big = BigMAT(ma.parent, ma.mut_ptr, new_col, ma.mut_par,
                              ma.mut_mut, positions, ref)
            self.big._recompute_ranks()
        else:
            self.big = ma.to_bigmat()
        if mesh is not None and len(mesh.axis_names) > 1:
            from jax.sharding import Mesh
            mesh = Mesh(np.asarray(mesh.devices).reshape(-1), ("batch",))
        self.big.mesh = mesh
        # internal-node counter continues the parser's numbering: one
        # node_<k> per '(' (= one per internal node; condensed LEAF names
        # may also start with node_ and must not count)
        self._internal_counter = int((~self.big.is_leaf).sum())
        # per-node mutation-list deltas (split/appended nodes); everything
        # else reads the CSR directly
        self._mut_delta: dict[int, list] = {}
        self._placed: set[str] = set()

    # --- node views ---------------------------------------------------------

    def name_of(self, slot: int) -> str:
        if slot < len(self._names):
            return self._names[slot]
        return self._extra_names[slot - len(self._names)]

    def mutations_of(self, slot: int):
        delta = self._mut_delta.get(slot)
        if delta is not None:
            return delta
        big = self.big
        lo, hi = int(big.mut_ptr[slot]), int(big.mut_ptr[slot + 1])
        out = []
        for k in range(lo, hi):
            col = int(big.mut_col[k])
            pos = int(big.positions[col])
            out.append(Mutation(self.chrom, pos, int(big.ref[col]),
                                int(big.mut_par[k]), int(big.mut_mut[k])))
        return out

    def node(self, slot: int) -> ArrayNode:
        return ArrayNode(self, slot)

    # --- VCF ----------------------------------------------------------------

    def _collect_missing(self, vcf, tree_names: set):
        missing: list[MissingSample] = []
        col_to_ms: dict[int, MissingSample] = {}
        for j, name in enumerate(vcf.sample_ids):
            if name in tree_names or name in self.condensed_leaves:
                _err(f"WARNING: Ignoring sample {name} as it is already "
                     f"in the tree.")
            else:
                ms = MissingSample(name)
                missing.append(ms)
                col_to_ms[j] = ms
        for site in vcf.sites:
            for j, nuc in site.variants:
                ms = col_to_ms.get(j)
                if ms is None:
                    continue
                m = Mutation(chrom=site.chrom, position=site.position,
                             ref_nuc=site.ref_nuc, par_nuc=site.ref_nuc)
                if nuc == NUC_N:
                    m.is_missing = True
                    m.mut_nuc = NUC_N
                else:
                    m.mut_nuc = nuc
                ms.mutations.append(m)
                if m.mut_nuc & (m.mut_nuc - 1):
                    ms.num_ambiguous += 1
        return missing

    # --- surgery (usher_common.cpp:652-765 / big_engine semantics) ----------

    def _triplets(self, muts):
        out = []
        for m in muts:
            if m.position < 0:
                continue
            out.append((self.big.pos_index[m.position], int(m.par_nuc),
                        int(m.mut_nuc)))
        return out

    def apply_placement(self, sample_name: str, best_slot: int,
                        hu_best: bool, excess) -> list[int]:
        big = self.big
        changed = []
        if bool(big.is_leaf[best_slot]) or hu_best:
            self._internal_counter += 1
            nid = f"node_{self._internal_counter}"
            curr_l1 = [m.copy() for m in self.mutations_of(best_slot)]
            l1, l2, common = [], [], []
            for m1 in curr_l1:
                if not any((not m1.is_masked())
                           and m1.position == m2.position
                           and m1.mut_nuc == m2.mut_nuc for m2 in excess):
                    l1.append(m1.copy())
            for m1 in excess:
                matched = any((not m1.is_masked())
                              and m1.position == m2.position
                              and m1.mut_nuc == m2.mut_nuc
                              for m2 in curr_l1)
                (common if matched else l2).append(m1.copy())
            x_slot, s_slot = big.queue_sibling_split(
                best_slot, self._triplets(common), self._triplets(l2))
            self._extra_names.append(nid)
            self._extra_names.append(sample_name)
            self._mut_delta[best_slot] = sorted(
                l1, key=lambda m: m.position)
            self._mut_delta[x_slot] = sorted(
                common, key=lambda m: m.position)
            self._mut_delta[s_slot] = sorted(l2, key=lambda m: m.position)
            changed = [s_slot, x_slot, best_slot]
        else:
            curr_l1 = self.mutations_of(best_slot)
            l2 = [m1.copy() for m1 in excess
                  if not any((not m1.is_masked())
                             and m1.position == m2.position
                             and m1.mut_nuc == m2.mut_nuc
                             for m2 in curr_l1)]
            s_slot = big.queue_child_insert(best_slot, self._triplets(l2))
            self._extra_names.append(sample_name)
            self._mut_delta[s_slot] = sorted(l2, key=lambda m: m.position)
            changed = [s_slot]
        return changed

    # --- the placement loop -------------------------------------------------

    def place_all(self, opts: DirectOptions) -> None:
        os.makedirs(opts.outdir, exist_ok=True)
        outdir = os.path.realpath(opts.outdir)
        big = self.big
        _err(f"Found {len(self.missing)} missing samples.\n")
        stats_f = open(os.path.join(outdir, "placement_stats.tsv"), "w")

        bsz = max(1, opts.batch_size)
        for b0 in range(0, len(self.missing), bsz):
            batch = self.missing[b0:b0 + bsz]
            for s in batch:
                s.mutations.sort(key=lambda m: m.position)
            pos, gval, kmiss = big.sparsify([s.mutations for s in batch])
            bs, slot, nb, hu = big.place_arrays(pos, gval, kmiss)
            check_slots: set[int] = set()
            for i, s in enumerate(batch):
                if s.name in self._placed:
                    # duplicate within the VCF: the Tree driver's mid-loop
                    # T.get_node check skips it the same way
                    _err(f"WARNING: Sample {s.name} already in the tree! "
                         f"Ignoring.\n")
                    continue
                best_score = int(bs[i])
                best_slot = int(slot[i])
                num_best = int(nb[i])
                hu_best = bool(hu[i])
                if check_slots:
                    # earlier applies made the batch snapshot stale for
                    # this sample; re-score EXACTLY on the host (numpy
                    # interval engine, ~ms) — a device dispatch would
                    # re-upload the post-append epoch metadata every time
                    p1, g1, k1 = big.sparsify([s.mutations])
                    best_score, best_slot, num_best, hu_best = \
                        big.place_one_host(p1, g1, k1)

                detail = score_placement(self.node(best_slot), s.mutations)
                if detail.set_difference != best_score:
                    raise AssertionError(
                        f"device/host score mismatch for {s.name} at "
                        f"{self.name_of(best_slot)}: {best_score} vs "
                        f"{detail.set_difference}")

                total_nodes = big.N + sum(
                    1 if p[0] == "child" else 2 for p in big._pending)
                _err(f"Current tree size (#nodes): {total_nodes}\tSample "
                     f"name: {s.name}\tParsimony score: {best_score}\t"
                     f"Number of parsimony-optimal placements: {num_best}")
                stats_f.write(f"{s.name}\t{best_score}\t{num_best}\t")

                if num_best > 1:
                    if num_best > opts.max_uncertainty:
                        _err(f"WARNING: Number of parsimony-optimal "
                             f"placements exceeds maximum allowed value "
                             f"({opts.max_uncertainty}). Ignoring sample "
                             f"{s.name}.")
                    elif best_score <= opts.max_parsimony:
                        _err("WARNING: Multiple parsimony-optimal "
                             "placements found. Placement done without "
                             "high confidence.")
                if best_score > opts.max_parsimony:
                    _err(f"WARNING: Parsimony score of the most "
                         f"parsimonious placement exceeds the maximum "
                         f"allowed value ({opts.max_parsimony}). Ignoring "
                         f"sample {s.name}.")

                if (num_best <= opts.max_uncertainty
                        and best_score <= opts.max_parsimony):
                    if not opts.no_add:
                        changed = self.apply_placement(
                            s.name, best_slot, hu_best, detail.excess)
                        check_slots.update(changed)
                        self._placed.add(s.name)
                    if detail.imputed:
                        from ..placement.driver import _nuc_char
                        imp = ";".join(
                            f"{m.position}:{_nuc_char(m.mut_nuc)}"
                            for m in detail.imputed)
                        _err("Imputed mutations:\t" + imp)
                        stats_f.write(imp)
                stats_f.write("\n")
        stats_f.close()
        big._flush()

        path = os.path.join(outdir, "final-tree.nh")
        _err(f"Writing final tree to file {path}")
        with open(path, "w") as f:
            f.write(self.write_newick())
        path = os.path.join(outdir, "mutation-paths.txt")
        _err(f"Writing mutation paths to file {path}")
        with open(path, "w") as f:
            for s in self.missing:
                f.write(self._mutation_path(s.name))

    # --- array-native writers ----------------------------------------------

    def write_newick(self) -> str:
        """final-tree.nh: internal labels, branch length = mutation count
        (write_newick semantics over the appended arrays)."""
        big = self.big
        big._flush()
        order = big.dfs_order
        counts = np.zeros(big.N, np.int64)
        nbase = self.ma.n
        counts[:nbase] = np.diff(self.ma.mut_ptr)
        for slot, muts in self._mut_delta.items():
            counts[slot] = len(muts)
        out: list[str] = []
        # iterative: first child of u is rank r+1; next sibling of c is
        # rank dfs_end_of[c]
        dfs_of, dfs_end = big.dfs_of, big.dfs_end_of
        stack = [(int(order[0]), -1)]
        while stack:
            slot, child_rank = stack[-1]
            r, e = int(dfs_of[slot]), int(dfs_end[slot])
            if child_rank == -1:
                if e > r + 1:
                    out.append("(")
                    # cursor = first child's END (the next sibling's rank)
                    stack[-1] = (slot, int(dfs_end[order[r + 1]]))
                    stack.append((int(order[r + 1]), -1))
                    continue
                child_rank = e  # leaf: fall through to emit
            if child_rank < e:
                out.append(",")
                stack[-1] = (slot, int(dfs_end[order[child_rank]]))
                stack.append((int(order[child_rank]), -1))
                continue
            if e > r + 1:
                out.append(")")
            out.append(f"{self.name_of(slot)}:{int(counts[slot])}")
            stack.pop()
        return "".join(out) + ";"

    def _mutation_path(self, sample_name: str) -> str:
        try:
            slot = len(self._names) + self._extra_names.index(sample_name)
        except ValueError:
            return ""
        chain = []
        cur = slot
        while True:
            muts = self.mutations_of(cur)
            if muts:
                chain.append(self.name_of(cur) + ":"
                             + ",".join(m.get_string() for m in muts) + " ")
            p = int(self.big.parent[cur])
            if p == cur:
                break
            cur = p
        return sample_name + "\t" + "".join(reversed(chain)) + "\n"


def run_usher_direct(pb_path: str, vcf_path: str,
                     opts: DirectOptions, mesh=None) -> int:
    placer = DirectPlacer(pb_path, vcf_path, mesh=mesh)
    placer.place_all(opts)
    return 0
