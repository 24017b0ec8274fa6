"""matUtils uncertainty: per-sample placement uncertainty (EPP count +
neighborhood size), batched on the placement kernel.

Parity with reference src/matUtils/uncertainty.cpp: findEPPs (:132-257)
re-places each sample (its root-path mutation set) against the full tree
with self-mapping excluded; neighborhood size (:4-123) is the longest direct
path between any two optimal placements through their MRCA.

The reference runs one tbb loop per sample; here samples batch through the
fused device scorer.
"""

from __future__ import annotations

import sys

import numpy as np

from ..core.tree import Mutation, Node, Tree
from ..placement.driver import PlacementEngine


def _err(*a):
    print(*a, file=sys.stderr)


def ancestral_mutation_set(T: Tree, node: Node) -> list[Mutation]:
    """The sample's genotype as mutations-from-reference: own mutations first,
    then ancestors', keeping the nearest entry per position (uncertainty.cpp
    :144-167)."""
    seen: set[int] = set()
    out: list[Mutation] = []
    for m in node.mutations:
        if m.is_masked() or m.position not in seen:
            out.append(m.copy())
            if not m.is_masked():
                seen.add(m.position)
    cur = node.parent
    while cur is not None:
        for m in cur.mutations:
            if m.is_masked() or m.position not in seen:
                out.append(m.copy())
                if not m.is_masked():
                    seen.add(m.position)
        cur = cur.parent
    out.sort(key=lambda m: m.position)
    # drop entries that equal the reference (no net difference)
    return [m for m in out if m.is_masked() or m.mut_nuc != m.ref_nuc]


def path_to_root(node: Node) -> list[Node]:
    out = [node]
    while out[-1].parent is not None:
        out.append(out[-1].parent)
    return out


def get_neighborhood_size(nodes: list[Node]) -> int:
    """Longest direct path between any two placements through their MRCA
    (uncertainty.cpp:41-123)."""
    if len(nodes) < 2:
        return 0
    paths = [path_to_root(n) for n in nodes]
    common = set(id(x) for x in paths[0])
    for p in paths[1:]:
        common &= set(id(x) for x in p)
    # MRCA = common ancestor with the smallest total distance
    best_anc = None
    best_total = None
    for anc in paths[0]:
        if id(anc) not in common:
            continue
        total = 0
        for p in paths:
            d = 0
            for n in p:
                if n is anc:
                    break
                d += len(n.mutations)
            total += d
        if best_total is None or total < best_total:
            best_total = total
            best_anc = anc
    dists = []
    for p in paths:
        d = 0
        for n in p:
            if n is best_anc:
                break
            d += len(n.mutations)
        dists.append(d)
    dists.sort()
    return int(dists[-1] + dists[-2])


def find_epps(T: Tree, sample_names: list[str], batch_size: int = 64,
              want_neighborhood: bool = True):
    """Returns {sample: (num_best, neighborhood_size, [placement nodes])}."""
    engine = PlacementEngine(T)
    results = {}
    todo = [s for s in sample_names if T.get_node(s) is not None]
    for start in range(0, len(todo), batch_size):
        chunk = todo[start:start + batch_size]
        muts = []
        excl = []
        for name in chunk:
            node = T.get_node(name)
            muts.append(ancestral_mutation_set(T, node))
            excl.append(node.slot)
        res = engine.score_samples(muts, exclude_slots=excl)
        for name, r in zip(chunk, res):
            node = T.get_node(name)
            if r.num_best > 1:
                placements = r.tied_nodes
                nsize = (get_neighborhood_size(placements)
                         if want_neighborhood else 0)
            else:
                placements = [node.parent]
                nsize = 0
            results[name] = (r.num_best, nsize, placements)
    return results


def get_samples_under_max_epps(T: Tree, max_epps: int) -> list[str]:
    """Samples whose EPP count <= max_epps (extract -e)."""
    leaves = T.get_leaves_ids()
    epps = find_epps(T, leaves, want_neighborhood=False)
    return [s for s in leaves
            if s in epps and epps[s][0] <= max_epps]


def uncertainty_main(T: Tree, sample_file: str, epps_out: str = "",
                     locs_out: str = "") -> int:
    """The uncertainty subcommand driver (uncertainty.cpp:259-340)."""
    from .select import read_sample_names
    samples = read_sample_names(sample_file)
    results = find_epps(T, samples)
    if epps_out:
        with open(epps_out, "w") as f:
            f.write("sample\tequally_parsimonious_placements\t"
                    "neighborhood_size\n")
            for s in samples:
                if s not in results:
                    _err(f"WARNING: sample {s} not found in tree")
                    continue
                nb, ns, _ = results[s]
                f.write(f"{s}\t{nb}\t{ns}\n")
    if locs_out:
        with open(locs_out, "w") as f:
            f.write("placement\tsample\n")
            for s in samples:
                if s not in results:
                    continue
                nb, ns, placements = results[s]
                if nb == 1:
                    f.write(f"{s}\t{s}\n")
                else:
                    for pn in placements:
                        f.write(f"{pn.identifier}\t{s}\n")
    return 0
