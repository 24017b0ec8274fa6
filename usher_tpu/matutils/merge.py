"""matUtils merge: combine two MATs sharing a common base.

Parity with reference src/matUtils/merge.cpp:125 (merge_main): the larger
tree is the base; samples common to both are consistency-checked by exact
genotype reconstruction; samples exclusive to the second tree are placed
into the base by maximum parsimony (batched on the placement kernel,
replacing the reference's per-sample mapper loop).
"""

from __future__ import annotations

import sys

from ..core.tree import MissingSample, Mutation, Tree


def _err(*a):
    print(*a, file=sys.stderr)


def sample_genotype_mutations(T: Tree, name: str) -> list[Mutation]:
    """Sample's net mutations from the reference (nearest entry per
    position along the root path; reference merge.cpp consistency check)."""
    node = T.get_node(name)
    seen: set[int] = set()
    out = []
    cur = node
    while cur is not None:
        for m in cur.mutations:
            if not m.is_masked() and m.position not in seen:
                seen.add(m.position)
                if m.mut_nuc != m.ref_nuc:
                    out.append(m.copy())
        cur = cur.parent
    out.sort(key=lambda m: m.position)
    return out


def consistent(T1: Tree, T2: Tree, name: str) -> bool:
    g1 = {m.position: m.mut_nuc for m in sample_genotype_mutations(T1, name)}
    g2 = {m.position: m.mut_nuc for m in sample_genotype_mutations(T2, name)}
    if set(g1) != set(g2):
        return False
    return all(g1[p] & g2[p] for p in g1)


def merge_mats(T1: Tree, T2: Tree, max_uncertainty: int = 1_000_000) -> Tree:
    """Merge T2 into T1 (the reference picks the larger tree as base;
    callers should order arguments accordingly).  Returns the base tree."""
    if T1.condensed_nodes:
        T1.uncondense_leaves()
    if T2.condensed_nodes:
        T2.uncondense_leaves()
    leaves1 = set(T1.get_leaves_ids())
    leaves2 = T2.get_leaves_ids()

    common = [s for s in leaves2 if s in leaves1]
    new = [s for s in leaves2 if s not in leaves1]
    _err(f"{len(common)} shared samples, {len(new)} samples to place.")

    bad = [s for s in common if not consistent(T1, T2, s)]
    if bad:
        raise ValueError(
            f"ERROR: {len(bad)} shared samples have inconsistent genotypes "
            f"(e.g. {bad[0]}); trees do not share a common base")

    if new:
        from ..placement.driver import PlacementEngine
        from ..placement.sampled import place_batch

        missing = []
        # positions in T2 samples may be absent from T1; collect the union
        extra_positions = {}
        for name in new:
            muts = sample_genotype_mutations(T2, name)
            s = MissingSample(name)
            s.mutations = muts
            missing.append(s)
            for m in muts:
                extra_positions[m.position] = m

        # seed T1's position set with any new positions via a pseudo "vcf"
        class _Site:
            __slots__ = ("position", "ref_nuc", "chrom", "variants")

            def __init__(self, m):
                self.position = m.position
                self.ref_nuc = m.ref_nuc
                self.chrom = m.chrom
                self.variants = []

        class _Vcf:
            def __init__(self, sites):
                self.sites = sites
                self.sample_ids = []

        vcf = _Vcf([_Site(m) for m in extra_positions.values()])
        engine = PlacementEngine(T1, vcf)
        stats = place_batch(engine, missing,
                            max_uncertainty=max_uncertainty)
        _err(f"Placed {stats.placed} samples "
             f"({stats.retried} stale retries).")
    return T1
