"""matUtils mask: sample restriction, renaming, mutation masking, simplify,
node moving.

Parity with reference src/matUtils/mask.cpp (function file:line cited).
"""

from __future__ import annotations

import random
import sys
from collections import defaultdict

from ..core.tree import Mutation, Tree


def _err(*a):
    print(*a, file=sys.stderr)


def restrict_samples(T: Tree, samples_filename: str) -> None:
    """Mask mutations found only in subtrees made entirely of restricted
    samples (mask.cpp:802-905): such mutations become MASKED placeholders."""
    from .select import read_sample_names
    restricted = set(read_sample_names(samples_filename))
    for s in restricted:
        if T.get_node(s) is None:
            raise KeyError(f"ERROR: Sample missing in input MAT! ({s})")

    visited: set[str] = set()
    restricted_roots = []
    for cn in T.breadth_first_expansion():
        s = cn.identifier
        if s not in restricted or s in visited:
            continue
        curr = cn
        node = cn.parent
        while node is not None:
            leaves = T.get_leaves_ids(node.identifier)
            if any(l not in restricted for l in leaves):
                break
            visited.update(leaves)
            curr = node
            node = node.parent
        restricted_roots.append(curr)

    counts: dict[str, int] = defaultdict(int)
    for n in T.depth_first_expansion():
        for m in n.mutations:
            if not m.is_masked():
                counts[m.get_string()] += 1
    for r in restricted_roots:
        for n in T.depth_first_expansion(r):
            for m in n.mutations:
                if not m.is_masked():
                    counts[m.get_string()] -= 1
    for r in restricted_roots:
        for n in T.depth_first_expansion(r):
            for m in n.mutations:
                if not m.is_masked() and counts[m.get_string()] == 0:
                    _err(f"Masking mutation {m.get_string()} at node "
                         f"{n.identifier}")
                    m.position = -1
                    m.ref_nuc = 0
                    m.par_nuc = 0
                    m.mut_nuc = 0


def rename_samples(T: Tree, rename_filename: str) -> None:
    """old\\tnew per line (mask.cpp:679-705)."""
    with open(rename_filename) as f:
        for line in f:
            words = line.rstrip("\n").split("\t")
            if len(words) != 2:
                raise ValueError(
                    f"ERROR: Incorrect format for the renaming file: "
                    f"{rename_filename}!")
            if T.get_node(words[0]) is None:
                _err(f"WARNING: Node {words[0]} not found in the MAT.")
            else:
                T.rename_node(words[0], words[1])


def simplify_tree(T: Tree) -> None:
    """Strip identifying data: rename leaves to l<k> (shuffled, seed 0),
    clear leaf mutations, deduplicate resulting identical polytomy leaves
    (mask.cpp:635-677)."""
    leaves = T.get_leaves()
    rng = random.Random(0)
    rng.shuffle(leaves)
    for rid, l in enumerate(leaves):
        l.mutations = []
        T.rename_node(l.identifier, f"l{rid}")
    for l1_id in T.get_leaves_ids():
        l1 = T.get_node(l1_id)
        if l1 is None or l1.mutations:
            continue
        polytomy = [l2 for l2 in l1.parent.children
                    if l2.is_leaf() and T.get_node(l2.identifier) is not None
                    and not l2.mutations]
        for extra in polytomy[1:]:
            T.remove_node(extra.identifier, False)


def _match_mutations(target: Mutation, query: Mutation) -> bool:
    """N in the target matches anything (mask.cpp:707-726)."""
    if target.position != query.position:
        return False
    if target.ref_nuc != 0b1111 and target.par_nuc != query.par_nuc:
        return False
    if target.mut_nuc != 0b1111 and target.mut_nuc != query.mut_nuc:
        return False
    return True


def parse_mutation_string(s: str) -> Mutation:
    """'A123G' / 'N123N' style; N wildcards either side."""
    from ..core.nuc import nuc_id_from_char
    par = nuc_id_from_char(s[0])
    mut = nuc_id_from_char(s[-1])
    pos = int(s[1:-1])
    return Mutation(chrom="", position=pos, ref_nuc=par, par_nuc=par,
                    mut_nuc=mut)


def mask_mutations(T: Tree, mutations_filename: str) -> int:
    """Remove matching mutations everywhere (mask.cpp:746-800,
    restrictMutationsLocally global mode).  Returns #instances masked."""
    targets = []
    with open(mutations_filename) as f:
        for line in f:
            line = line.strip().split("\t")[0]
            if line:
                targets.append(parse_mutation_string(line))
    masked = 0
    for n in T.depth_first_expansion():
        keep = []
        for m in n.mutations:
            if any(_match_mutations(t, m) for t in targets):
                masked += 1
            else:
                keep.append(m)
        n.mutations = keep
    return masked


def move_nodes(T: Tree, node_filename: str) -> None:
    """node_id\\tnew_parent_id per line: re-graft (mask.cpp:967+)."""
    with open(node_filename) as f:
        for line in f:
            words = line.rstrip("\n").split("\t")
            if len(words) != 2:
                raise ValueError("ERROR: Incorrect format for the move "
                                 "nodes file")
            nid, pid = words
            if T.get_node(nid) is None or T.get_node(pid) is None:
                _err(f"WARNING: node {nid} or {pid} not found; skipping")
                continue
            T.move_node(nid, pid)
