"""matUtils summary: statistics tables over a MAT.

Output schemas transcribed from reference src/matUtils/summary.cpp
(file:line cited per writer).
"""

from __future__ import annotations

import sys
from collections import defaultdict

from ..core.nuc import char_from_nuc_id, nt_from_nuc_id
from ..core.tree import Tree


def _err(*a):
    print(*a, file=sys.stderr)


def write_sample_table(T: Tree, filename: str) -> None:
    """sample\\tparsimony\\tparent_id per leaf (summary.cpp:70-86)."""
    with open(filename, "w") as f:
        f.write("sample\tparsimony\tparent_id\n")
        for s in T.depth_first_expansion():
            if s.is_leaf():
                f.write(f"{s.identifier}\t{len(s.mutations)}\t"
                        f"{s.parent.identifier}\n")


def write_clade_table(T: Tree, filename: str) -> None:
    """clade\\tinclusive_count\\texclusive_count (summary.cpp:88-137):
    inclusive counts every (leaf, annotated ancestor) pair; exclusive only
    the first annotation encountered walking up from each leaf, per
    annotation column (first two columns only, like the reference)."""
    incl: dict[str, int] = defaultdict(int)
    excl: dict[str, int] = defaultdict(int)
    for s in T.get_leaves():
        first1, first2 = True, True
        node = s.parent
        while node is not None:
            anns = node.clade_annotations
            if len(anns) >= 1 and anns[0]:
                incl[anns[0]] += 1
                if first1:
                    excl[anns[0]] += 1
                    first1 = False
            if len(anns) >= 2 and anns[1]:
                incl[anns[1]] += 1
                if first2:
                    excl[anns[1]] += 1
                    first2 = False
            node = node.parent
    with open(filename, "w") as f:
        f.write("clade\tinclusive_count\texclusive_count\n")
        for clade in sorted(incl):
            f.write(f"{clade}\t{incl[clade]}\t{excl[clade]}\n")


def write_mutation_table(T: Tree, filename: str) -> None:
    """ID\\toccurrence across all nodes (summary.cpp:139-175)."""
    counts: dict[str, int] = defaultdict(int)
    for s in T.depth_first_expansion():
        for m in s.mutations:
            name = m.get_string()
            if name != "MASKED":
                counts[name] += 1
    with open(filename, "w") as f:
        f.write("ID\toccurrence\n")
        for name in sorted(counts):
            f.write(f"{name}\t{counts[name]}\n")


def print_mutation_type_counts(T: Tree, out=sys.stdout) -> None:
    """4x4 from->to counts printed as 'X->Y\\tcount' (summary.cpp:224-243)."""
    freq = [[0] * 4 for _ in range(4)]
    for s in T.depth_first_expansion():
        for m in s.mutations:
            a = nt_from_nuc_id(m.par_nuc)
            b = nt_from_nuc_id(m.mut_nuc)
            if a >= 0 and b >= 0:
                freq[a][b] += 1
    for a in range(4):
        for b in range(4):
            if a != b:
                out.write(f"{char_from_nuc_id(1 << a)}->"
                          f"{char_from_nuc_id(1 << b)}\t{freq[a][b]}\n")


def write_haplotype_table(T: Tree, filename: str) -> None:
    """mutation_set\\tsample_count: per distinct terminal mutation set
    (summary.cpp:246-263)."""
    counts: dict[str, int] = defaultdict(int)
    for s in T.get_leaves():
        key = ",".join(f"{m.position}{char_from_nuc_id(m.mut_nuc)}"
                       for m in s.mutations)
        counts[key] += 1
    with open(filename, "w") as f:
        f.write("mutation_set\tsample_count\n")
        for k in sorted(counts):
            f.write(f"{k}\t{counts[k]}\n")


def write_aberrant_table(T: Tree, filename: str) -> None:
    """NodeID\\tIssue sanity report (summary.cpp:266-296): duplicate ids,
    internal nodes with no mutations and <2 children, annotation-count
    mismatches."""
    num_annotations = T.get_num_annotations()
    seen: set[str] = set()
    with open(filename, "w") as f:
        f.write("NodeID\tIssue\n")
        for n in T.depth_first_expansion():
            if n.identifier in seen:
                f.write(f"{n.identifier}\tduplicate-node-id\n")
            seen.add(n.identifier)
            if (not n.is_leaf() and not n.mutations
                    and len(n.children) < 2 and n.parent is not None):
                f.write(f"{n.identifier}\tinternal-no-mutations\n")
            if len(n.clade_annotations) != num_annotations:
                f.write(f"{n.identifier}\tclade-annotations "
                        f"({len(n.clade_annotations)} not {num_annotations})\n")


def write_sample_clades_table(T: Tree, filename: str) -> None:
    """sample + first annotation found walking up, per annotation column
    (summary.cpp:297-339)."""
    num_annotations = T.get_num_annotations()
    with open(filename, "w") as f:
        f.write("sample")
        for i in range(num_annotations):
            f.write(f"\tannotation_{i+1}")
        f.write("\n")
        for s in T.get_leaves():
            found = [""] * num_annotations
            node = s
            remaining = num_annotations
            while node is not None and remaining:
                for i, a in enumerate(node.clade_annotations):
                    if a and not found[i]:
                        found[i] = a
                        remaining -= 1
                node = node.parent
            f.write(s.identifier)
            for i in range(num_annotations):
                f.write("\t" + (found[i] or "UNDEFINED"))
            f.write("\n")


def print_summary(T: Tree, out=sys.stdout) -> None:
    """Default console summary: counts + parsimony (summary.cpp main)."""
    leaves = T.get_leaves()
    total_nodes = T.num_nodes()
    score = T.get_parsimony_score()
    out.write(f"Total Nodes in Tree: {total_nodes}\n")
    out.write(f"Total Samples in Tree: {len(leaves)}\n")
    out.write(f"Total Tree Parsimony: {score}\n")
    num_annotations = T.get_num_annotations()
    clades: set[str] = set()
    for n in T.depth_first_expansion():
        for a in n.clade_annotations:
            if a:
                clades.add(a)
    out.write(f"Number of Annotated Clade Sets: {num_annotations}\n")
    out.write(f"Total Number of Clades: {len(clades)}\n")
