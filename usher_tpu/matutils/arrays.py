"""matUtils over MatArrays: pandemic-scale queries without host Node
objects.

The Tree-backed matUtils modules build a full Python Tree (~minutes and
GBs at the reference's >2M-leaf public MAT).  These functions answer the
common summary queries straight off the flat arrays loaded by
io/pb_arrays.py, byte-identical to the Tree path (which uncondenses
before reporting — the expansion is replayed here over index lists, in
Tree.uncondense_leaves' exact order, core/tree.py:467-497).

Reference schemas: src/matUtils/summary.cpp (cited per writer in
matutils/summary.py).
"""

from __future__ import annotations

import sys
from collections import defaultdict

import numpy as np

from ..core.nuc import char_from_nuc_id, nt_from_nuc_id


def _children_lists(ma):
    """(names, mut_idx ranges, parent list, children lists, root) with the
    loaded condensed nodes expanded (Tree.uncondense_leaves semantics:
    with-mutations groups keep the node as a fresh internal; plain groups
    rename in place and append the rest under the parent)."""
    n = ma.n
    parent = ma.parent.astype(np.int64).tolist()
    names = ma.names()
    # slots are DFS preorder: children in slot order == host child order
    nr = np.nonzero(np.arange(n) != ma.parent)[0]
    order = nr[np.argsort(ma.parent[nr], kind="stable")]
    children: list[list[int]] = [[] for _ in range(n)]
    for s in order.tolist():
        children[int(ma.parent[s])].append(s)
    root = int(np.nonzero(ma.parent == np.arange(
        n, dtype=ma.parent.dtype))[0][0])
    nmut = np.diff(ma.mut_ptr).astype(np.int64).tolist()
    muts_of = list(range(n))        # index into ma CSR; -1 = no mutations
    counter = sum(1 for i in range(n) if children[i])

    def on_new(_j):
        nmut.append(0)
        muts_of.append(-1)

    from ..io.pb_arrays import expand_condensed
    expand_condensed(names, parent, children, lambda i: bool(nmut[i]),
                     ma.condensed, counter, on_new)
    return names, nmut, muts_of, parent, children, root


def print_summary(ma, out=None) -> None:
    """Default console summary over arrays (summary.py print_summary)."""
    out = out if out is not None else sys.stdout
    names, nmut, _muts_of, _parent, children, _root = _children_lists(ma)
    total = len(names)
    leaves = sum(1 for c in children if not c)
    score = int(len(ma.mut_col))
    out.write(f"Total Nodes in Tree: {total}\n")
    out.write(f"Total Samples in Tree: {leaves}\n")
    out.write(f"Total Tree Parsimony: {score}\n")
    ncols = 0
    clades: set[str] = set()
    if ma.ann_counts is not None and len(ma.ann_counts):
        ncols = int(ma.ann_counts.max())
        for a in ma.ann_blob.decode().split("\0")[:-1]:
            if a:
                clades.add(a)
    out.write(f"Number of Annotated Clade Sets: {ncols}\n")
    out.write(f"Total Number of Clades: {len(clades)}\n")


def write_sample_table(ma, filename: str) -> None:
    """sample\\tparsimony\\tparent_id per leaf, DFS order of the expanded
    tree (summary.cpp:70-86)."""
    names, nmut, _muts_of, parent, children, root = _children_lists(ma)
    with open(filename, "w") as f:
        f.write("sample\tparsimony\tparent_id\n")
        stack = [root]
        while stack:
            x = stack.pop()
            if children[x]:
                stack.extend(reversed(children[x]))
            else:
                f.write(f"{names[x]}\t{nmut[x]}\t{names[parent[x]]}\n")


def write_clade_table(ma, filename: str) -> None:
    """clade\\tinclusive_count\\texclusive_count (summary.cpp:88-137) over
    arrays; annotations walked up from each expanded leaf's parent."""
    names, _nmut, _muts_of, parent, children, root = _children_lists(ma)
    from ..io.pb_arrays import ann_lists
    anns, _ncols = ann_lists(ma)
    if anns is None:
        anns = []
    incl: dict[str, int] = defaultdict(int)
    excl: dict[str, int] = defaultdict(int)
    for x in range(len(names)):
        if children[x]:
            continue
        first1 = first2 = True
        node = parent[x]
        while True:
            a = anns[node] if node < len(anns) else []
            if len(a) >= 1 and a[0]:
                incl[a[0]] += 1
                if first1:
                    excl[a[0]] += 1
                    first1 = False
            if len(a) >= 2 and a[1]:
                incl[a[1]] += 1
                if first2:
                    excl[a[1]] += 1
                    first2 = False
            if node == parent[node]:
                break
            node = parent[node]
    with open(filename, "w") as f:
        f.write("clade\tinclusive_count\texclusive_count\n")
        for clade in sorted(incl):
            f.write(f"{clade}\t{incl[clade]}\t{excl[clade]}\n")


def write_mutation_table(ma, filename: str) -> None:
    """ID\\toccurrence (summary.cpp:139-175) — one vectorized pass over
    the CSR (condensation does not change the mutation multiset)."""
    trip = np.stack([ma.mut_par.astype(np.int64),
                     ma.mut_col.astype(np.int64),
                     ma.mut_mut.astype(np.int64)])
    keys, cnts = np.unique(trip.T, axis=0, return_counts=True)
    rows = []
    for (par, col, mut), c in zip(keys.tolist(), cnts.tolist()):
        if mut == 0 or par == 0:
            continue   # masked
        rows.append((char_from_nuc_id(par) + str(int(ma.positions[col]))
                     + char_from_nuc_id(mut), int(c)))
    rows.sort()
    with open(filename, "w") as f:
        f.write("ID\toccurrence\n")
        for name, c in rows:
            f.write(f"{name}\t{c}\n")


def print_mutation_type_counts(ma, out=None) -> None:
    """4x4 from->to counts (summary.cpp:224-243), vectorized."""
    out = out if out is not None else sys.stdout
    a = np.array([nt_from_nuc_id(int(x)) for x in range(16)])
    fr = a[ma.mut_par]
    to = a[ma.mut_mut]
    ok = (fr >= 0) & (to >= 0)
    freq = np.zeros((4, 4), np.int64)
    np.add.at(freq, (fr[ok], to[ok]), 1)
    for i in range(4):
        for j in range(4):
            if i != j:
                out.write(f"{char_from_nuc_id(1 << i)}->"
                          f"{char_from_nuc_id(1 << j)}\t{freq[i][j]}\n")
