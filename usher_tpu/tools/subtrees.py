"""Subtree extraction around newly placed samples (-k / -K outputs).

Reference: get_random_single_subtree / get_random_sample_subtrees
(mutation_annotated_tree.cpp:1577-1900).  Implementation pending (M3).
"""

from __future__ import annotations


def write_single_subtree(T, samples, outdir, subtree_size, tree_idx=0,
                         use_tree_idx=False, retain_original_branch_len=False):
    raise NotImplementedError("write-single-subtree (-K) not implemented yet")


def write_sample_subtrees(T, samples, outdir, subtree_size, tree_idx=0,
                          use_tree_idx=False, retain_original_branch_len=False):
    raise NotImplementedError("write-subtrees-size (-k) not implemented yet")
