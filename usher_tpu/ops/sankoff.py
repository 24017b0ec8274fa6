"""Whole-tree per-site Fitch-Sankoff state assignment, vectorized on device.

Replaces the reference's per-site thread-pool Sankoff (usher_mapper.cpp:6-161,
matOptimize/Fitch_Sankoff.cpp): instead of one task per VCF site walking the
pointer tree, ALL sites are solved simultaneously as vector lanes, with the
tree walked level-synchronously via gather/scatter-add on the flattened
parent-index array.

Semantics (bit-exact with reference usher_mapper.cpp):
  - leaf base scores: 0 for bases in the leaf's allele mask, num_nodes ("big")
    otherwise; the mask is the VCF variant nibble if present else the
    reference base (usher_mapper.cpp:33-61).
  - internal score[j] = sum over children of min_k(child_score[k] + (k!=j))
    (usher_mapper.cpp:85-111)  ==  min(child_score[j], min_k child_score[k]+1).
  - state choice walking root->leaf: parent's state if tied for minimum, else
    the lowest-index minimal base (usher_mapper.cpp:113-141).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.tree import Mutation, Tree


def _pick_state(scores: jnp.ndarray, par_state: jnp.ndarray) -> jnp.ndarray:
    """scores [..., 4] int32, par_state [...] int32 (0..3) -> state [...]."""
    min_s = jnp.min(scores, axis=-1)
    first_argmin = jnp.argmin(scores, axis=-1).astype(jnp.int32)
    par_score = jnp.take_along_axis(scores, par_state[..., None], axis=-1)[..., 0]
    return jnp.where(par_score == min_s, par_state, first_argmin)


@functools.partial(jax.jit, static_argnames=("num_nodes",))
def _sankoff_states(leaf_mask, is_leaf, parent, levels_desc, levels_asc,
                    ref_nt, num_nodes: int):
    """leaf_mask [N,S] uint8 nibble; ref_nt [S] int32 (0..3).

    levels_desc/levels_asc: tuples of int32 index arrays grouping BFS indices
    by tree level (descending depth for the leaf->root pass, ascending for the
    root->leaf pass; both exclude the root level).
    Returns states [N,S] int32 in 0..3.
    """
    big = jnp.int32(num_nodes)
    k = jnp.arange(4, dtype=jnp.uint8)
    leaf_scores = jnp.where(
        (leaf_mask[:, :, None] >> k[None, None, :]) & 1, jnp.int32(0), big)
    scores = jnp.where(is_leaf[:, None, None], leaf_scores, jnp.int32(0))

    for lev in levels_desc:
        ch = scores[lev]                                   # [L,S,4]
        m = jnp.min(ch, axis=-1)
        contrib = jnp.minimum(ch, m[..., None] + 1)
        scores = scores.at[parent[lev]].add(contrib)

    states = jnp.zeros(leaf_mask.shape, dtype=jnp.int32)
    states = states.at[0].set(_pick_state(scores[0], ref_nt))
    for lev in levels_asc:
        ps = states[parent[lev]]
        states = states.at[lev].set(_pick_state(scores[lev], ps))
    return states


def assign_states_from_vcf(T: Tree, vcf) -> None:
    """Build the MAT: run per-site Fitch-Sankoff for every VCF site and attach
    the resulting branch mutations to the (newick-loaded) tree in place.

    Equivalent to the reference's read_vcf(create_new_mat=true) +
    mapper_body pipeline (mutation_annotated_tree.cpp:2052-2179,
    usher_mapper.cpp:6-161), but all sites solve in one device call.
    """
    sites = vcf.sites
    if not sites:
        return
    bfs = T.breadth_first_expansion()
    n = len(bfs)
    bfs_idx = {node.identifier: i for i, node in enumerate(bfs)}
    parent = np.zeros(n, dtype=np.int32)
    is_leaf = np.zeros(n, dtype=bool)
    levels = {}
    for i, node in enumerate(bfs):
        parent[i] = bfs_idx[node.parent.identifier] if node.parent is not None else 0
        is_leaf[i] = node.is_leaf()
        levels.setdefault(node.level, []).append(i)
    level_keys = sorted(levels)
    levels_desc = tuple(np.asarray(levels[k], dtype=np.int32)
                        for k in reversed(level_keys) if k > level_keys[0])
    levels_asc = tuple(np.asarray(levels[k], dtype=np.int32)
                       for k in level_keys if k > level_keys[0])

    # Leaf allele masks per (node, site): ref base unless the VCF names this
    # leaf with a variant.
    s_count = len(sites)
    leaf_mask = np.zeros((n, s_count), dtype=np.uint8)
    ref_nib = np.array([s.ref_nuc for s in sites], dtype=np.uint8)
    leaf_mask[is_leaf] = ref_nib[None, :]
    col_to_node = np.array(
        [bfs_idx.get(name, -1) for name in vcf.sample_ids], dtype=np.int64)
    for si, site in enumerate(sites):
        for col, nuc in site.variants:
            node_i = col_to_node[col]
            if node_i >= 0:
                leaf_mask[node_i, si] = nuc

    ref_nt = np.log2(ref_nib).astype(np.int32)  # single-bit nibble -> 0..3

    states = np.asarray(_sankoff_states(
        jnp.asarray(leaf_mask), jnp.asarray(is_leaf), jnp.asarray(parent),
        tuple(jnp.asarray(a) for a in levels_desc),
        tuple(jnp.asarray(a) for a in levels_asc),
        jnp.asarray(ref_nt), num_nodes=n))

    # Attach mutations where a node's state differs from its parent's
    # (root compares against the reference base).
    par_states = states[parent]
    par_states[0, :] = ref_nt
    mut_nodes, mut_sites = np.nonzero(states != par_states)
    for node_i, si in zip(mut_nodes.tolist(), mut_sites.tolist()):
        site = sites[si]
        m = Mutation(chrom=site.chrom, position=site.position,
                     ref_nuc=site.ref_nuc,
                     par_nuc=1 << int(par_states[node_i, si]),
                     mut_nuc=1 << int(states[node_i, si]))
        bfs[node_i].add_mutation(m)
