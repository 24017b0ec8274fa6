"""Batched maximum-parsimony placement scoring on device.

One fused kernel scores ALL tree nodes x a batch of samples simultaneously,
replacing the reference's per-node task-parallel search with early exit
(usher_mapper.cpp:167-504).  The per-(node,sample) parsimony score is a pure
elementwise+reduction function over genome positions:

Definitions over the segregating-position axis P:
  st[n,p]   path state: most recent branch-mutation allele on the root->n
            path (reference base if unmutated); single-bit nibble.
  stp[n,p]  parent path state = st[parent(n), p] (st itself for the root).
  bm[n,p]   n's branch mutates p  <=>  st != stp.
  g[s,p]    sample allele mask: VCF entry mask; 0xF for missing (N); the
            reference base mask when the sample has no entry.
  E[s,p]    sample has a VCF entry at p;  miss[s,p]  entry is missing (N).

  matched[s,n,p] = (g & st) != 0
      reproduces all three "common mutation" cases of the reference
      (usher_mapper.cpp:204-263): allele intersection, missing-always-
      matches, and no-entry-matches-iff-branch-mutation-is-back-to-ref.
  A[s,n,p] = stp where (bm & ~matched) else st
      the "ancestral_mutations" state: a branch mutation of n that the
      sample does not share is excluded from the sample's path (it will be
      split off as a sibling), reverting that position to the parent path
      state (usher_mapper.cpp:190-289).

  score[s,n] = #{p : E & ~miss & (g & A) == 0}          (new mutations;
               usher_mapper.cpp:291-388)
             + #{p : ~E & A != ref}                      (back mutations;
               usher_mapper.cpp:390-445)

Placement-validity and sibling/child semantics (usher_mapper.cpp:452-455):
  num_common[s,n] = #{p: bm & matched},  node_num_mut[n] = #{p: bm}
  has_unique = num_common < node_num_mut
  valid = is_root | (leaf & num_common>0)
        | (~leaf & has_unique & num_common>0) | (~leaf & ~has_unique)

The argmin with the reference's tie-break (greater subtree leaf count, then
greater BFS index; usher_mapper.cpp:476-497) is applied over the returned
per-node arrays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def score_with_stp(st, stp, ref, active, g, E, miss):
    """Core scoring given precomputed parent path states.

    Separated from the parent gather so the node axis can be sharded across
    chips: st and stp shard together, and no cross-shard gather is needed.
    Shapes as in score_batch.
    """
    bm = st != stp                                        # [N,P]

    gb = g[:, None, :]
    matched = (gb & st[None, :, :]) != 0                  # [B,N,P]
    excl = bm[None, :, :] & ~matched
    A = jnp.where(excl, stp[None, :, :], st[None, :, :])  # [B,N,P]

    Eb = E[:, None, :]
    term1 = Eb & (~miss[:, None, :]) & ((gb & A) == 0)
    term2 = (~Eb) & (A != ref[None, None, :])
    score = (term1 | term2).sum(axis=-1, dtype=jnp.int32)

    num_common = (bm[None, :, :] & matched).sum(axis=-1, dtype=jnp.int32)
    node_num_mut = bm.sum(axis=-1, dtype=jnp.int32)
    big = jnp.int32(1 << 30)
    score = jnp.where(active[None, :], score, big)
    return score, num_common, node_num_mut


@jax.jit
def score_batch(st, parent, root_slot, ref, active, g, E, miss):
    """Score a batch of samples against all (active) nodes.

    st:     [N,P] uint8   path-state nibbles per node slot
    parent: [N]  int32    parent slot (root -> itself)
    root_slot: int32 scalar
    ref:    [P]  uint8    reference base nibble per position
    active: [N]  bool     slot holds a live node
    g:      [B,P] uint8   sample allele masks (ref-filled)
    E,miss: [B,P] bool

    Returns (score [B,N] int32, num_common [B,N] int32, node_num_mut [N] int32)
    """
    stp = st[parent]
    stp = stp.at[root_slot].set(st[root_slot])
    return score_with_stp(st, stp, ref, active, g, E, miss)


def placement_outputs(score, num_common, node_num_mut, is_root_mask, is_leaf,
                      active):
    """Derive validity / has_unique masks (host- or device-side, numpy-compatible)."""
    has_unique = num_common < node_num_mut[None, :]
    nc_pos = num_common > 0
    leaf = is_leaf[None, :]
    valid = (is_root_mask[None, :]
             | (leaf & nc_pos)
             | (~leaf & has_unique & nc_pos)
             | (~leaf & ~has_unique))
    valid = valid & active[None, :]
    return valid, has_unique


def valid_mask(score, num_common, node_num_mut, is_root_mask, is_leaf, active):
    """Device-side validity / has_unique (same math as placement_outputs)."""
    has_unique = num_common < node_num_mut[None, :]
    nc_pos = num_common > 0
    leaf = is_leaf[None, :]
    valid = (is_root_mask[None, :]
             | (leaf & nc_pos)
             | (~leaf & has_unique & nc_pos)
             | (~leaf & ~has_unique))
    return valid & active[None, :], has_unique


@jax.jit
def placement_step(st, parent, root_slot, ref, active, is_leaf, is_root_mask,
                   num_leaves, bfs_rank, g, E, miss):
    """One fused device step: score all nodes x the batch, apply validity,
    reduce to the per-sample winner with the reference tie-break.

    Returns (best_score [B], best_slot [B], num_best [B]) -- a few hundred
    bytes across the host boundary instead of [B,N] matrices.
    """
    stp = st[parent]
    stp = stp.at[root_slot].set(st[root_slot])
    score, num_common, node_num_mut = score_with_stp(
        st, stp, ref, active, g, E, miss)
    valid, _ = valid_mask(score, num_common, node_num_mut, is_root_mask,
                          is_leaf, active)
    return reduce_best(score, valid, num_leaves, bfs_rank)


@functools.partial(jax.jit, static_argnames=())
def reduce_best(score, valid, num_leaves, bfs_rank):
    """Per-sample argmin with the reference tie-break: minimize
    (score, -num_leaves, -bfs_rank) over valid nodes; also count ties (EPPs).

    score [B,N] int32, valid [B,N] bool, num_leaves [N] int32, bfs_rank [N] int32.
    Returns best_score [B], best_slot [B], num_best [B].
    """
    big = jnp.int32(1 << 30)
    s = jnp.where(valid, score, big)
    best_score = jnp.min(s, axis=1)
    is_best = valid & (score == best_score[:, None])
    num_best = is_best.sum(axis=1, dtype=jnp.int32)
    # tie-break: max leaves then max bfs rank
    neg = jnp.int32(-1)
    leaves_masked = jnp.where(is_best, num_leaves[None, :], neg)
    best_leaves = jnp.max(leaves_masked, axis=1)
    is_best2 = is_best & (num_leaves[None, :] == best_leaves[:, None])
    rank_masked = jnp.where(is_best2, bfs_rank[None, :], neg)
    best_rank = jnp.max(rank_masked, axis=1)
    best_slot = jnp.argmax(
        (bfs_rank[None, :] == best_rank[:, None]) & is_best2, axis=1)
    return best_score, best_slot.astype(jnp.int32), num_best
