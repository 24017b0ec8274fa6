"""DFS-interval scoring: the pandemic-scale placement/SPR scoring engine.

Replaces per-batch [N, C] path-state materialization (round 2's
pointer-doubling column path) with an observation about the scoring math:
at an entry column c, the per-(sample, node) correction term is a pure
function of (st, stp) at (n, c), and st is PIECEWISE CONSTANT over the
nested DFS intervals cut by the branch mutations in column c (the nearest
ancestor carrying a mutation at c determines st; stp differs from st only
AT the mutation-carrying nodes themselves).  So for a batch:

  score_T[n, b] = base[n] + add0[b] + cumsum_over_dfs(diff)[dfs(n), b]
  nc_T[n, b]    = nc_base[n] + point_scatter[dfs(n), b]

where `diff` receives, for every (sample entry, column mutation) pair,
 - a range delta over the mutation node's DFS interval
   (corr_nobm(mut_allele) - corr_nobm(par_allele)), and
 - a width-1 delta at the mutation node itself
   (corr_bm(mut, par) - corr_nobm(mut)),
and add0[b] accumulates the corr at reference-state nodes.  Per-batch
device cost is one scatter of O(sum over entries of column occupancy)
updates plus one [N, B] segmented cumsum — independent of how many unique
columns the batch touches, with NO dense per-column tensors anywhere.

Exactly the math of ops/placement_pallas._kernel (case analysis in
core/bigmat.py builds the deltas); semantics of the reference scorer
usher_mapper.cpp:167-504 / the SPR re-placement formulation of
optimize/spr.py.  The cumsum telescopes the same per-position recurrence
the reference maintains incrementally while walking the tree.

Reduction (validity + tie-broken argmin + radius masks for SPR) runs on
device so only O(B) vectors cross the PCIe/tunnel boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BIG = np.int32(1 << 30)


def _scan_rows(d):
    """Inclusive cumsum along axis 0 of an int32 [R, B] array.

    Two-level block scan: within-block prefix sums via a lower-triangular
    f32 matmul (exact for |values| < 2^24 — scoring deltas are O(entries),
    orders of magnitude below), block totals scanned associatively.  One
    HBM read+write of the array instead of log2(R) shifted-add passes.
    """
    R, B = d.shape
    BLK = 256
    Rp = -(-R // BLK) * BLK
    if Rp != R:
        d = jnp.pad(d, ((0, Rp - R), (0, 0)))
    db = d.reshape(Rp // BLK, BLK, B).astype(jnp.float32)
    tri = jnp.tril(jnp.ones((BLK, BLK), jnp.float32))
    within = jnp.einsum("ij,njb->nib", tri, db,
                        precision=jax.lax.Precision.HIGHEST)
    totals = db.sum(axis=1)                         # [nb, B]
    prefix = jnp.cumsum(totals, axis=0) - totals    # exclusive
    out = (within + prefix[:, None, :]).astype(jnp.int32)
    return out.reshape(Rp, B)[:R]


@functools.partial(jax.jit, static_argnames=("n_pad", "b_pad"))
def interval_scores(ev_idx, ev_b, ev_val, nc_idx, nc_b, nc_val,
                    base_dfs, nc_base_dfs, add0,
                    n_pad: int, b_pad: int):
    """Score + num_common matrices in DFS order.

    ev_idx/ev_b/ev_val [R] int32  difference-array events (idx in 0..n_pad;
                                  idx == n_pad marks padding)
    nc_*               [Rn] int32 num_common point events (idx in 0..n_pad)
    base_dfs, nc_base_dfs [n_pad] int32, add0 [b_pad] int32
    Returns (score_dfs [n_pad, b_pad], nc_dfs [n_pad, b_pad]) int32.
    """
    diff = jnp.zeros((n_pad + 1, b_pad), jnp.int32)
    diff = diff.at[ev_idx, ev_b.astype(jnp.int32)].add(
        ev_val.astype(jnp.int32))
    run = _scan_rows(diff[:n_pad])
    score = base_dfs[:, None] + add0[None, :] + run
    ncd = jnp.zeros((n_pad + 1, b_pad), jnp.int32)
    ncd = ncd.at[nc_idx, nc_b.astype(jnp.int32)].add(
        nc_val.astype(jnp.int32))
    nc = nc_base_dfs[:, None] + ncd[:n_pad]
    return score, nc


def _tie_reduce(score, valid, num_leaves, bfs_rank):
    """Tie-broken argmin over the node axis (axis 0) of [N, B] inputs:
    min score, then max subtree leaves, then max BFS rank — the reference
    sequential-order winner (usher_mapper.cpp:458-497)."""
    s = jnp.where(valid, score, BIG)
    best = jnp.min(s, axis=0)
    is_best = valid & (score == best[None, :])
    num_best = is_best.sum(axis=0, dtype=jnp.int32)
    neg = jnp.int32(-1)
    lm = jnp.where(is_best, num_leaves[:, None], neg)
    best_leaves = jnp.max(lm, axis=0)
    is_best2 = is_best & (num_leaves[:, None] == best_leaves[None, :])
    rm = jnp.where(is_best2, bfs_rank[:, None], neg)
    best_rank = jnp.max(rm, axis=0)
    best_row = jnp.argmax((bfs_rank[:, None] == best_rank[None, :])
                          & is_best2, axis=0)
    return best, best_row.astype(jnp.int32), num_best


@functools.partial(jax.jit, static_argnames=("n_pad", "b_pad"))
def interval_place(ev_idx, ev_b, ev_val, nc_idx, nc_b, nc_val,
                   base_dfs, nc_base_dfs, add0,
                   num_mut_dfs, is_leaf_dfs, is_root_dfs, active_dfs,
                   num_leaves_dfs, bfs_rank_dfs,
                   n_pad: int, b_pad: int):
    """Fused: interval scoring + placement validity + tie-broken argmin.
    Returns (best_score [B], best_dfs_row [B], num_best [B], hu_best [B])
    — only O(B) crosses the device boundary."""
    score, nc = interval_scores(ev_idx, ev_b, ev_val, nc_idx, nc_b, nc_val,
                                base_dfs, nc_base_dfs, add0, n_pad, b_pad)
    hu = nc < num_mut_dfs[:, None]
    nc_pos = nc > 0
    leaf = is_leaf_dfs[:, None]
    valid = (is_root_dfs[:, None]
             | (leaf & nc_pos)
             | (~leaf & hu & nc_pos)
             | (~leaf & ~hu)) & active_dfs[:, None]
    best, best_row, num_best = _tie_reduce(score, valid, num_leaves_dfs,
                                           bfs_rank_dfs)
    hu_best = jnp.take_along_axis(hu, best_row[None, :], axis=0)[0]
    return best, best_row, num_best, hu_best


@functools.partial(jax.jit, static_argnames=("n_pad", "b_pad"))
def interval_spr(ev_idx, ev_b, ev_val, nc_idx, nc_b, nc_val,
                 cnt_idx, cnt_b, cnt_val,
                 base_dfs, nc_base_dfs, add0,
                 num_mut_dfs, is_root_dfs, active_dfs,
                 num_leaves_dfs, bfs_rank_dfs, level_dfs,
                 src_level, src_lo, src_hi, src_parent_row, radius,
                 n_pad: int, b_pad: int):
    """Fused SPR destination search for a batch of pruned sources.

    On top of interval_place's machinery, the radius bound is ALSO a
    nested-interval computation: the LCA level of (src, dst) for every dst
    equals (#proper-ancestors-of-src whose DFS interval contains dst) - 1,
    so cnt_* scatters +1 over each ancestor interval and shares the same
    difference-array cumsum (replacing the reference's per-node pointer
    walks, Profitable_Moves_Enumerators.hpp:166, and round 2's host
    O(depth*N) loop).  src_lo/src_hi/src_parent_row are DFS rows.
    Returns (best_cost [B], best_dfs_row [B], hu_best [B]).
    """
    # stack the score and ancestor-count channels into one scan
    diff = jnp.zeros((n_pad + 1, 2 * b_pad), jnp.int32)
    diff = diff.at[ev_idx, ev_b.astype(jnp.int32)].add(
        ev_val.astype(jnp.int32))
    diff = diff.at[cnt_idx, b_pad + cnt_b.astype(jnp.int32)].add(
        cnt_val.astype(jnp.int32))
    run = _scan_rows(diff[:n_pad])
    score = base_dfs[:, None] + add0[None, :] + run[:, :b_pad]
    cnt = run[:, b_pad:]

    ncd = jnp.zeros((n_pad + 1, b_pad), jnp.int32)
    ncd = ncd.at[nc_idx, nc_b.astype(jnp.int32)].add(
        nc_val.astype(jnp.int32))
    nc = nc_base_dfs[:, None] + ncd[:n_pad]

    hu = nc < num_mut_dfs[:, None]
    nc_pos = nc > 0
    # dest leaves get sibling-split via has_unique (optimize/spr.py:70-75)
    valid = (is_root_dfs[:, None] | (hu & nc_pos) | (~hu)) \
        & active_dfs[:, None]

    lca_lvl = cnt - 1
    dist = level_dfs[:, None] + src_level[None, :] - 2 * lca_lvl
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)
    in_sub = (rows >= src_lo[None, :]) & (rows < src_hi[None, :])
    ok = (dist <= radius) & ~in_sub & (rows != src_parent_row[None, :])
    valid = valid & ok

    best, best_row, _ = _tie_reduce(score, valid, num_leaves_dfs,
                                    bfs_rank_dfs)
    hu_best = jnp.take_along_axis(hu, best_row[None, :], axis=0)[0]
    return best, best_row, hu_best


def pad_events(idx, b, val, n_pad, bucket: int = 4096):
    """Bucket event arrays (x1.5 growth) so batch-to-batch event-count
    drift doesn't retrigger compilation; padding events target the dead row
    n_pad with value 0.  Sample ids ship as int16 and values as int8
    (|delta| <= 4) — H2D volume is the scarce resource on a tunneled link;
    the kernels upcast on device."""
    r = len(idx)
    cap = bucket
    while cap < r:
        cap = cap * 3 // 2
    pi = np.full(cap, n_pad, np.int32)
    pb = np.zeros(cap, np.int16)
    pv = np.zeros(cap, np.int8)
    pi[:r] = idx
    pb[:r] = b
    pv[:r] = val
    return pi, pb, pv
