"""Pallas TPU kernel for batched placement scoring (sparse-sample path).

Mathematically identical to ops.placement.score_batch (the reference scoring
semantics of usher_mapper.cpp:167-504 — see ops/placement.py for the
derivation), but restructured around the workload's sparsity: a sample has
only a few dozen VCF entries out of the P segregating sites, and at every
no-entry position the per-(sample,node) term collapses to a sample-
independent value.

Decomposition (exact, by case analysis on g == ref at no-entry positions):

  score[b,n]      = base[n]    + sum_k corr(b, n, pos[b,k])
  num_common[b,n] = nc_base[n] + sum_k corr_nc(b, n, pos[b,k])

  base[n]    = sum_p [ (ref & st) != 0 ? st != ref
                       : (st != stp ? stp != ref : 1) ]
               (the no-entry g == ref case of the dense term1|term2,
               valid for ambiguous multi-bit states too)
  nc_base[n] = #{p : st != stp  and  (ref & st) != 0}

and the per-entry corrections only need st/stp at the K entry positions of
sample b.  The column gather st[:, pos[b,:]] is realized as a one-hot matmul
on the MXU — the canonical TPU gather — with st and stp packed into ONE
bf16 operand (st | stp<<4 <= 255 is exact in bf16), so a single
[TN,TP] x [TP, TB*K] dot per grid step serves TB samples x K entries for
both states.  The VPU then evaluates the correction terms on the gathered
[TN, TB*K] tile and a tiny block-diagonal matmul segment-sums each sample's
K slots.

Compute drops from O(B*N*P) VPU ops (dense path) to O(N*P) + O(B*N*K) MXU
MACs; on v5e the MXU:VPU throughput ratio makes this ~5-10x faster for
K ~ 32.

Outputs are produced node-major ([N, B]) so kernel tiles write without a
transpose; reduce_best_T reduces over the node axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile sizes. TBK = TB * K is the lane width of the gathered tile; K (entry
# slots per sample) is a power of two <= TBK so TB = TBK // K samples share
# one grid step.  TN is bounded by VMEM: the correction phase holds several
# [TN, TBK] int32 temporaries (TN=512 overflows the 16 MB scoped budget when
# the position axis is multi-slab).
TN = 256        # node rows per step
TP = 512        # position slab per step (contraction accumulated over slabs)
TBK = 1024      # gathered lane width

BIG = np.int32(1 << 30)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _corr_tiles(v, w, spr: bool):
    """Per-(node, slot) correction terms from the gathered packed states v
    [TN, TBK] and the per-slot meta words w [1, TBK] (the shared epilogue
    math of both kernel variants; see _kernel for the case analysis)."""
    st_k = v & 0xF
    stp_k = v >> 4
    gv = w & 0xF
    kvalid = (w >> 4) & 1
    kmiss = (w >> 5) & 1
    rk = (w >> 8) & 0xF

    bm = st_k != stp_k
    matched = (gv & st_k) != 0
    matched_r = (rk & st_k) != 0
    a = jnp.where(bm & ~matched, stp_k, st_k)
    term1 = jnp.where((kmiss == 0) & ((gv & a) == 0), 1, 0)
    # what this position contributed to base[n] (the g == ref value), to be
    # replaced by term1.  Two base semantics exist:
    #  - placement (spr=False): no-entry term (A_r != ref)
    #  - SPR (spr=True): E=1-everywhere term ((ref & A_r) == 0)
    #    (optimize/spr.py _score_moves; differs when A_r is a multi-bit
    #    ambiguity mask containing ref)
    if spr:
        a_r = jnp.where(bm & ~matched_r, stp_k, st_k)
        sub = jnp.where((rk & a_r) == 0, 1, 0)
    else:
        sub = jnp.where(bm & ~matched_r,
                        jnp.where(stp_k != rk, 1, 0),
                        jnp.where(st_k != rk, 1, 0))
    corr = kvalid * (term1 - sub)                # [TN, TBK]

    nca = jnp.where(bm & matched, 1, 0)
    ncb = jnp.where(bm & ((rk & st_k) != 0), 1, 0)
    corr_nc = kvalid * (nca - ncb)
    return corr, corr_nc


def _segsum(corr, corr_nc, K: int):
    """Per-sample segment sums of the K entry slots as block-diagonal
    matmuls.  bf16 operands when exact (|corr| <= 1, sums <= K <= 256: bf16
    integers are exact to 256) — the f32-HIGHEST dot here was ~2x of the
    whole kernel's runtime (multi-pass f32 emulation on the MXU)."""
    TBK = corr.shape[1]
    tb = TBK // K
    row = jax.lax.broadcasted_iota(jnp.int32, (TBK, tb), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (TBK, tb), 1)
    dt = jnp.bfloat16 if K <= 256 else jnp.float32
    seg = ((row // K) == col).astype(dt)
    cs = jnp.dot(corr.astype(dt), seg,
                 preferred_element_type=jnp.float32).astype(jnp.int32)
    ns = jnp.dot(corr_nc.astype(dt), seg,
                 preferred_element_type=jnp.float32).astype(jnp.int32)
    return cs, ns


def _kernel_reduce(meta_ref, base_ref, nodemeta_ref, packed_ref, o_ref,
                   best_ref, cnt_ref, p1_ref, p2_ref, acc_ref, *, K: int):
    """The fused-placement kernel variant: computes validity and a per-tile
    PARTIAL tie-break reduction in-register, so the [N, B] score/nc
    matrices never touch HBM.  Partials merge exactly across node tiles:
      best  min valid score          cnt  #rows at best
      p1    max leaves among best    p2   max (rank*2 | hu) among
                                          (best & leaves == p1)
    (p2's LSB carries the winner's has_unique bit; bfs_rank is unique per
    node so the packing never perturbs the rank order.)

    nodemeta_ref [TN, 8] int32: 0=num_leaves, 1=bfs_rank, 2=node_num_mut,
    3=flags (active | is_leaf<<1 | is_root<<2).
    """
    kp = pl.program_id(2)
    part = jnp.dot(packed_ref[:], o_ref[:], preferred_element_type=jnp.float32)

    @pl.when(kp == 0)
    def _():
        acc_ref[:] = part

    @pl.when(kp > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(kp == pl.num_programs(2) - 1)
    def _():
        v = acc_ref[:].astype(jnp.int32)
        corr, corr_nc = _corr_tiles(v, meta_ref[0], spr=False)
        cs, ns = _segsum(corr, corr_nc, K)
        score = base_ref[:, 0:1] + cs                # [TN, tb]
        nc = base_ref[:, 1:2] + ns
        nnm = nodemeta_ref[:, 2:3]
        flags = nodemeta_ref[:, 3:4]
        active = (flags & 1) == 1
        leaf = ((flags >> 1) & 1) == 1
        root = ((flags >> 2) & 1) == 1
        hu = nc < nnm
        nc_pos = nc > 0
        valid = (root | (leaf & nc_pos) | (~leaf & hu & nc_pos)
                 | (~leaf & ~hu)) & active
        s = jnp.where(valid, score, BIG)
        best = jnp.min(s, axis=0)
        is_best = valid & (score == best[None, :])
        cnt = jnp.sum(is_best.astype(jnp.int32), axis=0)
        neg = jnp.int32(-1)
        nl = nodemeta_ref[:, 0:1]
        p1 = jnp.max(jnp.where(is_best, nl, neg), axis=0)
        rank2 = nodemeta_ref[:, 1:2] * 2 + hu.astype(jnp.int32)
        p2 = jnp.max(jnp.where(is_best & (nl == p1[None, :]), rank2, neg),
                     axis=0)
        best_ref[0, 0, 0] = best
        cnt_ref[0, 0, 0] = cnt
        p1_ref[0, 0, 0] = p1
        p2_ref[0, 0, 0] = p2


def _kernel(meta_ref, base_ref, packed_ref, o_ref, score_ref, nc_ref,
            acc_ref, *, K: int, spr: bool = False):
    """Grid (Nt, Bt, Pt); Pt innermost accumulates the one-hot contraction.

    meta_ref   [1, 1, TBK] int32  per-slot word: gval | kvalid<<4 | kmiss<<5
                                  | refk<<8 (broadcast over node rows)
    base_ref   [TN, 2]  int32  col 0 = base, col 1 = nc_base
    packed_ref [TN, TP] bf16   st | stp << 4
    o_ref      [TP, TBK] bf16  one-hot position selectors
    score/nc   [1, TN, TB] int32  outputs (sample-tile major)
    acc_ref    [TN, TBK] f32   scratch: gathered packed states
    """
    kp = pl.program_id(2)
    part = jnp.dot(packed_ref[:], o_ref[:], preferred_element_type=jnp.float32)

    @pl.when(kp == 0)
    def _():
        acc_ref[:] = part

    @pl.when(kp > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(kp == pl.num_programs(2) - 1)
    def _():
        v = acc_ref[:].astype(jnp.int32)            # [TN, TBK]
        corr, corr_nc = _corr_tiles(v, meta_ref[0], spr)
        cs, ns = _segsum(corr, corr_nc, K)
        score_ref[0] = base_ref[:, 0:1] + cs
        nc_ref[0] = base_ref[:, 1:2] + ns


def _pad_to(x, n, axis, value=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _score_entries_T(st, stp, ref, base, nc_base, pos, gval, kmiss,
                     k_slots: int, spr: bool = False):
    """Kernel core over an arbitrary position axis (full genome columns or a
    batch-specific column subset): packs st|stp<<4, pads, and runs the grid.

    st/stp [N, Pc] uint8, ref [Pc] uint8, base/nc_base [N] int32 (the
    no-entry aggregate over the FULL position set), pos [B, K] int32 in the
    SAME coordinate space as the Pc axis (>= Pc marks padding slots).
    Returns (score_T [N, B], num_common_T [N, B]) int32.
    """
    K = k_slots
    assert TBK % K == 0
    tb = TBK // K
    N, P = st.shape
    B = pos.shape[0]

    sti = st.astype(jnp.int32)
    stpi = stp.astype(jnp.int32)
    refi = ref.astype(jnp.int32)[None, :]

    n_pad = -(-N // TN) * TN
    p_pad = -(-P // TP) * TP
    b_pad = -(-B // tb) * tb

    packed = (sti | (stpi << 4)).astype(jnp.bfloat16)
    packed = _pad_to(_pad_to(packed, n_pad, 0), p_pad, 1)
    base2 = jnp.stack([base, nc_base], axis=1)
    base2 = _pad_to(base2, n_pad, 0)

    posi = pos.astype(jnp.int32)
    kvalid = posi < P
    pos_eff = jnp.where(kvalid, posi, p_pad)
    refk = refi[0][jnp.clip(posi, 0, P - 1)] * kvalid
    meta = (gval.astype(jnp.int32)
            | (kvalid.astype(jnp.int32) << 4)
            | (kmiss.astype(jnp.int32) << 5)
            | (refk << 8))
    meta = _pad_to(meta, b_pad, 0)                     # [Bp, K]
    meta = meta.reshape(b_pad // tb, 1, TBK)           # [Bt, 1, TBK]
    pos_eff = _pad_to(pos_eff, b_pad, 0, value=p_pad)  # [Bp, K]
    onehot = (pos_eff.reshape(-1)[None, :]
              == jax.lax.broadcasted_iota(jnp.int32, (p_pad, 1), 0)
              ).astype(jnp.bfloat16)                   # [Pp, Bp*K]

    nt, bt, pt = n_pad // TN, b_pad // tb, p_pad // TP
    # Grid order (bt, nt, pt): the sample tile is OUTERMOST so the one-hot
    # operand block ([TP, TBK] bf16, the largest stream) stays resident in
    # VMEM across the whole node sweep; only the packed state tile
    # ([TN, TP], 8x smaller) re-streams per step.  The node-outermost order
    # re-fetched the one-hot per node tile -- ~4x more HBM traffic at the
    # bench shape.  pt stays innermost for the contraction accumulator.
    grid = (bt, nt, pt)
    score_t, nc_t = pl.pallas_call(
        functools.partial(_kernel, K=K, spr=spr),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, TBK), lambda j, i, k: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 2), lambda j, i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, TP), lambda j, i, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, TBK), lambda j, i, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TN, tb), lambda j, i, k: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN, tb), lambda j, i, k: (j, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bt, n_pad, tb), jnp.int32),
            jax.ShapeDtypeStruct((bt, n_pad, tb), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((TN, TBK), jnp.float32)],
        interpret=_interpret(),
    )(meta, base2, packed, onehot)
    score_t = score_t.transpose(1, 0, 2).reshape(n_pad, b_pad)
    nc_t = nc_t.transpose(1, 0, 2).reshape(n_pad, b_pad)
    return score_t[:N, :B], nc_t[:N, :B]


def _score_entries_3d(st, stp, ref, base, nc_base, pos, gval, kmiss,
                      k_slots: int, spr: bool = False):
    """_score_entries_T without the output relayout: returns the kernel's
    native [bt, n_pad, tb] tiles (plus (N, B, n_pad, b_pad)) so a fused
    reduction can consume them directly — the [N, B] transpose costs a full
    HBM round-trip of both matrices at large shapes."""
    K = k_slots
    assert TBK % K == 0
    tb = TBK // K
    N, P = st.shape
    B = pos.shape[0]

    sti = st.astype(jnp.int32)
    stpi = stp.astype(jnp.int32)
    refi = ref.astype(jnp.int32)[None, :]

    n_pad = -(-N // TN) * TN
    p_pad = -(-P // TP) * TP
    b_pad = -(-B // tb) * tb

    packed = (sti | (stpi << 4)).astype(jnp.bfloat16)
    packed = _pad_to(_pad_to(packed, n_pad, 0), p_pad, 1)
    base2 = jnp.stack([base, nc_base], axis=1)
    base2 = _pad_to(base2, n_pad, 0)

    posi = pos.astype(jnp.int32)
    kvalid = posi < P
    pos_eff = jnp.where(kvalid, posi, p_pad)
    refk = refi[0][jnp.clip(posi, 0, P - 1)] * kvalid
    meta = (gval.astype(jnp.int32)
            | (kvalid.astype(jnp.int32) << 4)
            | (kmiss.astype(jnp.int32) << 5)
            | (refk << 8))
    meta = _pad_to(meta, b_pad, 0)
    meta = meta.reshape(b_pad // tb, 1, TBK)
    pos_eff = _pad_to(pos_eff, b_pad, 0, value=p_pad)
    onehot = (pos_eff.reshape(-1)[None, :]
              == jax.lax.broadcasted_iota(jnp.int32, (p_pad, 1), 0)
              ).astype(jnp.bfloat16)

    nt, bt, pt = n_pad // TN, b_pad // tb, p_pad // TP
    grid = (bt, nt, pt)
    score3, nc3 = pl.pallas_call(
        functools.partial(_kernel, K=K, spr=spr),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, TBK), lambda j, i, k: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 2), lambda j, i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, TP), lambda j, i, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, TBK), lambda j, i, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TN, tb), lambda j, i, k: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN, tb), lambda j, i, k: (j, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bt, n_pad, tb), jnp.int32),
            jax.ShapeDtypeStruct((bt, n_pad, tb), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((TN, TBK), jnp.float32)],
        interpret=_interpret(),
    )(meta, base2, packed, onehot)
    return score3, nc3, N, B, n_pad, b_pad


@functools.partial(jax.jit, static_argnames=("k_slots",))
def score_sparse_T(st, parent, root_slot, ref, pos, gval, kmiss, k_slots: int):
    """Node-major sparse scoring.

    st     [N, P] uint8   path-state nibbles
    parent [N]    int32
    ref    [P]    uint8
    pos    [B, K] int32   entry positions (>= P means padding slot)
    gval   [B, K] uint8   sample allele mask per entry (0xF at missing)
    kmiss  [B, K] bool    entry is missing (N)
    k_slots = K, a power of two dividing TBK.

    Returns (score_T [N, B] int32, num_common_T [N, B] int32,
             node_num_mut [N] int32) — exactly score_batch's outputs,
    transposed, without the inactive-slot masking (callers mask).
    """
    stp = st[parent]
    stp = stp.at[root_slot].set(st[root_slot])
    return score_sparse_stp_T(st, stp, ref, pos, gval, kmiss, k_slots)


@functools.partial(jax.jit, static_argnames=("k_slots",))
def score_sparse_stp_T(st, stp, ref, pos, gval, kmiss, k_slots: int):
    """score_sparse_T with the parent states supplied directly — the form
    the sharded mesh path uses (stp is precomputed per tree refresh so a
    node shard is self-contained; parallel/mesh.py)."""
    sti = st.astype(jnp.int32)
    stpi = stp.astype(jnp.int32)
    refi = ref.astype(jnp.int32)[None, :]
    matched0 = (refi & sti) != 0
    bm0 = sti != stpi
    # no-entry term with g == ref: A = (bm & ~matched) ? stp : st, term = A != ref.
    # (At lane-padding positions ref == st == 0 this is exactly 0, unlike the
    # shortcut "(ref & st) == 0 implies st != ref" which assumes ref != 0.)
    base = jnp.where(bm0 & ~matched0, stpi != refi,
                     sti != refi).sum(1, dtype=jnp.int32)
    nc_base = ((sti != stpi) & ((refi & sti) != 0)).sum(1, dtype=jnp.int32)
    node_num_mut = (sti != stpi).sum(1, dtype=jnp.int32)

    score_t, nc_t = _score_entries_T(st, stp, ref, base, nc_base,
                                     pos, gval, kmiss, k_slots)
    return score_t, nc_t, node_num_mut


@functools.partial(jax.jit, static_argnames=("k_slots", "n_anc", "spr"))
def score_cols_T(m0, anc, parent, root_slot, ref_cols, base, nc_base,
                 pos, gval, kmiss, k_slots: int, n_anc: int,
                 spr: bool = False):
    """Column-subset scoring for CSR-backed MATs (core/bigmat.py): path
    states at the batch's C entry columns are materialized on device by
    pointer-doubling over ancestor tables, then scored by the same kernel.

    m0       [N, C] uint8  node's OWN branch-mutation allele at column c
                           (0 = none; alleles are nonzero nibbles)
    anc      [n_anc, N] i32  anc[k] = 2^k-th ancestor (root points to itself)
    ref_cols [C] uint8     reference allele per column
    base, nc_base [N] i32  full-genome no-entry aggregates (host precomputed)
    pos      [B, K] i32    entry COLUMN indices (>= C marks padding)
    Returns (score_T [N, B], num_common_T [N, B]) int32.
    """
    val = m0
    for k in range(n_anc):
        val = jnp.where(val > 0, val, val[anc[k]])
    st_cols = jnp.where(val > 0, val, ref_cols[None, :])
    stp_cols = st_cols[parent]
    stp_cols = stp_cols.at[root_slot].set(st_cols[root_slot])
    return _score_entries_T(st_cols, stp_cols, ref_cols, base, nc_base,
                            pos, gval, kmiss, k_slots, spr=spr)


def valid_mask_T(score_t, nc_t, node_num_mut, is_root_mask, is_leaf, active):
    """Node-major validity (ops.placement.valid_mask transposed)."""
    has_unique = nc_t < node_num_mut[:, None]
    nc_pos = nc_t > 0
    leaf = is_leaf[:, None]
    valid = (is_root_mask[:, None]
             | (leaf & nc_pos)
             | (~leaf & has_unique & nc_pos)
             | (~leaf & ~has_unique))
    return valid & active[:, None], has_unique


def reduce_best_T(score_t, valid_t, num_leaves, bfs_rank):
    """Per-sample argmin over the node axis with the reference tie-break
    (ops.placement.reduce_best on [N, B] inputs)."""
    s = jnp.where(valid_t, score_t, BIG)
    best_score = jnp.min(s, axis=0)
    is_best = valid_t & (score_t == best_score[None, :])
    num_best = is_best.sum(axis=0, dtype=jnp.int32)
    neg = jnp.int32(-1)
    leaves_masked = jnp.where(is_best, num_leaves[:, None], neg)
    best_leaves = jnp.max(leaves_masked, axis=0)
    is_best2 = is_best & (num_leaves[:, None] == best_leaves[None, :])
    rank_masked = jnp.where(is_best2, bfs_rank[:, None], neg)
    best_rank = jnp.max(rank_masked, axis=0)
    best_slot = jnp.argmax(
        (bfs_rank[:, None] == best_rank[None, :]) & is_best2, axis=0)
    return best_score, best_slot.astype(jnp.int32), num_best


@functools.partial(jax.jit, static_argnames=("k_slots",))
def placement_step_sparse(st, parent, root_slot, ref, active, is_leaf,
                          is_root_mask, num_leaves, bfs_rank,
                          pos, gval, kmiss, k_slots: int):
    """Fused sparse equivalent of ops.placement.placement_step: MXU-gathered
    scoring + validity + tie-broken argmin.  Returns
    (best_score [B], best_slot [B], num_best [B]).

    Validity and a PARTIAL tie-break reduction run inside the kernel
    (_kernel_reduce), so the [N, B] score/nc matrices never touch HBM;
    only tiny [bt, nt, tb] partials come out, merged here exactly.
    """
    stp = st[parent]
    stp = stp.at[root_slot].set(st[root_slot])
    sti = st.astype(jnp.int32)
    stpi = stp.astype(jnp.int32)
    refi = ref.astype(jnp.int32)[None, :]
    matched0 = (refi & sti) != 0
    bm0 = sti != stpi
    base = jnp.where(bm0 & ~matched0, stpi != refi,
                     sti != refi).sum(1, dtype=jnp.int32)
    nc_base = ((sti != stpi) & ((refi & sti) != 0)).sum(1, dtype=jnp.int32)
    nnm = (sti != stpi).sum(1, dtype=jnp.int32)

    K = k_slots
    assert TBK % K == 0
    tb = TBK // K
    N, P = st.shape
    B = pos.shape[0]
    n_pad = -(-N // TN) * TN
    p_pad = -(-P // TP) * TP
    b_pad = -(-B // tb) * tb

    packed = (sti | (stpi << 4)).astype(jnp.bfloat16)
    packed = _pad_to(_pad_to(packed, n_pad, 0), p_pad, 1)
    base2 = _pad_to(jnp.stack([base, nc_base], axis=1), n_pad, 0)
    flags = (active.astype(jnp.int32)
             | (is_leaf.astype(jnp.int32) << 1)
             | (is_root_mask.astype(jnp.int32) << 2))
    nodemeta = jnp.stack(
        [num_leaves.astype(jnp.int32), bfs_rank.astype(jnp.int32),
         nnm, flags] + [jnp.zeros(N, jnp.int32)] * 4, axis=1)
    nodemeta = _pad_to(nodemeta, n_pad, 0)  # padded rows: active == 0

    posi = pos.astype(jnp.int32)
    kvalid = posi < P
    pos_eff = jnp.where(kvalid, posi, p_pad)
    refk = refi[0][jnp.clip(posi, 0, P - 1)] * kvalid
    meta = (gval.astype(jnp.int32)
            | (kvalid.astype(jnp.int32) << 4)
            | (kmiss.astype(jnp.int32) << 5)
            | (refk << 8))
    meta = _pad_to(meta, b_pad, 0).reshape(b_pad // tb, 1, TBK)
    pos_eff = _pad_to(pos_eff, b_pad, 0, value=p_pad)
    onehot = (pos_eff.reshape(-1)[None, :]
              == jax.lax.broadcasted_iota(jnp.int32, (p_pad, 1), 0)
              ).astype(jnp.bfloat16)

    nt, bt, pt = n_pad // TN, b_pad // tb, p_pad // TP
    # partials are [bt, nt, 1, tb] so the (1, tb) trailing block dims are
    # full-array (TPU block-shape divisibility rule)
    part_spec = pl.BlockSpec((1, 1, 1, tb), lambda j, i, k: (j, i, 0, 0),
                             memory_space=pltpu.VMEM)
    part_shape = jax.ShapeDtypeStruct((bt, nt, 1, tb), jnp.int32)
    pbest, pcnt, p1, p2 = pl.pallas_call(
        functools.partial(_kernel_reduce, K=K),
        grid=(bt, nt, pt),
        in_specs=[
            pl.BlockSpec((1, 1, TBK), lambda j, i, k: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 2), lambda j, i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 8), lambda j, i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, TP), lambda j, i, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, TBK), lambda j, i, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[part_spec] * 4,
        out_shape=[part_shape] * 4,
        scratch_shapes=[pltpu.VMEM((TN, TBK), jnp.float32)],
        interpret=_interpret(),
    )(meta, base2, nodemeta, packed, onehot)
    pbest, pcnt, p1, p2 = (x[:, :, 0, :] for x in (pbest, pcnt, p1, p2))

    # exact cross-tile merge of the partials
    gbest = jnp.min(pbest, axis=1)                   # [bt, tb]
    m = pbest == gbest[:, None, :]
    num_best = jnp.sum(jnp.where(m, pcnt, 0), axis=1)
    neg = jnp.int32(-1)
    g1 = jnp.max(jnp.where(m, p1, neg), axis=1)
    g2 = jnp.max(jnp.where(m & (p1 == g1[:, None, :]), p2, neg), axis=1)
    rank = jnp.maximum(g2 >> 1, 0)
    # winner row via the inverse rank permutation (bfs_rank is unique)
    row_of_rank = jnp.zeros(N, jnp.int32).at[bfs_rank].set(
        jnp.arange(N, dtype=jnp.int32))
    best_row = row_of_rank[jnp.minimum(rank.reshape(-1), N - 1)]
    return (gbest.reshape(-1)[:B], best_row[:B],
            num_best.reshape(-1)[:B])


def sparsify(samples_mutations, pos_index, P, k_slots=None):
    """Host-side: mutation lists -> (pos [B,K] i32, gval [B,K] u8,
    kmiss [B,K] bool) padded to a power-of-two K dividing TBK.  Attribute
    extraction is one flat pass; slot assignment is vectorized."""
    from ..core.nuc import N as NUC_N
    B = len(samples_mutations)
    lens = np.fromiter((len(m) for m in samples_mutations),
                       dtype=np.int64, count=B)
    kmax = int(lens.max()) if B else 1
    K = k_slots or 8
    while K < kmax:
        K *= 2
    if K > TBK:
        raise ValueError(f"sample has {kmax} entries > TBK={TBK}")
    pos = np.full((B, K), P, dtype=np.int32)
    gval = np.zeros((B, K), dtype=np.uint8)
    kmiss = np.zeros((B, K), dtype=bool)
    total = int(lens.sum())
    if total:
        flat = [m for muts in samples_mutations for m in muts]
        try:
            fpos = np.fromiter((pos_index[m.position] for m in flat),
                               dtype=np.int32, count=total)
        except KeyError:
            bad = next(m.position for m in flat
                       if m.position not in pos_index)
            raise KeyError(f"sample position {bad} not in MAT")
        fmiss = np.fromiter((m.is_missing for m in flat),
                            dtype=bool, count=total)
        fval = np.fromiter((m.mut_nuc for m in flat),
                           dtype=np.uint8, count=total)
        b_idx = np.repeat(np.arange(B), lens)
        starts = np.cumsum(lens) - lens
        k_idx = np.arange(total) - np.repeat(starts, lens)
        pos[b_idx, k_idx] = fpos
        gval[b_idx, k_idx] = np.where(fmiss, NUC_N, fval)
        kmiss[b_idx, k_idx] = fmiss
    return pos, gval, kmiss


def sparsify_dense(g, E, miss, k_slots=None):
    """Host-side: dense (g, E, miss) sample encoding -> sparse slot arrays
    (fully vectorized).  Requires g == ref at ~E positions
    (encode_samples guarantees this)."""
    g = np.asarray(g)
    E = np.asarray(E)
    miss = np.asarray(miss)
    B, P = g.shape
    counts = E.sum(1)
    kmax = int(counts.max()) if B else 1
    K = k_slots or 8
    while K < max(kmax, 1):
        K *= 2
    if K > TBK:
        raise ValueError(f"sample has {kmax} entries > TBK={TBK}")
    pos = np.full((B, K), P, dtype=np.int32)
    gval = np.zeros((B, K), dtype=np.uint8)
    kmiss = np.zeros((B, K), dtype=bool)
    b_idx, p_idx = np.nonzero(E)          # row-major: sorted by (b, p)
    if len(b_idx):
        starts = np.cumsum(counts) - counts
        k_idx = np.arange(len(b_idx)) - starts[b_idx]
        pos[b_idx, k_idx] = p_idx
        gval[b_idx, k_idx] = g[b_idx, p_idx]
        kmiss[b_idx, k_idx] = miss[b_idx, p_idx]
    return pos, gval, kmiss
