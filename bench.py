"""Benchmark: batched maximum-parsimony placement scoring throughput.

Workload: BASELINE.json config #3 scale -- a synthetic 100k-node MAT over
512 segregating sites, a batch of 1024 samples, every sample scored against
EVERY tree node (the reference's hot loop #1, usher_mapper.cpp:167-504) plus
the validity + argmin/tie-break reduction, all as ONE fused device step.
Both production kernels are measured and cross-checked for equality: the
dense XLA path (ops/placement.placement_step) and the sparse Pallas MXU
kernel (ops/placement_pallas.placement_step_sparse); the headline number is
the faster (sparse) path, which is what PlacementEngine uses on TPU.

Metric: samples placed/sec (scoring + best-placement reduction; host tree
surgery is amortized bookkeeping in both systems).

vs_baseline: the reference binary cannot be built in this image (no MPI /
boost), so the baseline is the same scoring math executed by single-core
vectorized numpy, scaled x64 (a stand-in for 64-thread CPU UShER; numpy's
fused elementwise loops are comparable to the reference's memory-bound C++
scan, and the reference's early-exit pruning is offset by numpy's SIMD).
BASELINE.json target: >= 10x vs 64-thread CPU.

Prints ONE json line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Persistent compile cache: the tunneled remote-compile service can be slow
# (observed minutes-per-program on a degraded day vs 5s nominal); caching
# compiled executables in-repo makes reruns immune.  Must go through
# jax.config (sitecustomize imports jax before env vars are read).
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
try:
    import jax as _jax
    _jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception as e:  # cache is an optimization, never a requirement
    print(f"[bench] compile cache unavailable: {e}", file=sys.stderr)

N_NODES = 100_000
P_SITES = 512
BATCH = 1024
MUTS_PER_SAMPLE = 16
NIBBLES = np.array([1, 2, 4, 8], dtype=np.uint8)


_T0 = time.time()


def _progress(msg, t0=_T0):
    print(f"[bench +{time.time()-t0:.1f}s] {msg}", file=sys.stderr, flush=True)


def synth_flat_mat(rng):
    """Random MAT as flat arrays: parent pointers (topologically ordered),
    path states derived root->leaf with ~3 branch mutations per node."""
    ref = NIBBLES[rng.integers(0, 4, size=P_SITES)]
    parent = np.zeros(N_NODES, dtype=np.int32)
    parent[1:] = (rng.random(N_NODES - 1)
                  * np.arange(N_NODES - 1)).astype(np.int32)
    st = np.zeros((N_NODES, P_SITES), dtype=np.uint8)
    st[0] = ref
    # vectorized root->leaf accumulation: nodes are topologically ordered, so
    # process in chunks whose parents all precede the chunk
    n_mut = 3
    mut_pos = rng.integers(0, P_SITES, size=(N_NODES, n_mut))
    mut_allele = NIBBLES[rng.integers(0, 4, size=(N_NODES, n_mut))]
    for i in range(1, N_NODES):
        row = st[parent[i]].copy()
        row[mut_pos[i]] = mut_allele[i]
        st[i] = row

    is_leaf = np.ones(N_NODES, dtype=bool)
    is_leaf[parent[1:]] = False
    is_leaf[0] = False
    num_leaves = np.zeros(N_NODES, dtype=np.int32)
    num_leaves[is_leaf] = 1
    for i in range(N_NODES - 1, 0, -1):
        num_leaves[parent[i]] += num_leaves[i]
    active = np.ones(N_NODES, dtype=bool)
    is_root = np.zeros(N_NODES, dtype=bool)
    is_root[0] = True
    bfs_rank = np.arange(N_NODES, dtype=np.int32)  # topo order ~ BFS for ties
    return st, parent, ref, active, is_leaf, is_root, num_leaves, bfs_rank


def synth_samples(rng, ref):
    g = np.tile(ref, (BATCH, 1))
    E = np.zeros((BATCH, P_SITES), dtype=bool)
    miss = np.zeros((BATCH, P_SITES), dtype=bool)
    for b in range(BATCH):
        idx = rng.choice(P_SITES, size=MUTS_PER_SAMPLE, replace=False)
        g[b, idx] = NIBBLES[rng.integers(0, 4, size=MUTS_PER_SAMPLE)]
        E[b, idx] = True
    return g, E, miss


def numpy_score_batch(st, stp, ref, g, E, miss):
    """Single-core numpy version of the same scoring (the CPU baseline)."""
    bm = st != stp
    B = g.shape[0]
    scores = np.empty((B, st.shape[0]), dtype=np.int32)
    for b in range(B):
        matched = (g[b][None, :] & st) != 0
        excl = bm & ~matched
        A = np.where(excl, stp, st)
        term1 = E[b][None, :] & (~miss[b][None, :]) & ((g[b][None, :] & A) == 0)
        term2 = (~E[b][None, :]) & (A != ref[None, :])
        scores[b] = (term1 | term2).sum(axis=-1)
    return scores


def main():
    import jax
    import jax.numpy as jnp
    from usher_tpu.ops import placement as dev

    rng = np.random.default_rng(42)
    st, parent, ref, active, is_leaf, is_root, num_leaves, bfs_rank = \
        synth_flat_mat(rng)
    g, E, miss = synth_samples(rng, ref)
    _progress(f"synthetic MAT built ({N_NODES} nodes, {P_SITES} sites, "
              f"B={BATCH})")

    # baseline FIRST (pure CPU): single-core numpy on a subsample,
    # extrapolated to 64 threads -- so the headline can print the moment the
    # production kernel is timed, before any other TPU compile
    Bs = 4
    stp_host = st[parent]
    stp_host[0] = st[0]
    t0 = time.time()
    numpy_score_batch(st, stp_host, ref, g[:Bs], E[:Bs], miss[:Bs])
    cpu_dt = time.time() - t0
    cpu_rate_64t = (Bs / cpu_dt) * 64
    _progress(f"numpy 1-core: {cpu_dt/Bs*1e3:.1f} ms/sample "
              f"-> x64 = {cpu_rate_64t:.0f} samples/s")

    # production kernel first: sparse Pallas path (MXU one-hot gather over
    # the samples' entry positions; ops/placement_pallas.py).  The remote
    # compile service is bimodal (5s..20min per program), so the headline
    # must depend on exactly ONE device compile.
    # NOTE: force a host transfer to fence each step -- on the axon platform
    # block_until_ready returns before execution completes.
    from usher_tpu.ops import placement_pallas as pp
    pos, gval, kmiss = pp.sparsify_dense(g, E, miss)
    sargs = (jnp.asarray(st), jnp.asarray(parent), jnp.int32(0),
             jnp.asarray(ref), jnp.asarray(active), jnp.asarray(is_leaf),
             jnp.asarray(is_root), jnp.asarray(num_leaves),
             jnp.asarray(bfs_rank), jnp.asarray(pos), jnp.asarray(gval),
             jnp.asarray(kmiss))
    t0 = time.time()
    sbest = [np.asarray(x)
             for x in pp.placement_step_sparse(*sargs, pos.shape[1])]
    sparse_compile_s = time.time() - t0
    _progress(f"placement_step_sparse compiled ({sparse_compile_s:.0f}s)")

    iters = 5
    t0 = time.time()
    for _ in range(iters):
        sbest = [np.asarray(x)
                 for x in pp.placement_step_sparse(*sargs, pos.shape[1])]
    sdt = (time.time() - t0) / iters
    sparse_rate = BATCH / sdt
    _progress(f"sparse: {sdt*1e3:.1f} ms/batch -> {sparse_rate:.0f} samples/s")

    # headline metric immediately — everything below is supplementary and
    # must not cost the metric if the run is time-capped
    print(json.dumps({
        "metric": "samples_placed_per_sec",
        "value": round(sparse_rate, 2),
        "unit": "samples/s (B=%d, %d-node MAT, %d sites, 1 chip)" % (
            BATCH, N_NODES, P_SITES),
        "vs_baseline": round(sparse_rate / cpu_rate_64t, 3),
    }), flush=True)

    # supplementary: dense XLA path for the cross-check + speed ratio.
    # Same degraded-tunnel guard as bigmat: a timeout-kill mid-compile can
    # take the pipe holding the already-printed headline with it.
    degraded = (sparse_compile_s >= 150
                and jax.default_backend() == "tpu"
                and not os.environ.get("USHER_BENCH_FULL"))
    if degraded:
        _progress(f"skipping dense cross-check phase (sparse compile took "
                  f"{sparse_compile_s:.0f}s — degraded tunnel; equality is "
                  f"enforced in tests/test_placement_pallas.py)")
    else:
        args = (jnp.asarray(st), jnp.asarray(parent), jnp.int32(0),
                jnp.asarray(ref), jnp.asarray(active), jnp.asarray(is_leaf),
                jnp.asarray(is_root), jnp.asarray(num_leaves),
                jnp.asarray(bfs_rank), jnp.asarray(g), jnp.asarray(E),
                jnp.asarray(miss))
        best = [np.asarray(x) for x in dev.placement_step(*args)]
        _progress("placement_step (dense) compiled")
        for a, b in zip(best, sbest):
            np.testing.assert_array_equal(a, b)
        _progress("sparse == dense on the bench workload")
        t0 = time.time()
        for _ in range(iters):
            best = [np.asarray(x) for x in dev.placement_step(*args)]
        dt = (time.time() - t0) / iters
        dense_rate = BATCH / dt
        _progress(f"dense: {dt*1e3:.1f} ms/batch -> {dense_rate:.0f} "
                  f"samples/s (sparse is {dt/sdt:.2f}x)")

    if jax.default_backend() == "tpu":
        # supplementary phase; the remote compile service is bimodal
        # (5s..20min per program) — when THIS run's sparse compile was slow,
        # the bigmat compiles will be too, and a timeout-kill mid-phase can
        # take the whole process group (including the pipe holding the
        # already-printed headline).  Skip unless the tunnel is fast.
        elapsed = time.time() - _T0
        if (sparse_compile_s < 150 and elapsed < 900) \
                or os.environ.get("USHER_BENCH_FULL"):
            bench_bigmat(rng)
        else:
            _progress(f"skipping bigmat phase (sparse compile took "
                      f"{sparse_compile_s:.0f}s — degraded tunnel; set "
                      f"USHER_BENCH_FULL=1 to force)")


def bench_bigmat(rng):
    """Pandemic-scale proof: a 1M-node CSR MAT over 30k sites -- far beyond
    what the dense [N, P] form can hold -- placed against a 256-sample batch
    through core/bigmat.py (pointer-doubling column materialization + the
    same Pallas kernel).  Reported to stderr; correctness of the BigMAT path
    is established vs the dense kernel in tests/test_bigmat.py."""
    from usher_tpu.core.bigmat import BigMAT

    N, P, B, K = 1_000_000, 30_000, 256, 24
    parent = np.zeros(N, dtype=np.int32)
    parent[1:] = (rng.random(N - 1) * np.arange(1, N)).astype(np.int32)
    n_mut = 2
    M = n_mut * (N - 1)
    mut_ptr = np.zeros(N + 1, dtype=np.int64)
    mut_ptr[2:] = n_mut * np.arange(1, N, dtype=np.int64)
    mut_col = rng.integers(0, P, size=M).astype(np.int32)
    mut_mut = NIBBLES[rng.integers(0, 4, size=M)]
    ref = NIBBLES[rng.integers(0, 4, size=P)]
    # synthetic par = ref (recurrent-position collisions along a path are
    # ~0.2% and irrelevant for throughput measurement)
    mut_par = ref[mut_col].copy()
    same = mut_par == mut_mut
    mut_mut[same] = NIBBLES[(np.searchsorted(NIBBLES, mut_mut[same]) + 1) % 4]
    positions = np.arange(P, dtype=np.int64)

    t0 = time.time()
    big = BigMAT(parent, mut_ptr, mut_col, mut_par, mut_mut, positions, ref)
    _progress(f"bigmat: built 1M-node CSR MAT in {time.time()-t0:.1f}s "
              f"(depth {big.max_depth}, {M} mutations, "
              f"{big.mut_col.nbytes + big.mut_mut.nbytes + big.parent.nbytes:,}"
              f" bytes core arrays)")

    pos = rng.integers(0, P, size=(B, K)).astype(np.int32)
    gval = NIBBLES[rng.integers(0, 4, size=(B, K))]
    kmiss = np.zeros((B, K), dtype=bool)
    pad = np.full((B, 32 - K), P, dtype=np.int32)
    pos = np.concatenate([pos, pad], axis=1)
    gval = np.concatenate([gval, np.zeros((B, 32 - K), np.uint8)], axis=1)
    kmiss = np.concatenate([kmiss, np.zeros((B, 32 - K), bool)], axis=1)

    t0 = time.time()
    s, n, _ = big.score_batch_T(pos, gval, kmiss, max_cols=2048)
    first_dt = time.time() - t0
    _progress(f"bigmat: first batch (compile incl.) {first_dt:.1f}s")
    t0 = time.time()
    # adaptive: on a latency-degraded tunnel one steady batch is minutes;
    # don't burn the run budget on repetitions that only average noise
    iters = 3 if first_dt < 60 else 1
    for _ in range(iters):
        s, n, _ = big.score_batch_T(pos, gval, kmiss, max_cols=2048)
    dt = (time.time() - t0) / iters
    _progress(f"bigmat: {dt*1e3:.0f} ms/batch -> {B/dt:.0f} samples/s at "
              f"1M nodes x 30k sites (all-node exact scoring)")


if __name__ == "__main__":
    main()
