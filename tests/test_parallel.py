"""Multi-chip sharded placement on the virtual 8-device CPU mesh: the
sharded step must agree exactly with the single-device kernel, and the
graft entry points must run."""

import numpy as np
import jax

from usher_tpu.ops import placement as dev
from usher_tpu.parallel import make_mesh, sharded_placement_step, shard_flat_inputs

import sys
sys.path.insert(0, "/root/repo")
from __graft_entry__ import _tiny_inputs, entry, dryrun_multichip  # noqa: E402


def test_mesh_shape():
    mesh = make_mesh(8)
    assert mesh.shape["data"] * mesh.shape["model"] == 8
    assert mesh.shape["data"] == 2


def test_sharded_matches_single_device():
    args = _tiny_inputs(N=64, P=128, B=8)
    (st, stp, ref, active, num_leaves, bfs_rank, is_leaf, is_root_mask,
     g, E, miss) = args

    # single-device ground truth
    score, num_common, node_num_mut = dev.score_with_stp(
        st, stp, ref, active, g, E, miss)
    score = np.asarray(score)
    valid, has_unique = dev.placement_outputs(
        np.asarray(score), np.asarray(num_common), np.asarray(node_num_mut),
        is_root_mask, is_leaf, active)
    bs, bslot, nb = dev.reduce_best(
        score, jax.numpy.asarray(valid), num_leaves, bfs_rank)

    mesh = make_mesh(8)
    sharded = shard_flat_inputs(mesh, *args)
    step = sharded_placement_step(mesh)
    best_score, best_rank, num_best = step(*sharded)

    np.testing.assert_array_equal(np.asarray(best_score), np.asarray(bs))
    np.testing.assert_array_equal(np.asarray(num_best), np.asarray(nb))
    np.testing.assert_array_equal(np.asarray(best_rank),
                                  bfs_rank[np.asarray(bslot)])


def test_entry_jittable():
    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (args[4].shape[0], args[0].shape[0])


def test_dryrun_multichip():
    dryrun_multichip(8)
