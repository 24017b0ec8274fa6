"""matOptimize-equivalent driver: iterative SPR parsimony optimization.

Mirrors the reference's outer loop (src/matOptimize/main.cpp:505-566):
radius doubling (radius < 0), iterate until the per-iteration improvement
drops below min_improvement * score (then drift for `drift_iterations`
accepting sideways moves), periodic checkpointing, wall-clock cap, and a
profitable-move log (main.cpp:433, optimize_tree.cpp:61-66).

Each iteration:
  1. whole-tree Fitch-Sankoff reassignment (vectorized; replaces
     reassign_states.cpp) -> canonical states + subtree Fitch sets + exact
     parsimony
  2. device move search: every source node re-placement-scored against all
     radius-bounded destinations in fused batches
  3. DFS-interval conflict resolution, batch apply, repeat

The parsimony guard (revert if an applied batch did not improve the FS-exact
score) replaces the reference's DEBUG_PARSIMONY_SCORE_CHANGE_CORRECT
checker: correctness does not depend on the move-scoring algebra.
"""

from __future__ import annotations

import os
import sys
import time
from dataclasses import dataclass

import numpy as np

from ..core.flat import collect_positions
from ..core.tree import Tree
from .fitch import FitchEngine, leaf_masks_from_tree
from .spr import MoveFinder, apply_move, resolve_conflicts


def _err(*a):
    print(*a, file=sys.stderr, flush=True)


@dataclass
class OptimizeOptions:
    radius: int = -1                 # <0: start at 2, double up to tree span
    min_improvement: float = 0.0005  # reference main.cpp:171
    max_iterations: int = 1000       # reference -N
    drift_iterations: int = 0        # reference -d
    max_hours: float = 0.0           # reference -M (0 = unlimited)
    source_chunk: int = 128
    checkpoint_path: str = ""        # reference -s intermediate pb
    checkpoint_minutes: float = 30.0
    profitable_src_log: str = ""     # reference -S
    node_proportion: float = 1.0     # reference -z
    seed: int = 0                    # reference -y
    exhaustive_first: bool = False
    reduce_back_mutations: bool = True  # final min-back FS pass (reference
                                        # matOptimize main.cpp:570-581 default)


def optimize_tree(T: Tree, opts: OptimizeOptions = OptimizeOptions()) -> int:
    """Optimize in place; returns the final parsimony score."""
    t_start = time.time()
    t_checkpoint = t_start
    positions, ref, chrom = collect_positions(T)
    if len(positions) == 0:
        return 0
    rng = np.random.default_rng(opts.seed)

    log_f = open(opts.profitable_src_log, "w") if opts.profitable_src_log else None
    if log_f:
        log_f.write("source\tdestination\titeration\tscore.change\t"
                    "distance\tsubtree.size\n")

    doubling = opts.radius < 0
    max_level = max(n.level for n in T.breadth_first_expansion())
    radius = 2 if doubling else opts.radius

    engine = FitchEngine(T, positions)
    leaf_masks, ref_row = leaf_masks_from_tree(T, positions, engine.bfs)
    states, masks = engine.run(leaf_masks, ref_row)
    score = engine.rewrite_mutations(states, leaf_masks, ref_row, chrom)
    _err(f"Initial parsimony score {score}")

    drift_remaining = opts.drift_iterations
    iteration = 0
    while iteration < opts.max_iterations:
        iteration += 1
        if opts.max_hours and (time.time() - t_start) > opts.max_hours * 3600:
            _err("Exceeded max runtime, saving current tree")
            break

        finder = MoveFinder(T, states, masks, ref_row, engine.bfs,
                            engine.parent, chunk=opts.source_chunk)
        sources = list(range(1, finder.n))
        if opts.node_proportion < 1.0:
            k = max(1, int(len(sources) * opts.node_proportion))
            sources = sorted(rng.choice(len(sources), size=k, replace=False) + 1)
            sources = [int(x) for x in sources]
        moves = finder.find_moves(radius, sources=sources)
        accepted = resolve_conflicts(moves)

        if not accepted:
            if doubling and radius < 2 * max_level:
                radius *= 2
                _err(f"No profitable moves at radius {radius // 2}, "
                     f"doubling to {radius}")
                continue
            break

        snapshot = T.copy()
        for mv in accepted:
            apply_move(T, mv)
            if log_f:
                log_f.write(f"{mv.src.identifier}\t{mv.dst.identifier}\t"
                            f"{iteration}\t{-mv.improvement}\t0\t"
                            f"{mv.src_interval[1]-mv.src_interval[0]}\n")

        engine = FitchEngine(T, positions)
        leaf_masks, ref_row = leaf_masks_from_tree(T, positions, engine.bfs)
        states, masks = engine.run(leaf_masks, ref_row)
        new_score = engine.rewrite_mutations(states, leaf_masks, ref_row, chrom)

        if new_score > score:
            # guard: the batch interacted badly; revert and apply only the
            # single best move (looked up by identifier in the restored tree
            # -- the Move's node objects were mutated by the failed batch)
            _err(f"Iteration {iteration}: batch regressed "
                 f"({score} -> {new_score}), reverting to single best move")
            T.__dict__.update(snapshot.__dict__)
            snapshot2 = T.copy()
            from .spr import Move
            mv0 = accepted[0]
            replay = Move(src=T.get_node(mv0.src.identifier),
                          dst=T.get_node(mv0.dst.identifier),
                          improvement=mv0.improvement,
                          sibling_split=mv0.sibling_split,
                          src_interval=mv0.src_interval,
                          dst_dfs=mv0.dst_dfs)
            apply_move(T, replay)
            engine = FitchEngine(T, positions)
            leaf_masks, ref_row = leaf_masks_from_tree(T, positions, engine.bfs)
            states, masks = engine.run(leaf_masks, ref_row)
            new_score = engine.rewrite_mutations(states, leaf_masks, ref_row,
                                                 chrom)
            if new_score > score:
                T.__dict__.update(snapshot2.__dict__)
                engine = FitchEngine(T, positions)
                leaf_masks, ref_row = leaf_masks_from_tree(T, positions,
                                                           engine.bfs)
                states, masks = engine.run(leaf_masks, ref_row)
                new_score = engine.rewrite_mutations(states, leaf_masks,
                                                     ref_row, chrom)
                break

        improvement = score - new_score
        _err(f"Iteration {iteration}: parsimony {score} -> {new_score} "
             f"({len(accepted)} moves applied, radius {radius})")
        score = new_score

        if opts.checkpoint_path and opts.checkpoint_minutes > 0 and (
                time.time() - t_checkpoint) > opts.checkpoint_minutes * 60:
            from ..io.pbio import save_mat_pb
            tmp = opts.checkpoint_path + ".tmp"
            save_mat_pb(T, tmp)
            os.replace(tmp, opts.checkpoint_path)
            t_checkpoint = time.time()
            _err(f"Checkpoint saved to {opts.checkpoint_path}")

        if improvement < opts.min_improvement * max(score, 1):
            if drift_remaining > 0:
                drift_remaining -= 1
            elif doubling and radius < 2 * max_level:
                radius *= 2
            else:
                break

    if opts.reduce_back_mutations:
        # final pass: re-pick states minimizing (parsimony, back-mutations)
        engine = FitchEngine(T, positions)
        leaf_masks, ref_row = leaf_masks_from_tree(T, positions, engine.bfs)
        states, masks = engine.run(leaf_masks, ref_row, min_back=True)
        mb_score = engine.rewrite_mutations(states, leaf_masks, ref_row, chrom)
        if mb_score > score:
            # never trade parsimony away; redo with the plain pass
            states, masks = engine.run(leaf_masks, ref_row)
            score = engine.rewrite_mutations(states, leaf_masks, ref_row, chrom)
        else:
            score = mb_score

    if log_f:
        log_f.close()
    _err(f"Final parsimony score {score}")
    return score
