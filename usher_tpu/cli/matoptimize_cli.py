"""matOptimize-tpu CLI: parsimony optimization of a MAT by SPR moves.

Flag surface mirrors the reference matOptimize (src/matOptimize/main.cpp:155-184).
"""

from __future__ import annotations

import argparse
import sys

from ..io.newick import parse_newick
from ..io.pbio import load_mat_pb, save_mat_pb
from ..optimize import OptimizeOptions, optimize_tree


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="matOptimize-tpu",
        description="Optimize a mutation-annotated tree by SPR moves "
                    "(TPU-native re-placement scoring).")
    p.add_argument("--load-mutation-annotated-tree", "-i", default="", dest="din",
                   help="Load MAT protobuf to optimize")
    p.add_argument("--tree", "-t", default="",
                   help="Load tree from newick (with --vcf)")
    p.add_argument("--vcf", "-v", default="",
                   help="VCF for state assignment when loading from newick")
    p.add_argument("--load-intermediate", "-a", default="", dest="resume",
                   help="Resume from a checkpoint MAT protobuf")
    p.add_argument("--save-mutation-annotated-tree", "-o", required=True,
                   dest="dout", help="Output optimized MAT protobuf")
    p.add_argument("--radius", "-r", type=int, default=-1,
                   help="SPR radius; <0 enables radius doubling (default)")
    p.add_argument("--min-improvement", "-m", type=float, default=0.0005)
    p.add_argument("--drift_iterations", "-d", type=int, default=0)
    p.add_argument("--max-iterations", "-N", type=int, default=1000)
    p.add_argument("--max-hours", "-M", type=float, default=0)
    p.add_argument("--minutes-between-save", "-s", type=float, default=0,
                   help="Checkpoint interval (minutes); 0 disables")
    p.add_argument("--save-profitable-src-log", "-S", default="", dest="src_log")
    p.add_argument("--node_proportion", "-z", type=float, default=1.0)
    p.add_argument("--node_seed", "-y", type=int, default=0)
    p.add_argument("--do-not-write-intermediate-files", "-n",
                   action="store_true")
    p.add_argument("--no-reduce-back-mutations", action="store_true",
                   help="Skip the final (parsimony, back-mutation) "
                        "lexicographic state reassignment")
    p.add_argument("--threads", "-T", type=int, default=0,
                   help="Accepted for CLI parity; XLA manages parallelism")
    p.add_argument("--version", action="version",
                   version="matOptimize-tpu (v0.1.0)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    try:
        if args.resume:
            print(f"Loading intermediate checkpoint {args.resume}",
                  file=sys.stderr)
            T = load_mat_pb(args.resume)
        elif args.din:
            T = load_mat_pb(args.din)
        elif args.tree and args.vcf:
            T = parse_newick(args.tree)
            from ..io.vcf import read_vcf_sites
            from ..ops.sankoff import assign_states_from_vcf
            vcf = read_vcf_sites(args.vcf)
            assign_states_from_vcf(T, vcf)
        else:
            print("ERROR: provide -i MAT.pb, -a checkpoint.pb, or "
                  "-t newick -v vcf", file=sys.stderr)
            return 1
    except OSError as e:
        print(f"ERROR: cannot read input: {e}", file=sys.stderr)
        return 1
    if T.root is None:
        print("ERROR: empty tree", file=sys.stderr)
        return 1

    # the reference checks output writability up front (main.cpp:256-262)
    try:
        with open(args.dout, "wb"):
            pass
    except OSError as e:
        print(f"ERROR: cannot write output file {args.dout}: {e}",
              file=sys.stderr)
        return 1

    checkpoint = "" if args.do_not_write_intermediate_files else (
        args.dout + ".intermediate" if args.minutes_between_save > 0 else "")
    opts = OptimizeOptions(
        radius=args.radius,
        min_improvement=args.min_improvement,
        drift_iterations=args.drift_iterations,
        max_iterations=args.max_iterations,
        max_hours=args.max_hours,
        checkpoint_path=checkpoint,
        checkpoint_minutes=args.minutes_between_save,
        profitable_src_log=args.src_log,
        node_proportion=args.node_proportion,
        seed=args.node_seed,
        reduce_back_mutations=not args.no_reduce_back_mutations,
    )
    optimize_tree(T, opts)
    save_mat_pb(T, args.dout)
    print(f"Saved optimized tree to {args.dout}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
