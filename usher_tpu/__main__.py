"""Top-level dispatcher: ``python -m usher_tpu <tool> [args...]``.

Maps reference binary names onto the CLI modules so shell scripts written
for the reference suite can switch with a one-word prefix change.
"""

from __future__ import annotations

import sys

TOOLS = {
    "usher": "usher_tpu.cli.usher_cli",
    "usher-sampled": "usher_tpu.cli.usher_sampled_cli",
    "matOptimize": "usher_tpu.cli.matoptimize_cli",
    "matUtils": "usher_tpu.cli.matutils_cli",
    "ripples": "usher_tpu.cli.ripples_cli",
    "ripples-fast": "usher_tpu.cli.ripples_cli",
    "ripplesInit": "usher_tpu.cli.ripples_init_cli",
    "ripplesUtils": "usher_tpu.cli.ripples_utils_cli",
    "ripples-filter": "usher_tpu.cli.ripples_filter_cli",
    "transpose_vcf": "usher_tpu.cli.transpose_vcf_cli",
    "compareVCF": "usher_tpu.cli.compare_vcf_cli",
    "check_samples_place": "usher_tpu.cli.check_samples_cli",
    "usher_server": "usher_tpu.cli.usher_server_cli",
    "usher-sampled-server": "usher_tpu.cli.usher_socket_server_cli",
    "faToVcf": "usher_tpu.io.fatovcf",
}


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print("usage: python -m usher_tpu <tool> [args...]\n\ntools:",
              file=sys.stderr)
        for name in TOOLS:
            print(f"  {name}", file=sys.stderr)
        return 0 if len(sys.argv) >= 2 else 1
    tool = sys.argv[1]
    mod_name = TOOLS.get(tool)
    if mod_name is None:
        print(f"ERROR: unknown tool '{tool}'; run with --help for the list",
              file=sys.stderr)
        return 1
    import importlib
    mod = importlib.import_module(mod_name)
    return mod.main(sys.argv[2:])


if __name__ == "__main__":
    sys.exit(main())
