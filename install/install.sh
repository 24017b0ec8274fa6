#!/usr/bin/env bash
# Install usher_tpu into the current Python environment (the reference's
# install/installUbuntu.sh analog — but a pip install, not a CMake build).
#
#   ./install/install.sh          # CPU jax (tests, host tools)
#   ./install/install.sh --tpu    # TPU jax (real chips)
#
# Installs the console scripts usher-tpu, matUtils-tpu, matOptimize-tpu,
# ripples-tpu and builds the native C++ host-tool extension
# (usher_tpu/native: threaded VCF ingest, transposed-VCF codec, pb
# scanners).
set -euo pipefail
cd "$(dirname "$0")/.."

if [ "${1:-}" = "--tpu" ]; then
  pip install 'jax[tpu]' \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
else
  pip install jax
fi
pip install flax optax chex einops numpy pytest
pip install -e .
python setup.py build_ext --inplace

echo "usher_tpu installed; run: usher-tpu --help"
echo "verify: ./ci.sh"
