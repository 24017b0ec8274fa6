# usher_tpu container: the TPU-native UShER-capability suite.
# Mirrors the reference's Dockerfile + install/installUbuntu.sh role
# (/root/reference/Dockerfile): a self-contained image whose build runs
# the full test pyramid (unit + parity tests on the 8-device virtual CPU
# mesh, vendored smoke goldens, multi-chip dryrun).
#
#   docker build -t usher-tpu .
#   docker run usher-tpu usher-tpu --help
#
# On real TPU hosts, install the matching libtpu-enabled jax instead:
#   pip install 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

FROM python:3.11-slim

RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ zlib1g-dev \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/usher_tpu
COPY . .

RUN pip install --no-cache-dir jax flax optax chex einops numpy pytest \
    && pip install --no-cache-dir -e . \
    && python setup.py build_ext --inplace

# build-time verification: the same pyramid CI runs (vendored fixtures —
# no reference checkout inside the image)
RUN ./ci.sh

ENTRYPOINT []
CMD ["usher-tpu", "--help"]
