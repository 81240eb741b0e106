# hero_tpu container image — the L7 environment artifact matching the
# reference's Dockerfile/launch_container.sh pair (reference
# Dockerfile:1-40 pins PyTorch 19.10 + horovod 0.18.2 + apex + java;
# hero_tpu's runtime is jax/jaxlib/libtpu, pinned as a set in
# pyproject.toml because Pallas/Mosaic lowering is version-coupled).
#
# Build:   docker build -t hero-tpu .
# Run:     see launch_container.sh (bind-mounts /txt /video /storage
#          /pretrain like the reference image).
#
# Smoke (CPU mesh, no TPU needed — the quick-core subset):
#   docker run --rm hero-tpu python -m pytest tests/ -q \
#       --ignore=tests/test_drivers_all.py \
#       --ignore=tests/test_driver_vcmr.py
#
# On a TPU VM, run with --privileged --net=host and the tpu extra
# provides libtpu; JAX auto-detects the chips.

FROM python:3.11-slim

# native toolchain: herostore builds its mmap/LZ4 reader with g++ at
# first use (hero_tpu/native/herostore.py — portable flags, per-arch
# cache under ~/.cache/hero_tpu)
RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ git && rm -rf /var/lib/apt/lists/*

WORKDIR /src
COPY pyproject.toml README.md ./
COPY hero_tpu ./hero_tpu
COPY scripts ./scripts
COPY tests ./tests
COPY bench.py __graft_entry__.py ./

# the compute trio + extras; torch cpu wheel for checkpoint conversion
RUN pip install --no-cache-dir --extra-index-url \
        https://download.pytorch.org/whl/cpu \
        ".[convert,data,logging,test]"
# TPU runtime (libtpu) — harmless on non-TPU hosts, jax falls back to cpu
RUN pip install --no-cache-dir ".[tpu]" || true

# pre-build the native store so first import in prod doesn't compile
RUN python -c "from hero_tpu.native import herostore; \
    print('herostore native:', herostore.available())"

# bind-mount points (reference launch_container.sh)
RUN mkdir -p /txt /video /storage /pretrain
ENV PYTHONPATH=/src

CMD ["python", "-m", "hero_tpu.drivers.pretrain", "--help"]
