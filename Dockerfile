# splat_one_tpu: TPU-native 3D gaussian splatting + SfM framework.
# The reference ships a CUDA image (its Dockerfile targets torch+gsplat);
# this image targets JAX on Cloud TPU VMs (libtpu) with a CPU fallback.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    build-essential cmake ninja-build ffmpeg git \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml ./
COPY splat_one_tpu ./splat_one_tpu
COPY native ./native
COPY scripts ./scripts
COPY __graft_entry__.py bench.py ./

# TPU build: jax[tpu] pulls libtpu (run on a TPU VM); CPU fallback keeps
# the image usable anywhere.
ARG JAX_TARGET=tpu
RUN pip install -U pip && \
    (pip install "jax[${JAX_TARGET}]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
     || pip install "jax[cpu]") && \
    pip install numpy pillow pytest chex einops && \
    pip install -e .

# native helpers (async image loader)
RUN cd native && make -f Makefile 2>/dev/null || true

ENTRYPOINT ["python", "-m", "splat_one_tpu.app.cli"]
