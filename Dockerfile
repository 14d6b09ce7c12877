# TPU-host image for livecell-tpu.
#
# The reference ships an nvidia/cuda base with the NVIDIA runtime
# (reference Dockerfile:1, docker-compose.yml:16). TPU VMs need no
# accelerator base image — the TPU is reached through libtpu installed
# with jax[tpu] — so this is a plain slim-python image.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make git curl && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /workspace

# Dependency layer first for build caching (same trick as the
# reference's requirements-first COPY, Dockerfile:35-40).
COPY pyproject.toml ./
RUN pip install --no-cache-dir "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html && \
    pip install --no-cache-dir flax optax orbax-checkpoint chex einops \
        numpy pillow requests tqdm matplotlib pytest

COPY . .
RUN pip install --no-cache-dir -e . && \
    g++ -O3 -shared -fPIC livecell_tpu/native/rasterize.cc \
        -o livecell_tpu/native/_native.so

# Gradio/inference server + TensorBoard profiler ports.
EXPOSE 7860 6006

CMD ["/bin/bash"]
