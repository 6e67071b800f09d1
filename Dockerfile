# Container recipe for unet3d_tpu (parity with the reference's Dockerfile role:
# a reproducible runtime for training/inference; TPU hosts use the libtpu base).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ zlib1g-dev && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/unet3d_tpu
COPY pyproject.toml README.md ./
COPY unet3d_tpu ./unet3d_tpu
COPY examples ./examples
COPY doc ./doc

# On TPU VMs install jax[tpu] instead (requires libtpu); CPU default for CI.
RUN pip install --no-cache-dir "jax[cpu]" flax optax numpy Pillow scipy && \
    pip install --no-cache-dir -e .

ENTRYPOINT ["unet3d-train"]
