# MMTRL-TPU image — intended for Cloud TPU VMs (v5e/v5p/v6e).
# The reference's image targets CUDA + Xvfb (reference: Dockerfile,
# entrypoint.sh); TPU needs neither a display server nor vendored drivers.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    build-essential make git \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace/mmtrl-tpu
COPY . .

# libtpu comes from the jax[tpu] extra; on non-TPU hosts the CPU backend
# is used automatically (tests run this way in CI).
RUN pip install --no-cache-dir \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    flax optax orbax-checkpoint chex einops numpy scipy pillow \
    opencv-python-headless tensorboard matplotlib pandas pytest \
    && make -C native

ENTRYPOINT ["python"]
CMD ["scripts/train.py", "--env-id", "minecraft", "--attn-type", "casl", "--fusion-type", "sum"]
