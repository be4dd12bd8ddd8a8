#!/usr/bin/env python
"""End-to-end DT training throughput: buffer window-sample + train step.

Round-1 feedback: bench.py times the train step on pre-staged tensors and
excludes the ``TrajectoryBuffer.sample`` gather the real training loop pays
every step (scripts/dt_minecraft.py).  This tool measures both on the same
chip with the fetch-based methodology (RESULTS.md) and prints step-only,
sample-only, and fused end-to-end tokens/sec.

Buffer dimensions mirror the flagship run: 98k transitions (T=6144, N=16),
B=64, K=30, (2, 84, 84) multimodal states stored flat.
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mmtrl_tpu.algos.dt import DTTrainConfig, create_dt_state, make_dt_train_step
from mmtrl_tpu.algos.dt.data import TrajectoryBuffer
from mmtrl_tpu.models.decision_transformer import DTConfig

B, K = 64, 30
T, N = 6144, 16
STATE_SHAPE = (2, 84, 84)


def main():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    flat = int(jnp.prod(jnp.asarray(STATE_SHAPE)))
    # Stream-major (N, T, ...) storage: see TrajectoryBuffer layout note.
    buffer = TrajectoryBuffer(
        states=jax.random.uniform(k1, (N, T, flat), jnp.bfloat16, minval=-1, maxval=1),
        actions=jax.random.randint(k2, (N, T), 0, 4, dtype=jnp.int32),
        rtg=jax.random.uniform(k2, (N, T), jnp.float32, minval=-30, maxval=10),
        timesteps=jnp.tile(jnp.arange(T, dtype=jnp.int32)[None, :] % 64, (N, 1)),
        episode_starts=jnp.zeros((N, T), bool),
        state_shape=STATE_SHAPE,
    )
    cfg = DTConfig(num_actions=4, context_len=K, d_model=512, n_layers=6,
                   n_heads=4, dropout=0.1, max_timestep=64)
    tcfg = DTTrainConfig(batch_size=B, total_steps=1000)

    sample = jax.jit(lambda buf, k: buf.sample(k, B, K))
    batch = sample(buffer, key)
    state = create_dt_state(key, cfg, tcfg, batch)
    inner = make_dt_train_step(cfg)
    step = jax.jit(inner, donate_argnums=(0,))

    def fused(state, buf, k):
        k_s, k_d = jax.random.split(k)
        batch = buf.sample(k_s, B, K)
        return inner(state, batch, k_d)

    fused_j = jax.jit(fused, donate_argnums=(0,))

    def timeit(name, fn, fetch, n=30, **kw):
        res = None
        out = fn(**kw)  # compile
        fetch(out)
        carry = kw
        t0 = time.perf_counter()
        state_out = out
        for i in range(n):
            state_out = fn(**kw)
            if "state" in kw and isinstance(state_out, tuple):
                kw = dict(kw, state=state_out[0])
        fetch(state_out)
        dt = (time.perf_counter() - t0) / n
        tps = B * 3 * K / dt
        print(f"{name:28s} {dt*1e3:8.2f} ms/step  {tps:12,.0f} tokens/s")
        return dt

    # sample only (chained by key so the tunnel can't dedupe)
    def sample_chain(buf, k):
        b = sample(buf, k)
        return b

    keys = jax.random.split(key, 64)
    out = sample(buffer, keys[0])
    float(jnp.sum(out[0]))
    t0 = time.perf_counter()
    prev = 0.0
    for i in range(30):
        b = sample(buffer, jax.random.fold_in(key, i))
    float(jnp.sum(b[0]))
    dt_sample = (time.perf_counter() - t0) / 30
    print(f"{'sample only':28s} {dt_sample*1e3:8.2f} ms/step")

    # step only
    st = state
    s2, m = step(st, batch, key)
    float(m["dt/loss"])
    t0 = time.perf_counter()
    for i in range(30):
        s2, m = step(s2, batch, jax.random.fold_in(key, i))
    float(m["dt/loss"])
    dt_step = (time.perf_counter() - t0) / 30
    print(f"{'train step only':28s} {dt_step*1e3:8.2f} ms/step  "
          f"{B*3*K/dt_step:12,.0f} tokens/s")

    # fused end-to-end
    s3, m = fused_j(s2, buffer, key)
    float(m["dt/loss"])
    t0 = time.perf_counter()
    for i in range(30):
        s3, m = fused_j(s3, buffer, jax.random.fold_in(key, 1000 + i))
    float(m["dt/loss"])
    dt_e2e = (time.perf_counter() - t0) / 30
    print(f"{'end-to-end (sample+step)':28s} {dt_e2e*1e3:8.2f} ms/step  "
          f"{B*3*K/dt_e2e:12,.0f} tokens/s")


if __name__ == "__main__":
    main()
