#!/usr/bin/env python
"""Scan-amortized DT training throughput vs per-step dispatch.

Each jitted call on the remote-tunnel backend pays a fixed dispatch cost
(~2.6 ms at B=64, measured in tools/bench_dt_breakdown.py) plus host-side
Python time that grows under host contention.  ``make_dt_train_steps``
lax.scans the (sample + train_step) body on device, so a whole chunk of
updates costs ONE dispatch + ONE fetch.  This tool measures all three
configurations with the fetch-chained methodology (RESULTS.md):

  per-step   — jit(train_step) called 30×, fixed batch (bench.py flagship)
  scan e2e   — jit(make_dt_train_steps(n=30)) called once: on-device
               buffer window-sample + step, 30 iterations per dispatch
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mmtrl_tpu.algos.dt import (
    DTTrainConfig,
    create_dt_state,
    make_dt_train_step,
    make_dt_train_steps,
)
from mmtrl_tpu.algos.dt.data import TrajectoryBuffer
from mmtrl_tpu.models.decision_transformer import DTConfig

B, K = 64, 30
T, N = 6144, 16
STATE_SHAPE = (2, 84, 84)
CHUNK = 30


def main():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    flat = int(jnp.prod(jnp.asarray(STATE_SHAPE)))
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

    batch = jax.jit(lambda buf, k: buf.sample(k, B, K))(buffer, key)
    state = create_dt_state(key, cfg, tcfg, batch)

    # --- per-step dispatch (current bench.py flagship shape) ---
    step = jax.jit(make_dt_train_step(cfg), donate_argnums=(0,))
    s, m = step(state, batch, key)
    float(m["dt/loss"])
    t0 = time.perf_counter()
    for i in range(CHUNK):
        s, m = step(s, batch, jax.random.fold_in(key, i))
    float(m["dt/loss"])
    dt = (time.perf_counter() - t0) / CHUNK
    print(f"per-step dispatch  : {dt*1e3:7.2f} ms/step  {B*3*K/dt:12,.0f} tokens/s")

    # --- scanned e2e: CHUNK fused (sample+step) per dispatch ---
    steps = jax.jit(
        make_dt_train_steps(cfg, B, K, CHUNK), donate_argnums=(0,)
    )
    s2, m = steps(state if s is None else s, buffer, key)  # compile (reuse state)
    float(m["dt/loss"])
    n_outer = 4
    t0 = time.perf_counter()
    for i in range(n_outer):
        s2, m = steps(s2, buffer, jax.random.fold_in(key, 100 + i))
    float(m["dt/loss"])
    dt2 = (time.perf_counter() - t0) / (n_outer * CHUNK)
    print(f"scan e2e (n={CHUNK:3d})   : {dt2*1e3:7.2f} ms/step  {B*3*K/dt2:12,.0f} tokens/s")


if __name__ == "__main__":
    main()
