#!/usr/bin/env python
"""DT full-step batch-size scaling, post round-3 step optimizations.

Re-measures the B-scaling table in RESULTS.md (which predates the
space-to-depth conv packing / RBG dropout keys / fused clip+AdamW) with
the exact flagship step bench.py times, at several batch sizes.
Fetch-chained timing (the only valid timing over the axon tunnel — see
RESULTS.md methodology).

Usage: python tools/bench_dt_bscale.py [iters] [B ...]   (default 30; 16 64 128 256)
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    from mmtrl_tpu.algos.dt import (
        DTTrainConfig,
        create_dt_state,
        make_dt_train_step,
    )
    from mmtrl_tpu.models.decision_transformer import DTConfig

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    bs = [int(b) for b in sys.argv[2:]] or [16, 64, 128, 256]
    K = 30
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    cfg = DTConfig(
        num_actions=4, context_len=K, d_model=512, n_layers=6, n_heads=4,
        dropout=0.1, max_timestep=64,
    )
    rows = []
    for B in bs:
        batch = (
            jax.random.uniform(k2, (B, K), jnp.float32, minval=-30.0, maxval=10.0),
            jax.random.uniform(k1, (B, K, 2, 84, 84), jnp.bfloat16, minval=-1.0, maxval=1.0),
            jax.random.randint(k3, (B, K), 0, 4, dtype=jnp.int32),
            jnp.tile(jnp.arange(K, dtype=jnp.int32), (B, 1)),
            jnp.ones((B, K), dtype=bool),
        )
        state = create_dt_state(key, cfg, DTTrainConfig(batch_size=B, total_steps=1000), batch)
        step = jax.jit(make_dt_train_step(cfg), donate_argnums=(0,))
        state2, m = step(state, batch, key)
        float(m["dt/loss"])  # compile + sync
        t0 = time.perf_counter()
        s = state2
        for _ in range(iters):
            s, m = step(s, batch, key)
        float(m["dt/loss"])  # fetch ends the chain
        dt = (time.perf_counter() - t0) / iters
        rows.append((B, dt))
        print(f"B={B:4d}: {dt*1e3:7.2f} ms/step  {B*3*K/dt/1e3:8.0f}k tokens/s",
              flush=True)
    if len(rows) >= 2:
        (b0, t0_), (b1, t1_) = rows[-2], rows[-1]
        marg = (t1_ - t0_) / (b1 - b0) * 1e3
        print(f"marginal cost {marg:.3f} ms/sample between B={b0} and B={b1}")


if __name__ == "__main__":
    main()
