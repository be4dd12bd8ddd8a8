#!/usr/bin/env python
"""One-chip MoE dispatch comparison (round-5 verdict item 8).

The MoE-DT at E=4 top_k=2 ran at 209k tokens/s vs the dense-FFN DT's 395k
(runs_mujoco/dt_rom_moe.log) — a 1.9x premium, of which E/top_k = 2x is
the dense dispatch computing every expert on every token.  This tool times
the SAME end-to-end scanned training loop as bench.py (buffer sample +
fwd+bwd + fused clip-AdamW, fetch-chained) for:

  dense   — GShard einsum dispatch (the round-4 default)
  gather  — capacity-based top-k dispatch (models/moe.py moe_ffn_gather)
  none    — dense FFN (no MoE) at the same width, the 395k anchor

Usage: python tools/bench_moe_dispatch.py <dense|gather|none>
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def run(variant: str) -> None:
    from mmtrl_tpu.core.config import enable_compile_cache

    enable_compile_cache()

    from mmtrl_tpu.algos.dt import (
        DTTrainConfig,
        create_dt_state,
        make_dt_train_steps,
    )
    from mmtrl_tpu.algos.dt.data import TrajectoryBuffer
    from mmtrl_tpu.models.decision_transformer import DTConfig

    B, K, chunk = 64, 30, 30
    T, N = 6144, 16
    state_shape = (2, 84, 84)
    cfg = DTConfig(
        num_actions=4, context_len=K, d_model=512, n_layers=6, n_heads=4,
        dropout=0.1, max_timestep=64,
        moe_experts=0 if variant == "none" else 4,
        moe_top_k=2,
        moe_dispatch="gather" if variant == "gather" else "dense",
    )
    tcfg = DTTrainConfig(batch_size=B, total_steps=1000)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    flat = int(jnp.prod(jnp.asarray(state_shape)))
    buffer = TrajectoryBuffer(
        states=jax.random.uniform(
            k1, (N, T, flat), jnp.bfloat16, minval=-1, maxval=1
        ),
        actions=jax.random.randint(k2, (N, T), 0, 4, dtype=jnp.int32),
        rtg=jax.random.uniform(k2, (N, T), jnp.float32, minval=-30, maxval=10),
        timesteps=jnp.tile(
            jnp.arange(T, dtype=jnp.int32)[None, :] % 64, (N, 1)
        ),
        episode_starts=jnp.zeros((N, T), bool),
        state_shape=state_shape,
    )

    example = jax.jit(lambda buf, k: buf.sample(k, B, K))(buffer, key)
    state = create_dt_state(key, cfg, tcfg, example)
    steps = jax.jit(
        make_dt_train_steps(cfg, B, K, chunk), donate_argnums=(0,)
    )

    state, m = steps(state, buffer, key)
    float(m["dt/loss"])  # fetch = the only real barrier over the tunnel

    n_outer = 8
    t0 = time.perf_counter()
    for i in range(n_outer):
        state, m = steps(state, buffer, jax.random.fold_in(key, 1 + i))
    loss = float(m["dt/loss"])
    dt = (time.perf_counter() - t0) / (n_outer * chunk)
    print(json.dumps({
        "variant": variant,
        "E": cfg.moe_experts,
        "top_k": cfg.moe_top_k,
        "ms_per_step": round(dt * 1e3, 3),
        "tokens_per_sec": round(B * 3 * K / dt, 1),
        "final_loss": round(loss, 4),
    }))


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "dense")
