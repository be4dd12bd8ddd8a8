#!/usr/bin/env python
"""Long-context DT training throughput: the Pallas flash-attention kernel
exercised END-TO-END (fwd+bwd+fused-AdamW), not just in the op microbench.

The flagship DT runs at S=3K=90 where the XLA fused path wins (measured
crossover, RESULTS.md); ops/flash_attention.py dispatches to the Pallas
kernel only at S >= PALLAS_MIN_SEQ = 1024.  This tool trains the same DT
architecture at context_len K=342 (S=1026 interleaved tokens, just past the
crossover) on synthetic trajectories and measures the full training step
BOTH ways:

  pallas — the production dispatch (S=1026 >= 1024 -> Pallas kernel)
  xla    — PALLAS_MIN_SEQ patched above S so the same program lowers through
           XLA's fused attention (the crossover's loser at this length)

Timing is fetch-chained per the RESULTS.md methodology: the TrainState is
donated and chained through N steps (every call data-dependent on the
last), one scalar fetch at the end; the tunnel cannot dedupe or pipeline
past it.  MFU uses the RESULTS.md floor model (6 * matmul-params * tokens
for the token-parallel matmuls + 12 * B*H*S^2*Dh attention fwd+bwd + conv
towers scaled from the measured 0.109 GFLOP/frame) against the v5e bf16
peak of 197 TFLOP/s.

Reference anchor: the reference's perf story is torch CUDA on one GPU
(cleanrl ppo_atari_envpool_xla_jax.py is its own jax flagship); it has no
long-context attention kernel at all — this row is TPU-native headroom.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import mmtrl_tpu.ops.flash_attention as fa
from mmtrl_tpu.algos.dt import DTTrainConfig, create_dt_state, make_dt_train_step
from mmtrl_tpu.models.decision_transformer import DTConfig

V5E_BF16_PEAK = 197e12
CONV_GFLOP_PER_FRAME = 0.109  # fwd+bwd, 2x84x84 big towers (RESULTS.md)


def make_batch(key, B, K, cfg, num_actions=4):
    k1, k2, k3 = jax.random.split(key, 3)
    if cfg.state_kind == "vector":
        states = jax.random.uniform(
            k1, (B, K, cfg.state_dim), jnp.bfloat16, -1.0, 1.0
        )
    else:
        states = jax.random.uniform(
            k1, (B, K, 2, 84, 84), jnp.bfloat16, -1.0, 1.0
        )
    rtg = jax.random.uniform(k2, (B, K), jnp.float32, -30.0, 10.0)
    actions = jax.random.randint(k3, (B, K), 0, num_actions, dtype=jnp.int32)
    timesteps = jnp.tile(jnp.arange(K, dtype=jnp.int32), (B, 1))
    mask = jnp.ones((B, K), dtype=bool)
    return rtg, states, actions, timesteps, mask


def matmul_params(params):
    """Count params in >=2-D leaves outside the conv towers (token-parallel
    matmuls: qkv/proj/mlp/embeds/head) — the 6*P*tokens population."""
    total = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        names = "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        ).lower()
        if leaf.ndim >= 2 and "conv" not in names:
            total += leaf.size
    return total


def bench_variant(name, cfg, B, K, iters, key):
    tcfg = DTTrainConfig(batch_size=B, total_steps=10_000)
    batch = make_batch(key, B, K, cfg)
    state = create_dt_state(key, cfg, tcfg, batch)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    p_mm = matmul_params(state.params)
    print(f"[{name}] state ready, compiling...", flush=True)

    step = jax.jit(make_dt_train_step(cfg), donate_argnums=(0,))
    t_c = time.perf_counter()
    s, m = step(state, batch, key)
    float(m["dt/loss"])  # compile + sync
    print(f"[{name}] compiled in {time.perf_counter()-t_c:.1f}s", flush=True)

    t0 = time.perf_counter()
    for i in range(iters):
        s, m = step(s, batch, jax.random.fold_in(key, i))
    float(m["dt/loss"])  # single fetch closes the chain
    dt = (time.perf_counter() - t0) / iters

    S = 3 * K
    tokens = B * S
    dh = cfg.d_model // cfg.n_heads
    conv = (
        CONV_GFLOP_PER_FRAME * 1e9 * B * K
        if cfg.state_kind == "multimodal"
        else 0.0
    )
    flops = 6.0 * p_mm * tokens + 12.0 * B * cfg.n_heads * S * S * dh + conv
    mfu = flops / dt / V5E_BF16_PEAK
    print(
        f"{name:8s} ms/step={dt*1e3:8.2f}  tokens/s={tokens/dt:12,.0f}  "
        f"MFU={mfu*100:5.1f}%  (params={n_params/1e6:.1f}M, "
        f"flops/step={flops/1e12:.2f}T)"
    )
    return dt, tokens / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--context-len", type=int, default=342)  # S = 1026
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--d-model", type=int, default=512)
    ap.add_argument("--n-layers", type=int, default=6)
    ap.add_argument(
        "--state-kind", default="vector", choices=["vector", "multimodal"],
        help="vector (default: isolates the attention path; compiles fast "
        "over the tunnel) or multimodal (flagship two-tower conv encoder)",
    )
    args = ap.parse_args()

    cfg = DTConfig(
        num_actions=4,
        context_len=args.context_len,
        d_model=args.d_model,
        n_layers=args.n_layers,
        n_heads=4,
        dropout=0.1,
        max_timestep=4096,
        state_kind=args.state_kind,
        state_dim=64 if args.state_kind == "vector" else 0,
    )
    S = 3 * args.context_len
    assert S >= fa.PALLAS_MIN_SEQ, (
        f"S={S} below the Pallas crossover {fa.PALLAS_MIN_SEQ}; "
        "this bench exists to exercise the kernel"
    )
    print(
        f"long-context DT train step: B={args.batch_size} K={args.context_len} "
        f"S={S} d={args.d_model} L={args.n_layers} backend={jax.default_backend()}"
    )
    key = jax.random.PRNGKey(0)

    dt_p, tps_p = bench_variant("pallas", cfg, args.batch_size, args.context_len, args.iters, key)

    # Same program through XLA's fused attention: raise the dispatch gate.
    orig = fa.PALLAS_MIN_SEQ
    fa.PALLAS_MIN_SEQ = 1 << 30
    try:
        dt_x, tps_x = bench_variant("xla", cfg, args.batch_size, args.context_len, args.iters, key)
    finally:
        fa.PALLAS_MIN_SEQ = orig

    print(
        f"pallas vs xla at S={S}: {dt_x/dt_p:.3f}x step-time "
        f"({dt_x*1e3:.2f} -> {dt_p*1e3:.2f} ms)"
    )


if __name__ == "__main__":
    main()
