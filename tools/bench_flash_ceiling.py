#!/usr/bin/env python
"""Pin the v5e ceiling for the long-context DT train step (round-5
verdict item 3: "≥30% MFU at S=2048 ... or a measured analysis pinning
the v5e ceiling").

Decomposes the S=2046 train step three ways, all fetch-chained on the
real chip (methodology of tools/bench_dt_long.py):

  full     — the production step (Pallas flash attention, fwd+bwd+AdamW)
  no-attn  — the same step with attention patched to the identity
             (o = v): everything EXCEPT attention — token-parallel
             matmuls, LN/residual chains, embeds, optimizer
  kernel   — the attention kernel alone at the exact step shape
             (B, H, S, Dh), fwd and fwd+bwd, chained scan

and compares against two analytic floors:

  MXU floor     — attention fwd+bwd FLOPs (causal: half the 12*B*H*S^2*Dh
                  dense count actually executes) / 197 TFLOP/s
  HBM floor     — bytes the flash bwd must move (q,k,v,o?,do,lse reads +
                  dq,dk,dv writes; the recompute streams K/V once more
                  per q-block pass) / 819 GB/s

The verdict's question is answered by the implied ceiling:
  step_floor = no_attn_ms + max(MXU, HBM) attention floor
  MFU_ceiling = step_flops / step_floor / peak
If MFU_ceiling < 30%, the 30% target is structurally out of reach for
this model shape on v5e and the measured analysis stands in its place.

Reference anchor: the reference has no long-context path at all (torch
SDPA, K=30); this is TPU-native headroom accounting.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

import mmtrl_tpu.ops.flash_attention as fa
from tools.bench_dt_long import (
    V5E_BF16_PEAK,
    bench_variant,
    make_batch,  # noqa: F401  (re-exported for interactive use)
)
from mmtrl_tpu.models.decision_transformer import DTConfig

V5E_HBM_BW = 819e9  # bytes/s


def bench_kernel(B, H, S, D, iters=20):
    """Chained-scan timing of the attention kernel alone, fwd and fwd+bwd."""
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, H, S, D), jnp.bfloat16)

    def fwd_only(q, k, v):
        return fa.causal_flash_attention(q, k, v, force_pallas=True)

    grad = jax.grad(
        lambda q, k, v: (fwd_only(q, k, v).astype(jnp.float32) ** 2).sum(),
        (0, 1, 2),
    )

    def chain(fn, n_out):
        @jax.jit
        def run(q, k, v):
            def body(carry, _):
                qc, kc, vc = carry
                outs = fn(qc, kc, vc)
                if n_out == 1:
                    qc = (qc + 1e-3 * outs).astype(qc.dtype)
                else:
                    dq, dk, dv = outs
                    qc = (qc + 1e-3 * dq).astype(qc.dtype)
                    kc = (kc + 1e-3 * dk).astype(kc.dtype)
                    vc = (vc + 1e-3 * dv).astype(vc.dtype)
                return (qc, kc, vc), None

            (qf, _, _), _ = lax.scan(body, (q, k, v), None, length=iters)
            return jnp.sum(qf.astype(jnp.float32))

        float(run(q, k, v))  # compile
        t0 = time.perf_counter()
        float(run(q, k, v))
        return (time.perf_counter() - t0) / iters

    return chain(fwd_only, 1), chain(grad, 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--context-len", type=int, default=682)  # S = 2046
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    B, K = args.batch_size, args.context_len
    S = 3 * K
    cfg = DTConfig(
        num_actions=4, context_len=K, d_model=512, n_layers=6, n_heads=4,
        dropout=0.1, max_timestep=4096, state_kind="vector", state_dim=64,
    )
    H, Dh, L = cfg.n_heads, cfg.d_model // cfg.n_heads, cfg.n_layers
    print(
        f"ceiling analysis: B={B} K={K} S={S} H={H} Dh={Dh} L={L} "
        f"backend={jax.default_backend()}"
    )
    key = jax.random.PRNGKey(0)

    dt_full, _ = bench_variant("full", cfg, B, K, args.iters, key)

    # Patch attention to identity: measures the rest of the model.  The
    # model binds the symbol at import (`from ops.flash_attention import
    # causal_flash_attention`, decision_transformer.py:34), so patch the
    # MODEL module's binding — patching fa.* alone does nothing (the
    # first run of this tool measured no-attn == full for exactly that
    # reason; that output is void).
    import mmtrl_tpu.models.decision_transformer as dtm

    orig = dtm.causal_flash_attention
    dtm.causal_flash_attention = lambda q, k, v, **kw: v
    try:
        dt_rest, _ = bench_variant("no-attn", cfg, B, K, args.iters, key)
    finally:
        dtm.causal_flash_attention = orig

    dt_kf, dt_kfb = bench_kernel(B, H, S, Dh, args.iters)

    # --- analytic floors (per step = L kernel calls) ---
    # Causal attention executes ~half of the dense 12*B*H*S^2*Dh fwd+bwd
    # count (the kernel skips above-diagonal blocks in fwd AND bwd).
    mxu_floor = 0.5 * 12.0 * B * H * S * S * Dh * L / V5E_BF16_PEAK
    # Flash-2 bwd traffic per layer: read q,k,v,do (bf16) + lse,delta
    # (f32), write dq (f32 accum) and dk,dv; the kv-pass streams q,do per
    # k-block => ~2x read of q,do. Model: 8 tensor-reads + 3 writes of
    # (B,H,S,Dh) bf16 + 2 f32 (S,) vectors. Fwd adds 3 reads + 1 write.
    bytes_bhsd = B * H * S * Dh * 2  # bf16
    hbm_bwd = (8 + 3) * bytes_bhsd + 2 * B * H * S * 4
    hbm_fwd = 4 * bytes_bhsd
    hbm_floor = (hbm_fwd + hbm_bwd) * L / V5E_HBM_BW

    attn_floor = max(mxu_floor, hbm_floor)
    attn_measured = dt_kfb * L
    attn_in_step = dt_full - dt_rest

    # Step-level MFU convention of bench_dt_long (dense attention count).
    p_mm_flops = None  # recomputed via the printed MFU of the full row
    step_flops = None
    # Recompute the same flop model bench_variant prints:
    from tools.bench_dt_long import matmul_params
    from mmtrl_tpu.algos.dt import DTTrainConfig, create_dt_state

    tcfg = DTTrainConfig(batch_size=B, total_steps=10_000)
    batch = make_batch(key, B, K, cfg)
    state = create_dt_state(key, cfg, tcfg, batch)
    p_mm = matmul_params(state.params)
    tokens = B * S
    step_flops = 6.0 * p_mm * tokens + 12.0 * B * H * S * S * Dh
    del state, batch

    step_floor = dt_rest + attn_floor
    result = {
        "S": S, "B": B, "L": L,
        "full_ms": round(dt_full * 1e3, 2),
        "no_attn_ms": round(dt_rest * 1e3, 2),
        "attn_in_step_ms": round(attn_in_step * 1e3, 2),
        "kernel_fwd_ms_x1": round(dt_kf * 1e3, 3),
        "kernel_fwdbwd_ms_x1": round(dt_kfb * 1e3, 3),
        "kernel_fwdbwd_ms_xL": round(attn_measured * 1e3, 2),
        "attn_mxu_floor_ms": round(mxu_floor * 1e3, 2),
        "attn_hbm_floor_ms": round(hbm_floor * 1e3, 2),
        "kernel_vs_floor": round(attn_measured / attn_floor, 2),
        "step_mfu_now_pct": round(step_flops / dt_full / V5E_BF16_PEAK * 100, 1),
        "step_floor_ms": round(step_floor * 1e3, 2),
        "step_mfu_ceiling_pct": round(
            step_flops / step_floor / V5E_BF16_PEAK * 100, 1
        ),
        "rest_mfu_pct": round(
            6.0 * p_mm * tokens / dt_rest / V5E_BF16_PEAK * 100, 1
        ),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
