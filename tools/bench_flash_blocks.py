#!/usr/bin/env python
"""Flash-attention block-size sweep (round-5 verdict item 3).

ops/flash_attention.py shipped with fixed 128x128 blocks; this sweeps
(block_q, block_k) on the real chip at the long-context training shape
(bf16 fwd+bwd, the gradient path included — the bwd kernels are where the
block shape moves the recompute/HBM balance).  Timing is the chained-scan
methodology from tools/bench_flash.py: every iteration's inputs depend on
the previous output, one fetch at the end.

Usage: python tools/bench_flash_blocks.py [S] [B] [H]  (defaults 2048 8 4)
Prints one JSON line per block combo; the winner goes into
DEFAULT_BLOCK_Q/K with the sweep log as evidence.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

import mmtrl_tpu.ops.flash_attention as fa

ITERS = 20
COMBOS = [
    (128, 128),
    (128, 256),
    (256, 256),
    (256, 512),
    (512, 512),
    (128, 512),
]


def bench_combo(q, k, v, block_q, block_k):
    def loss(q, k, v):
        o = fa.causal_flash_attention(
            q, k, v, block_q=block_q, block_k=block_k, force_pallas=True
        )
        return (o.astype(jnp.float32) ** 2).sum()

    grad = jax.grad(loss, (0, 1, 2))

    @jax.jit
    def run(q, k, v):
        def body(carry, _):
            qc, kc, vc = carry
            dq, dk, dv = grad(qc, kc, vc)
            norm = lambda g, x: (  # noqa: E731
                x + 1e-3 * g / (jnp.max(jnp.abs(g)) + 1e-3)
            ).astype(x.dtype)
            return (norm(dq, qc), norm(dk, kc), norm(dv, vc)), None

        (qf, _, _), _ = lax.scan(body, (q, k, v), None, length=ITERS)
        return jnp.sum(qf.astype(jnp.float32))

    t0 = time.perf_counter()
    float(run(q, k, v))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(q, k, v))
    dt = (time.perf_counter() - t0) / ITERS
    return dt, compile_s


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    D = 128
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, H, S, D), jnp.bfloat16)
    # causal fwd ~2*B*H*S^2/2*D*2(QK+PV) = 2*B*H*S*S*D; bwd ~2.5x fwd
    flops = 3.5 * 2.0 * B * H * S * S * D
    for bq, bk in COMBOS:
        if bq > S or bk > S:
            continue
        dt, compile_s = bench_combo(q, k, v, bq, bk)
        print(json.dumps({
            "S": S, "B": B, "H": H, "block_q": bq, "block_k": bk,
            "ms_fwd_bwd": round(dt * 1e3, 3),
            "tflops": round(flops / dt / 1e12, 1),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
