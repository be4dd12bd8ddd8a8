"""Measure the Pallas flash-attention kernel vs XLA's fused attention on the
real TPU at flagship and scaling shapes (VERDICT round 1, item 3): bf16,
B*H=256, D=128, fwd and fwd+bwd.  The measured crossover sets
PALLAS_MIN_SEQ in ops/flash_attention.py; numbers go to RESULTS.md.

Timing methodology: the remote-tunnel execution path dedupes identical
dispatches, so wall-clocking a python loop of same-input calls measures
round-trip latency, not compute.  Instead each variant is timed as ONE
jitted lax.scan whose carry chains the op's output back into its input —
every iteration is a real, data-dependent execution on device.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

from mmtrl_tpu.ops.flash_attention import causal_flash_attention, mha_reference

ITERS = 20


def chain_fwd(attn, length):
    @jax.jit
    def run(q, k, v):
        def body(qc, _):
            o = attn(qc, k, v)
            return (o / (jnp.max(jnp.abs(o)) + 1e-3)).astype(qc.dtype), None

        qf, _ = lax.scan(body, q, None, length=length)
        return jnp.sum(qf.astype(jnp.float32))

    return run


def chain_fwd_bwd(attn, length):
    def loss(q, k, v):
        return (attn(q, k, v).astype(jnp.float32) ** 2).sum()

    grad = jax.grad(loss, (0, 1, 2))

    @jax.jit
    def run(q, k, v):
        def body(carry, _):
            qc, kc, vc = carry
            dq, dk, dv = grad(qc, kc, vc)

            def norm(g, x):
                return (g / (jnp.max(jnp.abs(g)) + 1e-3)).astype(x.dtype)

            return (norm(dq, qc), norm(dk, kc), norm(dv, vc)), None

        (qf, kf, vf), _ = lax.scan(body, (q, k, v), None, length=length)
        return jnp.sum(qf.astype(jnp.float32))

    return run


L_SHORT, L_LONG = 4, 24


def timeit(make_chain, q, k, v, repeats=3):
    """us per op via a two-length fit: (T_long - T_short) / (L_long - L_short).

    Cancels the remote round-trip latency; inputs are perturbed per call so
    the tunnel's identical-dispatch dedupe never serves a cached result."""
    runs = {L: make_chain(L) for L in (L_SHORT, L_LONG)}
    times = {}
    for L, run in runs.items():
        float(run(q, k, v))  # compile + execute (axon block_until_ready
        # returns before remote execution completes; only a FETCH waits)
        best = float("inf")
        for r in range(repeats):
            qr = q + jnp.bfloat16(1e-3 * (r + 1))
            float(jnp.sum(qr.astype(jnp.float32)))
            t0 = time.perf_counter()
            float(run(qr, k, v))
            best = min(best, time.perf_counter() - t0)
        times[L] = best
    return (times[L_LONG] - times[L_SHORT]) / (L_LONG - L_SHORT) * 1e6


def main():
    assert jax.default_backend() == "tpu", "run on the TPU chip"
    B, H, D = 64, 4, 128
    pallas = lambda q, k, v: causal_flash_attention(q, k, v, force_pallas=True)  # noqa: E731
    rows = []
    print(f"{'S':>6} {'jnp fwd':>10} {'pal fwd':>10} {'jnp f+b':>10} {'pal f+b':>10}  (us/op)")
    for S in (90, 96, 128, 256, 512, 1024, 2048):
        key = jax.random.PRNGKey(0)
        q, k, v = (
            jax.random.normal(k_, (B, H, S, D), jnp.bfloat16)
            for k_ in jax.random.split(key, 3)
        )
        t_jf = timeit(lambda L: chain_fwd(mha_reference, L), q, k, v)
        t_pf = timeit(lambda L: chain_fwd(pallas, L), q, k, v)
        t_jb = timeit(lambda L: chain_fwd_bwd(mha_reference, L), q, k, v)
        t_pb = timeit(lambda L: chain_fwd_bwd(pallas, L), q, k, v)
        rows.append((S, t_jf, t_pf, t_jb, t_pb))
        print(f"{S:>6} {t_jf:>10.1f} {t_pf:>10.1f} {t_jb:>10.1f} {t_pb:>10.1f}")
    return rows


if __name__ == "__main__":
    main()
