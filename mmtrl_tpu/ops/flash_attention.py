"""Causal flash attention as a Pallas TPU kernel (fwd + custom VJP).

The decision transformer's hot op (BASELINE.json north star: "causal
attention + MLP over trajectory tokens runs as a Pallas flash-attention
block").  Never materializes the (S, S) score matrix in HBM: each grid
program streams K/V blocks through VMEM with the online-softmax recurrence,
and the backward pass recomputes probabilities blockwise from the saved
logsumexp (standard flash-attention-2 structure).

Layout: (B, H, S, D) with D the head dim (128 recommended — one MXU lane
tile).  All matmuls run on the MXU with float32 accumulation; inputs may be
bfloat16.  Falls back to a jnp reference (same math, XLA-fused) off-TPU so
CPU tests and the driver's virtual-device dryrun run the identical module
code.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
NEG_INF = -1e30


# =============================================================================
# Reference implementation (CPU fallback + test oracle)
# =============================================================================
def mha_reference(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Causal attention, (B, H, S, D) -> (B, H, S, D)."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    S = q.shape[-2]
    mask = jnp.tril(jnp.ones((S, S), dtype=bool))
    s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


# =============================================================================
# Forward kernel
# =============================================================================
def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_q, block_k, scale):
    qi = pl.program_id(1)
    q = q_ref[0]  # (Bq, D) — kept in the stored dtype: bf16 inputs run the
    # MXU at its native bf16 rate (f32 upcasts measured ~4x slower); the
    # scale and the softmax recurrence stay in f32 via the accumulator type.
    num_kb = pl.cdiv((qi + 1) * block_q, block_k)  # causal horizon
    # k blocks strictly below the diagonal need no mask — splitting the loop
    # removes the iota+where VPU pass from all but the diagonal block(s).
    num_full = (qi * block_q) // block_k

    q_ids = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)

    def body(j, carry, masked):
        acc, m, l = carry
        k = k_ref[0, pl.ds(j * block_k, block_k), :]
        v = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Bq, Bk) f32
        if masked:
            k_ids = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            s = jnp.where(q_ids >= k_ids, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    d = q_ref.shape[-1]
    acc = jnp.zeros((block_q, d), dtype=jnp.float32)
    m = jnp.full((block_q, 1), NEG_INF, dtype=jnp.float32)
    l = jnp.zeros((block_q, 1), dtype=jnp.float32)
    carry = jax.lax.fori_loop(
        0, num_full, lambda j, c: body(j, c, masked=False), (acc, m, l)
    )
    acc, m, l = jax.lax.fori_loop(
        num_full, num_kb, lambda j, c: body(j, c, masked=True), carry
    )
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)  # (Bq, 1)


def _fwd(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, block_q: int, block_k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    b, h, s, d = q.shape
    bh = b * h
    scale = d**-0.5
    qf = q.reshape(bh, s, d)
    kf = k.reshape(bh, s, d)
    vf = v.reshape(bh, s, d)
    grid = (bh, pl.cdiv(s, block_q))
    o, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, block_q=block_q, block_k=block_k, scale=scale
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh_, i: (bh_, i, 0)),
            pl.BlockSpec((1, s, d), lambda bh_, i: (bh_, 0, 0)),
            pl.BlockSpec((1, s, d), lambda bh_, i: (bh_, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh_, i: (bh_, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh_, i: (bh_, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s, d), q.dtype),
            jax.ShapeDtypeStruct((bh, s, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
    )(qf, kf, vf)
    return o.reshape(b, h, s, d), lse.reshape(b, h, s)


def _lse_delta_specs(s, block, full):
    """(1, block_q, 1)-shaped specs for the per-row lse/delta tensors."""
    if full:
        return pl.BlockSpec((1, s, 1), lambda bh_, j: (bh_, 0, 0))
    return pl.BlockSpec((1, block, 1), lambda bh_, i: (bh_, i, 0))


# =============================================================================
# Backward kernels
# =============================================================================
def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *, block_q, block_k, scale
):
    qi = pl.program_id(1)
    q = q_ref[0]  # native dtype for MXU-rate dots; scale applied to scores
    do = do_ref[0]
    lse = lse_ref[0]  # (Bq, 1)
    delta = delta_ref[0]  # (Bq, 1)
    num_kb = pl.cdiv((qi + 1) * block_q, block_k)
    num_full = (qi * block_q) // block_k
    q_ids = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)

    def body(j, dq_acc, masked):
        k = k_ref[0, pl.ds(j * block_k, block_k), :]
        v = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = jnp.exp(s - lse)
        if masked:
            k_ids = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            p = jnp.where(q_ids >= k_ids, p, 0.0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        return dq_acc + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    zero = jnp.zeros((block_q, q_ref.shape[-1]), jnp.float32)
    dq = jax.lax.fori_loop(
        0, num_full, lambda j, a: body(j, a, masked=False), zero
    )
    dq = jax.lax.fori_loop(
        num_full, num_kb, lambda j, a: body(j, a, masked=True), dq
    )
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, block_q, block_k, scale,
):
    kj = pl.program_id(1)
    k = k_ref[0]  # native dtype — see _fwd_kernel note
    v = v_ref[0]
    seq_len = q_ref.shape[1]
    num_qb = pl.cdiv(seq_len, block_q)
    first_qb = (kj * block_k) // block_q  # earlier q blocks are fully masked
    # q blocks whose smallest q id >= this kv block's largest k id see the
    # whole block: no mask needed from there on.
    first_full = pl.cdiv((kj + 1) * block_k - 1, block_q)
    k_ids = kj * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)

    def body(i, carry, masked):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :]
        do = do_ref[0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, pl.ds(i * block_q, block_q), :]  # (Bq, 1)
        delta = delta_ref[0, pl.ds(i * block_q, block_q), :]
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = jnp.exp(s - lse)
        if masked:
            q_ids = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            p = jnp.where(q_ids >= k_ids, p, 0.0)
        pc = p.astype(do.dtype)
        dv_acc = dv_acc + jax.lax.dot_general(
            pc, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk_acc, dv_acc

    d = k_ref.shape[-1]
    zeros = jnp.zeros((block_k, d), jnp.float32)
    clamp_full = jnp.minimum(first_full, num_qb)
    carry = jax.lax.fori_loop(
        first_qb, clamp_full, lambda i, c: body(i, c, masked=True), (zeros, zeros)
    )
    dk, dv = jax.lax.fori_loop(
        clamp_full, num_qb, lambda i, c: body(i, c, masked=False), carry
    )
    # the score scale is applied post-dot, so dk needs the same factor dq got
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd(
    block_q: int,
    block_k: int,
    res,
    g: jnp.ndarray,
):
    q, k, v, o, lse = res
    b, h, s, d = q.shape
    bh = b * h
    scale = d**-0.5
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)  # (B,H,S)

    qf, kf, vf = (x.reshape(bh, s, d) for x in (q, k, v))
    dof = g.reshape(bh, s, d)
    lsef = lse.reshape(bh, s, 1)
    deltaf = delta.reshape(bh, s, 1)

    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, block_q=block_q, block_k=block_k, scale=scale
        ),
        grid=(bh, pl.cdiv(s, block_q)),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh_, i: (bh_, i, 0)),
            pl.BlockSpec((1, s, d), lambda bh_, i: (bh_, 0, 0)),
            pl.BlockSpec((1, s, d), lambda bh_, i: (bh_, 0, 0)),
            pl.BlockSpec((1, block_q, d), lambda bh_, i: (bh_, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh_, i: (bh_, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh_, i: (bh_, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh_, i: (bh_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
    )(qf, kf, vf, dof, lsef, deltaf)

    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, block_q=block_q, block_k=block_k, scale=scale
        ),
        grid=(bh, pl.cdiv(s, block_k)),
        in_specs=[
            pl.BlockSpec((1, s, d), lambda bh_, j: (bh_, 0, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh_, j: (bh_, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh_, j: (bh_, j, 0)),
            pl.BlockSpec((1, s, d), lambda bh_, j: (bh_, 0, 0)),
            pl.BlockSpec((1, s, 1), lambda bh_, j: (bh_, 0, 0)),
            pl.BlockSpec((1, s, 1), lambda bh_, j: (bh_, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda bh_, j: (bh_, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh_, j: (bh_, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s, d), q.dtype),
            jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
    )(qf, kf, vf, dof, lsef, deltaf)

    reshape = lambda x: x.reshape(b, h, s, d)  # noqa: E731
    return reshape(dq), reshape(dk), reshape(dv)


# =============================================================================
# Public entry
# =============================================================================
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_attention(q, k, v, block_q, block_k):
    o, _ = _fwd(q, k, v, block_q, block_k)
    return o


def _flash_fwd(q, k, v, block_q, block_k):
    o, lse = _fwd(q, k, v, block_q, block_k)
    return o, (q, k, v, o, lse)


_flash_attention.defvjp(_flash_fwd, _bwd)


# Measured crossover on TPU v5e (tools/bench_flash.py, bf16 fwd+bwd,
# B*H=256, D=128): XLA's fused attention wins below this sequence length
# (at the flagship DT's S=90 it wins ~10x); the Pallas kernel wins above
# (S=2048 fwd+bwd: 43.7ms vs 49.7ms).  Numbers recorded in RESULTS.md.
PALLAS_MIN_SEQ = 1024


def causal_flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 0,
    block_k: int = 0,
    force_pallas: bool = False,
) -> jnp.ndarray:
    """Causal multi-head attention, (B, H, S, D) -> (B, H, S, D).

    Uses the Pallas kernel on TPU for S >= PALLAS_MIN_SEQ (the measured
    crossover vs XLA's fused attention); non-divisible S is zero-padded up
    to the block size — padded KEYS are masked automatically by causality
    (their ids exceed every real query id) and padded QUERY rows are sliced
    off, with gradients flowing correctly because the pad/slice live
    outside the custom VJP.  Falls back to the fused-jnp reference off-TPU
    and below the crossover.
    """
    # 0 -> auto-select, resolved at call time so benchmark sweeps
    # (tools/bench_flash_blocks.py) can patch DEFAULT_BLOCK_Q/K.  The
    # round-5 block sweep (runs_mujoco/flash_blocks_s2048.log) measured
    # 512x512 running the fwd+bwd kernel ~2x faster than the original
    # 128x128 at S=2048 (3.49 vs 6.82 ms at B=8 H=4 D=128): larger blocks
    # amortize grid overhead and keep the MXU on longer contractions.
    # Padding rounds S up to a whole block, so cap the block where padded
    # FLOPs (~(s_pad/s)^2) would eat the win; below the cap fall back to
    # the module defaults (which the sweep can still patch).
    s = q.shape[-2]
    if not (block_q or block_k):
        for b in (512, 256):
            if (-(-s // b) * b) / s <= 1.13:
                block_q = block_k = b
                break
    block_q = block_q or DEFAULT_BLOCK_Q
    block_k = block_k or DEFAULT_BLOCK_K
    on_tpu = jax.default_backend() == "tpu"
    if not (force_pallas or (on_tpu and s >= PALLAS_MIN_SEQ)):
        return mha_reference(q, k, v)
    # Round S up to a whole number of blocks (power-of-two block sizes, so
    # the max of the two is a common multiple).  Blocks are clamped only to
    # the PADDED length, keeping them MXU-tile aligned for any S.
    block = max(block_q, block_k)
    s_pad = -(-s // block) * block
    block_q = min(block_q, s_pad)
    block_k = min(block_k, s_pad)
    if s_pad != s:
        pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
    out = _flash_attention(q, k, v, block_q, block_k)
    return out[:, :, :s] if s_pad != s else out
