"""Sequence-parallel ring attention (the ``sp`` axis).

For contexts too long for one chip's HBM, shard the sequence over a mesh
axis: each device holds a (B, H, S/n, D) chunk of Q/K/V.  K/V chunks rotate
around the ring with ``lax.ppermute`` (neighbor hops ride ICI); each device
accumulates its queries' attention over every chunk with flash-style
streaming-softmax statistics (running max ``m``, normalizer ``l``, weighted
sum ``o``), so the full (S, S) score matrix never materializes on any chip
— O(S/n · S) time, O(S/n) memory per device.

The reference has no distributed-attention equivalent (its attention is a
single-GPU torch module, src/models.py CASL/New blocks); this is the
TPU-native long-context complement to ops/flash_attention.py (single-chip
Pallas kernel, engaged at S >= 1024).

Pure JAX ops inside ``shard_map`` — ``jax.grad`` through the ring generates
the reverse-rotation backward schedule automatically.

Design refs: the ring-attention literature (Liu et al., 2023) and the
scaling-book collective recipe: shard, ppermute, accumulate.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_NEG_BIG = -1e30  # finite "-inf": keeps fully-masked rows NaN-free


def _ring_attention_local(
    q: jnp.ndarray,  # (B, H, C, D) — this device's query chunk
    k: jnp.ndarray,  # (B, H, C, D)
    v: jnp.ndarray,  # (B, H, C, D)
    *,
    axis_name: str,
    axis_size: int,
    causal: bool,
    scale: Optional[float],
) -> jnp.ndarray:
    B, H, C, D = q.shape
    s = scale if scale is not None else 1.0 / (D**0.5)
    my = jax.lax.axis_index(axis_name)
    q_pos = my * C + jnp.arange(C)  # global positions of my queries

    qf = (q * s).astype(jnp.float32)

    def step(carry, j):
        k_c, v_c, m, l, o = carry
        src = (my - j) % axis_size  # whose chunk I hold at step j
        scores = jnp.einsum("bhqd,bhkd->bhqk", qf, k_c.astype(jnp.float32))
        if causal:
            k_pos = src * C + jnp.arange(C)
            mask = q_pos[:, None] >= k_pos[None, :]
            scores = jnp.where(mask[None, None], scores, _NEG_BIG)
        m_new = jnp.maximum(m, scores.max(axis=-1))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(scores - m_new[..., None])
        l = l * corr + p.sum(axis=-1)
        o = o * corr[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_c.astype(jnp.float32)
        )
        # Rotate K/V to the next device (single neighbor hop on ICI).
        perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
        k_c = jax.lax.ppermute(k_c, axis_name, perm)
        v_c = jax.lax.ppermute(v_c, axis_name, perm)
        return (k_c, v_c, m_new, l, o), None

    m0 = jnp.full((B, H, C), _NEG_BIG, jnp.float32)
    l0 = jnp.zeros((B, H, C), jnp.float32)
    o0 = jnp.zeros((B, H, C, D), jnp.float32)
    (_, _, _, l, o), _ = jax.lax.scan(
        step, (k, v, m0, l0, o0), jnp.arange(axis_size)
    )
    return (o / jnp.maximum(l, 1e-30)[..., None]).astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    axis_name: str = "seq",
    causal: bool = False,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Attention over (B, H, S, D) inputs sequence-sharded over ``axis_name``.

    Inputs may be passed with any sharding; the shard_map in/out specs pin
    the sequence dimension to the ring axis (XLA inserts the layout moves
    if needed).  Returns the (B, H, S, D) output with the same sequence
    sharding.  ``S`` must divide evenly by the axis size.
    """
    n = mesh.shape[axis_name]
    assert q.shape[2] % n == 0, (
        f"seq len {q.shape[2]} not divisible by ring size {n}"
    )
    spec = P(None, None, axis_name, None)
    fn = jax.shard_map(
        functools.partial(
            _ring_attention_local,
            axis_name=axis_name,
            axis_size=n,
            causal=causal,
            scale=scale,
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    out = fn(q, k, v)
    return jax.lax.with_sharding_constraint(out, NamedSharding(mesh, spec))
