"""Pallas flash-attention kernel tests — require real TPU hardware.

Run manually / by the bench driver:  python -m pytest tests_tpu/ -q
(not part of the CPU CI suite in tests/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

if jax.default_backend() != "tpu":
    pytest.skip("requires TPU", allow_module_level=True)

from mmtrl_tpu.ops.flash_attention import NEG_INF, _flash_attention


def hp_reference(q, k, v):
    D = q.shape[-1]
    S = q.shape[-2]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=jax.lax.Precision.HIGHEST)
    s = s * (D**-0.5)
    mask = jnp.tril(jnp.ones((S, S), dtype=bool))
    s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v, precision=jax.lax.Precision.HIGHEST)


@pytest.mark.parametrize("shape", [(2, 4, 512, 128), (1, 2, 256, 64), (2, 1, 1024, 128)])
def test_forward(shape):
    key = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(k_, shape, jnp.float32) for k_ in jax.random.split(key, 3)
    )
    o = _flash_attention(q, k, v, 128, 128)
    ref = hp_reference(q, k, v)
    # MXU default-precision rounding bounds the error.
    assert float(jnp.abs(o - ref).max()) < 0.05


def test_backward():
    key = jax.random.PRNGKey(1)
    shape = (2, 4, 512, 128)
    q, k, v = (
        jax.random.normal(k_, shape, jnp.float32) for k_ in jax.random.split(key, 3)
    )
    g_fl = jax.grad(lambda *a: (_flash_attention(*a, 128, 128) ** 2).sum(), (0, 1, 2))(
        q, k, v
    )
    g_hp = jax.grad(lambda *a: (hp_reference(*a) ** 2).sum(), (0, 1, 2))(q, k, v)
    for a, b in zip(g_fl, g_hp):
        rel = float(jnp.abs(a - b).max() / jnp.abs(b).max())
        assert rel < 0.02, rel


def test_bf16():
    key = jax.random.PRNGKey(2)
    shape = (1, 4, 512, 128)
    q, k, v = (
        jax.random.normal(k_, shape, jnp.bfloat16) for k_ in jax.random.split(key, 3)
    )
    o = _flash_attention(q, k, v, 128, 128)
    ref = hp_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    assert float(jnp.abs(o.astype(jnp.float32) - ref).max()) < 0.1


def test_padded_non_divisible_seq_fwd_bwd():
    """S=90 (the flagship DT's 3*K tokens) through the pad-and-mask path."""
    from mmtrl_tpu.ops.flash_attention import causal_flash_attention

    key = jax.random.PRNGKey(3)
    shape = (2, 4, 90, 128)
    q, k, v = (
        jax.random.normal(k_, shape, jnp.float32) for k_ in jax.random.split(key, 3)
    )
    o = causal_flash_attention(q, k, v, force_pallas=True)
    ref = hp_reference(q, k, v)
    assert o.shape == shape
    assert float(jnp.abs(o - ref).max()) < 0.05

    g_fl = jax.grad(
        lambda *a: (causal_flash_attention(*a, force_pallas=True) ** 2).sum(),
        (0, 1, 2),
    )(q, k, v)
    g_hp = jax.grad(lambda *a: (hp_reference(*a) ** 2).sum(), (0, 1, 2))(q, k, v)
    for a, b in zip(g_fl, g_hp):
        rel = float(jnp.abs(a - b).max() / jnp.abs(b).max())
        assert rel < 0.02, rel


@pytest.mark.parametrize("blocks", [(256, 256), (256, 512), (128, 512)])
def test_nondefault_block_sizes_fwd_bwd(blocks):
    """The block-size sweep (tools/bench_flash_blocks.py) relies on
    non-default (block_q, block_k) being numerically identical paths —
    forward AND the custom-VJP backward (round-5 verdict item 3)."""
    from mmtrl_tpu.ops.flash_attention import causal_flash_attention

    bq, bk = blocks
    key = jax.random.PRNGKey(3)
    shape = (1, 2, 1024, 128)
    q, k, v = (
        jax.random.normal(k_, shape, jnp.float32)
        for k_ in jax.random.split(key, 3)
    )
    o = causal_flash_attention(q, k, v, block_q=bq, block_k=bk, force_pallas=True)
    ref = hp_reference(q, k, v)
    assert float(jnp.abs(o - ref).max()) < 0.05

    def loss(fn):
        return lambda *a: (fn(*a) ** 2).sum()

    g = jax.grad(
        loss(lambda q, k, v: causal_flash_attention(
            q, k, v, block_q=bq, block_k=bk, force_pallas=True
        )),
        (0, 1, 2),
    )(q, k, v)
    g_ref = jax.grad(loss(hp_reference), (0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        denom = float(jnp.abs(b).max()) + 1e-6
        assert float(jnp.abs(a - b).max()) / denom < 0.01
