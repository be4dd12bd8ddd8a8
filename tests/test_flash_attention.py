"""Flash-attention tests.

The jnp reference is validated against a hand-rolled oracle on CPU; the
Pallas kernel itself requires TPU hardware and is covered by
tests_tpu/test_flash_attention_tpu.py (run on the bench chip)."""

import jax
import jax.numpy as jnp
import numpy as np

from mmtrl_tpu.ops.flash_attention import causal_flash_attention, mha_reference


def oracle(q, k, v):
    B, H, S, D = q.shape
    out = np.zeros_like(np.asarray(q))
    qn, kn, vn = map(np.asarray, (q, k, v))
    for b in range(B):
        for h in range(H):
            s = (qn[b, h] @ kn[b, h].T) / np.sqrt(D)
            for i in range(S):
                s[i, i + 1 :] = -np.inf
            p = np.exp(s - s.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            out[b, h] = p @ vn[b, h]
    return out


def test_reference_matches_oracle():
    key = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(k_, (2, 2, 16, 8), jnp.float32)
        for k_ in jax.random.split(key, 3)
    )
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(ref), oracle(q, k, v), atol=2e-3)


def test_dispatch_falls_back_off_tpu():
    key = jax.random.PRNGKey(1)
    q, k, v = (
        jax.random.normal(k_, (1, 2, 64, 16), jnp.float32)
        for k_ in jax.random.split(key, 3)
    )
    out = causal_flash_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(mha_reference(q, k, v)), atol=1e-5
    )


def test_gradients_flow():
    key = jax.random.PRNGKey(2)
    q, k, v = (
        jax.random.normal(k_, (1, 1, 8, 4), jnp.float32)
        for k_ in jax.random.split(key, 3)
    )
    g = jax.grad(lambda q: (causal_flash_attention(q, k, v) ** 2).sum())(q)
    assert np.isfinite(np.asarray(g)).all()
