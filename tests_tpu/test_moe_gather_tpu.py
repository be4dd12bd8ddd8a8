"""Hardware numerics for the MoE gather (capacity-based) dispatch.

The gather path is built on TPU-native scatter/gather; CPU tests prove the
math (tests/test_moe.py), this proves the lowering on a real chip — the
dispatch ships as DTConfig.moe_dispatch='gather' (round-5 one-chip MoE
optimization).

Run manually:  python -m pytest tests_tpu/test_moe_gather_tpu.py -q
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

if jax.default_backend() != "tpu":
    pytest.skip("requires TPU", allow_module_level=True)


def test_gather_matches_dense_on_tpu():
    from mmtrl_tpu.models.moe import (
        moe_combine_weights,
        moe_ffn_dense,
        moe_ffn_gather,
    )

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    B, S, D, F, E, k = 4, 96, 64, 128, 4, 2
    x = jax.random.normal(ks[0], (B, S, D), jnp.float32)
    logits = jax.random.normal(ks[1], (B, S, E), jnp.float32)
    w1 = jax.random.normal(ks[2], (E, D, F)) * 0.3
    b1 = jax.random.normal(ks[3], (E, F)) * 0.1
    w2 = jax.random.normal(ks[4], (E, F, D)) * 0.3
    b2 = jax.random.normal(ks[5], (E, D)) * 0.1

    combine = moe_combine_weights(logits, k)
    dense = jax.jit(moe_ffn_dense)(x, combine, w1, b1, w2, b2)
    gather = jax.jit(
        lambda *a: moe_ffn_gather(*a, top_k=k, capacity_factor=2.0)
    )(x, logits, w1, b1, w2, b2)
    np.testing.assert_allclose(
        np.asarray(gather), np.asarray(dense), atol=5e-2
    )

    def gl(params):
        w1, b1, w2, b2 = params
        return (
            moe_ffn_gather(
                x, logits, w1, b1, w2, b2, top_k=k, capacity_factor=2.0
            )
            ** 2
        ).sum()

    def dl(params):
        w1, b1, w2, b2 = params
        return (moe_ffn_dense(x, combine, w1, b1, w2, b2) ** 2).sum()

    gg = jax.jit(jax.grad(gl))((w1, b1, w2, b2))
    gd = jax.jit(jax.grad(dl))((w1, b1, w2, b2))
    for a, b in zip(
        jax.tree_util.tree_leaves(gg), jax.tree_util.tree_leaves(gd)
    ):
        denom = float(jnp.abs(b).max()) + 1e-6
        assert float(jnp.abs(a - b).max()) / denom < 0.02
