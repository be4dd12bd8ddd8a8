"""fused_clip_adamw must match optax.chain(clip_by_global_norm, adamw)
numerically, step for step, including the clip trigger both ways."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mmtrl_tpu.ops.fused_optim import fused_clip_adamw


def _tree(key, scale):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "w": jax.random.normal(k1, (17, 23)) * scale,
        "b": jax.random.normal(k2, (23,)) * scale,
        "emb": {"table": jax.random.normal(k3, (11, 7)) * scale},
    }


def _run(tx, params, grads_seq):
    state = tx.init(params)
    out = []
    for g in grads_seq:
        upd, state = tx.update(g, state, params)
        params = optax.apply_updates(params, upd)
        out.append(params)
    return out


def test_matches_optax_chain_both_clip_regimes():
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, 3e-4, warmup_steps=3, decay_steps=20, end_value=3e-5
    )
    kw = dict(b1=0.9, b2=0.95, weight_decay=0.1)
    ref = optax.chain(
        optax.clip_by_global_norm(0.25), optax.adamw(schedule, **kw)
    )
    fused = fused_clip_adamw(
        schedule, max_grad_norm=0.25, eps=1e-8, **kw
    )
    params = _tree(jax.random.PRNGKey(0), 0.5)
    # alternate big grads (clip fires) and tiny grads (clip no-op)
    grads_seq = [
        _tree(jax.random.PRNGKey(i + 1), 10.0 if i % 2 else 1e-3)
        for i in range(6)
    ]
    ref_out = _run(ref, params, grads_seq)
    fused_out = _run(fused, params, grads_seq)
    for a, b in zip(ref_out, fused_out):
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=2e-6, atol=2e-7
            ),
            a,
            b,
        )


def test_constant_lr_variant():
    ref = optax.chain(
        optax.clip_by_global_norm(0.5),
        optax.adamw(1e-3, b1=0.9, b2=0.999, weight_decay=0.01),
    )
    fused = fused_clip_adamw(
        1e-3, b1=0.9, b2=0.999, weight_decay=0.01, max_grad_norm=0.5
    )
    params = _tree(jax.random.PRNGKey(5), 1.0)
    grads_seq = [_tree(jax.random.PRNGKey(10 + i), 1.0) for i in range(4)]
    for a, b in zip(_run(ref, params, grads_seq), _run(fused, params, grads_seq)):
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=2e-6, atol=2e-7
            ),
            a,
            b,
        )
