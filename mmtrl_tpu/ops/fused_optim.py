"""Fused global-norm-clip + AdamW, numerically identical to the optax
chain ``optax.chain(optax.clip_by_global_norm(c), optax.adamw(...))``.

optax stages materialize per-stage intermediate trees (clipped grads,
pre-decay updates, ...) that XLA cannot always alias away; measured
~2.2 ms of the flagship DT step (tools/bench_dt_breakdown.py) against a
~0.9 ms HBM-traffic floor for 22.6M params.  This transform computes the
global norm in one read pass, then emits ONE fused elementwise pass per
leaf that reads (g, mu, nu, p) and produces (update, mu', nu').

Exactness vs the optax chain is locked by tests/test_fused_optim.py.
"""

from __future__ import annotations

from typing import Callable, Union

import jax
import jax.numpy as jnp
import optax


def fused_clip_adamw(
    learning_rate: Union[float, Callable],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-4,
    max_grad_norm: float = 0.25,
) -> optax.GradientTransformation:
    def init_fn(params):
        zeros = lambda: jax.tree_util.tree_map(  # noqa: E731
            lambda p: jnp.zeros_like(p), params
        )
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=zeros(), nu=zeros()
        )

    def update_fn(grads, state, params):
        # clip_by_global_norm semantics: scale by c/norm only when norm > c
        g_norm = optax.global_norm(grads)
        trigger = jnp.squeeze(g_norm < max_grad_norm)
        scale = jnp.where(trigger, 1.0, max_grad_norm / g_norm)
        count = optax.safe_int32_increment(state.count)
        # optax.scale_by_schedule evaluates at the PRE-increment count while
        # Adam bias correction uses the post-increment count — match both.
        lr = (
            learning_rate(state.count)
            if callable(learning_rate)
            else learning_rate
        )
        c1 = 1.0 - jnp.asarray(b1, jnp.float32) ** count
        c2 = 1.0 - jnp.asarray(b2, jnp.float32) ** count

        def leaf(g, mu, nu, p):
            g = g * scale
            mu2 = b1 * mu + (1.0 - b1) * g
            nu2 = b2 * nu + (1.0 - b2) * (g * g)
            mu_hat = mu2 / c1.astype(mu2.dtype)
            nu_hat = nu2 / c2.astype(nu2.dtype)
            upd = mu_hat / (jnp.sqrt(nu_hat) + eps) + weight_decay * p
            return (-lr * upd).astype(p.dtype), mu2, nu2

        out = jax.tree_util.tree_map(leaf, grads, state.mu, state.nu, params)
        treedef = jax.tree_util.tree_structure(grads)
        leaves = treedef.flatten_up_to(out)
        updates = treedef.unflatten([x[0] for x in leaves])
        mu = treedef.unflatten([x[1] for x in leaves])
        nu = treedef.unflatten([x[2] for x in leaves])
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)
