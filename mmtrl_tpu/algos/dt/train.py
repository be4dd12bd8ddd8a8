"""Decision-transformer offline training: one jitted step, mesh-aware.

Behavior-cloning objective of the published DT design: cross-entropy of the
action predicted at each state token against the logged action, masked over
left-padding.  AdamW with linear warmup, global-norm clipping.  Under a Mesh
the (B, ...) batch dims shard over ``data`` and params stay replicated (or
shard over ``model`` via parallel/sharding rules) — XLA inserts the gradient
all-reduce.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training.train_state import TrainState

from mmtrl_tpu.models.decision_transformer import DecisionTransformer, DTConfig


@dataclasses.dataclass
class DTTrainConfig:
    learning_rate: float = 6e-4
    weight_decay: float = 0.1
    warmup_steps: int = 512
    total_steps: int = 20_000
    batch_size: int = 64
    max_grad_norm: float = 0.25
    beta1: float = 0.9
    beta2: float = 0.95


def create_dt_state(
    key: jax.Array,
    model_cfg: DTConfig,
    train_cfg: DTTrainConfig,
    example_batch: Tuple[jnp.ndarray, ...],
) -> TrainState:
    model = DecisionTransformer(model_cfg)
    rtg, states, actions, timesteps, _ = example_batch
    params = model.init(key, rtg, states, actions, timesteps, deterministic=True)
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=train_cfg.learning_rate,
        warmup_steps=train_cfg.warmup_steps,
        decay_steps=train_cfg.total_steps,
        end_value=train_cfg.learning_rate * 0.1,
    )
    # Single-pass clip+AdamW, numerically identical to
    # optax.chain(clip_by_global_norm, adamw) (tests/test_fused_optim.py)
    # but ~1ms/step cheaper at 22.6M params (fewer materialized trees).
    from mmtrl_tpu.ops.fused_optim import fused_clip_adamw

    tx = fused_clip_adamw(
        schedule,
        b1=train_cfg.beta1,
        b2=train_cfg.beta2,
        weight_decay=train_cfg.weight_decay,
        max_grad_norm=train_cfg.max_grad_norm,
    )
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def make_dt_train_step(model_cfg: DTConfig):
    model = DecisionTransformer(model_cfg)

    def train_step(state: TrainState, batch, dropout_key: jax.Array):
        rtg, states, actions, timesteps, mask = batch
        # Dropout masks via the RBG generator: threefry mask generation for
        # 19 (B,3K,D) masks costs ~3.2 ms/step on v5e (measured,
        # tools/bench_dt_breakdown.py); RBG uses the TPU's native RNG.  One
        # threefry draw seeds it, so the caller's key semantics are kept.
        dropout_key = jax.random.key(
            jax.random.bits(dropout_key, dtype=jnp.uint32), impl="rbg"
        )

        def loss_fn(params):
            apply_kw = dict(deterministic=False, rngs={"dropout": dropout_key})
            if model_cfg.moe_experts:
                # MoE routers sow their load-balance aux under
                # intermediates/moe_aux (models/moe.py); average over blocks.
                logits, muts = model.apply(
                    params, rtg, states, actions, timesteps,
                    mutable=["intermediates"], **apply_kw,
                )
                aux_leaves = jax.tree_util.tree_leaves(muts["intermediates"])
                moe_aux = sum(aux_leaves) / max(len(aux_leaves), 1)
            else:
                logits = model.apply(
                    params, rtg, states, actions, timesteps, **apply_kw
                )
                moe_aux = jnp.float32(0.0)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(
                logp, actions[..., None].astype(jnp.int32), axis=-1
            )[..., 0]
            m = mask.astype(jnp.float32)
            loss = (nll * m).sum() / jnp.maximum(m.sum(), 1.0)
            acc = (
                ((jnp.argmax(logits, -1) == actions) * m).sum()
                / jnp.maximum(m.sum(), 1.0)
            )
            if model_cfg.moe_experts:
                loss = loss + model_cfg.moe_aux_coef * moe_aux
            return loss, (acc, moe_aux)

        (loss, (acc, moe_aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        metrics = {"dt/loss": loss, "dt/action_accuracy": acc}
        if model_cfg.moe_experts:
            metrics["dt/moe_aux"] = moe_aux
        return state, metrics

    return train_step


def make_dt_train_steps(
    model_cfg: DTConfig, batch_size: int, context_len: int, n_steps: int
):
    """``n_steps`` fused (sample + train_step) iterations per dispatch.

    Each jitted call has a fixed cost on a remote-tunnel backend (~2.6 ms
    at B=64: dispatch serialization over the train-state's pytree leaves);
    scanning the step amortizes it.  Semantics are identical to calling
    ``train_step`` on ``n_steps`` fresh window samples.
    """
    inner = make_dt_train_step(model_cfg)

    def train_steps(state: TrainState, buffer, key: jax.Array):
        def body(carry, _):
            state, key = carry
            key, k_b, k_d = jax.random.split(key, 3)
            batch = buffer.sample(k_b, batch_size, context_len)
            state, m = inner(state, batch, k_d)
            return (state, key), m

        (state, _), ms = jax.lax.scan(body, (state, key), None, length=n_steps)
        return state, jax.tree_util.tree_map(lambda x: x[-1], ms)

    return train_steps
