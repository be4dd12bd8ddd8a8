"""Phasic Policy Gradient — the reference's cleanrl/ppg_procgen.py, scanned.

Policy phase: ``n_iteration`` PPO updates with an auxiliary value head kept
detached (the reference's get_pi_value_and_aux_value, ppg_procgen.py:204).
Auxiliary phase: ``e_auxiliary`` epochs over ALL stored rollouts minimizing
aux-value MSE + beta_clone * KL(old pi || new pi) + real-value MSE
(ppg_procgen.py's aux loop).  Rollout storage for the aux phase stays in HBM
as a (n_iteration, T, N, ...) stack.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax.training.train_state import TrainState

from mmtrl_tpu.algos.ppo.core import PPOConfig, RunnerState, _ppo_loss, _make_optimizer
from mmtrl_tpu.core.metrics import EpisodeStatistics
from mmtrl_tpu.envs.base import Environment
from mmtrl_tpu.models.common import ImpalaTower, ZEROS, ortho
from mmtrl_tpu.models.distributions import (
    categorical_entropy,
    categorical_log_prob,
    categorical_sample,
)
from mmtrl_tpu.ops.gae import compute_gae


@dataclasses.dataclass
class PPGConfig(PPOConfig):
    n_iteration: int = 32  # policy-phase rollouts per PPG cycle
    e_policy: int = 1  # policy epochs (update_epochs alias)
    e_auxiliary: int = 6  # aux-phase epochs
    beta_clone: float = 1.0
    num_aux_minibatches: int = 4
    # Aux-phase rollout storage dtype.  The (n_iteration*T*N, F) obs stack
    # is the HBM peak of the whole algorithm (procmaze defaults: ~5.5 GB in
    # bf16, and the compile-time plan for the cycle tops 16 GB on a 16 GB
    # v5e with num_aux_minibatches<=16).  'int8' is EXACT for envs whose
    # obs values are integers in [-128,127] (procmaze planes are {-1,+1},
    # envs/procmaze.py:133-146) and halves the stack again.
    aux_store_dtype: str = "bfloat16"

    @property
    def num_updates(self) -> int:
        """PPG cycles: one train_iteration = n_iteration rollouts."""
        return max(1, self.total_timesteps // (self.batch_size * self.n_iteration))

    @property
    def opt_steps_per_update(self) -> int:
        """Optimizer steps per CYCLE (policy phase + aux phase), so the LR
        anneal schedule decays over cycles instead of assuming PPO's
        num_minibatches*update_epochs (which barely anneals for PPG)."""
        return (
            self.n_iteration * self.e_policy * self.num_minibatches
            + self.e_auxiliary * self.num_aux_minibatches
        )


class PPGAgent(nn.Module):
    """IMPALA trunk + actor + detached aux value head + value head."""

    num_actions: int
    input_scale: float = 1.0

    @nn.compact
    def __call__(self, obs: jnp.ndarray):
        if obs.ndim >= 4:  # (B, C, H, W) image
            feat = ImpalaTower(name="network")(
                jnp.moveaxis(obs / self.input_scale, -3, -1)
            )
        else:  # vector obs (smoke/classic-control path)
            from mmtrl_tpu.models.common import MLPTower

            feat = MLPTower((64, 64), name="network")(obs)
        logits = nn.Dense(
            self.num_actions, kernel_init=ortho(0.01), bias_init=ZEROS, name="actor"
        )(feat)
        value = nn.Dense(1, kernel_init=ortho(1.0), bias_init=ZEROS, name="critic")(
            feat
        )[..., 0]
        aux_value = nn.Dense(
            1, kernel_init=ortho(1.0), bias_init=ZEROS, name="aux_critic"
        )(jax.lax.stop_gradient(feat))[..., 0]
        return logits, value, aux_value


def make_ppg(env: Environment, model: PPGAgent, cfg: PPGConfig):
    """Returns (init_runner, ppg_cycle): one jitted call runs a full PPG
    cycle (n_iteration policy updates + the auxiliary phase)."""

    def init_runner(key: jax.Array) -> RunnerState:
        key, k_env, k_model = jax.random.split(key, 3)
        obs, env_state = env.v_reset(jax.random.split(k_env, cfg.num_envs))
        params = model.init(k_model, obs)
        ts = TrainState.create(
            apply_fn=model.apply, params=params, tx=_make_optimizer(cfg)
        )
        return RunnerState(
            train_state=ts,
            env_state=env_state,
            obs=obs,
            done=jnp.zeros(cfg.num_envs, dtype=bool),
            carry=None,
            stats=EpisodeStatistics.create(cfg.num_envs),
            key=key,
        )

    def _rollout_step(rs: RunnerState, _):
        key, k_act, k_step = jax.random.split(rs.key, 3)
        logits, value, _ = model.apply(rs.train_state.params, rs.obs)
        action = categorical_sample(k_act, logits)
        logprob = categorical_log_prob(logits, action)
        next_obs, env_state, reward, done, _ = env.v_step(
            jax.random.split(k_step, cfg.num_envs), rs.env_state, action
        )
        stats = rs.stats.update(reward, done)
        out = (rs.obs, action, logprob, reward, rs.done, value)
        rs = rs.replace(
            env_state=env_state, obs=next_obs, done=done, stats=stats, key=key
        )
        return rs, out

    def policy_update(rs: RunnerState):
        rs, (obs, actions, logprobs, rewards, dones, values) = jax.lax.scan(
            _rollout_step, rs, None, length=cfg.num_steps
        )
        _, next_value, _ = model.apply(rs.train_state.params, rs.obs)
        advantages, returns = compute_gae(
            rewards, values, dones, next_value, rs.done, cfg.gamma, cfg.gae_lambda
        )

        def flat(x):
            return x.reshape((cfg.batch_size,) + x.shape[2:])

        batch = tuple(map(flat, (obs, actions, logprobs, advantages, returns, values)))

        def loss_fn(params, mb):
            b_obs, b_act, b_logp, b_adv, b_ret, b_val = mb
            logits, newvalue, _ = model.apply(params, b_obs)
            newlogprob = categorical_log_prob(logits, b_act)
            entropy = categorical_entropy(logits)
            return _ppo_loss(
                cfg, newlogprob, entropy, newvalue, b_logp, b_adv, b_ret, b_val
            )

        def minibatch_step(ts, mb):
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                ts.params, mb
            )
            return ts.apply_gradients(grads=grads), metrics

        def epoch_step(carry, _):
            ts, key = carry
            key, k_perm = jax.random.split(key)
            perm = jax.random.permutation(k_perm, cfg.batch_size)
            shuffled = jax.tree_util.tree_map(
                lambda x: x[perm].reshape(
                    (cfg.num_minibatches, cfg.minibatch_size) + x.shape[1:]
                ),
                batch,
            )
            ts, metrics = jax.lax.scan(minibatch_step, ts, shuffled)
            return (ts, key), metrics

        (ts, key), metrics = jax.lax.scan(
            epoch_step, (rs.train_state, rs.key), None, length=cfg.e_policy
        )
        rs = rs.replace(train_state=ts, key=key)
        metrics = jax.tree_util.tree_map(lambda m: m[-1, -1], metrics)
        return rs, (obs, returns), metrics

    def aux_phase(rs: RunnerState, aux_obs, aux_returns, old_logits, obs_shape):
        """aux_obs: (n_iteration*T*N, prod(obs_shape)) FLAT storage.

        Flat storage matters on TPU: a (..., C, 84, 84) minor layout tiles to
        ~1.6x its logical HBM size, and gather-shuffling the whole buffer per
        epoch doubles it again.  Instead the buffer stays flat and fixed;
        each minibatch gathers only its own rows by shuffled indices.
        """
        total = aux_obs.shape[0]
        mb = total // cfg.num_aux_minibatches

        def loss_fn(params, idx):
            b_obs = aux_obs[idx].reshape((mb,) + obs_shape).astype(jnp.float32)
            b_ret = aux_returns[idx]
            b_old_logits = old_logits[idx]
            logits, value, aux_value = model.apply(params, b_obs)
            aux_loss = 0.5 * ((aux_value - b_ret) ** 2).mean()
            real_loss = 0.5 * ((value - b_ret) ** 2).mean()
            old_logp = jax.nn.log_softmax(b_old_logits)
            new_logp = jax.nn.log_softmax(logits)
            kl = (jnp.exp(old_logp) * (old_logp - new_logp)).sum(-1).mean()
            return real_loss + aux_loss + cfg.beta_clone * kl, (aux_loss, kl)

        def minibatch_step(ts, idx):
            (_, (aux_loss, kl)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(ts.params, idx)
            return ts.apply_gradients(grads=grads), (aux_loss, kl)

        def epoch_step(carry, _):
            ts, key = carry
            key, k_perm = jax.random.split(key)
            perm = jax.random.permutation(k_perm, total).reshape(
                (cfg.num_aux_minibatches, mb)
            )
            ts, metrics = jax.lax.scan(minibatch_step, ts, perm)
            return (ts, key), metrics

        (ts, key), (aux_losses, kls) = jax.lax.scan(
            epoch_step, (rs.train_state, rs.key), None, length=cfg.e_auxiliary
        )
        return rs.replace(train_state=ts, key=key), {
            "losses/aux_value_loss": aux_losses[-1, -1],
            "losses/kl_clone": kls[-1, -1],
        }

    def ppg_cycle(rs: RunnerState):
        def policy_iter(rs, _):
            rs, (obs, returns), metrics = policy_update(rs)
            # Aux storage: reduced precision (cfg.aux_store_dtype — bf16
            # halves HBM and the aux MSE/KL tolerates it; int8 halves it
            # again and is exact for integer-valued obs) and FLAT trailing
            # dim (a (..., C, 84, 84) minor layout tiles to ~1.6x its
            # logical size on TPU; a flat minor dim stays dense).
            flat = obs.astype(jnp.dtype(cfg.aux_store_dtype)).reshape(
                obs.shape[:2] + (-1,)
            )
            return rs, (flat, returns, metrics)

        rs, (all_obs, all_returns, metrics) = jax.lax.scan(
            policy_iter, rs, None, length=cfg.n_iteration
        )
        obs_shape = env.observation_space.shape
        # Flatten storage (n_iteration, T, N, F) -> (n_it*T*N, F)
        aux_obs = all_obs.reshape((-1, all_obs.shape[-1]))
        aux_returns = all_returns.reshape(-1)
        # Old-policy logits CHUNKED through lax.map: a single apply over the
        # whole aux buffer materializes (n_it*T*N, 84, 84, C) conv
        # activations (59 GB at procmaze defaults — OOM on one v5e).
        chunked = aux_obs.reshape(
            (cfg.num_aux_minibatches, -1) + aux_obs.shape[1:]
        )
        old_logits = jax.lax.map(
            lambda o: model.apply(
                rs.train_state.params,
                o.reshape((o.shape[0],) + obs_shape).astype(jnp.float32),
            )[0],
            chunked,
        )
        old_logits = old_logits.reshape((-1,) + old_logits.shape[2:])
        old_logits = jax.lax.stop_gradient(old_logits)
        rs, aux_metrics = aux_phase(
            rs, aux_obs, aux_returns, old_logits, obs_shape
        )
        metrics = jax.tree_util.tree_map(lambda m: m[-1], metrics)
        metrics.update(aux_metrics)
        return rs, metrics

    return init_runner, ppg_cycle
