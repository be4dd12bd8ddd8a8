"""Scan-structured PPO: one jitted program per training iteration.

The reference's canonical loop (src/train.py:137-258, generalized by its own
XLA path cleanrl/ppo_atari_envpool_xla_jax_scan.py) becomes three fused
stages inside ONE jitted `train_iteration`:

  rollout     — lax.scan over num_steps; env step, action sample, episode
                stats all on device (no host boundary per step)
  gae         — reverse lax.scan (ops/gae.py)
  update      — lax.scan over epochs of lax.scan over minibatches, with a
                fresh permutation per epoch

Three variants share the machinery:
- make_ppo:            feedforward discrete agents (MLP / CNN); minibatches
                       are permutations of the flattened (T*N) batch
- make_recurrent_ppo:  LSTM agents; minibatches are permutations of ENV
                       INDICES so sequences stay intact and the recurrence
                       is replayed from the rollout's initial carry —
                       the reference's sequence-preserving scheme
                       (src/train.py:200-218) in scanned form
- make_continuous_ppo: diagonal-Gaussian policies, optional RPO mean noise
                       (cleanrl/rpo_continuous_action.py:108-140)

Data parallelism: run the returned functions under a Mesh with the env/batch
dimension sharded on the ``data`` axis and params replicated — XLA inserts
the gradient all-reduce over ICI (replaces ppo_atari_multigpu.py's
torch.distributed flatten-allreduce, reference :345-359).

Learning-rate annealing matches the reference's per-update linear decay
(src/train.py:139-143) computed from the optimizer step count like its XLA
path does (ppo_atari_envpool_xla_jax.py:239-249).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training.train_state import TrainState

from mmtrl_tpu.core.metrics import EpisodeStatistics
from mmtrl_tpu.envs.base import Environment
from mmtrl_tpu.models.distributions import (
    categorical_entropy,
    categorical_log_prob,
    categorical_sample,
    normal_entropy,
    normal_log_prob,
    normal_sample,
)
from mmtrl_tpu.ops.gae import compute_gae


@dataclasses.dataclass
class PPOConfig:
    total_timesteps: int = 500_000
    learning_rate: float = 2.5e-4
    num_envs: int = 4
    num_steps: int = 128
    anneal_lr: bool = True
    gamma: float = 0.99
    gae_lambda: float = 0.95
    num_minibatches: int = 4
    update_epochs: int = 4
    norm_adv: bool = True
    clip_coef: float = 0.2
    clip_vloss: bool = True
    ent_coef: float = 0.01
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    clip_rewards: bool = False  # sign-clip like SB3 ClipRewardEnv
    rpo_alpha: float = 0.0  # >0 enables RPO mean perturbation
    target_kl: Optional[float] = None  # early-stop epochs past this KL

    @property
    def batch_size(self) -> int:
        return self.num_envs * self.num_steps

    @property
    def minibatch_size(self) -> int:
        return self.batch_size // self.num_minibatches

    @property
    def num_updates(self) -> int:
        return self.total_timesteps // self.batch_size

    @property
    def opt_steps_per_update(self) -> int:
        """Optimizer steps per train_iteration — the LR anneal quantum and
        the resume-time update-counter divisor (restored train_state.step //
        this = updates already done)."""
        return self.num_minibatches * self.update_epochs


@struct.dataclass
class RunnerState:
    train_state: TrainState
    env_state: Any
    obs: jnp.ndarray  # (N, ...) current observation
    done: jnp.ndarray  # (N,) done preceding current obs
    carry: Any  # LSTM carry or None-placeholder
    stats: EpisodeStatistics
    key: jax.Array


def _make_optimizer(cfg: PPOConfig) -> optax.GradientTransformation:
    if cfg.anneal_lr:
        steps_per_update = cfg.opt_steps_per_update

        def schedule(count):
            frac = 1.0 - (count // steps_per_update) / cfg.num_updates
            return cfg.learning_rate * frac

    else:
        schedule = cfg.learning_rate
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(learning_rate=schedule, eps=1e-5),
    )


def _maybe_clip(cfg: PPOConfig, reward: jnp.ndarray) -> jnp.ndarray:
    return jnp.sign(reward) if cfg.clip_rewards else reward


def _ppo_loss(
    cfg: PPOConfig,
    newlogprob: jnp.ndarray,
    entropy: jnp.ndarray,
    newvalue: jnp.ndarray,
    logprob_old: jnp.ndarray,
    advantages: jnp.ndarray,
    returns: jnp.ndarray,
    values_old: jnp.ndarray,
):
    """Clip objective + clipped value loss + entropy bonus
    (reference: src/train.py:232-253)."""
    logratio = newlogprob - logprob_old
    ratio = jnp.exp(logratio)
    approx_kl = ((ratio - 1.0) - logratio).mean()

    if cfg.norm_adv:
        advantages = (advantages - advantages.mean()) / (advantages.std() + 1e-8)

    pg_loss1 = -advantages * ratio
    pg_loss2 = -advantages * jnp.clip(ratio, 1 - cfg.clip_coef, 1 + cfg.clip_coef)
    pg_loss = jnp.maximum(pg_loss1, pg_loss2).mean()

    if cfg.clip_vloss:
        v_clipped = values_old + jnp.clip(
            newvalue - values_old, -cfg.clip_coef, cfg.clip_coef
        )
        v_loss = 0.5 * jnp.maximum(
            (newvalue - returns) ** 2, (v_clipped - returns) ** 2
        ).mean()
    else:
        v_loss = 0.5 * ((newvalue - returns) ** 2).mean()

    entropy_loss = entropy.mean()
    loss = pg_loss - cfg.ent_coef * entropy_loss + v_loss * cfg.vf_coef
    clipfrac = (jnp.abs(ratio - 1.0) > cfg.clip_coef).astype(jnp.float32).mean()
    metrics = {
        "losses/policy_loss": pg_loss,
        "losses/value_loss": v_loss,
        "losses/entropy": entropy_loss,
        "losses/approx_kl": approx_kl,
        "losses/clipfrac": clipfrac,
    }
    return loss, metrics


def _explained_variance(values: jnp.ndarray, returns: jnp.ndarray) -> jnp.ndarray:
    var_y = jnp.var(returns)
    return jnp.where(var_y == 0, jnp.nan, 1 - jnp.var(returns - values) / var_y)


def _kl_epoch_scan(cfg: PPOConfig, epoch_body, init_carry, length):
    """Scan epochs with in-jit target-KL early stopping (the reference's
    per-epoch `break` at src/train.py via --target-kl): once an epoch's mean
    approx_kl exceeds the target, later epochs keep the old train state."""

    def wrapped(carry, _):
        ts, key, stop = carry
        (new_ts, key), metrics = epoch_body((ts, key))
        if cfg.target_kl is not None:
            ts = jax.tree_util.tree_map(
                lambda old, new: jnp.where(stop, old, new), ts, new_ts
            )
            stop = stop | (metrics["losses/approx_kl"][-1] > cfg.target_kl)
        else:
            ts = new_ts
        return (ts, key, stop), metrics

    init = (init_carry[0], init_carry[1], jnp.zeros((), bool))
    (ts, key, _), metrics = jax.lax.scan(wrapped, init, None, length=length)
    return (ts, key), metrics


# =============================================================================
# Feedforward discrete PPO
# =============================================================================
def make_ppo(env: Environment, model, cfg: PPOConfig):
    """Returns (init_runner, train_iteration), both jittable.

    ``model.apply(params, obs) -> (logits, value)``.
    """

    def init_runner(key: jax.Array, params=None) -> RunnerState:
        key, k_env, k_model = jax.random.split(key, 3)
        obs, env_state = env.v_reset(jax.random.split(k_env, cfg.num_envs))
        if params is None:
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

    def _rollout_step(carry, _):
        rs = carry
        key, k_act, k_step = jax.random.split(rs.key, 3)
        logits, value = model.apply(rs.train_state.params, rs.obs)
        action = categorical_sample(k_act, logits)
        logprob = categorical_log_prob(logits, action)
        next_obs, env_state, reward, done, info = env.v_step(
            jax.random.split(k_step, cfg.num_envs), rs.env_state, action
        )
        # Episode stats use the RAW reward when a reward-transforming
        # wrapper reports one (the reference's RecordEpisodeStatistics sits
        # UNDER NormalizeReward/ClipReward, src/train.py:52-57).
        stats = rs.stats.update(info.get("raw_reward", reward), done)
        transition = (rs.obs, action, logprob, _maybe_clip(cfg, reward), rs.done, value)
        rs = rs.replace(
            env_state=env_state, obs=next_obs, done=done, stats=stats, key=key
        )
        return rs, transition

    def train_iteration(rs: RunnerState):
        rs, (obs, actions, logprobs, rewards, dones, values) = jax.lax.scan(
            _rollout_step, rs, None, length=cfg.num_steps
        )
        _, next_value = model.apply(rs.train_state.params, rs.obs)
        advantages, returns = compute_gae(
            rewards, values, dones, next_value, rs.done, cfg.gamma, cfg.gae_lambda
        )

        # Flatten time x env, then scanned epochs of scanned minibatches.
        def flat(x):
            return x.reshape((cfg.batch_size,) + x.shape[2:])

        batch = tuple(map(flat, (obs, actions, logprobs, advantages, returns, values)))

        def loss_fn(params, mb):
            b_obs, b_act, b_logp, b_adv, b_ret, b_val = mb
            logits, newvalue = model.apply(params, b_obs)
            newlogprob = categorical_log_prob(logits, b_act)
            entropy = categorical_entropy(logits)
            return _ppo_loss(
                cfg, newlogprob, entropy, newvalue, b_logp, b_adv, b_ret, b_val
            )

        def minibatch_step(ts, mb):
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
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

        (ts, key), metrics = _kl_epoch_scan(
            cfg,
            lambda c: epoch_step(c, None),
            (rs.train_state, rs.key),
            cfg.update_epochs,
        )
        metrics = jax.tree_util.tree_map(lambda m: m[-1, -1], metrics)
        metrics["losses/explained_variance"] = _explained_variance(
            values.reshape(-1), returns.reshape(-1)
        )
        rs = rs.replace(train_state=ts, key=key)
        return rs, metrics

    return init_runner, train_iteration


# =============================================================================
# Recurrent (LSTM) PPO — multimodal & single-tower agents
# =============================================================================
def make_recurrent_ppo(env: Environment, model, cfg: PPOConfig):
    """``model.apply(params, obs (T,B,...), done (T,B), carry) ->
    (logits, value, carry)``; minibatching is over env indices so each
    minibatch replays full sequences from the rollout's initial carry
    (reference: src/train.py:200-218)."""
    assert cfg.num_envs % cfg.num_minibatches == 0, (
        "recurrent PPO needs num_envs divisible by num_minibatches "
        "(sequence-preserving minibatches)"
    )
    envs_per_batch = cfg.num_envs // cfg.num_minibatches

    def init_runner(key: jax.Array, params=None) -> RunnerState:
        key, k_env, k_model = jax.random.split(key, 3)
        obs, env_state = env.v_reset(jax.random.split(k_env, cfg.num_envs))
        carry = model.initial_carry(cfg.num_envs)
        done = jnp.zeros(cfg.num_envs, dtype=bool)
        if params is None:
            params = model.init(k_model, obs[None], done[None], carry)
        ts = TrainState.create(
            apply_fn=model.apply, params=params, tx=_make_optimizer(cfg)
        )
        return RunnerState(
            train_state=ts,
            env_state=env_state,
            obs=obs,
            done=done,
            carry=carry,
            stats=EpisodeStatistics.create(cfg.num_envs),
            key=key,
        )

    def _rollout_step(carry, _):
        rs = carry
        key, k_act, k_step = jax.random.split(rs.key, 3)
        logits, value, new_carry = model.apply(
            rs.train_state.params, rs.obs[None], rs.done[None], rs.carry
        )
        logits, value = logits[0], value[0]
        action = categorical_sample(k_act, logits)
        logprob = categorical_log_prob(logits, action)
        next_obs, env_state, reward, done, info = env.v_step(
            jax.random.split(k_step, cfg.num_envs), rs.env_state, action
        )
        # Episode stats use the RAW reward when a reward-transforming
        # wrapper reports one (the reference's RecordEpisodeStatistics sits
        # UNDER NormalizeReward/ClipReward, src/train.py:52-57).
        stats = rs.stats.update(info.get("raw_reward", reward), done)
        transition = (rs.obs, action, logprob, _maybe_clip(cfg, reward), rs.done, value)
        rs = rs.replace(
            env_state=env_state,
            obs=next_obs,
            done=done,
            carry=new_carry,
            stats=stats,
            key=key,
        )
        return rs, transition

    def update_from_rollout(rs: RunnerState, initial_carry, rollout):
        """PPO update from a completed rollout; shared by the fused device
        path (train_iteration) and the host-loop ROM path
        (algos/ppo/hostloop.py), so the update math cannot diverge.
        ``rs`` carries the post-rollout (obs, done, carry) for the value
        bootstrap; ``rollout`` leaves are time-major (T, N, ...)."""
        obs, actions, logprobs, rewards, dones, values = rollout
        _, next_value, _ = model.apply(
            rs.train_state.params, rs.obs[None], rs.done[None], rs.carry
        )
        advantages, returns = compute_gae(
            rewards, values, dones, next_value[0], rs.done, cfg.gamma, cfg.gae_lambda
        )

        def loss_fn(params, mb):
            b_obs, b_done, b_carry, b_act, b_logp, b_adv, b_ret, b_val = mb
            logits, newvalue, _ = model.apply(params, b_obs, b_done, b_carry)
            newlogprob = categorical_log_prob(logits, b_act)
            entropy = categorical_entropy(logits)
            return _ppo_loss(
                cfg,
                newlogprob.reshape(-1),
                entropy.reshape(-1),
                newvalue.reshape(-1),
                b_logp.reshape(-1),
                b_adv.reshape(-1),
                b_ret.reshape(-1),
                b_val.reshape(-1),
            )

        def minibatch_step(ts, mb):
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                ts.params, mb
            )
            return ts.apply_gradients(grads=grads), metrics

        def epoch_step(carry, _):
            ts, key = carry
            key, k_perm = jax.random.split(key)
            perm = jax.random.permutation(k_perm, cfg.num_envs).reshape(
                cfg.num_minibatches, envs_per_batch
            )
            # Gather each minibatch's envs along axis 1 (time-major data)
            # and its slice of the rollout's initial LSTM carry.
            mb = (
                obs[:, perm].swapaxes(0, 1),  # (MB, T, E, ...)
                dones[:, perm].swapaxes(0, 1),
                jax.tree_util.tree_map(lambda c: c[perm], initial_carry),
                actions[:, perm].swapaxes(0, 1),
                logprobs[:, perm].swapaxes(0, 1),
                advantages[:, perm].swapaxes(0, 1),
                returns[:, perm].swapaxes(0, 1),
                values[:, perm].swapaxes(0, 1),
            )
            ts, metrics = jax.lax.scan(minibatch_step, ts, mb)
            return (ts, key), metrics

        (ts, key), metrics = _kl_epoch_scan(
            cfg,
            lambda c: epoch_step(c, None),
            (rs.train_state, rs.key),
            cfg.update_epochs,
        )
        metrics = jax.tree_util.tree_map(lambda m: m[-1, -1], metrics)
        metrics["losses/explained_variance"] = _explained_variance(
            values.reshape(-1), returns.reshape(-1)
        )
        rs = rs.replace(train_state=ts, key=key)
        return rs, metrics

    def train_iteration(rs: RunnerState):
        initial_carry = rs.carry
        rs, rollout = jax.lax.scan(
            _rollout_step, rs, None, length=cfg.num_steps
        )
        return update_from_rollout(rs, initial_carry, rollout)

    def policy_step(params, obs, done, carry, key):
        """One behavior-policy step (host-loop rollout building block)."""
        logits, value, new_carry = model.apply(
            params, obs[None], done[None], carry
        )
        action = categorical_sample(key, logits[0])
        logprob = categorical_log_prob(logits[0], action)
        return action, logprob, value[0], new_carry

    from mmtrl_tpu.algos.offpolicy.common import AlgoParts

    return AlgoParts(
        init_runner,
        train_iteration,
        update_from_rollout=update_from_rollout,
        policy_step=policy_step,
        maybe_clip=lambda r: _maybe_clip(cfg, r),
    )


# =============================================================================
# Continuous-action PPO (diagonal Gaussian, optional RPO)
# =============================================================================
def make_continuous_ppo(env: Environment, model, cfg: PPOConfig):
    """``model.apply(params, obs) -> (mean, log_std, value)``."""

    def init_runner(key: jax.Array, params=None) -> RunnerState:
        key, k_env, k_model = jax.random.split(key, 3)
        obs, env_state = env.v_reset(jax.random.split(k_env, cfg.num_envs))
        if params is None:
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

    def _rollout_step(carry, _):
        rs = carry
        key, k_act, k_step = jax.random.split(rs.key, 3)
        mean, log_std, value = model.apply(rs.train_state.params, rs.obs)
        action = normal_sample(k_act, mean, log_std)
        logprob = normal_log_prob(mean, log_std, action)
        next_obs, env_state, reward, done, info = env.v_step(
            jax.random.split(k_step, cfg.num_envs), rs.env_state, action
        )
        # Episode stats use the RAW reward when a reward-transforming
        # wrapper reports one (the reference's RecordEpisodeStatistics sits
        # UNDER NormalizeReward/ClipReward, src/train.py:52-57).
        stats = rs.stats.update(info.get("raw_reward", reward), done)
        transition = (rs.obs, action, logprob, _maybe_clip(cfg, reward), rs.done, value)
        rs = rs.replace(
            env_state=env_state, obs=next_obs, done=done, stats=stats, key=key
        )
        return rs, transition

    def train_iteration(rs: RunnerState):
        rs, (obs, actions, logprobs, rewards, dones, values) = jax.lax.scan(
            _rollout_step, rs, None, length=cfg.num_steps
        )
        _, _, next_value = model.apply(rs.train_state.params, rs.obs)
        advantages, returns = compute_gae(
            rewards, values, dones, next_value, rs.done, cfg.gamma, cfg.gae_lambda
        )

        def flat(x):
            return x.reshape((cfg.batch_size,) + x.shape[2:])

        batch = tuple(map(flat, (obs, actions, logprobs, advantages, returns, values)))

        def loss_fn(params, mb, key):
            b_obs, b_act, b_logp, b_adv, b_ret, b_val = mb
            mean, log_std, newvalue = model.apply(params, b_obs)
            if cfg.rpo_alpha > 0:
                # RPO: perturb the mean uniformly when evaluating stored
                # actions (cleanrl/rpo_continuous_action.py:130-136).
                noise = jax.random.uniform(
                    key, mean.shape, minval=-cfg.rpo_alpha, maxval=cfg.rpo_alpha
                )
                mean = mean + noise
            newlogprob = normal_log_prob(mean, log_std, b_act)
            entropy = normal_entropy(log_std)
            return _ppo_loss(
                cfg, newlogprob, entropy, newvalue, b_logp, b_adv, b_ret, b_val
            )

        def minibatch_step(carry, mb):
            ts, key = carry
            key, k_rpo = jax.random.split(key)
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                ts.params, mb, k_rpo
            )
            return (ts.apply_gradients(grads=grads), key), metrics

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
            (ts, key), metrics = jax.lax.scan(minibatch_step, (ts, key), shuffled)
            return (ts, key), metrics

        (ts, key), metrics = _kl_epoch_scan(
            cfg,
            lambda c: epoch_step(c, None),
            (rs.train_state, rs.key),
            cfg.update_epochs,
        )
        metrics = jax.tree_util.tree_map(lambda m: m[-1, -1], metrics)
        metrics["losses/explained_variance"] = _explained_variance(
            values.reshape(-1), returns.reshape(-1)
        )
        rs = rs.replace(train_state=ts, key=key)
        return rs, metrics

    return init_runner, train_iteration
