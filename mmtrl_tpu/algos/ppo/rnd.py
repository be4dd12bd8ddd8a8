"""PPO + Random Network Distillation — the reference's cleanrl/ppo_rnd_envpool.py.

Curiosity: a fixed random target network and a trained predictor network;
intrinsic reward = their prediction error on running-normalized observations
(reference :361-369).  Dual value heads with separate gammas; intrinsic
returns are non-episodic.  RunningMeanStd obs/reward normalization
(reference :298-299) and the RewardForwardFilter discounted-forward filter
(reference :231-236) live in the runner carry as fixed-shape stats.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training.train_state import TrainState

from mmtrl_tpu.algos.ppo.core import PPOConfig, _make_optimizer
from mmtrl_tpu.core.metrics import EpisodeStatistics
from mmtrl_tpu.envs.base import Environment
from mmtrl_tpu.envs.wrappers import RunningStat
from mmtrl_tpu.models.common import AtariTower, MLPTower, ZEROS, ortho
from mmtrl_tpu.models.distributions import (
    categorical_entropy,
    categorical_log_prob,
    categorical_sample,
)
from mmtrl_tpu.ops.gae import compute_gae


@dataclasses.dataclass
class RNDConfig(PPOConfig):
    int_coef: float = 1.0
    ext_coef: float = 2.0
    int_gamma: float = 0.99
    update_proportion: float = 0.25  # fraction of batch used for predictor loss


class RNDAgent(nn.Module):
    """Policy with dual value heads (ext + int), image or vector obs."""

    num_actions: int
    input_scale: float = 1.0

    @nn.compact
    def __call__(self, obs: jnp.ndarray):
        if obs.ndim >= 4:
            feat = AtariTower("big", name="network")(
                jnp.moveaxis(obs / self.input_scale, -3, -1)
            )
        else:
            feat = MLPTower((64, 64), name="network")(obs)
        logits = nn.Dense(
            self.num_actions, kernel_init=ortho(0.01), bias_init=ZEROS, name="actor"
        )(feat)
        v_ext = nn.Dense(1, kernel_init=ortho(0.01), bias_init=ZEROS, name="critic_ext")(
            feat
        )[..., 0]
        v_int = nn.Dense(1, kernel_init=ortho(0.01), bias_init=ZEROS, name="critic_int")(
            feat
        )[..., 0]
        return logits, v_ext, v_int


class RNDNetwork(nn.Module):
    """Target/predictor embedding network (reference RNDModel:183-226)."""

    out_dim: int = 256
    predictor: bool = False  # predictor gets extra MLP depth

    @nn.compact
    def __call__(self, obs: jnp.ndarray):
        if obs.ndim >= 4:
            x = AtariTower("small", name="trunk")(jnp.moveaxis(obs, -3, -1))
        else:
            x = MLPTower((64, 64), activation="relu", name="trunk")(obs)
        if self.predictor:
            x = nn.relu(nn.Dense(256, kernel_init=ortho(), bias_init=ZEROS)(x))
        return nn.Dense(self.out_dim, kernel_init=ortho(), bias_init=ZEROS)(x)


@struct.dataclass
class RNDRunner:
    train_state: TrainState
    predictor_state: TrainState
    target_params: Any
    env_state: Any
    obs: jnp.ndarray
    done: jnp.ndarray
    obs_stat: RunningStat
    reward_stat: RunningStat
    forward_filter: jnp.ndarray  # (N,) discounted intrinsic-reward filter
    stats: EpisodeStatistics
    key: jax.Array


def make_rnd_ppo(env: Environment, model: RNDAgent, cfg: RNDConfig):
    rnd_target = RNDNetwork(predictor=False)
    rnd_predictor = RNDNetwork(predictor=True)
    obs_shape = env.observation_space.shape

    def init_runner(key: jax.Array) -> RNDRunner:
        key, k_env, k_model, k_t, k_p = jax.random.split(key, 5)
        obs, env_state = env.v_reset(jax.random.split(k_env, cfg.num_envs))
        params = model.init(k_model, obs)
        ts = TrainState.create(
            apply_fn=model.apply, params=params, tx=_make_optimizer(cfg)
        )
        pred = TrainState.create(
            apply_fn=rnd_predictor.apply,
            params=rnd_predictor.init(k_p, obs),
            tx=optax.adam(cfg.learning_rate, eps=1e-5),
        )
        return RNDRunner(
            train_state=ts,
            predictor_state=pred,
            target_params=rnd_target.init(k_t, obs),
            env_state=env_state,
            obs=obs,
            done=jnp.zeros(cfg.num_envs, dtype=bool),
            obs_stat=RunningStat.create(obs_shape),
            reward_stat=RunningStat.create(()),
            forward_filter=jnp.zeros(cfg.num_envs),
            stats=EpisodeStatistics.create(cfg.num_envs),
            key=key,
        )

    def intrinsic_reward(rs: RNDRunner, obs: jnp.ndarray) -> jnp.ndarray:
        norm_obs = jnp.clip(rs.obs_stat.normalize(obs), -5.0, 5.0)
        target = rnd_target.apply(rs.target_params, norm_obs)
        pred = rnd_predictor.apply(rs.predictor_state.params, norm_obs)
        return ((target - pred) ** 2).sum(-1) / 2.0

    def _rollout_step(rs: RNDRunner, _):
        key, k_act, k_step = jax.random.split(rs.key, 3)
        logits, v_ext, v_int = model.apply(rs.train_state.params, rs.obs)
        action = categorical_sample(k_act, logits)
        logprob = categorical_log_prob(logits, action)
        next_obs, env_state, reward, done, _ = env.v_step(
            jax.random.split(k_step, cfg.num_envs), rs.env_state, action
        )
        int_rew = intrinsic_reward(rs, next_obs)
        stats = rs.stats.update(reward, done)
        out = (rs.obs, action, logprob, reward, int_rew, rs.done, v_ext, v_int, next_obs)
        rs = rs.replace(
            env_state=env_state, obs=next_obs, done=done, stats=stats, key=key
        )
        return rs, out

    def train_iteration(rs: RNDRunner):
        rs, (obs, actions, logprobs, rewards, int_rewards, dones, v_ext, v_int, next_obses) = (
            jax.lax.scan(_rollout_step, rs, None, length=cfg.num_steps)
        )
        # Update obs normalization from this rollout, and normalize intrinsic
        # rewards by the std of the discounted forward filter (reference
        # RewardForwardFilter + RunningMeanStd, :231-236,361-369).
        obs_stat = rs.obs_stat.update(obs.reshape((-1,) + obs.shape[2:]))

        def ff_step(filt, r):
            filt = filt * cfg.int_gamma + r
            return filt, filt

        forward_filter, ff_series = jax.lax.scan(
            ff_step, rs.forward_filter, int_rewards
        )
        reward_stat = rs.reward_stat.update(ff_series.reshape(-1))
        int_rewards = int_rewards / jnp.sqrt(reward_stat.var + 1e-8)

        _, next_v_ext, next_v_int = model.apply(rs.train_state.params, rs.obs)
        ext_adv, ext_ret = compute_gae(
            jnp.sign(rewards) if cfg.clip_rewards else rewards,
            v_ext, dones, next_v_ext, rs.done, cfg.gamma, cfg.gae_lambda,
        )
        # Intrinsic stream is non-episodic: dones are zeros.
        zeros = jnp.zeros_like(dones)
        int_adv, int_ret = compute_gae(
            int_rewards, v_int, zeros, next_v_int,
            jnp.zeros_like(rs.done), cfg.int_gamma, cfg.gae_lambda,
        )
        advantages = ext_adv * cfg.ext_coef + int_adv * cfg.int_coef

        def flat(x):
            return x.reshape((cfg.batch_size,) + x.shape[2:])

        norm_next = jnp.clip(
            obs_stat.normalize(flat(next_obses)), -5.0, 5.0
        )
        batch = tuple(
            map(flat, (obs, actions, logprobs, advantages, ext_ret, int_ret))
        ) + (norm_next,)

        def loss_fn(params, pred_params, mb, key_mask):
            b_obs, b_act, b_logp, b_adv, b_eret, b_iret, b_norm_next = mb
            logits, newv_ext, newv_int = model.apply(params, b_obs)
            newlogprob = categorical_log_prob(logits, b_act)
            entropy = categorical_entropy(logits)
            adv = (b_adv - b_adv.mean()) / (b_adv.std() + 1e-8) if cfg.norm_adv else b_adv
            ratio = jnp.exp(newlogprob - b_logp)
            pg = jnp.maximum(
                -adv * ratio,
                -adv * jnp.clip(ratio, 1 - cfg.clip_coef, 1 + cfg.clip_coef),
            ).mean()
            v_loss = 0.5 * (
                ((newv_ext - b_eret) ** 2).mean() + ((newv_int - b_iret) ** 2).mean()
            )
            # Predictor distillation on a random subset (reference :374-380).
            target = jax.lax.stop_gradient(
                rnd_target.apply(rs.target_params, b_norm_next)
            )
            pred = rnd_predictor.apply(pred_params, b_norm_next)
            fwd_err = ((pred - target) ** 2).mean(-1)
            mask = (
                jax.random.uniform(key_mask, fwd_err.shape) < cfg.update_proportion
            ).astype(jnp.float32)
            fwd_loss = (fwd_err * mask).sum() / jnp.maximum(mask.sum(), 1.0)
            loss = (
                pg - cfg.ent_coef * entropy.mean() + v_loss * cfg.vf_coef + fwd_loss
            )
            return loss, (pg, v_loss, fwd_loss, entropy.mean())

        def minibatch_step(carry, mb):
            ts, pred, key = carry
            key, k_mask = jax.random.split(key)
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(ts.params, pred.params, mb, k_mask)
            ts = ts.apply_gradients(grads=grads[0])
            pred = pred.apply_gradients(grads=grads[1])
            return (ts, pred, key), aux

        def epoch_step(carry, _):
            ts, pred, key = carry
            key, k_perm = jax.random.split(key)
            perm = jax.random.permutation(k_perm, cfg.batch_size)
            shuffled = jax.tree_util.tree_map(
                lambda x: x[perm].reshape(
                    (cfg.num_minibatches, cfg.minibatch_size) + x.shape[1:]
                ),
                batch,
            )
            (ts, pred, key), aux = jax.lax.scan(
                minibatch_step, (ts, pred, key), shuffled
            )
            return (ts, pred, key), aux

        (ts, pred, key), (pg, v_loss, fwd_loss, entropy) = jax.lax.scan(
            epoch_step,
            (rs.train_state, rs.predictor_state, rs.key),
            None,
            length=cfg.update_epochs,
        )
        rs = rs.replace(
            train_state=ts,
            predictor_state=pred,
            obs_stat=obs_stat,
            reward_stat=reward_stat,
            forward_filter=forward_filter,
            key=key,
        )
        return rs, {
            "losses/policy_loss": pg[-1, -1],
            "losses/value_loss": v_loss[-1, -1],
            "losses/fwd_loss": fwd_loss[-1, -1],
            "losses/entropy": entropy[-1, -1],
            "charts/mean_int_reward": int_rewards.mean(),
        }

    return init_runner, train_iteration
