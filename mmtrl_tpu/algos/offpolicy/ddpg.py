"""DDPG — the reference's cleanrl/ddpg_continuous_action(_jax).py.

Scanned device loop: exploration-noised actor rollout into the device
buffer; per eligible step one critic update, and every policy_frequency
steps an actor update + polyak target sync (the reference's jitted
update_critic/update_actor pair, ddpg_continuous_action_jax.py:181-214).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training.train_state import TrainState

from mmtrl_tpu.algos.offpolicy.common import (
    AlgoParts,
    OffPolicyRunner,
    make_chunk_fn,
)
from mmtrl_tpu.core.metrics import EpisodeStatistics
from mmtrl_tpu.data.buffers import ReplayBuffer
from mmtrl_tpu.envs.base import Environment


@dataclasses.dataclass
class DDPGConfig:
    total_timesteps: int = 1_000_000
    learning_rate: float = 3e-4
    num_envs: int = 1
    buffer_size: int = 131_072
    gamma: float = 0.99
    tau: float = 0.005
    batch_size: int = 256
    exploration_noise: float = 0.1
    learning_starts: int = 25_000
    policy_frequency: int = 2
    steps_per_iteration: int = 512

    @property
    def num_iterations(self) -> int:
        return self.total_timesteps // (self.steps_per_iteration * self.num_envs)


class ACTrainState(TrainState):
    target_params: Any = None


@struct.dataclass
class DDPGState:
    actor: ACTrainState
    critic: ACTrainState


def make_ddpg(env: Environment, actor_model, critic_model, cfg: DDPGConfig):
    a_low = jnp.asarray(env.action_space.low)
    a_high = jnp.asarray(env.action_space.high)

    def init_runner(key: jax.Array) -> OffPolicyRunner:
        key, k_env, k_a, k_c = jax.random.split(key, 4)
        obs, env_state = env.v_reset(jax.random.split(k_env, cfg.num_envs))
        a_params = actor_model.init(k_a, obs)
        example_action = jnp.zeros(env.action_space.shape, jnp.float32)
        c_params = critic_model.init(k_c, obs, example_action[None])
        actor = ACTrainState.create(
            apply_fn=actor_model.apply, params=a_params, target_params=a_params,
            tx=optax.adam(cfg.learning_rate),
        )
        critic = ACTrainState.create(
            apply_fn=critic_model.apply, params=c_params, target_params=c_params,
            tx=optax.adam(cfg.learning_rate),
        )
        example = dict(
            obs=obs[0], action=example_action, reward=jnp.float32(0),
            next_obs=obs[0], done=jnp.float32(0),
        )
        buffer = ReplayBuffer.create(example, cfg.buffer_size)
        return OffPolicyRunner(
            train_state=DDPGState(actor=actor, critic=critic),
            buffer=buffer,
            env_state=env_state,
            obs=obs,
            global_step=jnp.zeros((), jnp.int32),
            stats=EpisodeStatistics.create(cfg.num_envs),
            key=key,
        )

    def update_critic(state: DDPGState, batch):
        next_a = actor_model.apply(state.actor.target_params, batch["next_obs"])
        q_next = critic_model.apply(
            state.critic.target_params, batch["next_obs"], next_a
        )
        target = batch["reward"] + cfg.gamma * (1.0 - batch["done"]) * q_next

        def loss_fn(params):
            q = critic_model.apply(params, batch["obs"], batch["action"])
            return ((q - target) ** 2).mean(), q.mean()

        (loss, q_mean), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.critic.params
        )
        return state.replace(critic=state.critic.apply_gradients(grads=grads)), loss, q_mean

    def update_actor(state: DDPGState, batch):
        def loss_fn(params):
            a = actor_model.apply(params, batch["obs"])
            return -critic_model.apply(state.critic.params, batch["obs"], a).mean()

        loss, grads = jax.value_and_grad(loss_fn)(state.actor.params)
        actor = state.actor.apply_gradients(grads=grads)
        actor = actor.replace(
            target_params=optax.incremental_update(
                actor.params, actor.target_params, cfg.tau
            )
        )
        critic = state.critic.replace(
            target_params=optax.incremental_update(
                state.critic.params, state.critic.target_params, cfg.tau
            )
        )
        return state.replace(actor=actor, critic=critic), loss

    def insert_update(state, buffer, global_step, transition, keys):
        """Buffer insert + the reference's update cadence; shared verbatim by
        step_fn and the host-loop chunk path (common.make_chunk_fn)."""
        (k_sample,) = keys
        buffer = buffer.add_batch(transition, cfg.num_envs)
        global_step = global_step + cfg.num_envs

        def do_updates(state):
            batch = buffer.sample(k_sample, cfg.batch_size)
            state, c_loss, q_mean = update_critic(state, batch)
            step_idx = global_step // cfg.num_envs
            state, a_loss = jax.lax.cond(
                step_idx % cfg.policy_frequency == 0,
                lambda s: update_actor(s, batch),
                lambda s: (s, jnp.float32(0)),
                state,
            )
            return state, c_loss, a_loss, q_mean

        state, c_loss, a_loss, q_mean = jax.lax.cond(
            global_step > cfg.learning_starts,
            do_updates,
            lambda s: (s, jnp.float32(0), jnp.float32(0), jnp.float32(0)),
            state,
        )
        metrics = {
            "losses/qf1_loss": c_loss,
            "losses/actor_loss": a_loss,
            "losses/qf1_values": q_mean,
        }
        return state, buffer, global_step, metrics

    scale = (a_high - a_low) / 2.0

    def act_explore(params, obs, key):
        a_det = actor_model.apply(params, obs)
        noise = jax.random.normal(key, a_det.shape) * cfg.exploration_noise * scale
        return jnp.clip(a_det + noise, a_low, a_high)

    def step_fn(runner: OffPolicyRunner, _):
        key, k_noise, k_rand, k_step, k_sample = jax.random.split(runner.key, 5)
        state: DDPGState = runner.train_state
        a_noised = act_explore(state.actor.params, runner.obs, k_noise)
        a_random = jax.random.uniform(
            k_rand, a_noised.shape, minval=a_low, maxval=a_high
        )
        warmup = runner.global_step < cfg.learning_starts
        action = jnp.where(warmup, a_random, a_noised)

        next_obs, env_state, reward, done, info = env.v_step(
            jax.random.split(k_step, cfg.num_envs), runner.env_state, action
        )
        stats = runner.stats.update(reward, done)
        # SB3 handle_timeout_termination semantics (the reference's replay
        # path): bootstrap through time-limit truncation, and store the TRUE
        # post-transition observation (pre-auto-reset).
        truncated = info.get("truncated", jnp.zeros_like(done))
        store_done = (done & ~truncated).astype(jnp.float32)
        store_next_obs = info.get("final_obs", next_obs)
        state, buffer, global_step, metrics = insert_update(
            state,
            runner.buffer,
            runner.global_step,
            dict(
                obs=runner.obs, action=action, reward=reward,
                next_obs=store_next_obs, done=store_done,
            ),
            (k_sample,),
        )
        runner = runner.replace(
            train_state=state, buffer=buffer, env_state=env_state, obs=next_obs,
            global_step=global_step, stats=stats, key=key,
        )
        return runner, metrics

    def train_iteration(runner: OffPolicyRunner):
        runner, ms = jax.lax.scan(
            step_fn, runner, None, length=cfg.steps_per_iteration
        )
        return runner, jax.tree_util.tree_map(lambda x: x[-1], ms)

    return AlgoParts(
        init_runner,
        train_iteration,
        chunk_fn=make_chunk_fn(insert_update, 1),
        act_explore=act_explore,
        act_greedy=lambda p, obs: actor_model.apply(p, obs),
        actor_params=lambda st: st.actor.params,
    )
