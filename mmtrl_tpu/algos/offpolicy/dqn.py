"""DQN, fully on device — the reference's cleanrl/dqn.py / dqn_jax.py.

One jitted iteration scans ``steps_per_iteration`` vectorized env steps;
each step epsilon-greedy acts, stores into the device ring buffer, and —
once past learning_starts, every train_frequency steps — samples a batch
and applies the TD update (MSE against the target network, the jitted
update of dqn_atari_jax.py:186-199).  Target sync every
target_network_frequency steps via lax.cond.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training.train_state import TrainState

from mmtrl_tpu.algos.offpolicy.common import OffPolicyRunner, linear_epsilon
from mmtrl_tpu.core.metrics import EpisodeStatistics
from mmtrl_tpu.data.buffers import PrioritizedReplayBuffer, ReplayBuffer
from mmtrl_tpu.envs.base import Environment


@dataclasses.dataclass
class DQNConfig:
    total_timesteps: int = 500_000
    learning_rate: float = 2.5e-4
    num_envs: int = 1
    buffer_size: int = 10_000
    gamma: float = 0.99
    tau: float = 1.0
    target_network_frequency: int = 500
    batch_size: int = 128
    start_e: float = 1.0
    end_e: float = 0.05
    exploration_fraction: float = 0.5
    learning_starts: int = 10_000
    train_frequency: int = 10
    steps_per_iteration: int = 512  # env steps fused into one jitted call
    # Prioritized replay (Schaul et al.; the reference's
    # PrioritizedReplayBuffer, cleanrl_utils/buffers.py:581)
    prioritized_replay: bool = False
    per_alpha: float = 0.6
    per_beta_start: float = 0.4  # annealed to 1.0 over total_timesteps

    @property
    def num_iterations(self) -> int:
        return self.total_timesteps // (self.steps_per_iteration * self.num_envs)


class DQNTrainState(TrainState):
    target_params: Optional[dict] = None


def dqn_td_update(model, gamma: float, ts: DQNTrainState, batch, weights=None):
    """One TD update (MSE vs target-network max-Q bootstrap) — the jitted
    update of the reference's dqn_atari_jax.py:186-199.  Shared by the
    fused device path (make_dqn) and the host-loop ROM path
    (hostloop_dqn.py) so the math cannot diverge between modes."""
    q_next = model.apply(ts.target_params, batch["next_obs"])  # (B, A)
    td_target = batch["reward"] + gamma * (1.0 - batch["done"]) * q_next.max(
        axis=-1
    )

    def loss_fn(params):
        q = model.apply(params, batch["obs"])
        q_a = jnp.take_along_axis(
            q, batch["action"][:, None].astype(jnp.int32), axis=-1
        )[:, 0]
        td_error = q_a - td_target
        per_sample = td_error**2
        if weights is not None:  # PER importance-sampling correction
            per_sample = per_sample * weights
        return per_sample.mean(), (q_a.mean(), jnp.abs(td_error))

    (loss, (q_mean, td_abs)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(ts.params)
    return ts.apply_gradients(grads=grads), loss, q_mean, td_abs


def make_dqn(env: Environment, model, cfg: DQNConfig):
    def init_runner(key: jax.Array) -> OffPolicyRunner:
        key, k_env, k_model = jax.random.split(key, 3)
        obs, env_state = env.v_reset(jax.random.split(k_env, cfg.num_envs))
        params = model.init(k_model, obs)
        ts = DQNTrainState.create(
            apply_fn=model.apply,
            params=params,
            target_params=params,
            tx=optax.adam(cfg.learning_rate),
        )
        example = dict(
            obs=obs[0],
            action=jnp.int32(0),
            reward=jnp.float32(0),
            next_obs=obs[0],
            done=jnp.float32(0),
        )
        if cfg.prioritized_replay:
            buffer = PrioritizedReplayBuffer.create(
                example, cfg.buffer_size, alpha=cfg.per_alpha
            )
        else:
            buffer = ReplayBuffer.create(example, cfg.buffer_size)
        return OffPolicyRunner(
            train_state=ts,
            buffer=buffer,
            env_state=env_state,
            obs=obs,
            global_step=jnp.zeros((), jnp.int32),
            stats=EpisodeStatistics.create(cfg.num_envs),
            key=key,
        )

    def td_update(ts: DQNTrainState, batch, weights=None):
        return dqn_td_update(model, cfg.gamma, ts, batch, weights)

    def step_fn(runner: OffPolicyRunner, _):
        key, k_eps, k_act, k_step, k_sample = jax.random.split(runner.key, 5)
        eps = linear_epsilon(
            cfg.start_e,
            cfg.end_e,
            cfg.exploration_fraction * cfg.total_timesteps,
            runner.global_step,
        )
        q = model.apply(runner.train_state.params, runner.obs)
        greedy = jnp.argmax(q, axis=-1)
        random_a = jax.random.randint(
            k_act, (cfg.num_envs,), 0, env.num_actions, dtype=greedy.dtype
        )
        explore = jax.random.uniform(k_eps, (cfg.num_envs,)) < eps
        action = jnp.where(explore, random_a, greedy)

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
        buffer = runner.buffer.add_batch(
            dict(
                obs=runner.obs,
                action=action.astype(jnp.int32),
                reward=reward,
                next_obs=store_next_obs,
                done=store_done,
            ),
            cfg.num_envs,
        )
        global_step = runner.global_step + cfg.num_envs

        should_train = (global_step > cfg.learning_starts) & (
            (global_step // cfg.num_envs) % cfg.train_frequency == 0
        )

        if cfg.prioritized_replay:
            beta = jnp.clip(
                cfg.per_beta_start
                + (1.0 - cfg.per_beta_start)
                * global_step.astype(jnp.float32)
                / cfg.total_timesteps,
                cfg.per_beta_start,
                1.0,
            )

            def do_update(carry):
                ts, buf = carry
                batch, idx, weights = buf.sample(k_sample, cfg.batch_size, beta)
                ts, loss, q_mean, td_abs = td_update(ts, batch, weights)
                buf = buf.update_priorities(idx, td_abs)
                return (ts, buf), loss, q_mean

            (ts, buffer), loss, q_mean = jax.lax.cond(
                should_train,
                do_update,
                lambda c: (c, jnp.float32(0), jnp.float32(0)),
                (runner.train_state, buffer),
            )
        else:

            def do_update(ts):
                batch = buffer.sample(k_sample, cfg.batch_size)
                ts, loss, q_mean, _ = td_update(ts, batch)
                return ts, loss, q_mean

            ts, loss, q_mean = jax.lax.cond(
                should_train,
                do_update,
                lambda ts: (ts, jnp.float32(0), jnp.float32(0)),
                runner.train_state,
            )
        # Target network update (hard when tau=1, polyak otherwise).
        should_sync = (global_step // cfg.num_envs) % (
            cfg.target_network_frequency
        ) == 0
        ts = jax.lax.cond(
            should_sync,
            lambda t: t.replace(
                target_params=optax.incremental_update(
                    t.params, t.target_params, cfg.tau
                )
            ),
            lambda t: t,
            ts,
        )
        runner = runner.replace(
            train_state=ts,
            buffer=buffer,
            env_state=env_state,
            obs=next_obs,
            global_step=global_step,
            stats=stats,
            key=key,
        )
        return runner, (loss, q_mean)

    def train_iteration(runner: OffPolicyRunner):
        runner, (losses, q_means) = jax.lax.scan(
            step_fn, runner, None, length=cfg.steps_per_iteration
        )
        return runner, {
            "losses/td_loss": losses[-1],
            "losses/q_values": q_means[-1],
        }

    return init_runner, train_iteration
