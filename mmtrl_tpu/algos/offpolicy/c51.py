"""C51 categorical DQN — the reference's cleanrl/c51.py / c51_jax.py.

Same scanned structure as dqn.py; the TD step projects the target
distribution onto the fixed support in-jit (the reference's
c51_atari_jax.py:219-239 does this projection on device too — here it's
vmapped scatter-adds over the batch).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from mmtrl_tpu.algos.offpolicy.common import OffPolicyRunner, linear_epsilon
from mmtrl_tpu.algos.offpolicy.dqn import DQNTrainState
from mmtrl_tpu.core.metrics import EpisodeStatistics
from mmtrl_tpu.data.buffers import ReplayBuffer
from mmtrl_tpu.envs.base import Environment


@dataclasses.dataclass
class C51Config:
    total_timesteps: int = 500_000
    learning_rate: float = 2.5e-4
    num_envs: int = 1
    buffer_size: int = 10_000
    gamma: float = 0.99
    n_atoms: int = 101
    v_min: float = -100.0
    v_max: float = 100.0
    target_network_frequency: int = 500
    batch_size: int = 128
    start_e: float = 1.0
    end_e: float = 0.05
    exploration_fraction: float = 0.5
    learning_starts: int = 10_000
    train_frequency: int = 10
    steps_per_iteration: int = 512

    @property
    def num_iterations(self) -> int:
        return self.total_timesteps // (self.steps_per_iteration * self.num_envs)


def categorical_projection(
    reward, done, next_pmf, atoms, gamma, v_min, v_max, n_atoms
):
    """Project r + gamma*(1-d)*z onto the fixed support (single transition;
    vmapped over the batch).

    TPU note: expressed as a dense one-hot contraction instead of the usual
    scatter-adds — batched scatters lower to serialized dynamic-update-slice
    chains on TPU (pathological compile/run time), while the (n_atoms,
    n_atoms) masked sum is a trivial VPU reduction."""
    delta_z = (v_max - v_min) / (n_atoms - 1)
    tz = jnp.clip(reward + gamma * (1.0 - done) * atoms, v_min, v_max)
    b = (tz - v_min) / delta_z
    lo = jnp.floor(b).astype(jnp.int32)
    hi = jnp.ceil(b).astype(jnp.int32)
    # When b is integral, put the full mass on lo.
    w_lo = jnp.where(lo == hi, 1.0, hi.astype(b.dtype) - b)
    w_hi = b - lo.astype(b.dtype)
    idx = jnp.arange(n_atoms, dtype=jnp.int32)
    onehot_lo = (lo[:, None] == idx[None, :]).astype(next_pmf.dtype)
    onehot_hi = (hi[:, None] == idx[None, :]).astype(next_pmf.dtype)
    return ((next_pmf * w_lo)[:, None] * onehot_lo).sum(0) + (
        (next_pmf * w_hi)[:, None] * onehot_hi
    ).sum(0)


def c51_td_update(model, atoms: jnp.ndarray, gamma: float, ts: DQNTrainState, batch):
    """One categorical TD step (projection + cross-entropy) — shared by the
    fused device path (make_c51) and the host-loop ROM path
    (hostloop_dqn.py with the C51 hooks), so the math cannot diverge.
    Returns ``(ts, loss, q_mean)``; ``atoms`` is the fixed support."""
    n_atoms = atoms.shape[0]
    # Scalars, not float(): under a lax.cond branch trace (the host loop's
    # cadenced update) closed-over arrays are abstract; the projection only
    # uses the bounds arithmetically, so traced scalars are fine.
    v_min, v_max = atoms[0], atoms[-1]
    next_pmfs = model.apply(ts.target_params, batch["next_obs"])  # (B, A, N)
    next_q = (next_pmfs * atoms).sum(axis=-1)
    best = jnp.argmax(next_q, axis=-1)
    next_pmf = jnp.take_along_axis(next_pmfs, best[:, None, None], axis=1)[:, 0]
    target_pmf = jax.vmap(
        lambda r, d, p: categorical_projection(
            r, d, p, atoms, gamma, v_min, v_max, n_atoms
        )
    )(batch["reward"], batch["done"], next_pmf)

    def loss_fn(params):
        pmfs = model.apply(params, batch["obs"])
        pmf_a = jnp.take_along_axis(
            pmfs, batch["action"][:, None, None].astype(jnp.int32), axis=1
        )[:, 0]
        loss = -(target_pmf * jnp.log(jnp.clip(pmf_a, 1e-5, 1.0))).sum(-1).mean()
        q_a = (pmf_a * atoms).sum(-1)
        return loss, q_a.mean()

    (loss, q_mean), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params)
    return ts.apply_gradients(grads=grads), loss, q_mean


def make_c51(env: Environment, model, cfg: C51Config):
    atoms = jnp.linspace(cfg.v_min, cfg.v_max, cfg.n_atoms)

    def init_runner(key: jax.Array) -> OffPolicyRunner:
        key, k_env, k_model = jax.random.split(key, 3)
        obs, env_state = env.v_reset(jax.random.split(k_env, cfg.num_envs))
        params = model.init(k_model, obs)
        ts = DQNTrainState.create(
            apply_fn=model.apply,
            params=params,
            target_params=params,
            tx=optax.adam(cfg.learning_rate, eps=0.01 / cfg.batch_size),
        )
        example = dict(
            obs=obs[0],
            action=jnp.int32(0),
            reward=jnp.float32(0),
            next_obs=obs[0],
            done=jnp.float32(0),
        )
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

    def td_update(ts: DQNTrainState, batch):
        return c51_td_update(model, atoms, cfg.gamma, ts, batch)

    def step_fn(runner: OffPolicyRunner, _):
        key, k_eps, k_act, k_step, k_sample = jax.random.split(runner.key, 5)
        eps = linear_epsilon(
            cfg.start_e,
            cfg.end_e,
            cfg.exploration_fraction * cfg.total_timesteps,
            runner.global_step,
        )
        pmfs = model.apply(runner.train_state.params, runner.obs)
        greedy = jnp.argmax((pmfs * atoms).sum(-1), axis=-1)
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
        ts, loss, q_mean = jax.lax.cond(
            should_train,
            lambda ts: td_update(ts, buffer.sample(k_sample, cfg.batch_size)),
            lambda ts: (ts, jnp.float32(0), jnp.float32(0)),
            runner.train_state,
        )
        should_sync = (global_step // cfg.num_envs) % (
            cfg.target_network_frequency
        ) == 0
        ts = jax.lax.cond(
            should_sync,
            lambda t: t.replace(target_params=t.params),
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
        return runner, {"losses/loss": losses[-1], "losses/q_values": q_means[-1]}

    return init_runner, train_iteration
