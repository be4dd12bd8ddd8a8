"""SAC — the reference's cleanrl/sac_continuous_action.py.

Twin soft-Q critics, tanh-squashed Gaussian actor, and autotuned entropy
temperature alpha against target entropy -dim(A) (reference :196-200,
279-287), all inside the scanned device loop.
"""

from __future__ import annotations

import dataclasses

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
from mmtrl_tpu.algos.offpolicy.ddpg import ACTrainState
from mmtrl_tpu.core.metrics import EpisodeStatistics
from mmtrl_tpu.data.buffers import ReplayBuffer
from mmtrl_tpu.envs.base import Environment
from mmtrl_tpu.models.distributions import squashed_normal_sample_log_prob


@dataclasses.dataclass
class SACConfig:
    total_timesteps: int = 1_000_000
    q_lr: float = 1e-3
    policy_lr: float = 3e-4
    num_envs: int = 1
    buffer_size: int = 131_072
    gamma: float = 0.99
    tau: float = 0.005
    batch_size: int = 256
    learning_starts: int = 5_000
    policy_frequency: int = 2
    target_network_frequency: int = 1
    alpha: float = 0.2
    autotune: bool = True
    steps_per_iteration: int = 512

    @property
    def num_iterations(self) -> int:
        return self.total_timesteps // (self.steps_per_iteration * self.num_envs)


@struct.dataclass
class SACState:
    actor: TrainState
    qf1: ACTrainState
    qf2: ACTrainState
    log_alpha: jnp.ndarray
    alpha_opt_state: any  # optax state for the temperature (tx in closure)


def make_sac(env: Environment, actor_model, critic_model, cfg: SACConfig):
    a_low = jnp.asarray(env.action_space.low)
    a_high = jnp.asarray(env.action_space.high)
    action_scale = (a_high - a_low) / 2.0
    action_bias = (a_high + a_low) / 2.0
    target_entropy = -float(jnp.prod(jnp.asarray(env.action_space.shape)))
    alpha_tx = optax.adam(cfg.q_lr)

    def sample_action(params, obs, key):
        mean, log_std = actor_model.apply(params, obs)
        return squashed_normal_sample_log_prob(
            key, mean, log_std, action_scale, action_bias
        )

    def init_runner(key: jax.Array) -> OffPolicyRunner:
        key, k_env, k_a, k_q1, k_q2 = jax.random.split(key, 5)
        obs, env_state = env.v_reset(jax.random.split(k_env, cfg.num_envs))
        ea = jnp.zeros(env.action_space.shape, jnp.float32)
        actor = TrainState.create(
            apply_fn=actor_model.apply,
            params=actor_model.init(k_a, obs),
            tx=optax.adam(cfg.policy_lr),
        )
        make_q = lambda k: ACTrainState.create(  # noqa: E731
            apply_fn=critic_model.apply,
            params=critic_model.init(k, obs, ea[None]),
            target_params=critic_model.init(k, obs, ea[None]),
            tx=optax.adam(cfg.q_lr),
        )
        log_alpha = jnp.log(jnp.asarray(cfg.alpha))
        example = dict(
            obs=obs[0], action=ea, reward=jnp.float32(0),
            next_obs=obs[0], done=jnp.float32(0),
        )
        return OffPolicyRunner(
            train_state=SACState(
                actor=actor,
                qf1=make_q(k_q1),
                qf2=make_q(k_q2),
                log_alpha=log_alpha,
                alpha_opt_state=alpha_tx.init(log_alpha),
            ),
            buffer=ReplayBuffer.create(example, cfg.buffer_size),
            env_state=env_state,
            obs=obs,
            global_step=jnp.zeros((), jnp.int32),
            stats=EpisodeStatistics.create(cfg.num_envs),
            key=key,
        )

    def update_critics(state: SACState, batch, key):
        alpha = jnp.exp(state.log_alpha)
        next_a, next_logp, _ = sample_action(
            state.actor.params, batch["next_obs"], key
        )
        q1n = critic_model.apply(state.qf1.target_params, batch["next_obs"], next_a)
        q2n = critic_model.apply(state.qf2.target_params, batch["next_obs"], next_a)
        soft_next = jnp.minimum(q1n, q2n) - alpha * next_logp
        target = batch["reward"] + cfg.gamma * (1.0 - batch["done"]) * soft_next

        def q_loss(params):
            q = critic_model.apply(params, batch["obs"], batch["action"])
            return ((q - target) ** 2).mean(), q.mean()

        (l1, q1m), g1 = jax.value_and_grad(q_loss, has_aux=True)(state.qf1.params)
        (l2, _), g2 = jax.value_and_grad(q_loss, has_aux=True)(state.qf2.params)
        return (
            state.replace(
                qf1=state.qf1.apply_gradients(grads=g1),
                qf2=state.qf2.apply_gradients(grads=g2),
            ),
            l1 + l2,
            q1m,
        )

    def update_actor_and_alpha(state: SACState, batch, key):
        alpha = jnp.exp(state.log_alpha)

        def a_loss(params):
            a, logp, _ = sample_action(params, batch["obs"], key)
            q1 = critic_model.apply(state.qf1.params, batch["obs"], a)
            q2 = critic_model.apply(state.qf2.params, batch["obs"], a)
            return (alpha * logp - jnp.minimum(q1, q2)).mean(), logp

        (actor_loss, logp), grads = jax.value_and_grad(a_loss, has_aux=True)(
            state.actor.params
        )
        actor = state.actor.apply_gradients(grads=grads)

        if cfg.autotune:
            def alpha_loss(log_alpha):
                return (
                    -jnp.exp(log_alpha) * (logp + target_entropy)
                ).mean()

            al, a_grads = jax.value_and_grad(alpha_loss)(state.log_alpha)
            updates, new_opt = alpha_tx.update(
                a_grads, state.alpha_opt_state, state.log_alpha
            )
            log_alpha = optax.apply_updates(state.log_alpha, updates)
            state = state.replace(log_alpha=log_alpha, alpha_opt_state=new_opt)

        return state.replace(actor=actor), actor_loss

    def insert_update(state, buffer, global_step, transition, keys):
        """Buffer insert + the reference's per-step update cadence; shared
        verbatim by the scanned device path (step_fn) and the host-loop
        chunk path (common.make_chunk_fn) so their math cannot diverge."""
        k_sample, k_next, k_pi = keys
        buffer = buffer.add_batch(transition, cfg.num_envs)
        global_step = global_step + cfg.num_envs

        def do_updates(state):
            batch = buffer.sample(k_sample, cfg.batch_size)
            state, c_loss, q_mean = update_critics(state, batch, k_next)
            step_idx = global_step // cfg.num_envs

            def delayed_updates(s):
                # Reference runs policy_frequency actor+alpha passes when the
                # delayed update fires (sac_continuous_action.py:265-268),
                # compensating for the update delay; fresh action samples
                # each pass via a folded key.
                def one(i, carry):
                    s, _ = carry
                    return update_actor_and_alpha(
                        s, batch, jax.random.fold_in(k_pi, i)
                    )

                return jax.lax.fori_loop(
                    0, cfg.policy_frequency, one, (s, jnp.float32(0))
                )

            state, a_loss = jax.lax.cond(
                step_idx % cfg.policy_frequency == 0,
                delayed_updates,
                lambda s: (s, jnp.float32(0)),
                state,
            )
            polyak = lambda t: t.replace(  # noqa: E731
                target_params=optax.incremental_update(
                    t.params, t.target_params, cfg.tau
                )
            )
            state = jax.lax.cond(
                step_idx % cfg.target_network_frequency == 0,
                lambda s: s.replace(qf1=polyak(s.qf1), qf2=polyak(s.qf2)),
                lambda s: s,
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
            "losses/qf_loss": c_loss,
            "losses/actor_loss": a_loss,
            "losses/qf1_values": q_mean,
            "losses/alpha": jnp.exp(state.log_alpha),
        }
        return state, buffer, global_step, metrics

    def step_fn(runner: OffPolicyRunner, _):
        key, k_act, k_rand, k_step, k_sample, k_next, k_pi = jax.random.split(
            runner.key, 7
        )
        state: SACState = runner.train_state
        a_pi, _, _ = sample_action(state.actor.params, runner.obs, k_act)
        a_random = jax.random.uniform(k_rand, a_pi.shape, minval=a_low, maxval=a_high)
        warmup = runner.global_step < cfg.learning_starts
        action = jnp.where(warmup, a_random, a_pi)

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
            (k_sample, k_next, k_pi),
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
        chunk_fn=make_chunk_fn(insert_update, 3),
        act_explore=lambda p, obs, key: sample_action(p, obs, key)[0],
        act_greedy=lambda p, obs: (
            jnp.tanh(actor_model.apply(p, obs)[0]) * action_scale + action_bias
        ),
        actor_params=lambda st: st.actor.params,
    )
