"""Host-loop trajectory collection + DT evaluation for native cartridge envs.

The device pipeline (data.collect_trajectories / evaluate.evaluate_dt) scans
entirely on the accelerator, reaching envs through their vectorized device
step.  Native 2600 envs step on the HOST (the C++ pool), and io_callback
cannot cross a remote-TPU tunnel — so the offline phase gets the same split
the online trainers use (algos/ppo/hostloop.py):

- host: the C++ pool steps the real cartridge;
- device, per pool step: observation synthesis (luma/resize + streaming
  MFCC), the behavior policy (collection) or the return-conditioned DT
  shift-register step (evaluation) — one jitted call whose only host
  round-trip is the action batch (plus, during collection, the int8
  observation snapshot for the host-side dataset).

The resulting TrajectoryBuffer and the evaluation protocol are IDENTICAL to
the device pipeline's (same stream-major layout, same masking, same
shift-register conditioning — evaluate.py's documented protocol), so a DT
trained on real-cartridge data is directly comparable to the sim rows.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mmtrl_tpu.algos.dt.data import TrajectoryBuffer, returns_to_go
from mmtrl_tpu.data.quant import (
    OBS_SCALE,
    dequant_audio_u8,
    quant_audio_u8,
    quant_obs_i8,
)
from mmtrl_tpu.models.decision_transformer import DecisionTransformer, DTConfig


def collect_trajectories_host(
    env,
    key: jax.Array,
    num_pool_steps: int,
    policy_fn: Optional[Callable] = None,
    policy_carry=None,
    state_dtype: jnp.dtype = jnp.bfloat16,
    print_every: int = 0,
) -> Tuple[TrajectoryBuffer, Dict[str, float]]:
    """Roll a behavior policy on a native pool env.

    Returns ``(TrajectoryBuffer, stats)`` where stats reports the behavior
    policy's mean episodic return over the collection (the offline-RL
    comparison bar).

    ``policy_fn(key, obs, done, carry) -> (action, carry)`` — the same
    contract as data.collect_trajectories; uniform-random when None.  The
    dataset accumulates on the host int8-quantized (1/127 granularity over
    the env's [-1, 1] obs — the replay-path convention) and is dequantized
    into the device buffer at the end.
    """
    n = env.num_envs

    if policy_fn is None:

        def policy_fn(k, obs, done, carry):
            return (
                jax.random.randint(k, (obs.shape[0],), 0, env.num_actions),
                carry,
            )

    def act(key, frames, audio_u8, done, carry):
        obs = env._obs(frames, dequant_audio_u8(audio_u8))
        key, k_act = jax.random.split(key)
        action, carry = policy_fn(k_act, obs, done.astype(bool), carry)
        return key, quant_obs_i8(obs.reshape(n, -1)), action, carry

    act_jit = jax.jit(act)

    frames, audio = env._host_reset()
    audio_u8 = quant_audio_u8(audio)
    done = np.zeros(n, np.uint8)
    t_in_ep = np.zeros(n, np.int32)

    states_h = np.empty((num_pool_steps, n, int(np.prod(env.observation_space.shape))), np.int8)
    actions_h = np.empty((num_pool_steps, n), np.int32)
    rewards_h = np.empty((num_pool_steps, n), np.float32)
    dones_h = np.empty((num_pool_steps, n), np.float32)
    tsteps_h = np.empty((num_pool_steps, n), np.int32)

    carry = policy_carry
    ep_ret = np.zeros(n, np.float64)
    rets: list = []
    for t in range(num_pool_steps):
        key, obs_q, action_dev, carry = act_jit(
            key, frames, audio_u8, done, carry
        )
        action = np.asarray(action_dev)
        states_h[t] = np.asarray(obs_q)
        actions_h[t] = action
        tsteps_h[t] = t_in_ep
        frames, audio, kd, ld, done, win, _score, _life = env._host_step(action)
        audio_u8 = quant_audio_u8(audio)
        rewards_h[t] = np.asarray(env._reward(kd, ld, win), np.float32)
        dones_h[t] = done.astype(np.float32)
        ep_ret += rewards_h[t]
        for i in np.nonzero(done)[0]:
            rets.append(float(ep_ret[i]))
            ep_ret[i] = 0.0
        t_in_ep = np.where(done, 0, t_in_ep + 1).astype(np.int32)
        if print_every and (t + 1) % print_every == 0:
            recent = float(np.mean(rets[-40:])) if rets else float("nan")
            print(
                f"collect {(t + 1) * n}/{num_pool_steps * n} transitions "
                f"behavior_return={recent:.2f}",
                flush=True,
            )

    rtg = np.asarray(returns_to_go(jnp.asarray(rewards_h), jnp.asarray(dones_h)))
    swap = lambda x: np.swapaxes(x, 0, 1)  # noqa: E731  time-major -> stream-major
    stats = {
        "behavior/episodic_return": float(np.mean(rets)) if rets else float("nan"),
        "behavior/episodes": float(len(rets)),
    }
    buffer = TrajectoryBuffer(
        states=(jnp.asarray(swap(states_h)).astype(state_dtype) / OBS_SCALE),
        actions=jnp.asarray(swap(actions_h)),
        rtg=jnp.asarray(swap(rtg)),
        timesteps=jnp.asarray(swap(tsteps_h)),
        episode_starts=jnp.asarray(swap(tsteps_h) == 0),
        state_shape=tuple(env.observation_space.shape),
    )
    return buffer, stats


def evaluate_dt_host(
    env,
    model_cfg: DTConfig,
    params,
    key: jax.Array,
    target_return: float,
    num_steps: int,
    greedy: bool = True,
    rtg_clip: Optional[float] = None,
) -> Dict[str, float]:
    """Return-conditioned DT evaluation on a native pool env — the exact
    protocol of evaluate.evaluate_dt (shift-register context, action from
    the last state token, running return target decremented by observed
    rewards, context cleared on episode end), with the env stepped on the
    host between jitted calls."""
    model = DecisionTransformer(model_cfg)
    K = model_cfg.context_len
    n = env.num_envs
    state_shape = tuple(env.observation_space.shape)

    def shift_append(buf, x):
        return jnp.concatenate([buf[:, 1:], x[:, None]], axis=1)

    def init_ctx():
        return dict(
            states=jnp.zeros((n, K) + state_shape, jnp.bfloat16),
            actions=jnp.zeros((n, K), jnp.int32),
            rtg=jnp.zeros((n, K), jnp.float32),
            timesteps=jnp.zeros((n, K), jnp.int32),
            t_in_ep=jnp.zeros(n, jnp.int32),
            rt=jnp.full(n, target_return, jnp.float32),
        )

    def eval_step(ctx, frames, audio_u8, prev_reward, prev_done, key):
        obs = env._obs(frames, dequant_audio_u8(audio_u8))
        d = prev_done.astype(bool)
        # Settle the previous transition: decrement the target by the
        # observed reward; on episode end reset target/context/counter.
        rt = jnp.where(d, target_return, ctx["rt"] - prev_reward)
        if rtg_clip is not None:
            rt = jnp.minimum(rt, rtg_clip)
        t_in_ep = jnp.where(d, 0, ctx["t_in_ep"])

        def reset_if_done(buf):
            dd = d.reshape((n,) + (1,) * (buf.ndim - 1))
            return jnp.where(dd, jnp.zeros_like(buf), buf)

        states = shift_append(reset_if_done(ctx["states"]), obs.astype(jnp.bfloat16))
        rtg = shift_append(reset_if_done(ctx["rtg"]), rt)
        timesteps = shift_append(reset_if_done(ctx["timesteps"]), t_in_ep)
        prev_actions = reset_if_done(ctx["actions"])
        actions_in = shift_append(prev_actions, jnp.zeros(n, jnp.int32))

        logits = model.apply(
            params, rtg, states, actions_in, timesteps, deterministic=True
        )[:, -1]
        key, k_act = jax.random.split(key)
        action = (
            jnp.argmax(logits, axis=-1)
            if greedy
            else jax.random.categorical(k_act, logits)
        )
        new_ctx = dict(
            states=states,
            actions=shift_append(prev_actions, action),
            rtg=rtg,
            timesteps=timesteps,
            t_in_ep=t_in_ep + 1,
            rt=rt,
        )
        return new_ctx, action, key

    step_jit = jax.jit(eval_step)

    frames, audio = env._host_reset()
    audio_u8 = quant_audio_u8(audio)
    reward = np.zeros(n, np.float32)
    done = np.zeros(n, np.uint8)
    ctx = init_ctx()
    ep_ret = np.zeros(n, np.float64)
    ep_len = np.zeros(n, np.int64)
    rets, lens = [], []
    for _ in range(num_steps):
        ctx, action_dev, key = step_jit(ctx, frames, audio_u8, reward, done, key)
        action = np.asarray(action_dev)
        frames, audio, kd, ld, done, win, _score, _life = env._host_step(action)
        audio_u8 = quant_audio_u8(audio)
        reward = np.asarray(env._reward(kd, ld, win), np.float32)
        ep_ret += reward
        ep_len += 1
        for i in np.nonzero(done)[0]:
            rets.append(float(ep_ret[i]))
            lens.append(int(ep_len[i]))
            ep_ret[i] = 0.0
            ep_len[i] = 0
    return {
        "eval/episodic_return": float(np.mean(rets)) if rets else float("nan"),
        "eval/episodic_length": float(np.mean(lens)) if lens else float("nan"),
        "eval/episodes": float(len(rets)),
    }
