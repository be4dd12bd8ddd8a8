"""Host-loop recurrent PPO for native (host-bound) envs — the ROM path.

The fused device loop reaches host envs through ``io_callback``, which
cannot cross a remote-TPU tunnel; round 2's ROM training therefore fell
back to --platform cpu and ran the conv policy on one host core at ~4 SPS
(the reference's own torch scripts loop on the host the same way,
reference: src/train.py:145-169).  This runner keeps the host loop but
puts ALL tensor math on the accelerator:

- host: the C++ 2600 pool steps the real cartridge and returns raw
  (frame, stereo-audio) batches plus reward components;
- device, per step: observation synthesis (luma/resize + streaming MFCC),
  the recurrent policy forward, and the rollout buffer write — one jitted
  call whose only host round-trip is the sampled action batch;
- device, per update: value bootstrap + GAE + the full recurrent PPO
  update via core.make_recurrent_ppo's ``update_from_rollout`` — the exact
  function the fused path runs, so the math cannot diverge.

PPO semantics are exact (not approximated): the rollout's behavior policy
is frozen for the whole rollout in standard PPO anyway, and here the
params never leave the device between updates.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmtrl_tpu.core.checkpoint import load_run, save_run
from mmtrl_tpu.core.metrics import MetricsWriter
from mmtrl_tpu.data.quant import dequant_audio_u8, quant_audio_u8


class _SpecEnv:
    """Space/shape stand-in for core.make_recurrent_ppo's init_runner."""

    def __init__(self, env):
        self.observation_space = env.observation_space
        self.action_space = env.action_space
        self.num_actions = env.num_actions
        self.name = env.name

    def v_reset(self, keys):
        n = keys.shape[0]
        obs = jnp.zeros(
            (n,) + tuple(self.observation_space.shape), jnp.float32
        )
        return obs, jnp.zeros((n,), jnp.int32)

    def v_step(self, keys, state, action):  # pragma: no cover
        raise NotImplementedError("host-loop mode never steps the SpecEnv")


def _shaped_reward_np(env, kd, ld, win):
    """Host-numpy mirror of env._reward (tiny per-step arrays; a jnp call
    here would dispatch to the remote device every pool step).

    Dispatch is by reward_mode, whose names are disjoint across the native
    env classes: 'shaped'/'kills' belong to NativeSkeletonPlus
    (envs/skeleton_native.py:264), 'score'/'win' to the homebrew RL-ABI
    envs (envs/homebrew_native.py: raw ALE-style score delta).
    tests/test_brick_rom.py::test_hostloop_reward_mirror pins equality.
    """
    if env.reward_mode == "kills":
        return kd.astype(np.float32)
    if env.reward_mode == "score":
        return kd.astype(np.float32)
    if env.reward_mode == "win":
        return kd.astype(np.float32) + 5.0 * win.astype(np.float32)
    from mmtrl_tpu.envs import skeleton_native as sn

    return (
        sn.REWARD_KILL * kd.astype(np.float32)
        + sn.REWARD_LIFE * ld.astype(np.float32)
        + sn.REWARD_WIN * win.astype(np.float32)
        + sn.REWARD_STEP
    )


def run_recurrent_ppo_hostloop(
    env,
    model,
    cfg,
    args,
    run_name: Optional[str] = None,
    eval_steps: int = 0,
) -> dict:
    """``env`` is a NativeSkeletonPlus-like pool: ``_host_reset()``,
    ``_host_step(actions)``, device-side ``_obs(frames, audio)``."""
    import sys as _sys

    from mmtrl_tpu.algos.ppo.core import make_recurrent_ppo
    from mmtrl_tpu.utils.resume import journal_run

    run_name = run_name or (
        f"{env.name}__{args.exp_name}__{args.seed}__{int(time.time())}"
    )
    writer = MetricsWriter(run_name, args)
    journal_run(run_name, _sys.argv, "running")

    n, t_len = cfg.num_envs, cfg.num_steps
    parts = make_recurrent_ppo(_SpecEnv(env), model, cfg)
    # jit the init: eagerly it is hundreds of small dispatches (orthogonal
    # inits run QR on device), which is slow/fragile over a remote tunnel.
    rs = jax.jit(parts[0])(jax.random.PRNGKey(args.seed))
    print("runner initialized", flush=True)
    initial_update = 1
    if getattr(args, "load_from", ""):
        rs = load_run(args.load_from, target=jax.device_get(rs))
        opt_step = int(jax.device_get(rs.train_state.step))
        initial_update = opt_step // max(1, cfg.opt_steps_per_update) + 1
        print(f"resuming at update {initial_update} (opt step {opt_step})")

    def obs_syn(frames, audio_u8):
        return env._obs(frames, dequant_audio_u8(audio_u8))

    def step_call(rs, buf, t, frames, audio_u8, prev_done):
        obs = obs_syn(frames, audio_u8)
        prev_done = prev_done.astype(bool)
        key, k_act = jax.random.split(rs.key)
        action, logprob, value, new_carry = parts.policy_step(
            rs.train_state.params, obs, prev_done, rs.carry, k_act
        )
        buf = dict(
            obs=buf["obs"].at[t].set(obs),
            actions=buf["actions"].at[t].set(action),
            logprobs=buf["logprobs"].at[t].set(logprob),
            dones=buf["dones"].at[t].set(prev_done),
            values=buf["values"].at[t].set(value),
        )
        rs = rs.replace(obs=obs, done=prev_done, carry=new_carry, key=key)
        return rs, buf, action

    def update_call(rs, initial_carry, buf, rewards, frames, audio_u8, done):
        obs_fin = obs_syn(frames, audio_u8)
        rs = rs.replace(obs=obs_fin, done=done.astype(bool))
        rollout = (
            buf["obs"], buf["actions"], buf["logprobs"],
            parts.maybe_clip(rewards), buf["dones"], buf["values"],
        )
        return parts.update_from_rollout(rs, initial_carry, rollout)

    def eval_call(params, carry, frames, audio_u8, prev_done):
        obs = obs_syn(frames, audio_u8)
        logits, _, new_carry = model.apply(
            params, obs[None], prev_done.astype(bool)[None], carry
        )
        return jnp.argmax(logits[0], axis=-1), new_carry

    step_jit = jax.jit(step_call)
    update_jit = jax.jit(update_call)
    eval_jit = jax.jit(eval_call)

    obs_shape = tuple(env.observation_space.shape)
    buf = dict(
        obs=jnp.zeros((t_len, n) + obs_shape, jnp.float32),
        actions=jnp.zeros((t_len, n), jnp.int32),
        logprobs=jnp.zeros((t_len, n), jnp.float32),
        dones=jnp.zeros((t_len, n), bool),
        values=jnp.zeros((t_len, n), jnp.float32),
    )

    def to_u8(audio):
        return quant_audio_u8(audio)

    frames, audio = env._host_reset()
    audio_u8 = to_u8(audio)
    prev_done = np.zeros(n, np.uint8)
    rewards_np = np.empty((t_len, n), np.float32)
    ep_ret = np.zeros(n, np.float64)
    recent: list = []
    recent_kills: list = []
    start = time.time()
    gs = (initial_update - 1) * n * t_len

    for update in range(initial_update, cfg.num_updates + 1):
        initial_carry = rs.carry
        for t in range(t_len):
            rs, buf, action_dev = step_jit(
                rs, buf, np.int32(t), frames, audio_u8, prev_done
            )
            action = np.asarray(action_dev)
            frames, audio, kd, ld, done, win, kills, life = env._host_step(
                action
            )
            audio_u8 = to_u8(audio)
            reward = _shaped_reward_np(env, kd, ld, win)
            rewards_np[t] = reward
            ep_ret += reward
            for i in np.nonzero(done)[0]:
                recent.append(float(ep_ret[i]))
                recent_kills.append(int(kills[i]))
                ep_ret[i] = 0.0
            prev_done = done
            gs += n
        rs, metrics = update_jit(
            rs, initial_carry, buf, rewards_np, frames, audio_u8, prev_done
        )
        if update % getattr(args, "print_interval", 1) == 0:
            if recent:
                writer.scalar(
                    "charts/episodic_return", float(np.mean(recent[-40:])), gs
                )
                writer.scalar(
                    "charts/episodic_kills",
                    float(np.mean(recent_kills[-40:])), gs,
                )
            writer.scalars(jax.device_get(metrics), gs)
            sps = gs / (time.time() - start)
            ret = float(np.mean(recent[-40:])) if recent else float("nan")
            print(
                f"update={update}/{cfg.num_updates} global_step={gs} "
                f"episodic_return={ret:.2f} "
                f"kills={np.mean(recent_kills[-40:]) if recent_kills else 0:.2f} "
                f"SPS={sps:.0f}",
                flush=True,
            )
        if getattr(args, "save_interval", 0) and update % args.save_interval == 0:
            save_run(rs, run_name, args.save_dir)

    if getattr(args, "save_interval", 0):
        save_run(rs, run_name, args.save_dir)

    result = {
        "run_name": run_name,
        "global_step": gs,
        "episodic_return": float(np.mean(recent[-40:])) if recent else 0.0,
    }
    if eval_steps:
        # Greedy evaluation on the same pool (fresh episodes follow from
        # auto-reset); reports mean shaped return + kills per episode.
        carry = model.initial_carry(n)
        frames, audio = env._host_reset()
        audio_u8, prev_done = to_u8(audio), np.zeros(n, np.uint8)
        ep_ret = np.zeros(n, np.float64)
        ev_rets, ev_kills = [], []
        for _ in range(eval_steps):
            a_dev, carry = eval_jit(
                rs.train_state.params, carry, frames, audio_u8, prev_done
            )
            action = np.asarray(a_dev)
            frames, audio, kd, ld, done, win, kills, life = env._host_step(
                action
            )
            audio_u8 = to_u8(audio)
            ep_ret += _shaped_reward_np(env, kd, ld, win)
            for i in np.nonzero(done)[0]:
                ev_rets.append(float(ep_ret[i]))
                ev_kills.append(int(kills[i]))
                ep_ret[i] = 0.0
            prev_done = done
        if ev_rets:
            result["eval_episodic_return"] = float(np.mean(ev_rets))
            result["eval_kills"] = float(np.mean(ev_kills))
            result["eval_episodes"] = len(ev_rets)
            writer.scalar(
                "eval/episodic_return", result["eval_episodic_return"], gs
            )
            print(
                f"final greedy eval: return={result['eval_episodic_return']:.2f} "
                f"kills={result['eval_kills']:.2f} over {len(ev_rets)} episodes"
            )
    journal_run(run_name, _sys.argv, "finished")
    writer.close()
    return result
