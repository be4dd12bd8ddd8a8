"""Host-loop DQN for native cartridge envs — the ``dqn_atari`` leg on ROMs.

The reference's DQN Atari scripts (reference: cleanrl/dqn_atari_jax.py
rollout loop) loop on the host: act, env.step, ReplayBuffer.add, and every
``train_frequency`` steps sample+update.  The fully fused device path
(dqn.py) does the same inside one jitted scan, but it reaches host envs
through ``io_callback``, which cannot cross a remote-TPU tunnel.  This
runner is the DQN analog of the recurrent-PPO ROM host loop
(algos/ppo/hostloop.py), with the same split:

- host: the C++ 2600 pool steps the real cartridge (raw frames + stereo
  audio batches) and tracks raw episode statistics;
- device, per pool step: observation synthesis (luma/resize + streaming
  MFCC), epsilon-greedy Q acting, the replay-ring write, and — on the
  configured cadence — the TD update and target sync, all in ONE jitted
  call whose only host round-trip is the action batch.

The TD update is literally ``dqn.dqn_td_update`` — the same function the
fused path runs, so the math cannot diverge between modes.

Replay storage is int8-quantized: native obs live in [-1, 1] (1 video
plane + 2 MFCC planes, envs/skeleton_native.py::_obs), so symmetric
quantization at 1/127 granularity stores a (3, 84, 84) transition pair in
42 KB instead of 169 KB — a 100k-capacity ring fits in ~4.2 GB of HBM
(the same int8 trick as the ProcMaze PPG aux store, scripts/ppg.py).

Cadence units: ``train_frequency`` and ``target_network_frequency`` are in
POOL steps here (one pool step = ``num_envs`` env transitions), because the
host loop advances ``num_envs`` transitions at a time.  The ROM script's
defaults keep the reference's replayed-samples-per-env-step ratio (see
scripts/dqn_rom.py).

Termination note: the cartridge pool reports a single ``done`` at life
loss/game over OR the episode step cap; like the repo's device envs the
cap is treated as a true termination (no truncation bootstrap) — the
convention is documented rather than hidden (cf. ADVICE round-2 item on
procmaze).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from mmtrl_tpu.algos.offpolicy.common import linear_epsilon
from mmtrl_tpu.algos.offpolicy.dqn import (
    DQNConfig,
    DQNTrainState,
    dqn_td_update,
)
from mmtrl_tpu.core.checkpoint import load_run, save_run
from mmtrl_tpu.core.metrics import MetricsWriter
from mmtrl_tpu.data.buffers import ReplayBuffer
from mmtrl_tpu.data.quant import (
    dequant_audio_u8,
    dequant_obs_i8 as _dequant,
    quant_audio_u8,
    quant_obs_i8 as _quant,
)


@struct.dataclass
class DQNHostRunner:
    train_state: DQNTrainState
    buffer: ReplayBuffer
    pending_obs: jnp.ndarray  # (N, C, H, W) obs at t, waiting for (r, obs')
    key: jax.Array
    global_step: jnp.ndarray  # () int32, env transitions stored


def make_dqn_hostloop(
    env, model, cfg: DQNConfig, greedy_fn=None, update_fn=None, tx=None
):
    """``env`` is a NativeSkeletonPlus-like pool (``_host_reset``,
    ``_host_step``, device-side ``_obs``).  Returns ``(init_runner,
    step_fn, act_greedy)``; ``step_fn`` is the per-pool-step jitted call
    described in the module docstring.

    The value-learning algorithm is pluggable: ``greedy_fn(params, obs) ->
    (N,) actions`` and ``update_fn(ts, batch) -> (ts, loss, q_mean)``
    default to DQN (argmax-Q acting + ``dqn_td_update``); scripts/c51_rom.py
    passes the C51 hooks (expected-Q over the categorical support +
    ``c51_td_update``) to train the reference's c51_atari leg on ROMs."""
    n = env.num_envs
    obs_shape = tuple(env.observation_space.shape)
    if greedy_fn is None:
        def greedy_fn(params, obs):
            return jnp.argmax(model.apply(params, obs), axis=-1)
    if update_fn is None:
        def update_fn(ts, batch):
            ts, loss, q_mean, _ = dqn_td_update(model, cfg.gamma, ts, batch)
            return ts, loss, q_mean

    def init_runner(key: jax.Array) -> DQNHostRunner:
        key, k_model = jax.random.split(key)
        zeros = jnp.zeros((n,) + obs_shape, jnp.float32)
        params = model.init(k_model, zeros)
        ts = DQNTrainState.create(
            apply_fn=model.apply,
            params=params,
            target_params=params,
            tx=tx if tx is not None else optax.adam(cfg.learning_rate),
        )
        example = dict(
            obs=_quant(zeros[0]),
            action=jnp.int32(0),
            reward=jnp.float32(0),
            next_obs=_quant(zeros[0]),
            done=jnp.float32(0),
        )
        return DQNHostRunner(
            train_state=ts,
            buffer=ReplayBuffer.create(example, cfg.buffer_size),
            pending_obs=zeros,
            key=key,
            global_step=jnp.zeros((), jnp.int32),
        )

    def step_fn(
        runner: DQNHostRunner,
        frames: jnp.ndarray,
        audio_u8: jnp.ndarray,
        reward: jnp.ndarray,
        done: jnp.ndarray,
        prev_action: jnp.ndarray,
        store: jnp.ndarray,  # () bool: False only on the very first call
    ):
        obs = env._obs(frames, dequant_audio_u8(audio_u8))

        def do_store(buf):
            return buf.add_batch(
                dict(
                    obs=_quant(runner.pending_obs),
                    action=prev_action.astype(jnp.int32),
                    reward=reward,
                    next_obs=_quant(obs),
                    done=done.astype(jnp.float32),
                ),
                n,
            )

        buffer = jax.lax.cond(store, do_store, lambda b: b, runner.buffer)
        gs = runner.global_step + jnp.where(store, n, 0)
        pool_t = gs // n

        key, k_eps, k_rand, k_sample = jax.random.split(runner.key, 4)
        eps = linear_epsilon(
            cfg.start_e,
            cfg.end_e,
            cfg.exploration_fraction * cfg.total_timesteps,
            gs,
        )
        greedy = greedy_fn(runner.train_state.params, obs)
        random_a = jax.random.randint(
            k_rand, (n,), 0, env.num_actions, dtype=greedy.dtype
        )
        explore = jax.random.uniform(k_eps, (n,)) < eps
        action = jnp.where(explore, random_a, greedy)

        should_train = (gs > cfg.learning_starts) & (
            pool_t % cfg.train_frequency == 0
        )

        def do_update(ts):
            batch = buffer.sample(k_sample, cfg.batch_size)
            batch = dict(
                batch,
                obs=_dequant(batch["obs"]),
                next_obs=_dequant(batch["next_obs"]),
            )
            return update_fn(ts, batch)

        ts, loss, q_mean = jax.lax.cond(
            should_train,
            do_update,
            lambda ts: (ts, jnp.float32(0), jnp.float32(0)),
            runner.train_state,
        )
        should_sync = pool_t % cfg.target_network_frequency == 0
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
            pending_obs=obs,
            key=key,
            global_step=gs,
        )
        return runner, action, dict(
            td_loss=loss, q_values=q_mean, epsilon=eps
        )

    def act_greedy(params, frames, audio_u8):
        obs = env._obs(frames, dequant_audio_u8(audio_u8))
        return greedy_fn(params, obs)

    return init_runner, step_fn, act_greedy


def run_dqn_hostloop(
    env,
    model,
    cfg: DQNConfig,
    args,
    run_name: Optional[str] = None,
    eval_steps: int = 0,
    greedy_fn=None,
    update_fn=None,
    tx=None,
) -> dict:
    import sys as _sys

    from mmtrl_tpu.utils.resume import journal_run

    run_name = run_name or (
        f"{env.name}__{args.exp_name}__{args.seed}__{int(time.time())}"
    )
    writer = MetricsWriter(run_name, args)
    journal_run(run_name, _sys.argv, "running")

    n = env.num_envs
    init_runner, step_fn, act_greedy = make_dqn_hostloop(
        env, model, cfg, greedy_fn=greedy_fn, update_fn=update_fn, tx=tx
    )
    runner = jax.jit(init_runner)(jax.random.PRNGKey(args.seed))
    if getattr(args, "load_from", ""):
        # Resume semantics (hang/outage recovery): only the train state
        # (params + target + opt) is checkpointed — the replay ring stays
        # on device and restarts cold.  The fresh runner's global_step=0
        # re-gates updates on a full learning_starts refill (near-on-policy
        # data from the restored net), and the caller clamps the epsilon
        # schedule to end_e (scripts/{dqn,c51}_rom.py) so the refill is
        # collected at the final behavior policy, not a re-exploration.
        ts = load_run(
            args.load_from, target=jax.device_get(runner.train_state)
        )
        runner = runner.replace(train_state=ts)
        print(f"resumed train state from {args.load_from}", flush=True)
    step_jit = jax.jit(step_fn)
    eval_jit = jax.jit(act_greedy)
    print("runner initialized", flush=True)

    def to_u8(audio):
        return quant_audio_u8(audio)

    frames, audio = env._host_reset()
    audio_u8 = to_u8(audio)
    reward = np.zeros(n, np.float32)
    done = np.zeros(n, np.uint8)
    action_np = np.zeros(n, np.int32)
    store = False

    ep_ret = np.zeros(n, np.float64)
    recent: list = []
    recent_score: list = []
    gs = 0
    pool_i = 0
    start = time.time()
    print_every = max(1, getattr(args, "print_interval", 1))
    while gs < cfg.total_timesteps:
        runner, action_dev, metrics = step_jit(
            runner, frames, audio_u8, reward, done, action_np,
            np.bool_(store),
        )
        store = True
        action_np = np.asarray(action_dev)
        frames, audio, kd, ld, done, win, score, _life = env._host_step(
            action_np
        )
        audio_u8 = to_u8(audio)
        reward = np.asarray(env._reward(kd, ld, win), np.float32)
        ep_ret += reward
        for i in np.nonzero(done)[0]:
            recent.append(float(ep_ret[i]))
            recent_score.append(int(score[i]))
            ep_ret[i] = 0.0
        gs += n
        pool_i += 1
        if pool_i % (print_every * 50) == 0:
            m = jax.device_get(metrics)
            ret = float(np.mean(recent[-40:])) if recent else float("nan")
            if recent:
                writer.scalar("charts/episodic_return", ret, gs)
            writer.scalar("losses/td_loss", float(m["td_loss"]), gs)
            writer.scalar("losses/q_values", float(m["q_values"]), gs)
            sps = gs / (time.time() - start)
            print(
                f"pool_step={pool_i} global_step={gs} "
                f"episodic_return={ret:.2f} "
                f"score={np.mean(recent_score[-40:]) if recent_score else 0:.2f} "
                f"eps={float(m['epsilon']):.3f} q={float(m['q_values']):.2f} "
                f"SPS={sps:.0f}",
                flush=True,
            )
        if getattr(args, "save_interval", 0) and pool_i % (
            args.save_interval * 50
        ) == 0:
            # The 4 GB replay ring stays on device; only the train state
            # (params + target + opt) is worth writing to disk.
            save_run(runner.train_state, run_name, args.save_dir)

    if getattr(args, "save_interval", 0):
        # Final save BEFORE the eval phase: a short resume segment can end
        # between two periodic save points (cadence save_interval*50 pool
        # steps), and the eval loop is itself outage-prone over the tunnel —
        # without this, the fully-trained net exists only in memory (this
        # exact loss happened to the 1M DQN-BRICK final, 2026-08-20).
        save_run(runner.train_state, run_name, args.save_dir)

    result = {
        "run_name": run_name,
        "global_step": gs,
        "episodic_return": float(np.mean(recent[-40:])) if recent else 0.0,
    }
    if eval_steps:
        # ``eval_steps`` counts POOL steps (each advancing all n envs once).
        # A surviving policy only finishes episodes at the time-limit cap, so
        # fewer pool iterations than the cap would record ZERO episodes —
        # floor the window at cap + margin (the dt_rom.py eval convention).
        eval_pool_steps = max(
            eval_steps, getattr(env, "episode_steps", 0) + 100
        )
        frames, audio = env._host_reset()
        audio_u8 = to_u8(audio)
        ep_ret = np.zeros(n, np.float64)
        ev_rets, ev_scores = [], []
        params = runner.train_state.params
        for _ in range(eval_pool_steps):
            a = np.asarray(eval_jit(params, frames, audio_u8))
            frames, audio, kd, ld, done, win, score, _life = env._host_step(a)
            audio_u8 = to_u8(audio)
            ep_ret += np.asarray(env._reward(kd, ld, win), np.float32)
            for i in np.nonzero(done)[0]:
                ev_rets.append(float(ep_ret[i]))
                ev_scores.append(int(score[i]))
                ep_ret[i] = 0.0
        if ev_rets:
            result["eval_episodic_return"] = float(np.mean(ev_rets))
            result["eval_score"] = float(np.mean(ev_scores))
            result["eval_episodes"] = len(ev_rets)
            writer.scalar(
                "eval/episodic_return", result["eval_episodic_return"], gs
            )
            print(
                f"final greedy eval: return={result['eval_episodic_return']:.2f} "
                f"score={result['eval_score']:.2f} over {len(ev_rets)} episodes"
            )
    journal_run(run_name, _sys.argv, "finished")
    writer.close()
    return result
