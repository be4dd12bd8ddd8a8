"""Host-loop off-policy training: host envs + TPU updates over the tunnel.

The scanned device path (runner.py) needs ``io_callback`` to reach host
envs from inside jit, which cannot cross a remote-TPU tunnel — the same
constraint that forces the reference's torch scripts to loop on the host
(reference: cleanrl/sac_continuous_action.py rollout loop).  This runner
splits the program the way the reference does, but keeps ALL update math on
the accelerator:

- host: real gymnasium/MuJoCo envs (envs/gym_bridge.GymPool host surface),
  behavior-action selection on the local CPU jax backend, raw episode
  statistics;
- device: the replay buffer AND the per-step update cadence, executed as
  one jitted ``chunk_fn`` that scans the algo's ``insert_update`` (the
  exact code the fully-fused device path runs) over each chunk of
  ``chunk_size`` host transitions.

Semantics vs the reference: update math, update:data ratio, buffer
contents, and cadence (policy_frequency etc.) are identical.  The one
deviation is behavior-policy staleness: actions within a chunk use actor
params from the end of the previous chunk (<= chunk_size env steps old,
default 64) instead of the current step's params — off-policy algorithms
are insensitive to this by construction, and the warmup phase (uniform
random actions, no updates) is unaffected.  Validated: HalfCheetah-v4 SAC
host-loop matches the round-2 exact-interleave CPU run (RESULTS.md).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmtrl_tpu.core.checkpoint import load_run, save_run
from mmtrl_tpu.core.metrics import MetricsWriter


class SpecEnv:
    """Shape/space stand-in handed to the algo factories in host-loop mode.

    ``v_reset`` returns zeros (used only for model init shapes); ``v_step``
    must never be traced — the host loop uses chunk_fn, not step_fn.
    """

    def __init__(self, pool, num_envs: int):
        self.observation_space = pool.observation_space
        self.action_space = pool.action_space
        self._num_envs = num_envs
        self.name = pool.name

    def v_reset(self, keys):
        n = keys.shape[0]
        obs = jnp.zeros(
            (n,) + tuple(self.observation_space.shape), jnp.float32
        )
        return obs, jnp.zeros((n,), jnp.int32)

    def v_step(self, keys, state, action):  # pragma: no cover
        raise NotImplementedError("host-loop mode never steps the SpecEnv")


def host_greedy_eval(
    pool_cls, env_id: str, act_greedy, params_cpu, episodes: int, seed: int
) -> float:
    """Greedy rollouts on a fresh host env; returns the mean raw return."""
    pool = pool_cls(env_id, 1, seed=seed)
    obs = pool._host_reset()
    rets, cur = [], 0.0
    while len(rets) < episodes:
        a = np.asarray(act_greedy(params_cpu, obs))
        obs, _f, _r, raw_r, done, _t = pool._host_step(a)
        cur += float(raw_r[0])
        if done[0]:
            rets.append(cur)
            cur = 0.0
    pool.close()
    return float(np.mean(rets))


def run_offpolicy_hostloop(
    factory,
    pool,
    actor_model,
    critic_model,
    cfg,
    args,
    run_name: Optional[str] = None,
    eval_episodes: int = 20,
) -> dict:
    """``factory(env, actor, critic, cfg) -> AlgoParts`` (sac/td3/ddpg)."""
    import sys as _sys

    from mmtrl_tpu.utils.resume import journal_run

    run_name = run_name or (
        f"{args.env_id}__{args.exp_name}__{args.seed}__{int(time.time())}"
    )
    writer = MetricsWriter(run_name, args)
    journal_run(run_name, _sys.argv, "running")

    n = cfg.num_envs
    chunk = int(getattr(args, "chunk_size", 64))
    spec = SpecEnv(pool, n)
    parts = factory(spec, actor_model, critic_model, cfg)
    runner = parts[0](jax.random.PRNGKey(args.seed))
    if getattr(args, "load_from", ""):
        runner = load_run(args.load_from, target=jax.device_get(runner))
        print(f"resuming at global_step {int(jax.device_get(runner.global_step))}")

    cpu = jax.devices("cpu")[0]
    # No donation: freshly-initialized target params can alias their source
    # buffers (f(donate(a), donate(a)) is an XLA error), and the runner tree
    # stays device-resident either way.
    chunk_jit = jax.jit(parts.chunk_fn)
    with jax.default_device(cpu):
        act_explore = jax.jit(parts.act_explore)
        act_greedy = jax.jit(parts.act_greedy)

    def fetch_params():
        return jax.device_put(
            jax.device_get(parts.actor_params(runner.train_state)), cpu
        )

    params_cpu = fetch_params()
    act_key = jax.device_put(jax.random.PRNGKey(args.seed + 1), cpu)

    rng = np.random.default_rng(args.seed)
    a_low = np.asarray(pool.action_space.low, np.float32)
    a_high = np.asarray(pool.action_space.high, np.float32)
    a_shape = tuple(pool.action_space.shape)
    obs_shape = tuple(pool.observation_space.shape)

    obs = pool._host_reset()
    ep_ret = np.zeros(n)
    recent: list = []
    gs = int(jax.device_get(runner.global_step))
    total = cfg.total_timesteps
    t_obs = np.empty((chunk, n) + obs_shape, np.float32)
    t_nobs = np.empty_like(t_obs)
    t_act = np.empty((chunk, n) + a_shape, np.float32)
    t_rew = np.empty((chunk, n), np.float32)
    t_done = np.empty((chunk, n), np.float32)

    print_every_steps = max(
        1, getattr(args, "print_interval", 1)
    ) * getattr(cfg, "steps_per_iteration", 512)
    next_print = gs + print_every_steps
    chunk_i = 0
    last_return = 0.0
    while gs < total:
        for t in range(chunk):
            if gs < cfg.learning_starts:
                action = rng.uniform(a_low, a_high, (n,) + a_shape).astype(
                    np.float32
                )
            else:
                act_key, sub = jax.random.split(act_key)
                action = np.asarray(act_explore(params_cpu, obs, sub))
            nobs, final_obs, rew, raw_rew, done, trunc = pool._host_step(action)
            t_obs[t] = obs
            t_act[t] = action
            t_rew[t] = rew
            # SB3 handle_timeout_termination: done excludes time-limit
            # truncation; next_obs is the TRUE post-transition observation.
            t_done[t] = done.astype(bool) & ~trunc.astype(bool)
            t_nobs[t] = np.where(done[:, None], final_obs, nobs)
            ep_ret += raw_rew
            for i in np.nonzero(done)[0]:
                recent.append(float(ep_ret[i]))
                ep_ret[i] = 0.0
            obs = nobs
            gs += n
        runner, metrics = chunk_jit(
            runner,
            dict(
                obs=t_obs, action=t_act, reward=t_rew,
                next_obs=t_nobs, done=t_done,
            ),
        )
        params_cpu = fetch_params()  # sync point: <= chunk-step staleness
        chunk_i += 1
        if gs >= next_print:
            next_print += print_every_steps
            if recent:
                last_return = float(np.mean(recent[-20:]))
                writer.scalar("charts/episodic_return", last_return, gs)
            writer.scalars(jax.device_get(metrics), gs)
            sps = writer.sps(gs)
            print(
                f"chunk={chunk_i} global_step={gs} "
                f"episodic_return={last_return:.2f} SPS={sps:.0f}"
            )
        if getattr(args, "save_interval", 0) and chunk_i % args.save_interval == 0:
            save_run(runner, run_name, args.save_dir)

    if getattr(args, "save_interval", 0):
        save_run(runner, run_name, args.save_dir)
    result = {
        "run_name": run_name,
        "global_step": gs,
        "episodic_return": last_return,
    }
    ev = host_greedy_eval(
        type(pool), args.env_id, act_greedy, params_cpu,
        eval_episodes, args.seed + 10_000,
    )
    writer.scalar("eval/episodic_return", ev, gs)
    print(f"final greedy eval: return={ev:.2f} over {eval_episodes} episodes")
    result["eval_episodic_return"] = ev
    journal_run(run_name, _sys.argv, "finished")
    writer.close()
    pool.close()
    return result
