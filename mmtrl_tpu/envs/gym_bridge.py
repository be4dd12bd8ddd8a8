"""Host-bound gymnasium/MuJoCo envs behind the functional Environment
surface — the reference's continuous-control benchmark path
(cleanrl/ppo_continuous_action.py:86-96, td3/ddpg/sac MuJoCo scripts).

MuJoCo's C engine can't live inside an XLA program; the pool steps real
``gymnasium.make(env_id)`` instances on host and crosses into jit through
``jax.experimental.io_callback`` (ordered), exactly like the native 2600
bridge (envs/skeleton_native.py).  Auto-reset happens host-side with
EnvPool semantics: the obs returned with done=1 is the fresh episode's
first obs, while ``info["final_obs"]`` carries the true post-transition
observation and ``info["truncated"]`` the time-limit flag — the SB3
handle_timeout_termination contract the off-policy buffers rely on.

``wrap`` applies the reference's literal wrapper stack per sub-env
(gym.wrappers.ClipAction / NormalizeObservation / NormalizeReward +
the +/-10 clips) so continuous PPO runs with bit-parity normalization.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mmtrl_tpu.envs import spaces


def _raw_recorder_cls():
    import gymnasium as gym

    class _RawRewardRecorderImpl(gym.Wrapper):
        """Stashes the pre-normalization reward in info["raw_reward"] so
        episode statistics report raw returns (the reference applies
        RecordEpisodeStatistics under the reward transforms)."""

        def step(self, action):
            obs, reward, term, trunc, info = self.env.step(action)
            info = dict(info, raw_reward=float(reward))
            return obs, reward, term, trunc, info

    return _RawRewardRecorderImpl


def _RawRewardRecorder(env):
    return _raw_recorder_cls()(env)


def _dm_control_env(env_id: str, seed: int = 0):
    """Minimal dm_control→gymnasium shim (shimmy isn't installed here).

    The reference's RPO benchmark runs the dm_control suite through shimmy's
    DmControlCompatibility + FlattenObservation (cleanrl/rpo_continuous_action.py
    docs, rpo.md:116+).  ``env_id`` format: ``dm_control/<domain>-<task>``
    (e.g. dm_control/ball_in_cup-catch).  Observations flatten to a vector;
    dm_control's 1000-step episode end is a time-limit truncation
    (discount==1 at last()), matching gym semantics.
    """
    import gymnasium as gym
    from dm_control import suite

    domain, task = env_id.split("/", 1)[1].rsplit("-", 1)

    class DmControlToGym(gym.Env):
        def __init__(self):
            self._seed = seed
            self._env = suite.load(
                domain, task, task_kwargs={"random": seed}
            )
            spec = self._env.action_spec()
            self.action_space = gym.spaces.Box(
                np.asarray(spec.minimum, np.float32),
                np.asarray(spec.maximum, np.float32),
                dtype=np.float32,
            )
            dim = sum(
                max(1, int(np.prod(v.shape)))
                for v in self._env.observation_spec().values()
            )
            self.observation_space = gym.spaces.Box(
                -np.inf, np.inf, (dim,), np.float64
            )

        @staticmethod
        def _flat(obs) -> np.ndarray:
            return np.concatenate(
                [np.asarray(v, np.float64).ravel() for v in obs.values()]
            )

        def reset(self, seed=None, options=None):
            # gymnasium contract: any explicit seed deterministically restarts
            # the RNG stream, even if it equals the previously-used seed.
            if seed is not None:
                self._seed = seed
                self._env = suite.load(
                    domain, task, task_kwargs={"random": seed}
                )
            ts = self._env.reset()
            return self._flat(ts.observation), {}

        def step(self, action):
            ts = self._env.step(np.asarray(action))
            reward = float(ts.reward or 0.0)
            last = ts.last()
            terminated = bool(last and ts.discount == 0.0)
            truncated = bool(last and not terminated)
            return self._flat(ts.observation), reward, terminated, truncated, {}

    return DmControlToGym()


class GymPool:
    """Batched host gymnasium envs, jit-compatible via io_callback."""

    def __init__(
        self,
        env_id: str,
        num_envs: int,
        seed: int = 0,
        wrap: str = "none",  # "none" | "ppo_continuous" (reference stack)
        gamma: float = 0.99,
    ):
        import gymnasium as gym

        self.env_id = env_id
        self.num_envs = num_envs
        self._envs = []
        for i in range(num_envs):
            if env_id.startswith("dm_control/"):
                e = _dm_control_env(env_id, seed=seed * 1000 + i)
            else:
                e = gym.make(env_id)
            if wrap == "ppo_continuous":
                # cleanrl/ppo_continuous_action.py:86-96, minus the video
                # recorder (handled by utils/video.py).
                e = gym.wrappers.ClipAction(e)
                e = gym.wrappers.NormalizeObservation(e)
                e = gym.wrappers.TransformObservation(
                    e, lambda obs: np.clip(obs, -10, 10), e.observation_space
                )
                e = _RawRewardRecorder(e)
                e = gym.wrappers.NormalizeReward(e, gamma=gamma)
                e = gym.wrappers.TransformReward(
                    e, lambda r: float(np.clip(r, -10, 10))
                )
            self._envs.append(e)
        self._seeds = [seed * 1000 + i for i in range(num_envs)]
        obs_space = self._envs[0].observation_space
        act_space = self._envs[0].action_space
        self._obs_shape = tuple(obs_space.shape)
        if hasattr(act_space, "n"):
            self._act_space = spaces.Discrete(int(act_space.n))
            self._discrete = True
        else:
            self._act_space = spaces.Box(
                np.asarray(act_space.low, np.float32),
                np.asarray(act_space.high, np.float32),
                tuple(act_space.shape),
            )
            self._discrete = False
        lo = getattr(obs_space, "low", None)
        hi = getattr(obs_space, "high", None)
        self._obs_space = spaces.Box(
            -np.inf if lo is None else lo,
            np.inf if hi is None else hi,
            self._obs_shape,
        )

    # ---- host side --------------------------------------------------------
    def _host_reset(self) -> np.ndarray:
        obs = np.stack(
            [
                e.reset(seed=s)[0]
                for e, s in zip(self._envs, self._seeds)
            ]
        ).astype(np.float32)
        return obs

    def _host_step(self, actions: np.ndarray):
        n = self.num_envs
        obs = np.zeros((n,) + self._obs_shape, np.float32)
        final_obs = np.zeros_like(obs)
        rewards = np.zeros(n, np.float32)
        raw_rewards = np.zeros(n, np.float32)
        dones = np.zeros(n, np.uint8)
        truncs = np.zeros(n, np.uint8)
        for i, e in enumerate(self._envs):
            a = actions[i]
            if self._discrete:
                a = int(a)
            o, r, term, trunc, info = e.step(a)
            rewards[i] = r
            # RecordEpisodeStatistics puts the RAW return in info["episode"];
            # per-step raw reward comes through unwrapped access when a
            # reward transform is active.
            raw_rewards[i] = info.get("raw_reward", r)
            final_obs[i] = o
            if term or trunc:
                dones[i] = 1
                truncs[i] = 1 if (trunc and not term) else 0
                o, _ = e.reset()
            obs[i] = o
        return obs, final_obs, rewards, raw_rewards, dones, truncs

    def close(self):
        for e in self._envs:
            e.close()

    # ---- vectorized Environment surface ------------------------------------
    def v_reset(self, keys: jax.Array):
        from jax.experimental import io_callback

        del keys
        shape = jax.ShapeDtypeStruct(
            (self.num_envs,) + self._obs_shape, jnp.float32
        )
        obs = io_callback(self._host_reset, shape, ordered=True)
        return obs, jnp.zeros((self.num_envs,), jnp.int32)

    def v_step(self, keys: jax.Array, state: jnp.ndarray, action: jnp.ndarray):
        from jax.experimental import io_callback

        del keys
        n = self.num_envs
        obs_sh = jax.ShapeDtypeStruct((n,) + self._obs_shape, jnp.float32)
        shapes = (
            obs_sh,
            obs_sh,
            jax.ShapeDtypeStruct((n,), jnp.float32),
            jax.ShapeDtypeStruct((n,), jnp.float32),
            jax.ShapeDtypeStruct((n,), jnp.uint8),
            jax.ShapeDtypeStruct((n,), jnp.uint8),
        )
        obs, final_obs, reward, raw_reward, done, trunc = io_callback(
            self._host_step, shapes, action, ordered=True
        )
        info: Dict[str, jnp.ndarray] = {
            "final_obs": final_obs,
            "raw_reward": raw_reward,
            "truncated": trunc.astype(bool),
        }
        return obs, state + 1, reward, done.astype(bool), info

    @property
    def observation_space(self):
        return self._obs_space

    @property
    def action_space(self):
        return self._act_space

    @property
    def num_actions(self) -> int:
        return self._act_space.n

    @property
    def name(self) -> str:
        return self.env_id


def make_any(
    env_id: str,
    num_envs: Optional[int] = None,
    seed: int = 0,
    wrap: str = "none",
    gamma: float = 0.99,
):
    """Pure-JAX registry env when available; gymnasium bridge otherwise.

    Returns (env, is_bridge): bridge envs are batched with a fixed
    num_envs and ignore the per-step PRNG keys."""
    from mmtrl_tpu.envs.registry import make, registry, _populate

    if not registry:
        _populate()
    if env_id.lower() in registry:
        return make(env_id), False
    return GymPool(env_id, num_envs or 1, seed=seed, wrap=wrap, gamma=gamma), True
