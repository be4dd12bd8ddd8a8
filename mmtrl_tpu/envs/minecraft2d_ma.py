"""Two-agent Minecraft2d for parameter-sharing multi-agent PPO.

The reference's multi-agent path runs param-sharing PPO on PettingZoo Atari
with an agent-indicator channel appended by SuperSuit (reference:
cleanrl/ppo_pettingzoo_ma_atari.py:150-159 — agent_indicator_v0).  The same
structure on the device-resident gridworld: two agents share the grid, the
gem, and the targets; each agent observes the shared (video, audio) pair
plus an indicator channel identifying which agent it is; both act every
step; rewards are individual (+10/-10 for the agent that reaches a target,
-1 step cost each); the episode ends when EITHER agent reaches a target or
at the time limit.

The env exposes PER-AGENT slots: `v_reset`/`v_step` treat the batch
dimension as (num_envs * num_agents), exactly how parameter sharing batches
all agents through one policy.  Joint dynamics are resolved inside the
shared EnvState.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from mmtrl_tpu.envs import spaces
from mmtrl_tpu.envs.assets import (
    GRID,
    IMG,
    N_TILES,
    T_AGENT,
    T_BAD,
    T_GEM,
    T_GOOD,
    audio_planes,
    minecraft_render_bank,
)
from mmtrl_tpu.envs.base import Environment
from mmtrl_tpu.envs.minecraft2d import (
    GEM_GOLD,
    LISTEN_RANGE_SQ,
    MAX_ITER,
    REWARD_BAD,
    REWARD_GOOD,
    REWARD_STEP,
)

NUM_AGENTS = 2


@struct.dataclass
class MAState:
    agents: jnp.ndarray  # (2, 2) int32 rows/cols
    good: jnp.ndarray
    bad: jnp.ndarray
    gem: jnp.ndarray
    gem_type: jnp.ndarray
    t: jnp.ndarray


class MultiAgentMinecraft2d(Environment):
    """Joint env; observations/actions/rewards carry a leading (2,) agent dim."""

    num_agents = NUM_AGENTS

    def __init__(self):
        self._bank = jnp.asarray(minecraft_render_bank())
        self._audio = jnp.asarray(audio_planes())

    def _reset(self, key):
        k_cells, k_gem = jax.random.split(key)
        cells = jax.random.choice(
            k_cells, GRID * GRID, shape=(5,), replace=False
        ).astype(jnp.int32)
        locs = jnp.stack([cells // GRID, cells % GRID], axis=-1)
        state = MAState(
            agents=locs[:2],
            good=locs[2],
            bad=locs[3],
            gem=locs[4],
            gem_type=jax.random.randint(k_gem, (), 0, 2, dtype=jnp.int32),
            t=jnp.zeros((), jnp.int32),
        )
        return self._obs(state), state

    def _obs(self, s: MAState) -> jnp.ndarray:
        """(2, 3, 84, 84): shared frame+audio, per-agent indicator channel."""
        cell = lambda loc: loc[0] * GRID + loc[1]  # noqa: E731
        tiles = jnp.zeros(GRID * GRID, dtype=jnp.int32)
        tiles = tiles.at[cell(s.gem)].set(T_GEM)
        tiles = tiles.at[cell(s.bad)].set(T_BAD)
        tiles = tiles.at[cell(s.good)].set(T_GOOD)
        tiles = tiles.at[cell(s.agents[0])].set(T_AGENT)
        tiles = tiles.at[cell(s.agents[1])].set(T_AGENT)
        onehot = jax.nn.one_hot(tiles, N_TILES, dtype=jnp.float32)
        frame = jnp.clip(jnp.einsum("pt,ptyx->yx", onehot, self._bank), 0.0, 255.0)
        frame = frame * (2.0 / 255.0) - 1.0

        def agent_obs(i):
            d2 = jnp.sum((s.agents[i] - s.gem) ** 2)
            audio_idx = jnp.where(d2 <= LISTEN_RANGE_SQ, s.gem_type, 2)
            indicator = jnp.full((IMG, IMG), -1.0 + 2.0 * i, jnp.float32)
            return jnp.stack([frame, self._audio[audio_idx], indicator])

        return jnp.stack([agent_obs(0), agent_obs(1)])

    def _step_env(self, key, state: MAState, action):
        deltas = jnp.array([[-1, 0], [1, 0], [0, 1], [0, -1]], dtype=jnp.int32)
        agents = jnp.clip(state.agents + deltas[action], 0, GRID - 1)

        def agent_reward(loc):
            at_good = jnp.all(loc == state.good)
            at_bad = jnp.all(loc == state.bad)
            gold = state.gem_type == GEM_GOLD
            r = jnp.where(
                (at_good & gold) | (at_bad & ~gold),
                REWARD_GOOD,
                jnp.where((at_good & ~gold) | (at_bad & gold), REWARD_BAD, REWARD_STEP),
            )
            return r.astype(jnp.float32), at_good | at_bad

        r0, done0 = agent_reward(agents[0])
        r1, done1 = agent_reward(agents[1])
        new = state.replace(agents=agents, t=state.t + 1)
        done_shared = done0 | done1 | (new.t >= MAX_ITER)
        rewards = jnp.stack([r0, r1])
        dones = jnp.stack([done_shared, done_shared])
        return self._obs(new), new, rewards, dones, {}

    # ---- per-agent-slot vectorized API -----------------------------------
    def v_reset(self, keys: jax.Array):
        """keys: (num_envs * 2,); consecutive pairs share one joint env."""
        num_envs = keys.shape[0] // NUM_AGENTS
        obs, state = jax.vmap(self._reset)(keys[::NUM_AGENTS])
        return obs.reshape((num_envs * NUM_AGENTS,) + obs.shape[2:]), state

    def v_step(self, keys: jax.Array, state, action):
        num_envs = keys.shape[0] // NUM_AGENTS
        joint_action = action.reshape(num_envs, NUM_AGENTS)

        def step_one(key, s, a):
            key_step, key_reset = jax.random.split(key)
            obs_st, s_st, r, d, info = self._step_env(key_step, s, a)
            obs_rs, s_rs = self._reset(key_reset)
            from mmtrl_tpu.envs.base import tree_select

            done_any = d[0]
            s_new = tree_select(done_any, s_rs, s_st)
            obs = jnp.where(done_any, obs_rs, obs_st)
            return obs, s_new, r, d, info

        obs, state, rewards, dones, info = jax.vmap(step_one)(
            keys[::NUM_AGENTS], state, joint_action
        )
        flat = lambda x: x.reshape((num_envs * NUM_AGENTS,) + x.shape[2:])  # noqa: E731
        return flat(obs), state, flat(rewards), flat(dones), info

    @property
    def observation_space(self):
        return spaces.Box(-1.0, 1.0, (3, IMG, IMG))

    @property
    def action_space(self):
        return spaces.Discrete(4)

    @property
    def name(self):
        return "minecraft_ma"
