"""Two-player PONG on a REAL emulated cartridge — the multi-agent Atari leg.

The reference's multi-agent script is ppo_pettingzoo_ma_atari.py:
param-sharing PPO on 2-player Atari through PettingZoo, and its example
env IS Pong (reference: cleanrl/ppo_pettingzoo_ma_atari.py:150-159).
PettingZoo/ale-py are unreachable here (zero egress), so this env supplies
the same contract on an in-repo cartridge: native/homebrew/pong.asm runs
on the from-scratch 2600 core with BOTH joysticks driven by learned agents
(native/atari/abi_env.cc `mmtrl_abi2` entry points).

Param-sharing contract (the SuperSuit pattern, MA slots as batch rows):
each joint env contributes TWO agent slots, interleaved
``[env0-p0, env0-p1, env1-p0, ...]``.  Where minecraft2d_ma distinguishes
slots with an agent-indicator channel, pong exploits the cartridge's
EXACT mirror symmetry instead: player 1's video plane is flipped
horizontally, so both slots observe "I am the left paddle" and one shared
policy plays both sides with zero extra input channels.  The audio tracker
tone encodes ball HEIGHT (flip-invariant by design — pong.asm header), so
the MFCC planes are shared untouched.

Rewards are zero-sum ALE-Pong style: slot reward = own score delta −
opponent score delta (+1 when you score, −1 when you concede).  Episodes
end at 21 points (cartridge STATUS) or the frame cap.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from mmtrl_tpu.envs.homebrew_native import NativeHomebrew

NUM_AGENTS = 2
PONG_ROM = os.path.join(
    os.path.dirname(__file__), "..", "..", "native", "homebrew", "pong.bin"
)


class NativePong2P(NativeHomebrew):
    """Batched 2-player pool: ``num_envs`` JOINT cartridges, ``2*num_envs``
    agent slots.

    Duck-types the host-loop pool contract (algos/ppo/hostloop.py) at slot
    granularity: ``_host_step`` takes interleaved slot actions ``(2n,)``
    and returns per-slot reward components/done flags ``(2n,)``, while the
    raw frame/audio tensors stay per-JOINT-env ``(n, ...)`` — ``_obs``
    expands them to slots (and flips player 1's view).  Training scripts
    must size the PPO batch as ``2 * num_envs`` slots.
    """

    PREFIX = "mmtrl_abi2"

    def __init__(self, num_envs: int, rom_path: str = PONG_ROM, **kw):
        kw.setdefault("reward_mode", "score")
        super().__init__(num_envs=num_envs, rom_path=rom_path, **kw)
        self.num_joint = num_envs
        self.num_slots = NUM_AGENTS * num_envs
        # sticky-action memory is per SLOT (each player repeats its own
        # previous action independently, the ALE convention per agent)
        self._sticky_prev = np.zeros(self.num_slots, np.int32)

    # ---- host callbacks (slot-granular) -----------------------------------
    def _host_step(self, actions: np.ndarray):
        """``actions``: (2n,) interleaved slot actions."""
        actions = np.ascontiguousarray(actions, dtype=np.int32)
        if self.repeat_action_probability > 0.0:
            m = (
                self._sticky_rng.random(self.num_slots)
                < self.repeat_action_probability
            )
            actions = np.where(m, self._sticky_prev, actions).astype(np.int32)
        n = self.num_joint
        frames = np.zeros((n, 192, 160), np.uint8)
        audio = np.zeros((n, 2, self.audio_len), np.float32)
        sd0 = np.zeros(n, np.int32)
        sd1 = np.zeros(n, np.int32)
        done = np.zeros(n, np.uint8)
        win = np.zeros(n, np.uint8)
        s0 = np.zeros(n, np.int32)
        s1 = np.zeros(n, np.int32)
        self._fn("step")(
            self._handle, actions, frames, audio, sd0, sd1, done, win, s0, s1
        )
        # Zero-sum per-slot rewards (own minus opponent), interleaved.
        kd = np.stack([sd0 - sd1, sd1 - sd0], axis=1).reshape(-1)
        ld = np.zeros_like(kd)
        done2 = np.repeat(done, NUM_AGENTS)
        win2 = np.repeat(win, NUM_AGENTS)
        # info slots: kills = own absolute score, life = opponent's.
        own = np.stack([s0, s1], axis=1).reshape(-1)
        opp = np.stack([s1, s0], axis=1).reshape(-1)
        if self.repeat_action_probability > 0.0:
            self._sticky_prev = np.where(
                done2.astype(bool), 0, actions
            ).astype(np.int32)
        return frames, audio, kd, ld, done2, win2, own, opp

    # ---- device-side observation synthesis --------------------------------
    def _obs(self, frames: jnp.ndarray, audio: jnp.ndarray) -> jnp.ndarray:
        """(n, 192, 160) + (n, 2, A) -> (2n, 3, 84, 84) slot observations.

        Slot p1's video plane is mirrored horizontally (egocentric view:
        "my paddle is on the left"); the MFCC planes encode ball height —
        flip-invariant — and are shared as-is.
        """
        base = super()._obs(frames, audio)  # (n, 3, 84, 84)
        flipped = base.at[:, 0].set(base[:, 0, :, ::-1])
        both = jnp.stack([base, flipped], axis=1)  # (n, 2, 3, 84, 84)
        return both.reshape((-1,) + base.shape[1:])

    @property
    def name(self) -> str:
        return "pong_ma_native"
