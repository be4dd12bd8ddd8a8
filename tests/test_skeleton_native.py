"""Trainable native Skeleton+ env: RAM adapter + aimed-play integration.

Verifies the per-game RAM adapter (native/atari/skel_env.cc) end-to-end on
the REAL cartridge: the kill/life display-digit decoding, the line-of-sight
variable, shaped rewards, termination, and auto-reset.  The aimed-play test
is the strongest evidence the adapter is wired correctly — a scripted
hunter kills actual skeletons and the +10 kill rewards come back through
the env step API.  Skipped when the reference ROM is not mounted.
"""

import os
import shutil
from collections import deque

import numpy as np
import pytest

ROM = "/root/reference/environments/skeleton_plus/SkelPlus.bin"

if not os.path.exists(ROM):
    pytest.skip("reference Skeleton+ ROM not mounted", allow_module_level=True)
if shutil.which("make") is None:
    pytest.skip("no C++ toolchain", allow_module_level=True)

from mmtrl_tpu.envs.skeleton_native import (  # noqa: E402
    REWARD_KILL,
    NativeSkeletonPlus,
)

DELTAS = [0x01, 0x10, 0xFF, 0xF0]  # E, S, W, N on the 16x16 toroidal maze
FORWARD, TURN_LEFT, TURN_RIGHT, FIRE, NOOP = range(5)


@pytest.fixture(scope="module")
def rom_bytes():
    with open(ROM, "rb") as f:
        return f.read()


def test_initial_state_decodes_life_and_kills():
    env = NativeSkeletonPlus(num_envs=2, seed=3, frameskip=8)
    _, _, _, _, _, _, kills, life = env._host_step(np.zeros(2, np.int32))
    assert list(kills) == [0, 0]
    assert list(life) == [99, 99]
    env.close()


def test_episode_cap_auto_resets():
    env = NativeSkeletonPlus(num_envs=2, seed=0, frameskip=8, episode_steps=12)
    done_seen = 0
    for _ in range(30):
        *_, done, _, _, _ = _step(env, [NOOP, NOOP])
        done_seen += int(done.sum())
    assert done_seen >= 2
    env.close()


def _step(env, actions):
    out = env._host_step(np.asarray(actions, np.int32))
    frames, audio, kd, ld, done, win, kills, life = out
    return frames, audio, kd, ld, done, win, kills, life


class Hunter:
    """Aimed-play policy using the verified RAM map (see skel_env.cc)."""

    def __init__(self, rom_bytes):
        self.maze_tab = rom_bytes[0x800:0x900]

    def wall(self, pos, b2):
        return bool(self.maze_tab[pos] & b2)

    def shooting_cells(self, skel, b2):
        out = {}
        for d in DELTAS:
            c = skel
            for _ in range(3):  # shots land at LoS distance 1..3 only
                c = (c - d) & 0xFF
                if self.wall(c, b2):
                    break
                out.setdefault(c, d)
        return out

    def bfs_next(self, pos, targets, b2):
        if pos in targets:
            return None
        prev = {pos: None}
        q = deque([pos])
        while q:
            c = q.popleft()
            for d in DELTAS:
                n = (c + d) & 0xFF
                if n in prev or self.wall(n, b2):
                    continue
                prev[n] = (c, d)
                if n in targets:
                    while prev[n][0] != pos:
                        n = prev[n][0]
                    return prev[n][1]
                q.append(n)
        return None

    def act(self, ram):
        def z(a):
            return int(ram[a - 0x80])

        pos, fac, skel = z(0xAB), z(0xAC), z(0xAE)
        los, reload_, b2 = z(0x99), z(0x9C), z(0xB2)
        if los & 3 and reload_ == 0:
            return FIRE
        targets = self.shooting_cells(skel, b2)
        if pos in targets:
            want = targets[pos]
            if fac == want:
                return NOOP  # aligned, waiting for LoS/reload
            return self._turn(fac, want)
        d = self.bfs_next(pos, targets, b2)
        if d is None:
            return NOOP
        if fac == d:
            return FORWARD
        return self._turn(fac, d)

    @staticmethod
    def _turn(fac, want):
        cur = DELTAS.index(fac) if fac in DELTAS else 0
        diff = (DELTAS.index(want) - cur) % 4
        return TURN_RIGHT if diff in (1, 2) else TURN_LEFT


def test_aimed_play_kills_and_rewards(rom_bytes):
    env = NativeSkeletonPlus(num_envs=1, seed=0, frameskip=8)
    hunter = Hunter(rom_bytes)
    total_kill_reward = 0.0
    kills_seen = 0
    for _ in range(600):  # ~80 emulated seconds
        ram = env.ram()[0]
        a = hunter.act(ram)
        _, _, kd, ld, done, win, kills, life = _step(env, [a])
        if kd[0] > 0:
            kills_seen = int(kills[0])
            total_kill_reward += REWARD_KILL * float(kd[0])
        if kills_seen >= 2:
            break
    env.close()
    assert kills_seen >= 2, "aimed play should land at least two kills"
    assert total_kill_reward >= 2 * REWARD_KILL


def test_death_terminates_and_life_rewards_negative():
    env = NativeSkeletonPlus(num_envs=1, seed=0, frameskip=8)
    life_lost = 0
    terminated = False
    for _ in range(1500):
        _, _, kd, ld, done, win, kills, life = _step(env, [NOOP])
        life_lost += -int(ld[0])
        if done[0]:
            terminated = True
            break
    env.close()
    assert terminated, "standing still must eventually end the episode"
    assert life_lost >= 99, "death must consume the full life total"


def test_ppo_trains_on_the_real_rom():
    """scripts/skeleton_plus_ppo.py --backend native, tiny budget."""
    import importlib
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    mod = importlib.import_module("skeleton_plus_ppo")
    args = mod.Args(
        total_timesteps=256, num_envs=2, num_steps=16, num_minibatches=2,
        update_epochs=1, backend="native", track=False, save_interval=0,
        print_interval=10,
    )
    out = mod.main(args)
    assert out["global_step"] == 256


def test_ppo_hostloop_trains_on_the_real_rom():
    """--backend native --host-loop: host emulation + device update path
    (algos/ppo/hostloop.py), tiny budget, incl. the greedy eval loop."""
    import importlib
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    mod = importlib.import_module("skeleton_plus_ppo")
    args = mod.Args(
        total_timesteps=128, num_envs=2, num_steps=16, num_minibatches=2,
        update_epochs=1, backend="native", host_loop=True, eval_steps=8,
        track=False, save_interval=0, print_interval=10,
    )
    out = mod.main(args)
    assert out["global_step"] == 128


def test_contract_matches_simulator():
    from mmtrl_tpu.envs.skeleton_plus import SkeletonPlusSim

    env = NativeSkeletonPlus(num_envs=1)
    sim = SkeletonPlusSim()
    assert env.observation_space.shape == sim.observation_space.shape
    assert env.num_actions == sim.num_actions
    env.close()


def test_ppo_hostloop_resume_continues(tmp_path, capsys):
    """Host-loop checkpoint resume continues the update counter.

    This is the reboot-recovery path the long ROM training lane depends on
    (tools/preserve_ckpt.sh): after a host reboot the lane restarts with
    --load-from and must continue at the derived update, not at update 1
    (reference resume contract: src/utils.py:40-44, src/train.py:120-123).
    """
    import importlib
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    mod = importlib.import_module("skeleton_plus_ppo")
    save_dir = str(tmp_path / "ckpt")
    common = dict(
        num_envs=2, num_steps=16, num_minibatches=2, update_epochs=1,
        backend="native", host_loop=True, eval_steps=0, track=False,
        print_interval=100, seed=3, save_dir=save_dir,
    )
    # Phase 1: 4 updates of 32 steps, checkpointing.
    args1 = mod.Args(
        total_timesteps=128, save_interval=2, exp_name="hl_resume_a", **common
    )
    out1 = mod.main(args1)
    ckpt = os.path.join(save_dir, out1["run_name"])
    assert os.path.exists(ckpt)
    capsys.readouterr()

    # Phase 2: resume with double the budget -> starts at update 5
    # (4 updates x 2 opt-steps each -> opt step 8 -> update 8//2+1).
    args2 = mod.Args(
        total_timesteps=256, save_interval=0, load_from=ckpt,
        exp_name="hl_resume_b", **common
    )
    out2 = mod.main(args2)
    assert out2["global_step"] == 256
    assert "resuming at update 5" in capsys.readouterr().out
