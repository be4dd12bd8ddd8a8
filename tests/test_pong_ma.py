"""The two-player PONG cartridge is a real, playable, MULTI-AGENT game.

Mirrors the RALLY/BRICK scripted-play strategy on the 2-player RL ABI
(native/atari/abi_env.cc mmtrl_abi2): both joysticks drive the actual ROM,
a scripted ball-tracker beats an idle opponent, the Python env's zero-sum
slot rewards and egocentric mirror observations follow their documented
contracts, and the param-sharing MA PPO script trains end to end
(reference contract: cleanrl/ppo_pettingzoo_ma_atari.py — param-sharing
PPO over 2-player Atari, example env Pong).
"""

import numpy as np
import pytest

from mmtrl_tpu.envs.pong_ma import PONG_ROM, NativePong2P

# zero-page test taps documented in native/homebrew/pong.asm
ZP_S0, ZP_S1, ZP_STATUS = 0x00, 0x01, 0x02
ZP_BALLX, ZP_BALLY, ZP_PAD0Y, ZP_PAD1Y = 0x03, 0x04, 0x07, 0x08

NOOP, LEFT, RIGHT, UP, DOWN, FIRE = range(6)


@pytest.fixture(scope="module")
def env():
    e = NativePong2P(num_envs=3, seed=7, frameskip=8, episode_steps=400)
    yield e
    e.close()


def tracker(ram: np.ndarray, pad_zp: int) -> np.ndarray:
    """Move the given paddle's centre toward the ball centre."""
    bally = ram[:, ZP_BALLY].astype(int)
    pady = ram[:, pad_zp].astype(int)
    return np.where(bally + 2 < pady + 8, UP, DOWN).astype(np.int32)


def joint(a0: np.ndarray, a1: np.ndarray) -> np.ndarray:
    return np.stack([a0, a1], axis=1).reshape(-1)


def test_boot_renders_both_paddles(env):
    frames, audio = env._host_reset()
    assert frames.shape == (3, 192, 160)
    assert audio.shape == (3, 2, env.audio_len)
    # top + bottom walls
    assert (frames[:, 0:6, :] > 0).all(), "top wall missing"
    assert (frames[:, 186:192, :] > 0).all(), "bottom wall missing"
    ram = env.ram()
    # both paddles centred at boot, drawn at their documented columns
    assert (ram[:, ZP_PAD0Y] == 88).all()
    assert (ram[:, ZP_PAD1Y] == 88).all()
    assert (frames[:, 96, 15:23] > 0).all(), "left paddle missing"
    assert (frames[:, 96, 137:145] > 0).all(), "right paddle missing"
    # mirror symmetry: the paddle columns map onto each other under x->159-x
    assert (ram[:, ZP_STATUS] == 0).all()
    assert (ram[:, ZP_S0] == 0).all() and (ram[:, ZP_S1] == 0).all()


def test_paddles_move_independently(env):
    env._host_reset()
    # P0 up, P1 down for a few steps
    a = joint(np.full(3, UP, np.int32), np.full(3, DOWN, np.int32))
    for _ in range(4):
        env._host_step(a)
    ram = env.ram()
    assert (ram[:, ZP_PAD0Y] < 88).all(), "P0 did not move up"
    assert (ram[:, ZP_PAD1Y] > 88).all(), "P1 did not move down"


def test_tracker_beats_idle_opponent(env):
    """The learnability probe: a ball-follower on P1 crushes an idle P0."""
    env._host_reset()
    tot0 = tot1 = 0
    noop = np.zeros(3, np.int32)
    for _ in range(400):
        ram = env.ram()
        _, _, kd, _, done2, _, own, opp = env._host_step(
            joint(noop, tracker(ram, ZP_PAD1Y))
        )
        sd1 = kd[1::2]  # P1's zero-sum reward
        tot1 += int(np.maximum(sd1, 0).sum())
        tot0 += int(np.maximum(-sd1, 0).sum())
    assert tot1 >= 10, f"tracker scored only {tot1}"
    assert tot1 > 3 * max(tot0, 1), f"no asymmetry: {tot0} vs {tot1}"


def test_zero_sum_slot_rewards(env):
    env._host_reset()
    acts = joint(np.full(3, UP, np.int32), np.full(3, UP, np.int32))
    for _ in range(100):
        _, _, kd, ld, done2, _, own, opp = env._host_step(acts)
        kd = kd.reshape(3, 2)
        assert (kd.sum(axis=1) == 0).all(), "slot rewards are not zero-sum"
        assert done2.shape == (6,) and ld.shape == (6,)
        # own/opp info slots swap between the two slots of a joint env
        assert (own.reshape(3, 2)[:, 0] == opp.reshape(3, 2)[:, 1]).all()


def test_obs_mirror_contract(env):
    """Slot p1's video plane is the horizontal flip of p0's; the MFCC
    planes (ball-height pitch: flip-invariant) are shared untouched."""
    import jax

    frames, audio = env._host_reset()
    a = joint(np.full(3, NOOP, np.int32), np.full(3, NOOP, np.int32))
    for _ in range(6):  # let the serve place the ball asymmetrically
        frames, audio, *_ = env._host_step(a)
    obs = np.asarray(jax.jit(env._obs)(frames, audio))
    assert obs.shape == (6, 3, 84, 84)
    p0, p1 = obs[0::2], obs[1::2]
    np.testing.assert_allclose(p1[:, 0], p0[:, 0, :, ::-1], atol=1e-6)
    np.testing.assert_allclose(p1[:, 1:], p0[:, 1:], atol=1e-6)
    # the video planes are NOT symmetric themselves (ball is off-centre
    # after a few steps), so the flip is a real transformation
    assert np.abs(p0[:, 0] - p0[:, 0, :, ::-1]).max() > 0.1


def test_deterministic_given_seed():
    def run():
        e = NativePong2P(num_envs=2, seed=13, frameskip=8, episode_steps=300)
        e._host_reset()
        out = []
        for t in range(50):
            a0 = np.full(2, UP if t % 3 else DOWN, np.int32)
            a1 = np.full(2, DOWN if t % 2 else UP, np.int32)
            _, _, kd, *_ = e._host_step(joint(a0, a1))
            out.append(e.ram()[:, [ZP_BALLX, ZP_BALLY, ZP_S0, ZP_S1]].copy())
        e.close()
        return np.stack(out)

    np.testing.assert_array_equal(run(), run())


def test_game_ends_at_21(env):
    """A full tracker-vs-idle game terminates via the cartridge's own
    STATUS flag (not the step cap) with the winner at 21."""
    e = NativePong2P(num_envs=1, seed=11, frameskip=8, episode_steps=3000)
    e._host_reset()
    noop = np.zeros(1, np.int32)
    final = None
    for t in range(2500):
        ram = e.ram()
        _, _, kd, _, done2, _, own, opp = e._host_step(
            joint(noop, tracker(ram, ZP_PAD1Y))
        )
        if done2[0]:
            final = (t, int(own[1]), int(opp[1]))  # P1's own/opp scores
            break
    e.close()
    assert final is not None, "game never ended"
    t, p1_score, p0_score = final
    assert p1_score == 21, f"winner score {p1_score} != 21"
    assert p0_score < 21


def test_ma_ppo_script_smoke(tmp_path):
    """The param-sharing MA PPO trainer runs end to end on the cartridge."""
    import sys

    sys.path.insert(0, "scripts")
    from ppo_ma_pong import Args, main

    args = Args(
        num_envs=2,
        num_steps=8,
        total_timesteps=64,
        num_minibatches=1,
        update_epochs=1,
        platform="cpu",
        print_interval=10,
    )
    out = main(args)
    assert out["global_step"] == 64
