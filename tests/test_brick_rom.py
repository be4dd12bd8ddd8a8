"""The homebrew BRICK cartridge is a real, playable, learnable Breakout.

Mirrors tests/test_rally_rom.py: drive the actual ROM through the generic
RL-ABI adapter (native/atari/abi_env.cc) and show that a policy which
understands the game (track the ball with the paddle) breaks bricks and
scores, while random play does not — i.e. the env carries learnable signal
end to end through the from-scratch 6507/TIA core.  BRICK stands in for
the reference's Breakout Atari leg (cleanrl dqn_atari/ppo_atari docs name
Breakout; ale-py is unreachable here), with Breakout's defining mechanics:
a destructible 4x16 brick wall, row-scored +2/+1, a double-speed second
wall, and lives.
"""

import numpy as np
import pytest

from mmtrl_tpu.envs.homebrew_native import BRICK_ROM, NativeBrick

# zero-page test taps documented in native/homebrew/brick.asm
ZP_SCORE, ZP_LIVES, ZP_STATUS = 0x00, 0x01, 0x02
ZP_BALLX, ZP_BALLY, ZP_PADX = 0x03, 0x04, 0x07
ZP_BRICK1, ZP_BRICK2 = 0x10, 0x14  # 4 bytes each, rows top to bottom
ZP_BRICKS, ZP_WALLS = 0x18, 0x19

NOOP, LEFT, RIGHT, UP, DOWN, FIRE = range(6)


@pytest.fixture(scope="module")
def env():
    e = NativeBrick(num_envs=4, seed=7, frameskip=8, episode_steps=400)
    yield e
    e.close()


def tracker_actions(ram: np.ndarray) -> np.ndarray:
    """Move the paddle centre toward the ball centre; FIRE serves early."""
    ballx = ram[:, ZP_BALLX].astype(int)
    padx = ram[:, ZP_PADX].astype(int)
    acts = np.full(ram.shape[0], FIRE, np.int32)  # serve if waiting
    diff = (ballx + 2) - (padx + 8)
    acts[diff < -2] = LEFT
    acts[diff > 2] = RIGHT
    return acts


def test_boot_renders_wall_bricks_paddle(env):
    frames, audio = env._host_reset()
    assert frames.shape == (4, 192, 160) and audio.shape[1] == 2
    assert (frames[:, 0:6, :] > 0).all(), "top wall missing"
    assert (frames[:, 100, 0:4] > 0).all(), "left wall missing"
    assert (frames[:, 100, 156:160] > 0).all(), "right wall missing"
    assert (frames[:, 178, :] > 0).any(axis=1).all(), "paddle missing"
    # the brick bands (lines 24-55) are much denser than the gap above them
    brick_px = (frames[:, 30, :] > 0).sum(axis=1)
    gap_px = (frames[:, 16, :] > 0).sum(axis=1)
    assert (brick_px > 100).all(), f"brick band too sparse: {brick_px}"
    assert (gap_px <= 16).all(), f"gap unexpectedly lit: {gap_px}"
    ram = env.ram()
    assert (ram[:, ZP_LIVES] == 3).all()
    assert (ram[:, ZP_STATUS] == 0).all()
    assert (ram[:, ZP_SCORE] == 0).all()
    assert (ram[:, ZP_BRICKS] == 64).all()
    assert (ram[:, ZP_WALLS] == 2).all()
    # full wall: every brick byte $FF
    assert (ram[:, ZP_BRICK1:ZP_BRICK1 + 4] == 0xFF).all()
    assert (ram[:, ZP_BRICK2:ZP_BRICK2 + 4] == 0xFF).all()


def test_bricks_break_and_screen_updates(env):
    env._host_reset()
    rng = np.random.default_rng(3)
    for _ in range(160):
        ram = env.ram()
        acts = tracker_actions(ram)
        # a little exploration so all four envs engage
        flip = rng.random(4) < 0.1
        acts[flip] = rng.integers(0, 6, size=int(flip.sum()))
        out = env._host_step(acts)
    ram = env.ram()
    assert (ram[:, ZP_BRICKS] < 64).any(), "no brick ever broke"
    # RAM wall state and rendered band agree: fewer lit pixels than boot
    frames = out[0]
    broke = ram[:, ZP_BRICKS] < 60
    if broke.any():
        i = int(np.argmax(broke))
        band_px = (frames[i, 24:56, :] > 0).sum()
        assert band_px < 32 * 136, "render does not reflect broken bricks"


def test_scripted_tracker_beats_random(env):
    rng = np.random.default_rng(0)

    def rollout(policy, steps=260):
        env._host_reset()
        total = np.zeros(4)
        for _ in range(steps):
            ram = env.ram()
            acts = policy(ram)
            out = env._host_step(acts)
            total += out[2]
        return total

    tracker = rollout(tracker_actions)
    random = rollout(
        lambda ram: rng.integers(0, 6, size=ram.shape[0]).astype(np.int32)
    )
    # Keeping the ball alive chews through the wall; random play loses the
    # ball within a serve or two.
    assert tracker.mean() >= 10.0, f"tracker too weak: {tracker}"
    assert tracker.mean() > random.mean() + 5.0, (tracker, random)


def test_miss_costs_life_and_episode_terminates(env):
    env._host_reset()
    # park the paddle hard left so most serves miss
    acts = np.full(4, LEFT, np.int32)
    done_seen = np.zeros(4, bool)
    for _ in range(200):
        out = env._host_step(acts)
        done_seen |= out[4].astype(bool)
        if done_seen.all():
            break
    assert done_seen.all(), "no episode end within 200 steps of idle play"
    ram = env.ram()
    assert (ram[:, ZP_LIVES] >= 1).all(), "auto-reset did not refresh lives"


def _popcount_rows(ram_row, rows):
    return sum(
        bin(int(ram_row[o + r])).count("1")
        for o in (ZP_BRICK1, ZP_BRICK2)
        for r in rows
    )


def test_row_scoring_top_rows_worth_double():
    """Reward per step equals 2x top-two-row bricks + 1x bottom-two-row
    bricks broken that step (checked as running per-step RAM deltas, so
    misses/resets don't invalidate the accounting — those steps are
    excluded when the wall state rolls back or refills)."""
    e = NativeBrick(num_envs=1, seed=5, frameskip=8, episode_steps=2000)
    try:
        e._host_reset()
        checked = 0
        for _ in range(600):
            before = e.ram()[0].copy()
            out = e._host_step(tracker_actions(e.ram()))
            after = e.ram()[0]
            if out[4][0] or after[ZP_BRICKS] > before[ZP_BRICKS]:
                continue  # episode reset or wall refill mid-step
            top = _popcount_rows(before, (0, 1)) - _popcount_rows(after, (0, 1))
            bot = _popcount_rows(before, (2, 3)) - _popcount_rows(after, (2, 3))
            assert out[2][0] == 2 * top + bot, (out[2][0], top, bot)
            if top + bot:
                checked += 1
            if checked >= 12 and top >= 1:
                break
        assert checked >= 5, f"too few brick breaks observed ({checked})"
    finally:
        e.close()


def test_audio_tracker_tone_and_jit_pipeline():
    e = NativeBrick(num_envs=2, seed=3, frameskip=8, episode_steps=300)
    try:
        e._host_reset()
        acts = np.full(2, FIRE, np.int32)
        for _ in range(8):
            out = e._host_step(acts)
        audio = out[1]
        assert audio[:, 0, :].std(axis=1).min() > 0, "tracker tone silent"

        import jax

        obs, state = jax.jit(e.v_reset)(jax.random.PRNGKey(0))
        assert obs.shape == (2, 3, 84, 84)
        step = jax.jit(e.v_step)
        obs, state, reward, done, info = step(
            jax.random.PRNGKey(1), state, np.zeros(2, np.int32)
        )
        assert obs.shape == (2, 3, 84, 84)
        assert np.asarray(reward).shape == (2,)
    finally:
        e.close()


def test_hostloop_reward_mirror():
    """The PPO host loop's numpy reward mirror matches env._reward for the
    homebrew modes (it silently applied the SkelPlus shaped formula to
    'score'-mode envs before round 3's BRICK work caught it)."""
    from mmtrl_tpu.algos.ppo.hostloop import _shaped_reward_np

    kd = np.array([0, 1, 2, 0], np.int32)
    ld = np.array([0, 0, -1, -1], np.int32)
    win = np.array([0, 0, 0, 1], np.uint8)
    for mode in ("score", "win"):
        e = NativeBrick(num_envs=1, seed=1, frameskip=8, reward_mode=mode)
        try:
            want = np.asarray(e._reward(kd, ld, win), np.float32)
            got = _shaped_reward_np(e, kd, ld, win)
            np.testing.assert_allclose(got, want)
        finally:
            e.close()


def test_rom_is_reproducible_from_source():
    from tools.asm6502 import assemble_cartridge

    with open(BRICK_ROM.replace(".bin", ".asm")) as f:
        built = assemble_cartridge(f.read())
    with open(BRICK_ROM, "rb") as f:
        committed = f.read()
    assert built == committed, "brick.bin out of sync with brick.asm"


def test_sticky_actions_p1_equals_noop_stream():
    """ALE-v5 sticky semantics (reference RND-Atari trains with envpool's
    repeat_action_probability=0.25, ppo_rnd_envpool.py:281): with p=1.0
    every step repeats the previous executed action, and the sticky memory
    starts at noop — so an arbitrary action stream must replay exactly as
    an all-noop stream on a p=0 env with the same seed."""
    e_sticky = NativeBrick(
        num_envs=2, seed=3, frameskip=8, episode_steps=200,
        repeat_action_probability=1.0,
    )
    e_noop = NativeBrick(num_envs=2, seed=3, frameskip=8, episode_steps=200)
    try:
        e_sticky._host_reset()
        e_noop._host_reset()
        rng = np.random.default_rng(0)
        for _ in range(20):
            acts = rng.integers(0, 6, size=2).astype(np.int32)
            f_s, *_ = e_sticky._host_step(acts)
            f_n, *_ = e_noop._host_step(np.zeros(2, np.int32))
            np.testing.assert_array_equal(f_s, f_n)
    finally:
        e_sticky.close()
        e_noop.close()


def test_sticky_actions_substitution_rate():
    """First post-reset step: each env independently executes noop instead
    of the commanded action with prob p=0.25 (binomial bound over 64 envs),
    observable through the executed-action memory."""
    e = NativeBrick(
        num_envs=64, seed=9, frameskip=8, episode_steps=200,
        repeat_action_probability=0.25,
    )
    try:
        e._host_reset()
        e._host_step(np.full(64, RIGHT, np.int32))
        substituted = int((e._sticky_prev == NOOP).sum())
        # Binomial(64, 0.25): mean 16, P(outside [4, 31]) < 1e-4
        assert 4 <= substituted <= 31, substituted
        # p=0 keeps the agent's action stream untouched
        e0 = NativeBrick(num_envs=8, seed=9, frameskip=8, episode_steps=200)
        try:
            e0._host_reset()
            f1, *_ = e0._host_step(np.full(8, RIGHT, np.int32))
            assert np.all(e0._sticky_prev == 0)  # memory unused at p=0
        finally:
            e0.close()
    finally:
        e.close()
