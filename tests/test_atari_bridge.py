"""Batched native 2600 pool: step the real Skeleton+ ROM through the
AtariPool bridge and verify frames render and audio flows.  Skipped when
the reference ROM is not mounted."""

import os
import shutil

import numpy as np
import pytest

ROM = "/root/reference/environments/skeleton_plus/SkelPlus.bin"

if not os.path.exists(ROM):
    pytest.skip("reference Skeleton+ ROM not mounted", allow_module_level=True)
if shutil.which("g++") is None:
    pytest.skip("no C++ toolchain", allow_module_level=True)

from mmtrl_tpu.envs.atari_bridge import RESET_SWITCH, RIGHT, UP, AtariPool


@pytest.fixture(scope="module")
def pool():
    p = AtariPool(ROM, num_envs=4, seed=0)
    yield p
    p.close()


def test_shapes(pool):
    frames, audio = pool.step(np.zeros(4, np.uint8))
    assert frames.shape == (4, 192, 160)
    assert audio.shape == (4, 2, 524)
    assert frames.dtype == np.uint8 and audio.dtype == np.float32


def test_renders_game_content(pool):
    # run the attract screen a while; frames must contain non-background
    # pixels (the maze) and machines must be desynchronized by seed warmup.
    for _ in range(30):
        frames, _ = pool.step(np.zeros(4, np.uint8))
    assert (frames > 0).mean() > 0.01
    assert frames.max() > 0


def test_reset_and_audio(pool):
    # press console RESET then waggle the joystick: the game starts and the
    # TIA audio channels emit nonzero samples (footsteps).
    for _ in range(5):
        pool.step(np.full(4, RESET_SWITCH, np.uint8))
    heard = 0.0
    for i in range(240):
        a = UP if (i // 30) % 2 else RIGHT
        frames, audio = pool.step(np.full(4, a, np.uint8))
        heard += float(audio.sum())
    assert heard > 0.0


def test_streaming_mfcc_pipeline(pool):
    """The audio window feeds the streaming MFCC path (the reference's
    planned Skeleton+ front-end, Config.py:87-89)."""
    import jax.numpy as jnp

    from mmtrl_tpu.ops.mfcc import SKELETON_PLUS_PARAMS, mfcc

    _, audio = pool.step(np.zeros(4, np.uint8))
    window = jnp.asarray(audio[0, 0] * 32000.0)
    feat = mfcc(window, SKELETON_PLUS_PARAMS, xp=jnp)
    assert feat.shape[1] == 13
    assert np.isfinite(np.asarray(feat)).all()
