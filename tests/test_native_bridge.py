"""Native C++ env engine tests: build, protocol, and parity with the
pure-JAX env's reward/termination semantics."""

import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

if shutil.which("g++") is None and shutil.which("make") is None:
    pytest.skip("no C++ toolchain", allow_module_level=True)

from mmtrl_tpu.envs.native_bridge import NativeMinecraft2d, build_native


@pytest.fixture(scope="module")
def native_env():
    build_native()
    env = NativeMinecraft2d(num_envs=8, seed=0)
    yield env
    env.close()


def test_reset_shapes(native_env):
    obs = native_env.reset()
    assert obs.shape == (8, 2, 84, 84)
    assert float(jnp.min(obs)) >= -1.0 and float(jnp.max(obs)) <= 1.0


def test_step_protocol_inside_jit(native_env):
    native_env.reset()

    @jax.jit
    def step(actions):
        return native_env.step(actions)

    obs, rewards, dones = step(jnp.zeros(8, jnp.int32))
    assert obs.shape == (8, 2, 84, 84)
    assert rewards.shape == dones.shape == (8,)
    # step rewards are -1, +10, or -10
    assert set(np.asarray(rewards).tolist()) <= {-1.0, 10.0, -10.0}


def test_episode_semantics(native_env):
    """Every episode ends with +-10 (target) or at 30 steps with -1."""
    native_env.reset()
    rng = np.random.RandomState(0)
    lengths = np.zeros(8, int)
    for _ in range(200):
        actions = jnp.asarray(rng.randint(0, 4, size=8), jnp.int32)
        _, rewards, dones = native_env.step(actions)
        rewards, dones = np.asarray(rewards), np.asarray(dones)
        lengths += 1
        for i in range(8):
            if dones[i]:
                assert rewards[i] in (10.0, -10.0) or lengths[i] >= 30
                lengths[i] = 0
    assert lengths.max() <= 30


def test_render_matches_pure_jax_bank(native_env):
    """The device render of a native tile map equals the pure-JAX env's
    render of the same configuration."""
    from mmtrl_tpu.envs.minecraft2d import Minecraft2d, MinecraftState

    tiles, audio = native_env._host_reset()
    frame_native = np.asarray(native_env._render(jnp.asarray(tiles), jnp.asarray(audio)))[0, 0]

    # Reconstruct the same state in the pure-JAX env from the tile map.
    tmap = tiles[0].reshape(5, 5)
    loc = lambda t: np.argwhere(tmap == t)[0]  # noqa: E731
    env = Minecraft2d()
    state = MinecraftState(
        agent=jnp.asarray(loc(1), jnp.int32),
        good=jnp.asarray(loc(2), jnp.int32),
        bad=jnp.asarray(loc(3), jnp.int32),
        gem=jnp.asarray(loc(4), jnp.int32),
        gem_type=jnp.int32(0),
        t=jnp.int32(0),
    )
    frame_jax = np.asarray(env._obs(state))[0]
    np.testing.assert_allclose(frame_native, frame_jax, atol=1e-5)
