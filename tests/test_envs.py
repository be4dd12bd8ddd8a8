"""Golden-value env tests — the coverage the reference's MMTRL additions lack
(SURVEY.md §4 gap): env dynamics, rewards, audio gating, auto-reset, vmap.
Reference semantics cited per case."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtrl_tpu.envs import make
from mmtrl_tpu.envs.doorpuzzle import Doorpuzzle, DoorpuzzleState
from mmtrl_tpu.envs.minecraft2d import (
    DOWN,
    GEM_GOLD,
    GEM_IRON,
    LEFT,
    MAX_ITER,
    RIGHT,
    UP,
    Minecraft2d,
    MinecraftState,
)

ALL_ENVS = ["CartPole-v1", "Acrobot-v1", "MountainCar-v0", "minecraft", "doorpuzzle"]


def mc_state(agent, good=(4, 4), bad=(4, 3), gem=(4, 2), gem_type=GEM_GOLD, t=0):
    a = lambda x: jnp.asarray(x, dtype=jnp.int32)  # noqa: E731
    return MinecraftState(
        agent=a(agent), good=a(good), bad=a(bad), gem=a(gem),
        gem_type=jnp.int32(gem_type), t=jnp.int32(t),
    )


@pytest.mark.parametrize("name", ALL_ENVS)
def test_api_smoke_jit_vmap(name):
    env = make(name)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    obs, state = jax.jit(env.v_reset)(keys)
    assert obs.shape == (4,) + env.observation_space.shape
    actions = jnp.zeros(4, dtype=jnp.int32)
    step = jax.jit(env.v_step)
    for i in range(3):
        keys = jax.random.split(jax.random.PRNGKey(i + 1), 4)
        obs, state, reward, done, info = step(keys, state, actions)
    assert obs.shape == (4,) + env.observation_space.shape
    assert reward.shape == done.shape == (4,)


class TestMinecraft:
    env = Minecraft2d()

    def step(self, state, action, key=0):
        return self.env._step_env(jax.random.PRNGKey(key), state, jnp.int32(action))

    def test_moves_and_clamping(self):
        # UP decrements row, clamped at 0 (Minecraft.py:165-168)
        s = mc_state(agent=(0, 2))
        _, ns, *_ = self.step(s, UP)
        assert ns.agent.tolist() == [0, 2]
        _, ns, *_ = self.step(mc_state(agent=(2, 2)), UP)
        assert ns.agent.tolist() == [1, 2]
        _, ns, *_ = self.step(mc_state(agent=(2, 2)), DOWN)
        assert ns.agent.tolist() == [3, 2]
        _, ns, *_ = self.step(mc_state(agent=(2, 2)), RIGHT)
        assert ns.agent.tolist() == [2, 3]
        _, ns, *_ = self.step(mc_state(agent=(2, 2)), LEFT)
        assert ns.agent.tolist() == [2, 1]

    def test_rewards(self):
        # +10 good target & gold gem; -10 good target & iron gem; -1 step
        # (Minecraft.py:69-72,193-200)
        s = mc_state(agent=(4, 3), good=(4, 4), gem_type=GEM_GOLD)
        _, _, r, d, _ = self.step(s, RIGHT)
        assert float(r) == 10.0 and bool(d)
        s = mc_state(agent=(4, 3), good=(4, 4), gem_type=GEM_IRON)
        _, _, r, d, _ = self.step(s, RIGHT)
        assert float(r) == -10.0 and bool(d)
        s = mc_state(agent=(4, 4), bad=(4, 3), good=(0, 0), gem_type=GEM_IRON)
        _, _, r, d, _ = self.step(s, LEFT)
        assert float(r) == 10.0 and bool(d)
        s = mc_state(agent=(0, 0), good=(4, 4), bad=(4, 3))
        _, _, r, d, _ = self.step(s, RIGHT)
        assert float(r) == -1.0 and not bool(d)

    def test_time_limit(self):
        s = mc_state(agent=(0, 0), t=MAX_ITER - 1)
        _, _, r, d, _ = self.step(s, RIGHT)
        assert bool(d) and float(r) == -1.0

    def test_audio_gating(self):
        # Within sqrt(2) of gem: hear gem type; farther: noise
        # (Minecraft.py:145-159, LISTEN_RANGE=1.5)
        planes = self.env._audio
        for gem_type, plane_idx in [(GEM_GOLD, 0), (GEM_IRON, 1)]:
            s = mc_state(agent=(3, 1), gem=(4, 2), gem_type=gem_type)  # d=sqrt(2)
            obs = self.env._obs(s)
            np.testing.assert_array_equal(obs[1], planes[plane_idx])
        s = mc_state(agent=(2, 2), gem=(4, 2), gem_type=GEM_GOLD)  # d=2
        obs = self.env._obs(s)
        np.testing.assert_array_equal(obs[1], planes[2])

    def test_gem_rendered_identically_for_both_types(self):
        # Only audio may disambiguate the gem (Minecraft.py:311-318).
        s_gold = mc_state(agent=(0, 0), gem=(4, 2), gem_type=GEM_GOLD)
        s_iron = mc_state(agent=(0, 0), gem=(4, 2), gem_type=GEM_IRON)
        np.testing.assert_array_equal(
            self.env._obs(s_gold)[0], self.env._obs(s_iron)[0]
        )

    def test_reset_no_overlap(self):
        for i in range(20):
            _, s = self.env.reset(jax.random.PRNGKey(i))
            locs = {tuple(np.asarray(x)) for x in (s.agent, s.good, s.bad, s.gem)}
            assert len(locs) == 4

    def test_autoreset(self):
        s = mc_state(agent=(4, 3), good=(4, 4), gem_type=GEM_GOLD)
        obs, ns, r, d, info = self.env.step(jax.random.PRNGKey(3), s, jnp.int32(RIGHT))
        assert bool(d) and int(ns.t) == 0
        assert float(r) == 10.0

    def test_obs_range(self):
        obs, _ = self.env.reset(jax.random.PRNGKey(0))
        assert obs.shape == (2, 84, 84)
        assert float(obs.min()) >= -1.0 and float(obs.max()) <= 1.0


class TestDoorpuzzle:
    env = Doorpuzzle()

    def dp_state(self, agent, key_loc=(2, 2), key_type=1, has_key=False, t=0):
        a = lambda x: jnp.asarray(x, dtype=jnp.int32)  # noqa: E731
        return DoorpuzzleState(
            agent=a(agent), key_loc=a(key_loc), key_type=jnp.int32(key_type),
            has_key=jnp.asarray(has_key), t=jnp.int32(t),
        )

    def find_clean_key(self, state, action):
        # A PRNG key under which the action does not slip.
        from mmtrl_tpu.envs.doorpuzzle import _SLIP

        for i in range(100):
            k = jax.random.PRNGKey(i)
            slip = jax.random.choice(k, 3, p=jnp.array([0.1, 0.8, 0.1]))
            if int(slip) == 1:
                return k
        raise AssertionError

    def test_key_pickup_silent(self):
        # Reaching key: reward 0, has_key set (Doorpuzzle.py:211-213)
        s = self.dp_state(agent=(2, 1))
        k = self.find_clean_key(s, RIGHT)
        _, ns, r, d, info = self.env._step_env(k, s, jnp.int32(RIGHT))
        assert bool(ns.has_key) and float(r) == 0.0 and not bool(d)

    def test_correct_door_reward(self):
        # Door1 (0,4) pays 1.0 iff has_key and key_type==1 (Doorpuzzle.py:214-221)
        s = self.dp_state(agent=(0, 3), key_type=1, has_key=True)
        k = self.find_clean_key(s, RIGHT)
        _, _, r, d, _ = self.env._step_env(k, s, jnp.int32(RIGHT))
        assert float(r) == 1.0 and bool(d)
        s = self.dp_state(agent=(0, 3), key_type=2, has_key=True)
        _, _, r, d, _ = self.env._step_env(k, s, jnp.int32(RIGHT))
        assert float(r) == 0.0 and bool(d)
        # Without key: door still ends episode, no reward (Doorpuzzle.py:215-216,247-253)
        s = self.dp_state(agent=(0, 3), key_type=1, has_key=False)
        _, _, r, d, _ = self.env._step_env(k, s, jnp.int32(RIGHT))
        assert float(r) == 0.0 and bool(d)

    def test_action_noise_distribution(self):
        # 20% lateral slip, 10% each side (Config.py:62, Doorpuzzle.py:162)
        s = self.dp_state(agent=(2, 0), key_loc=(4, 4))
        outcomes = {(1, 0): 0, (3, 0): 0, (2, 1): 0, (2, 0): 0}
        n = 400
        for i in range(n):
            _, ns, *_ = self.env._step_env(
                jax.random.PRNGKey(i + 1000), s, jnp.int32(RIGHT)
            )
            outcomes[tuple(np.asarray(ns.agent))] += 1
        # straight RIGHT ~80%; UP/DOWN slips ~10% each
        assert outcomes[(2, 1)] / n == pytest.approx(0.8, abs=0.08)
        assert outcomes[(1, 0)] / n == pytest.approx(0.1, abs=0.06)
        assert outcomes[(3, 0)] / n == pytest.approx(0.1, abs=0.06)

    def test_audio_silent_after_pickup(self):
        # (Doorpuzzle.py:133-134)
        planes = self.env._audio
        s = self.dp_state(agent=(2, 2), has_key=True)
        np.testing.assert_array_equal(self.env._obs(s)[1], planes[2])
        s = self.dp_state(agent=(2, 1), key_type=2, has_key=False)
        np.testing.assert_array_equal(self.env._obs(s)[1], planes[1])

    def test_hard_mode_key_placement(self):
        env = Doorpuzzle(hard_mode=True)
        forbidden = {(0, 0), (0, 4), (4, 0)}
        for i in range(30):
            _, s = env.reset(jax.random.PRNGKey(i))
            assert tuple(np.asarray(s.key_loc)) not in forbidden


class TestClassicControl:
    def test_cartpole_episode(self):
        env = make("CartPole-v1")
        _, s = env.reset(jax.random.PRNGKey(0))
        total, done_seen = 0.0, False
        for i in range(600):
            _, s, r, d, _ = env.step(
                jax.random.PRNGKey(i), s, jnp.int32(i % 2)
            )
            total += float(r)
            if bool(d):
                done_seen = True
                break
        assert done_seen  # alternating actions fail well before 500

    def test_mountain_car_reward(self):
        env = make("MountainCar-v0")
        _, s = env.reset(jax.random.PRNGKey(0))
        _, s, r, d, _ = env.step(jax.random.PRNGKey(1), s, jnp.int32(2))
        assert float(r) == -1.0

    def test_pendulum_continuous(self):
        env = make("Pendulum-v1")
        _, s = env.reset(jax.random.PRNGKey(0))
        _, s, r, d, _ = env.step(jax.random.PRNGKey(1), s, jnp.asarray([0.5]))
        assert float(r) <= 0.0
