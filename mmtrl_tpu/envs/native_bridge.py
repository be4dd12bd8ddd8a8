"""Bridge to the native C++ batched env engine (native/envpool).

Implements the EnvPool-XLA contract the reference depends on (reference:
cleanrl/ppo_atari_envpool_xla_jax.py:212-229 — env stepping as a stateless
``(handle, action) -> (handle, timestep)`` call inside a jitted program) via
``jax.experimental.io_callback`` (ordered, so the stateful C++ pool is
sequenced correctly inside scans).

Division of labor: C++ owns game logic across a thread pool and returns
compact (tile_map, audio_index) descriptors; observation synthesis (the
render einsum + MFCC plane select) happens ON DEVICE with the same banks the
pure-JAX env uses — host<->device traffic is ~100 bytes per env per step.

For the gridworld the pure-JAX env (envs/minecraft2d.py) is strictly faster
on TPU; this bridge exists as the protocol for host-bound engines
(ALE/Skeleton+, MuJoCo, Procgen) and is validated against the pure-JAX env.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mmtrl_tpu.envs import spaces
from mmtrl_tpu.envs.assets import GRID, IMG, N_TILES, audio_planes, minecraft_render_bank

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libmmtrl_envpool.so")

_lib = None


def build_native(force: bool = False) -> str:
    """Compile the C++ engine if needed; returns the .so path."""
    if force or not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    return _LIB_PATH


def load_native() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build_native())
        lib.mmtrl_make.restype = ctypes.c_int64
        lib.mmtrl_make.argtypes = [ctypes.c_int32, ctypes.c_uint64]
        lib.mmtrl_num_envs.restype = ctypes.c_int32
        lib.mmtrl_num_envs.argtypes = [ctypes.c_int64]
        ptr = np.ctypeslib.ndpointer
        lib.mmtrl_reset.restype = None
        lib.mmtrl_reset.argtypes = [
            ctypes.c_int64,
            ptr(np.int32, flags="C_CONTIGUOUS"),
            ptr(np.int32, flags="C_CONTIGUOUS"),
        ]
        lib.mmtrl_step.restype = None
        lib.mmtrl_step.argtypes = [
            ctypes.c_int64,
            ptr(np.int32, flags="C_CONTIGUOUS"),
            ptr(np.int32, flags="C_CONTIGUOUS"),
            ptr(np.int32, flags="C_CONTIGUOUS"),
            ptr(np.float32, flags="C_CONTIGUOUS"),
            ptr(np.uint8, flags="C_CONTIGUOUS"),
        ]
        lib.mmtrl_close.restype = None
        lib.mmtrl_close.argtypes = [ctypes.c_int64]
        _lib = lib
    return _lib


class NativeMinecraft2d:
    """EnvPool-style batched env: ``handle, obs = env.reset(); obs, reward,
    done, handle = step(handle, action)`` — step is jit-compatible."""

    def __init__(self, num_envs: int, seed: int = 0, use_audio: bool = True):
        self.num_envs = num_envs
        self.use_audio = use_audio
        self._lib = load_native()
        self._handle = int(self._lib.mmtrl_make(num_envs, seed))
        self._bank = jnp.asarray(minecraft_render_bank())
        self._audio = jnp.asarray(audio_planes())

    def close(self):
        if self._handle:
            self._lib.mmtrl_close(self._handle)
            self._handle = 0

    # ---- host callbacks --------------------------------------------------
    def _host_reset(self) -> Tuple[np.ndarray, np.ndarray]:
        tiles = np.zeros((self.num_envs, GRID * GRID), np.int32)
        audio = np.zeros(self.num_envs, np.int32)
        self._lib.mmtrl_reset(self._handle, tiles, audio)
        return tiles, audio

    def _host_step(self, actions: np.ndarray):
        actions = np.ascontiguousarray(actions, dtype=np.int32)
        tiles = np.zeros((self.num_envs, GRID * GRID), np.int32)
        audio = np.zeros(self.num_envs, np.int32)
        rewards = np.zeros(self.num_envs, np.float32)
        dones = np.zeros(self.num_envs, np.uint8)
        self._lib.mmtrl_step(self._handle, actions, tiles, audio, rewards, dones)
        return tiles, audio, rewards, dones

    # ---- device-side observation synthesis --------------------------------
    def _render(self, tiles: jnp.ndarray, audio_idx: jnp.ndarray) -> jnp.ndarray:
        onehot = jax.nn.one_hot(tiles, N_TILES, dtype=jnp.float32)  # (N, 25, 5)
        frame = jnp.clip(
            jnp.einsum("npt,ptyx->nyx", onehot, self._bank), 0.0, 255.0
        ) * (2.0 / 255.0) - 1.0
        if not self.use_audio:
            return frame[:, None]
        return jnp.stack([frame, self._audio[audio_idx]], axis=1)

    # ---- public API --------------------------------------------------------
    def reset(self) -> jnp.ndarray:
        tiles, audio = self._host_reset()
        return self._render(jnp.asarray(tiles), jnp.asarray(audio))

    def step(
        self, actions: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """jit-compatible: io_callback into the C++ pool, render on device."""
        from jax.experimental import io_callback

        result_shapes = (
            jax.ShapeDtypeStruct((self.num_envs, GRID * GRID), jnp.int32),
            jax.ShapeDtypeStruct((self.num_envs,), jnp.int32),
            jax.ShapeDtypeStruct((self.num_envs,), jnp.float32),
            jax.ShapeDtypeStruct((self.num_envs,), jnp.uint8),
        )
        tiles, audio, rewards, dones = io_callback(
            self._host_step, result_shapes, actions, ordered=True
        )
        return self._render(tiles, audio), rewards, dones.astype(bool)

    @property
    def observation_space(self):
        # Rendered observations are normalized to [-1, 1] (frame*2/255-1 and
        # MFCC planes); report the true bounds so consumers relying on space
        # limits normalize correctly.
        return spaces.Box(-1.0, 1.0, (2 if self.use_audio else 1, IMG, IMG))

    @property
    def action_space(self):
        return spaces.Discrete(4)
