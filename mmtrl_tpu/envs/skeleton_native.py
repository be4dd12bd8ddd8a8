"""Skeleton+ on the REAL ROM: trainable RL env over the native 2600 core.

The reference's second benchmark runs the actual SkelPlus.bin cartridge
through ALE with a stereo-audio observation tap (reference: Config.py:81-89,
environments/skeleton_plus/SkelPlus.bin).  Here the cartridge executes on
the in-repo C++ 2600 core (native/atari) with the per-game RAM adapter in
native/atari/skel_env.cc (kill/life display-digit decoding, end-screen
termination, auto-reset — the ALE approach; RAM map documented there and
verified by scripted play).

Division of labor mirrors envs/native_bridge.py: C++ owns emulation across
a thread pool and returns raw (frame, stereo window, reward components);
observation synthesis is ON DEVICE inside jit —
  video: (192,160) TIA color indices -> luma LUT -> bilinear 84x84 matmuls,
  audio: (2, 524*frameskip) TIA samples -> streaming MFCC (ops/mfcc.py,
         WINLEN=0.010/WINSTEP=0.003 per Config.py:87-89) -> 84x84 planes.

Observation contract matches the device-resident simulator
(envs/skeleton_plus.py): (3, 84, 84) = [frame, MFCC-L, MFCC-R] in [-1, 1],
5 actions (FORWARD, TURN_LEFT, TURN_RIGHT, FIRE, NOOP) — checkpoints load
interchangeably.  Measured transfer (RESULTS.md): a sim-trained policy
scores at random level on the ROM (−40.3 vs random −34.5) — the CONTRACT
transfers, the behavior does not (mechanics diverge; docs/environments.md
fidelity table).  Train on the ROM directly for ROM performance.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mmtrl_tpu.envs import spaces
from mmtrl_tpu.ops.mfcc import SKELETON_PLUS_PARAMS, mfcc

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libmmtrl_atari.so")
# ROM resolution order: $MMTRL_SKELETON_ROM, then a repo-local roms/ drop-in,
# then this rig's read-only reference checkout (the benchmark ROM itself —
# reference environments/skeleton_plus/SkelPlus.bin).
_ROM_CANDIDATES = (
    os.environ.get("MMTRL_SKELETON_ROM", ""),
    os.path.join(_NATIVE_DIR, "..", "roms", "SkelPlus.bin"),
    "/root/reference/environments/skeleton_plus/SkelPlus.bin",
)
DEFAULT_ROM = next(
    (p for p in _ROM_CANDIDATES if p and os.path.exists(p)),
    _ROM_CANDIDATES[-1],
)

IMG = 84
FRAME_H, FRAME_W = 192, 160

# Reward shaping mirrors the simulator (envs/skeleton_plus.py) so returns
# are comparable across backends; "kills" is the ALE-style score delta.
REWARD_KILL = 10.0
REWARD_WIN = 50.0
REWARD_LIFE = 0.5  # per life point lost (a touch costs ~2-10 of 99)
REWARD_STEP = -0.01

_lib = None
_BOUND_PREFIXES = set()


def load_native(prefix: str = "mmtrl_skel") -> ctypes.CDLL:
    """Load (building if needed) the atari .so and bind one adapter's C API.

    Both per-game adapters (skel_env.cc for the reference cartridge,
    abi_env.cc for in-repo homebrew carts) export the same function
    signatures under different prefixes.
    """
    global _lib
    if _lib is None:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
            )
        _lib = ctypes.CDLL(_LIB_PATH)
    if prefix not in _BOUND_PREFIXES:
        lib = _lib
        ptr = np.ctypeslib.ndpointer

        def fn(name):
            return getattr(lib, f"{prefix}_{name}")

        fn("make").restype = ctypes.c_int64
        fn("make").argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_uint64,
            ctypes.c_int32, ctypes.c_int32,
        ]
        fn("shape").restype = ctypes.c_int32
        fn("shape").argtypes = [ctypes.c_int64] + [
            ctypes.POINTER(ctypes.c_int32)
        ] * 4
        fn("reset").restype = None
        fn("reset").argtypes = [
            ctypes.c_int64,
            ptr(np.uint8, flags="C_CONTIGUOUS"),
            ptr(np.float32, flags="C_CONTIGUOUS"),
        ]
        fn("step").restype = None
        fn("step").argtypes = [
            ctypes.c_int64,
            ptr(np.int32, flags="C_CONTIGUOUS"),
            ptr(np.uint8, flags="C_CONTIGUOUS"),
            ptr(np.float32, flags="C_CONTIGUOUS"),
            ptr(np.int32, flags="C_CONTIGUOUS"),
            ptr(np.int32, flags="C_CONTIGUOUS"),
            ptr(np.uint8, flags="C_CONTIGUOUS"),
            ptr(np.uint8, flags="C_CONTIGUOUS"),
            ptr(np.int32, flags="C_CONTIGUOUS"),
            ptr(np.int32, flags="C_CONTIGUOUS"),
        ]
        fn("ram").restype = None
        fn("ram").argtypes = [
            ctypes.c_int64,
            ptr(np.uint8, flags="C_CONTIGUOUS"),
        ]
        fn("close").restype = None
        fn("close").argtypes = [ctypes.c_int64]
        _BOUND_PREFIXES.add(prefix)
    return _lib


def _lin_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear interpolation operator."""
    w = np.zeros((n_out, n_in), dtype=np.float32)
    if n_in == 1:
        w[:, 0] = 1.0
        return w
    src = np.linspace(0, n_in - 1, n_out)
    lo = np.floor(src).astype(int)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (src - lo).astype(np.float32)
    for i in range(n_out):
        w[i, lo[i]] += 1 - frac[i]
        w[i, hi[i]] += frac[i]
    return w


@functools.lru_cache(maxsize=1)
def _luma_lut() -> np.ndarray:
    """TIA color index (COLUxx >> 1, 7 bits) -> grayscale [0, 255].

    The low 3 bits of the shifted value are the luminance ramp; hue is
    ignored (Skeleton+ is effectively monochrome per maze)."""
    idx = np.arange(128, dtype=np.float32)
    return (np.mod(idx, 8) * (255.0 / 7.0)).astype(np.float32)


class NativeSkeletonPlus:
    """jit-compatible batched env over the real SkelPlus.bin.

    Duck-types the vectorized `Environment` surface (v_reset/v_step) used
    by the PPO cores; the true state lives in C++ (EnvPool handle protocol,
    reference cleanrl/ppo_atari_envpool_xla_jax.py:212-229), so the JAX-side
    env_state is a placeholder step counter.
    """

    PREFIX = "mmtrl_skel"

    def _fn(self, name: str):
        return getattr(self._lib, f"{self.PREFIX}_{name}")

    def __init__(
        self,
        num_envs: int,
        rom_path: str = DEFAULT_ROM,
        seed: int = 0,
        frameskip: int = 8,
        episode_steps: int = 1500,
        reward_mode: str = "shaped",
        repeat_action_probability: float = 0.0,
    ):
        if not os.path.exists(rom_path):
            raise FileNotFoundError(f"ROM not found at {rom_path!r}")
        self.num_envs = num_envs
        self.frameskip = frameskip
        self.episode_steps = episode_steps
        self.reward_mode = reward_mode
        # ALE-v5 sticky actions (the reference trains RND-Atari with
        # envpool's repeat_action_probability=0.25, ppo_rnd_envpool.py:281):
        # each step, with prob p the PREVIOUS action is executed instead of
        # the agent's — breaks the deterministic-emulator phase-locking that
        # collapses argmax policies on Breakout-class dynamics.  Previous
        # action resets to 0 (noop) at episode start, as in ALE.
        self.repeat_action_probability = float(repeat_action_probability)
        self._sticky_rng = np.random.default_rng((seed << 8) ^ 0xA1E)
        self._sticky_prev = np.zeros(num_envs, np.int32)
        self._lib = load_native(self.PREFIX)
        self._handle = int(
            self._fn("make")(
                rom_path.encode(), num_envs, seed, frameskip,
                episode_steps * frameskip,
            )
        )
        if self._handle < 0:
            raise RuntimeError(f"cannot load ROM {rom_path!r}")
        h = ctypes.c_int32()
        w = ctypes.c_int32()
        alen = ctypes.c_int32()
        nact = ctypes.c_int32()
        self._fn("shape")(
            self._handle, ctypes.byref(h), ctypes.byref(w),
            ctypes.byref(alen), ctypes.byref(nact),
        )
        assert (h.value, w.value) == (FRAME_H, FRAME_W)
        self.audio_len = alen.value
        self._num_actions = nact.value

        # Device-side constants for observation synthesis.
        self._lut = jnp.asarray(_luma_lut())
        self._w_rows = jnp.asarray(_lin_matrix(FRAME_H, IMG))
        self._w_cols = jnp.asarray(_lin_matrix(FRAME_W, IMG))
        p = SKELETON_PLUS_PARAMS
        n_frames = 1 + int(
            np.ceil(max(self.audio_len - p.frame_len, 0) / p.frame_step)
        )
        self._m_rows = jnp.asarray(_lin_matrix(p.numcep, IMG))
        self._m_cols = jnp.asarray(_lin_matrix(n_frames, IMG))

    # ---- host callbacks --------------------------------------------------
    def _host_reset(self) -> Tuple[np.ndarray, np.ndarray]:
        frames = np.zeros((self.num_envs, FRAME_H, FRAME_W), np.uint8)
        audio = np.zeros((self.num_envs, 2, self.audio_len), np.float32)
        self._fn("reset")(self._handle, frames, audio)
        self._sticky_prev[:] = 0
        return frames, audio

    def _host_step(self, actions: np.ndarray):
        actions = np.ascontiguousarray(actions, dtype=np.int32)
        if self.repeat_action_probability > 0.0:
            m = (
                self._sticky_rng.random(self.num_envs)
                < self.repeat_action_probability
            )
            actions = np.where(m, self._sticky_prev, actions).astype(np.int32)
        n = self.num_envs
        frames = np.zeros((n, FRAME_H, FRAME_W), np.uint8)
        audio = np.zeros((n, 2, self.audio_len), np.float32)
        kd = np.zeros(n, np.int32)
        ld = np.zeros(n, np.int32)
        done = np.zeros(n, np.uint8)
        win = np.zeros(n, np.uint8)
        kills = np.zeros(n, np.int32)
        life = np.zeros(n, np.int32)
        self._fn("step")(
            self._handle, actions, frames, audio, kd, ld, done, win, kills,
            life,
        )
        if self.repeat_action_probability > 0.0:
            # Remember the EXECUTED action; auto-reset envs start the next
            # episode from noop, matching ALE's reset of the sticky memory.
            self._sticky_prev = np.where(done.astype(bool), 0, actions)
        return frames, audio, kd, ld, done, win, kills, life

    def ram(self) -> np.ndarray:
        out = np.zeros((self.num_envs, 128), np.uint8)
        self._fn("ram")(self._handle, out)
        return out

    def close(self):
        if self._handle > 0:
            self._fn("close")(self._handle)
            self._handle = 0

    # ---- device-side observation synthesis -------------------------------
    def _obs(self, frames: jnp.ndarray, audio: jnp.ndarray) -> jnp.ndarray:
        gray = self._lut[frames.astype(jnp.int32)]  # (N, 192, 160)
        small = jnp.einsum(
            "ry,nyx,cx->nrc", self._w_rows, gray, self._w_cols
        )
        frame_plane = small * (2.0 / 255.0) - 1.0

        sig = audio.reshape(-1, self.audio_len) * 32000.0  # (N*2, S)
        feats = jax.vmap(lambda s: mfcc(s, SKELETON_PLUS_PARAMS, xp=jnp))(sig)
        feats = jnp.swapaxes(feats, 1, 2)  # (N*2, numcep, n_frames)
        planes = jnp.einsum(
            "rc,ncf,gf->nrg", self._m_rows, feats, self._m_cols
        )
        # Per-window min-max to [-1, 1]: the reference pipeline's
        # normalization (Minecraft.py:238-241) applied per step.
        lo = planes.min(axis=(1, 2), keepdims=True)
        hi = planes.max(axis=(1, 2), keepdims=True)
        planes = (planes - lo) / jnp.maximum(hi - lo, 1e-6) * 2.0 - 1.0
        planes = planes.reshape(
            self.num_envs, 2, IMG, IMG
        )
        return jnp.concatenate([frame_plane[:, None], planes], axis=1)

    def _reward(self, kd, ld, win):
        kd = kd.astype(jnp.float32)
        ld = ld.astype(jnp.float32)
        win = win.astype(jnp.float32)
        if self.reward_mode == "kills":
            return kd
        return REWARD_KILL * kd + REWARD_LIFE * ld + REWARD_WIN * win + REWARD_STEP

    # ---- vectorized Environment surface -----------------------------------
    def v_reset(self, keys: jax.Array):
        del keys  # stochasticity handled by the C++ per-env RNG
        from jax.experimental import io_callback

        shapes = (
            jax.ShapeDtypeStruct((self.num_envs, FRAME_H, FRAME_W), jnp.uint8),
            jax.ShapeDtypeStruct((self.num_envs, 2, self.audio_len), jnp.float32),
        )
        frames, audio = io_callback(self._host_reset, shapes, ordered=True)
        state = jnp.zeros((self.num_envs,), jnp.int32)
        return self._obs(frames, audio), state

    def v_step(self, keys: jax.Array, state: jnp.ndarray, action: jnp.ndarray):
        del keys
        from jax.experimental import io_callback

        n = self.num_envs
        shapes = (
            jax.ShapeDtypeStruct((n, FRAME_H, FRAME_W), jnp.uint8),
            jax.ShapeDtypeStruct((n, 2, self.audio_len), jnp.float32),
            jax.ShapeDtypeStruct((n,), jnp.int32),
            jax.ShapeDtypeStruct((n,), jnp.int32),
            jax.ShapeDtypeStruct((n,), jnp.uint8),
            jax.ShapeDtypeStruct((n,), jnp.uint8),
            jax.ShapeDtypeStruct((n,), jnp.int32),
            jax.ShapeDtypeStruct((n,), jnp.int32),
        )
        frames, audio, kd, ld, done, win, kills, life = io_callback(
            self._host_step, shapes, action, ordered=True
        )
        obs = self._obs(frames, audio)
        reward = self._reward(kd, ld, win)
        done = done.astype(bool)
        info: Dict[str, jnp.ndarray] = {"kills": kills, "life": life}
        return obs, state + 1, reward, done, info

    # ---- spaces ------------------------------------------------------------
    @property
    def observation_space(self):
        return spaces.Box(-1.0, 1.0, (3, IMG, IMG))

    @property
    def action_space(self):
        return spaces.Discrete(self._num_actions)

    @property
    def num_actions(self) -> int:
        return self._num_actions

    @property
    def name(self) -> str:
        return "skeleton_plus_native"
