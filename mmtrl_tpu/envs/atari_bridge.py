"""Bridge to the native 2600 pool (native/atari) — the ALE-equivalent path.

Delivers the raw multimodal observation stream the reference's Skeleton+
plan needs (Config.py:81-89): per frame, a (192, 160) color-index video
frame and a (2, 524) stereo audio window at the TIA rate (~31.4 kHz, the
reference's AUDIO_FREQ=30720 nominal).  Downstream processing is on-device:
frame resize/grayscale and streaming MFCC (ops/mfcc.py with
SKELETON_PLUS_PARAMS) exactly like the device-resident simulator.

Reward/termination extraction (game RAM adapters, the ALE approach) is the
remaining piece before this backs a full RL env; observation parity and the
batched stepping protocol are complete.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libmmtrl_atari.so")

# Action bits
UP, DOWN, LEFT, RIGHT, FIRE, RESET_SWITCH = 0x01, 0x02, 0x04, 0x08, 0x10, 0x20

_lib = None


def load_native() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
            )
        lib = ctypes.CDLL(_LIB_PATH)
        ptr = np.ctypeslib.ndpointer
        lib.mmtrl_atari_make.restype = ctypes.c_int64
        lib.mmtrl_atari_make.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_uint64,
        ]
        lib.mmtrl_atari_frame_shape.restype = ctypes.c_int32
        lib.mmtrl_atari_frame_shape.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.mmtrl_atari_step.restype = None
        lib.mmtrl_atari_step.argtypes = [
            ctypes.c_int64,
            ptr(np.uint8, flags="C_CONTIGUOUS"),
            ptr(np.uint8, flags="C_CONTIGUOUS"),
            ptr(np.float32, flags="C_CONTIGUOUS"),
        ]
        lib.mmtrl_atari_ram.restype = None
        lib.mmtrl_atari_ram.argtypes = [
            ctypes.c_int64,
            ptr(np.uint8, flags="C_CONTIGUOUS"),
        ]
        lib.mmtrl_atari_close.restype = None
        lib.mmtrl_atari_close.argtypes = [ctypes.c_int64]
        _lib = lib
    return _lib


class AtariPool:
    """Batched native 2600 machines; one observation per frame step."""

    def __init__(self, rom_path: str, num_envs: int, seed: int = 0):
        self._lib = load_native()
        self.num_envs = num_envs
        self._handle = int(
            self._lib.mmtrl_atari_make(rom_path.encode(), num_envs, seed)
        )
        if self._handle < 0:
            raise FileNotFoundError(f"cannot load ROM {rom_path!r}")
        h, w, alen = ctypes.c_int32(), ctypes.c_int32(), ctypes.c_int32()
        self._lib.mmtrl_atari_frame_shape(
            ctypes.byref(h), ctypes.byref(w), ctypes.byref(alen)
        )
        self.frame_shape = (h.value, w.value)
        self.audio_len = alen.value

    def step(self, actions: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """actions: (N,) uint8 bitmasks -> (frames (N,H,W) uint8 color
        indices, audio (N, 2, audio_len) float32 in [0, 1])."""
        actions = np.ascontiguousarray(actions, dtype=np.uint8)
        frames = np.zeros((self.num_envs,) + self.frame_shape, np.uint8)
        audio = np.zeros((self.num_envs, 2, self.audio_len), np.float32)
        self._lib.mmtrl_atari_step(self._handle, actions, frames, audio)
        return frames, audio

    def ram(self) -> np.ndarray:
        """(N, 128) uint8 RIOT RAM snapshot of every machine."""
        out = np.zeros((self.num_envs, 128), np.uint8)
        self._lib.mmtrl_atari_ram(self._handle, out)
        return out

    def close(self):
        if self._handle > 0:
            self._lib.mmtrl_atari_close(self._handle)
            self._handle = 0
