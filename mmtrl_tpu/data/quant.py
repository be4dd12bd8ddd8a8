"""Shared host-loop quantization conventions.

Every host-loop trainer (PPO/DQN/C51: algos/ppo/hostloop.py,
algos/offpolicy/hostloop_dqn.py; offline DT: algos/dt/hostloop.py) moves
observations across the host<->device boundary and/or stores them in
HBM-resident buffers with the same two fixed-point codes:

- **obs int8, 1/127 granularity**: observations live in [-1, 1] by the
  preprocessing contract, so ``round(x * 127)`` is lossless at training
  precision (bf16 mantissa ~= 1/256 at |x|~1) and quarters replay HBM.
- **audio u8, 1/15 granularity**: raw TIA audio volumes are 4-bit
  (AUDV 0..15); the emulator emits them as [0, 1] floats, so a 1/15 code
  is exact by construction, not an approximation.

Keeping the encode/decode pairs in one module means the replay buffer, the
DT dataset, and the acting paths can never drift apart on granularity.
"""

import jax.numpy as jnp
import numpy as np

OBS_SCALE = 127.0  # int8 code for [-1, 1] observations
AUDIO_SCALE = 15.0  # u8 code for 4-bit TIA volumes in [0, 1]


def quant_obs_i8(x: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] float obs -> int8 (device-side)."""
    return jnp.clip(jnp.rint(x * OBS_SCALE), -127, 127).astype(jnp.int8)


def dequant_obs_i8(x: jnp.ndarray) -> jnp.ndarray:
    """int8 obs code -> float32 in [-1, 1] (device-side)."""
    return x.astype(jnp.float32) / OBS_SCALE


def quant_audio_u8(audio: np.ndarray) -> np.ndarray:
    """[0, 1] host audio volumes -> u8 (exact for 4-bit TIA levels)."""
    return np.rint(audio * AUDIO_SCALE).astype(np.uint8)


def dequant_audio_u8(audio_u8: jnp.ndarray) -> jnp.ndarray:
    """u8 audio code -> float32 volumes in [0, 1] (device-side)."""
    return audio_u8.astype(jnp.float32) / AUDIO_SCALE
