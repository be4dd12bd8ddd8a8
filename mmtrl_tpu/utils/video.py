"""Rollout video capture — the reference's gym.wrappers.RecordVideo
(reference: src/train.py:35,55 records episodes under videos/<run_name>).

Device-resident envs have no render() window; the policy's own observation
stream IS the rendering (channel 0 is the video frame in every multimodal
env here, already in [-1, 1]).  A greedy episode is rolled out under jit
collecting observations, then written as an animated GIF on host (PIL is
in-tree; ffmpeg is not assumed).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def obs_to_frames(obs: np.ndarray) -> np.ndarray:
    """(T, C, H, W) observations in [-1, 1] -> (T, H, W) uint8 frames.

    Channel 0 is the video plane for the multimodal envs; vector
    observations are rendered as a 1-row stripe chart.
    """
    obs = np.asarray(obs, np.float32)
    if obs.ndim == 4:
        frames = obs[:, 0]
    elif obs.ndim == 3:  # (T, H, W)
        frames = obs
    else:  # vector obs: tile each dim into a column stripe
        t, d = obs.shape[0], int(np.prod(obs.shape[1:]))
        flat = obs.reshape(t, d)
        lo, hi = flat.min(), flat.max()
        norm = (flat - lo) / max(hi - lo, 1e-6) * 2.0 - 1.0
        frames = np.repeat(
            np.repeat(norm[:, None, :], 64, axis=1), max(1, 64 // d), axis=2
        )
    return ((np.clip(frames, -1.0, 1.0) + 1.0) * 127.5).astype(np.uint8)


def write_gif(
    frames_u8: np.ndarray, path: str, fps: int = 15, size=(168, 168)
) -> str:
    """(T, H, W) or (T, H, W, 3) uint8 -> animated GIF at ``path``.

    ``size``: output (width, height); None keeps the native resolution.
    """
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    imgs = [
        Image.fromarray(f) if size is None
        else Image.fromarray(f).resize(size, Image.NEAREST)
        for f in frames_u8
    ]
    imgs[0].save(
        path, save_all=True, append_images=imgs[1:],
        duration=int(1000 / fps), loop=0,
    )
    return path


def record_episode(
    env,
    step_policy: Callable,
    params,
    key: jax.Array,
    num_steps: int = 256,
    initial_carry: Optional[Any] = None,
) -> np.ndarray:
    """Greedy rollout collecting env 0's observations, (T, ...obs).

    ``step_policy(params, obs, done, carry, key) -> (action, carry)`` —
    carry is None for feedforward agents.  Works with both count-free pure
    environments and fixed-count native pools (uses the env's own batch
    size when it has one).
    """
    n = getattr(env, "num_envs", 1)
    key, k_reset = jax.random.split(key)
    obs, state = env.v_reset(jax.random.split(k_reset, n))
    done = jnp.zeros(n, dtype=bool)

    def body(c, _):
        obs, state, done, carry, key = c
        key, k_act, k_step = jax.random.split(key, 3)
        action, carry = step_policy(params, obs, done, carry, k_act)
        nobs, state, _, done, _ = env.v_step(
            jax.random.split(k_step, n), state, action
        )
        return (nobs, state, done, carry, key), obs[0]

    (_, _, _, _, _), traj = jax.lax.scan(
        body, (obs, state, done, initial_carry, key), None, length=num_steps
    )
    return np.asarray(jax.device_get(traj))


def capture_video(
    env,
    step_policy: Callable,
    params,
    run_name: str,
    key: jax.Array,
    tag: str = "final",
    num_steps: int = 256,
    initial_carry: Optional[Any] = None,
    video_dir: str = "videos",
) -> str:
    traj = record_episode(
        env, step_policy, params, key, num_steps, initial_carry
    )
    path = os.path.join(video_dir, run_name, f"{tag}.gif")
    return write_gif(obs_to_frames(traj), path)
