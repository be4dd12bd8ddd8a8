"""Shared network building blocks (flax linen).

Initialization follows the CleanRL convention the reference uses everywhere:
orthogonal kernels (sqrt(2) hidden, 0.01 policy head, 1.0 value head) with
zero biases (reference: src/utils.py:146-149).

Layout is TPU-native NHWC (channel-last) so XLA tiles convs onto the MXU
without transposes; agents slice the (C, H, W) observation channels and
append the trailing channel axis themselves.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def ortho(scale: float = float(np.sqrt(2))):
    return nn.initializers.orthogonal(scale)


ZEROS = nn.initializers.zeros


class AtariTower(nn.Module):
    """The Nature-CNN tower, 'big' (512-d) or 'small' (256-d) per the
    reference's conv_factory (src/agents.py:30-55).

    Input (B, 84, 84, 1) scaled by the caller; output (B, feature_size).
    """

    size: str = "big"  # 'big' | 'small'
    features: Optional[int] = None  # override the output width (the google
    # variant uses the big conv trunk with a 256-d projection,
    # src/minecraft_lstm_google.py:36-59)
    dtype: Optional[jnp.dtype] = None  # compute dtype; None = flax promotion
    # (f32 with f32 params).  The DT passes bfloat16 so convs/matmuls run at
    # the MXU's native rate; params stay f32 either way.

    @property
    def feature_size(self) -> int:
        if self.features is not None:
            return self.features
        return 512 if self.size == "big" else 256

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.size == "big":
            widths, kernels, strides = (32, 64, 64), (8, 4, 3), (4, 2, 1)
        elif self.size == "small":
            widths, kernels, strides = (16, 32), (8, 4), (4, 2)
        else:
            raise ValueError(f"unknown tower size {self.size!r}")
        for w, k, s in zip(widths, kernels, strides):
            x = nn.Conv(
                w, (k, k), strides=(s, s), padding="VALID",
                kernel_init=ortho(), bias_init=ZEROS, dtype=self.dtype,
            )(x)
            x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(
            self.feature_size, kernel_init=ortho(), bias_init=ZEROS,
            dtype=self.dtype,
        )(x)
        return nn.relu(x)


class ResidualBlock(nn.Module):
    """IMPALA residual block (the reference's ppg_procgen.py:122)."""

    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(x)
        h = nn.Conv(self.channels, (3, 3), padding="SAME")(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3, 3), padding="SAME")(h)
        return x + h


class ConvSequence(nn.Module):
    """IMPALA conv + maxpool + 2 residual blocks (ppg_procgen.py:141)."""

    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.channels, (3, 3), padding="SAME")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        x = ResidualBlock(self.channels)(x)
        return ResidualBlock(self.channels)(x)


class ImpalaTower(nn.Module):
    """IMPALA CNN trunk (the reference's PPG/Procgen encoder)."""

    channel_seq: Sequence[int] = (16, 32, 32)
    hidden: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for ch in self.channel_seq:
            x = ConvSequence(ch)(x)
        x = nn.relu(x.reshape((x.shape[0], -1)))
        x = nn.Dense(self.hidden, kernel_init=ortho(), bias_init=ZEROS)(x)
        return nn.relu(x)


class MLPTower(nn.Module):
    """Tanh MLP trunk for vector observations (the reference's classic
    control agents, cleanrl/ppo.py)."""

    widths: Sequence[int] = (64, 64)
    activation: str = "tanh"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = {"tanh": nn.tanh, "relu": nn.relu}[self.activation]
        for w in self.widths:
            x = nn.Dense(w, kernel_init=ortho(), bias_init=ZEROS)(x)
            x = act(x)
        return x
