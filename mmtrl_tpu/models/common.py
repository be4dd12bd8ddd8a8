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


class _S2DConv(nn.Module):
    """8x8-stride-4 conv over a 1-channel input, computed space-to-depth.

    A C_in=1 conv wastes most of the MXU's channel lanes (measured ~4.7 ms
    of the flagship DT step in the two towers, tools/bench_dt_breakdown.py).
    Packing each 4x4 pixel block into 16 channels turns it into an exactly
    equivalent 2x2-stride-1 conv over 16 channels:

        out(i,j,o) = sum_{u,v} W[u,v,0,o] x[4i+u, 4j+v]
                   = sum_{a,b,c} W2[a,b,c,o] x2[i+a, j+b, c],
        c = 4*dy + dx,  u = 4a+dy,  v = 4b+dx.

    The parameter KEEPS the reference layout (8,8,1,features) — same names,
    same shapes, same orthogonal-init distribution (flattened (64,F) either
    way) — so existing checkpoints load unchanged; only the apply-time
    layout differs.
    """

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        kernel = self.param(
            "kernel", ortho(), (8, 8, 1, self.features), jnp.float32
        )
        bias = self.param("bias", ZEROS, (self.features,), jnp.float32)
        b, h, w, _ = x.shape
        dt = self.dtype or x.dtype
        x2 = (
            x.reshape(b, h // 4, 4, w // 4, 4)
            .transpose(0, 1, 3, 2, 4)
            .reshape(b, h // 4, w // 4, 16)
        )
        w2 = (
            kernel.reshape(2, 4, 2, 4, self.features)
            .transpose(0, 2, 1, 3, 4)
            .reshape(2, 2, 16, self.features)
        )
        out = jax.lax.conv_general_dilated(
            x2.astype(dt),
            w2.astype(dt),
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias.astype(dt)


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
        for i, (w, k, s) in enumerate(zip(widths, kernels, strides)):
            if (
                i == 0 and x.shape[-1] == 1 and (k, s) == (8, 4)
                and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0
            ):
                # checkpoint-compatible MXU-friendly path (see _S2DConv);
                # explicit names keep flax's auto-numbering (Conv_0...)
                x = _S2DConv(w, dtype=self.dtype, name="Conv_0")(x)
            else:
                x = nn.Conv(
                    w, (k, k), strides=(s, s), padding="VALID",
                    kernel_init=ortho(), bias_init=ZEROS, dtype=self.dtype,
                    name=f"Conv_{i}",
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
