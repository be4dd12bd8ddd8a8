"""Done-masked LSTM cell built for lax.scan.

The reference threads (h, c) through a per-timestep *python* loop, zeroing
the carry wherever an episode ended (src/agents.py:144-159) — T sequential
torch kernel launches per update.  Here the same recurrence is a scan body:
one compiled program regardless of T, with the gate matmuls batched on the
MXU.  Gate math matches torch.nn.LSTM (sigmoid i/f/o, tanh g, no forget
bias), weights orthogonal(1.0) and biases zero like the reference's LSTM
init (src/agents.py:122-126).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from mmtrl_tpu.models.common import ZEROS, ortho

Carry = Tuple[jnp.ndarray, jnp.ndarray]  # (h, c), each (B, H)


class LSTMCell(nn.Module):
    features: int = 128

    @nn.compact
    def __call__(
        self, carry: Carry, x: jnp.ndarray, done: jnp.ndarray
    ) -> Tuple[Carry, jnp.ndarray]:
        """One step.  ``done`` (B,) is the flag that PRECEDED this input —
        the carry is reset before use, exactly like the reference's
        ``(1 - d) * lstm_state`` masking (src/agents.py:150-156)."""
        h, c = carry
        mask = (1.0 - done.astype(jnp.float32))[:, None]
        h, c = h * mask, c * mask
        gates = (
            nn.Dense(4 * self.features, use_bias=True,
                     kernel_init=ortho(1.0), bias_init=ZEROS, name="ih")(x)
            + nn.Dense(4 * self.features, use_bias=True,
                       kernel_init=ortho(1.0), bias_init=ZEROS, name="hh")(h)
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = nn.sigmoid(f) * c + nn.sigmoid(i) * nn.tanh(g)
        h = nn.sigmoid(o) * nn.tanh(c)
        return (h, c), h

    @staticmethod
    def initial_carry(batch_size: int, features: int = 128) -> Carry:
        z = jnp.zeros((batch_size, features), dtype=jnp.float32)
        return (z, z)
