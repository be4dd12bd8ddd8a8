"""Crossmodal attention / fusion modules.

Three variants mirroring the reference:

- CaslAttention: additive attention ``softmax(W(tanh(Wv v + Wa a + Wh h)))``
  over the two modalities, scaling each modality's features by its weight
  (src/agents.py:58-75, per the CASL paper the reference cites README.md:12).
- NewAttention: ``softmax(W(tanh(FC([v; a; h]))))`` (src/agents.py:78-90).
- SigmoidGate: ``w = sigmoid(MLP([v; a]))``, convex combination
  ``v*w + a*(1-w)``; the scalar gate is also surfaced so the agent can
  concatenate it onto the LSTM output for 129-d heads
  (src/minecraft_lstm_attention.py:59-104).

One deliberate fidelity *improvement*: the reference's update phase applies
attention with the stale pre-sequence LSTM state for every timestep (a
broadcasting accident that only typechecks for 1-env minibatches —
src/agents.py:70-72 against (T*B, F) features), while its rollout phase uses
the current state each step.  Here attention always runs inside the
recurrence with the current state, so rollout and update paths are exactly
consistent.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from mmtrl_tpu.models.common import ZEROS, ortho


class CaslAttention(nn.Module):
    hidden: int = 32

    @nn.compact
    def __call__(
        self, video: jnp.ndarray, audio: jnp.ndarray, h: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        dense = lambda n, name: nn.Dense(  # noqa: E731
            n, kernel_init=ortho(1.0), bias_init=ZEROS, name=name
        )
        act = nn.tanh(
            dense(self.hidden, "video_fc")(video)
            + dense(self.hidden, "audio_fc")(audio)
            + dense(self.hidden, "state_fc")(h)
        )
        weights = nn.softmax(dense(2, "attention")(act), axis=-1)
        return weights[:, 0:1] * video, weights[:, 1:2] * audio, weights


class NewAttention(nn.Module):
    hidden: int = 128

    @nn.compact
    def __call__(
        self, video: jnp.ndarray, audio: jnp.ndarray, h: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        x = jnp.concatenate([video, audio, h], axis=-1)
        act = nn.tanh(
            nn.Dense(self.hidden, kernel_init=ortho(1.0), bias_init=ZEROS)(x)
        )
        weights = nn.softmax(
            nn.Dense(2, kernel_init=ortho(1.0), bias_init=ZEROS, name="attention")(act),
            axis=-1,
        )
        return weights[:, 0:1] * video, weights[:, 1:2] * audio, weights


class SigmoidGate(nn.Module):
    hidden: int = 512

    @nn.compact
    def __call__(
        self, video: jnp.ndarray, audio: jnp.ndarray, h: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        x = jnp.concatenate([video, audio], axis=-1)
        x = nn.relu(nn.Dense(self.hidden, kernel_init=ortho(), bias_init=ZEROS)(x))
        gate = nn.sigmoid(
            nn.Dense(1, kernel_init=ortho(), bias_init=ZEROS)(x)
        )  # (B, 1)
        # Convex combination; both scaled features returned so fusion 'sum'
        # reproduces v*w + a*(1-w).
        return gate * video, (1.0 - gate) * audio, gate
