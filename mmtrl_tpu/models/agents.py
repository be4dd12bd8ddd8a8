"""Agent architectures (flax linen), scan-ready.

Every recurrent agent consumes a whole (T, B, ...) window in one call — the
rollout passes T=1, the PPO update passes the full num_steps sequence — and
the LSTM/attention recurrence runs inside nn.scan, so rollout and update are
the *same compiled recurrence* (the reference re-implements it as a python
loop per call, src/agents.py:144-159).

Fidelity notes
--------------
- The reference divides observations by 255 even though the env already
  emits [-1, 1] (src/agents.py:133-134 after Minecraft.py:335).  The quirk
  is preserved via ``input_scale=255.0`` so learned-policy behavior
  transfers; set 1.0 for a sanely-scaled model.
- ``fusion_type='concat'`` with attention enabled is rejected: the reference
  concatenates on dim 0 there (a latent shape bug, src/agents.py:138); 'sum'
  is its working path.
- The sigmoid-gate agent concatenates the scalar gate onto the LSTM output,
  giving 129-d actor/critic heads (src/minecraft_lstm_attention.py:59-104).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from mmtrl_tpu.models.attention import CaslAttention, NewAttention, SigmoidGate
from mmtrl_tpu.models.common import AtariTower, MLPTower, ZEROS, ortho
from mmtrl_tpu.models.lstm import Carry, LSTMCell


def _nchw_to_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.moveaxis(x, -3, -1)


class _RecurrentCore(nn.Module):
    """Per-timestep recurrence: (attention ->) fusion -> masked LSTM."""

    attn_type: Optional[str]
    fusion_type: str
    lstm_features: int

    @nn.compact
    def __call__(self, carry: Carry, inputs):
        video, audio, done = inputs
        h = carry[0]
        gate = None
        if self.attn_type == "casl":
            video, audio, _ = CaslAttention(name="attn")(video, audio, h)
        elif self.attn_type == "new":
            video, audio, _ = NewAttention(name="attn")(video, audio, h)
        elif self.attn_type == "gate":
            video, audio, gate = SigmoidGate(name="attn")(video, audio, h)
        if self.fusion_type == "sum" or self.attn_type == "gate":
            fused = video + audio
        elif self.fusion_type == "concat":
            fused = jnp.concatenate([video, audio], axis=-1)
        else:
            raise NotImplementedError(self.fusion_type)
        carry, hidden = LSTMCell(self.lstm_features, name="lstm")(carry, fused, done)
        if gate is not None:
            hidden = jnp.concatenate([hidden, gate], axis=-1)
        return carry, hidden


class MultimodalRecurrentAgent(nn.Module):
    """Two CNN towers (video ch 0, audio ch 1) + crossmodal attention +
    fusion + done-masked LSTM + actor/critic heads — the reference's
    MinecraftAgent (src/agents.py:93-171) and its sigmoid-gate variant."""

    num_actions: int
    conv_type: str = "big"
    attn_type: Optional[str] = None  # None | 'casl' | 'new' | 'gate'
    fusion_type: str = "sum"
    lstm_features: int = 128
    input_scale: float = 255.0

    def __post_init__(self):
        if self.attn_type in ("casl", "new") and self.fusion_type == "concat":
            raise ValueError(
                "concat fusion with attention is the reference's broken path "
                "(src/agents.py:138); use fusion_type='sum'"
            )
        super().__post_init__()

    @nn.compact
    def __call__(
        self,
        obs: jnp.ndarray,  # (T, B, 2, 84, 84)
        done: jnp.ndarray,  # (T, B)
        carry: Carry,  # ((B, H), (B, H))
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Carry]:
        T, B = obs.shape[:2]
        flat = obs.reshape((T * B,) + obs.shape[2:]) / self.input_scale
        # channel 0 = video, channels 1: = audio plane(s) (mono MFCC for
        # Minecraft2d, stereo L/R for Skeleton+).
        video = AtariTower(self.conv_type, name="video_net")(
            _nchw_to_nhwc(flat[:, 0:1])
        ).reshape(T, B, -1)
        audio = AtariTower(self.conv_type, name="audio_net")(
            _nchw_to_nhwc(flat[:, 1:])
        ).reshape(T, B, -1)

        core = nn.scan(
            _RecurrentCore,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )(self.attn_type, self.fusion_type, self.lstm_features, name="core")
        carry, hidden = core(carry, (video, audio, done))

        logits = nn.Dense(
            self.num_actions, kernel_init=ortho(0.01), bias_init=ZEROS, name="actor"
        )(hidden)
        value = nn.Dense(1, kernel_init=ortho(1.0), bias_init=ZEROS, name="critic")(
            hidden
        )[..., 0]
        return logits, value, carry

    def initial_carry(self, batch_size: int) -> Carry:
        return LSTMCell.initial_carry(batch_size, self.lstm_features)


class _PlainCore(nn.Module):
    lstm_features: int

    @nn.compact
    def __call__(self, carry: Carry, inputs):
        feat, done = inputs
        carry, hidden = LSTMCell(self.lstm_features, name="lstm")(carry, feat, done)
        return carry, hidden


class RecurrentAgent(nn.Module):
    """Single CNN tower + LSTM + heads — the reference's GymAgent/OldAgent
    (src/agents.py:174-275) and cleanrl/ppo_atari_lstm.py's Agent."""

    num_actions: int
    conv_type: str = "big"
    lstm_features: int = 128
    input_scale: float = 255.0

    @nn.compact
    def __call__(self, obs, done, carry):
        T, B = obs.shape[:2]
        flat = obs.reshape((T * B,) + obs.shape[2:]) / self.input_scale
        feat = AtariTower(self.conv_type, name="network")(
            _nchw_to_nhwc(flat)
        ).reshape(T, B, -1)
        core = nn.scan(
            _PlainCore,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )(self.lstm_features, name="core")
        carry, hidden = core(carry, (feat, done))
        logits = nn.Dense(
            self.num_actions, kernel_init=ortho(0.01), bias_init=ZEROS, name="actor"
        )(hidden)
        value = nn.Dense(1, kernel_init=ortho(1.0), bias_init=ZEROS, name="critic")(
            hidden
        )[..., 0]
        return logits, value, carry

    def initial_carry(self, batch_size: int) -> Carry:
        return LSTMCell.initial_carry(batch_size, self.lstm_features)


class CNNAgent(nn.Module):
    """Feed-forward CNN actor-critic over the full multi-channel observation
    — the reference's minecraft_cnn.py Agent (its in_channels=2 CNN, no
    LSTM).  Unlike the reference, the /255 rescale is applied consistently
    in both policy and value paths (minecraft_cnn.py:142 omits it for the
    policy — a bug, not replicated)."""

    num_actions: int
    conv_type: str = "big"
    input_scale: float = 255.0

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = _nchw_to_nhwc(obs / self.input_scale)
        feat = AtariTower(self.conv_type, name="network")(x)
        logits = nn.Dense(
            self.num_actions, kernel_init=ortho(0.01), bias_init=ZEROS, name="actor"
        )(feat)
        value = nn.Dense(1, kernel_init=ortho(1.0), bias_init=ZEROS, name="critic")(
            feat
        )[..., 0]
        return logits, value


class MLPActorCritic(nn.Module):
    """Separate 64-64 tanh actor/critic for vector observations — the
    reference's cleanrl/ppo.py Agent."""

    num_actions: int

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        logits = nn.Dense(
            self.num_actions, kernel_init=ortho(0.01), bias_init=ZEROS, name="actor_out"
        )(MLPTower(name="actor_trunk")(obs))
        value = nn.Dense(
            1, kernel_init=ortho(1.0), bias_init=ZEROS, name="critic_out"
        )(MLPTower(name="critic_trunk")(obs))[..., 0]
        return logits, value


class ContinuousActorCritic(nn.Module):
    """Gaussian policy with state-independent log-std + separate critic —
    cleanrl/ppo_continuous_action.py's Agent; ``rpo_alpha`` enables the RPO
    mean perturbation (cleanrl/rpo_continuous_action.py:108-140)."""

    action_dim: int

    @nn.compact
    def __call__(self, obs: jnp.ndarray):
        mean = nn.Dense(
            self.action_dim, kernel_init=ortho(0.01), bias_init=ZEROS, name="actor_out"
        )(MLPTower(name="actor_trunk")(obs))
        log_std = self.param(
            "log_std", nn.initializers.zeros, (self.action_dim,)
        )
        value = nn.Dense(
            1, kernel_init=ortho(1.0), bias_init=ZEROS, name="critic_out"
        )(MLPTower(name="critic_trunk")(obs))[..., 0]
        return mean, jnp.broadcast_to(log_std, mean.shape), value


class QNetwork(nn.Module):
    """DQN Q-network: Atari tower for image obs (cleanrl/dqn_atari_jax.py),
    120-84 relu MLP for vector obs (cleanrl/dqn.py)."""

    num_actions: int
    input_scale: float = 255.0

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> jnp.ndarray:
        if obs.ndim >= 4:  # (B, C, H, W) image
            feat = AtariTower("big", name="network")(
                _nchw_to_nhwc(obs / self.input_scale)
            )
        else:
            feat = MLPTower((120, 84), activation="relu", name="network")(obs)
        return nn.Dense(self.num_actions, name="q")(feat)


class DistributionalQNetwork(nn.Module):
    """C51 categorical Q-network: per-action distribution over ``n_atoms``
    support points (cleanrl/c51_atari_jax.py)."""

    num_actions: int
    n_atoms: int = 101
    input_scale: float = 255.0

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> jnp.ndarray:
        if obs.ndim >= 4:
            feat = AtariTower("big", name="network")(
                _nchw_to_nhwc(obs / self.input_scale)
            )
        else:
            feat = MLPTower((120, 84), activation="relu", name="network")(obs)
        logits = nn.Dense(self.num_actions * self.n_atoms, name="q")(feat)
        return nn.softmax(
            logits.reshape(-1, self.num_actions, self.n_atoms), axis=-1
        )


# ---- continuous-control actor/critics (DDPG/TD3/SAC) ------------------------
class QFunction(nn.Module):
    """Q(s, a) critic MLP (cleanrl/ddpg_continuous_action_jax.py:QNetwork)."""

    @nn.compact
    def __call__(self, obs: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([obs, action], axis=-1)
        x = MLPTower((256, 256), activation="relu")(x)
        return nn.Dense(1)(x)[..., 0]


class DeterministicActor(nn.Module):
    """tanh-squashed deterministic policy (DDPG/TD3)."""

    action_dim: int
    action_scale: Tuple[float, ...]
    action_bias: Tuple[float, ...]

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> jnp.ndarray:
        x = MLPTower((256, 256), activation="relu")(obs)
        x = jnp.tanh(nn.Dense(self.action_dim)(x))
        return x * jnp.asarray(self.action_scale) + jnp.asarray(self.action_bias)


LOG_STD_MIN, LOG_STD_MAX = -5.0, 2.0


class SquashedGaussianActor(nn.Module):
    """SAC actor: state-dependent mean/log-std with tanh squashing
    (cleanrl/sac_continuous_action.py:110-140)."""

    action_dim: int
    action_scale: Tuple[float, ...]
    action_bias: Tuple[float, ...]

    @nn.compact
    def __call__(self, obs: jnp.ndarray):
        x = MLPTower((256, 256), activation="relu")(obs)
        mean = nn.Dense(self.action_dim, name="mean")(x)
        log_std = nn.Dense(self.action_dim, name="log_std")(x)
        log_std = jnp.tanh(log_std)
        log_std = LOG_STD_MIN + 0.5 * (LOG_STD_MAX - LOG_STD_MIN) * (log_std + 1)
        return mean, log_std
