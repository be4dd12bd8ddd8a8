"""Decision Transformer for multimodal trajectories, TPU-native.

The reference declares an offline phase — "a decision transformer as per
kzl/decision-transformer" (reference README.md:10-15) — but its
``decision-transformer/`` directory is empty; this is the from-scratch
build.  Architecture follows the published DT design: per timestep t the
tokens (returns-to-go_t, state_t, action_t) are each embedded to d_model, a
learned timestep embedding is added to all three, the interleaved 3K-token
sequence runs through a pre-LN causal GPT stack, and actions are predicted
from the *state*-token outputs.

TPU-first choices:
- causal self-attention is the Pallas flash-attention kernel
  (ops/flash_attention.py) when the padded sequence justifies it, jnp
  fallback otherwise — selected at trace time from static shapes;
- the multimodal state embedding reuses the SAME two-tower CNN + fusion
  encoder as the online agents (models/common.py towers), applied to all
  B*K frames in one batched conv — MXU-friendly, no per-step loop;
- a ``compute_dtype`` knob (bfloat16 by default on TPU) keeps matmuls on
  the MXU's native format with float32 params and layernorm statistics.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mmtrl_tpu.models.common import AtariTower, ZEROS, ortho
from mmtrl_tpu.ops.flash_attention import causal_flash_attention


@dataclasses.dataclass(frozen=True)
class DTConfig:
    num_actions: int = 4
    context_len: int = 30  # K timesteps -> 3K tokens
    d_model: int = 512
    n_layers: int = 6
    n_heads: int = 4  # head_dim 128 = one MXU lane tile
    mlp_ratio: int = 4
    dropout: float = 0.1
    max_timestep: int = 4096
    state_kind: str = "multimodal"  # 'multimodal' (2,84,84) | 'vector'
    state_dim: int = 0  # used when state_kind == 'vector'
    conv_type: str = "big"
    fusion_type: str = "sum"
    compute_dtype: str = "bfloat16"
    # Rematerialize block activations in the backward (jax.checkpoint):
    # trades ~1 extra forward of FLOPs for O(n_layers) less activation HBM —
    # the lever for long contexts / deep stacks. Param tree is unchanged
    # (checkpoint-compatible either way).
    remat: bool = False
    # Mixture-of-experts FFN (models/moe.py): 0 = dense FFN (default, param
    # tree unchanged). >0 swaps every block's FFN for a top-k gated MoE with
    # that many experts — the expert-parallel (ep) scaling axis
    # (parallel/expert.py). The router's load-balance aux loss is sown under
    # intermediates/moe_aux and added by the trainer at moe_aux_coef.
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_aux_coef: float = 0.01
    # MoE token dispatch: 'dense' (GShard einsum) or 'gather' (capacity-
    # based top-k — E/top_k fewer FFN FLOPs on one chip; see models/moe.py).
    moe_dispatch: str = "dense"
    # LayerNorm compute dtype.  float32 (default) keeps normalization
    # statistics in full precision; bfloat16 halves the HBM traffic of the
    # 13 LN read/write chains on the (B*S, d_model) activations — the
    # elementwise cost the RESULTS.md floor argument names as HBM-bound.
    # Measured flagship effect + convergence check: tools/bench_flagship_levers.py.
    ln_dtype: str = "float32"
    # Sequence-parallel attention: when set, the model is being traced
    # INSIDE a shard_map whose ``seq_axis`` mesh axis shards the token
    # dimension, and attention runs the ppermute ring
    # (parallel/ring_attention.py) instead of the single-device kernel.
    # Everything else in the block (LN, FFN, heads) is pointwise over
    # tokens, so it needs no change under sequence sharding.  The axis
    # size must be given statically (ring schedule length).
    seq_axis: Optional[str] = None
    seq_axis_size: int = 1

    @property
    def seq_len(self) -> int:
        return 3 * self.context_len


class MultimodalStateEncoder(nn.Module):
    """(B*K, 2, 84, 84) -> (B*K, d_model): the online agents' two-tower
    encoder (video ch 0 / audio ch 1, src/agents.py:118-119) projected to
    the transformer width."""

    d_model: int
    conv_type: str = "big"
    fusion_type: str = "sum"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, states: jnp.ndarray) -> jnp.ndarray:
        x = states.astype(self.dtype)
        # channel 0 = video; remaining channels = audio planes (1 for
        # Minecraft2d MFCC, 2 for Skeleton+ stereo L/R).  dtype is passed
        # explicitly — flax otherwise promotes bf16 activations back to the
        # f32 param dtype, silently running every matmul off the MXU's
        # native bf16 rate.
        video = AtariTower(self.conv_type, dtype=self.dtype, name="video_net")(
            jnp.moveaxis(x[:, 0:1], 1, -1)
        )
        audio = AtariTower(self.conv_type, dtype=self.dtype, name="audio_net")(
            jnp.moveaxis(x[:, 1:], 1, -1)
        )
        if self.fusion_type == "sum":
            fused = video + audio
        else:
            fused = jnp.concatenate([video, audio], axis=-1)
        return nn.Dense(
            self.d_model, kernel_init=ortho(1.0), bias_init=ZEROS,
            dtype=self.dtype, name="proj",
        )(fused)


class CausalSelfAttention(nn.Module):
    cfg: DTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        cfg = self.cfg
        B, S, D = x.shape
        H = cfg.n_heads
        hd = D // H
        dtype = jnp.dtype(cfg.compute_dtype)
        qkv = nn.Dense(
            3 * D, kernel_init=ortho(1.0), bias_init=ZEROS, dtype=dtype,
            name="qkv",
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda t: t.reshape(B, S, H, hd).transpose(0, 2, 1, 3)  # noqa: E731
        if cfg.seq_axis is not None:
            from mmtrl_tpu.parallel.ring_attention import _ring_attention_local

            o = _ring_attention_local(
                split(q), split(k), split(v),
                axis_name=cfg.seq_axis, axis_size=cfg.seq_axis_size,
                causal=True, scale=None,
            )
        else:
            o = causal_flash_attention(split(q), split(k), split(v))
        o = o.transpose(0, 2, 1, 3).reshape(B, S, D)
        o = nn.Dense(
            D, kernel_init=ortho(1.0), bias_init=ZEROS, dtype=dtype, name="out"
        )(o)
        return nn.Dropout(cfg.dropout)(o, deterministic=deterministic)


class Block(nn.Module):
    cfg: DTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        h = nn.LayerNorm(dtype=jnp.dtype(cfg.ln_dtype), name="ln1")(x).astype(dtype)
        x = x + CausalSelfAttention(cfg, name="attn")(h, deterministic)
        h = nn.LayerNorm(dtype=jnp.dtype(cfg.ln_dtype), name="ln2")(x).astype(dtype)
        if cfg.moe_experts:
            from mmtrl_tpu.models.moe import MoEFFN

            h = MoEFFN(
                d_model=cfg.d_model,
                d_ff=cfg.mlp_ratio * cfg.d_model,
                num_experts=cfg.moe_experts,
                top_k=cfg.moe_top_k,
                dtype=dtype,
                dispatch=cfg.moe_dispatch,
                name="moe",
            )(h)
        else:
            h = nn.Dense(
                cfg.mlp_ratio * cfg.d_model, kernel_init=ortho(1.0),
                bias_init=ZEROS, dtype=dtype, name="fc",
            )(h)
            h = nn.gelu(h)
            h = nn.Dense(
                cfg.d_model, kernel_init=ortho(1.0), bias_init=ZEROS,
                dtype=dtype, name="proj",
            )(h)
        h = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
        return x + h


class DecisionTransformer(nn.Module):
    cfg: DTConfig

    @nn.compact
    def __call__(
        self,
        rtg: jnp.ndarray,  # (B, K) returns-to-go
        states: jnp.ndarray,  # (B, K, 2, 84, 84) or (B, K, state_dim)
        actions: jnp.ndarray,  # (B, K) int32
        timesteps: jnp.ndarray,  # (B, K) int32 absolute episode timesteps
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Returns action logits (B, K, num_actions), predicted from the
        state-token outputs (the DT action head)."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        B, K = rtg.shape

        if cfg.state_kind == "multimodal":
            flat = states.reshape((B * K,) + states.shape[2:])
            state_emb = MultimodalStateEncoder(
                cfg.d_model, cfg.conv_type, cfg.fusion_type, dtype,
                name="state_encoder",
            )(flat).reshape(B, K, cfg.d_model)
        else:
            state_emb = nn.Dense(
                cfg.d_model, kernel_init=ortho(1.0), bias_init=ZEROS,
                dtype=dtype, name="state_encoder",
            )(states.astype(dtype))

        rtg_emb = nn.Dense(
            cfg.d_model, kernel_init=ortho(1.0), bias_init=ZEROS, dtype=dtype,
            name="rtg_emb",
        )(rtg[..., None].astype(dtype))
        act_emb = nn.Embed(
            cfg.num_actions, cfg.d_model,
            embedding_init=nn.initializers.normal(0.02), name="action_emb",
        )(actions).astype(dtype)
        time_emb = nn.Embed(
            cfg.max_timestep, cfg.d_model,
            embedding_init=nn.initializers.normal(0.02), name="time_emb",
        )(timesteps).astype(dtype)

        # Interleave (R, s, a) per timestep -> (B, 3K, D); each token gets
        # its timestep's positional embedding.
        tokens = jnp.stack(
            [rtg_emb + time_emb, state_emb + time_emb, act_emb + time_emb], axis=2
        ).reshape(B, 3 * K, cfg.d_model)
        x = nn.Dropout(cfg.dropout)(tokens, deterministic=deterministic)

        block_cls = (
            nn.remat(Block, static_argnums=(2,)) if cfg.remat else Block
        )
        for i in range(cfg.n_layers):
            x = block_cls(cfg, name=f"block_{i}")(x, deterministic)
        x = nn.LayerNorm(dtype=jnp.dtype(cfg.ln_dtype), name="ln_f")(x)

        state_tokens = x[:, 1::3]  # outputs at state positions
        logits = nn.Dense(
            cfg.num_actions, kernel_init=ortho(0.01), bias_init=ZEROS,
            dtype=dtype, name="action_head",
        )(state_tokens.astype(dtype))
        return logits.astype(jnp.float32)
