"""Top-k gated Mixture-of-Experts FFN (the ``expert`` / ep axis).

The reference framework has no MoE (its FFNs are single torch Linears,
src/models.py); this is scaling headroom in the same spirit as the repo's
TP/FSDP/PP/SP modules: a transformer FFN whose capacity grows with the
number of chips while per-token FLOPs stay near-constant.

TPU-first design decisions:

- **Dense dispatch** (the GShard/Switch einsum formulation): every expert's
  FFN is computed as one batched einsum over stacked parameters
  ``(E, d_model, d_ff)`` and combined with a top-k one-hot weight tensor.
  No dynamic gather/scatter, no data-dependent shapes — XLA sees three
  static einsums that tile straight onto the MXU.  At the small expert
  counts this repo targets (E ≤ 16) the masked-compute overhead is the
  textbook trade for compile-time-static routing on TPU.
- **Expert parallelism** = shard the stacked-expert axis over a mesh axis
  (``parallel/expert.py``): each device holds E/n experts, computes its
  partial combine, and one ``psum`` (ICI all-reduce) completes the output.
  Gating stays replicated — it is a (B, S, E) matmul, negligible next to
  the expert FFNs.
- **Router aux loss** (Switch Transformers, Fedus et al. 2021): the
  fraction-weighted load-balance term is sown under
  ``intermediates/moe_aux`` so trainers can add it without changing the
  module's return type.  Perfectly balanced routing gives aux == 1.0.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmtrl_tpu.models.common import ZEROS, ortho


def moe_combine_weights(
    gate_logits: jnp.ndarray, top_k: int
) -> jnp.ndarray:
    """(..., E) router logits -> (..., E) combine weights.

    Softmax over the top-k expert logits per token; non-selected experts get
    exactly 0.  ``top_k == E`` degrades to a plain softmax (soft MoE).
    """
    E = gate_logits.shape[-1]
    if top_k >= E:
        return jax.nn.softmax(gate_logits, axis=-1)
    vals, idx = jax.lax.top_k(gate_logits, top_k)  # (..., k)
    w = jax.nn.softmax(vals, axis=-1)
    onehot = jax.nn.one_hot(idx, E, dtype=w.dtype)  # (..., k, E)
    return jnp.einsum("...k,...ke->...e", w, onehot)


def moe_ffn_dense(
    x: jnp.ndarray,  # (B, S, D)
    combine: jnp.ndarray,  # (B, S, E)
    w1: jnp.ndarray,  # (E, D, F)
    b1: jnp.ndarray,  # (E, F)
    w2: jnp.ndarray,  # (E, F, D)
    b2: jnp.ndarray,  # (E, D)
) -> jnp.ndarray:
    """Dense-dispatch expert computation: all experts on all tokens, then a
    combine-weighted sum.  Functional so the expert-parallel shard_map path
    (parallel/expert.py) can call the identical math on its local slice."""
    h = jnp.einsum("bsd,edf->bsef", x, w1) + b1[None, None]
    h = nn.gelu(h)
    y = jnp.einsum("bsef,efd->bsed", h, w2) + b2[None, None]
    return jnp.einsum("bsed,bse->bsd", y, combine.astype(y.dtype))


def moe_ffn_gather(
    x: jnp.ndarray,  # (B, S, D)
    gate_logits: jnp.ndarray,  # (B, S, E) float32
    w1: jnp.ndarray,  # (E, D, F)
    b1: jnp.ndarray,  # (E, F)
    w2: jnp.ndarray,  # (E, F, D)
    b2: jnp.ndarray,  # (E, D)
    *,
    top_k: int,
    capacity_factor: float = 1.25,
) -> jnp.ndarray:
    """Capacity-based top-k dispatch (the Switch/GShard gather formulation).

    Dense dispatch runs every expert on every token — E/top_k more FFN
    FLOPs and an (B, S, E, F) HBM intermediate.  Here each token is routed
    to its top-k experts' slot buffers (static capacity C per expert, so
    all shapes stay compile-time constant): a cumsum over the one-hot
    assignment yields each token's slot, one gather builds the (E, C, D)
    expert inputs, the expert FFNs run as E-batched MXU matmuls over C
    rows, and a scatter-add combines the weighted outputs.  Tokens routed
    past an expert's capacity are dropped for that expert (standard MoE
    semantics; with balanced routing and capacity_factor >= 1.25 drops are
    rare, and capacity_factor >= E/top_k can never drop).

    Matches moe_ffn_dense exactly whenever nothing is dropped
    (tests/test_moe.py); one-chip measurement vs dense:
    tools/bench_moe_dispatch.py.
    """
    B, S, D = x.shape
    E = gate_logits.shape[-1]
    F = w1.shape[-1]
    T = B * S
    # Static per-expert capacity, padded to the MXU's 128-row tile.
    C = int(-(-T * top_k * capacity_factor // E))
    C = min(-(-C // 128) * 128, T)

    xt = x.reshape(T, D)
    vals, idx = jax.lax.top_k(gate_logits.reshape(T, E), top_k)  # (T, k)
    wts = jax.nn.softmax(vals, axis=-1)  # (T, k) f32
    # Choice-major flattening: all 1st choices first, so first choices win
    # slots before second choices when an expert fills up.
    eid = idx.T.reshape(-1)  # (kT,)
    tok = jnp.tile(jnp.arange(T, dtype=jnp.int32), (top_k,))
    wf = wts.T.reshape(-1)
    onehot = jax.nn.one_hot(eid, E, dtype=jnp.int32)  # (kT, E)
    pos = jnp.sum((jnp.cumsum(onehot, axis=0) - 1) * onehot, axis=1)  # (kT,)
    keep = pos < C
    slot = jnp.where(keep, eid * C + pos, E * C)  # out-of-range -> dropped
    token_for_slot = (
        jnp.zeros((E * C,), jnp.int32).at[slot].set(tok, mode="drop")
    )

    xin = xt[token_for_slot].reshape(E, C, D)
    h = nn.gelu(jnp.einsum("ecd,edf->ecf", xin, w1) + b1[:, None])
    y = jnp.einsum("ecf,efd->ecd", h, w2) + b2[:, None]
    # Combine by GATHER, not scatter-add: each (token, choice) reads its
    # slot's output row back and weights it.  A forward scatter-add over
    # (E*C, D) rows serializes on TPU and was measured to eat the entire
    # FLOP saving (runs_mujoco/moe_dispatch_r5.log: 246.0k vs dense
    # 243.0k tokens/s); the gather form keeps the forward combine a
    # vectorized read.  Dropped assignments read the appended zero row —
    # empty slots' garbage rows are simply never referenced.
    yflat = jnp.concatenate(
        [y.reshape(E * C, D), jnp.zeros((1, D), y.dtype)], axis=0
    )
    gathered = yflat[slot].reshape(top_k, T, D)
    out = jnp.einsum(
        "kt,ktd->td", wf.reshape(top_k, T).astype(y.dtype), gathered
    )
    return out.reshape(B, S, D)


def load_balance_aux(gate_probs: jnp.ndarray, combine: jnp.ndarray) -> jnp.ndarray:
    """Switch-style aux loss: E * sum_e(mean token fraction_e * mean prob_e).

    ``gate_probs`` is the full softmax over experts, ``combine`` the top-k
    combine weights (used for the dispatch-fraction estimate: a token
    counts toward every expert it routes to, normalized by top-k mass).
    """
    E = gate_probs.shape[-1]
    frac = (combine > 0).astype(jnp.float32).mean(axis=tuple(range(combine.ndim - 1)))
    frac = frac / jnp.maximum(frac.sum(), 1e-9)
    prob = gate_probs.astype(jnp.float32).mean(
        axis=tuple(range(gate_probs.ndim - 1))
    )
    return E * jnp.sum(frac * prob)


class MoEFFN(nn.Module):
    """Drop-in replacement for a transformer FFN block.

    Stacked expert parameters live under ``experts_*`` with the expert axis
    leading, so an expert-parallel sharding is one PartitionSpec:
    ``P('expert', ...)`` on axis 0 (parallel/sharding.py::moe_param_specs).
    """

    d_model: int
    d_ff: int
    num_experts: int
    top_k: int = 2
    dtype: jnp.dtype = jnp.bfloat16
    # 'dense' (GShard einsum: all experts on all tokens, no gather/scatter)
    # or 'gather' (capacity-based top-k dispatch: E/top_k fewer FFN FLOPs,
    # may drop tokens past capacity).  Measured one-chip comparison:
    # tools/bench_moe_dispatch.py.
    dispatch: str = "dense"
    capacity_factor: float = 1.25

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        E, D, F = self.num_experts, self.d_model, self.d_ff
        # Router in f32: tiny matmul, and top-k stability matters more than
        # MXU rate here.
        gate_logits = nn.Dense(
            E, kernel_init=ortho(1.0), bias_init=ZEROS, dtype=jnp.float32,
            name="gate",
        )(x.astype(jnp.float32))
        combine = moe_combine_weights(gate_logits, self.top_k)
        aux = load_balance_aux(jax.nn.softmax(gate_logits, -1), combine)
        self.sow("intermediates", "moe_aux", aux)

        # Params stored f32 (flax convention — and LAPACK's QR behind the
        # orthogonal init has no bf16 path); computation casts to ``dtype``.
        init = ortho(1.0)
        w1 = self.param("experts_w1", init, (E, D, F), jnp.float32)
        b1 = self.param("experts_b1", ZEROS, (E, F), jnp.float32)
        w2 = self.param("experts_w2", init, (E, F, D), jnp.float32)
        b2 = self.param("experts_b2", ZEROS, (E, D), jnp.float32)
        ws = (
            w1.astype(self.dtype), b1.astype(self.dtype),
            w2.astype(self.dtype), b2.astype(self.dtype),
        )
        if self.dispatch == "gather":
            return moe_ffn_gather(
                x.astype(self.dtype), gate_logits, *ws,
                top_k=self.top_k, capacity_factor=self.capacity_factor,
            )
        if self.dispatch != "dense":
            raise ValueError(f"unknown MoE dispatch {self.dispatch!r}")
        return moe_ffn_dense(x.astype(self.dtype), combine, *ws)
