"""GoogleAgent architecture parity vs the reference variant.

The reference's src/minecraft_lstm_google.py builds its OWN towers — the
full Nature conv trunk projected to 256 (:36-59), NOT conv_factory's
'small' — concat-fuses into LSTM(512->128) and uses distinct MLP heads
with std=1 hidden inits (actor Tanh(32) :67-71, critic Tanh(128) :73-77).
These tests pin every parameter shape so the variant can't silently decay
into the shared MultimodalRecurrentAgent defaults (round-1 VERDICT weak #8).
"""

import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def _params(policy_offset=0.0):
    from minecraft_lstm_google import GoogleAgent

    agent = GoogleAgent(num_actions=4, policy_offset=policy_offset)
    obs = jnp.zeros((2, 3, 2, 84, 84), jnp.float32)
    done = jnp.zeros((2, 3), bool)
    carry = agent.initial_carry(3)
    params = agent.init(jax.random.PRNGKey(0), obs, done, carry)
    return agent, params, (obs, done, carry)


def test_google_agent_param_shapes():
    _, params, _ = _params()
    flat = {
        "/".join(str(k.key) for k in path): tuple(leaf.shape)
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    kernels = {k: v for k, v in flat.items() if k.endswith("kernel")}

    # Big Nature trunk with 256-d projection, per tower (reference :36-59).
    for tower in ("video_net", "audio_net"):
        tower_kernels = sorted(
            v for k, v in kernels.items() if f"/{tower}/" in k
        )
        assert tower_kernels == sorted(
            [(8, 8, 1, 32), (4, 4, 32, 64), (3, 3, 64, 64), (3136, 256)]
        ), tower_kernels

    # LSTM over the 512-d concat fusion into 128 hidden (:61).
    lstm_in = [v for k, v in kernels.items() if "core" in k and v[0] == 512]
    lstm_h = [v for k, v in kernels.items() if "core" in k and v[0] == 128]
    assert lstm_in and lstm_h, sorted(kernels)

    # Distinct MLP heads (:67-77): actor 128->32->4, critic 128->128->1.
    head_shapes = sorted(
        v
        for k, v in kernels.items()
        if "core" not in k and "video" not in k and "audio" not in k
    )
    assert head_shapes == sorted(
        [(128, 32), (32, 4), (128, 128), (128, 1)]
    ), head_shapes


def test_policy_offset_semantics():
    """offset=0 reproduces the reference's effective behavior (the flag is
    parsed but never used upstream, minecraft_lstm_google.py:35); offset>0
    mixes toward uniform: p' = (1-o)*p + o/A."""
    from minecraft_lstm_google import GoogleAgent

    agent0, params, (obs, done, carry) = _params(policy_offset=0.0)
    obs = jax.random.uniform(jax.random.PRNGKey(1), obs.shape) * 255.0
    logits0, value0, _ = agent0.apply(params, obs, done, carry)

    agent5 = GoogleAgent(num_actions=4, policy_offset=0.5)
    logits5, value5, _ = agent5.apply(params, obs, done, carry)

    p0 = jax.nn.softmax(logits0, axis=-1)
    p5 = jax.nn.softmax(logits5, axis=-1)
    assert jnp.allclose(p5, 0.5 * p0 + 0.5 / 4, atol=1e-6)
    assert jnp.allclose(value0, value5)
    # Mixing bounds every action's probability away from 0.
    assert float(p5.min()) >= 0.125 - 1e-6
