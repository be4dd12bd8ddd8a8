"""The space-to-depth first conv (models/common._S2DConv) must be EXACTLY
the reference conv — same parameter tree (names, shapes, init family) and
same math — so checkpoints from before the layout change keep loading and
all agents' numerics are unchanged."""

import jax
import jax.numpy as jnp
import numpy as np

from mmtrl_tpu.models.common import AtariTower


def test_param_tree_matches_reference_layout():
    tower = AtariTower("big")
    params = tower.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 84, 84, 1), jnp.float32)
    )
    p = params["params"]
    assert set(p.keys()) == {"Conv_0", "Conv_1", "Conv_2", "Dense_0"}
    assert p["Conv_0"]["kernel"].shape == (8, 8, 1, 32)
    assert p["Conv_0"]["bias"].shape == (32,)
    assert p["Conv_1"]["kernel"].shape == (4, 4, 32, 64)


def test_s2d_equals_direct_stride4_conv():
    tower = AtariTower("small")
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 84, 84, 1), jnp.float32)
    params = tower.init(jax.random.PRNGKey(0), x)
    kernel = params["params"]["Conv_0"]["kernel"]
    bias = params["params"]["Conv_0"]["bias"]

    direct = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(4, 4), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias

    # Recompute the tower's first layer only, via the module interface.
    from mmtrl_tpu.models.common import _S2DConv

    s2d = _S2DConv(16)
    out = s2d.apply({"params": params["params"]["Conv_0"]}, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(direct), rtol=2e-5, atol=2e-5
    )


def test_tower_forward_finite_and_shaped():
    tower = AtariTower("big")
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 84, 84, 1), jnp.float32)
    params = tower.init(jax.random.PRNGKey(0), x)
    y = tower.apply(params, x)
    assert y.shape == (5, 512)
    assert np.isfinite(np.asarray(y)).all()
