"""Subpixel transposed-conv equivalence (ops/convt.py).

The UNet Upsample computes ConvTranspose(4, 2, 'SAME') via the phase
decomposition; these tests pin exact numerical equivalence with flax
nn.ConvTranspose (the lowering the reference's torch ConvTranspose2d
(4, 2, 1) maps to — reference models/unet/blocks.py:32).
"""
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from dddpm_tpu.models.blocks import Upsample
from dddpm_tpu.ops.convt import conv_transpose_2x_subpixel


@pytest.mark.parametrize("shape,cout", [
    ((2, 8, 8, 16), 24),
    ((1, 5, 7, 8), 8),      # odd spatial dims
    ((3, 4, 4, 4), 12),
])
def test_subpixel_matches_conv_transpose(shape, cout):
    mod = nn.ConvTranspose(cout, (4, 4), (2, 2), padding="SAME")
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    p = mod.init(jax.random.PRNGKey(1), x)
    ref = mod.apply(p, x)
    got = conv_transpose_2x_subpixel(
        x, p["params"]["kernel"], p["params"]["bias"])
    assert got.shape == ref.shape == (shape[0], 2 * shape[1],
                                      2 * shape[2], cout)
    assert jnp.max(jnp.abs(ref - got)) < 1e-5


def test_upsample_param_tree_matches_conv_transpose_module():
    """Checkpoints written by an nn.ConvTranspose-based Upsample load
    unchanged: same child scope name, same param shapes."""
    up = Upsample(dim=24)
    x = jnp.zeros((1, 8, 8, 16))
    params = up.init(jax.random.PRNGKey(0), x)["params"]
    assert set(params.keys()) == {"ConvTranspose_0"}
    assert params["ConvTranspose_0"]["kernel"].shape == (4, 4, 16, 24)
    assert params["ConvTranspose_0"]["bias"].shape == (24,)

    # and the module computes the same function as nn.ConvTranspose
    mod = nn.ConvTranspose(24, (4, 4), (2, 2), padding="SAME")
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 16))
    ref = mod.apply({"params": params["ConvTranspose_0"]}, x)
    got = up.apply({"params": params}, x)
    assert jnp.max(jnp.abs(ref - got)) < 1e-5


def test_upsample_gradients_flow():
    up = Upsample(dim=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8))
    params = up.init(jax.random.PRNGKey(1), x)

    def loss(p, x):
        return jnp.sum(up.apply(p, x) ** 2)

    gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
    leaves = jax.tree_util.tree_leaves(gp)
    assert all(jnp.all(jnp.isfinite(g)) for g in leaves)
    assert any(jnp.any(g != 0) for g in leaves)
    assert jnp.any(gx != 0)
