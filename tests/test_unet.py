"""UNet structural tests: shapes, param-count parity with the reference,
init distribution sanity, dtype policy."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dddpm_tpu.models.unet import Unet

# Golden param counts measured from the reference torch implementation
# (models/unet/unet.py) for identical configs.
GOLDEN_COUNTS = [
    # (dim, in_channels, dim_mults, expected)
    (128, 3, (1, 2, 2, 2), 22_254_723),
    (128, 8, (1, 2, 2, 2), 22_261_768),
    (16, 1, (1, 2), 158_705),
    (32, 3, (1, 2, 2), 1_051_619),
]


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


@pytest.mark.parametrize("dim,in_ch,mults,expected", GOLDEN_COUNTS)
def test_param_count_matches_reference(dim, in_ch, mults, expected):
    model = Unet(dim=dim, in_channels=in_ch, dim_mults=mults, dropout=0.1)
    size = 8 * (2 ** (len(mults) - 1))  # divisible by all downsamples
    x = jnp.zeros((1, size, size, in_ch))
    t = jnp.zeros((1,), dtype=jnp.int32)
    # eval_shape: abstract init, no compute — fast even for the 22M model
    params = jax.eval_shape(lambda k: model.init(k, x, t), jax.random.PRNGKey(0))
    assert n_params(params) == expected


def test_forward_shape_and_determinism():
    model = Unet(dim=16, in_channels=3, dim_mults=(1, 2), dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.array([0, 7], dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)
    out1 = model.apply(params, x, t)
    out2 = model.apply(params, x, t)
    assert out1.shape == x.shape
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.isfinite(np.asarray(out1)).all()


def test_timestep_changes_output():
    model = Unet(dim=16, in_channels=1, dim_mults=(1, 2))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 1))
    params = model.init(jax.random.PRNGKey(0), x, jnp.array([0]))
    o0 = model.apply(params, x, jnp.array([0]))
    o9 = model.apply(params, x, jnp.array([900]))
    assert np.abs(np.asarray(o0) - np.asarray(o9)).max() > 1e-5


def test_dropout_stochastic_in_train_mode():
    model = Unet(dim=16, in_channels=1, dim_mults=(1, 2), dropout=0.5)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 1))
    t = jnp.array([3])
    params = model.init(jax.random.PRNGKey(0), x, t)
    o1 = model.apply(params, x, t, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(10)})
    o2 = model.apply(params, x, t, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(11)})
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-6


def test_bf16_compute_keeps_f32_params_and_output():
    model = Unet(dim=16, in_channels=3, dim_mults=(1, 2), dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    t = jnp.array([5])
    params = model.init(jax.random.PRNGKey(0), x, t)
    for leaf in jax.tree.leaves(params):
        assert leaf.dtype == jnp.float32
    out = model.apply(params, x, t)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_init_distribution_matches_torch_bounds():
    """Conv kernels must be U(+-1/sqrt(fan_in)) like torch kaiming_uniform(a=sqrt5)."""
    model = Unet(dim=32, in_channels=3, dim_mults=(1, 2))
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x, jnp.array([0]))
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    checked = 0
    for path, leaf in flat:
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if "kernel" in names and leaf.ndim == 4:  # conv kernels
            fan_in = int(np.prod(leaf.shape[:-1]))
            bound = 1.0 / np.sqrt(fan_in)
            a = np.asarray(leaf)
            assert np.abs(a).max() <= bound + 1e-7
            # uniform(-b, b) has std b/sqrt(3); allow 15% sampling noise
            if a.size > 500:
                assert abs(a.std() - bound / np.sqrt(3)) < 0.15 * bound
                checked += 1
    assert checked > 5


def test_from_config():
    cfg = {"unet_chan": 16, "unet_in": 1, "unet_dims": (1, 2),
           "unet_dropout": 0.1, "compute_dtype": "bfloat16"}
    model = Unet.from_config(cfg)
    assert model.dim == 16 and model.dtype == jnp.bfloat16


@pytest.mark.slow
def test_remat_preserves_values_params_and_grads():
    """nn.remat variant: same param tree, same outputs, same grads."""
    kwargs = dict(dim=16, in_channels=3, dim_mults=(1, 2), dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.array([0, 7], dtype=jnp.int32)

    net = Unet(**kwargs, remat=False)
    net_r = Unet(**kwargs, remat=True)
    params = net.init(jax.random.PRNGKey(0), x, t)
    params_r = net_r.init(jax.random.PRNGKey(0), x, t)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_r)

    np.testing.assert_allclose(np.asarray(net.apply(params, x, t)),
                               np.asarray(net_r.apply(params, x, t)),
                               rtol=1e-5, atol=1e-6)

    g = jax.grad(lambda p: jnp.sum(net.apply(p, x, t) ** 2))(params)
    g_r = jax.grad(lambda p: jnp.sum(net_r.apply(p, x, t) ** 2))(params)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_resnet_block_skip_split_matches_concat():
    """Concat-free skip path (blocks.py Conv3x3Params/ConvParams1x1
    kernel splitting) computes exactly the concat formulation."""
    import jax
    import jax.numpy as jnp

    from dddpm_tpu.models.blocks import ResnetBlock

    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 8, 8, 16))
    s = jax.random.normal(jax.random.fold_in(k, 1), (2, 8, 8, 16))
    t = jax.random.normal(jax.random.fold_in(k, 2), (2, 64))
    rb = ResnetBlock(32, 24)
    params = rb.init(jax.random.PRNGKey(1),
                     jnp.concatenate([x, s], -1), t)
    want = rb.apply(params, jnp.concatenate([x, s], -1), t)
    got = rb.apply(params, x, t, skip=s)
    assert jnp.max(jnp.abs(want - got)) < 1e-5


@pytest.mark.slow
def test_unet_bf16_dropout_gradients():
    """Regression: bf16 compute + active dropout + grad through the
    split-kernel convs (a preferred_element_type=f32 conv with bf16
    operands has a broken VJP — Conv3x3Params must not use it)."""
    import jax
    import jax.numpy as jnp

    from dddpm_tpu.models.unet import Unet

    net = Unet(dim=8, in_channels=4, dim_mults=(1, 2), dropout=0.1,
               dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    t = jnp.zeros((2,), jnp.int32)
    params = net.init(jax.random.PRNGKey(1), x, t)

    def loss(p):
        y = net.apply(p, x, t, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
