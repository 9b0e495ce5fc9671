"""InceptionV3 feature extractor (flax, NHWC) for FID / sFID / IS.

TPU-native replacement for the reference's frozen TF1 InceptionV3 graph
(utils/evaluator.py:17-27,526-567): the 2015 ``classify_image_graph_def``
topology rebuilt in flax.linen, exposing

- ``pool3``: 2048-d global-average-pool features (FID),
- ``spatial``: first 7 channels of the third 17x17 block's 1x1-branch
  conv output, flattened (sFID; the reference's ``mixed_6/conv:0``
  truncated to 7 channels, utils/evaluator.py:26-27,552),
- ``softmax``: 1008-way class probabilities (IS) — bias-free matmul of
  pool3 with the logits weight, exactly as the reference's softmax
  graph builds it (utils/evaluator.py:556-567, no bias add).

Semantics are matched to the frozen graph, not to textbook InceptionV3:

- **Input preprocessing follows the graph's own nodes** (the reference
  maps its float [0,255] batch onto ``ExpandDims:0`` and lets the graph
  do the rest, utils/evaluator.py:544-547): legacy TF1 ResizeBilinear
  with ``align_corners=False`` (source coordinate = dst * in/out, NOT
  half-pixel centers like jax.image.resize) to 299x299, then
  ``(x - 128) * 0.0078125``.
- **SAME average pools exclude padded cells** (TF AvgPool semantics;
  flax's default divides by the full window) in every mixed block.
- **The second 8x8 block pools with MAX**, a quirk of the 2015 graph
  documented by pytorch-fid's ``FIDInceptionE_2`` patch; the first 8x8
  block uses the padding-excluding average.

All of this is cross-checked against a TF1 frozen GraphDef built with
the same topology in tests/test_inception_tf.py (TF is available in the
build image even though the OpenAI .pb itself is not downloadable).

BatchNorm is folded: every conv is kernel+bias, so real weights exported
from the OpenAI .pb (conv kernels with folded BN) can be loaded from an
npz via ``load_params_npz``.  Without a weights file the extractor runs
with deterministic random init: all metric MACHINERY (statistics,
Frechet distance, kNN manifolds) is exercised end-to-end, but absolute
FID values are only comparable to the reference when real weights are
supplied (documented limitation: the image has zero egress).
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

INCEPTION_SIZE = 299
N_CLASSES = 1008  # TF-slim inception class count (incl. background)


class ConvBN(nn.Module):
    """Conv (no bias) + folded-BN affine + ReLU == conv with bias here."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, self.strides, self.padding,
                    use_bias=True, dtype=x.dtype)(x)
        return nn.relu(x)


def _avg_pool_same(x):
    """3x3 stride-1 SAME average pool with TF semantics: padded cells
    are EXCLUDED from the average (the frozen graph's AvgPool op divides
    by the valid-cell count; flax's default divides by 9 everywhere,
    which differs along every image border)."""
    return nn.avg_pool(x, (3, 3), (1, 1), "SAME", count_include_pad=False)


class MixedA(nn.Module):
    """35x35 block (mixed/mixed_1/mixed_2 in the 2015 graph)."""

    pool_features: int

    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(64, (1, 1))(x)
        b1 = ConvBN(48, (1, 1))(x)
        b1 = ConvBN(64, (5, 5))(b1)
        b2 = ConvBN(64, (1, 1))(x)
        b2 = ConvBN(96, (3, 3))(b2)
        b2 = ConvBN(96, (3, 3))(b2)
        b3 = _avg_pool_same(x)
        b3 = ConvBN(self.pool_features, (1, 1))(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class ReductionA(nn.Module):
    """35x35 -> 17x17 (Mixed_6a)."""

    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(384, (3, 3), (2, 2), "VALID")(x)
        b1 = ConvBN(64, (1, 1))(x)
        b1 = ConvBN(96, (3, 3))(b1)
        b1 = ConvBN(96, (3, 3), (2, 2), "VALID")(b1)
        b2 = nn.max_pool(x, (3, 3), (2, 2), "VALID")
        return jnp.concatenate([b0, b1, b2], axis=-1)


class MixedB(nn.Module):
    """17x17 block with 7x1/1x7 factorization (mixed_4..mixed_7).

    Returns ``(concat, branch0)``: the third block's 1x1-branch conv
    output is the sFID spatial tensor (``mixed_6/conv:0``,
    reference utils/evaluator.py:26-27)."""

    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b0 = ConvBN(192, (1, 1))(x)
        b1 = ConvBN(c7, (1, 1))(x)
        b1 = ConvBN(c7, (1, 7))(b1)
        b1 = ConvBN(192, (7, 1))(b1)
        b2 = ConvBN(c7, (1, 1))(x)
        b2 = ConvBN(c7, (7, 1))(b2)
        b2 = ConvBN(c7, (1, 7))(b2)
        b2 = ConvBN(c7, (7, 1))(b2)
        b2 = ConvBN(192, (1, 7))(b2)
        b3 = _avg_pool_same(x)
        b3 = ConvBN(192, (1, 1))(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1), b0


class ReductionB(nn.Module):
    """17x17 -> 8x8 (Mixed_7a)."""

    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(192, (1, 1))(x)
        b0 = ConvBN(320, (3, 3), (2, 2), "VALID")(b0)
        b1 = ConvBN(192, (1, 1))(x)
        b1 = ConvBN(192, (1, 7))(b1)
        b1 = ConvBN(192, (7, 1))(b1)
        b1 = ConvBN(192, (3, 3), (2, 2), "VALID")(b1)
        b2 = nn.max_pool(x, (3, 3), (2, 2), "VALID")
        return jnp.concatenate([b0, b1, b2], axis=-1)


class MixedC(nn.Module):
    """8x8 block (mixed_9/mixed_10).

    The 2015 frozen graph's SECOND 8x8 block pools with max, not
    average — the quirk pytorch-fid patches as FIDInceptionE_2; the
    first uses the padding-excluding average (FIDInceptionE_1)."""

    pool: str = "avg"

    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(320, (1, 1))(x)
        b1 = ConvBN(384, (1, 1))(x)
        b1 = jnp.concatenate([ConvBN(384, (1, 3))(b1),
                              ConvBN(384, (3, 1))(b1)], axis=-1)
        b2 = ConvBN(448, (1, 1))(x)
        b2 = ConvBN(384, (3, 3))(b2)
        b2 = jnp.concatenate([ConvBN(384, (1, 3))(b2),
                              ConvBN(384, (3, 1))(b2)], axis=-1)
        if self.pool == "max":
            b3 = nn.max_pool(x, (3, 3), (1, 1), "SAME")
        else:
            b3 = _avg_pool_same(x)
        b3 = ConvBN(192, (1, 1))(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionV3(nn.Module):
    """Full 2015-frozen-graph InceptionV3 trunk with FID/sFID/IS heads."""

    spatial_channels: int = 7

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        """x: (B, 299, 299, 3) preprocessed to (raw - 128) / 128."""
        x = ConvBN(32, (3, 3), (2, 2), "VALID")(x)
        x = ConvBN(32, (3, 3), (1, 1), "VALID")(x)
        x = ConvBN(64, (3, 3))(x)
        x = nn.max_pool(x, (3, 3), (2, 2), "VALID")
        x = ConvBN(80, (1, 1), (1, 1), "VALID")(x)
        x = ConvBN(192, (3, 3), (1, 1), "VALID")(x)
        x = nn.max_pool(x, (3, 3), (2, 2), "VALID")

        x = MixedA(32)(x)
        x = MixedA(64)(x)
        x = MixedA(64)(x)

        x = ReductionA()(x)

        x, _ = MixedB(128)(x)   # mixed_4
        x, _ = MixedB(160)(x)   # mixed_5
        x, sp = MixedB(160)(x)  # mixed_6: its 1x1 branch is 'mixed_6/conv'
        spatial = sp[..., : self.spatial_channels].reshape(sp.shape[0], -1)
        x, _ = MixedB(192)(x)   # mixed_7

        x = ReductionB()(x)
        x = MixedC(pool="avg")(x)
        x = MixedC(pool="max")(x)

        pool3 = x.mean(axis=(1, 2))  # (B, 2048)
        # Reference softmax graph: softmax(pool3 @ W), bias deliberately
        # NOT applied (utils/evaluator.py:561-567 matmuls w only).
        logits = nn.Dense(N_CLASSES, use_bias=False, dtype=x.dtype)(pool3)
        return {"pool3": pool3, "spatial": spatial,
                "softmax": jax.nn.softmax(logits, axis=-1)}


def _tf1_bilinear_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) interpolation matrix reproducing TF1 ResizeBilinear
    with align_corners=False / half_pixel_centers=False: source
    coordinate = dst_index * (in/out), floor/ceil lerp, clamped at the
    top edge.  Verified against tf.compat.v1.image.resize_bilinear."""
    scale = in_size / out_size
    src = np.arange(out_size, dtype=np.float64) * scale
    lo = np.minimum(np.floor(src).astype(np.int64), in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float64)
    m = np.zeros((out_size, in_size), np.float64)
    m[np.arange(out_size), lo] += 1.0 - frac
    m[np.arange(out_size), hi] += frac
    return m.astype(np.float32)


def tf1_resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Legacy-TF1 bilinear resize of NHWC ``x`` via two small dense
    interpolation matmuls (MXU-friendly; shapes are static under jit)."""
    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    mh = jnp.asarray(_tf1_bilinear_matrix(h, out_h))
    mw = jnp.asarray(_tf1_bilinear_matrix(w, out_w))
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("pw,bowc->bopc", mw, x)


class FeatureExtractor:
    """Jitted batched feature extraction from uint8 [0,255] NHWC images.

    With ``mesh`` (a 1-D 'data' mesh from parallel.create_mesh), the
    image batch is sharded across devices and parameters replicated, so
    the 50k-image activation pass of the FID protocol
    (/root/reference/utils/evaluator.py:97-123) scales over a slice —
    the reference's TF1 evaluator was single-GPU.  ``batch_size`` is
    rounded up to a multiple of the mesh size (tail batches are
    zero-padded to the fixed shape either way)."""

    def __init__(self, weights_npz: Optional[str] = None, batch_size: int = 64,
                 mesh=None):
        self.model = InceptionV3()
        if mesh is not None:
            n_dev = mesh.devices.size
            batch_size = ((batch_size + n_dev - 1) // n_dev) * n_dev
        self.batch_size = batch_size
        rng = jax.random.PRNGKey(42)
        dummy = jnp.zeros((1, INCEPTION_SIZE, INCEPTION_SIZE, 3))
        self.params = self.model.init(rng, dummy)
        self.has_real_weights = False
        weights_npz = weights_npz or os.environ.get("INCEPTION_WEIGHTS_NPZ")
        if weights_npz:
            if not os.path.exists(weights_npz):
                raise FileNotFoundError(
                    f"inception weights npz not found: {weights_npz}")
            self.params = load_params_npz(weights_npz, self.params)
            self.has_real_weights = True

        def _features(params, x_uint8):
            # Mirror the frozen graph's own preprocessing nodes, in graph
            # order (reference feeds raw float [0,255] at ExpandDims:0,
            # utils/evaluator.py:544-547): legacy ResizeBilinear to
            # 299x299, then Sub(128), Mul(1/128).
            x = x_uint8.astype(jnp.float32)
            x = tf1_resize_bilinear(x, INCEPTION_SIZE, INCEPTION_SIZE)
            x = (x - 128.0) * 0.0078125
            return self.model.apply(params, x)

        if mesh is None:
            self._features = jax.jit(_features)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            replicated = NamedSharding(mesh, P())
            sharded = NamedSharding(mesh, P("data"))
            self.params = jax.device_put(self.params, replicated)
            self._features = jax.jit(
                _features, in_shardings=(replicated, sharded))

    def __call__(self, images) -> Dict[str, np.ndarray]:
        """images: (N, H, W, C) / (nb, B, H, W, C) float or uint8 in
        [0, 255], or a path to a .npy/.npz sample file (streamed in
        bounded memory — see evaluation/io.py)."""
        from dddpm_tpu.evaluation.io import image_batch_stream

        outs = {"pool3": [], "spatial": [], "softmax": []}
        bs = self.batch_size
        for batch in image_batch_stream(images, bs):
            batch = np.asarray(batch)
            if batch.shape[-1] == 1:
                batch = np.repeat(batch, 3, axis=-1)
            n_real = len(batch)
            if n_real < bs:  # pad the tail so jit sees one batch shape
                pad = np.zeros((bs - n_real,) + batch.shape[1:], batch.dtype)
                batch = np.concatenate([batch, pad], axis=0)
            # pass the numpy batch straight to jit: with in_shardings
            # each device shard transfers host->device once (jnp.asarray
            # would materialize the whole batch on device 0 first, then
            # reshard device-to-device)
            res = self._features(self.params, batch)
            for k in outs:
                outs[k].append(np.asarray(res[k])[:n_real])
        return {k: np.concatenate(v) for k, v in outs.items()}


def load_params_npz(path: str, params_template,
                    allow_partial: bool = False) -> Dict:
    """Load folded-BN conv weights from an npz keyed by flax param paths
    like 'params/ConvBN_0/Conv_0/kernel'.

    Strict by default: raises ValueError listing template keys absent
    from the npz, npz keys that matched nothing, and any shape mismatch
    — a wrong weights file must fail loudly, never silently keep random
    init (that would produce garbage FID labeled as real).  Pass
    ``allow_partial=True`` to load whatever matches (debugging escape
    hatch).
    """
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params_template)
    out, missing, mismatched, consumed = [], [], [], set()
    for path_keys, leaf in flat:
        key = "/".join(getattr(p, "key", str(p)) for p in path_keys)
        if key in data:
            arr = np.asarray(data[key])
            if arr.shape != leaf.shape:
                mismatched.append(f"{key}: npz {arr.shape} != model {leaf.shape}")
                out.append(leaf)
            else:
                out.append(jnp.asarray(arr, leaf.dtype))
                consumed.add(key)
        else:
            missing.append(key)
            out.append(leaf)
    unused = sorted(set(data.files) - consumed)
    problems = []
    if mismatched:
        problems.append(f"{len(mismatched)} shape mismatches: "
                        + "; ".join(mismatched[:5]))
    if missing:
        problems.append(f"{len(missing)} model params not in npz: "
                        + ", ".join(missing[:5]) + ("..." if len(missing) > 5 else ""))
    if unused:
        problems.append(f"{len(unused)} npz arrays matched nothing: "
                        + ", ".join(unused[:5]) + ("..." if len(unused) > 5 else ""))
    if problems and not (allow_partial and not mismatched):
        raise ValueError(
            f"inception weights npz '{path}' does not match the model:\n  "
            + "\n  ".join(problems)
            + "\n(use allow_partial=True to load the matching subset)")
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params_template), out)


def conv_param_paths(include_dense: bool = True):
    """Flax param-path prefixes of every ConvBN conv (and the final
    logits Dense), in **call order** — which is the order Conv2D nodes
    appear in the TF frozen graph, so the weights exporter can zip the
    two walks together (scripts/export_inception_weights.py).

    Returns e.g. ['params/ConvBN_0/Conv_0', ..., 'params/Dense_0'].
    """
    order = []

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if context.method_name == "__call__" and type(mod) is ConvBN:
            order.append("params/" + "/".join(mod.path) + "/Conv_0")
        elif context.method_name == "__call__" and type(mod) is nn.Dense:
            order.append("params/" + "/".join(mod.path))
        return next_fun(*args, **kwargs)

    model = InceptionV3()
    dummy = jnp.zeros((1, 75, 75, 3))  # smallest size the VALID convs allow
    with nn.intercept_methods(interceptor):
        jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), dummy))
    if not include_dense:
        order = [p for p in order if "Dense" not in p]
    return order


def param_template_shapes() -> Dict[str, Tuple[int, ...]]:
    """{flax param path: shape} for the full model, without compute."""
    model = InceptionV3()
    dummy = jnp.zeros((1, 75, 75, 3))
    tmpl = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), dummy))
    flat, _ = jax.tree_util.tree_flatten_with_path(tmpl)
    return {"/".join(getattr(p, "key", str(p)) for p in ks): tuple(v.shape)
            for ks, v in flat}
