"""Convert the OpenAI frozen InceptionV3 graph (classify_image_graph_def.pb)
into the flax-keyed npz that dddpm_tpu.evaluation.inception loads.

Run this wherever TensorFlow and the .pb are available (this build image
has no network egress to fetch the graph itself; the reference downloads
it in utils/evaluator.py:526-536):

    python scripts/export_inception_weights.py \
        --pb classify_image_graph_def.pb --out inception_v3.npz

Each conv's batch-norm (beta, moving mean/variance, optional gamma) is
folded into a (kernel, bias) pair.  Keys are the flax param paths of
dddpm_tpu.evaluation.inception.InceptionV3 ('params/.../Conv_0/kernel'),
obtained by zipping the TF graph's Conv2D nodes (graph order) with
``conv_param_paths()`` (flax call order) — the flax module instantiates
ConvBN blocks in exactly the TF graph's conv order, and every pairing is
shape-checked against the model template, so a mis-ordering fails here
instead of producing a silently wrong npz.

The pure mapping core (``fold_bn``, ``build_entries``) has no TF
dependency and is unit-tested in tests/test_evaluation.py against a
synthetic graph walk.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BN_EPS = 1e-3  # TF-slim inception batchnorm epsilon


def fold_bn(kernel, beta, mean, var, gamma=None, eps=BN_EPS):
    """Fold BN(conv(x)) into conv'(x) = conv(x) * scale + shift.

    Returns (folded_kernel, folded_bias), both float32.
    """
    scale = (1.0 if gamma is None else gamma) / np.sqrt(var + eps)
    folded_kernel = kernel.astype(np.float32) * scale[None, None, None, :]
    folded_bias = (beta - mean * scale).astype(np.float32)
    return folded_kernel, folded_bias


def build_entries(tf_convs, logits_kernel=None):
    """Map graph-ordered TF convs onto flax param paths.

    tf_convs: ordered list of dicts with keys
        {'name', 'kernel', 'beta', 'mean', 'var'[, 'gamma']}.
    Raises ValueError on any count or shape disagreement with the flax
    InceptionV3 template.  The softmax logits bias is deliberately not
    exported: the reference's softmax graph matmuls pool3 with the
    weight only (utils/evaluator.py:556-567), and the flax Dense head
    is bias-free to match.
    """
    from dddpm_tpu.evaluation.inception import (
        conv_param_paths, param_template_shapes)

    paths = conv_param_paths(include_dense=False)
    if len(tf_convs) != len(paths):
        raise ValueError(
            f"TF graph has {len(tf_convs)} BN-convs but the flax model "
            f"expects {len(paths)} — graphs out of sync")
    template = param_template_shapes()

    entries = {}
    errors = []
    for conv, path in zip(tf_convs, paths):
        kernel, bias = fold_bn(
            conv["kernel"], conv["beta"], conv["mean"], conv["var"],
            conv.get("gamma"))
        want = template[f"{path}/kernel"]
        if tuple(kernel.shape) != want:
            errors.append(f"{conv['name']} -> {path}: kernel "
                          f"{kernel.shape} != model {want}")
            continue
        entries[f"{path}/kernel"] = kernel
        entries[f"{path}/bias"] = bias
    if errors:
        raise ValueError(
            "conv shape mismatches (TF graph order vs flax call order):\n  "
            + "\n  ".join(errors))

    if logits_kernel is not None:
        want = template["params/Dense_0/kernel"]
        entries["params/Dense_0/kernel"] = np.asarray(
            logits_kernel, np.float32).reshape(want)
    return entries


def read_tf_graph(pb_path):
    """Walk the frozen graph: ordered BN-conv dicts + softmax matmul
    weight.  (The matmul's bias is never read — the reference's softmax
    graph does not apply it.)"""
    try:
        import tensorflow.compat.v1 as tf
    except ImportError:
        sys.exit("TensorFlow is required to read the frozen graph; run "
                 "this exporter in an environment that has it.")

    tf.disable_eager_execution()
    with tf.io.gfile.GFile(pb_path, "rb") as f:
        graph_def = tf.GraphDef()
        graph_def.ParseFromString(f.read())

    consts = {n.name: n for n in graph_def.node if n.op == "Const"}

    def tensor(name):
        return np.array(tf.make_ndarray(consts[name].attr["value"].tensor))

    def maybe(name):
        return tensor(name) if name in consts else None

    tf_convs = []
    for node in graph_def.node:
        if node.op != "Conv2D" or node.input[1] not in consts:
            continue
        base = node.name.rsplit("/", 1)[0]
        kernel = tensor(node.input[1])  # (kh, kw, in, out)
        beta = maybe(f"{base}/batchnorm/beta")
        mean = maybe(f"{base}/batchnorm/moving_mean")
        var = maybe(f"{base}/batchnorm/moving_variance")
        if beta is None or mean is None or var is None:
            # conv without BN (shouldn't happen in this graph): identity fold
            beta = np.zeros(kernel.shape[-1], np.float32)
            mean = np.zeros_like(beta)
            var = np.ones_like(beta) - BN_EPS
        tf_convs.append({
            "name": node.name, "kernel": kernel, "beta": beta,
            "mean": mean, "var": var, "gamma": maybe(f"{base}/batchnorm/gamma"),
        })

    logits_kernel = None
    for node in graph_def.node:
        if node.op == "MatMul" and node.input[1] in consts:
            logits_kernel = tensor(node.input[1])
    return tf_convs, logits_kernel


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pb", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    tf_convs, logits_kernel = read_tf_graph(args.pb)
    entries = build_entries(tf_convs, logits_kernel)
    np.savez(args.out, **entries)
    print(f"wrote {len(entries)} arrays to {args.out}")

    # prove the npz round-trips through the strict loader
    from dddpm_tpu.evaluation.inception import FeatureExtractor
    fe = FeatureExtractor(args.out)
    assert fe.has_real_weights
    print("strict load OK — npz is complete and shape-consistent")


if __name__ == "__main__":
    main()
