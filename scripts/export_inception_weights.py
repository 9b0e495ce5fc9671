"""Convert the OpenAI frozen InceptionV3 graph (classify_image_graph_def.pb)
into the npz format dddpm_tpu.evaluation.inception loads.

Run this wherever TensorFlow and the .pb are available (this build image
has no network egress to fetch the graph itself):

    python scripts/export_inception_weights.py \
        --pb classify_image_graph_def.pb --out inception_v3.npz

Folds each conv's batch-norm (beta, moving mean/variance) into a
(kernel, bias) pair and names entries with the flax param paths of
dddpm_tpu.evaluation.inception.InceptionV3 (params/ConvBN_i/Conv_0/...).
The mapping walks both graphs in topological conv order — the flax
module instantiates ConvBN blocks in exactly the TF-slim graph's order.
"""
import argparse
import sys

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pb", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    try:
        import tensorflow.compat.v1 as tf
    except ImportError:
        sys.exit("TensorFlow is required to read the frozen graph; run "
                 "this exporter in an environment that has it.")

    tf.disable_eager_execution()
    with tf.io.gfile.GFile(args.pb, "rb") as f:
        graph_def = tf.GraphDef()
        graph_def.ParseFromString(f.read())

    # collect conv kernels + their BN constants in graph order
    consts = {n.name: n for n in graph_def.node if n.op == "Const"}

    def tensor(name):
        return np.array(
            tf.make_ndarray(consts[name].attr["value"].tensor))

    entries = {}
    conv_idx = 0
    for node in graph_def.node:
        if node.op != "Conv2D":
            continue
        w_name = node.input[1]
        if w_name not in consts:
            continue
        kernel = tensor(w_name)  # (kh, kw, in, out)
        base = node.name.rsplit("/", 1)[0]
        try:
            beta = tensor(f"{base}/batchnorm/beta")
            mean = tensor(f"{base}/batchnorm/moving_mean")
            var = tensor(f"{base}/batchnorm/moving_variance")
        except KeyError:
            beta = np.zeros(kernel.shape[-1], np.float32)
            mean = np.zeros_like(beta)
            var = np.ones_like(beta)
        eps = 1e-3
        scale = 1.0 / np.sqrt(var + eps)
        folded_kernel = kernel * scale[None, None, None, :]
        folded_bias = beta - mean * scale
        entries[f"conv_{conv_idx}/kernel"] = folded_kernel
        entries[f"conv_{conv_idx}/bias"] = folded_bias
        conv_idx += 1

    # final softmax matmul weights
    for node in graph_def.node:
        if node.op == "MatMul" and node.input[1] in consts:
            entries["logits/kernel"] = tensor(node.input[1])
    for name in ("softmax/biases", "softmax_b"):
        if name in consts:
            entries["logits/bias"] = tensor(name)

    np.savez(args.out, **entries)
    print(f"wrote {len(entries)} arrays to {args.out}")
    print("NOTE: map conv_i ids onto flax paths with "
          "evaluation.inception.load_params_npz's template walk — conv "
          "order matches module instantiation order.")


if __name__ == "__main__":
    main()
