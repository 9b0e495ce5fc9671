"""Generate the InceptionV3 activation golden values used by
tests/test_evaluation.py::test_inception_activation_golden.

Deterministic synthetic weights (path-hash pattern, no RNG dependence)
+ deterministic input -> fixed pool3/spatial/softmax values.  Run once,
paste the printed arrays into the test.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")


def deterministic_params(params):
    """Fill every leaf with a small path-seeded sinusoid (no RNG)."""
    import zlib

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for ks, leaf in flat:
        key = "/".join(getattr(p, "key", str(p)) for p in ks)
        seed = (zlib.crc32(key.encode()) % 997) / 997.0
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        vals = 0.05 * np.sin(np.arange(n, dtype=np.float64) * 0.7 + seed * 6.28)
        out.append(vals.reshape(leaf.shape).astype(np.float32))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), out)


def golden_input(n=4, size=32):
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / (size - 1)
    imgs = np.stack([
        np.stack([xx * 255, yy * 255, (xx * yy) * 255], -1)
        * (0.5 + 0.5 * i / max(n - 1, 1))
        for i in range(n)
    ]).astype(np.float32)
    return np.round(imgs).astype(np.uint8)


def main():
    from dddpm_tpu.evaluation.inception import FeatureExtractor

    fe = FeatureExtractor(batch_size=4)
    fe.params = deterministic_params(fe.params)
    out = fe(golden_input())
    for k in ("pool3", "spatial", "softmax"):
        v = out[k]
        print(f"{k}: shape={v.shape} mean={v.mean():.8e}")
        print(f"  [0,:5] = {v[0, :5].tolist()}")
        print(f"  [3,-5:] = {v[3, -5:].tolist()}")


if __name__ == "__main__":
    main()
