"""Parameter initializers matching PyTorch's default init distributions.

The reference never customizes init, so its training dynamics are set by
torch defaults: Conv2d/Linear use kaiming_uniform(a=sqrt(5)) which is
U(-1/sqrt(fan_in), 1/sqrt(fan_in)), and biases use the same bound.  We
match these *distributionally* (SURVEY.md section 7 hard part (c)) so
loss curves are comparable; exact bit parity is not a goal.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _uniform(key, shape, dtype, bound):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def conv_kernel_init(key, shape, dtype=jnp.float32):
    """Flax Conv kernel (kh, kw, in, out): U(+-1/sqrt(in*kh*kw))."""
    fan_in = int(np.prod(shape[:-1]))
    return _uniform(key, shape, dtype, 1.0 / np.sqrt(fan_in))


def conv_transpose_kernel_init(key, shape, dtype=jnp.float32):
    """Flax ConvTranspose kernel (kh, kw, in, out).

    Torch ConvTranspose2d weight is (in, out, kh, kw) and fan_in is
    computed on dim 1: out*kh*kw.
    """
    kh, kw, _, out = shape
    fan = kh * kw * out
    return _uniform(key, shape, dtype, 1.0 / np.sqrt(fan))


def dense_kernel_init(key, shape, dtype=jnp.float32):
    """Flax Dense kernel (in, out): U(+-1/sqrt(in))."""
    return _uniform(key, shape, dtype, 1.0 / np.sqrt(shape[0]))


def bias_init_for(fan_in: int):
    """Torch bias init: U(+-1/sqrt(fan_in)) — fan_in of the layer's weight."""
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return _uniform(key, shape, dtype, bound)

    return init
