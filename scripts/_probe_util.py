"""Shared timing harness for the TPU probe scripts.

Methodology (the only truthful one through the axon tunnel, see
probe_unet_split.py): run the op as a lax.scan of N iterations inside
ONE jitted program and time around an explicit scalar fetch — async
dispatch + block_until_ready return long before the device finishes
small programs, so per-dispatch wall-clocks are meaningless here.

Every probe takes best-of-`reps` (default 3): occasional cold reps run
~17% slow (BENCH_NOTES r2); bench.py, which feeds the official record,
uses 5-rep trimmed means instead.
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def setup_cache():
    """Persistent XLA compile cache shared by all probes."""
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed_scan(fn, args, scan_len: int = 50, reps: int = 3,
               xs=None) -> float:
    """Best-of-`reps` seconds per iteration of fn scanned `scan_len`
    times inside one jit.  `args[0]` is the scan carry; the rest are
    closed over.  With `xs`, the scan consumes it per step and fn is
    called as fn(carry, x, *rest) (scan_len then = len(xs))."""
    @jax.jit
    def chain(*a):
        def body(c, x):
            out = fn(*((c,) + a[1:])) if x is None else fn(c, x, *a[1:])
            return out, None
        y, _ = lax.scan(body, a[0], xs,
                        length=None if xs is not None else scan_len)
        return jnp.sum(y[..., :1].astype(jnp.float32))

    n = scan_len if xs is None else len(xs)
    _ = float(chain(*args))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(chain(*args))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def timed_call(fn, args, n: int = 1, reps: int = 3) -> float:
    """Best-of-`reps` seconds (per `n` internal iterations) of an
    already-jitted callable, synced by a scalar fetch of its output."""
    @jax.jit
    def run(*a):
        return jnp.sum(jnp.asarray(fn(*a)).astype(jnp.float32))

    _ = float(run(*args))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(run(*args))
        best = min(best, (time.perf_counter() - t0) / n)
    return best
