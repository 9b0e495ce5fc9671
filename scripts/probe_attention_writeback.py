"""Pass-B write-path sweep for the fused attention block: the ceiling
probe showed pass B's pure-DMA variant costs 3.05 ms at the 128^2 c128
block (vs 0.50 ms for pass A's read-only DMA of the same tensor and a
0.9 ms r/w floor) — the output write is ~5x too slow.  This sweeps
write-side implementations to find the achievable write rate:

  base-8192 / 4096 / 2048 — shipped auto-pipelined out_specs, tile sweep
  flat — 1-D grid (bsz*nt,)
  par — dimension_semantics ("parallel", "parallel")
  alias — input_output_aliases {0: 0} (in-place into x's buffer)
  manual — output in ANY memspace, hand double-buffered async copies

    python scripts/probe_attention_writeback.py [--bs 96]
"""
import argparse
import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from _probe_util import setup_cache, timed_scan  # noqa: E402

setup_cache()


def timed(fn, args, scan_len=50):
    return timed_scan(fn, args, scan_len)


def _copy_kernel(x_ref, y_ref):
    y_ref[...] = x_ref[...]


def make_base(tn, semantics=None, alias=False, flat=False):
    def run(x):
        bsz, n, c = x.shape
        nt = n // tn
        kwargs = {}
        if semantics is not None:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=semantics)
        if alias:
            kwargs["input_output_aliases"] = {0: 0}
        if flat:
            spec = pl.BlockSpec((1, tn, c), lambda k: (k // nt, k % nt, 0),
                                memory_space=pltpu.VMEM)
            grid = (bsz * nt,)
        else:
            spec = pl.BlockSpec((1, tn, c), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)
            grid = (bsz, nt)
        return pl.pallas_call(
            _copy_kernel,
            grid=grid,
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((bsz, n, c), x.dtype),
            **kwargs,
        )(x)

    return run


def _manual_kernel(x_ref, y_hbm, buf, sems, *, tn, nt):
    """Input auto-pipelined; output hand double-buffered via async
    copies into ANY-memspace HBM."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = i * nt + j
    slot = k % 2

    # wait for the copy started two steps ago before reusing the slot
    @pl.when(k >= 2)
    def _():
        pltpu.make_async_copy(
            buf.at[(k - 2) % 2], y_hbm.at[0, 0], sems.at[(k - 2) % 2]
        ).wait()

    buf[slot] = x_ref[0]
    pltpu.make_async_copy(
        buf.at[slot], y_hbm.at[i, j], sems.at[slot]).start()

    # drain at the very end
    @pl.when(k == pl.num_programs(0) * nt - 1)
    def _():
        pltpu.make_async_copy(
            buf.at[slot], y_hbm.at[i, j], sems.at[slot]).wait()

        @pl.when(k >= 1)
        def _():
            km1 = k - 1
            pltpu.make_async_copy(
                buf.at[km1 % 2],
                y_hbm.at[km1 // nt, km1 % nt],
                sems.at[km1 % 2],
            ).wait()


def make_manual(tn):
    def run(x):
        bsz, n, c = x.shape
        nt = n // tn
        y4 = pl.pallas_call(
            partial(_manual_kernel, tn=tn, nt=nt),
            grid=(bsz, nt),
            in_specs=[pl.BlockSpec((1, tn, c), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((bsz, nt, tn, c), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, tn, c), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(x)
        return y4.reshape(bsz, n, c)

    return run


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=96)
    p.add_argument("--shape", type=int, nargs=2, default=[128, 128])
    p.add_argument("--c", type=int, default=128)
    args = p.parse_args()
    h, w = args.shape
    n, c, bs = h * w, args.c, args.bs

    x = jax.random.normal(jax.random.PRNGKey(0), (bs, n, c), jnp.bfloat16)
    gb = bs * n * c * 2 / 1e9
    print(f"{h}x{w} c{c} bs{bs}: {gb:.3f} GB per pass "
          f"(r/w floor @819GB/s = {2 * gb / 819 * 1e3 * 1e3:.0f} us)")

    dt = timed(lambda x: x + jnp.bfloat16(1.0), (x,))
    print(f"XLA x+1                 {dt * 1e3:7.3f} ms  "
          f"({2 * gb / dt:6.0f} GB/s)")

    variants = [
        ("base-8192", make_base(8192)),
        ("base-4096", make_base(4096)),
        ("base-2048", make_base(2048)),
        ("base-1024", make_base(1024)),
        ("flat-8192", make_base(8192, flat=True)),
        ("par-8192", make_base(8192, semantics=("parallel", "parallel"))),
        ("arb-8192", make_base(8192, semantics=("arbitrary", "arbitrary"))),
        ("alias-8192", make_base(8192, alias=True)),
        ("manual-8192", make_manual(8192)),
        ("manual-4096", make_manual(4096)),
        ("manual-2048", make_manual(2048)),
    ]
    for name, fn in variants:
        try:
            dt = timed(fn, (x,))
            print(f"{name:22s}  {dt * 1e3:7.3f} ms  "
                  f"({2 * gb / dt:6.0f} GB/s)")
        except Exception as e:
            print(f"{name:22s}  FAILED: {str(e)[:140]}")


if __name__ == "__main__":
    main()
