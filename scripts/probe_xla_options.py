"""XLA compiler-option sweep over the x2 headline UNet eval.

The r5 roofline (BENCH_NOTES) pins the entire remaining x2 gap on
XLA's in-graph conv rate (40.0 ms measured vs 33.3 ms @197 TF for the
46-conv inventory).  Three hand-kernel families failed to beat XLA's
own conv runtime — but nobody has yet asked XLA itself to behave
differently.  This probe sweeps per-computation compiler options
(`lowered.compile(compiler_options=...)`) over the exact headline
unit of work (one 128^2-latent UNet eval, bs 96, bf16, fused Pallas
attention) and reports ms/eval per option set.

Options are passed through PJRT per-computation, so they reach the
compiler even through the axon tunnel and regardless of when the
backend client was created; unknown option names raise at compile
time and are reported as "invalid" rather than silently ignored.

    python scripts/probe_xla_options.py [--bs 96] [--iters 20] [--reps 3]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

# Candidate sets.  Names must match real XLA debug options; invalid
# ones fail the compile for that row only.
OPTION_SETS = {
    "baseline": {},
    "vmem_32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "vmem_64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem_96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    "lhs_sched": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    "no_rwb_fusion": {"xla_tpu_rwb_fusion": "false"},
    "licm_10": {"xla_tpu_licm_size_inflation_ratio": "10"},
    "bundle_cost": {
        "xla_tpu_use_bundle_aware_cost_model_for_fusions": "true"},
    "vmem_64m+lhs": {
        "xla_tpu_scoped_vmem_limit_kib": "65536",
        "xla_tpu_enable_latency_hiding_scheduler": "true"},
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=96)
    p.add_argument("--latent", type=int, default=128)
    p.add_argument("--ch", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--out", default="results/probe_xla_options.json")
    args = p.parse_args()

    from dddpm_tpu.models.unet import Unet

    net = Unet(dim=128, in_channels=args.ch, dim_mults=(1, 2, 2, 2),
               dropout=0.1, dtype=jnp.bfloat16, use_pallas=True)
    x = jax.random.normal(
        jax.random.PRNGKey(0),
        (args.bs, args.latent, args.latent, args.ch), jnp.bfloat16)
    t = jnp.full((args.bs,), 500, jnp.int32)
    params = net.init(jax.random.PRNGKey(1), x, t)

    def eval_fn(p_, x_, t_):
        return net.apply(p_, x_, t_)

    lowered = jax.jit(eval_fn).lower(params, x, t)

    results = {}
    for name, opts in OPTION_SETS.items():
        try:
            t0 = time.perf_counter()
            compiled = lowered.compile(compiler_options=opts or None)
            compile_s = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001 - report and continue
            results[name] = {"opts": opts, "error": str(e)[:300]}
            print(f"{name:16s} INVALID: {str(e)[:120]}", flush=True)
            continue

        # Warm-up + serialized timing (output feeds next input; a
        # final scalar fetch forces completion through the tunnel).
        y = compiled(params, x, t)
        _ = float(jnp.sum(y.astype(jnp.float32)))
        best = np.inf
        for _ in range(args.reps):
            y = x
            t0 = time.perf_counter()
            for _ in range(args.iters):
                y = compiled(params, y, t)
            _ = float(jnp.sum(y.astype(jnp.float32)))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        results[name] = {"opts": opts, "ms": best * 1e3,
                         "compile_s": round(compile_s, 1)}
        print(f"{name:16s} {best * 1e3:7.2f} ms/eval  "
              f"(compile {compile_s:.0f}s)", flush=True)

    base = results.get("baseline", {}).get("ms")
    if base:
        for name, r in results.items():
            if "ms" in r:
                r["vs_baseline"] = round(base / r["ms"], 4)
    with open(args.out, "w") as f:
        json.dump({"bs": args.bs, "iters": args.iters,
                   "results": results}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
