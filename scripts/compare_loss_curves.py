"""Training-dynamics parity: N-step same-data loss curves, torch
reference vs dddpm_tpu (SURVEY.md §7 hard part (c); VERDICT r1 item 3).

Both frameworks train the same UNet config with their own native init
under the reference's exact optimizer semantics
(/root/reference/trainers/trainer_ddpm.py:113-144: grad-accum x2 as
(obj/2).backward(), global-norm clip 1.0, Adam lr 2e-4) on an IDENTICAL
pre-generated stream of (x, t, eps) micro-batches — the same images,
the same timesteps, the same forward noise.  With sampling noise
removed, curve agreement isolates architecture + init + optimizer
parity; weights are still independently initialized, so this is a
distributional claim, not bit-identity.

    python scripts/compare_loss_curves.py [--steps 300] [--out results/loss_curve_parity.json]

Writes a JSON with both curves and windowed ratio stats; asserts the
smoothed curves stay within a noise band.
"""
import argparse
import importlib.util
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# CPU-parity harness by default (torch side is CPU-only): jax is
# forced onto CPU in main() unless --jax-platform default is passed,
# in which case the jax curves run on the real backend (TPU) with f32
# HIGHEST-precision matmuls/convs — platform float noise (~1e-6 rel)
# is negligible against the >=1% curve effects under study, and the
# TPU makes 1000-step curves tractable on this one-core host.
# The image's sitecustomize latches the axon TPU platform before env
# vars are read, so JAX_PLATFORMS=cpu alone would not work anyway.
import jax  # noqa: E402

REF = "/root/reference"
LR = 2e-4
ACCUM = 2
BS = 8
SIZE = 32
T_MAX = 1000
UNET = {"unet_chan": 64, "unet_in": 3, "unet_dims": (1, 2, 2),
        "unet_dropout": 0.0}


def load_reference_unet():
    mu = types.ModuleType("models.utils")
    mu.exists = lambda x: x is not None
    m = types.ModuleType("models")
    mun = types.ModuleType("models.unet")
    sys.modules.setdefault("models", m)
    sys.modules.setdefault("models.unet", mun)
    sys.modules["models.utils"] = mu

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    load("models.unet.blocks", f"{REF}/models/unet/blocks.py")
    unet = load("models.unet.unet", f"{REF}/models/unet/unet.py")
    return unet.Unet


def make_stream(steps):
    """(x, t, eps, sqrt_ab, sqrt_1mab) arrays shaped (steps, ACCUM, ...)."""
    from dddpm_tpu.data.datasets import make_synthetic
    from dddpm_tpu.models.schedule import DiffusionSchedule

    imgs, _ = make_synthetic(SIZE, 3, n=512, seed=0)
    rng = np.random.RandomState(1)
    idx = rng.randint(0, len(imgs), size=(steps, ACCUM, BS))
    x = imgs[idx].astype(np.float32) / 255.0 * 2.0 - 1.0
    t = rng.randint(0, T_MAX, size=(steps, ACCUM, BS)).astype(np.int64)
    eps = rng.randn(steps, ACCUM, BS, SIZE, SIZE, 3).astype(np.float32)
    sched = DiffusionSchedule.create("linear", T_MAX)
    sa = np.asarray(sched.sqrt_alphas_cumprod)[t].astype(np.float32)
    so = np.asarray(sched.sqrt_one_minus_alphas_cumprod)[t].astype(np.float32)
    return x, t, eps, sa, so


def torch_curve(steps, stream, seed=0, log_every=50):
    import torch

    torch.manual_seed(seed)
    net = load_reference_unet()(dict(UNET))
    net.train()
    opt = torch.optim.Adam(net.parameters(), lr=LR)
    xs, ts, epss, sas, sos = stream
    curve = []
    t0 = time.time()
    for s in range(steps):
        opt.zero_grad()
        micro_losses = []
        for m in range(ACCUM):
            x = torch.from_numpy(xs[s, m].transpose(0, 3, 1, 2))
            eps = torch.from_numpy(epss[s, m].transpose(0, 3, 1, 2))
            sa = torch.from_numpy(sas[s, m])[:, None, None, None]
            so = torch.from_numpy(sos[s, m])[:, None, None, None]
            x_t = sa * x + so * eps
            eps_hat = net(x_t, torch.from_numpy(ts[s, m]))
            obj = ((eps - eps_hat) ** 2).flatten(1).sum(1).mean()
            (obj / ACCUM).backward()  # trainer_ddpm.py:128
            micro_losses.append(obj.item())
        torch.nn.utils.clip_grad_norm_(net.parameters(), 1.0)
        opt.step()
        curve.append(float(np.mean(micro_losses)))
        if (s + 1) % log_every == 0:
            print(f"  torch step {s + 1}/{steps} loss={curve[-1]:.1f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    return curve


def jax_curve(steps, stream, seed=0, log_every=50):
    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax
    from dddpm_tpu.models.unet import Unet
    from dddpm_tpu.train.state import create_optimizer

    net = Unet(dim=UNET["unet_chan"], in_channels=UNET["unet_in"],
               dim_mults=UNET["unet_dims"], dropout=0.0)
    xs, ts, epss, sas, sos = stream
    params = net.init(jax.random.PRNGKey(seed), jnp.asarray(xs[0, 0]),
                      jnp.asarray(ts[0, 0]))
    tx = create_optimizer(LR)  # clip 1.0 -> Adam, same as the trainer
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, t, eps, sa, so):
        def loss_one(p, inp):
            xb, tb, epsb, sab, sob = inp
            x_t = sab[:, None, None, None] * xb + sob[:, None, None, None] * epsb
            eps_hat = net.apply(p, x_t, tb)
            return ((epsb - eps_hat) ** 2).reshape(xb.shape[0], -1).sum(1).mean()

        def micro(acc, inp):
            obj, g = jax.value_and_grad(loss_one)(params, inp)
            return jax.tree.map(jnp.add, acc, g), obj

        zeros = jax.tree.map(jnp.zeros_like, params)
        grads, objs = lax.scan(micro, zeros, (x, t, eps, sa, so))
        grads = jax.tree.map(lambda g: g / ACCUM, grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, objs.mean()

    curve = []
    t0 = time.time()
    for s in range(steps):
        params, opt_state, obj = step(
            params, opt_state, jnp.asarray(xs[s]), jnp.asarray(ts[s]),
            jnp.asarray(epss[s]), jnp.asarray(sas[s]), jnp.asarray(sos[s]))
        curve.append(float(obj))
        if (s + 1) % log_every == 0:
            print(f"  jax step {s + 1}/{steps} loss={curve[-1]:.1f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    return curve


def window_ratios(a, b, window=50):
    """Mean ratio per non-overlapping window."""
    out = []
    for i in range(0, len(a) - window + 1, window):
        out.append(float(np.mean(a[i:i + window]) / np.mean(b[i:i + window])))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--out", default="results/loss_curve_parity.json")
    p.add_argument("--window", type=int, default=50)
    p.add_argument("--seeds", type=int, nargs="+", default=[0],
                   help="one jax curve per seed; with >=2 seeds the "
                        "cross-seed SAME-framework ratio is reported "
                        "as the natural noise band that the "
                        "cross-framework ratio must stay within")
    p.add_argument("--torch-seeds", type=int, nargs="+", default=None,
                   help="torch-side seeds (default: same as --seeds); "
                        "fewer torch seeds keep the slow CPU side "
                        "tractable for long runs")
    p.add_argument("--jax-platform", choices=["cpu", "default"],
                   default="cpu",
                   help="'default' runs the jax curves on the real "
                        "backend (TPU) with f32 HIGHEST precision")
    p.add_argument("--side", choices=["both", "torch", "jax", "merge"],
                   default="both",
                   help="split execution: 'torch' / 'jax' run one side "
                        "and write <out>.<side>.json (the data stream "
                        "is deterministic per --steps, so sides can run "
                        "at different times / on different backends); "
                        "'merge' combines the two partials into the "
                        "final report. 'both' (default) is single-shot.")
    args = p.parse_args()
    if args.jax_platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_default_matmul_precision", "highest")
    torch_seeds = (args.seeds if args.torch_seeds is None
                   else args.torch_seeds)

    if args.side != "merge":
        stream = make_stream(args.steps)
        print(f"running {args.steps} steps x{ACCUM} accum, bs {BS}, "
              f"{SIZE}^2, jax seeds {args.seeds} "
              f"(platform {args.jax_platform}), "
              f"torch seeds {torch_seeds}, side {args.side} ...")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    if args.side in ("both", "torch"):
        tcs = [torch_curve(args.steps, stream, seed=s) for s in torch_seeds]
        if args.side == "torch":
            with open(args.out + ".torch.json", "w") as f:
                json.dump({"steps": args.steps, "torch_seeds": torch_seeds,
                           "torch_curves": tcs}, f)
            print(f"wrote {args.out}.torch.json")
            return
    if args.side in ("both", "jax"):
        jcs = [jax_curve(args.steps, stream, seed=s) for s in args.seeds]
        if args.side == "jax":
            with open(args.out + ".jax.json", "w") as f:
                json.dump({"steps": args.steps, "seeds": args.seeds,
                           "jax_platform": args.jax_platform,
                           "jax_curves": jcs}, f)
            print(f"wrote {args.out}.jax.json")
            return
    if args.side == "merge":
        with open(args.out + ".torch.json") as f:
            tpart = json.load(f)
        with open(args.out + ".jax.json") as f:
            jpart = json.load(f)
        assert tpart["steps"] == jpart["steps"] == args.steps, \
            "partial runs disagree on --steps"
        tcs, torch_seeds = tpart["torch_curves"], tpart["torch_seeds"]
        jcs, args.seeds = jpart["jax_curves"], jpart["seeds"]
        args.jax_platform = jpart["jax_platform"]
    jc = np.mean(jcs, axis=0).tolist()
    tc = np.mean(tcs, axis=0).tolist()

    ratios = window_ratios(jc, tc, args.window)
    final_ratio = float(np.mean(jc[-args.window:]) / np.mean(tc[-args.window:]))
    drop_t = tc[0] / np.mean(tc[-args.window:])
    drop_j = jc[0] / np.mean(jc[-args.window:])
    result = {
        "steps": args.steps, "batch_size": BS, "accum": ACCUM,
        "image_size": SIZE, "unet": {k: str(v) for k, v in UNET.items()},
        "seeds": args.seeds, "torch_seeds": torch_seeds,
        "jax_platform": args.jax_platform,
        "torch_curve": tc, "jax_curve": jc,
        "torch_curves": tcs, "jax_curves": jcs,
        "window": args.window, "window_ratios_jax_over_torch": ratios,
        "final_window_ratio": final_ratio,
        "loss_drop_torch": float(drop_t), "loss_drop_jax": float(drop_j),
    }
    if len(torch_seeds) >= 2:
        result["window_ratios_torch_seed0_over_seed1"] = window_ratios(
            tcs[0], tcs[1], args.window)
    if len(args.seeds) >= 2:
        result["window_ratios_jax_seed0_over_seed1"] = window_ratios(
            jcs[0], jcs[1], args.window)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f)
    print(f"window ratios (jax/torch): {[f'{r:.3f}' for r in ratios]}")
    if len(torch_seeds) >= 2:
        print("noise band (torch s0/s1):",
              [f"{r:.3f}" for r in result[
                  "window_ratios_torch_seed0_over_seed1"]])
    if len(args.seeds) >= 2:
        print("noise band (jax s0/s1):  ",
              [f"{r:.3f}" for r in result[
                  "window_ratios_jax_seed0_over_seed1"]])
    print(f"final-window ratio {final_ratio:.3f}; "
          f"loss drop torch {drop_t:.2f}x jax {drop_j:.2f}x")
    assert all(0.8 < r < 1.25 for r in ratios), (
        "loss curves diverge beyond the noise band")
    print(f"OK: training dynamics match within noise; wrote {args.out}")


if __name__ == "__main__":
    main()
