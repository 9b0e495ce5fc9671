"""HBM accounting for the x2 sampling chain (VERDICT r3 item 4): AOT-
compile the bulk sampler at several batch sizes and print the compiled
program's memory analysis (argument / output / temp / total bytes) —
WITHOUT executing, so an over-budget batch size cannot wedge the chip.

Optionally (--dump) writes the XLA buffer-assignment dump and reports
the largest live allocations, naming what actually fills HBM at bs 96.

    python scripts/hbm_account_sampling.py [--bs 96 112 128] [--dump]
"""
import argparse
import glob
import os
import re
import sys

sys.path.insert(0, ".")


def build_sampler(batch_size):
    import jax

    from bench import _sample_config
    from dddpm_tpu.models.factory import build_model
    from dddpm_tpu.parallel.mesh import create_mesh
    from dddpm_tpu.sample import make_bulk_sampler

    # the exact model bench.py benchmarks — imported, not copied, so a
    # protocol change cannot desynchronize the accounting from the bench
    config = _sample_config(batch_size)
    net, process, init_fn, config = build_model(config)
    params = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    mesh = create_mesh()
    sampler = make_bulk_sampler(process, mesh, batch_size)
    rng = jax.eval_shape(lambda: jax.random.key(0, impl="rbg"))
    return sampler, params, rng


def analyze(batch_size, dump_dir=None):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sampler, params, rng = build_sampler(batch_size)
    lowered = sampler.lower(params, rng)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    gb = 1 << 30
    print(f"bs {batch_size:4d}: args {ma.argument_size_in_bytes / gb:7.3f} "
          f"GB  out {ma.output_size_in_bytes / gb:7.3f} GB  "
          f"temp {ma.temp_size_in_bytes / gb:7.3f} GB  "
          f"alias {ma.alias_size_in_bytes / gb:7.3f} GB  "
          f"gen-code {ma.generated_code_size_in_bytes / gb:7.3f} GB  "
          f"TOTAL {(ma.argument_size_in_bytes + ma.output_size_in_bytes + ma.temp_size_in_bytes - ma.alias_size_in_bytes) / gb:7.3f} GB",
          flush=True)
    return ma


def top_buffers(dump_dir, n=25):
    """Parse the buffer-assignment text dump for the largest allocations."""
    paths = glob.glob(os.path.join(dump_dir, "*buffer-assignment*"))
    if not paths:
        print(f"no buffer-assignment files under {dump_dir}")
        return
    path = max(paths, key=os.path.getsize)
    allocs = []
    pat = re.compile(r"allocation \d+: size (\d+)(.*)")
    with open(path) as f:
        lines = f.readlines()
    for i, line in enumerate(lines):
        m = pat.search(line)
        if m:
            size = int(m.group(1))
            # the first positioned buffer line names the HLO value
            detail = ""
            for j in range(i + 1, min(i + 4, len(lines))):
                if ":" in lines[j] and "size" in lines[j]:
                    detail = lines[j].strip()[:160]
                    break
            allocs.append((size, m.group(2).strip()[:80], detail))
    allocs.sort(reverse=True)
    print(f"\ntop {n} allocations ({os.path.basename(path)}):")
    for size, flags, detail in allocs[:n]:
        print(f"  {size / (1 << 20):9.1f} MB  {flags}\n"
              f"      {detail}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, nargs="+", default=[96, 112, 128])
    p.add_argument("--dump", action="store_true",
                   help="dump + parse XLA buffer assignment for bs[0]")
    args = p.parse_args()

    if args.dump:
        dump_dir = f"/tmp/xla_dump_bs{args.bs[0]}"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_dump_to={dump_dir} --xla_dump_hlo_as_text")
        analyze(args.bs[0], dump_dir)
        top_buffers(dump_dir)
        return

    for bs in args.bs:
        analyze(bs)


if __name__ == "__main__":
    main()
