"""TPU op-level profile of the headline fused BasinCMA generation.

Captures a ``jax.profiler`` trace of steady-state fused generations of the
bench workload (bench.py) and aggregates per-op durations straight from the
xplane protobuf — the TensorBoard trace converter is broken in this image,
so we parse ``tensorflow.tsl.profiler.protobuf.xplane_pb2`` directly
(CLAUDE.md profiling recipe; this script is that recipe, committed).

Usage:
    python scripts/profile_bench.py [N_TOP]              # headline (BigGAN)
    python scripts/profile_bench.py [N_TOP] stylegan2    # secondary bench

Prints a table: total duration, share of device time, occurrences, op name.
Use this BEFORE optimizing — round 2's +19% (conv_to_rgb output slicing) came
from this profile, while the "obvious" LPIPS-target hoist measured ~0.
"""

import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

LOGDIR = os.environ.get("PIX2LATENT_PROFILE_DIR", "/tmp/p2l_profile")
PROFILE_GENS = int(os.environ.get("PIX2LATENT_PROFILE_GENS", "2"))


def capture_biggan():
    import bench
    opt, gen_fn, defaults = bench._build(bench.BENCH_DTYPE)
    # warm up: compile + fill caches so the trace is steady-state only
    state, _, _ = bench._run_gens(opt, gen_fn, defaults, 2, seed=17)
    with jax.profiler.trace(LOGDIR):
        state, mins, _ = bench._run_gens(
            opt, gen_fn, defaults, PROFILE_GENS, seed=18, state=state)
        jax.block_until_ready(state)
    return LOGDIR


def capture_stylegan2():
    """Steady-state trace of bench_stylegan2's fused generation."""
    import warnings

    import bench_stylegan2 as B
    import pix2latent_tpu.loss_functions as LF
    from pix2latent_tpu import VariableManager, hooks
    from pix2latent_tpu.models.stylegan2 import StyleGAN2
    from pix2latent_tpu.optimizers import BasinCMAOptimizer

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        model = StyleGAN2("cars", search="z", dtype=B.BENCH_DTYPE)
        loss_fn = LF.ProjectionLoss(lpips_net="alex", beta=10.0,
                                    dtype=B.BENCH_DTYPE)
        im = model.im_res
        vm = VariableManager(seed=0)
        vm.register("z", shape=(512,), var_type="input", grad_free=True,
                    learning_rate=0.05,
                    hook_fn=hooks.Compose(hooks.Normalize(),
                                          hooks.NormalPerturb(0.05)))
        vm.register("target", shape=(im, im, 3), var_type="output",
                    requires_grad=False, default=jnp.zeros((im, im, 3)))
        vm.register("weight", shape=(im, im, 3), var_type="output",
                    requires_grad=False, default=jnp.ones((im, im, 3)))
        opt = BasinCMAOptimizer(model, vm, loss_fn, track_variables=False)
        opt.setup_cma(vm)
        gen_fn = opt._build_fused_generation(B.GRAD_STEPS)
        defaults = vm.defaults()
        state = opt.cma_state
        state, gen_min = gen_fn(model.params, defaults, state, opt.next_key(),
                                jnp.asarray(0, jnp.int32))
        jax.block_until_ready(gen_min)
        with jax.profiler.trace(LOGDIR):
            for i in range(PROFILE_GENS):
                state, gen_min = gen_fn(model.params, defaults, state,
                                        opt.next_key(),
                                        jnp.asarray(i + 1, jnp.int32))
            jax.block_until_ready(gen_min)
    return LOGDIR


def aggregate(logdir, n_top=40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    assert paths, f"no xplane.pb under {logdir}"
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    totals = defaultdict(float)   # op name -> total ps
    counts = defaultdict(int)
    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                totals[name] += ev.duration_ps
                counts[name] += 1

    grand = sum(totals.values())
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:n_top]
    print(f"# device op time over {PROFILE_GENS} generations: "
          f"{grand / 1e12:.4f} s  ({len(totals)} distinct ops)")
    print(f"{'total_ms':>10} {'share':>7} {'count':>7}  op")
    for name, ps in rows:
        print(f"{ps / 1e9:10.2f} {ps / grand:7.2%} {counts[name]:7d}  "
              f"{name[:120]}")
    return totals


if __name__ == "__main__":
    n_top = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    which = sys.argv[2] if len(sys.argv) > 2 else "biggan"
    cap = {"biggan": capture_biggan, "stylegan2": capture_stylegan2}[which]
    aggregate(cap(), n_top)
