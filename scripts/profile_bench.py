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
        # _run_gens ends with a host value fetch of every gen_min — a true
        # sync on the axon tunnel, so the trace window covers the work
        state, mins, _ = bench._run_gens(
            opt, gen_fn, defaults, PROFILE_GENS, seed=18, state=state)
    return LOGDIR


def capture_stylegan2():
    """Steady-state trace of bench_stylegan2's fused generation (reuses its
    ``_build`` so the trace is exactly the benched program). Syncs are host
    value fetches — ``block_until_ready`` does not reliably await completion
    on the axon tunnel (CLAUDE.md), which would let warmup bleed into the
    trace window or close it before the generations execute."""
    import warnings

    import bench_stylegan2 as B

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        opt, gen_fn, defaults = B._build(B.BENCH_DTYPE)
        params = opt.model.params
        state = opt.cma_state
        state, gen_min = gen_fn(params, defaults, state, opt.next_key(),
                                jnp.asarray(0, jnp.int32))
        float(gen_min)                      # warmup sync (value fetch)
        with jax.profiler.trace(LOGDIR):
            for i in range(PROFILE_GENS):
                state, gen_min = gen_fn(params, defaults, state,
                                        opt.next_key(),
                                        jnp.asarray(i + 1, jnp.int32))
            float(gen_min)                  # trace-close sync (value fetch)
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
