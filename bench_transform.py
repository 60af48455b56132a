"""Secondary benchmark: transform (alignment) search throughput.

The reference's phase-1 alignment search
(``examples/invert_biggan_with_transform.py:133``: 50 meta x 10 inner,
BasinCMA over t in R^3, popsize 7) is the most chip-underfilling workload
(BASELINE.md rows 6/notes: 84.8 img/s at pop 7 vs 476 for batched BigGAN).
``TransformBasinCMAOptimizer.optimize_fused_batched`` fuses M independent
searches into one program (VERDICT.md round 2, item 1); this bench measures
the aggregate speedup at the reference budget. Prints ONE JSON line:
the M-search aggregate throughput ratio vs M sequential solo runs.

Timing: each configuration runs twice and the SECOND (fully compiled,
steady-state) run is timed; ``optimize_fused_batched`` ends by converting
the final losses to numpy — a host value fetch, the only reliable
completion barrier on the axon tunnel (CLAUDE.md).
"""

import json
import os
import time
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from pix2latent_tpu.cache import enable_compilation_cache

enable_compilation_cache()

META, GRAD = 50, 10          # reference budget
M = int(os.environ.get("PIX2LATENT_BENCH_TRANSFORM_M", "4"))
_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}
BENCH_DTYPE = _DTYPES[os.environ.get("PIX2LATENT_BENCH_DTYPE", "bfloat16")]


def _build(dtype, m):
    """Transform-search problem over BigGAN-256 with M stacked targets
    (each a differently-shifted rendering of the generator's own output —
    the two-phase CLI's phase 1, ``examples/invert_biggan_with_transform``).
    """
    import pix2latent_tpu.loss_functions as LF
    from pix2latent_tpu import VariableManager
    from pix2latent_tpu.models.biggan import BigGAN
    from pix2latent_tpu.transform import (SpatialTransform,
                                          TransformBasinCMAOptimizer)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        model = BigGAN("biggan-deep-256", dtype=dtype)
        loss_fn = LF.ProjectionLoss(lpips_net="alex", beta=10.0, dtype=dtype)

    z = jax.random.normal(jax.random.PRNGKey(5), (1, 128))
    c = jnp.broadcast_to(model.get_class_embedding(153), (1, 128))
    clean = model(z=z, c=c)
    warp = SpatialTransform(sensitivity=1.0)
    shifts = np.linspace(-0.3, 0.3, m)
    targets = jnp.concatenate([
        warp.transform(clean, jnp.asarray([[1.0, float(s), 0.05]]))
        for s in shifts], axis=0)                       # [m, 256, 256, 3]

    vm = VariableManager(seed=0)
    vm.register("z", shape=(128,), var_type="input", learning_rate=0.05)
    vm.register("c", shape=(128,), var_type="input", learning_rate=0.01,
                default=c[0])
    vm.register("target", shape=(256, 256, 3), var_type="output",
                requires_grad=False, default=targets[0])
    vm.register("weight", shape=(256, 256, 3), var_type="output",
                requires_grad=False, default=jnp.ones((256, 256, 3)))
    vm.register("t", shape=(3,), var_type="transform", requires_grad=False,
                grad_free=(np.array([1.0, 0.0, 0.0]), 0.3))

    # PIX2LATENT_BENCH_TRANSFORM_MBS=<k>: in-graph population microbatching
    # (core lax.map over chunks of k samples) — the A/B switch for the M=8
    # working-set spill (BASELINE.md: M=8 regressed to 1.17x; under vmap the
    # chunked map bounds the in-flight set to M x k images instead of
    # M x pop)
    mbs = int(os.environ.get("PIX2LATENT_BENCH_TRANSFORM_MBS", "0")) or None
    opt = TransformBasinCMAOptimizer(model, vm, loss_fn,
                                     track_variables=False,
                                     max_batch_size=mbs)
    opt.register_transform(SpatialTransform(sensitivity=0.1), "t", "target")
    opt.register_transform(SpatialTransform(sensitivity=0.1), "t", "weight")
    opt.set_variable_propagation("z")
    return opt, targets


def _timed_batched(opt, targets, m, runs=2):
    """Run the M-search budget ``runs`` times; return the last wall time."""
    t = None
    for r in range(runs):
        t0 = time.time()
        res = opt.optimize_fused_batched(
            {"target": targets[:m]}, meta_steps=META, grad_steps=GRAD,
            seeds=np.arange(m) + 7 * (r + 1))
        t = time.time() - t0
        assert np.isfinite(res["best_loss"]).all(), res["best_loss"]
    return t, res


def _timed_solo(opt, runs=2):
    """Time the REAL solo path (``optimize_fused``, no vmap wrapper) — the
    program BASELINE.md's solo steady-state number refers to and what a
    user actually runs for one search; the M=1 batched time is reported
    separately so vmap-wrapper overhead stays visible instead of inflating
    the batching speedup."""
    t = None
    for _ in range(runs):
        t0 = time.time()
        _, _, loss = opt.optimize_fused(meta_steps=META, grad_steps=GRAD)
        t = time.time() - t0
        assert np.isfinite(loss).any(), loss
    return t


def main():
    opt, targets = _build(BENCH_DTYPE, M)

    t_solo = _timed_solo(opt)
    t_m1, _ = _timed_batched(opt, targets, 1)
    t_batch, resM = _timed_batched(opt, targets, M)

    searches_per_sec_solo = 1.0 / t_solo
    searches_per_sec_batch = M / t_batch
    ratio = searches_per_sec_batch / searches_per_sec_solo
    print(json.dumps({
        "metric": f"transform_searches_per_sec_M{M}",
        "value": round(searches_per_sec_batch, 4),
        "unit": f"alignment searches/sec (50x10 budget, pop 7, M={M})",
        "vs_baseline": round(ratio, 2),
        "detail": {
            "solo_sec": round(t_solo, 1),
            "batched_M1_sec": round(t_m1, 1),
            "batched_sec": round(t_batch, 1),
            "aggregate_speedup_vs_solo": round(ratio, 2),
            "dtype": str(BENCH_DTYPE.__name__),
        },
    }))


if __name__ == "__main__":
    main()
