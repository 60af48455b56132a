"""Batched multi-image BasinCMA knee sweep: M x max_batch_size (VERDICT.md
round 3, item 1).

The plain batched driver OOMs at M=8 (BigGAN-256, pop 18 — activations and
Adam state scale with M*pop), capping the repo's best throughput at M=6 =
476 img/s. The exact wrap-padded in-graph chunking (``core/step.py``)
moved the transform-search knee from M=8-spill to M=12-best; this sweep
measures whether the same lever beats 476 img/s on the multi-image driver.

Per (M, mbs) combo: steady-state img/s over the fused generation (warmup 1
generation, then value-fetch-bounded timing of G chained generations whose
CMA states evolve — the axon dispatch memoizer cannot fake it). OOM combos
are recorded, not fatal. Prints ONE JSON line.

Usage: python scripts/bench_batched_knee.py [--ms 6 8 12] [--mbs 0 36 72]
(mbs counts SAMPLES out of the M*pop concatenated batch; 0 = unchunked).
"""

import argparse
import json
import sys
import time
import warnings

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from pix2latent_tpu.cache import enable_compilation_cache

enable_compilation_cache()

POP = 18
GRAD_STEPS = 30


def _setup(dtype):
    import pix2latent_tpu.loss_functions as LF
    from pix2latent_tpu.models.biggan import BigGAN

    model = BigGAN("biggan-deep-256", dtype=dtype)
    loss_fn = LF.ProjectionLoss(lpips_net="alex", beta=10.0, dtype=dtype)
    return model, loss_fn


def _targets(model, m):
    z_true = jax.random.normal(jax.random.PRNGKey(1), (m, 128))
    c = jnp.zeros((m, 128))
    return model(z=z_true, c=c), c


def steady_state(model, loss_fn, m, mbs, gens):
    """img/s of the batched fused generation at (M=m, max_batch_size=mbs)."""
    from pix2latent_tpu import hooks
    from pix2latent_tpu.optimizers.batched import BatchedBasinCMAOptimizer
    from pix2latent_tpu.strategies import cma

    opt = BatchedBasinCMAOptimizer(
        model, loss_fn, z_dim=128, learning_rate=0.05,
        learnable_inputs={"c": 0.01}, hook_fn=hooks.Clamp(2.0),
        popsize=POP, max_batch_size=(mbs or None))
    targets, c = _targets(model, m)
    data = {"targets": targets, "fixed": {"c": c}}
    data["ctx"] = jax.jit(
        lambda t, w: loss_fn.precompute(t, w))(targets, None)

    _, state0 = cma.init(np.zeros(128), 1.0, POP)
    states = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (m, *a.shape)), state0)
    gen_fn = opt._get_generation(m, GRAD_STEPS, data)

    key = jax.random.PRNGKey(5)
    key, sub = jax.random.split(key)
    states, _, _, gen_min = gen_fn(model.params, data, states, sub,
                                   jnp.asarray(0, jnp.int32))
    np.asarray(gen_min)        # warmup sync (host value fetch, CLAUDE.md)

    t0 = time.time()
    for i in range(gens):
        key, sub = jax.random.split(key)
        states, _, _, gen_min = gen_fn(model.params, data, states, sub,
                                       jnp.asarray(i + 1, jnp.int32))
    np.asarray(gen_min)        # terminal true sync
    gen_time = (time.time() - t0) / gens
    return m * POP * GRAD_STEPS / gen_time, gen_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ms", type=int, nargs="*", default=[6, 8, 12])
    ap.add_argument("--mbs", type=int, nargs="*", default=[0, 36, 72],
                    help="max_batch_size values; 0 = unchunked")
    ap.add_argument("--gens", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    table = {}
    best = (0.0, None)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        model, loss_fn = _setup(dtype)
        for m in args.ms:
            for mbs in args.mbs:
                label = f"M={m},mbs={mbs or 'off'}"
                try:
                    ips, gen_time = steady_state(model, loss_fn, m, mbs,
                                                 args.gens)
                    table[label] = {"images_per_sec": round(ips, 1),
                                    "gen_time_s": round(gen_time, 3)}
                    if ips > best[0]:
                        best = (ips, label)
                except Exception as e:  # OOM / compile failure: record it
                    msg = str(e).split("\n")[0][:160]
                    table[label] = {"error": msg}
                print(f"{label}: {table[label]}", file=sys.stderr)

    print(json.dumps({
        "metric": "BigGAN-256 batched multi-image BasinCMA knee "
                  f"(pop {POP}, steady-state)",
        "value": round(best[0], 1),
        "unit": "images/sec",
        "vs_baseline": None,
        "detail": {"best": best[1], "table": table,
                   "compute_dtype": args.dtype,
                   "backend": jax.default_backend()},
    }))


if __name__ == "__main__":
    main()
