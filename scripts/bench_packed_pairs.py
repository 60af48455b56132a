"""Measure population-pair channel packing for thin-channel StyleGAN2 ops.

StyleGAN2-cars-512's ceiling (227.5 img/s = 7.5x, BASELINE.md round-3 note)
is set by 2x lane padding: the res-512 tensors are bf16 ``[22,512,512,64]``
and c=64 fills only half of the 128-lane registers (T(8,128)(2,1) tiling),
so every HBM transfer of those tensors pays double. The generator is FROZEN
(only input/style grads flow), so two population members can be packed into
the channel dim — ``[22,H,W,64] -> [11,H,W,128]`` — and the shared-weight
conv becomes a ``feature_group_count=2`` conv with the kernel tiled along O
(bit-identical, verified on CPU here and in ``tests/test_stylegan2.py``).
Whether that halves real traffic depends on how XLA-TPU lowers 2-group
convs — this script measures it before any integration (the profile-first
rule that produced the round-2 +19%/+32% wins and rejected the Pallas FIR
and fused-mod-backward kernels).

Patterns timed (the res-512 hot set from the profile):
  1. conv fwd + input-grad chain (3x3, the synthesis conv)
  2. style-modulated conv with style grad (the modulation backward's
     multiply_reduce pattern)
  3. plain multiply + per-channel reduce (the demod-grad reduction)

Axon rules respected: chained varying inputs (the runtime memoizes
identical dispatches) and a host value fetch per timing block
(block_until_ready does not synchronize, CLAUDE.md).

Usage:  python scripts/bench_packed_pairs.py [pop] [res] [chan]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import pix2latent_tpu.cache  # noqa: F401  (persistent compile cache)

P = int(sys.argv[1]) if len(sys.argv) > 1 else 22
H = int(sys.argv[2]) if len(sys.argv) > 2 else 512
C = int(sys.argv[3]) if len(sys.argv) > 3 else 64
K = 3
DT = jnp.bfloat16
ITERS = int(os.environ.get("PACKED_BENCH_ITERS", "30"))


def pack(x):
    """[P,H,W,C] -> [P//2,H,W,2C]; member 2i in channels [:C], 2i+1 in [C:]."""
    p, h, w, c = x.shape
    return x.reshape(p // 2, 2, h, w, c).transpose(0, 2, 3, 1, 4) \
            .reshape(p // 2, h, w, 2 * c)


def unpack(y):
    p2, h, w, c2 = y.shape
    c = c2 // 2
    return y.reshape(p2, h, w, 2, c).transpose(0, 3, 1, 2, 4) \
            .reshape(2 * p2, h, w, c)


def conv(x, w, groups=1):
    dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                    dimension_numbers=dn,
                                    feature_group_count=groups)


def timeit(step, *args, iters=ITERS):
    """step must return arrays whose first element chains into args[0]."""
    out = step(*args)
    out = step(out[0], *args[1:])                        # warm, cached
    _ = float(jnp.sum(out[0].astype(jnp.float32)))       # true sync
    t0 = time.time()
    x = out[0]
    for _ in range(iters):
        x = step(x, *args[1:])[0]                        # chained inputs
    _ = float(jnp.sum(x.astype(jnp.float32)))            # value fetch
    return (time.time() - t0) / iters


def main():
    key = jax.random.PRNGKey(0)
    print(f"backend: {jax.default_backend()}  "
          f"shapes: batch [{P},{H},{H},{C}] vs packed "
          f"[{P//2},{H},{H},{2*C}] g=2  dtype={DT.__name__}")

    w1 = jax.random.normal(key, (K, K, C, C), DT) * 0.05
    w2 = jnp.concatenate([w1, w1], axis=3)               # [K,K,C,2C], g=2
    # dense block-diagonal [K,K,2C,2C]: blkdiag(w, w). 2x the FLOPs of the
    # grouped form, but the contraction is 2C=128 wide — FULL MXU width
    # instead of a quarter-utilized 64x64, and XLA lowers it as a plain
    # dense conv (no grouped-conv lowering risk). For thin channels the
    # MXU shape binds, not FLOPs: 2x work at 4x utilization is a net win.
    zeros = jnp.zeros_like(w1)
    wd = jnp.concatenate([jnp.concatenate([w1, zeros], 3),
                          jnp.concatenate([zeros, w1], 3)], axis=2)
    xb = jax.random.normal(key, (P, H, H, C), DT)
    xp = pack(xb)

    # -- 1. conv fwd + input grad ------------------------------------------ #
    def make_conv_step(w, groups):
        def loss(x):
            y = jax.nn.leaky_relu(conv(x, w, groups), 0.2)
            y = conv(y, w, groups)
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

        @jax.jit
        def step(x):
            g = jax.grad(loss)(x)
            return (x - jnp.asarray(1e-3, DT) * g,)
        return step

    tb = timeit(make_conv_step(w1, 1), xb)
    tp = timeit(make_conv_step(w2, 2), xp)
    td = timeit(make_conv_step(wd, 1), xp)
    print(f"conv fwd+bwd   batch {tb*1e3:7.2f} ms   "
          f"grouped {tp*1e3:7.2f} ms ({tb/tp:.2f}x)   "
          f"blkdiag {td*1e3:7.2f} ms ({tb/td:.2f}x)")

    # -- 2. modulated conv + style grad ------------------------------------ #
    sb = jnp.ones((P, C), DT)
    sp = sb.reshape(P // 2, 2 * C)

    def make_mod_step(w, groups):
        def loss(x, s):
            y = conv(x * s[:, None, None, :], w, groups)
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

        @jax.jit
        def step(x, s):
            gx, gs = jax.grad(loss, argnums=(0, 1))(x, s)
            return (x - jnp.asarray(1e-3, DT) * gx, gs)
        return step

    tb = timeit(make_mod_step(w1, 1), xb, sb)
    tp = timeit(make_mod_step(w2, 2), xp, sp)
    td = timeit(make_mod_step(wd, 1), xp, sp)
    print(f"modconv+sgrad  batch {tb*1e3:7.2f} ms   "
          f"grouped {tp*1e3:7.2f} ms ({tb/tp:.2f}x)   "
          f"blkdiag {td*1e3:7.2f} ms ({tb/td:.2f}x)")

    # -- 3. multiply + per-channel reduce (demod-grad pattern) ------------- #
    def make_red():
        @jax.jit
        def step(x, s):
            y = x * s[:, None, None, :]
            r = jnp.sum(y.astype(jnp.float32), axis=(1, 2))
            return (y + jnp.asarray(1e-6, DT) * r[:, None, None, :].astype(DT),)
        return step

    tb = timeit(make_red(), xb, sb)
    tp = timeit(make_red(), xp, sp)
    print(f"mul+chanreduce batch {tb*1e3:7.2f} ms   "
          f"packed {tp*1e3:7.2f} ms   ({tb/tp:.2f}x)")

    # -- 4. up-conv at the block transition --------------------------------- #
    # The transition block's up-conv has a lane-full input (prev block's
    # 2C channels at H/2) and a thin output: [P,H/2,H/2,2C] -> [P,H,H,C].
    # Three forms: unpacked batch; packed input + grouped g=2 kernel (same
    # FLOPs, both groups 2C-wide); packed + dense blkdiag (2x FLOPs).
    CIN, HU = 2 * C, H // 2
    wu = jax.random.normal(key, (K, K, CIN, C), DT) * 0.05
    wug = jnp.concatenate([wu, wu], axis=3)              # [K,K,2C,2C] g=2
    zu = jnp.zeros_like(wu)
    wud = jnp.concatenate([jnp.concatenate([wu, zu], 3),
                           jnp.concatenate([zu, wu], 3)], axis=2)
    xu = jax.random.normal(key, (P, HU, HU, CIN), DT)
    xup = pack(xu)

    def make_up_step(w, groups):
        def loss(x):
            dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
            y = lax.conv_general_dilated(
                x, w, (1, 1), ((K - 1, K - 1), (K - 1, K - 1)),
                lhs_dilation=(2, 2), dimension_numbers=dn,
                feature_group_count=groups)
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

        @jax.jit
        def step(x):
            g = jax.grad(loss)(x)
            return (x - jnp.asarray(1e-3, DT) * g,)
        return step

    tb = timeit(make_up_step(wu, 1), xu)
    tp = timeit(make_up_step(wug, 2), xup)
    td = timeit(make_up_step(wud, 1), xup)
    print(f"upconv fwd+bwd batch {tb*1e3:7.2f} ms   "
          f"grouped {tp*1e3:7.2f} ms ({tb/tp:.2f}x)   "
          f"blkdiag {td*1e3:7.2f} ms ({tb/td:.2f}x)")

    # -- 5. the pack transpose itself (fwd + transposed cotangent) ---------- #
    # at the block ENTRY ([P,H/2,H/2,2C], the 206-img/s integration) vs
    # MID-BLOCK ([P,H,H,C], the refined rule that measured 156 img/s)
    def make_pack_step():
        def loss(x):
            return jnp.sum(pack(x).astype(jnp.float32) ** 2) * 1e-6

        @jax.jit
        def step(x):
            g = jax.grad(loss)(x)
            return (x - jnp.asarray(1e-3, DT) * g,)
        return step

    te = timeit(make_pack_step(), xu)
    tm = timeit(make_pack_step(), xb)
    print(f"pack transpose entry [{P},{HU},{HU},{CIN}] {te*1e3:7.2f} ms   "
          f"mid [{P},{H},{H},{C}] {tm*1e3:7.2f} ms")

    # halves pairing (i, i+P/2): a channel concat of two contiguous batch
    # halves — a lane-fill, not a sublane shuffle (what the model now uses)
    def make_halves_step():
        def loss(x):
            p = x.shape[0]
            xh = jnp.concatenate([x[: p // 2], x[p // 2:]], axis=-1)
            return jnp.sum(xh.astype(jnp.float32) ** 2) * 1e-6

        @jax.jit
        def step(x):
            g = jax.grad(loss)(x)
            return (x - jnp.asarray(1e-3, DT) * g,)
        return step

    te = timeit(make_halves_step(), xu)
    tm = timeit(make_halves_step(), xb)
    print(f"pack halves    entry [{P},{HU},{HU},{CIN}] {te*1e3:7.2f} ms   "
          f"mid [{P},{H},{H},{C}] {tm*1e3:7.2f} ms")

    # -- exactness (f32, CPU-checkable) ------------------------------------ #
    wf = w1.astype(jnp.float32)
    xf = xb.astype(jnp.float32)
    zf = jnp.zeros_like(wf)
    wdf = jnp.concatenate([jnp.concatenate([wf, zf], 3),
                           jnp.concatenate([zf, wf], 3)], axis=2)
    y = conv(xf, wf, 1)
    yp = unpack(conv(pack(xf), jnp.concatenate([wf, wf], 3), 2))
    yd = unpack(conv(pack(xf), wdf, 1))
    err_g = float(jnp.max(jnp.abs(y - yp)))
    err_d = float(jnp.max(jnp.abs(y - yd)))
    print(f"exactness max|diff| grouped={err_g:.2e} blkdiag={err_d:.2e}")
    # grouped is bit-identical; blkdiag sums 2C channels (zeros contribute
    # exactly 0 but the reduction tree reorders) -> allclose, not equal
    assert err_g == 0.0, err_g
    assert err_d < 1e-4, err_d


if __name__ == "__main__":
    main()
