"""Fused backward for StyleGAN2's style modulation (Pallas, opt-in).

The modulated conv computes ``y = conv(x * s)`` with a per-(sample,
in-channel) style scale ``s`` (``models/stylegan2.py::ModulatedConv`` —
the input-scaling reformulation of rosinality's per-sample weight
modulation). Its backward needs, given the conv's input-gradient
``g = conv_data_grad(...)``:

    g_x[n,h,w,i] = g[n,h,w,i] * s[n,i]            (continue backprop)
    g_s[n,i]     = sum_{h,w} g[n,h,w,i] * x[n,h,w,i]   (style grad)

Round-2 profiling (BASELINE.md) measured the ``g_s`` reductions as the top
StyleGAN2 cost: each reads two [22,512,512,64] tensors (~1.5 GB logical,
x2 lane padding at c=64) and XLA schedules the reduce and the elementwise
scale as separate passes over ``g``. This kernel emits BOTH outputs in ONE
pass: per grid step it reads a [rows, c] tile of ``g`` and ``x``, writes
the scaled tile, and accumulates the per-channel partial products into a
f32 accumulator that lives across the row-block dimension of the grid
(TPU grids iterate sequentially, so revisiting the [1, c] output block is
a safe accumulation).

Opt-in via ``ModulatedConv(fused_mod_bwd=True)`` / the model wrapper's
``fused_mod_bwd`` flag.

**Measured verdict (round 3, TPU v5e): a 2.1x LOSS in-graph** — 110 img/s
vs 227.5 baseline on ``bench_stylegan2.py`` (``PIX2LATENT_FUSED_MOD_BWD=1``
to reproduce). Third confirmation of the round-2 rule (FIR, attention, now
this): on this workload XLA's automatic fusion is the bar — the baseline
profile shows the style-grad reduce is already input-fused with the
elementwise scale into one HBM pass, so the kernel only adds custom-call
layout constraints (``T(8,128)`` on both sides of every modulated conv)
and per-grid-step dispatch overhead. Kept as the negative-result record
and correctness-tested exemplar of a sequential-grid accumulator kernel.
See BASELINE.md round-3 notes for the profile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bwd_kernel(g_ref, x_ref, s_ref, gx_ref, gs_ref):
    # s/gs travel as [n, 1, c] so their (1, c) block satisfies the Mosaic
    # tiling rule (last two block dims divisible by (8, 128) OR equal to
    # the array dims — (1, c) == the array's trailing (1, c)).
    j = pl.program_id(1)
    g = g_ref[0]                                      # [rows, c]
    s = s_ref[0, 0]                                   # [c]
    gx_ref[0] = g * s[None, :].astype(g.dtype)
    part = jnp.sum(g.astype(jnp.float32) * x_ref[0].astype(jnp.float32),
                   axis=0)                            # [c] f32

    @pl.when(j == 0)
    def _():
        gs_ref[0, 0] = part

    @pl.when(j > 0)
    def _():
        gs_ref[0, 0] = gs_ref[0, 0] + part


def _pick_rows(p: int, c: int, itemsize: int) -> int:
    """Largest power-of-two row-block dividing p (p = H*W is a power of 4
    for square feature maps) whose VMEM working set fits: three [rows, c]
    tiles (g, x, gx) double-buffered must stay under ~12 MB of the 16 MB
    scoped-vmem budget — rows=4096 at c=512 measured 16.04 MB and failed
    to compile on v5e."""
    budget = 12 * 2 ** 20
    cap = max(8, budget // (6 * c * itemsize))
    rows = 4096
    while rows > 8 and (p % rows or rows > cap):
        rows //= 2
    return rows


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_mod_backward(g, x, s, interpret: bool = False):
    """(g_x, g_s) in one pass. g, x: [n, h, w, c]; s: [n, c].

    ``g_s`` is returned in float32 (sum of ~260k bf16 products per channel
    needs f32 accumulation); ``g_x`` keeps ``g``'s dtype.
    """
    n, h, w, c = g.shape
    p = h * w
    rows = _pick_rows(p, c, g.dtype.itemsize)
    grid = (n, p // rows)

    g2 = g.reshape(n, p, c)
    x2 = x.reshape(n, p, c)
    s3 = s.reshape(n, 1, c)

    gx, gs = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, p, c), g.dtype),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        ],
        interpret=interpret,
    )(g2, x2, s3)
    return gx.reshape(n, h, w, c), gs.reshape(n, c)


def modulate(x, s, fused: bool = False, interpret: bool = None):
    """``x * s[:, None, None, :]`` with an optionally-fused backward.

    ``fused=False`` is plain XLA (autodiff splits the backward into the
    elementwise scale and a separate reduce); ``fused=True`` routes the
    backward through :func:`fused_mod_backward`. ``interpret`` defaults to
    True off-TPU (pallas has no compiled CPU backend — the 8-device
    virtual-CPU test mesh runs the kernel interpreted).
    """
    if not fused:
        return x * s[:, None, None, :]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _modulate_fused(x, s, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _modulate_fused(x, s, interpret=False):
    return x * s[:, None, None, :]


def _modulate_fwd(x, s, interpret=False):
    return x * s[:, None, None, :], (x, s)


def _modulate_bwd(interpret, res, g):
    x, s = res
    gx, gs = fused_mod_backward(g, x, s, interpret=interpret)
    return gx, gs.astype(s.dtype)


_modulate_fused.defvjp(_modulate_fwd, _modulate_bwd)
