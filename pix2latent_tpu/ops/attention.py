"""Fused SA-GAN attention (Pallas TPU kernel) — OPT-IN, measured slower.

BigGAN's non-local block (reference ``model/biggan.py:26`` via HF
``pytorch_pretrained_biggan``; here ``models/biggan.py:SelfAttn``) attends
64x64 queries over 32x32 max-pooled keys/values. The XLA einsum+softmax
formulation materializes the f32 probability tensor [n, 4096, 1024]
(~300 MB at pop 18) in HBM several times per fwd+bwd — ~7% of the whole
BasinCMA step on a profile (BASELINE.md round 2). This kernel never writes
probabilities to HBM.

**Measured on TPU v5e (pop 18, bf16): the kernel LOSES.** XLA's einsum path
runs fwd+bwd in ~9 ms; this kernel's forward alone is 7-8 ms (best of
BQ 256/512/1024) — per-grid-step overhead dominates at these small shapes
(144 steps x ~50 us), the MXU sits at ~4% utilization, and XLA's
producer-consumer fusion pipelines the probability tensor well enough that
its HBM round-trips are cheaper than our dispatch overhead. Same lesson as
``ops/pallas_fir.py``: on this workload XLA's fusion is the bar, and a
kernel must clear it, not just avoid HBM. Kept opt-in
(``PIX2LATENT_FUSED_ATTENTION=1``) with full parity tests; default path is
:func:`sagan_attention_reference`.

- forward: one pass per (batch, q-block); keys/values stay VMEM-resident
  (k*d + k*dv is ~0.6 MB — far under the ~16 MB/core VMEM), logits+softmax
  live only in VMEM, so HBM traffic is just theta/phi/g/o.
- backward: recomputes the probabilities per q-block from (theta, phi)
  instead of saving them (flash-attention-style rematerialization), and
  accumulates dPhi/dG across q-blocks in the output block, exploiting the
  sequential TPU grid.

Softmax is exact (full k axis in every block), not online: the SA-GAN key
axis is small enough that tiling it would only add bookkeeping.

Numerics match the reference einsum path: QK^T accumulated in f32, softmax
in f32, probabilities cast to the compute dtype for the PV matmul (f32
accumulation). Gradients agree with the einsum path to bf16 tolerance
(tests/test_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# q-block rows per grid step: logits block is [BQ, k] f32 (2 MB at k=1024)
_BQ = 512
# keys/values must be VMEM-resident; bail out to the einsum path above this
_MAX_KV_VMEM_BYTES = 6 * 1024 * 1024


def _fwd_kernel(theta_ref, phi_ref, g_ref, o_ref):
    # theta [1, BQ, d]; phi [1, k, d]; g [1, k, dv]; o [1, BQ, dv]
    logits = jax.lax.dot_general(
        theta_ref[0], phi_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [BQ, k] f32 on MXU
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    probs = p / jnp.sum(p, axis=-1, keepdims=True)    # exact: full k axis
    o_ref[0] = jax.lax.dot_general(
        probs.astype(g_ref.dtype), g_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(theta_ref, phi_ref, g_ref, do_ref,
                dtheta_ref, dphi_ref, dg_ref):
    i = pl.program_id(1)
    theta = theta_ref[0]
    phi = phi_ref[0]

    # recompute probabilities for this q-block (never stored in HBM)
    logits = jax.lax.dot_general(
        theta, phi, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    probs = p / jnp.sum(p, axis=-1, keepdims=True)    # [BQ, k] f32

    do = do_ref[0]                                    # [BQ, dv]
    # dG += probs^T @ dO   (accumulated across q-blocks in an f32 output
    # block whose index is constant in i, so it stays VMEM-resident through
    # the inner grid; probs cast to the compute dtype as the forward did)
    dg_blk = jax.lax.dot_general(
        probs.astype(do.dtype), do,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # softmax VJP in f32: dLogits = probs*(dProbs - rowsum(dProbs*probs)).
    # dLogits STAYS f32 through the dTheta/dPhi matmuls (the XLA einsum
    # path keeps it f32 too; the FLOPs are negligible, and casting it to
    # bf16 here doubles the gradient error vs the reference path).
    dprobs = jax.lax.dot_general(
        do, g_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # [BQ, k]
    inner = jnp.sum(dprobs * probs, axis=-1, keepdims=True)
    dlogits = probs * (dprobs - inner)                # f32

    dtheta_ref[0] = jax.lax.dot_general(
        dlogits, phi.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtheta_ref.dtype)
    dphi_blk = jax.lax.dot_general(
        dlogits, theta.astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [k, d] f32

    @pl.when(i == 0)
    def _init():
        dphi_ref[0] = dphi_blk
        dg_ref[0] = dg_blk

    @pl.when(i > 0)
    def _acc():
        dphi_ref[0] = dphi_ref[0] + dphi_blk
        dg_ref[0] = dg_ref[0] + dg_blk


def _block_q(q):
    return _BQ if q % _BQ == 0 else q


def _fwd_call(theta, phi, g, interpret=False):
    n, q, d = theta.shape
    k = phi.shape[1]
    dv = g.shape[2]
    bq = _block_q(q)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(n, q // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, dv), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dv), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, q, dv), theta.dtype),
        interpret=interpret,
    )(theta, phi, g)


def _bwd_call(theta, phi, g, do, interpret=False):
    n, q, d = theta.shape
    k = phi.shape[1]
    dv = g.shape[2]
    bq = _block_q(q)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(n, q // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, dv), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, dv), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, dv), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, q, d), theta.dtype),
            # dPhi/dG accumulate across q-blocks: keep the running block f32
            jax.ShapeDtypeStruct((n, k, d), jnp.float32),
            jax.ShapeDtypeStruct((n, k, dv), jnp.float32),
        ],
        interpret=interpret,
    )(theta, phi, g, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def sagan_attention(theta, phi, g, interpret=False):
    """o[n,q,dv] = softmax(theta[n,q,d] @ phi[n,k,d]^T) @ g[n,k,dv].

    Fused Pallas kernel; probabilities never touch HBM. Use
    :func:`sagan_attention_reference` (or :func:`attention_supported` = False
    shapes) for the plain-XLA path.
    """
    return _fwd_call(theta, phi, g, interpret=interpret)


def _vjp_fwd(theta, phi, g, interpret):
    return _fwd_call(theta, phi, g, interpret=interpret), (theta, phi, g)


def _vjp_bwd(interpret, res, do):
    theta, phi, g = res
    dtheta, dphi, dg = _bwd_call(theta, phi, g, do.astype(theta.dtype),
                                 interpret=interpret)
    return dtheta, dphi.astype(phi.dtype), dg.astype(g.dtype)


sagan_attention.defvjp(_vjp_fwd, _vjp_bwd)


def sagan_attention_reference(theta, phi, g):
    """Plain-XLA formulation (materializes the probability tensor)."""
    attn = jax.nn.softmax(
        jnp.einsum("nqc,nkc->nqk", theta, phi,
                   preferred_element_type=jnp.float32), axis=-1)
    return jnp.einsum("nqk,nkc->nqc", attn.astype(g.dtype), g)


def attention_supported(theta, phi, g):
    """Whether the fused kernel should run: opt-in via
    ``PIX2LATENT_FUSED_ATTENTION=1`` (measured slower than the XLA einsum
    path on v5e — see module docstring), TPU backend, rank-3 inputs, and
    keys/values small enough to stay VMEM-resident."""
    import os
    if os.environ.get("PIX2LATENT_FUSED_ATTENTION", "0") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    if theta.ndim != 3 or phi.ndim != 3 or g.ndim != 3:
        return False
    n, q, d = theta.shape
    k = phi.shape[1]
    dv = g.shape[2]
    itemsize = jnp.dtype(theta.dtype).itemsize
    if k * (d + dv) * itemsize > _MAX_KV_VMEM_BYTES:
        return False
    # q-blocking needs an even split (or one whole block)
    return q % _BQ == 0 or q <= _BQ
