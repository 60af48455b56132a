"""Inversion objectives.

TPU-native counterpart of the reference's ``pix2latent/loss_functions.py``.
All losses are pure jittable functions over NHWC image batches
(``[pop, H, W, C]`` in [-1, 1]); they fuse into the same XLA program as the
generator forward, so the full objective (reconstruction + LPIPS pyramid)
costs one compiled dispatch instead of separate module calls.

Every loss is callable as ``loss_fn(out, **output_vars)`` where the kwarg
names match the registered output-variable names — the same contract as the
reference (``examples/invert_biggan_adam.py:59-60``, ``closure.py:33-55``).
Losses return per-sample values ``[pop]`` (or per-element maps that the
execution core reduces per-sample, matching ``closure.py:55``).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

_SPATIAL_AXES = (1, 2, 3)  # H, W, C of an NHWC batch


def l1_loss(out, target):
    """``|x - y|`` elementwise (reference ``loss_functions.py:20-22``)."""
    return jnp.abs(target - out)


def l2_loss(out, target):
    """``(x - y)^2`` elementwise (reference ``loss_functions.py:25-27``)."""
    return (target - out) ** 2


def _broadcast_batch(x, n):
    if x.shape[0] == 1 and n != 1:
        return jnp.broadcast_to(x, (n, *x.shape[1:]))
    return x


def masked_l1_loss(out, target, mask):
    """Mask-normalized L1 (reference ``loss_functions.py:41-50``)."""
    mask = _broadcast_batch(mask, out.shape[0])
    target = _broadcast_batch(target, out.shape[0])
    loss = l1_loss(out, target)
    n = jnp.sum(loss * mask, axis=_SPATIAL_AXES)
    d = jnp.sum(mask, axis=_SPATIAL_AXES)
    return n / d


def masked_l2_loss(out, target, mask):
    """Mask-normalized L2 (reference ``loss_functions.py:53-61``)."""
    mask = _broadcast_batch(mask, out.shape[0])
    target = _broadcast_batch(target, out.shape[0])
    loss = l2_loss(out, target)
    n = jnp.sum(loss * mask, axis=_SPATIAL_AXES)
    d = jnp.sum(mask, axis=_SPATIAL_AXES)
    return n / d


def invertibility_loss(ims, target_transform, transform_params, mask=None):
    """``MSE(ims - T^{-1}(T(ims)))`` (reference ``loss_functions.py:30-38``)."""
    if ims.shape[0] == 1:
        ims = jnp.broadcast_to(
            ims, (transform_params.shape[0], *ims.shape[1:]))
    transformed = target_transform(ims, transform_params)
    inverted = target_transform(transformed, transform_params, invert=True)
    if mask is None:
        return jnp.mean((ims - inverted) ** 2, axis=_SPATIAL_AXES)
    return masked_l2_loss(ims, inverted, mask)


def weight_regularization(orig_params, curr_params, reg="l1",
                          weight_dict=None, skip_substr="bn"):
    """Distance between two parameter pytrees (for model finetuning;
    reference ``loss_functions.py:64-83``). Pytrees are flattened by path.
    """
    from jax.tree_util import tree_flatten_with_path, keystr

    flat_orig = dict(
        (keystr(p), v) for p, v in tree_flatten_with_path(orig_params)[0])
    reg_loss = 0.0
    for path, curr in tree_flatten_with_path(curr_params)[0]:
        name = keystr(path)
        if skip_substr and skip_substr in name.lower():
            continue
        orig = flat_orig[name]
        if reg == "l1":
            term = jnp.mean(jnp.abs(curr - orig))
        elif reg == "l2":
            term = jnp.mean((curr - orig) ** 2)
        elif reg == "inf":
            term = jnp.max(jnp.abs(curr - orig))
        else:
            raise ValueError(f"unknown reg {reg}")
        w = weight_dict[name] if weight_dict is not None else 1.0
        reg_loss = reg_loss + w * term
    return reg_loss


def _weighted_pool(loss_map, weight, loss_mask):
    """Spatially weighted mean used by both loss heads
    (reference ``loss_functions.py:117-123,141-147``)."""
    if weight is None:
        return loss_map
    w = weight if loss_mask is None else (loss_mask * weight)
    w = _broadcast_batch(w, loss_map.shape[0])
    if w.shape[-1] != loss_map.shape[-1]:
        # e.g. 3-channel weight against a 1-channel LPIPS map
        w = jnp.mean(w, axis=-1, keepdims=True)
    n = jnp.sum(loss_map * w, axis=_SPATIAL_AXES)
    d = jnp.sum(w, axis=_SPATIAL_AXES)
    return n / d


class ReconstructionLoss:
    """Spatially weighted L1/L2 (reference ``loss_functions.py:104-124``)."""

    def __init__(self, loss_type="l1"):
        if loss_type in ("l1", 1):
            self.loss_fn = l1_loss
        elif loss_type in ("l2", 2):
            self.loss_fn = l2_loss
        else:
            raise ValueError(f"Unknown loss_type {loss_type}")

    def __call__(self, output, target, weight=None, loss_mask=None):
        target = _broadcast_batch(target, output.shape[0])
        loss = self.loss_fn(output, target)
        return _weighted_pool(loss, weight, loss_mask)

    def precompute(self, target, weight=None, loss_mask=None):
        """Target-side context for :meth:`from_ctx` (trivial here — kept so
        every loss class shares the precompute protocol the execution core
        uses to hoist loop-invariant work out of the inner scan)."""
        return {"target": target, "weight": weight, "loss_mask": loss_mask}

    def from_ctx(self, output, ctx):
        """Same value as ``__call__(output, **ctx_args)``."""
        return self(output, ctx["target"], ctx["weight"], ctx["loss_mask"])


class PerceptualLoss:
    """LPIPS with spatial weighting (reference ``loss_functions.py:127-148``).

    The LPIPS distance map is produced by the Flax port in
    ``pix2latent_tpu.losses.lpips`` (AlexNet / VGG16 feature pyramids) and is
    fused into the same XLA graph as the generator forward — no separate
    CUDA-module dispatch as in the reference's ``lpips`` package.
    """

    def __init__(self, net="alex", params=None, pretrained_path=None,
                 dtype=None):
        from pix2latent_tpu.losses.lpips import LPIPS
        dtype = dtype if dtype is not None else jnp.float32
        self.lpips = LPIPS(net=net, params=params,
                           pretrained_path=pretrained_path, spatial=True,
                           dtype=dtype)

    def __call__(self, output, target, weight=None, loss_mask=None):
        target = _broadcast_batch(target, output.shape[0])
        loss = self.lpips(output, target)  # [pop, H, W, 1]
        return _weighted_pool(loss, weight, loss_mask)

    def precompute(self, target, weight=None, loss_mask=None):
        """Run the LPIPS backbone on the (loop-invariant) target ONCE and
        return the normalized feature pyramid; :meth:`from_ctx` then scores
        candidates against it without re-extracting (or backpropping through)
        the target branch — the single biggest saving in the inner scan
        (VERDICT.md round 1, item 2)."""
        return {"fy": self.lpips.features(target),
                "weight": weight, "loss_mask": loss_mask}

    def from_ctx(self, output, ctx):
        """Same value as ``__call__`` (backbone features of identical target
        rows are identical, so broadcasting a 1-row pyramid is exact)."""
        loss = self.lpips.distance(output, ctx["fy"])
        return _weighted_pool(loss, ctx["weight"], ctx["loss_mask"])


class ProjectionLoss:
    """The paper's default objective: masked L1 + beta * LPIPS
    (reference ``loss_functions.py:86-100``; beta=10, net='alex').
    """

    def __init__(self, lpips_net="alex", beta=10.0, lpips_params=None,
                 pretrained_path=None, loss_type="l1", dtype=None):
        self.beta = float(beta)
        self.rloss_fn = ReconstructionLoss(loss_type=loss_type)
        self.ploss_fn = PerceptualLoss(net=lpips_net, params=lpips_params,
                                       pretrained_path=pretrained_path,
                                       dtype=dtype)

    def __call__(self, output, target, weight=None, loss_mask=None):
        rec = self.rloss_fn(output, target, weight, loss_mask)
        per = self.ploss_fn(output, target, weight, loss_mask)
        return rec + self.beta * per

    def precompute(self, target, weight=None, loss_mask=None):
        """Loop-invariant context: the LPIPS target feature pyramid plus the
        reconstruction-side target/weight (see PerceptualLoss.precompute)."""
        return {"rec": self.rloss_fn.precompute(target, weight, loss_mask),
                "per": self.ploss_fn.precompute(target, weight, loss_mask)}

    def from_ctx(self, output, ctx):
        rec = self.rloss_fn.from_ctx(output, ctx["rec"])
        per = self.ploss_fn.from_ctx(output, ctx["per"])
        return rec + self.beta * per
