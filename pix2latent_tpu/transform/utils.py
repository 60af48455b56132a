"""Mask statistics and pre-alignment (reference ``transform/transform_utils.py``).

Masks here are NHWC-style ``[H, W, C]`` (the reference used CHW).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pix2latent_tpu.utils.image import binarize


def get_biggan_stats():
    """Precomputed BigGAN object-location prior: where BigGAN 'likes' to put
    objects (reference ``transform_utils.py:84-88``)."""
    center_of_mass = [137 / 255.0, 127 / 255.0]
    object_size = [213 / 255.0, 210 / 255.0]
    return center_of_mass, object_size


def bbox_from_mask(mask):
    """Bounding box (st_h, st_w, en_h, en_w) of the nonzero region of an
    ``[H, W, C]`` mask (reference ``transform_utils.py:103-117``)."""
    mask = np.asarray(mask)
    assert mask.ndim == 3, f"expected [H,W,C] mask, got {mask.shape}"
    m = mask.mean(-1)
    rows = np.nonzero(m.sum(1))[0]
    cols = np.nonzero(m.sum(0))[0]
    st_h, en_h = (int(rows[0]), int(rows[-1])) if rows.size else (0, m.shape[0])
    st_w, en_w = (int(cols[0]), int(cols[-1])) if cols.size else (0, m.shape[1])
    return st_h, st_w, en_h, en_w


def compute_stat_from_mask(mask):
    """Object center and size as fractions of the image (reference
    ``transform_utils.py:91-100``)."""
    mask = np.asarray(mask)
    if mask.ndim == 4:
        mask = mask[0]
    st_h, st_w, en_h, en_w = bbox_from_mask(mask)
    obj_h, obj_w = en_h - st_h, en_w - st_w
    obj_center = (st_h + obj_h // 2, st_w + obj_w // 2)
    h, w = mask.shape[:2]
    return ((obj_center[0] / h, obj_center[1] / w),
            (obj_h / h, obj_w / w))


def convert_to_t(src_center, src_size, dst_center, dst_size):
    """Transformation parameter t = [s, tx, ty] mapping an object at
    src (center, size) onto dst (reference ``transform_utils.py:61-81``)."""
    src_center, src_size = np.array(src_center), np.array(src_size)
    dst_center, dst_size = np.array(dst_center), np.array(dst_size)
    scale_idx = int(np.argmax(src_size))
    s = (src_size / dst_size)[scale_idx]
    dxy = (src_center - dst_center) * 2.0
    return jnp.asarray([s, *dxy[::-1]], jnp.float32)


def compute_pre_alignment(weight):
    """Initial t from a (continuous) mask, targeting the BigGAN object prior
    (reference ``transform_utils.py:53-58``)."""
    dst_center, dst_size = get_biggan_stats()
    src_center, src_size = compute_stat_from_mask(binarize(weight))
    return convert_to_t(src_center, src_size, dst_center, dst_size)


def setup_transform_fn(args=None, weight=None, spatial_transform=False,
                       align=False, color_transform=(), sensitivity=0.1,
                       color_weight=0.2):
    """Build a ComposeTransform + initial parameter vector from flags.

    Working version of the reference's stale ``setup_transform_fn``
    (``transform_utils.py:15-50`` referenced symbols that no longer existed).
    Accepts either an argparse-style namespace (``args.spatial_transform``,
    ``args.align``, ``args.color_transform``) or explicit kwargs.

    Returns ``(transform_fn, t)`` — None, None when nothing is enabled.

    ``color_weight`` deliberately DEVIATES from the reference's factor of 5
    (``transform_utils.py:29-38`` — dead code there: its color path was
    never runnable). CMA searches t at the shared default sigma 1.0
    (``base_cma_optimizer.py:48-49``), so a weight of 5 makes one sigma of
    hue span 10x hue's entire valid range [-0.5, 0.5] — nearly every sample
    rail-clamps and the search cannot recover a known corruption (measured
    on chip, BASELINE.md round-5 notes). 0.2 puts the rails at ~2.5 sigma:
    the whole range is reachable and the seed's neighborhood is explored.
    """
    from pix2latent_tpu.transform.color import (BrightnessTransform,
                                                ContrastTransform,
                                                GammaTransform, HueTransform,
                                                SaturationTransform)
    from pix2latent_tpu.transform.compose import ComposeTransform
    from pix2latent_tpu.transform.spatial import SpatialTransform

    if args is not None:
        spatial_transform = getattr(args, "spatial_transform",
                                    spatial_transform)
        align = getattr(args, "align", align)
        color_transform = getattr(args, "color_transform", color_transform)

    transform_list = []
    if spatial_transform or align:
        pre = weight if (align and weight is not None) else None
        transform_list.append(
            (SpatialTransform(pre_align=pre, sensitivity=sensitivity), 1.0))

    color_classes = {
        "hue": HueTransform, "gamma": GammaTransform,
        "saturation": SaturationTransform, "brightness": BrightnessTransform,
        "contrast": ContrastTransform,
    }
    # ordered by information preservability, as the reference documents
    for name in ("hue", "gamma", "saturation", "brightness", "contrast"):
        if name in color_transform:
            transform_list.append((color_classes[name](), color_weight))

    if not transform_list:
        return None, None
    fn = ComposeTransform(transform_list)
    t = fn.get_param(as_tensor=True)[None]
    return fn, t
