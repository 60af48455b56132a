"""Host-side image IO and formatting.

Counterpart of the reference's ``pix2latent/utils/image.py``, NHWC throughout
(images are ``[H, W, 3]`` / ``[N, H, W, 3]`` float32 in [-1, 1]). IO and
post-processing stay on the host (PIL/cv2) — they are outside the hot loop.
``poisson_blend`` prefers the native C++ solver in ``pix2latent_tpu.native``
and falls back to ``cv2.seamlessClone``.
"""

from __future__ import annotations

import math
import os

import jax.numpy as jnp
import numpy as np
from PIL import Image

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def _resize_np(im, size_hw, smooth=True):
    """uint8/float HWC resize on host."""
    pil = Image.fromarray(im.astype(np.uint8))
    resample = Image.BILINEAR if smooth else Image.NEAREST
    return np.asarray(pil.resize((size_hw[1], size_hw[0]), resample))


def read(im_path, as_transformed_tensor=True, im_size=256,
         transform_style=None):
    """Read an image to an NHWC-free ``[H, W, 3]`` float array in [-1, 1].

    ``transform_style='biggan'`` resizes the short side then center-crops
    (reference ``image.py:26-40``); ``'stylegan'``/``'stylegan2'`` pads to a
    square then resizes (``image.py:41-52``); None behaves like 'biggan'.
    """
    im = np.array(Image.open(im_path).convert("RGB"))
    if im.max() <= 1.0 + 1e-6:
        im = (im * 255).astype(np.uint8)
    h, w = im.shape[:2]

    if not as_transformed_tensor:
        return im

    if transform_style in ("stylegan", "stylegan2"):
        if h < w:
            pt, pb = (w - h) // 2, (w - h) - (w - h) // 2
            pl = pr = 0
        else:
            pl, pr = (h - w) // 2, (h - w) - (h - w) // 2
            pt = pb = 0
        im = np.pad(im, ((pt, pb), (pl, pr), (0, 0)))
        im = _resize_np(im, (im_size, im_size))
    elif transform_style in (None, "biggan"):
        # resize short side to im_size, center crop
        scale = im_size / min(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        im = _resize_np(im, (nh, nw))
        im = center_crop_to(im, im_size)
    else:
        raise ValueError(f"unknown transformation style {transform_style}")

    im = im.astype(np.float32) / 255.0
    return jnp.asarray(2.0 * im - 1.0)


def center_crop_to(im, size):
    h, w = im.shape[:2]
    top = max((h - size) // 2, 0)
    left = max((w - size) // 2, 0)
    return im[top:top + size, left:left + size]


def save(save_path, im, quality=100):
    """Save an image ([-1,1] float HWC/NHWC-grid or uint8) as jpg/png."""
    im = np.asarray(im)
    if im.ndim == 4:
        im = to_grid(im)
        im = np.asarray(im)
    if im.dtype != np.uint8:
        im = np.asarray(to_image(im))
    Image.fromarray(im).save(save_path, quality=quality)


def to_grid(x, pad_value=-1.0):
    """Collage a batch [N, H, W, C] into one [-1,1] image (reference
    ``image.py:74-76`` / torchvision make_grid, pad 2px)."""
    x = np.asarray(x)
    n, h, w, c = x.shape
    cols = int(math.ceil(math.sqrt(n)))
    rows = int(math.ceil(n / cols))
    pad = 2
    grid = np.full((rows * (h + pad) + pad, cols * (w + pad) + pad, c),
                   pad_value, x.dtype)
    for i in range(n):
        r, cc = divmod(i, cols)
        top = r * (h + pad) + pad
        left = cc * (w + pad) + pad
        grid[top:top + h, left:left + w] = x[i]
    return grid


def to_image(output, denormalize=True, jpg_format=True):
    """[-1,1] float NHWC/HWC -> uint8 (reference ``image.py:79-108``)."""
    x = np.asarray(output, np.float32)
    if denormalize:
        x = (x + 1.0) / 2.0
    if jpg_format:
        x = np.clip(x * 255.0, 0, 255).astype(np.uint8)
    return x


def to_tensor(im):
    """Path/uint8 HWC -> [1, H, W, 3] float in [-1,1] (reference
    ``image.py:111-117``, NHWC instead of NCHW)."""
    if isinstance(im, str):
        im = np.array(Image.open(im).convert("RGB"))
    im = np.asarray(im, np.float32)
    if im.max() > 1.0:
        im = im / 255.0
    return jnp.asarray(2.0 * (im - 0.5))[None]


def to_mask(mask):
    """Path/array -> binary [1, H, W, 1] mask in {0,1} (reference
    ``image.py:120-131``)."""
    if isinstance(mask, str):
        assert os.path.exists(mask)
        m = np.array(Image.open(mask).convert("L"), np.float32) / 255.0
        mask = (m > 0.5).astype(np.float32)[..., None]
    mask = np.asarray(mask, np.float32)
    assert mask.max() <= 1.0 and mask.min() >= 0.0
    if mask.ndim == 2:
        mask = mask[..., None]
    return jnp.clip(jnp.asarray(mask)[None], 0.0, 1.0)


def binarize(mask, min=0.0, max=1.0, eps=1e-3):
    """Continuous-valued mask -> binary (reference ``image.py:135-145``)."""
    mask = jnp.asarray(mask)
    out = (mask > 1.0 - eps).astype(jnp.float32)
    return jnp.clip(out, min, max)


def center_crop(image):
    """Square center crop along the max dimension (``image.py:148-168``)."""
    h, w = image.shape[:2]
    if h > w:
        st = (h - w) // 2
        out = image[st:st + w]
    else:
        st = (w - h) // 2
        out = image[:, st:st + h]
    assert out.shape[0] == out.shape[1]
    return out


def smart_resize(im, target_size=(256, 256)):
    """Area-downsample / bilinear-upsample host resize (``image.py:171-180``)."""
    im = np.asarray(im)
    if cv2 is not None:
        interp = (cv2.INTER_AREA
                  if np.prod(im.shape[:2]) >= np.prod(target_size)
                  else cv2.INTER_LINEAR)
        return cv2.resize(im, (target_size[1], target_size[0]),
                          interpolation=interp)
    return _resize_np(im, target_size)


def poisson_blend(target, mask, generated):
    """Seamlessly composite the generated object into the original frame
    (reference ``image.py:183-209``). Uses the native C++ Poisson solver when
    built (``pix2latent_tpu.native``), else cv2.seamlessClone.
    """
    from pix2latent_tpu.transform.utils import compute_stat_from_mask

    target = np.asarray(target, np.float32)
    generated = np.asarray(generated, np.float32)
    mask = np.asarray(mask, np.float32)
    if target.max() <= 1.0:
        target = target * 255.0
    if generated.max() <= 1.0:
        generated = generated * 255.0
    if mask.max() > 1.0:
        mask = mask / 255.0

    m3 = mask if mask.ndim == 3 else mask[..., None]
    obj_center, _ = compute_stat_from_mask(
        jnp.asarray((m3 > 0.5).astype(np.float32)))
    center_xy = (int(obj_center[1] * target.shape[1]),
                 int(obj_center[0] * target.shape[0]))
    mask_u8 = (255 * (m3[..., 0] > 0.5)).astype(np.uint8)

    try:
        from pix2latent_tpu.native import seamless_clone
        return seamless_clone(generated.astype(np.uint8),
                              target.astype(np.uint8), mask_u8, center_xy)
    except Exception:
        pass
    if cv2 is None:
        raise RuntimeError("poisson_blend needs the native extension or cv2")
    return cv2.seamlessClone(generated.astype(np.uint8),
                             target.astype(np.uint8), mask_u8,
                             center_xy, cv2.NORMAL_CLONE)
