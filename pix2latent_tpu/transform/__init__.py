"""Spatial/color transform search.

Counterpart of the reference's ``pix2latent/transform/`` package:
differentiable affine alignment (``SpatialTransform``), color transforms
(here fully differentiable jnp ops — the reference's were CPU/PIL round-trips,
``color_transform.py:42-60``), weighted composition, and the
transform-search BasinCMA driver.
"""

from pix2latent_tpu.transform.base import TransformTemplate
from pix2latent_tpu.transform.spatial import SpatialTransform
from pix2latent_tpu.transform.color import (BrightnessTransform,
                                            ColorTransform, ContrastTransform,
                                            GammaTransform, HueTransform,
                                            SaturationTransform)
from pix2latent_tpu.transform.compose import (ComposeTransform,
                                              SpatialOnly)
from pix2latent_tpu.transform.transform_optimizer import (
    TransformBasinCMAOptimizer)
from pix2latent_tpu.transform.utils import setup_transform_fn

__all__ = ["TransformTemplate", "SpatialTransform", "ComposeTransform",
           "SpatialOnly",
           "ColorTransform", "HueTransform", "BrightnessTransform",
           "GammaTransform", "SaturationTransform", "ContrastTransform",
           "TransformBasinCMAOptimizer", "setup_transform_fn"]
