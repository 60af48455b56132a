"""Generator model wrappers (Flax, NHWC, population-batched)."""

from pix2latent_tpu.models.base import FlaxModel, FunctionModel, as_model

__all__ = ["FlaxModel", "FunctionModel", "as_model"]
