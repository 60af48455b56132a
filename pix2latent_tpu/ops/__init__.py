"""TPU compute kernels (XLA formulations + Pallas implementations)."""

from pix2latent_tpu.ops.grid_sample import affine_grid, grid_sample

__all__ = ["affine_grid", "grid_sample"]
