"""Loss building blocks (LPIPS feature pyramids, etc.).

The user-facing objectives live in ``pix2latent_tpu.loss_functions`` —
mirroring the reference's module layout (``pix2latent/loss_functions.py``).
"""

from pix2latent_tpu.losses.lpips import LPIPS

__all__ = ["LPIPS"]
