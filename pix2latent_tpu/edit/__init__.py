from pix2latent_tpu.edit.editor import BigGANLatentEditor
from pix2latent_tpu.edit.ganspace import biggan_components

__all__ = ["BigGANLatentEditor", "biggan_components"]
