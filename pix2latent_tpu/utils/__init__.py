from pix2latent_tpu.utils import image, misc, video  # noqa: F401
