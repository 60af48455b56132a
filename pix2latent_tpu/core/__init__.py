from pix2latent_tpu.core.step import ExecutionCore

__all__ = ["ExecutionCore"]
