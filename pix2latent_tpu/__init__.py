"""pix2latent_tpu — TPU-native image→latent inversion framework.

A ground-up JAX/Flax/Pallas rebuild of the capabilities of
minyoungg/pix2latent (ECCV 2020 "Transforming and Projecting Images into
Class-conditional Generative Networks"): hybrid gradient-free + gradient
inversion (CMA-ES / BasinCMA / Adam) of images into frozen generative models
(BigGAN-deep-256, StyleGAN2), with spatial/color transform search — the CMA
ask→eval→tell loop, the Adam inner loop, the generator forward and the
projection loss all fused into single XLA programs, with the sample
population vmapped and sharded across the TPU mesh.
"""

__version__ = "0.1.0"

from pix2latent_tpu import distribution
from pix2latent_tpu import hooks
from pix2latent_tpu.variables import (
    VariableManager,
    Variables,
    load_variables,
    num_samples,
    save_variables,
    split_vars,
    stack_splits,
)

__all__ = [
    "VariableManager",
    "Variables",
    "save_variables",
    "load_variables",
    "split_vars",
    "stack_splits",
    "num_samples",
    "distribution",
    "hooks",
]
