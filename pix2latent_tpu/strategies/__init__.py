"""Gradient-free search strategies, all implemented on-device in JAX.

``cma`` replaces the reference's host-side PyCMA dependency
(``base_cma_optimizer.py``); ``registry`` replaces its Nevergrad dependency
(``base_ng_optimizer.py``) with a pluggable ask/tell strategy registry.
"""

from pix2latent_tpu.strategies import cma
from pix2latent_tpu.strategies.cma import CMA
from pix2latent_tpu.strategies.registry import registry

__all__ = ["cma", "CMA", "registry"]
