"""Optimizer drivers.

Same public set as the reference's ``pix2latent/optimizer/__init__.py`` plus
the transform-search driver:

    GradientOptimizer   — pure Adam descent       (gradient_optimizer.py)
    CMAOptimizer        — CMA + Adam finetune     (cma_optimizer.py)
    BasinCMAOptimizer   — CMA outer x Adam inner  (basincma_optimizer.py)
    NevergradOptimizer  — pluggable gradient-free (ng_optimizer.py)
    HybridNevergradOptimizer — NG outer x Adam inner (hybrid_ng_optimizer.py)
    TransformBasinCMAOptimizer — transform search (transform/transform_optimizer.py)
"""

from pix2latent_tpu.optimizers.base import _BaseOptimizer
from pix2latent_tpu.optimizers.gradient import GradientOptimizer
from pix2latent_tpu.optimizers.cma_optimizer import CMAOptimizer
from pix2latent_tpu.optimizers.basincma import BasinCMAOptimizer
from pix2latent_tpu.optimizers.ng_optimizer import (HybridNevergradOptimizer,
                                                    NevergradOptimizer)
from pix2latent_tpu.optimizers.batched import BatchedBasinCMAOptimizer

__all__ = ["GradientOptimizer", "CMAOptimizer", "BasinCMAOptimizer",
           "NevergradOptimizer", "HybridNevergradOptimizer",
           "BatchedBasinCMAOptimizer", "_BaseOptimizer"]
