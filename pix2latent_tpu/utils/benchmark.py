"""In-loop quality metric evaluator.

Counterpart of the reference's ``Benchmark`` (``pix2latent/utils/benchmark.py:
12-46``): lazily-constructed L1/L2/LPIPS(alex|squeeze|vgg) metrics evaluated
against the masked target; plugged into optimizers via
``register_benchmark`` and reported in ``log_result``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

import pix2latent_tpu.loss_functions as LF


class Benchmark:
    VALID = ("l1", "l2", "alex", "squeeze", "vgg")

    def __init__(self, metrics=("l1", "l2", "alex"), lpips_params=None):
        for m in metrics:
            assert m in self.VALID, f"unknown metric {m}"
        self.metrics = tuple(metrics)
        self._lpips_params = lpips_params or {}
        self._fns = {}

    def _get(self, name):
        if name in self._fns:
            return self._fns[name]
        if name == "l1":
            fn = LF.masked_l1_loss
        elif name == "l2":
            fn = LF.masked_l2_loss
        else:
            from pix2latent_tpu.losses.lpips import LPIPS
            lp = LPIPS(net=name, spatial=True,
                       params=self._lpips_params.get(name))

            def fn(out, target, mask, _lp=lp):
                m = _lp(out, jnp.broadcast_to(target,
                                              out.shape))  # [n, H, W, 1]
                w = jnp.mean(mask, axis=-1, keepdims=True)
                n = jnp.sum(m * w, axis=(1, 2, 3))
                d = jnp.sum(w, axis=(1, 2, 3))
                return n / d
        self._fns[name] = fn
        return fn

    def evaluate(self, out, target, mask):
        """Per-sample metric dict: out [n,H,W,3]; target/mask [1,H,W,3]."""
        results = {}
        for name in self.metrics:
            fn = self._get(name)
            results[name] = np.asarray(fn(out, target, mask))
        return results
