"""Model protocol for the execution core.

The reference invokes ``model(**input_vars)`` inside its closure
(``pix2latent/optimizer/closure.py:51``). We keep that calling convention but
make the parameters explicit so jitted steps can thread them as arguments
(instead of baking multi-hundred-MB weight constants into every executable):

    model.apply(params, **inputs) -> out        # pure, jit-friendly
    model.params                                 # the frozen weight pytree
    model(**inputs) == model.apply(model.params, **inputs)

Inputs are population-batched ``[pop, ...]`` arrays; outputs are NHWC images
in [-1, 1].
"""

from __future__ import annotations

from typing import Any, Callable


class FlaxModel:
    """Wraps a Flax module + frozen params as an inversion target."""

    def __init__(self, module, params, method: Any = None, **apply_kwargs):
        self.module = module
        self.params = params
        self._method = method
        self._apply_kwargs = apply_kwargs

    def apply(self, params, **inputs):
        return self.module.apply({"params": params}, method=self._method,
                                 **self._apply_kwargs, **inputs)

    def __call__(self, **inputs):
        return self.apply(self.params, **inputs)


class FunctionModel:
    """Wraps a bare function ``(**inputs) -> out`` (tests, closed-form toys)."""

    def __init__(self, fn: Callable, params=None):
        self.fn = fn
        self.params = params

    def apply(self, params, **inputs):
        if params is None:
            return self.fn(**inputs)
        return self.fn(params, **inputs)

    def __call__(self, **inputs):
        return self.apply(self.params, **inputs)


def as_model(model) -> Any:
    """Coerce a callable into the model protocol."""
    if hasattr(model, "apply") and hasattr(model, "params"):
        return model
    if callable(model):
        return FunctionModel(model)
    raise TypeError(f"cannot wrap {type(model)} as a model")
