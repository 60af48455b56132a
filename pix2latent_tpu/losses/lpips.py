"""LPIPS (Learned Perceptual Image Patch Similarity) in Flax.

The reference depends on the ``lpips`` pip package whose AlexNet/VGG backbones
run as separate torch/cuDNN modules (``pix2latent/loss_functions.py:131``).
Here the backbone, unit-normalization, squared-diff, linear heads and bilinear
upsampling are ordinary JAX ops, so the whole perceptual pyramid fuses into
the same XLA program as the generator forward and the reconstruction loss.

Layout is NHWC with inputs in ``[-1, 1]`` (LPIPS convention). ``spatial=True``
returns a per-pixel distance map ``[N, H, W, 1]`` (matching
``lpips.LPIPS(spatial=True)``), else a per-sample scalar ``[N]``.

Pretrained weights: zero-egress environments can't download the torch
checkpoints, so construction falls back to a deterministic random init with a
loud warning — throughput benchmarking and optimizer behavior are unaffected,
but *metric* parity requires converting real weights via
:func:`convert_torch_lpips` (accepts the ``lpips`` package's checkpoint
format: torchvision backbone state_dict + ``lin*.model.1.weight`` heads).
"""

from __future__ import annotations

import os
import warnings
from functools import partial
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# LPIPS input scaling layer (lpips/lpips.py ScalingLayer constants).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# Feature channels per tap, per backbone (lpips/pretrained_networks.py).
NET_CHANNELS = {
    "alex": (64, 192, 384, 256, 256),
    "vgg": (64, 128, 256, 512, 512),
    "vgg16": (64, 128, 256, 512, 512),
    "squeeze": (64, 128, 256, 384, 384, 512, 512),
}


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet.features re-expressed in NHWC; returns the five
    ReLU taps LPIPS uses (relu1..relu5)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        taps = []
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=((2, 2), (2, 2)),
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x); taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(192, (5, 5), padding=((2, 2), (2, 2)), dtype=self.dtype, name="conv2")(x)
        x = nn.relu(x); taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(384, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv3")(x)
        x = nn.relu(x); taps.append(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv4")(x)
        x = nn.relu(x); taps.append(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv5")(x)
        x = nn.relu(x); taps.append(x)
        return taps


class VGG16Features(nn.Module):
    """torchvision VGG16.features; taps at relu1_2/2_2/3_3/4_3/5_3."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
        taps = []
        idx = 0
        for stage, (ch, reps) in enumerate(cfg):
            for r in range(reps):
                x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f"conv{idx}")(x)
                x = nn.relu(x)
                idx += 1
            taps.append(x)
            if stage < len(cfg) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class _Fire(nn.Module):
    squeeze: int
    expand: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = nn.relu(nn.Conv(self.squeeze, (1, 1), dtype=self.dtype, name="squeeze")(x))
        e1 = nn.relu(nn.Conv(self.expand, (1, 1), dtype=self.dtype, name="expand1x1")(s))
        e3 = nn.relu(nn.Conv(self.expand, (3, 3),
                             padding=((1, 1), (1, 1)), dtype=self.dtype, name="expand3x3")(s))
        return jnp.concatenate([e1, e3], axis=-1)


class SqueezeNetFeatures(nn.Module):
    """torchvision SqueezeNet 1.1 features; seven LPIPS taps."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        taps = []
        x = nn.relu(nn.Conv(64, (3, 3), strides=(2, 2), dtype=self.dtype, name="conv1")(x))
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = _Fire(16, 64, dtype=self.dtype, name="fire2")(x)
        x = _Fire(16, 64, dtype=self.dtype, name="fire3")(x); taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = _Fire(32, 128, dtype=self.dtype, name="fire4")(x)
        x = _Fire(32, 128, dtype=self.dtype, name="fire5")(x); taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = _Fire(48, 192, dtype=self.dtype, name="fire6")(x); taps.append(x)
        x = _Fire(48, 192, dtype=self.dtype, name="fire7")(x); taps.append(x)
        x = _Fire(64, 256, dtype=self.dtype, name="fire8")(x); taps.append(x)
        x = _Fire(64, 256, dtype=self.dtype, name="fire9")(x); taps.append(x)
        return taps


_BACKBONES = {
    "alex": AlexNetFeatures,
    "vgg": VGG16Features,
    "vgg16": VGG16Features,
    "squeeze": SqueezeNetFeatures,
}


def _unit_normalize(feat, eps=1e-10):
    """Channel-wise unit normalization (lpips normalize_tensor)."""
    norm = jnp.sqrt(jnp.sum(feat ** 2, axis=-1, keepdims=True))
    return feat / (norm + eps)


def bilinear_resize(x, out_hw):
    """Bilinear upsample NHWC to ``out_hw`` (matches torch
    ``nn.Upsample(mode='bilinear', align_corners=False)`` via jax.image)."""
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, out_hw[0], out_hw[1], c), method="bilinear")


class LPIPSModule(nn.Module):
    """Backbone taps -> unit-norm -> squared diff -> 1x1 linear heads.

    ``dtype`` sets the backbone compute precision (bfloat16 on TPU); the
    unit-normalization, squared diff and linear heads stay float32 so the
    distance itself keeps full precision.

    The pyramid is split into :meth:`features` (scaling + backbone +
    unit-normalization of ONE image batch) and :meth:`distance` (features of
    ``x`` vs precomputed features of ``y``), so a loop-invariant target's
    feature pyramid can be computed once per inversion and hoisted out of the
    inner optimization scan — the target branch is otherwise recomputed (and,
    without stop_gradient, even backpropped) every step. ``__call__(x, y)``
    is exactly ``distance(x, features(y))``.
    """
    net: str = "alex"
    spatial: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = _BACKBONES[self.net](dtype=self.dtype)
        for i in range(len(NET_CHANNELS[self.net])):
            # lin head: 1x1 conv, 1 output channel, no bias (lpips NetLinLayer)
            setattr(self, f"lin{i}", nn.Conv(1, (1, 1), use_bias=False))

    def features(self, y):
        """Scaled + backbone + unit-normalized feature pyramid of ``y``
        (f32 list, one entry per LPIPS tap)."""
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        y = ((y - shift) / scale).astype(self.dtype)
        return [_unit_normalize(f.astype(jnp.float32))
                for f in self.backbone(y)]

    def distance(self, x, fy):
        """LPIPS distance between ``x`` and precomputed :meth:`features`
        ``fy`` (whose batch dim must be 1 or match ``x``'s)."""
        out_hw = x.shape[1:3]
        fx = self.features(x)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = (a - b) ** 2
            m = getattr(self, f"lin{i}")(d)
            if self.spatial:
                m = bilinear_resize(m, out_hw)
            else:
                m = jnp.mean(m, axis=(1, 2), keepdims=True)
            total = total + m
        if self.spatial:
            return total                       # [N, H, W, 1]
        return total.reshape(total.shape[0])   # [N]

    def __call__(self, x, y):
        return self.distance(x, self.features(y))


def random_init_params(net: str, key=None, image_size: int = 64):
    """Deterministic random-init LPIPS params (zero-egress fallback).

    Linear-head weights are squared to be non-negative like trained LPIPS
    heads, so the random-init metric is still a valid distance-like quantity.
    """
    del key  # deterministic host RNG below
    mod = LPIPSModule(net=net)
    dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    # shape-only init: abstract trace, no device compile at construction
    shapes = jax.eval_shape(
        lambda k: mod.init(k, dummy, dummy), jax.random.PRNGKey(0))["params"]
    rng = np.random.RandomState(0)

    def make(path, leaf):
        names = [str(getattr(p, "key", "")) for p in path]
        arr = np.asarray(rng.randn(*leaf.shape), np.float32)
        if any(n.startswith("lin") for n in names):
            return jnp.asarray((arr ** 2) * 10.0 / leaf.shape[-2])
        if names and names[-1] == "bias":
            return jnp.zeros(leaf.shape, leaf.dtype)
        # He-style scale for conv kernels keeps activations bounded
        fan_in = int(np.prod(leaf.shape[:-1])) or 1
        return jnp.asarray(arr * np.sqrt(2.0 / fan_in), dtype=leaf.dtype)
    return jax.tree_util.tree_map_with_path(make, shapes)


def convert_torch_lpips(state_dict, net: str = "alex"):
    """Convert an ``lpips`` package checkpoint (torch state_dict with
    torchvision backbone weights + ``lin*.model.1.weight`` heads) into the
    Flax param tree. Torch conv weights OIHW -> Flax HWIO.
    """
    def t2j(w):
        return jnp.asarray(np.asarray(w), jnp.float32)

    def conv(w, b=None):
        p = {"kernel": jnp.transpose(t2j(w), (2, 3, 1, 0))}
        if b is not None:
            p["bias"] = t2j(b)
        return p

    sd = {k: v for k, v in state_dict.items()}
    params: dict = {"backbone": {}}

    if net == "alex":
        torch_idx = [0, 3, 6, 8, 10]
        for i, ti in enumerate(torch_idx):
            params["backbone"][f"conv{i + 1}"] = conv(
                sd[f"net.slice{i + 1}.{ti}.weight"],
                sd.get(f"net.slice{i + 1}.{ti}.bias"))
    elif net in ("vgg", "vgg16"):
        torch_slices = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21],
                        [24, 26, 28]]
        idx = 0
        for s, layer_ids in enumerate(torch_slices):
            for ti in layer_ids:
                params["backbone"][f"conv{idx}"] = conv(
                    sd[f"net.slice{s + 1}.{ti}.weight"],
                    sd.get(f"net.slice{s + 1}.{ti}.bias"))
                idx += 1
    else:
        raise NotImplementedError(f"converter for net={net}")

    n_lins = len(NET_CHANNELS[net])
    for i in range(n_lins):
        w = sd[f"lin{i}.model.1.weight"]  # [1, C, 1, 1]
        params[f"lin{i}"] = {"kernel": jnp.transpose(t2j(w), (2, 3, 1, 0))}
    return params


class LPIPS:
    """User-facing LPIPS distance.

    ``LPIPS(net='alex', spatial=True)(x, y)`` with NHWC [-1,1] inputs returns
    the distance map ``[N, H, W, 1]`` (or ``[N]`` when spatial=False).
    """

    def __init__(self, net: str = "alex", params: Optional[Any] = None,
                 pretrained_path: Optional[str] = None, spatial: bool = True,
                 dtype: Any = jnp.float32):
        assert net in _BACKBONES, f"unknown LPIPS net {net}"
        self.net = net
        self.spatial = spatial
        self.module = LPIPSModule(net=net, spatial=spatial, dtype=dtype)
        if params is not None:
            self.params = params
        elif pretrained_path and os.path.exists(pretrained_path) \
                and str(pretrained_path).endswith(".npz"):
            # scripts/convert.py output — no torch needed at load time
            from pix2latent_tpu.utils.params_io import load_params_npz
            self.params = load_params_npz(pretrained_path)
        elif pretrained_path and os.path.exists(pretrained_path):
            import torch
            sd = torch.load(pretrained_path, map_location="cpu")
            self.params = convert_torch_lpips(sd, net=net)
        else:
            warnings.warn(
                "LPIPS: no pretrained weights available — using deterministic "
                "random init. Throughput/optimization behavior is unaffected; "
                "metric parity requires converted weights "
                "(convert_torch_lpips).", stacklevel=2)
            self.params = random_init_params(net)

    def __call__(self, x, y):
        return self.module.apply({"params": self.params}, x, y)

    def features(self, y):
        """Precompute the unit-normalized feature pyramid of ``y`` — see
        :meth:`LPIPSModule.features`. Use with :meth:`distance` to hoist a
        loop-invariant target's backbone pass out of an optimization loop."""
        return self.module.apply({"params": self.params}, y,
                                 method=LPIPSModule.features)

    def distance(self, x, fy):
        """LPIPS distance of ``x`` against precomputed :meth:`features`.
        ``__call__(x, y) == distance(x, features(y))`` exactly."""
        return self.module.apply({"params": self.params}, x, fy,
                                 method=LPIPSModule.distance)
