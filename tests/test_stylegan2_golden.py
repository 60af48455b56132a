"""Numerical golden test: converted-Flax StyleGAN2 vs a torch reference.

A plain-torch (NCHW) transcription of rosinality/stylegan2-pytorch's
Generator forward — the net the reference clones and drives
(``pix2latent/model/stylegan2.py:12-28,83-85``) — including the native
``upfirdn2d`` semantics (zero-insert, pad, true convolution, stride crop),
equalized-lr layers, grouped per-sample modulated convs with weight
demodulation, FIR-blurred transpose-conv upsampling, noise injection,
fused-leaky-relu biasing and the skip ToRGB accumulation. A synthetic
``g_ema``-layout state_dict feeds both sides; ``convert_torch_stylegan2`` +
the Flax forward must reproduce the torch outputs (VERDICT.md round 1,
item 3).
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from pix2latent_tpu.models.stylegan2 import (StyleGAN2Generator,  # noqa: E402
                                             channels_for,
                                             convert_torch_stylegan2)

BLUR = [1, 3, 3, 1]
SQRT2 = math.sqrt(2.0)


# ------------------------------------------------------------------ #
# rosinality-native torch ops                                        #
# ------------------------------------------------------------------ #

def upfirdn2d_t(x, kernel, up=1, down=1, pad=(0, 0)):
    """rosinality upfirdn2d_native: zero-insert AFTER each sample, pad,
    convolve with the flipped kernel, stride-crop."""
    b, c, in_h, in_w = x.shape
    out = x.reshape(-1, in_h, 1, in_w, 1)
    out = F.pad(out, [0, up - 1, 0, 0, 0, up - 1])
    out = out.reshape(-1, 1, in_h * up, in_w * up)
    out = F.pad(out, [pad[0], pad[1], pad[0], pad[1]])
    kh, kw = kernel.shape
    w = torch.flip(kernel, [0, 1]).reshape(1, 1, kh, kw)
    out = F.conv2d(out, w)
    out = out[:, :, ::down, ::down]
    oh = (in_h * up + pad[0] + pad[1] - kh) // down + 1
    ow = (in_w * up + pad[0] + pad[1] - kw) // down + 1
    return out.reshape(b, c, oh, ow)


def make_kernel_t(k):
    k = torch.tensor(k, dtype=torch.float32)
    k = k[None, :] * k[:, None]
    return k / k.sum()


def fused_lrelu_t(x, bias):
    shape = [1, -1] + [1] * (x.dim() - 2)
    return F.leaky_relu(x + bias.reshape(shape), 0.2) * SQRT2


def equal_linear_t(x, w, b=None, lr_mul=1.0, activation=False):
    scale = (1.0 / math.sqrt(w.shape[1])) * lr_mul
    if activation:
        out = F.linear(x, w * scale)
        return fused_lrelu_t(out, b * lr_mul)
    return F.linear(x, w * scale, None if b is None else b * lr_mul)


def mod_conv(x, style, sd, prefix, up=False, demodulate=True):
    weight = sd[f"{prefix}.weight"]                 # [1, o, i, k, k]
    _, o, i, k, _ = weight.shape
    batch = x.shape[0]
    s = equal_linear_t(style, sd[f"{prefix}.modulation.weight"],
                       sd[f"{prefix}.modulation.bias"])          # [B, i]
    scale = 1.0 / math.sqrt(i * k * k)
    w = scale * weight * s.reshape(batch, 1, i, 1, 1)            # [B,o,i,k,k]
    if demodulate:
        demod = torch.rsqrt(w.pow(2).sum([2, 3, 4]) + 1e-8)
        w = w * demod.reshape(batch, o, 1, 1, 1)
    h, wd = x.shape[2:]
    if up:
        wt = w.transpose(1, 2).reshape(batch * i, o, k, k)
        out = F.conv_transpose2d(x.reshape(1, batch * i, h, wd), wt,
                                 padding=0, stride=2, groups=batch)
        out = out.reshape(batch, o, *out.shape[2:])
        p = (len(BLUR) - 2) - (k - 1)
        pad = ((p + 1) // 2 + 1, p // 2 + 1)
        out = upfirdn2d_t(out, make_kernel_t(BLUR) * 4, pad=pad)
    else:
        out = F.conv2d(x.reshape(1, batch * i, h, wd),
                       w.reshape(batch * o, i, k, k), padding=k // 2,
                       groups=batch)
        out = out.reshape(batch, o, *out.shape[2:])
    return out


def styled_conv_t(x, style, noise, sd, prefix, up=False):
    out = mod_conv(x, style, sd, f"{prefix}.conv", up=up)
    out = out + sd[f"{prefix}.noise.weight"] * noise
    return fused_lrelu_t(out, sd[f"{prefix}.activate.bias"])


def to_rgb_t(x, style, sd, prefix, skip=None):
    out = mod_conv(x, style, sd, f"{prefix}.conv", demodulate=False)
    out = out + sd[f"{prefix}.bias"]
    if skip is not None:
        p = len(BLUR) - 2
        pad = ((p + 1) // 2 + 2 - 1, p // 2)
        skip = upfirdn2d_t(skip, make_kernel_t(BLUR) * 4, up=2, pad=pad)
        out = out + skip
    return out


def torch_stylegan2_forward(sd, im_res, z):
    log_size = int(math.log2(im_res))
    # mapping: PixelNorm + 8 EqualLinear(lr_mul=0.01, fused_lrelu)
    w = z * torch.rsqrt(torch.mean(z ** 2, dim=1, keepdim=True) + 1e-8)
    for i in range(8):
        w = equal_linear_t(w, sd[f"style.{i + 1}.weight"],
                           sd[f"style.{i + 1}.bias"], lr_mul=0.01,
                           activation=True)

    batch = z.shape[0]
    x = sd["input.input"].repeat(batch, 1, 1, 1)
    x = styled_conv_t(x, w, sd["noises.noise_0"], sd, "conv1")
    skip = to_rgb_t(x, w, sd, "to_rgb1")

    ni = 1
    for li in range(log_size - 2):
        x = styled_conv_t(x, w, sd[f"noises.noise_{ni}"], sd,
                          f"convs.{2 * li}", up=True)
        x = styled_conv_t(x, w, sd[f"noises.noise_{ni + 1}"], sd,
                          f"convs.{2 * li + 1}")
        skip = to_rgb_t(x, w, sd, f"to_rgbs.{li}", skip)
        ni += 2
    return skip


# ------------------------------------------------------------------ #
# synthetic rosinality g_ema state_dict                              #
# ------------------------------------------------------------------ #

def make_state_dict(rng, im_res, cm=2):
    log_size = int(math.log2(im_res))
    sd = {}

    def t(*shape, scale=1.0):
        return torch.tensor(rng.randn(*shape).astype(np.float32) * scale)

    for i in range(8):
        sd[f"style.{i + 1}.weight"] = t(512, 512)
        sd[f"style.{i + 1}.bias"] = t(512, scale=0.1)
    sd["input.input"] = t(1, channels_for(4, cm), 4, 4)

    def styled(prefix, cin, cout, k=3):
        sd[f"{prefix}.conv.weight"] = t(1, cout, cin, k, k)
        sd[f"{prefix}.conv.modulation.weight"] = t(cin, 512, scale=0.2)
        sd[f"{prefix}.conv.modulation.bias"] = torch.tensor(
            1.0 + 0.1 * rng.randn(cin).astype(np.float32))
        sd[f"{prefix}.noise.weight"] = torch.tensor(
            float(rng.randn()) * 0.1)
        sd[f"{prefix}.activate.bias"] = t(cout, scale=0.1)

    def torgb(prefix, cin):
        sd[f"{prefix}.conv.weight"] = t(1, 3, cin, 1, 1)
        sd[f"{prefix}.conv.modulation.weight"] = t(cin, 512, scale=0.2)
        sd[f"{prefix}.conv.modulation.bias"] = torch.tensor(
            1.0 + 0.1 * rng.randn(cin).astype(np.float32))
        sd[f"{prefix}.bias"] = t(1, 3, 1, 1, scale=0.1)

    styled("conv1", channels_for(4, cm), channels_for(4, cm))
    torgb("to_rgb1", channels_for(4, cm))
    cin = channels_for(4, cm)
    for li in range(log_size - 2):
        res = 2 ** (li + 3)
        ch = channels_for(res, cm)
        styled(f"convs.{2 * li}", cin, ch)
        styled(f"convs.{2 * li + 1}", ch, ch)
        torgb(f"to_rgbs.{li}", ch)
        cin = ch

    num_layers = (log_size - 2) * 2 + 1
    for i in range(num_layers):
        res = 2 ** ((i + 5) // 2)
        sd[f"noises.noise_{i}"] = t(1, 1, res, res)
    return sd


@pytest.mark.parametrize("im_res", [16, 32])
def test_converted_flax_matches_torch(im_res):
    rng = np.random.RandomState(im_res)
    sd = make_state_dict(rng, im_res)

    z = rng.randn(2, 512).astype(np.float32)
    with torch.no_grad():
        want = torch_stylegan2_forward(sd, im_res,
                                       torch.tensor(z)).numpy()  # [N,3,H,W]

    params = convert_torch_stylegan2(sd, im_res=im_res)
    gen = StyleGAN2Generator(im_res=im_res)
    got = np.asarray(gen.apply({"params": params}, jnp.asarray(z)))

    assert got.shape == (2, im_res, im_res, 3)
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=2e-4, atol=2e-4)


def test_w_latent_path_matches_torch():
    """input_is_latent=True must skip the mapping net identically."""
    im_res = 16
    rng = np.random.RandomState(7)
    sd = make_state_dict(rng, im_res)
    wlat = rng.randn(2, 512).astype(np.float32) * 0.5

    def torch_from_w(sd, im_res, w):
        log_size = int(math.log2(im_res))
        batch = w.shape[0]
        x = sd["input.input"].repeat(batch, 1, 1, 1)
        x = styled_conv_t(x, w, sd["noises.noise_0"], sd, "conv1")
        skip = to_rgb_t(x, w, sd, "to_rgb1")
        ni = 1
        for li in range(log_size - 2):
            x = styled_conv_t(x, w, sd[f"noises.noise_{ni}"], sd,
                              f"convs.{2 * li}", up=True)
            x = styled_conv_t(x, w, sd[f"noises.noise_{ni + 1}"], sd,
                              f"convs.{2 * li + 1}")
            skip = to_rgb_t(x, w, sd, f"to_rgbs.{li}", skip)
            ni += 2
        return skip

    with torch.no_grad():
        want = torch_from_w(sd, im_res, torch.tensor(wlat)).numpy()

    params = convert_torch_stylegan2(sd, im_res=im_res)
    gen = StyleGAN2Generator(im_res=im_res)
    got = np.asarray(gen.apply({"params": params}, jnp.asarray(wlat),
                               input_is_latent=True))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=2e-4, atol=2e-4)
