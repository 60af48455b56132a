"""Numerical golden test: converted-Flax BigGAN-deep vs a torch reference.

A plain-torch (NCHW) transcription of ``pytorch_pretrained_biggan``'s
Generator forward (the net the reference wraps,
``pix2latent/model/biggan.py:26``) at tiny width, fed a synthetic state_dict
in the HF key layout; ``convert_torch_biggan`` + the Flax forward must
reproduce its outputs. This validates the converter AND the architecture
transcription end-to-end (VERDICT.md round 1, item 3) — including the quirky
standing-stats interpolation and the gen_z reshape order.

Spectral-norm baking is covered separately
(``test_biggan.py::TestConverter``); here the state_dict uses plain
``.weight`` keys so the torch side stays a direct functional transcription.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from pix2latent_tpu.models.biggan import (BIGGAN_CONFIGS, BigGAN,  # noqa: E402
                                          convert_torch_biggan)

N_STATS = 51
EPS = 1e-4


def _t(rng, *shape, scale=0.1):
    return torch.tensor(rng.randn(*shape).astype(np.float32) * scale)


def make_state_dict(rng, version, ch):
    """Synthetic HF-layout state_dict (plain weights, no SN wrappers)."""
    cfg = BIGGAN_CONFIGS[version]
    z_dim = cond = 128
    sd = {"embeddings.weight": _t(rng, 128, 1000)}
    sd["generator.gen_z.weight"] = _t(rng, 4 * 4 * 16 * ch, z_dim + cond)
    sd["generator.gen_z.bias"] = _t(rng, 4 * 4 * 16 * ch)

    def add_bn(prefix, nf, conditional=True):
        sd[f"{prefix}.running_means"] = _t(rng, N_STATS, nf, scale=0.05)
        sd[f"{prefix}.running_vars"] = torch.tensor(
            1.0 + 0.05 * rng.rand(N_STATS, nf).astype(np.float32))
        if conditional:
            sd[f"{prefix}.scale.weight"] = _t(rng, nf, z_dim + cond)
            sd[f"{prefix}.offset.weight"] = _t(rng, nf, z_dim + cond)
        else:
            sd[f"{prefix}.weight"] = torch.tensor(
                1.0 + 0.1 * rng.randn(nf).astype(np.float32))
            sd[f"{prefix}.bias"] = _t(rng, nf)

    def add_conv(prefix, cout, cin, k, bias=True):
        sd[f"{prefix}.weight"] = _t(rng, cout, cin, k, k)
        if bias:
            sd[f"{prefix}.bias"] = _t(rng, cout)

    t_idx = 0
    for i, (up, im, om) in enumerate(cfg["layers"]):
        if i == cfg["attention_position"]:
            ap = f"generator.layers.{t_idx}"
            cin = im * ch
            add_conv(f"{ap}.snconv1x1_theta", cin // 8, cin, 1, bias=False)
            add_conv(f"{ap}.snconv1x1_phi", cin // 8, cin, 1, bias=False)
            add_conv(f"{ap}.snconv1x1_g", cin // 2, cin, 1, bias=False)
            add_conv(f"{ap}.snconv1x1_o_conv", cin, cin // 2, 1, bias=False)
            sd[f"{ap}.gamma"] = torch.tensor(0.7)
            t_idx += 1
        bp = f"generator.layers.{t_idx}"
        cin, cout, mid = im * ch, om * ch, im * ch // 4
        add_bn(f"{bp}.bn_0", cin)
        add_conv(f"{bp}.conv_0", mid, cin, 1)
        add_bn(f"{bp}.bn_1", mid)
        add_conv(f"{bp}.conv_1", mid, mid, 3)
        add_bn(f"{bp}.bn_2", mid)
        add_conv(f"{bp}.conv_2", mid, mid, 3)
        add_bn(f"{bp}.bn_3", mid)
        add_conv(f"{bp}.conv_3", cout, mid, 1)
        t_idx += 1
    add_bn("generator.bn", ch, conditional=False)
    add_conv("generator.conv_to_rgb", ch, ch, 3)
    return sd


# ------------------------------------------------------------------ #
# torch reference forward (HF pytorch_pretrained_biggan semantics)   #
# ------------------------------------------------------------------ #

def bn_forward(sd, prefix, x, truncation, cond=None):
    """HF BigGANBatchNorm.forward: math.modf interpolation with the
    REVERSED lerp (stats[start]*coef + stats[start+1]*(1-coef))."""
    means = sd[f"{prefix}.running_means"]
    varss = sd[f"{prefix}.running_vars"]
    coef, start = math.modf(truncation / 0.02)
    start = int(start)
    if coef != 0.0:
        mean = means[start] * coef + means[start + 1] * (1 - coef)
        var = varss[start] * coef + varss[start + 1] * (1 - coef)
    else:
        mean, var = means[start], varss[start]
    if cond is not None:
        weight = 1 + F.linear(cond, sd[f"{prefix}.scale.weight"])
        bias = F.linear(cond, sd[f"{prefix}.offset.weight"])
        out = ((x - mean.view(1, -1, 1, 1))
               / torch.sqrt(var.view(1, -1, 1, 1) + EPS)
               * weight.unsqueeze(-1).unsqueeze(-1)
               + bias.unsqueeze(-1).unsqueeze(-1))
    else:
        out = F.batch_norm(x, mean, var, weight=sd[f"{prefix}.weight"],
                           bias=sd[f"{prefix}.bias"], training=False,
                           eps=EPS)
    return out


def block_forward(sd, bp, x, truncation, cond, up, out_ch):
    x0 = x
    h = F.relu(bn_forward(sd, f"{bp}.bn_0", x, truncation, cond))
    h = F.conv2d(h, sd[f"{bp}.conv_0.weight"], sd[f"{bp}.conv_0.bias"])
    h = F.relu(bn_forward(sd, f"{bp}.bn_1", h, truncation, cond))
    if up:
        h = F.interpolate(h, scale_factor=2, mode="nearest")
    h = F.conv2d(h, sd[f"{bp}.conv_1.weight"], sd[f"{bp}.conv_1.bias"],
                 padding=1)
    h = F.relu(bn_forward(sd, f"{bp}.bn_2", h, truncation, cond))
    h = F.conv2d(h, sd[f"{bp}.conv_2.weight"], sd[f"{bp}.conv_2.bias"],
                 padding=1)
    h = F.relu(bn_forward(sd, f"{bp}.bn_3", h, truncation, cond))
    h = F.conv2d(h, sd[f"{bp}.conv_3.weight"], sd[f"{bp}.conv_3.bias"])
    x0 = x0[:, :out_ch]
    if up:
        x0 = F.interpolate(x0, scale_factor=2, mode="nearest")
    return x0 + h


def attn_forward(sd, ap, x):
    n, c, h, w = x.shape
    theta = F.conv2d(x, sd[f"{ap}.snconv1x1_theta.weight"])
    theta = theta.view(n, c // 8, h * w)
    phi = F.max_pool2d(F.conv2d(x, sd[f"{ap}.snconv1x1_phi.weight"]), 2)
    phi = phi.view(n, c // 8, h * w // 4)
    attn = torch.softmax(torch.bmm(theta.permute(0, 2, 1), phi), dim=-1)
    g = F.max_pool2d(F.conv2d(x, sd[f"{ap}.snconv1x1_g.weight"]), 2)
    g = g.view(n, c // 2, h * w // 4)
    attn_g = torch.bmm(g, attn.permute(0, 2, 1)).view(n, c // 2, h, w)
    o = F.conv2d(attn_g, sd[f"{ap}.snconv1x1_o_conv.weight"])
    return x + sd[f"{ap}.gamma"] * o


def torch_biggan_forward(sd, version, ch, z, class_onehot, truncation,
                         class_embed=None):
    cfg = BIGGAN_CONFIGS[version]
    embed = (class_embed if class_embed is not None
             else F.linear(class_onehot, sd["embeddings.weight"]))
    cond = torch.cat((z, embed), dim=1)
    h = F.linear(cond, sd["generator.gen_z.weight"],
                 sd["generator.gen_z.bias"])
    # HF: view NHWC then permute to NCHW ("to be able to use TF weights")
    h = h.view(-1, 4, 4, 16 * ch).permute(0, 3, 1, 2).contiguous()

    t_idx = 0
    for i, (up, im, om) in enumerate(cfg["layers"]):
        if i == cfg["attention_position"]:
            h = attn_forward(sd, f"generator.layers.{t_idx}", h)
            t_idx += 1
        h = block_forward(sd, f"generator.layers.{t_idx}", h, truncation,
                          cond, up, om * ch)
        t_idx += 1

    h = F.relu(bn_forward(sd, "generator.bn", h, truncation))
    h = F.conv2d(h, sd["generator.conv_to_rgb.weight"],
                 sd["generator.conv_to_rgb.bias"], padding=1)
    h = h[:, :3]
    return torch.tanh(h)


@pytest.mark.parametrize("truncation", [1.0, 0.5, 0.31])
def test_converted_flax_matches_torch(truncation):
    rng = np.random.RandomState(0)
    version, ch = "biggan-deep-128", 8
    sd = make_state_dict(rng, version, ch)

    z = rng.randn(2, 128).astype(np.float32) * 0.5
    onehot = np.zeros((2, 1000), np.float32)
    onehot[0, 153] = 1.0
    onehot[1, 7] = 1.0

    with torch.no_grad():
        want = torch_biggan_forward(
            sd, version, ch, torch.tensor(z), torch.tensor(onehot),
            truncation).numpy()                      # [N,3,H,W]

    params = convert_torch_biggan(sd, version)
    model = BigGAN(version, params=params, channel_width=ch)
    c = model.get_class_embedding(jnp.asarray(onehot))
    got = np.asarray(model(z=jnp.asarray(z), c=c,
                           truncation=truncation))  # [N,H,W,3]

    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=2e-5)
