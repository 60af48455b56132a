"""BigGAN-deep generator in Flax (NHWC, TPU-native).

The reference wraps HuggingFace's ``pytorch_pretrained_biggan``
('biggan-deep-256') and tweaks it for inversion speed — inplace ReLU and
spectral-norm removal (``pix2latent/model/biggan.py:15-58``,
``utils/misc.py:141-157``). This is a from-scratch Flax implementation of the
same architecture (Brock et al., "Large Scale GAN Training for High Fidelity
Natural Image Synthesis", arXiv:1809.11096, BigGAN-deep variant):

- class embedding (128-d) concatenated with z (128-d) conditions every
  BatchNorm through per-layer linear gain/bias heads;
- bottleneck residual blocks (1x1 → 3x3 → 3x3 → 1x1 at channels/4) with
  nearest-neighbor upsampling and channel-truncation skips;
- one self-attention (non-local) block at 64x64;
- BatchNorm uses *standing statistics* interpolated by truncation value
  (the HF checkpoints store 51 stats points over truncation in [0, 1]).

Spectral norm is baked into the conv weights at conversion time (what the
reference's ``remove_spectral_norm`` does at load). Everything is NHWC so XLA
tiles convs directly onto the MXU; activations can run in bfloat16.

Zero-egress note: without the HF checkpoint the model runs with deterministic
random weights (fine for throughput benchmarks and optimizer mechanics);
``convert_torch_biggan`` maps the real ``pytorch_pretrained_biggan``
state_dict when available.
"""

from __future__ import annotations

import math
import warnings
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pix2latent_tpu.models.base import FlaxModel

# (up_sample, in_mult, out_mult) per block; channel = mult * channel_width.
# Attention is inserted before the block at `attention_position`.
# Mirrors the pytorch_pretrained_biggan configs so converted weights line up.
BIGGAN_CONFIGS = {
    "biggan-deep-128": dict(
        output_dim=128,
        layers=[(False, 16, 16), (True, 16, 16), (False, 16, 16),
                (True, 16, 8), (False, 8, 8), (True, 8, 4),
                (False, 4, 4), (True, 4, 2), (False, 2, 2), (True, 2, 1)],
        attention_position=8),
    "biggan-deep-256": dict(
        output_dim=256,
        layers=[(False, 16, 16), (True, 16, 16), (False, 16, 16),
                (True, 16, 8), (False, 8, 8), (True, 8, 8),
                (False, 8, 8), (True, 8, 4), (False, 4, 4),
                (True, 4, 2), (False, 2, 2), (True, 2, 1)],
        attention_position=8),
    "biggan-deep-512": dict(
        output_dim=512,
        layers=[(False, 16, 16), (True, 16, 16), (False, 16, 16),
                (True, 16, 8), (False, 8, 8), (True, 8, 8),
                (False, 8, 8), (True, 8, 4), (False, 4, 4),
                (True, 4, 2), (False, 2, 2), (True, 2, 1),
                (False, 1, 1), (True, 1, 1)],
        attention_position=8),
}

Z_DIM = 128
EMBED_DIM = 128
CHANNEL_WIDTH = 128
N_STATS = 51
BN_EPS = 1e-4


class StandingBatchNorm(nn.Module):
    """BatchNorm over standing statistics interpolated by truncation.

    Matches HF's ``BigGANBatchNorm``: stats recorded at 51 truncation points
    in [0, 1] (step 0.02); inference interpolates the two nearest. With
    ``conditional=True`` the affine params come from linear heads on the
    (z, class-embedding) condition vector; otherwise they are learned
    per-channel weight/bias.
    """
    num_features: int
    conditional: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, truncation, cond_vector=None):
        running_means = self.param(
            "running_means", nn.initializers.zeros, (N_STATS, self.num_features))
        running_vars = self.param(
            "running_vars", nn.initializers.ones, (N_STATS, self.num_features))

        # Interpolation at truncation, replicating HF BigGANBatchNorm.forward
        # EXACTLY — including its quirks: ``coef, start_idx =
        # math.modf(truncation / step_size)`` in float64 (so truncation=1.0
        # gives 1.0/0.02 = 49.99...  -> start_idx=49, coef~=1), and the
        # REVERSED lerp that weights stats[start_idx] by the FRACTIONAL part:
        # ``stats[start_idx]*coef + stats[start_idx+1]*(1-coef)``. Converted
        # checkpoints reproduce HF outputs bit-for-bit only with these
        # semantics (ADVICE.md round 1). Truncation is static (a Python
        # float) in every shipped path; a traced f32 value cannot reproduce
        # the float64 modf quirk, so reject it loudly rather than silently
        # diverge from HF.
        import math
        if not isinstance(truncation, (int, float)):
            raise TypeError(
                "truncation must be a static Python number (HF's standing-"
                "stats interpolation uses float64 modf semantics that a "
                "traced f32 value cannot reproduce); got "
                f"{type(truncation)}")
        coef, start_f = math.modf(float(truncation) / 0.02)
        start_idx = min(int(start_f), N_STATS - 1)
        if coef != 0.0:
            next_idx = min(start_idx + 1, N_STATS - 1)
            mean = (running_means[start_idx] * coef
                    + running_means[next_idx] * (1.0 - coef))
            var = (running_vars[start_idx] * coef
                   + running_vars[next_idx] * (1.0 - coef))
        else:
            mean = running_means[start_idx]
            var = running_vars[start_idx]

        inv = jax.lax.rsqrt(var + BN_EPS)
        x_hat = (x - mean.astype(x.dtype)) * inv.astype(x.dtype)

        if self.conditional:
            gain = 1.0 + nn.Dense(self.num_features, use_bias=False,
                                  dtype=self.dtype, name="scale")(cond_vector)
            bias = nn.Dense(self.num_features, use_bias=False,
                            dtype=self.dtype, name="offset")(cond_vector)
            return x_hat * gain[:, None, None, :] + bias[:, None, None, :]
        weight = self.param("weight", nn.initializers.ones,
                            (self.num_features,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_features,))
        return x_hat * weight.astype(x.dtype) + bias.astype(x.dtype)


class SelfAttn(nn.Module):
    """BigGAN self-attention (SA-GAN non-local block): theta/phi/g 1x1 convs
    with 2x2 max-pooled keys/values, learned gamma residual."""
    in_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.in_channels
        n, h, w, _ = x.shape
        theta = nn.Conv(c // 8, (1, 1), use_bias=False, dtype=self.dtype,
                        name="theta")(x)
        phi = nn.Conv(c // 8, (1, 1), use_bias=False, dtype=self.dtype,
                      name="phi")(x)
        phi = nn.max_pool(phi, (2, 2), strides=(2, 2))
        g = nn.Conv(c // 2, (1, 1), use_bias=False, dtype=self.dtype,
                    name="g")(x)
        g = nn.max_pool(g, (2, 2), strides=(2, 2))

        theta = theta.reshape(n, h * w, c // 8)
        phi = phi.reshape(n, (h // 2) * (w // 2), c // 8)
        g = g.reshape(n, (h // 2) * (w // 2), c // 2)

        from pix2latent_tpu.ops.attention import (attention_supported,
                                                  sagan_attention,
                                                  sagan_attention_reference)
        if attention_supported(theta, phi, g):
            # opt-in fused Pallas kernel (PIX2LATENT_FUSED_ATTENTION=1);
            # measured slower than XLA's einsum fusion — see ops/attention.py
            o = sagan_attention(theta, phi, g)
        else:
            o = sagan_attention_reference(theta, phi, g)
        o = o.reshape(n, h, w, c // 2)
        o = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                    name="o_conv")(o)
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return x + gamma.astype(x.dtype) * o


def _upsample2x(x):
    """Nearest-neighbor 2x upsample as broadcast+reshape.

    Exactly equivalent to ``jax.image.resize(..., method="nearest")`` for an
    integer 2x scale (output rows (2i, 2i+1) both read input row i), but
    NOT implemented via gather: on TPU the resize gather lowers to serial
    per-row while-loops of dynamic-update-slices (profiled at ~10% of the
    whole BasinCMA step, round 2), and its transpose is a scatter. The
    broadcast lowers to a vectorized copy and its transpose is a reduce-sum.
    """
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


class SlicedOutputConv(nn.Module):
    """3x3 SAME conv whose parameters have ``features`` output channels but
    whose computation produces only the first ``used``.

    Exists for HF BigGAN-deep's conv_to_rgb, which carries a full-width
    kernel while the model consumes only 3 of its output channels — slicing
    the KERNEL instead of the OUTPUT is numerically identical and removes
    the largest tensor write in the generator. Parameter names/shapes match
    ``nn.Conv(features)`` exactly, so weight converters are unaffected.
    """
    features: int
    used: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, in_ch, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jax.lax.conv_general_dilated(
            x, kernel[..., :self.used].astype(self.dtype),
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias[:self.used].astype(y.dtype)


class GenBlock(nn.Module):
    """BigGAN-deep bottleneck residual block (HF GenBlock semantics):
    4 cond-BN+ReLU+conv stages at channels/4, optional 2x upsample before the
    middle 3x3s, skip via channel truncation + upsample."""
    in_size: int
    out_size: int
    up_sample: bool = False
    reduction_factor: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, truncation, cond_vector):
        mid = self.in_size // self.reduction_factor

        h = StandingBatchNorm(self.in_size, dtype=self.dtype,
                              name="bn_0")(x, truncation, cond_vector)
        h = nn.relu(h)
        h = nn.Conv(mid, (1, 1), dtype=self.dtype, name="conv_0")(h)

        h = StandingBatchNorm(mid, dtype=self.dtype,
                              name="bn_1")(h, truncation, cond_vector)
        h = nn.relu(h)
        if self.up_sample:
            h = _upsample2x(h)
        h = nn.Conv(mid, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_1")(h)

        h = StandingBatchNorm(mid, dtype=self.dtype,
                              name="bn_2")(h, truncation, cond_vector)
        h = nn.relu(h)
        h = nn.Conv(mid, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_2")(h)

        h = StandingBatchNorm(mid, dtype=self.dtype,
                              name="bn_3")(h, truncation, cond_vector)
        h = nn.relu(h)
        h = nn.Conv(self.out_size, (1, 1), dtype=self.dtype,
                    name="conv_3")(h)

        skip = x[..., :self.out_size]          # channel-truncation skip
        if self.up_sample:
            skip = _upsample2x(skip)
        return skip + h


class BigGANDeepGenerator(nn.Module):
    """The generator: cond = concat(z, class_embedding) feeds gen_z and every
    conditional BN; blocks per BIGGAN_CONFIGS; 3-channel tanh output.

    ``remat=True`` checkpoints each residual block: the backward pass
    recomputes block activations instead of spilling them to HBM — a win on
    TPU where this inversion workload is HBM-bandwidth-bound (~75% of v5e
    bandwidth at fp32) with ~5x MXU FLOP headroom.
    """
    model_version: str = "biggan-deep-256"
    channel_width: int = CHANNEL_WIDTH
    dtype: Any = jnp.float32
    remat: bool = False
    remat_from_res: int = 0   # also remat blocks at/above this resolution

    @nn.compact
    def __call__(self, z, c, truncation=1.0):
        cfg = BIGGAN_CONFIGS[self.model_version]
        ch = self.channel_width
        cond = jnp.concatenate([z, c], axis=1).astype(self.dtype)

        h = nn.Dense(4 * 4 * 16 * ch, dtype=self.dtype, name="gen_z")(cond)
        # HF views gen_z output as [N, 4, 4, 16ch] — already height/width/
        # channel ordered ("to be able to use TF weights") — and only then
        # permutes to NCHW for torch convs. NHWC-native Flax needs just the
        # view. (Round 1 had reshape(-1, 16ch, 4, 4).transpose — a different
        # element order; caught by tests/test_biggan_golden.py.)
        h = h.reshape(-1, 4, 4, 16 * ch)

        attn_pos = cfg["attention_position"]
        res = 4
        for i, (up, in_mult, out_mult) in enumerate(cfg["layers"]):
            if i == attn_pos:
                h = SelfAttn(h.shape[-1], dtype=self.dtype,
                             name=f"attn_{i}")(h)
            if up:
                res *= 2
            use_remat = self.remat or (self.remat_from_res and
                                       res >= self.remat_from_res)
            block_cls = nn.remat(GenBlock) if use_remat else GenBlock
            h = block_cls(in_mult * ch, out_mult * ch, up_sample=up,
                          dtype=self.dtype, name=f"block_{i}")(
                              h, truncation, cond)

        h = StandingBatchNorm(h.shape[-1], conditional=False,
                              dtype=self.dtype, name="bn_out")(h, truncation)
        h = nn.relu(h)
        # HF quirk kept for weight parity: conv_to_rgb's weights produce `ch`
        # output channels and the image is the first 3. Computing all `ch`
        # and slicing afterwards was the single most expensive op in the
        # whole inversion step (13.3ms/86ms at 256^2 x pop 18, from the TPU
        # op profile) — so keep the full [3,3,ch,ch] parameter (converter
        # parity) but convolve with only the 3 used output channels:
        # bit-identical to conv-then-slice at ~1/40th the output traffic.
        h = SlicedOutputConv(features=ch, used=3, dtype=self.dtype,
                             name="conv_to_rgb")(h)
        return jnp.tanh(h).astype(jnp.float32)


class ClassEmbeddings(nn.Module):
    """one-hot(1000) -> 128-d class embedding (HF's snlinear embeddings)."""
    num_classes: int = 1000
    embed_dim: int = EMBED_DIM

    @nn.compact
    def __call__(self, onehot):
        return nn.Dense(self.embed_dim, use_bias=False,
                        name="embeddings")(onehot)


class BigGAN(FlaxModel):
    """User-facing wrapper with the reference's interface
    (``pix2latent/model/biggan.py:15-58``): ``forward(z, c, truncation)`` and
    ``get_class_embedding(int | one-hot)``.
    """

    def __init__(self, model_version: str = "biggan-deep-256", params=None,
                 pretrained_path: Optional[str] = None,
                 dtype: Any = jnp.float32, seed: int = 0,
                 remat: bool = False, remat_from_res: int = 0,
                 channel_width: int = CHANNEL_WIDTH):
        assert model_version in BIGGAN_CONFIGS, model_version
        self.model_version = model_version
        module = BigGANDeepGenerator(model_version=model_version, dtype=dtype,
                                     channel_width=channel_width,
                                     remat=remat,
                                     remat_from_res=remat_from_res)
        embed_module = ClassEmbeddings()

        if params is None and pretrained_path \
                and str(pretrained_path).endswith(".npz"):
            # scripts/convert.py output — no torch needed at load time
            from pix2latent_tpu.utils.params_io import load_params_npz
            params = load_params_npz(pretrained_path)
        if params is not None:
            gen_params = params["generator"]
            emb_params = params["embeddings"]
        elif pretrained_path:
            import torch
            sd = torch.load(pretrained_path, map_location="cpu")
            full = convert_torch_biggan(sd, model_version)
            gen_params, emb_params = full["generator"], full["embeddings"]
        else:
            warnings.warn(
                "BigGAN: no pretrained weights — deterministic random init "
                "(zero-egress fallback). Use convert_torch_biggan for the "
                "real checkpoint.", stacklevel=2)
            # shape-only init (jax.eval_shape traces abstractly: no device
            # compile/execution — constructing the 256 model is instant)
            z = jnp.zeros((1, Z_DIM))
            c = jnp.zeros((1, EMBED_DIM))
            gen_shapes = jax.eval_shape(
                lambda k: module.init(k, z, c, 1.0), jax.random.PRNGKey(0))
            gen_params = _random_leaves(gen_shapes["params"], seed)
            gen_params = _derandomize_bn_stats(gen_params)
            emb_shapes = jax.eval_shape(
                lambda k: embed_module.init(k, jnp.zeros((1, 1000))),
                jax.random.PRNGKey(0))
            emb_params = _random_leaves(emb_shapes["params"], seed + 1)

        super().__init__(module, gen_params)
        self._embed = FlaxModel(embed_module, emb_params)
        self.im_res = BIGGAN_CONFIGS[model_version]["output_dim"]

    def get_class_embedding(self, cls):
        """int class index or one-hot [n, 1000] -> embedding [n, 128]
        (reference ``biggan.py:37-47``)."""
        if isinstance(cls, (int, np.integer)):
            onehot = jnp.zeros((1, 1000), jnp.float32).at[:, int(cls)].set(1.0)
        else:
            onehot = jnp.asarray(cls, jnp.float32)
            assert onehot.ndim == 2, "expected one-hot [n, 1000]"
        return self._embed(onehot=onehot)

    def apply(self, params, z=None, c=None, truncation=1.0):
        assert 0 < truncation <= 1
        assert z.ndim == 2, "expected z to be 2D"
        assert c.ndim == 2 and c.shape[1] == EMBED_DIM, (
            f"expected c of shape (?, {EMBED_DIM}) but got {c.shape}")
        return self.module.apply({"params": params}, z, c, truncation)


def _random_leaves(shape_tree, seed):
    """Fill a ShapeDtypeStruct tree with deterministic ~N(0, 0.02^2) values
    (host RNG; avoids compiling flax initializers for the fallback path)."""
    rng = np.random.RandomState(seed)

    def make(leaf):
        arr = np.asarray(rng.randn(*leaf.shape), np.float32) * 0.02
        return jnp.asarray(arr, dtype=leaf.dtype)
    return jax.tree.map(make, shape_tree)


def _derandomize_bn_stats(params):
    """Random-init fallback: make standing stats sane (mean 0 / var 1) so the
    forward is numerically stable at any truncation."""
    def fix(path, leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if name.endswith("running_means"):
            return jnp.zeros_like(leaf)
        if name.endswith("running_vars"):
            return jnp.ones_like(leaf)
        return leaf
    return jax.tree_util.tree_map_with_path(fix, params)


# --------------------------------------------------------------------- #
# weight conversion                                                      #
# --------------------------------------------------------------------- #

def _sn_effective_weight(sd, prefix):
    """Bake spectral norm: W_eff = W_orig / (u^T W v), mirroring what torch's
    spectral_norm computes at eval (and what the reference's
    remove_spectral_norm leaves behind)."""
    import numpy as np
    w_key = f"{prefix}.weight_orig"
    if w_key not in sd:
        return np.asarray(sd[f"{prefix}.weight"], np.float32)
    w = np.asarray(sd[w_key], np.float32)
    u = np.asarray(sd[f"{prefix}.weight_u"], np.float32)
    w_mat = w.reshape(w.shape[0], -1)
    v = w_mat.T @ u
    v = v / max(np.linalg.norm(v), 1e-12)
    u2 = w_mat @ v
    sigma = float(u2 @ u)
    return w / max(sigma, 1e-12)


def convert_torch_biggan(state_dict, model_version="biggan-deep-256"):
    """Map a ``pytorch_pretrained_biggan`` state_dict onto the Flax tree.

    Torch convs are OIHW -> HWIO; torch linears [out, in] -> [in, out];
    spectral norm baked via the stored (u, v) power-iteration vectors.
    """
    sd = {k: v for k, v in state_dict.items()}
    cfg = BIGGAN_CONFIGS[model_version]

    def lin(prefix, transpose=True):
        w = _sn_effective_weight(sd, prefix)
        p = {"kernel": jnp.asarray(w.T if transpose else w)}
        b = sd.get(f"{prefix}.bias")
        if b is not None:
            p["bias"] = jnp.asarray(np.asarray(b, np.float32))
        return p

    def conv(prefix):
        w = _sn_effective_weight(sd, prefix)
        p = {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}
        b = sd.get(f"{prefix}.bias")
        if b is not None:
            p["bias"] = jnp.asarray(np.asarray(b, np.float32))
        return p

    def bn(prefix, conditional=True):
        p = {
            "running_means": jnp.asarray(
                np.asarray(sd[f"{prefix}.running_means"], np.float32)),
            "running_vars": jnp.asarray(
                np.asarray(sd[f"{prefix}.running_vars"], np.float32)),
        }
        if conditional:
            p["scale"] = lin(f"{prefix}.scale")
            p["offset"] = lin(f"{prefix}.offset")
        else:
            p["weight"] = jnp.asarray(
                np.asarray(sd[f"{prefix}.weight"], np.float32))
            p["bias"] = jnp.asarray(
                np.asarray(sd[f"{prefix}.bias"], np.float32))
        return p

    gen = {"gen_z": lin("generator.gen_z")}
    attn_pos = cfg["attention_position"]
    # HF stores blocks (and the attention layer) in generator.layers.<i>;
    # attention occupies one slot in that list.
    t_idx = 0
    for i, (up, in_mult, out_mult) in enumerate(cfg["layers"]):
        if i == attn_pos:
            ap = f"generator.layers.{t_idx}"
            gen[f"attn_{i}"] = {
                "theta": conv(f"{ap}.snconv1x1_theta"),
                "phi": conv(f"{ap}.snconv1x1_phi"),
                "g": conv(f"{ap}.snconv1x1_g"),
                "o_conv": conv(f"{ap}.snconv1x1_o_conv"),
                "gamma": jnp.asarray(
                    np.asarray(sd[f"{ap}.gamma"], np.float32)).reshape(()),
            }
            t_idx += 1
        bp = f"generator.layers.{t_idx}"
        gen[f"block_{i}"] = {
            "bn_0": bn(f"{bp}.bn_0"), "conv_0": conv(f"{bp}.conv_0"),
            "bn_1": bn(f"{bp}.bn_1"), "conv_1": conv(f"{bp}.conv_1"),
            "bn_2": bn(f"{bp}.bn_2"), "conv_2": conv(f"{bp}.conv_2"),
            "bn_3": bn(f"{bp}.bn_3"), "conv_3": conv(f"{bp}.conv_3"),
        }
        t_idx += 1

    gen["bn_out"] = bn("generator.bn", conditional=False)
    gen["conv_to_rgb"] = conv("generator.conv_to_rgb")
    # HF embeddings: plain Linear(1000 -> 128, no bias, no SN)
    emb = {"embeddings": {"kernel": jnp.asarray(
        np.asarray(sd["embeddings.weight"], np.float32).T)}}
    return {"generator": gen, "embeddings": emb}
