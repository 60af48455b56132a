"""StyleGAN2 generator in Flax (NHWC, TPU-native).

The reference clones rosinality/stylegan2-pytorch at import time (compiling
its CUDA ``upfirdn2d``/``fused_bias_act`` ops) and gdown's converted NVlabs
checkpoints (``pix2latent/model/stylegan2.py:12-62``). This is a from-scratch
Flax implementation of the same architecture (Karras et al., "Analyzing and
Improving the Image Quality of StyleGAN", arXiv:1912.04958, config-f):

- 8-layer mapping network (equalized linear, lr_mul 0.01, pixel-norm input);
- skip-architecture synthesis: modulated 3x3 convs with weight demodulation,
  FIR-blurred transpose-conv upsampling, per-layer noise, 1x1 ToRGB taps
  accumulated through FIR-upsampled skips;
- equalized learning-rate scaling applied at runtime (so converted rosinality
  weights drop in unchanged).

Modulated convolution uses the input-scaling formulation: conv(x * s) scaled
by the demodulation factor computed from (W, s) — mathematically identical to
materializing per-sample weights but keeps one shared conv per layer, which
is what the TPU MXU wants (no grouped per-sample kernels).

CUDA kernels are replaced by ``pix2latent_tpu.ops.upfirdn2d`` (XLA conv
formulation). Without the checkpoint, weights are deterministic random
(zero-egress fallback); ``convert_torch_stylegan2`` maps a rosinality
``g_ema`` state_dict.
"""

from __future__ import annotations

import math
import warnings
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pix2latent_tpu.models.base import FlaxModel
from pix2latent_tpu.ops.upfirdn2d import (Blur, Upsample, fused_leaky_relu,
                                          make_kernel, upfirdn2d)

BLUR_KERNEL = (1, 3, 3, 1)


def pack_pairs(x):
    """[n,H,W,c] -> [n//2,H,W,2c]: member i in channels [:c], member
    i + n//2 in [c:]. Thin-channel (c<=64) bf16 tensors fill only half the
    128-lane registers (2x HBM padding, the measured StyleGAN2-cars
    ceiling — BASELINE.md round 3); packing two population members into
    channels restores full lanes, and the frozen shared-weight convs stay
    exact via block-diagonal kernels (full-width MXU contractions,
    ``scripts/bench_packed_pairs.py``).

    Members pair as (i, i+n//2) — NOT adjacent (2i, 2i+1) — so the pack is
    a channel concat of two contiguous batch halves (a lane-fill XLA can
    fuse) rather than a pair-interleave transpose, which the TPU profile
    showed spawning cascading full-tensor layout copies (~18 ms/step on
    cars-512). Any fixed pairing is valid: members are independent."""
    n = x.shape[0]
    return jnp.concatenate([x[: n // 2], x[n // 2:]], axis=-1)


def unpack_pairs(y):
    """Inverse of :func:`pack_pairs` (restores original member order)."""
    c = y.shape[-1] // 2
    return jnp.concatenate([y[..., :c], y[..., c:]], axis=0)


def pack_rows(s):
    """Per-sample row vectors [n,c] -> [n//2,2c] with :func:`pack_pairs`'s
    (i, i+n//2) pairing — styles/demod factors for the packed channel dim."""
    n = s.shape[0]
    return jnp.concatenate([s[: n // 2], s[n // 2:]], axis=-1)


def _blkdiag2(w):
    """[k,k,i,o] -> [k,k,2i,2o] block-diagonal blkdiag(w, w): the packed
    pair's shared-weight conv as ONE dense conv — 2x the FLOPs of the
    logical op but a 2i-wide contraction at full MXU width instead of a
    quarter-utilized i x o tile (the MXU shape binds for thin channels,
    not FLOPs)."""
    z = jnp.zeros_like(w)
    return jnp.concatenate([jnp.concatenate([w, z], 3),
                            jnp.concatenate([z, w], 3)], axis=2)


def channels_for(res: int, channel_multiplier: int = 2):
    """rosinality channel map (model.py Generator.channels)."""
    return {
        4: 512, 8: 512, 16: 512, 32: 512,
        64: 256 * channel_multiplier,
        128: 128 * channel_multiplier,
        256: 64 * channel_multiplier,
        512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }[res]


def pixel_norm(x, eps=1e-8):
    return x * jax.lax.rsqrt(jnp.mean(x ** 2, axis=-1, keepdims=True) + eps)


class EqualLinear(nn.Module):
    """Equalized-lr linear: runtime scale 1/sqrt(fan_in) * lr_mul."""
    features: int
    lr_mul: float = 1.0
    use_bias: bool = True
    bias_init: float = 0.0
    activation: bool = False   # fused leaky relu
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        weight = self.param(
            "weight",
            lambda k, s: jax.random.normal(k, s) / self.lr_mul,
            (in_dim, self.features))
        scale = (1.0 / math.sqrt(in_dim)) * self.lr_mul
        out = x.astype(self.dtype) @ (weight * scale).astype(self.dtype)
        bias = None
        if self.use_bias:
            bias = (self.param(
                "bias", nn.initializers.constant(self.bias_init),
                (self.features,)) * self.lr_mul).astype(self.dtype)
        if self.activation:
            return fused_leaky_relu(out, bias)
        return out if bias is None else out + bias


class ModulatedConv(nn.Module):
    """Weight-(de)modulated conv via input scaling (exact reformulation).

    Weight stored [kh, kw, in, out] with equalized-lr runtime scale
    1/sqrt(in*kh*kw). ``up=True`` runs the transpose-conv + FIR-blur pair.
    """
    out_ch: int
    kernel_size: int = 3
    demodulate: bool = True
    up: bool = False
    dtype: Any = jnp.float32
    # route the modulation backward through the fused Pallas kernel
    # (ops/mod_backward.py): one pass over the conv input-gradient emits
    # both g_x and the per-channel style grad g_s
    fused_mod_bwd: bool = False
    # population-pair channel packing: x is [n/2, H, W, 2*in_ch] (see
    # pack_pairs) and the shared conv runs as ONE dense block-diagonal
    # kernel at full MXU width. Params are identical to the unpacked form.
    packed: bool = False

    @nn.compact
    def __call__(self, x, style):
        k = self.kernel_size
        n = style.shape[0]
        in_ch = x.shape[-1] // (2 if self.packed else 1)
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (k, k, in_ch, self.out_ch))
        scale = 1.0 / math.sqrt(in_ch * k * k)
        # style head: EqualLinear(512 -> in_ch) with bias initialized to 1
        # (rosinality's bias_init=1 convention; converted biases drop in)
        s = EqualLinear(in_ch, bias_init=1.0, dtype=self.dtype,
                        name="modulation")(style)

        w = (weight * scale).astype(self.dtype)              # [k,k,i,o]
        if self.packed:
            assert not self.fused_mod_bwd, \
                "fused_mod_bwd and pack_pairs are mutually exclusive opt-ins"
            s_eff = pack_rows(s)                             # half blocks
            w_eff = _blkdiag2(w)                             # [k,k,2i,2o]
            x_mod = x.astype(self.dtype) * s_eff[:, None, None, :]
        elif self.fused_mod_bwd:
            # import gated on the opt-in flag: ops/mod_backward pulls in
            # pallas at module scope, which must not become a hard
            # dependency of the default (plain-XLA) forward
            from pix2latent_tpu.ops.mod_backward import modulate
            w_eff = w
            x_mod = modulate(x.astype(self.dtype), s, fused=True)
        else:
            w_eff = w
            x_mod = x.astype(self.dtype) * s[:, None, None, :]

        if self.up:
            # conv_transpose(stride 2, VALID) == dilated conv with flipped,
            # io-swapped kernel
            rhs = jnp.flip(w_eff, axis=(0, 1))               # [k,k,i,o]
            y = jax.lax.conv_general_dilated(
                x_mod, rhs,
                window_strides=(1, 1),
                padding=((k - 1, k - 1), (k - 1, k - 1)),
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            p = len(BLUR_KERNEL) - 2 - (k - 1)
            blur = Blur(BLUR_KERNEL,
                        pad=((p + 1) // 2 + 1, p // 2 + 1),
                        upsample_factor=2)
            y = blur(y)
        else:
            pad = k // 2
            y = jax.lax.conv_general_dilated(
                x_mod, w_eff, (1, 1), ((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        if self.demodulate:
            # d[n,o] = rsqrt( sum_{k,k,i} (w_kkio * s_ni)^2 + eps ) — f32
            w32 = w.astype(jnp.float32)
            s32 = s.astype(jnp.float32)
            w2 = jnp.sum(w32 ** 2, axis=(0, 1))              # [i,o]
            d = jax.lax.rsqrt((s32 ** 2) @ w2 + 1e-8)        # [n,o]
            if self.packed:
                d = pack_rows(d)
            y = y * d[:, None, None, :].astype(y.dtype)
        return y


class NoiseInjection(nn.Module):
    packed: bool = False

    @nn.compact
    def __call__(self, x, noise):
        w = self.param("weight", nn.initializers.zeros, ())
        if self.packed and noise.shape[0] > 1:
            # per-sample noise [n,H,W,1] must land on its member's channel
            # block: view x as [n/2,H,W,2,c] (a bitcast — 2c is contiguous)
            # and broadcast the half-paired noise [n/2,H,W,2,1]; slicing
            # batch halves fuses — no transpose
            n2, h, ww, c2 = x.shape
            noise_p = jnp.stack([noise[:n2, ..., 0], noise[n2:, ..., 0]],
                                axis=-1)
            y = x.reshape(n2, h, ww, 2, c2 // 2) \
                + w * noise_p[..., None].astype(x.dtype)
            return y.reshape(n2, h, ww, c2)
        # shared buffer [1,H,W,1] broadcasts identically over both members
        return x + w * noise.astype(x.dtype)


class StyledConv(nn.Module):
    out_ch: int
    kernel_size: int = 3
    up: bool = False
    dtype: Any = jnp.float32
    fused_mod_bwd: bool = False
    packed: bool = False

    @nn.compact
    def __call__(self, x, style, noise):
        # the generator skips the pack transpose for single-sample probes
        # (param init); detect by shape so the modules run their unpacked
        # twins — params are identical either way
        packed = self.packed and x.shape[0] != style.shape[0]
        y = ModulatedConv(self.out_ch, self.kernel_size, up=self.up,
                          dtype=self.dtype, name="conv",
                          fused_mod_bwd=self.fused_mod_bwd,
                          packed=packed)(x, style)
        y = NoiseInjection(name="noise", packed=packed)(y, noise)
        bias = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        if packed:
            bias = jnp.tile(bias, 2)
        return fused_leaky_relu(y, bias)


class ToRGB(nn.Module):
    upsample: bool = True
    dtype: Any = jnp.float32
    fused_mod_bwd: bool = False
    packed: bool = False

    @nn.compact
    def __call__(self, x, style, skip=None):
        packed = self.packed and x.shape[0] != style.shape[0]
        y = ModulatedConv(3, 1, demodulate=False, dtype=self.dtype,
                          name="conv",
                          fused_mod_bwd=self.fused_mod_bwd,
                          packed=packed)(x, style)
        if packed:
            # RGB taps are 3-channel — nothing to gain from packed layout
            # downstream, and the skip accumulation is unpacked
            y = unpack_pairs(y)
        bias = self.param("bias", nn.initializers.zeros, (3,))
        # RGB accumulation in f32 (skip-sum across all resolutions)
        y = y.astype(jnp.float32) + bias
        if skip is not None:
            if self.upsample:
                skip = Upsample(BLUR_KERNEL)(skip)
            y = y + skip
        return y


class StyleGAN2Generator(nn.Module):
    """Synthesis + mapping. ``__call__`` mirrors rosinality's Generator
    forward for the two paths the reference uses: z-space (mapped through the
    style MLP) and w-space with explicit noise."""
    im_res: int = 512
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    dtype: Any = jnp.float32
    # remat (recompute-in-backward) for synthesis blocks at/above this
    # resolution; 0 disables. FFHQ-1024 x pop-22 needs it to fit one chip
    # (SURVEY.md hard part f).
    remat_from_res: int = 0
    # fused Pallas modulation backward (ops/mod_backward.py) for all
    # modulated convs — opt-in, measured before defaulting
    fused_mod_bwd: bool = False
    # population-pair channel packing for thin-channel blocks (<= this
    # many channels; 0 disables): two population members share the channel
    # dim so bf16 res>=512 tensors fill all 128 lanes, and the shared
    # convs run as dense block-diagonal kernels at full MXU width.
    # Requires an even population. Opt-in, measured before defaulting.
    pack_pairs_max_ch: int = 0

    @property
    def log_size(self):
        return int(math.log2(self.im_res))

    @property
    def num_layers(self):
        return (self.log_size - 2) * 2 + 1

    @property
    def n_latent(self):
        return self.log_size * 2 - 2

    def noise_shapes(self):
        shapes = []
        for i in range(self.num_layers):
            res = 2 ** ((i + 5) // 2)
            shapes.append((1, res, res, 1))
        return shapes

    def setup(self):
        cm = self.channel_multiplier
        self.style_mlp = [
            EqualLinear(self.style_dim, lr_mul=0.01, activation=True,
                        dtype=self.dtype, name=f"style_{i}")
            for i in range(self.n_mlp)]
        self.noise_buffers = [
            self.param(f"noise_{i}", nn.initializers.normal(1.0), shape)
            for i, shape in enumerate(self.noise_shapes())]
        self.const_input = self.param(
            "input", nn.initializers.normal(1.0),
            (1, 4, 4, channels_for(4, cm)))
        self.conv1 = StyledConv(channels_for(4, cm), dtype=self.dtype,
                                name="conv1",
                                fused_mod_bwd=self.fused_mod_bwd)
        self.to_rgb1 = ToRGB(upsample=False, dtype=self.dtype,
                             name="to_rgb1",
                             fused_mod_bwd=self.fused_mod_bwd)
        convs, to_rgbs = [], []
        for li in range(self.log_size - 2):
            res = 2 ** (li + 3)
            ch = channels_for(res, cm)
            use_remat = self.remat_from_res and res >= self.remat_from_res
            conv_cls = nn.remat(StyledConv) if use_remat else StyledConv
            rgb_cls = nn.remat(ToRGB) if use_remat else ToRGB
            # whole blocks pack — the boundary sits at the block ENTRY,
            # before the up-conv. A "principled" variant that kept the
            # up-conv unpacked when its input is lane-full (blkdiag doubles
            # its FLOPs for no lane win) measured FAR worse on the real
            # chip: the mid-block boundary spawns full-tensor layout copies
            # that dwarf the FLOPs. cars-512 bf16 A/B (img/s): unpacked
            # 225.4 | entry+halves 219.4 | entry+interleave 205.9 |
            # mid+halves 157.6 | mid+interleave 156.1 (BASELINE.md round 3)
            pk = bool(self.pack_pairs_max_ch) and ch <= self.pack_pairs_max_ch
            convs.append(conv_cls(ch, up=True, dtype=self.dtype,
                                  name=f"convs_{2 * li}",
                                  fused_mod_bwd=self.fused_mod_bwd,
                                  packed=pk))
            convs.append(conv_cls(ch, dtype=self.dtype,
                                  name=f"convs_{2 * li + 1}",
                                  fused_mod_bwd=self.fused_mod_bwd,
                                  packed=pk))
            to_rgbs.append(rgb_cls(dtype=self.dtype, name=f"to_rgbs_{li}",
                                   fused_mod_bwd=self.fused_mod_bwd,
                                   packed=pk))
        self.convs = convs
        self.to_rgbs = to_rgbs

    def style(self, z):
        """Mapping network only: z -> w."""
        h = pixel_norm(z)
        for layer in self.style_mlp:
            h = layer(h)
        return h

    def __call__(self, z, noises=None, input_is_latent=False):
        w = z if input_is_latent else self.style(z)
        if noises is None:
            noises = self.noise_buffers

        n = z.shape[0]
        x = jnp.broadcast_to(self.const_input,
                             (n, *self.const_input.shape[1:]))

        x = self.conv1(x, w, noises[0])
        skip = self.to_rgb1(x, w)

        noise_i = 1
        packed = False

        def maybe_pack(x, mod, packed):
            # one halves-concat at the first packed layer (the transition
            # block's entry); single-sample probes (param init / shape
            # inference) skip it and the modules detect the unpacked
            # shape and run their unpacked twins (identical params)
            if mod.packed and not packed and n > 1:
                assert n % 2 == 0, (
                    f"pack_pairs requires an even population, got {n}")
                return pack_pairs(x), True
            return x, packed

        for li in range(self.log_size - 2):
            x, packed = maybe_pack(x, self.convs[2 * li], packed)
            x = self.convs[2 * li](x, w, noises[noise_i])
            x, packed = maybe_pack(x, self.convs[2 * li + 1], packed)
            x = self.convs[2 * li + 1](x, w, noises[noise_i + 1])
            skip = self.to_rgbs[li](x, w, skip)
            noise_i += 2

        return skip


class StyleGAN2(FlaxModel):
    """User-facing wrapper with the reference's interface
    (``pix2latent/model/stylegan2.py:66-138``): ``search='z'`` runs the full
    net; ``search='w+'`` takes a w latent plus a flattened noise vector
    (``reshape_noise``). Output clamped to [-1, 1] like the reference.
    """

    MODELS = {"cars": 512, "ffhq": 1024}

    def __init__(self, model: str = "cars", search: str = "z", params=None,
                 pretrained_path: Optional[str] = None, seed: int = 0,
                 channel_multiplier: int = 2, dtype: Any = jnp.float32,
                 remat_from_res: int = 0, fused_mod_bwd: bool = False,
                 pack_pairs_max_ch: int = 0):
        assert model in self.MODELS, model
        assert search in ("z", "w+"), search
        self.im_res = self.MODELS[model]
        self.search = search
        module = StyleGAN2Generator(im_res=self.im_res,
                                    channel_multiplier=channel_multiplier,
                                    dtype=dtype,
                                    remat_from_res=remat_from_res,
                                    fused_mod_bwd=fused_mod_bwd,
                                    pack_pairs_max_ch=pack_pairs_max_ch)

        if params is None and pretrained_path \
                and str(pretrained_path).endswith(".npz"):
            # scripts/convert.py output — no torch needed at load time
            from pix2latent_tpu.utils.params_io import load_params_npz
            params = load_params_npz(pretrained_path)
        elif params is None and pretrained_path:
            import torch
            ckpt = torch.load(pretrained_path, map_location="cpu")
            sd = ckpt.get("g_ema", ckpt)
            params = convert_torch_stylegan2(sd, self.im_res,
                                             channel_multiplier)
        if params is None:
            warnings.warn(
                "StyleGAN2: no pretrained weights — deterministic random "
                "init (zero-egress fallback). Use convert_torch_stylegan2 "
                "for the real checkpoint.", stacklevel=2)
            shapes = jax.eval_shape(
                lambda k: module.init(k, jnp.zeros((1, 512))),
                jax.random.PRNGKey(0))
            rng = np.random.RandomState(seed)
            params = jax.tree.map(
                lambda l: jnp.asarray(
                    np.asarray(rng.randn(*l.shape), np.float32)
                    * (0.1 if l.ndim else 0.0), l.dtype),
                shapes)["params"]

        super().__init__(module, params)

        self.noise_shape = [list(s) for s in module.noise_shapes()]
        self._mean_latent_cache = None

    # -- latent statistics (reference stylegan2.py:93-104) ----------------- #

    def mean_latent(self, n_sample=4096, key=None):
        if self._mean_latent_cache is None:
            key = key or jax.random.PRNGKey(0)
            z = jax.random.normal(key, (n_sample, 512))
            w = self.module.apply({"params": self.params}, z,
                                  method=StyleGAN2Generator.style)
            # f32 statistics even under bf16 compute: summing millions of
            # bf16 values loses the tail, and downstream search sigmas are
            # derived from these numbers
            self._mean_latent_cache = jnp.mean(
                w.astype(jnp.float32), axis=0, keepdims=True)
        return self._mean_latent_cache

    def latent_stats(self, n_sample=4096, key=None):
        key = key or jax.random.PRNGKey(0)
        z = jax.random.normal(key, (n_sample, 512))
        w = self.module.apply({"params": self.params}, z,
                              method=StyleGAN2Generator.style
                              ).astype(jnp.float32)
        mean = jnp.mean(w, axis=0)
        std = jnp.sqrt(jnp.sum((w - mean) ** 2) / n_sample)
        return mean, std

    # -- forward paths ------------------------------------------------------ #

    def apply(self, params, z=None, noises=None, truncation=1.0):
        if self.search == "w+":
            return self._forward_w(params, z, noises)
        return self._forward_z(params, z)

    def _forward_z(self, params, z):
        out = self.module.apply({"params": params}, z)
        return jnp.clip(out, -1.0, 1.0)

    def _forward_w(self, params, z, noises):
        noise_list = self.reshape_noise(noises)
        out = self.module.apply({"params": params}, z, noises=noise_list,
                                input_is_latent=True)
        return jnp.clip(out, -1.0, 1.0)

    def reshape_noise(self, z):
        """Flattened per-layer noise vector -> list of [N,1,H,W]-style NHWC
        noise maps (reference ``stylegan2.py:128-138``)."""
        st = 0
        noises = []
        for d in self.noise_shape:
            h, w = d[1], d[2]
            en = st + h * w
            noises.append(z[:, st:en].reshape(-1, h, w, 1))
            st = en
        assert z.shape[1] == en, (z.shape, en)
        return noises

    def noise_dim(self):
        return sum(d[1] * d[2] for d in self.noise_shape)


# --------------------------------------------------------------------- #
# weight conversion (rosinality g_ema state_dict)                        #
# --------------------------------------------------------------------- #

def convert_torch_stylegan2(sd, im_res=512, channel_multiplier=2):
    """Torch layouts: linear [out,in] -> [in,out]; conv [out,in,kh,kw] ->
    HWIO; modulated conv stores weight [1,out,in,k,k]. Noise buffers
    ``noises.noise_i`` [1,1,H,W] -> NHWC."""
    import numpy as np

    def t2j(v):
        return jnp.asarray(np.asarray(v, np.float32))

    def eq_linear(prefix):
        p = {"weight": t2j(sd[f"{prefix}.weight"]).T}
        if f"{prefix}.bias" in sd:
            p["bias"] = t2j(sd[f"{prefix}.bias"])
        return p

    def mod_conv(prefix):
        w = np.asarray(sd[f"{prefix}.weight"], np.float32)  # [1,o,i,k,k]
        w = w[0].transpose(2, 3, 1, 0)                      # -> [k,k,i,o]
        return {"weight": jnp.asarray(w),
                "modulation": eq_linear(f"{prefix}.modulation")}

    params = {}
    for i in range(8):
        params[f"style_{i}"] = eq_linear(f"style.{i + 1}")
    params["input"] = t2j(sd["input.input"]).transpose(0, 2, 3, 1)

    def styled_conv(dst, src):
        params[dst] = {
            "conv": mod_conv(f"{src}.conv"),
            "noise": {"weight": t2j(sd[f"{src}.noise.weight"]).reshape(())},
            "bias": t2j(sd[f"{src}.activate.bias"]),
        }

    def to_rgb(dst, src):
        params[dst] = {
            "conv": mod_conv(f"{src}.conv"),
            "bias": t2j(sd[f"{src}.bias"]).reshape(-1),
        }

    styled_conv("conv1", "conv1")
    to_rgb("to_rgb1", "to_rgb1")

    log_size = int(math.log2(im_res))
    for li in range(log_size - 2):
        styled_conv(f"convs_{2 * li}", f"convs.{2 * li}")
        styled_conv(f"convs_{2 * li + 1}", f"convs.{2 * li + 1}")
        to_rgb(f"to_rgbs_{li}", f"to_rgbs.{li}")

    num_layers = (log_size - 2) * 2 + 1
    for i in range(num_layers):
        params[f"noise_{i}"] = t2j(
            sd[f"noises.noise_{i}"]).transpose(0, 2, 3, 1)
    return params
