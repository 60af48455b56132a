"""One-command conversion CLI round-trip (VERDICT.md round 2, item 8).

``scripts/convert.py`` turns a torch checkpoint into a self-describing
``.npz``; the model wrappers load the ``.npz`` via ``pretrained_path=``
without torch. The round-trip is validated against the golden tests'
synthetic state_dicts: CLI-converted-and-reloaded params must be leaf-for-
leaf identical to the direct converter output, and the wrapper loaded from
the .npz must produce the same forward as the wrapper built from params.
"""

import importlib.util
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pix2latent_tpu.utils.params_io import load_params_npz, save_params_npz

_SPEC = importlib.util.spec_from_file_location(
    "convert_cli",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "convert.py"))
convert_cli = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(convert_cli)


def _trees_equal(a, b, path=""):
    assert isinstance(a, dict) == isinstance(b, dict), path
    if isinstance(a, dict):
        assert sorted(a) == sorted(b), (path, sorted(a), sorted(b))
        for k in a:
            _trees_equal(a[k], b[k], f"{path}/{k}")
        return
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                  err_msg=path)


class TestParamsIO:
    def test_flatten_roundtrip(self, tmp_path):
        tree = {"a": {"b": np.arange(6.0).reshape(2, 3),
                      "c": np.float32(1.5)},
                "d": np.ones((4,), np.int32)}
        path = str(tmp_path / "t.npz")
        report = save_params_npz(path, tree)
        assert report["a/b"] == (2, 3)
        _trees_equal(load_params_npz(path), tree)


class TestConvertCLI:
    def test_stylegan2_roundtrip(self, tmp_path):
        from tests.test_stylegan2_golden import make_state_dict
        from pix2latent_tpu.models.stylegan2 import (StyleGAN2Generator,
                                                     convert_torch_stylegan2)

        rng = np.random.RandomState(0)
        im_res = 16
        sd = make_state_dict(rng, im_res)
        ckpt = str(tmp_path / "g.pt")
        torch.save({"g_ema": sd}, ckpt)
        out = str(tmp_path / "g.npz")
        convert_cli.main(["stylegan2", ckpt, out, "--res", str(im_res)])

        direct = convert_torch_stylegan2(sd, im_res=im_res)
        _trees_equal(load_params_npz(out), direct)

        # wrapper forward from the .npz == forward from direct params
        gen = StyleGAN2Generator(im_res=im_res)
        z = jnp.asarray(rng.randn(2, 512).astype(np.float32))
        want = gen.apply({"params": direct}, z)
        got = gen.apply({"params": load_params_npz(out)}, z)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_biggan_roundtrip(self, tmp_path):
        from tests.test_biggan_golden import make_state_dict
        from pix2latent_tpu.models.biggan import (BigGAN,
                                                  convert_torch_biggan)

        rng = np.random.RandomState(0)
        version, ch = "biggan-deep-128", 8
        sd = make_state_dict(rng, version, ch)
        ckpt = str(tmp_path / "G.pt")
        torch.save(sd, ckpt)
        out = str(tmp_path / "G.npz")
        convert_cli.main(["biggan", ckpt, out, "--model", version])

        direct = convert_torch_biggan(sd, version)
        _trees_equal(load_params_npz(out), direct)

        model = BigGAN(version, pretrained_path=out, channel_width=ch)
        ref = BigGAN(version, params=direct, channel_width=ch)
        z = jnp.asarray(rng.randn(2, 128).astype(np.float32) * 0.5)
        c = model.get_class_embedding(153)
        c = jnp.broadcast_to(c, (2, 128))
        np.testing.assert_array_equal(
            np.asarray(model(z=z, c=c)), np.asarray(ref(z=z, c=c)))

    def test_lpips_roundtrip(self, tmp_path):
        from tests.test_lpips_golden import make_alex_state_dict
        from pix2latent_tpu.losses.lpips import (LPIPS,
                                                 convert_torch_lpips)

        rng = np.random.RandomState(0)
        sd = make_alex_state_dict(rng)
        ckpt = str(tmp_path / "lpips.pt")
        torch.save(sd, ckpt)
        out = str(tmp_path / "lpips.npz")
        convert_cli.main(["lpips", ckpt, out, "--net", "alex"])

        direct = convert_torch_lpips(sd, net="alex")
        _trees_equal(load_params_npz(out), direct)

        m1 = LPIPS(net="alex", pretrained_path=out)
        m2 = LPIPS(net="alex", params=direct)
        x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1)
        y = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1)
        np.testing.assert_array_equal(np.asarray(m1(x, y)),
                                      np.asarray(m2(x, y)))
