"""One-command checkpoint conversion: torch state_dict -> .npz params.

The day egress exists (or a checkpoint is copied in), real-weight parity is
one command away (VERDICT.md round 2, item 8):

    python scripts/convert.py biggan   G-256.pt      biggan256.npz \
        --model biggan-deep-256
    python scripts/convert.py stylegan2 stylegan2-car-config-f.pt cars.npz \
        --res 512
    python scripts/convert.py lpips    lpips_alex.pt lpips_alex.npz \
        --net alex

then pass the ``.npz`` as ``pretrained_path=`` (no torch needed at load):

    StyleGAN2("cars", pretrained_path="cars.npz")
    BigGAN("biggan-deep-256", pretrained_path="biggan256.npz")
    LPIPS(net="alex", pretrained_path="lpips_alex.npz")

Converters are the golden-validated ones (``tests/test_*_golden.py``);
conversion round-trip covered by ``tests/test_convert_cli.py``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_torch(path):
    import torch
    return torch.load(path, map_location="cpu")


def convert(kind, sd, *, model="biggan-deep-256", res=512, cm=2, net="alex"):
    """Dispatch to the right golden-validated converter. ``sd`` is the raw
    loaded checkpoint object (state_dict or {'g_ema': ...} wrapper)."""
    if kind == "biggan":
        from pix2latent_tpu.models.biggan import convert_torch_biggan
        return convert_torch_biggan(sd, model)
    if kind == "stylegan2":
        from pix2latent_tpu.models.stylegan2 import convert_torch_stylegan2
        if isinstance(sd, dict) and "g_ema" in sd:
            sd = sd["g_ema"]
        return convert_torch_stylegan2(sd, res, cm)
    if kind == "lpips":
        from pix2latent_tpu.losses.lpips import convert_torch_lpips
        return convert_torch_lpips(sd, net=net)
    raise ValueError(kind)


def main(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("kind", choices=["biggan", "stylegan2", "lpips"])
    p.add_argument("checkpoint", help="torch checkpoint (.pt/.pth)")
    p.add_argument("out", help="output .npz path")
    p.add_argument("--model", default="biggan-deep-256",
                   help="biggan: model version")
    p.add_argument("--res", type=int, default=512,
                   help="stylegan2: image resolution (512 cars / 1024 ffhq)")
    p.add_argument("--cm", type=int, default=2,
                   help="stylegan2: channel multiplier")
    p.add_argument("--net", default="alex",
                   choices=["alex", "vgg16", "squeeze"],
                   help="lpips: backbone")
    args = p.parse_args(argv)

    from pix2latent_tpu.utils.params_io import save_params_npz

    sd = _load_torch(args.checkpoint)
    params = convert(args.kind, sd, model=args.model, res=args.res,
                     cm=args.cm, net=args.net)
    report = save_params_npz(args.out, params)
    total = 0
    for key in sorted(report):
        shape = report[key]
        n = int(1 if not shape else __import__("math").prod(shape))
        total += n
        print(f"  {key:70s} {str(tuple(shape)):20s}")
    print(f"wrote {args.out}: {len(report)} arrays, "
          f"{total / 1e6:.2f}M parameters")


if __name__ == "__main__":
    main()
