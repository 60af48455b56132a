"""Post-hoc editing of a BigGAN inversion result.

TPU-native counterpart of the reference's ``examples/edit_biggan.py``:
class interpolation and GANSpace z-space component walks on a saved
``vars.npy``.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse
import os.path as osp

from examples.common import enable_compilation_cache  # noqa: F401
from pix2latent_tpu.edit import BigGANLatentEditor
from pix2latent_tpu.utils import image


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--var_path", type=str, required=True,
                   help="vars.npy from an inversion run")
    p.add_argument("--edit_class", type=int, default=254,
                   help="class index to interpolate toward")
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--component", type=int, default=0)
    p.add_argument("--sigma", type=float, default=2.0)
    p.add_argument("--num_components", type=int, default=32)
    p.add_argument("--pca_samples", type=int, default=12800,
                   help="samples for GANSpace PCA (reference default 12800)")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--save_dir", type=str, default="./results/edits")
    args = p.parse_args()

    import warnings
    from pix2latent_tpu.models.biggan import BigGAN
    with warnings.catch_warnings():
        if not args.checkpoint:
            warnings.simplefilter("ignore")
        model = BigGAN("biggan-deep-256", pretrained_path=args.checkpoint)

    editor = BigGANLatentEditor(model).load_result(args.var_path)
    if args.pca_samples != 12800 or args.num_components != 32:
        from pix2latent_tpu.edit.ganspace import biggan_components
        editor.components = biggan_components(
            model, editor._c, num_components=args.num_components,
            num_samples=args.pca_samples)

    os.makedirs(args.save_dir, exist_ok=True)
    image.save(osp.join(args.save_dir, "original.jpg"), editor.default())
    image.save(osp.join(args.save_dir, "class_edit.jpg"),
               editor.edit_class(args.edit_class, alpha=args.alpha))
    image.save(osp.join(args.save_dir, "z_edit.jpg"),
               editor.edit_z(args.component, args.sigma))
    print(f"saved edits -> {args.save_dir}")


if __name__ == "__main__":
    main()
