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
    p.add_argument("--var_path", type=str, default=None,
                   help="vars.npy from an inversion run (required unless "
                        "--smoke)")
    p.add_argument("--smoke", action="store_true",
                   help="offline sanity run: synthesizes a fake inversion "
                        "result, uses a 128px generator and a tiny PCA")
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
    if not args.smoke and args.var_path is None:
        p.error("--var_path is required (or pass --smoke)")

    import warnings
    version = "biggan-deep-128" if args.smoke else "biggan-deep-256"
    from pix2latent_tpu.models.biggan import BigGAN
    with warnings.catch_warnings():
        if not args.checkpoint:
            warnings.simplefilter("ignore")
        model = BigGAN(version, pretrained_path=args.checkpoint)

    if args.smoke and args.var_path is None:
        # synthesize a plausible inversion result to edit
        import numpy as np
        from pix2latent_tpu.variables import save_variables
        rng = np.random.RandomState(0)
        variables = {"input": {
            "z": rng.randn(4, 128).astype(np.float32),
            "c": np.broadcast_to(
                np.asarray(model.get_class_embedding(153)),
                (4, 128)).astype(np.float32)}}
        args.var_path = osp.join(args.save_dir, "smoke_vars.npy")
        os.makedirs(args.save_dir, exist_ok=True)
        save_variables(args.var_path,
                       variables, extras={"loss": rng.rand(4)})
        args.pca_samples, args.num_components = 256, 4
        args.component = min(args.component, 3)

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
