"""Result bundle saver.

Working version of the reference's stale ``pix2latent/utils/project_utils.py``
(its imports were broken — SURVEY.md §2 #27): writes the trajectory video,
per-sample jpgs of the best samples, and the loss curves for one inversion
run.
"""

from __future__ import annotations

import os
import os.path as osp

import numpy as np

from pix2latent_tpu.utils import image, video
from pix2latent_tpu.variables import save_variables


def save_result(save_dir, variables, outs, losses, out_images=None,
                make_video=False, best_metric="loss"):
    """Args:
        save_dir: output directory (created).
        variables: final Variables pytree.
        outs: collage frames (log mode) or [final collage].
        losses: [(iter, {metric: per-sample array})].
        out_images: optional [pop, H, W, 3] final per-sample outputs; saves
            the best sample separately.
    """
    os.makedirs(save_dir, exist_ok=True)

    final = losses[-1][1]
    loss = np.asarray(final.get(best_metric, list(final.values())[0]))
    save_variables(osp.join(save_dir, "vars.npy"), variables,
                   extras={"loss": loss})
    np.save(osp.join(save_dir, "losses.npy"),
            np.array(losses, dtype=object), allow_pickle=True)

    if outs:
        image.save(osp.join(save_dir, "out.jpg"), outs[-1])
    if make_video and len(outs) > 1:
        video.make_video(osp.join(save_dir, "out.mp4"), outs)
    if out_images is not None:
        best = int(np.argmin(loss.reshape(-1)))
        image.save(osp.join(save_dir, "best.jpg"),
                   np.asarray(out_images[best]))
    return save_dir
