"""Optimization-trajectory video/GIF rendering (host-side).

Counterpart of the reference's ``pix2latent/utils/video.py:14-70``
(imageio GIFs, cv2 webm / skvideo mp4). Uses imageio throughout and cv2 when
available; frames are uint8 HWC or [-1,1] float (auto-converted).
"""

from __future__ import annotations

import numpy as np

from pix2latent_tpu.utils.image import to_image

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def _to_uint8_frames(ims):
    out = []
    for im in ims:
        im = np.asarray(im)
        if im.dtype != np.uint8:
            im = to_image(im)
        out.append(im)
    return out


def make_gif(save_path, ims, duration=0.1):
    """Write frames to a GIF (reference ``video.py:14-18``)."""
    import imageio
    frames = _to_uint8_frames(ims)
    imageio.mimsave(save_path, frames, duration=duration)
    return save_path


def make_video(save_path, ims, fps=30):
    """Write frames to mp4/webm (reference ``video.py:21-70``)."""
    frames = _to_uint8_frames(ims)
    if not frames:
        raise ValueError("no frames to write")

    if save_path.endswith(".webm") and cv2 is not None:
        h, w = frames[0].shape[:2]
        fourcc = cv2.VideoWriter_fourcc(*"VP80")
        writer = cv2.VideoWriter(save_path, fourcc, fps, (w, h))
        for f in frames:
            writer.write(f[:, :, ::-1])
        writer.release()
        return save_path

    import imageio
    try:
        imageio.mimsave(save_path, frames, fps=fps)
    except Exception:
        # ffmpeg may be unavailable: degrade to GIF next to the target path
        alt = save_path.rsplit(".", 1)[0] + ".gif"
        imageio.mimsave(alt, frames, duration=1.0 / fps)
        return alt
    return save_path
