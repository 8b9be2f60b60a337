"""PNG image I/O for render outputs.

Replaces the reference's libpng loader/off-screen resolve (ref:
src/core/image.cpp:22-158, src/app.cpp:166-212): premultiplied-alpha handling,
optional linear -> sRGB encode on write, straight-alpha PNG output.
"""

from __future__ import annotations

import numpy as np


def composite_to_rgb(img, background=None, srgb_encode: bool = False):
    """[H, W, 4] premultiplied RGBA -> [H, W, 3] uint8-ready floats in [0, 1].

    ``background`` (RGB) is composited under the image the way the GL
    framebuffer clear color sits under the blended splats.
    """
    img = np.asarray(img, np.float32)
    rgb = img[..., :3]
    alpha = img[..., 3:4]
    if background is not None:
        bg = np.asarray(background, np.float32).reshape(1, 1, 3)
        rgb = rgb + (1.0 - alpha) * bg
    if srgb_encode:
        rgb = np.where(
            rgb <= 0.0031308,
            rgb * 12.92,
            1.055 * np.power(np.clip(rgb, 1e-12, None), 1.0 / 2.4) - 0.055,
        )
    return np.clip(rgb, 0.0, 1.0)


def save_png(path: str, img, background=(0.0, 0.0, 0.0), srgb_encode: bool = False,
             keep_alpha: bool = False) -> None:
    """Write [H, W, 4] premultiplied RGBA (or [H, W, 3] RGB) to a PNG."""
    from PIL import Image

    img = np.asarray(img, np.float32)
    if img.ndim == 3 and img.shape[-1] == 4 and keep_alpha:
        alpha = np.clip(img[..., 3], 0.0, 1.0)
        # un-premultiply for straight-alpha PNG
        rgb = np.clip(img[..., :3] / np.maximum(alpha[..., None], 1e-6), 0.0, 1.0)
        if srgb_encode:
            rgb = composite_to_rgb(
                np.concatenate([rgb, np.ones_like(alpha)[..., None]], -1),
                srgb_encode=True,
            )
        out = np.concatenate([rgb, alpha[..., None]], axis=-1)
        Image.fromarray((out * 255.0 + 0.5).astype(np.uint8), "RGBA").save(path)
        return
    if img.shape[-1] == 4:
        rgb = composite_to_rgb(img, background=background, srgb_encode=srgb_encode)
    else:
        rgb = np.clip(img, 0.0, 1.0)
    from PIL import Image

    Image.fromarray((rgb * 255.0 + 0.5).astype(np.uint8), "RGB").save(path)


def load_png(path: str, premultiply: bool = True, flip: bool = False) -> np.ndarray:
    """PNG -> [H, W, C] float32 in [0, 1].

    Parity with the reference loader (ref: src/core/image.cpp:104-158):

    - ``premultiply``: images with an alpha channel (RGBA or LA) get their
      color channels multiplied by alpha (ref Image::MultiplyAlpha,
      src/core/image.cpp:128-158) — the renderer composites and fits against
      *premultiplied* RGBA, so PNG targets must enter in the same space.
      No-op for alpha-less images.
    - ``flip``: the reference copies rows bottom-up because GL textures have
      row 0 at the bottom (src/core/image.cpp:110). This framework's images
      are row-0-top throughout, so the default keeps PIL's top-down order;
      pass flip=True for GL-ordered consumers.
    """
    from PIL import Image

    img = np.asarray(Image.open(path), np.float32) / 255.0
    if flip:
        img = img[::-1].copy()
    if premultiply and img.ndim == 3 and img.shape[-1] in (2, 4):
        img = np.concatenate(
            [img[..., :-1] * img[..., -1:], img[..., -1:]], axis=-1
        )
    return img
