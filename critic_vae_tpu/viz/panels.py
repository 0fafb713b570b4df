"""Annotated panel-strip composition (host-side PIL rendering).

Mirrors the reference's frame composer (reference: vae_utility.py:286-322
get_final_frame, :240-254 get_injected_img, :385-390 prepare_rgb_image):
4-panel strips for image eval, 7-panel double-height strips for the video
pipeline (orig / recon@pred / recon@0 / diff / thr-mask / crf / ground
truth) with titles, the critic value, and IoU numbers burned in.

Arrays arrive NHWC float (the TPU-native layout) — no CHW transposes here.
uint8 conversion uses the reference's exact truncating ``(x*255).astype``
expression so rendered strips are pixel-comparable.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from PIL import Image, ImageDraw, ImageFont

_FONT_CANDIDATES = (
    "/usr/share/fonts/truetype/ubuntu/Ubuntu-R.ttf",  # the reference's hardcode (vae_utility.py:18)
    "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
    "/usr/share/fonts/truetype/liberation/LiberationSans-Regular.ttf",
)


def _font(size: int = 10):
    for path in _FONT_CANDIDATES:
        try:
            return ImageFont.truetype(path, size)
        except OSError:
            continue
    return ImageFont.load_default()


FONT = _font()

TITLES = (
    "orig img\n+crit val",
    "crit val\ninjected",
    "crit=0\ninjected",
    "difference\nmask",
    "thr-mask\nthr={thr}",
    "thr-mask +\ncrf",
    "ground\ntruth",
)


def to_uint8_rgb(img: np.ndarray) -> np.ndarray:
    """HWC float → uint8 with the reference's truncating cast
    (vae_utility.py:387) — negatives wrap, as in the reference's numpy."""
    with np.errstate(invalid="ignore", over="ignore"):
        return (np.asarray(img) * 255).astype(np.uint8)


def _as_pil(img: np.ndarray) -> Image.Image:
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = to_uint8_rgb(arr)
    if arr.ndim == 2:
        return Image.fromarray(arr, mode="L").convert("RGB")
    return Image.fromarray(arr, mode="RGB")


def final_frame(
    orig: np.ndarray,
    recon_one: np.ndarray,
    recon_zero: np.ndarray,
    diff_u8: np.ndarray,
    pred: float,
    *,
    gt: Optional[np.ndarray] = None,
    thr_mask: Optional[np.ndarray] = None,
    crf_mask: Optional[np.ndarray] = None,
    thr_iou: Optional[float] = None,
    crf_iou: Optional[float] = None,
    threshold: int = 50,
) -> Image.Image:
    """Compose one annotated strip (reference: get_final_frame).

    All image args are HWC: floats in [0,1]-ish for RGB panels, uint8/bool
    2-D for masks. With masks present → 7 panels, double height, titles row.
    """
    w = orig.shape[1]
    # panel count keys on what exists: masks → 6 panels (+ gt → 7); the
    # 4-panel layout is the image-eval mode (reference get_final_frame's
    # `video` flag, vae_utility.py:286-322). Unlabeled episodes get their
    # mask panels without a gt column.
    with_masks = thr_mask is not None
    n_panels = 4 + (3 if with_masks and gt is not None else 2 if with_masks else 0)
    ih = w if with_masks else 0
    canvas = Image.new("RGB", (w * n_panels, w * 2 if with_masks else w))
    draw = ImageDraw.Draw(canvas)

    canvas.paste(_as_pil(orig), (0, ih))
    canvas.paste(_as_pil(recon_one), (w, ih))
    canvas.paste(_as_pil(recon_zero), (w * 2, ih))
    canvas.paste(_as_pil(diff_u8), (w * 3, ih))
    if with_masks:
        if crf_mask is None:  # threshold-only rendering: empty CRF panel
            crf_mask = np.zeros_like(np.asarray(thr_mask))
        canvas.paste(_as_pil(np.asarray(thr_mask, np.uint8) * 255), (w * 4, ih))
        canvas.paste(_as_pil(np.asarray(crf_mask, np.uint8) * 255), (w * 5, ih))
        if gt is not None:
            canvas.paste(_as_pil(np.asarray(gt, np.uint8) * 255), (w * 6, ih))
        for i, title in enumerate(TITLES[:n_panels]):
            text = title.format(thr=threshold)
            if i == 4 and thr_iou is not None:
                text += f"\niou={thr_iou}"
            elif i == 5 and crf_iou is not None:
                text += f"\niou={crf_iou}"
            draw.text((w * i + 2, 0), text, (255, 255, 255), font=FONT)
    draw.text((2, ih + 2), f"{float(pred):.1f}", (255, 255, 255), font=FONT)
    return canvas


def inject_strip(orig: np.ndarray, recons: Sequence[np.ndarray]) -> Image.Image:
    """Original + K injected reconstructions side by side
    (reference: get_injected_img, vae_utility.py:240-254)."""
    panels = [_as_pil(orig)] + [_as_pil(r) for r in recons]
    w, h = panels[0].size
    strip = Image.new("RGB", (w * len(panels), h))
    for i, p in enumerate(panels):
        strip.paste(p, (w * i, 0))
    return strip
