"""GIF episode writer (reference: create_video, vae_utility.py:85-104)."""

from __future__ import annotations

import os
from io import BytesIO
from typing import Sequence

from PIL import Image


def write_gif(
    frames: Sequence[Image.Image],
    out_path: str,
    duration_ms: int = 100,
) -> str:
    """Write frames to an endlessly-looping GIF (100 ms/frame default).

    Like the reference, each frame is GIF-encoded individually first so every
    frame keeps its own palette (the BytesIO round-trip at
    vae_utility.py:98-104) instead of being quantized to frame 0's palette.
    """
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    encoded = []
    for f in frames:
        buf = BytesIO()
        f.save(buf, format="GIF")
        encoded.append(Image.open(buf))
    encoded[0].save(
        out_path,
        format="GIF",
        duration=duration_ms,
        save_all=True,
        loop=0,
        append_images=encoded[1:],
    )
    return out_path
