"""PNG framebuffer dump/read.

The reference's GL window blit (src/main.cu:215-292) has no TPU analogue;
frames are read back to host RGBA8 arrays and written as PNGs (the reference
carries a commented-out stbi_write_png dump, src/main.cu:185-189 — offline
image output is required for the PSNR harness in BASELINE.md).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def write_png(path: str, image: np.ndarray) -> None:
    """Write [H, W, 3|4] uint8 as a PNG (pure zlib, no deps)."""
    image = np.asarray(image)
    if image.dtype != np.uint8:
        image = np.clip(image, 0, 255).astype(np.uint8)
    if image.ndim == 2:
        image = np.repeat(image[:, :, None], 3, axis=2)
    h, w, c = image.shape
    color_type = {3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + image[row].tobytes() for row in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    with open(path, "wb") as fp:
        fp.write(b"\x89PNG\r\n\x1a\n")
        fp.write(chunk(b"IHDR", ihdr))
        fp.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        fp.write(chunk(b"IEND", b""))


def read_png(path: str) -> np.ndarray:
    """Read a PNG to [H, W, 4] uint8 (PIL-backed)."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGBA"), np.uint8)
