"""PNG I/O + image comparison against the reference goldens.

The reference saves its ARGB8888 framebuffer bottom-up (negative pitch,
draw3d/main.cpp:385-386) and compares with cocogfx CompareImages at a
per-channel tolerance (main.cpp:505-514).  Framebuffer layout here:
(H, W) uint32 with a<<24 | r<<16 | g<<8 | b, row 0 at the bottom of the
displayed image (GL window convention).
"""
from __future__ import annotations

import numpy as np
from PIL import Image


def framebuffer_to_rgba(fb: np.ndarray) -> np.ndarray:
    """(H, W) uint32 ARGB -> (H, W, 4) uint8 RGBA, flipped to image order."""
    fb = np.asarray(fb, np.uint32)
    a = (fb >> 24).astype(np.uint8)
    r = ((fb >> 16) & 0xFF).astype(np.uint8)
    g = ((fb >> 8) & 0xFF).astype(np.uint8)
    b = (fb & 0xFF).astype(np.uint8)
    rgba = np.stack([r, g, b, a], axis=-1)
    return rgba[::-1]  # bottom-up save


def save_framebuffer_png(path: str, fb: np.ndarray) -> None:
    Image.fromarray(framebuffer_to_rgba(fb), "RGBA").save(path)


def load_png_argb(path: str) -> np.ndarray:
    """Golden PNG -> (H, W) uint32 ARGB in *image* row order (top-down)."""
    im = Image.open(path).convert("RGBA")
    a = np.asarray(im, np.uint32)
    return (a[..., 3] << 24) | (a[..., 0] << 16) | (a[..., 1] << 8) | a[..., 2]


def compare_to_golden(fb: np.ndarray, golden_path: str, tolerance: int = 1):
    """cocogfx CompareImages semantics: count pixels where any channel
    differs by more than `tolerance`.  Returns (errors, max_channel_diff)."""
    golden = load_png_argb(golden_path)
    got = np.asarray(fb, np.uint32)[::-1]  # flip to image order
    assert got.shape == golden.shape, (got.shape, golden.shape)

    def chans(x):
        return np.stack([(x >> s) & 0xFF for s in (24, 16, 8, 0)], -1).astype(np.int32)

    diff = np.abs(chans(got) - chans(golden))
    per_pixel = diff.max(-1)
    errors = int((per_pixel > tolerance).sum())
    return errors, int(per_pixel.max())
