"""Image output: PNG (pure-python zlib encoder) and PPM.

The reference displays frames through a swapchain; offline output is our
display path. Tone handling matches the reference surface: linear float color
clamped to [0,1] and quantised to 8-bit (the rgba8 storage texture write,
/root/reference/shader/src/lib.rs:86-88).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def to_u8(img: np.ndarray) -> np.ndarray:
    """Clamp linear [H,W,3] float to rgba8-style u8 (round-to-nearest)."""
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """Encode [H,W,3] RGB or [H,W,4] RGBA (float linear-clamped or uint8)
    as PNG bytes."""
    if img.dtype != np.uint8:
        img = to_u8(img)
    h, w = img.shape[:2]
    color_type = 6 if img.shape[-1] == 4 else 2
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, level)) + chunk(b"IEND", b""))


def write_png(path: str, img: np.ndarray) -> None:
    """Write [H,W,3] float (linear, clamped) or uint8 to an RGB PNG."""
    with open(path, "wb") as f:
        f.write(encode_png(img))


def write_ppm(path: str, img: np.ndarray) -> None:
    if img.dtype != np.uint8:
        img = to_u8(img)
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(img.tobytes())


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    """Per-pixel RMSE, the BASELINE.md fidelity metric."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)))
