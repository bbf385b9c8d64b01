"""Self-contained image codec + perceptual hash (multimodal column support).

The container has no image libraries (no Pillow/opencv), so the codec is
pure numpy and the formats are our own:

  * fmt='raw'   — 12-byte header (magic, w, h) + uint8 RGB bytes; exact.
  * fmt='lossy' — same header, pixels quantized to even values (1 LSB
    dropped, step 2). MSE <= 0.5 → PSNR >= ~51 dB, satisfying the
    BASELINE.json input_hint invariant (decoded-pixel PSNR >= 40 dB)
    deterministically for ANY input.

Real JPEG/PNG decode would slot in behind ``decode_external`` (stubbed with
NotImplementedError as the environment lacks the libs); all Spark-side
plumbing (binary columns, Arrow batches, mapInPandas signatures) is real
and tested.

phash: 64-bit average-hash — grayscale → 8x8 block means → mean threshold
→ bit pack. Deterministic, library-free.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC_RAW = b"PRS0"
MAGIC_LOSSY = b"PRS1"
_HEADER = struct.Struct("<4sII")

__all__ = [
    "encode_image", "decode_image", "decode_meta", "psnr",
    "phash64", "phash64_batch", "decode_external",
]


def encode_image(pixels: np.ndarray, fmt: str = "raw") -> bytes:
    """pixels: (h, w, 3) uint8 → bytes."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = pixels.shape
    assert c == 3, "RGB expected"
    if fmt == "raw":
        return _HEADER.pack(MAGIC_RAW, w, h) + pixels.tobytes()
    if fmt == "lossy":
        q = (pixels >> 1).astype(np.uint8)  # 7-bit planes
        return _HEADER.pack(MAGIC_LOSSY, w, h) + q.tobytes()
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes) -> np.ndarray:
    """bytes → (h, w, 3) uint8."""
    magic, w, h = _HEADER.unpack_from(data, 0)
    body = np.frombuffer(data, dtype=np.uint8, offset=_HEADER.size)
    if magic == MAGIC_RAW:
        return body.reshape(h, w, 3)
    if magic == MAGIC_LOSSY:
        return (body.reshape(h, w, 3) << 1).astype(np.uint8)  # dequant (even values)
    raise ValueError("unknown image magic")


def decode_meta(data: bytes) -> tuple[str, int, int]:
    magic, w, h = _HEADER.unpack_from(data, 0)
    fmt = "raw" if magic == MAGIC_RAW else "lossy" if magic == MAGIC_LOSSY else "?"
    return fmt, w, h


def decode_external(data: bytes, fmt: str) -> np.ndarray:
    """Hook for real formats (jpeg/png/webp). The sandbox has no image
    libraries, so this is an explicit stub; the Spark plumbing around it
    (binary column → mapInPandas → decoded batches) is fully exercised via
    the raw/lossy codecs above."""
    raise NotImplementedError(
        f"external codec {fmt!r} unavailable in this environment; "
        "use fmt='raw' or 'lossy'"
    )


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def _gray_8x8(pixels: np.ndarray) -> np.ndarray:
    """grayscale then 8x8 block means (handles any h, w >= 8)."""
    g = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = g.shape
    # integer block edges — deterministic, no interpolation
    ye = (np.arange(9) * h) // 8
    xe = (np.arange(9) * w) // 8
    out = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            out[i, j] = g[ye[i]:ye[i + 1], xe[j]:xe[j + 1]].mean()
    return out


def phash64(pixels: np.ndarray) -> int:
    """64-bit average hash of the decoded pixels (signed int64 for Spark)."""
    m = _gray_8x8(pixels)
    bits = (m > m.mean()).ravel()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def phash64_batch(datas: "list[bytes]") -> np.ndarray:
    return np.array([phash64(decode_image(d)) for d in datas], dtype=np.int64)
