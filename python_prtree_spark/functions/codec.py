"""Self-contained image codec + perceptual hash (multimodal column support).

The container has no image libraries (no Pillow/opencv), so the codecs are
pure numpy + stdlib:

  * fmt='raw'   — 12-byte header (magic, w, h) + uint8 RGB bytes; exact.
  * fmt='lossy' — same header, pixels quantized to even values (1 LSB
    dropped, step 2). MSE <= 0.5 → PSNR >= ~51 dB, satisfying the
    BASELINE.json input_hint invariant (decoded-pixel PSNR >= 40 dB)
    deterministically for ANY input.
  * fmt='png'   — REAL spec-compliant PNG (RFC 2083 / ISO 15948): zlib
    (stdlib) IDAT, CRC-32-checked chunks, 8-bit depth. The encoder emits
    color type 2 (truecolor RGB) with the vectorized Up filter; the
    decoder handles color types 0/2/6 (gray / RGB / RGBA, alpha dropped)
    and ALL FIVE scanline filters, so PNGs produced by any external tool
    decode here, and PNGs encoded here decode anywhere. Lossless.

JPEG/WebP decode would slot in behind ``decode_external`` (still stubbed —
their entropy coders need external libs); PNG is dispatched for real.

phash: 64-bit average-hash — grayscale → 8x8 block means → mean threshold
→ bit pack. Deterministic, library-free.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC_RAW = b"PRS0"
MAGIC_LOSSY = b"PRS1"
_HEADER = struct.Struct("<4sII")
PNG_SIG = b"\x89PNG\r\n\x1a\n"

__all__ = [
    "encode_image", "decode_image", "decode_meta", "psnr",
    "phash64", "phash64_batch", "decode_external",
    "encode_png", "decode_png",
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
    if fmt == "png":
        return encode_png(pixels)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes) -> np.ndarray:
    """bytes → (h, w, 3) uint8 (format sniffed from the magic bytes)."""
    if data[:8] == PNG_SIG:
        return decode_png(data)
    magic, w, h = _HEADER.unpack_from(data, 0)
    body = np.frombuffer(data, dtype=np.uint8, offset=_HEADER.size)
    if magic == MAGIC_RAW:
        return body.reshape(h, w, 3)
    if magic == MAGIC_LOSSY:
        return (body.reshape(h, w, 3) << 1).astype(np.uint8)  # dequant (even values)
    raise ValueError("unknown image magic")


def decode_meta(data: bytes) -> tuple[str, int, int]:
    if data[:8] == PNG_SIG:
        w, h = struct.unpack_from(">II", data, 16)  # IHDR is always first
        return "png", w, h
    magic, w, h = _HEADER.unpack_from(data, 0)
    fmt = "raw" if magic == MAGIC_RAW else "lossy" if magic == MAGIC_LOSSY else "?"
    return fmt, w, h


def decode_external(data: bytes, fmt: str) -> np.ndarray:
    """Real external formats. PNG decodes for real (pure zlib+numpy,
    spec-compliant — see decode_png); JPEG/WebP remain explicit stubs
    (their entropy coders need libraries this sandbox lacks). The Spark
    plumbing (binary column → mapInPandas → decoded batches) is identical
    across formats and fully exercised."""
    if fmt == "png":
        return decode_png(data)
    raise NotImplementedError(
        f"external codec {fmt!r} unavailable in this environment; "
        "use fmt='png', 'raw' or 'lossy'"
    )


# ---------------------------------------------------------------------------
# PNG — real, spec-compliant, pure stdlib-zlib + numpy
# ---------------------------------------------------------------------------

def _png_chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, level: int = 6) -> bytes:
    """(h, w, 3) uint8 → PNG bytes (color type 2, bit depth 8, no
    interlace). Every row uses the Up filter (type 2) — computed as one
    vectorized uint8 subtraction against the previous row (wrapping mod
    256 per the spec), with the first row's prior implicitly zero."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    if pixels.ndim != 3:
        raise ValueError(f"expected (h, w, 3) array, got shape {pixels.shape}")
    h, w, c = pixels.shape
    if c != 3 or h <= 0 or w <= 0:
        raise ValueError(f"non-empty RGB expected, got shape {pixels.shape}")
    delta = pixels.copy()
    delta[1:] -= pixels[:-1]  # uint8 wraps — exactly the Up filter
    scan = np.empty((h, 1 + w * 3), dtype=np.uint8)
    scan[:, 0] = 2  # filter type byte per row: Up
    scan[:, 1:] = delta.reshape(h, w * 3)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(scan.tobytes(), level)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8. Spec-compliant for the common web
    subset: bit depth 8, color types 0 (gray, replicated to RGB),
    2 (RGB) and 6 (RGBA, alpha dropped), interlace 0, all five scanline
    filters, multiple IDAT chunks, CRC-verified, ancillary chunks skipped.
    Filters 0/1/2 unfilter fully vectorized (Sub is a per-lane cumsum mod
    256); Average/Paeth carry a left-pixel dependency so they walk the row
    (vector over channels) — the engine's own encoder emits only Up, so
    engine-encoded images stay on the vectorized path."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = -1
    ctype = -1
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(typ + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        pos += 12 + length
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or comp != 0 or filt != 0 or ilace != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth} interlace={ilace})"
                )
            if ctype not in (0, 2, 6):
                raise ValueError(f"unsupported PNG color type {ctype}")
        elif typ == b"IDAT":
            idat += payload
        elif typ == b"IEND":
            break
        # ancillary chunks (tEXt, gAMA, ...) skipped
    if w <= 0 or not idat:
        raise ValueError("truncated PNG")
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = 1 + w * ch
    if raw.size != h * stride:
        raise ValueError("PNG scanline size mismatch")
    raw = raw.reshape(h, stride)
    ftypes = raw[:, 0]
    rows = raw[:, 1:].reshape(h, w, ch)
    out = np.empty((h, w, ch), dtype=np.uint8)
    prev = np.zeros((w, ch), dtype=np.uint8)
    for y in range(h):
        f = ftypes[y]
        cur = rows[y]
        if f == 0:  # None
            rec = cur.copy()
        elif f == 1:  # Sub: recon[x] = filt[x] + recon[x-1]  (per lane)
            rec = np.cumsum(cur.astype(np.int64), axis=0).astype(np.uint8)
        elif f == 2:  # Up
            rec = cur + prev
        elif f == 3:  # Average — left dependency: walk the row
            rec = np.empty_like(cur)
            left = np.zeros(ch, dtype=np.int32)
            pv = prev.astype(np.int32)
            for x in range(w):
                left = (cur[x].astype(np.int32) + ((left + pv[x]) >> 1)) & 0xFF
                rec[x] = left
        elif f == 4:  # Paeth — left dependency: walk the row
            rec = np.empty_like(cur)
            left = np.zeros(ch, dtype=np.int32)
            ul = np.zeros(ch, dtype=np.int32)
            pv = prev.astype(np.int32)
            for x in range(w):
                a, b, c_ = left, pv[x], ul
                p = a + b - c_
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c_)
                pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c_))
                left = (cur[x].astype(np.int32) + pred) & 0xFF
                rec[x] = left
                ul = pv[x]
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec
        prev = rec
    if ctype == 0:
        return np.repeat(out, 3, axis=2)
    if ctype == 6:
        return np.ascontiguousarray(out[:, :, :3])
    return out


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
