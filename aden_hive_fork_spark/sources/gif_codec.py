"""GIF codec — pure stdlib + numpy (public GIF87a/89a specification).

Completes the real-decode coverage of every image format the binary
tier sniffs (PNG: png_codec, JPEG: jpeg_codec, GIF: here): LSB-first
variable-width LZW decompression, global/local color tables,
interlacing, GIF89a transparency, and multi-frame (animated) streams
with frame compositing over the previous frame.

- ``gif_decode(b)``      — first composited frame as H×W×3 uint8 RGB
- ``gif_frames(b, max_frames)`` — composited frames of an animation
- ``gif_features(b)``    — png_features/jpeg_features-shaped stats
- ``gif_encode(img)``    — real LZW encoder over an exact palette
  (≤256 distinct colors), for fixtures and differential roundtrips.

Reference parity: the reference's vision tool ships GIF bytes to a
proprietary API (vision_tool.py:371-520); everything here derives
from the public format specification alone.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------
def _lzw_decode(mcs: int, data: bytes, n_pixels: int) -> bytearray | None:
    """LSB-first variable-width GIF LZW."""
    clear = 1 << mcs
    end = clear + 1
    out = bytearray()
    # dictionary as list of bytes
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    code_size = mcs + 1
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    while pos < len(data) or nbits >= code_size:
        while nbits < code_size and pos < len(data):
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        if nbits < code_size:
            break
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                return None
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            return None
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
        if len(out) >= n_pixels:
            break
    return out


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    out = np.empty_like(idx)
    rows = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    for src, dst in enumerate(rows):
        out[dst] = idx[src]
    return out


def _parse_frames(b: bytes, max_frames: int):
    """Yield (left, top, index_array, palette, transparent_idx) per
    image descriptor, plus the logical screen size and background."""
    if not b.startswith((b"GIF87a", b"GIF89a")) or len(b) < 13:
        return None
    sw, sh = struct.unpack("<HH", b[6:10])
    packed = b[10]
    bg_index = b[11]
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b[i : i + 3 * n], np.uint8).reshape(-1, 3).copy()
        i += 3 * n
    frames = []
    transparent = None
    while i < len(b):
        blk = b[i]
        if blk == 0x3B:  # trailer
            break
        if blk == 0x21:  # extension: label + sub-blocks
            label = b[i + 1] if i + 1 < len(b) else 0
            j = i + 2
            if label == 0xF9 and j < len(b) and b[j] >= 4:  # GCE
                flags = b[j + 1]
                if flags & 0x01:
                    transparent = b[j + 4]
                else:
                    transparent = None
            while j < len(b) and b[j] != 0:
                j += 1 + b[j]
            i = j + 1
            continue
        if blk != 0x2C:  # unknown block: bail
            return None
        left, top, w, h = struct.unpack("<HHHH", b[i + 1 : i + 9])
        ipacked = b[i + 9]
        j = i + 10
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(b[j : j + 3 * n], np.uint8).reshape(-1, 3).copy()
            j += 3 * n
        if pal is None or w == 0 or h == 0:
            return None
        mcs = b[j]
        j += 1
        lzw = bytearray()
        while j < len(b) and b[j] != 0:
            size = b[j]
            lzw += b[j + 1 : j + 1 + size]
            j += 1 + size
        i = j + 1
        pix = _lzw_decode(mcs, bytes(lzw), w * h)
        if pix is None or len(pix) < w * h:
            return None
        idx = np.frombuffer(bytes(pix[: w * h]), np.uint8).reshape(h, w)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        frames.append((left, top, idx, pal, transparent))
        transparent = None
        if len(frames) >= max_frames:
            break
    if not frames:
        return None
    return sw, sh, bg_index, gct, frames


def gif_frames(b: bytes, max_frames: int = 64) -> list[np.ndarray] | None:
    """Composited RGB frames (each H×W×3 uint8 at logical-screen
    size). Frames paint over the running canvas (disposal method 1
    semantics — the common case); transparent pixels leave the canvas
    untouched."""
    parsed = _parse_frames(b, max_frames)
    if parsed is None:
        return None
    sw, sh, bg_index, gct, frames = parsed
    if gct is not None and bg_index < len(gct):
        canvas = np.tile(gct[bg_index], (sh, sw, 1)).astype(np.uint8)
    else:
        canvas = np.zeros((sh, sw, 3), np.uint8)
    out = []
    for left, top, idx, pal, transparent in frames:
        h, w = idx.shape
        idx = np.minimum(idx, len(pal) - 1)
        rgb = pal[idx]
        y0, y1 = top, min(top + h, sh)
        x0, x1 = left, min(left + w, sw)
        if y0 >= y1 or x0 >= x1:
            out.append(canvas.copy())
            continue
        patch = rgb[: y1 - y0, : x1 - x0]
        if transparent is not None:
            mask = (idx[: y1 - y0, : x1 - x0] != transparent)[:, :, None]
            region = canvas[y0:y1, x0:x1]
            canvas[y0:y1, x0:x1] = np.where(mask, patch, region)
        else:
            canvas[y0:y1, x0:x1] = patch
        out.append(canvas.copy())
    return out


def gif_decode(b: bytes) -> np.ndarray | None:
    """First composited frame as H×W×3 uint8 RGB (None if invalid)."""
    frames = gif_frames(b, max_frames=1)
    return frames[0] if frames else None


def gif_features(b: bytes, grid: int = 4, color_cap: int = 4096) -> dict | None:
    """Decode + content statistics, same shape as png_features /
    jpeg_features so image pipelines stay format-agnostic."""
    img = gif_decode(b)
    if img is None:
        return None
    h, w, ch = img.shape
    lum = 0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
    flat = img.reshape(-1, ch)[:65536]
    colors = np.unique(flat, axis=0)
    ys = np.linspace(0, h, grid + 1, dtype=int)
    xs = np.linspace(0, w, grid + 1, dtype=int)
    cells = [
        float(
            lum[ys[i]: max(ys[i + 1], ys[i] + 1),
                xs[j]: max(xs[j + 1], xs[j] + 1)].mean()
        ) / 255.0
        for i in range(grid)
        for j in range(grid)
    ]
    return {
        "width": w,
        "height": h,
        "channels": ch,
        "brightness": float(lum.mean()) / 255.0,
        "contrast": float(lum.std()) / 255.0,
        "n_colors": int(min(len(colors), color_cap)),
        "grid": [round(c, 6) for c in cells],
    }


# ---------------------------------------------------------------------------
# encoder (fixtures + differential roundtrips; exact-palette images)
# ---------------------------------------------------------------------------
def _lzw_encode(mcs: int, indices: np.ndarray) -> bytes:
    clear = 1 << mcs
    end = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = mcs + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for v in indices.tobytes():
        wk = w + bytes([v])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code > 4094:  # reset before the table overflows
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = mcs + 1
        w = bytes([v])
    if w:
        emit(table[w])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_encode(img: np.ndarray) -> bytes:
    """Encode uint8 (H,W,3) RGB (or (H,W) grayscale) with ≤256
    distinct colors as a single-frame GIF89a with an exact palette."""
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("gif_encode needs <=256 distinct colors")
    # pad palette to a power of two (min 2 entries -> min code size 2)
    bits = max(2, int(np.ceil(np.log2(max(2, len(palette))))))
    n_pal = 1 << bits
    pal = np.zeros((n_pal, 3), np.uint8)
    pal[: len(palette)] = palette
    mcs = bits
    lzw = _lzw_encode(mcs, inverse.astype(np.uint8))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT flag + size, bg 0
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out += bytes([mcs])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
