"""Baseline JPEG codec — pure stdlib + numpy (no Pillow/libjpeg).

Implements the public ITU-T T.81 / ISO 10918-1 baseline sequential
process: canonical Huffman entropy coding, 8×8 DCT with quantization,
YCbCr color (BT.601 full-range), 4:4:4 / 4:2:0-style subsampling, and
restart markers.

- ``jpeg_decode``  — bytes → H×W×C uint8 array (C=1 gray, C=3 RGB);
  None for non-baseline (progressive/arithmetic/12-bit) or corrupt
  input. Entropy decoding is sequential Python (Huffman is inherently
  bit-serial); dequantization + IDCT run batched in numpy over all
  blocks of a component at once.
- ``jpeg_encode_baseline`` — the fixture/roundtrip writer. Tables are
  SELF-DESCRIBING (DQT/DHT are embedded in the stream, as the format
  requires), so the encoder uses simple canonical Huffman tables
  rather than the Annex-K defaults — any compliant decoder, including
  this module's, reads them from the headers.
- ``jpeg_features`` — same signature contract as
  ``png_codec.png_features`` (brightness/contrast/n_colors/luminance
  grid), so ``binary.image_features`` treats both formats uniformly.
- ``avi_mjpeg_encode`` / ``avi_mjpeg_frames`` — minimal RIFF AVI
  container for Motion-JPEG: each video chunk IS a complete JPEG, so
  real per-frame pixel decode needs no inter-frame codec. This is the
  video tier's real-decode path (MP4/H.264 remains out of scope — an
  inter-frame codec is not implementable at this footprint; see
  ``binary.video_frame_sample``).

Reference parity: the reference's vision tool feeds image bytes to a
proprietary API (vision_tool.py:371-520); everything here derives from
the public JPEG/AVI specifications alone.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared constants: zigzag order and the orthonormal DCT-II basis
# ---------------------------------------------------------------------------
def _zigzag_rc() -> list[tuple[int, int]]:
    out = []
    for s in range(15):
        diag = [(i, s - i) for i in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 0:
            diag.reverse()
        out.extend(diag)
    return out


_ZZ_RC = _zigzag_rc()
# zigzag position k -> flat (row*8+col) index
ZZ_FLAT = np.array([r * 8 + c for r, c in _ZZ_RC], dtype=np.int64)

# A[k, n] = c_k cos((2n+1)kπ/16); forward F = A f Aᵀ, inverse f = Aᵀ F A
_A = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _A[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else 0.5
        )


# ---------------------------------------------------------------------------
# Huffman tables (canonical, per T.81 Annex C)
# ---------------------------------------------------------------------------
def _build_decode_lut(bits: list[int], vals: list[int]) -> dict:
    """(code_length, code) -> symbol, canonical assignment."""
    lut = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            lut[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return lut


def _build_encode_lut(bits: list[int], vals: list[int]) -> dict:
    """symbol -> (code, length)."""
    enc = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            enc[vals[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return enc


# encoder-side table SPECS (serialized into DHT, so self-describing):
# DC: 12 categories, all 4-bit codes (12 ≤ 16; the all-ones code stays
# unused, as T.81 requires). AC: EOB gets the 2-bit code, every other
# run/size symbol a 9-bit code (161 ≤ 512-used-prefixes).
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))
_ENC_AC_BITS = [0, 1, 0, 0, 0, 0, 0, 0, 161, 0, 0, 0, 0, 0, 0, 0]
_ENC_AC_VALS = [0x00] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
] + [0xF0]


# ---------------------------------------------------------------------------
# bit I/O over entropy-coded segments (0xFF byte stuffing, RST markers)
# ---------------------------------------------------------------------------
class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.i = pos
        self.buf = 0
        self.n = 0
        self.marker: int | None = None  # pending marker code (0xD0..)

    def _fill(self) -> bool:
        if self.marker is not None or self.i >= len(self.d):
            return False
        byte = self.d[self.i]
        if byte == 0xFF:
            nxt = self.d[self.i + 1] if self.i + 1 < len(self.d) else 0xD9
            if nxt != 0x00:  # a real marker terminates the segment
                self.marker = nxt
                return False
            self.i += 2  # stuffed 0xFF00 -> data byte 0xFF
        else:
            self.i += 1
        self.buf = (self.buf << 8) | byte
        self.n += 8
        return True

    def read_bit(self) -> int:
        if self.n == 0 and not self._fill():
            return 0  # trailing pad past the last marker
        self.n -= 1
        return (self.buf >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def read_huff(self, lut: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = lut.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code in entropy data")

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        v = self.read_bits(s)
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    def sync_restart(self) -> None:
        """Byte-align and consume the pending RSTn marker. The marker
        may not have been touched by bit reads yet (the previous MCU
        ended mid-byte and only pad bits remain) — scan forward to it."""
        self.buf = 0
        self.n = 0
        if self.marker is None:
            while self.i + 1 < len(self.d):
                if self.d[self.i] == 0xFF and self.d[self.i + 1] != 0x00:
                    self.marker = self.d[self.i + 1]
                    break
                self.i += 1
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.i += 2  # past FF Dn
            self.marker = None


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing
        self.acc &= (1 << self.n) - 1

    def pad_to_byte(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-bits pad


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------
def _decode_block_into(reader: _BitReader, dc_lut: dict, ac_lut: dict,
                       pred: int, zz_out: np.ndarray) -> int:
    s = reader.read_huff(dc_lut)
    dc = pred + reader.receive_extend(s)
    zz_out[0] = dc
    k = 1
    while k < 64:
        rs = reader.read_huff(ac_lut)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        zz_out[k] = reader.receive_extend(s)
        k += 1
    return dc


def jpeg_decode(b: bytes) -> np.ndarray | None:
    """Decode baseline JPEG to H×W×C uint8 (C=1 grayscale, 3 RGB)."""
    if not b.startswith(b"\xff\xd8"):
        return None
    try:
        return _jpeg_decode_inner(b)
    except Exception:
        return None


def _jpeg_decode_inner(b: bytes) -> np.ndarray | None:
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            i += 1
            continue
        m = b[i + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if m == 0xD9:
            break
        ln = struct.unpack(">H", b[i + 2 : i + 4])[0]
        seg = b[i + 4 : i + 2 + ln]
        if m == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    qt[tq] = np.frombuffer(seg[p : p + 64], np.uint8).astype(np.int32)
                    p += 64
                else:
                    qt[tq] = np.frombuffer(seg[p : p + 128], ">u2").astype(np.int32)
                    p += 128
        elif m == 0xC4:  # DHT (possibly several tables per segment)
            p = 0
            while p + 17 <= len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                huff[(tc, th)] = _build_decode_lut(bits, vals)
                p += 17 + n
        elif m in (0xC0, 0xC1):  # baseline / extended sequential huffman
            if seg[0] != 8:  # 12-bit precision: out of scope
                return None
            h, w = struct.unpack(">HH", seg[1:5])
            comps = []
            for c in range(seg[5]):
                cid, hv, tqi = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tqi}
                )
            frame = (h, w, comps)
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive/lossless/arithmetic: not baseline
        elif m == 0xDD:
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:  # SOS — baseline has one interleaved scan
            if frame is None:
                return None
            scomps = []
            for c in range(seg[0]):
                cs, tda = seg[1 + 2 * c : 3 + 2 * c]
                scomps.append((cs, tda >> 4, tda & 0x0F))
            return _decode_scan(b, i + 2 + ln, frame, qt, huff, scomps,
                                restart_interval)
        i += 2 + ln
    return None


def _decode_scan(b, pos, frame, qt, huff, scomps, restart_interval):
    h_img, w_img, comps = frame
    if h_img == 0 or w_img == 0:
        return None
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1:
        return None
    mcux = -(-w_img // (8 * hmax))
    mcuy = -(-h_img // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    for cs, td, ta in scomps:
        by_id[cs]["dc_lut"] = huff[(0, td)]
        by_id[cs]["ac_lut"] = huff[(1, ta)]
    order = [by_id[cs] for cs, _, _ in scomps]
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["zz"] = np.zeros((c["bh"] * c["bw"], 64), np.int32)
    reader = _BitReader(b, pos)
    preds = {c["id"]: 0 for c in comps}
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            reader.sync_restart()
            preds = {c["id"]: 0 for c in comps}
        my, mx = divmod(m, mcux)
        for c in order:
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    bi = (my * c["v"] + v) * c["bw"] + (mx * c["h"] + hh)
                    preds[c["id"]] = _decode_block_into(
                        reader, c["dc_lut"], c["ac_lut"], preds[c["id"]],
                        c["zz"][bi],
                    )
    planes = []
    for c in comps:
        coef = c["zz"] * qt[c["tq"]][None, :]
        blocks = np.zeros((coef.shape[0], 64), np.float64)
        blocks[:, ZZ_FLAT] = coef  # de-zigzag
        blocks = blocks.reshape(-1, 8, 8)
        # batched IDCT: f = Aᵀ F A over every block of the component
        pix = np.einsum("nk,bkl,lm->bnm", _A.T, blocks, _A)
        plane = (
            pix.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        plane = np.clip(np.round(plane) + 128, 0, 255)
        # crop to the component's true size, then upsample to image grid
        ch = -(-h_img * c["v"] // vmax)
        cw = -(-w_img * c["h"] // hmax)
        plane = plane[:ch, :cw]
        if vmax % c["v"] or hmax % c["h"]:
            return None  # non-integer sampling ratio: out of scope
        plane = np.repeat(plane, vmax // c["v"], axis=0)
        plane = np.repeat(plane, hmax // c["h"], axis=1)
        planes.append(plane[:h_img, :w_img])
    if len(planes) == 1:
        return planes[0].astype(np.uint8)[:, :, None]
    if len(planes) != 3:
        return None  # CMYK etc.: out of scope
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    bl = y + 1.772 * (cb - 128)
    rgb = np.stack([r, g, bl], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (fixtures + differential roundtrip testing)
# ---------------------------------------------------------------------------
_BASE_LUMA_Q = np.array(  # T.81 Annex K.1 luminance table (public)
    [16, 11, 10, 16, 24, 40, 51, 61,
     12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56,
     14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77,
     24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101,
     72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32,
)


def _quality_table(quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling of the Annex-K luma table
    (quality 100 → all-ones: only DCT/rounding loss remains)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    tbl = (_BASE_LUMA_Q * scale + 50) // 100
    return np.clip(tbl, 1, 255).astype(np.int32)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_plane_blocks(plane: np.ndarray, q_flat: np.ndarray) -> np.ndarray:
    """All 8×8 blocks of a (8-padded) plane → quantized zigzag coeffs
    (n_blocks, 64), row-major block order."""
    hh, ww = plane.shape
    f = plane.astype(np.float64) - 128.0
    blocks = (
        f.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    coef = np.einsum("nk,bkl,lm->bnm", _A, blocks, _A.T)  # F = A f Aᵀ
    zz = coef.reshape(-1, 64)[:, ZZ_FLAT]
    return np.round(zz / q_flat[None, :]).astype(np.int32)


def _pad_edge(plane: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
    hh, ww = plane.shape
    ph = (-hh) % mult_y
    pw = (-ww) % mult_x
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def jpeg_encode_baseline(
    img: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode uint8 (H,W), (H,W,1) grayscale or (H,W,3) RGB as
    baseline JPEG. ``subsample=True`` uses 4:2:0-style 2×2 chroma
    subsampling; ``restart_interval`` > 0 emits DRI + RSTn markers
    every that many MCUs (exercises the decoder's restart path)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h_img, w_img, nch = img.shape
    if nch not in (1, 3):
        raise ValueError("expected 1 or 3 channels")
    gray = nch == 1
    q_flat = _quality_table(quality)  # zigzag order (flat table: fine)

    if gray:
        planes = [img[:, :, 0].astype(np.float64)]
        samp = [(1, 1)]
    else:
        rf = img[:, :, 0].astype(np.float64)
        gf = img[:, :, 1].astype(np.float64)
        bf = img[:, :, 2].astype(np.float64)
        y = 0.299 * rf + 0.587 * gf + 0.114 * bf
        cb = 128.0 - 0.168736 * rf - 0.331264 * gf + 0.5 * bf
        cr = 128.0 + 0.5 * rf - 0.418688 * gf - 0.081312 * bf
        if subsample:
            def _down2(p: np.ndarray) -> np.ndarray:
                p = _pad_edge(p, 2, 2)
                return (p[0::2, 0::2] + p[0::2, 1::2]
                        + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
            planes = [y, _down2(cb), _down2(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w_img // (8 * hmax))
    mcuy = -(-h_img // (8 * vmax))
    comp_zz = []
    comp_bw = []
    for p, (sh, sv) in zip(planes, samp):
        # pad (edge-replicate) to this component's full MCU grid
        target_h = mcuy * sv * 8
        target_w = mcux * sh * 8
        padded = np.pad(
            np.clip(p, 0.0, 255.0),
            ((0, target_h - p.shape[0]), (0, target_w - p.shape[1])),
            mode="edge",
        )
        comp_zz.append(_encode_plane_blocks(padded, q_flat))
        comp_bw.append(target_w // 8)

    dc_enc = _build_encode_lut(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_enc = _build_encode_lut(_ENC_AC_BITS, _ENC_AC_VALS)
    wtr = _BitWriter()
    preds = [0] * len(planes)

    def _write_block(zz: np.ndarray, ci: int) -> None:
        diff = int(zz[0]) - preds[ci]
        preds[ci] = int(zz[0])
        s = _category(diff)
        code, ln = dc_enc[s]
        wtr.write(code, ln)
        if s:
            wtr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_enc[0xF0]
                wtr.write(code, ln)
                run -= 16
            s = _category(v)
            code, ln = ac_enc[(run << 4) | s]
            wtr.write(code, ln)
            wtr.write(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if run:
            code, ln = ac_enc[0x00]
            wtr.write(code, ln)

    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            wtr.pad_to_byte()
            wtr.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            preds = [0] * len(planes)
        my, mx = divmod(m, mcux)
        for ci, (sh, sv) in enumerate(samp):
            for v in range(sv):
                for hh in range(sh):
                    bi = (my * sv + v) * comp_bw[ci] + (mx * sh + hh)
                    _write_block(comp_zz[ci][bi], ci)
    wtr.pad_to_byte()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q_flat))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h_img, w_img) + bytes([ncomp])
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# features — same contract as png_codec.png_features
# ---------------------------------------------------------------------------
def jpeg_features(b: bytes, grid: int = 4, color_cap: int = 4096) -> dict | None:
    """Decode + content statistics for one JPEG: {width, height,
    channels, brightness, contrast, n_colors, grid} — identical shape
    to ``png_features`` so image pipelines are format-agnostic."""
    img = jpeg_decode(b)
    if img is None:
        return None
    h, w, ch = img.shape
    if ch >= 3:
        lum = 0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
    else:
        lum = img[:, :, 0].astype(np.float64)
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
# minimal Motion-JPEG AVI container (RIFF — public Microsoft spec)
# ---------------------------------------------------------------------------
def _riff_chunk(cid: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return cid + struct.pack("<I", len(payload)) + payload + pad


def _riff_list(ltype: bytes, payload: bytes) -> bytes:
    return _riff_chunk(b"LIST", ltype + payload)


def avi_mjpeg_encode(frames: list[bytes], fps: int = 10) -> bytes:
    """Pack complete JPEG byte strings as a Motion-JPEG AVI. Every
    ``00dc`` chunk is a standalone baseline JPEG — the whole point of
    MJPEG for a data pipeline: frame extraction is container parsing,
    not codec work."""
    if not frames:
        raise ValueError("need at least one frame")
    dims = jpeg_size_quick(frames[0])
    w, h = dims if dims else (0, 0)
    uspf = 1_000_000 // max(1, fps)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        uspf, 0, 0, 0x10, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII",
                                        0, 0, 0, 0, 1, fps, 0, len(frames),
                                        0, 0, 0, 0)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, w * h * 3, 0, 0, 0, 0)
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi = _riff_list(b"movi", b"".join(_riff_chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def jpeg_size_quick(b: bytes) -> tuple[int, int] | None:
    """(w, h) from the SOF header (same scan as binary.jpeg_size,
    local to avoid a circular import)."""
    i = 2
    while i + 9 < len(b):
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", b[i + 5 : i + 9])
            return w, h
        seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
        i += 2 + seg_len
    return None


def avi_mjpeg_frames(b: bytes) -> list[bytes]:
    """All video frames (``00dc``/``00db`` chunks) of an AVI, each a
    complete JPEG byte string. Lenient: walks the RIFF tree and
    collects from any ``movi`` list."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return []
    frames: list[bytes] = []

    def walk(buf: bytes, start: int, end: int) -> None:
        i = start
        while i + 8 <= end:
            cid = buf[i : i + 4]
            size = struct.unpack("<I", buf[i + 4 : i + 8])[0]
            payload_end = min(i + 8 + size, end)
            if cid in (b"RIFF", b"LIST"):
                walk(buf, i + 12, payload_end)
            elif cid[2:4] in (b"dc", b"db") and buf[i + 8 : i + 11] == b"\xff\xd8\xff":
                frames.append(bytes(buf[i + 8 : payload_end]))
            i += 8 + size + (size % 2)

    walk(b, 12, len(b))
    return frames


def avi_info(b: bytes) -> tuple[float | None, int | None, int | None]:
    """(duration_s, width, height) from the avih header."""
    try:
        i = 12
        # avih lives inside LIST hdrl; walk two levels leniently
        def find_avih(buf: bytes, start: int, end: int):
            j = start
            while j + 8 <= end:
                cid = buf[j : j + 4]
                size = struct.unpack("<I", buf[j + 4 : j + 8])[0]
                pe = min(j + 8 + size, end)
                if cid == b"avih":
                    return j + 8, pe
                if cid in (b"RIFF", b"LIST"):
                    got = find_avih(buf, j + 12, pe)
                    if got:
                        return got
                j += 8 + size + (size % 2)
            return None

        got = find_avih(b, i, len(b))
        if not got:
            return None, None, None
        ps, _pe = got
        uspf, _, _, _, total = struct.unpack("<IIIII", b[ps : ps + 20])
        w, h = struct.unpack("<II", b[ps + 32 : ps + 40])
        dur = round(uspf * total / 1_000_000, 6) if uspf and total else None
        return dur, w or None, h or None
    except Exception:
        return None, None, None
