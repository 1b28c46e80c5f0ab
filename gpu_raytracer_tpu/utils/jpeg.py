"""Minimal baseline JPEG decoder (pure NumPy + stdlib).

The reference ingests JPEG textures through the Rust `image` crate
(/root/reference/src/gltf_loader.rs:128-184); this environment has no image
codecs (zero egress, no Pillow), so real Sponza-class glTF assets — whose
textures overwhelmingly ship as baseline JPEG — need a from-scratch decoder.

Scope: baseline sequential DCT (SOF0; SOF1 accepted), 8-bit precision,
grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0 / 4:1:1 sampling, restart
markers, byte stuffing. Progressive (SOF2), arithmetic coding and 12-bit
are rejected with a clear error. Huffman + run-length decoding is a Python
loop producing one [n_blocks, 64] coefficient array per component;
dequantisation, zig-zag, IDCT (one einsum over all blocks) and YCbCr→RGB
are vectorised — a 1024² texture decodes in a few seconds, which is load
-time cost only (textures then live in the device atlas).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "JpegError"]


class JpegError(ValueError):
    pass


# zig-zag index: position in the 8x8 block for coefficient k of the scan
_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], np.int32)

# 8-point DCT-III basis (IDCT): x = C^T @ X @ C with orthonormal scaling
_k = np.arange(8)
_C = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * \
    np.where(_k[:, None] == 0, np.sqrt(1 / 8), np.sqrt(2 / 8))


class _HuffTable:
    """Canonical Huffman table with a 16-bit peek LUT for O(1) decode."""

    def __init__(self, counts: np.ndarray, symbols: bytes):
        lut_sym = np.zeros(1 << 16, np.uint8)
        lut_len = np.zeros(1 << 16, np.uint8)
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(int(counts[length - 1])):
                sym = symbols[k]
                k += 1
                lo = code << (16 - length)
                hi = lo + (1 << (16 - length))
                lut_sym[lo:hi] = sym
                lut_len[lo:hi] = length
                code += 1
            code <<= 1
        self.lut_sym = lut_sym
        self.lut_len = lut_len


class _BitReader:
    """MSB-first bit reader over entropy-coded bytes (stuffing pre-stripped)."""

    def __init__(self, buf: np.ndarray):
        self.buf = buf          # uint8 array
        self.pos = 0            # byte position
        self.acc = 0            # bit accumulator (int)
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            b = int(self.buf[self.pos]) if self.pos < len(self.buf) else 0
            self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFFFF
            self.nbits += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return v


def _extend(v: int, s: int) -> int:
    """JPEG signed-magnitude extension (ITU T.81 F.2.2.1)."""
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes → [H,W,4] uint8 RGBA (alpha=255)."""
    if data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")

    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    restart_interval = 0
    frame = None          # (H, W, comps) where comps = [(cid, h, v, tq)]
    scan = None

    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + seglen]
        if marker in (0xC0, 0xC1):                       # SOF0/SOF1 baseline
            prec, H, W, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise JpegError(f"unsupported precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (H, W, comps)
        elif marker == 0xC2:
            raise JpegError("progressive JPEG (SOF2) unsupported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            raise JpegError(f"unsupported SOF marker 0xFF{marker:02X}")
        elif marker == 0xC4:                             # DHT
            p = 0
            while p < len(body):
                tc_th = body[p]
                counts = np.frombuffer(body, np.uint8, 16, p + 1)
                total = int(counts.sum())
                syms = body[p + 17:p + 17 + total]
                huff[(tc_th >> 4, tc_th & 15)] = _HuffTable(counts, syms)
                p += 17 + total
        elif marker == 0xDB:                             # DQT
            p = 0
            while p < len(body):
                pq_tq = body[p]
                if pq_tq >> 4:                           # 16-bit table
                    tab = np.frombuffer(body, ">u2", 64, p + 1).astype(np.int32)
                    p += 129
                else:
                    tab = np.frombuffer(body, np.uint8, 64, p + 1).astype(np.int32)
                    p += 65
                qt[pq_tq & 15] = tab
        elif marker == 0xDD:                             # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:                             # SOS
            ns = body[0]
            scan = [(body[1 + 2 * i], body[2 + 2 * i] >> 4,
                     body[2 + 2 * i] & 15) for i in range(ns)]
            pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    if frame is None or scan is None:
        raise JpegError("missing SOF/SOS")

    # ---- extract entropy-coded bytes, stripping 0xFF00 stuffing and
    # recording restart-marker byte offsets ----
    raw = np.frombuffer(data, np.uint8, n - pos, pos)
    ff = np.nonzero(raw[:-1] == 0xFF)[0]
    nxt = raw[ff + 1]
    end_candidates = ff[(nxt != 0x00) & ~((nxt >= 0xD0) & (nxt <= 0xD7))]
    end = int(end_candidates[0]) if end_candidates.size else len(raw)
    raw = raw[:end]
    drop = np.zeros(len(raw), bool)
    stuff = ff[(ff < end - 1) & (raw[np.minimum(ff + 1, end - 1)] == 0x00)]
    rst = ff[(ff < end - 1) & (raw[np.minimum(ff + 1, end - 1)] >= 0xD0)
             & (raw[np.minimum(ff + 1, end - 1)] <= 0xD7)]
    drop[stuff + 1] = True                               # the 0x00 after FF
    drop[rst] = True                                     # FF of RSTn
    drop[rst + 1] = True                                 # the RSTn byte
    keep = ~drop
    # map original offset -> compacted offset for restart positions
    comp_idx = np.cumsum(keep) - 1
    ent = raw[keep]
    # k-th entry = compacted byte offset just AFTER the k-th RSTn marker
    rst_after = rst + 2
    rst_list = [int(comp_idx[p]) if p < end else len(ent)
                for p in np.sort(rst_after).tolist()]

    H, W, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-W // mcu_w)
    mcus_y = -(-H // mcu_h)
    n_mcus = mcus_x * mcus_y

    scan_by_cid = {s[0]: s for s in scan}
    comp_info = [
        {
            "h": ch, "v": cv, "q": qt[tq],
            "dc": huff[(0, scan_by_cid[cid][1])],
            "ac": huff[(1, scan_by_cid[cid][2])],
            "coef": np.zeros((n_mcus * ch * cv, 64), np.int32),
            "pred": 0,
        }
        for cid, ch, cv, tq in comps
    ]

    br = _BitReader(ent)
    mcu = 0
    while mcu < n_mcus:
        if restart_interval and mcu and mcu % restart_interval == 0:
            # byte-align to just after the j-th restart marker, reset DC
            # predictors (ITU T.81 E.1.4)
            j = mcu // restart_interval - 1
            br.acc = 0
            br.nbits = 0
            if j < len(rst_list):
                br.pos = rst_list[j]
            for ci in comp_info:
                ci["pred"] = 0
        for ci in comp_info:
            dc_lut_sym, dc_lut_len = ci["dc"].lut_sym, ci["dc"].lut_len
            ac_lut_sym, ac_lut_len = ci["ac"].lut_sym, ci["ac"].lut_len
            nb = ci["h"] * ci["v"]
            base = mcu * nb
            for b in range(nb):
                row = ci["coef"][base + b]
                p16 = br.peek16()
                s = int(dc_lut_sym[p16])
                ln = int(dc_lut_len[p16])
                if ln == 0:
                    raise JpegError("bad DC Huffman code")
                br.skip(ln)
                diff = _extend(br.read(s), s) if s else 0
                ci["pred"] += diff
                row[0] = ci["pred"]
                k = 1
                while k < 64:
                    p16 = br.peek16()
                    rs = int(ac_lut_sym[p16])
                    ln = int(ac_lut_len[p16])
                    if ln == 0:
                        raise JpegError("bad AC Huffman code")
                    br.skip(ln)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:      # ZRL: skip 16 zeros
                            k += 16
                            continue
                        break            # EOB
                    k += r
                    if k > 63:
                        break
                    row[k] = _extend(br.read(s), s)
                    k += 1
        mcu += 1

    # ---- vectorised: dequantise, de-zigzag, IDCT, plane assembly ----
    planes = []
    for ci in comp_info:
        coef = ci["coef"] * ci["q"][None, :]
        blocks = np.zeros((coef.shape[0], 64), np.float32)
        blocks[:, _ZIGZAG] = coef
        blocks = blocks.reshape(-1, 8, 8)
        spatial = np.einsum("ki,nkl,lj->nij", _C, blocks, _C,
                            optimize=True) + 128.0
        ch, cv = ci["h"], ci["v"]
        pw, ph = mcus_x * ch * 8, mcus_y * cv * 8
        plane = (spatial.reshape(mcus_y, mcus_x, cv, ch, 8, 8)
                 .transpose(0, 2, 4, 1, 3, 5).reshape(ph, pw))
        # upsample to full MCU resolution (nearest — matches common fast paths)
        if ch < hmax:
            plane = np.repeat(plane, hmax // ch, axis=1)
        if cv < vmax:
            plane = np.repeat(plane, vmax // cv, axis=0)
        planes.append(plane[:H, :W])

    rgba = np.zeros((H, W, 4), np.uint8)
    rgba[..., 3] = 255
    if len(planes) == 1:
        g = np.clip(planes[0], 0, 255).astype(np.uint8)
        rgba[..., 0] = rgba[..., 1] = rgba[..., 2] = g
    elif len(planes) == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgba[..., 0] = np.clip(r, 0, 255).astype(np.uint8)
        rgba[..., 1] = np.clip(g, 0, 255).astype(np.uint8)
        rgba[..., 2] = np.clip(b, 0, 255).astype(np.uint8)
    else:
        raise JpegError(f"unsupported component count {len(planes)}")
    return rgba
