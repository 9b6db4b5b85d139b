"""Minimal baseline-JPEG ENCODER (test fixture only, stdlib + numpy).

Produces a real grayscale SOF0 JFIF stream — forward DCT, quant, zigzag,
canonical Huffman with the Annex-K luminance tables — so the engine's
stdlib decoder (operators/multimodal._decode_jpeg) can be exercised
against genuine entropy-coded image data without any codec library in
the container. Single component, no subsampling, quant table of ones
(near-lossless round trip, |err| <= 1-2 from DCT float rounding).
"""

from __future__ import annotations

import struct

import numpy as np

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# JPEG Annex K luminance Huffman tables
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for a canonical table."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc, self.nacc = 0, 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.nacc = 0, 0

    def flush(self) -> bytes:
        if self.nacc:
            self.acc = (self.acc << (8 - self.nacc)) | ((1 << (8 - self.nacc)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
        return bytes(self.out)


def _fdct(block: "np.ndarray") -> "np.ndarray":
    import math

    M = np.empty((8, 8))
    for u in range(8):
        cu = math.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            M[u, x] = cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return M @ block @ M.T


def _magnitude(v: int) -> tuple[int, int]:
    """(size category s, s-bit value) per JPEG magnitude coding."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, v if v >= 0 else v + (1 << s) - 1


def encode_grayscale_jpeg(pixels: "np.ndarray") -> bytes:
    """uint8 (h, w) -> baseline JFIF bytes; h, w multiples of 8."""
    h, w = pixels.shape
    assert h % 8 == 0 and w % 8 == 0
    dc = _codes(_DC_BITS, _DC_VALS)
    ac = _codes(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    pred = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            block = pixels[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(np.float64) - 128
            coefs = np.round(_fdct(block)).astype(np.int64)  # quant table = ones
            zz = [int(coefs.ravel()[_ZIGZAG[i]]) for i in range(64)]
            s, bits = _magnitude(zz[0] - pred)
            pred = zz[0]
            bw.write(*dc[s])
            if s:
                bw.write(bits, s)
            run = 0
            last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
            for i in range(1, last_nz + 1):
                if zz[i] == 0:
                    run += 1
                    if run == 16:
                        bw.write(*ac[0xF0])  # ZRL
                        run = 0
                    continue
                s, bits = _magnitude(zz[i])
                bw.write(*ac[(run << 4) | s])
                bw.write(bits, s)
                run = 0
            if last_nz < 63:
                bw.write(*ac[0x00])  # EOB
    entropy = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = b"\xff\xd8"  # SOI
    out += seg(0xDB, bytes([0]) + bytes([1] * 64))  # DQT id 0, all ones
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))  # SOF0
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))  # DHT DC
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))  # DHT AC
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS
    out += entropy
    out += b"\xff\xd9"  # EOI
    return out


def _block_coefs(pixels: "np.ndarray") -> list[list[int]]:
    """Per-8x8-block zigzag-order DCT coefficients (quant table of ones),
    raster block order — shared by the baseline and progressive encoders."""
    h, w = pixels.shape
    out = []
    for by in range(h // 8):
        for bx in range(w // 8):
            block = pixels[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(np.float64) - 128
            coefs = np.round(_fdct(block)).astype(np.int64)
            out.append([int(coefs.ravel()[_ZIGZAG[i]]) for i in range(64)])
    return out


_PAC_BITS = [0, 0, 0, 0, 0, 0, 0, 128, 128, 0, 0, 0, 0, 0, 0, 0]
_PAC_VALS = list(range(256))


def encode_grayscale_progressive_jpeg(pixels: "np.ndarray") -> bytes:
    """uint8 (h, w) -> PROGRESSIVE (SOF2) JFIF bytes; h, w multiples of 8.

    Four-scan successive-approximation script exercising every progressive
    decode path: (1) DC first at Al=1, (2) DC refinement, (3) AC
    spectral-selection first at Al=1 with cross-block EOBRUN, (4) AC
    refinement with correction bits / newly-nonzero placement / buffered
    EOB-run bits — the encoder mirrors libjpeg's jcphuff
    encode_mcu_AC_{first,refine} exactly, so the coefficient round trip
    is LOSSLESS: the decoder must reconstruct bit-identical coefficients
    to the baseline encoding of the same pixels."""
    h, w = pixels.shape
    assert h % 8 == 0 and w % 8 == 0
    dc = _codes(_DC_BITS, _DC_VALS)
    # progressive AC scans emit EOBn symbols (r<<4 | 0, r >= 1) which the
    # baseline Annex-K table does not contain — use a flat canonical table
    # (128 symbols at 8 bits + 128 at 9; Kraft sum 0.75, valid prefix code;
    # a DHT bits field is one byte per length, so 256-at-one-length can't
    # be declared)
    ac = _codes(_PAC_BITS, _PAC_VALS)
    flat = _block_coefs(pixels)

    # scan 1: DC first, Ah=0 Al=1 (arithmetic-shift point transform)
    bw = _BitWriter()
    pred = 0
    for zz in flat:
        v = zz[0] >> 1
        s, bits = _magnitude(v - pred)
        pred = v
        bw.write(*dc[s])
        if s:
            bw.write(bits, s)
    scan_dc1 = bw.flush()

    # scan 2: DC refinement, Ah=1 Al=0 — one raw magnitude bit per block
    bw = _BitWriter()
    for zz in flat:
        bw.write(zz[0] & 1, 1)
    scan_dc2 = bw.flush()

    # scan 3: AC first, Ss=1 Se=63 Ah=0 Al=1 (magnitudes truncated toward
    # zero), EOB runs accumulated across blocks
    bw = _BitWriter()
    eobrun = 0

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun:
            nb = eobrun.bit_length() - 1
            bw.write(*ac[nb << 4])
            if nb:
                bw.write(eobrun - (1 << nb), nb)
            eobrun = 0

    for zz in flat:
        run = 0
        for k in range(1, 64):
            t = abs(zz[k]) >> 1
            if t == 0:
                run += 1
                continue
            flush_eob()
            while run > 15:
                bw.write(*ac[0xF0])
                run -= 16
            s, bits = _magnitude(t if zz[k] > 0 else -t)
            bw.write(*ac[(run << 4) | s])
            bw.write(bits, s)
            run = 0
        if run > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    scan_ac1 = bw.flush()

    # scan 4: AC refinement, Ss=1 Se=63 Ah=1 Al=0 — correction bits for
    # already-nonzero coefs, (run, 1) symbols for newly-nonzero ones,
    # buffered bits riding ZRL / EOBn symbols (jcphuff's BR/BE buffers)
    bw = _BitWriter()
    eobrun = 0
    be: list[int] = []

    def flush_eob_refine() -> None:
        nonlocal eobrun, be
        if eobrun:
            nb = eobrun.bit_length() - 1
            bw.write(*ac[nb << 4])
            if nb:
                bw.write(eobrun - (1 << nb), nb)
            for b in be:
                bw.write(b, 1)
            be = []
            eobrun = 0

    for zz in flat:
        run = 0
        br: list[int] = []
        eob_k = max((k for k in range(1, 64) if zz[k] != 0), default=0)
        for k in range(1, 64):
            t = abs(zz[k])  # Al = 0
            if t == 0:
                run += 1
                continue
            while run > 15 and k <= eob_k:
                flush_eob_refine()
                bw.write(*ac[0xF0])
                run -= 16
                for b in br:
                    bw.write(b, 1)
                br = []
            if t > 1:  # history-nonzero: correction bit only
                br.append(t & 1)
                continue
            flush_eob_refine()
            bw.write(*ac[(run << 4) | 1])
            bw.write(1 if zz[k] > 0 else 0, 1)
            for b in br:
                bw.write(b, 1)
            br = []
            run = 0
        if run > 0 or br:
            eobrun += 1
            be.extend(br)
            if eobrun == 0x7FFF:
                flush_eob_refine()
    flush_eob_refine()
    scan_ac2 = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def sos(ss: int, se: int, ah: int, al: int) -> bytes:
        return seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))

    out = b"\xff\xd8"  # SOI
    out += seg(0xDB, bytes([0]) + bytes([1] * 64))  # DQT id 0, all ones
    out += seg(0xC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))  # SOF2
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))  # DHT DC
    out += seg(0xC4, bytes([0x10]) + bytes(_PAC_BITS) + bytes(_PAC_VALS))  # DHT AC (flat)
    out += sos(0, 0, 0, 1) + scan_dc1
    out += sos(0, 0, 1, 0) + scan_dc2
    out += sos(1, 63, 0, 1) + scan_ac1
    out += sos(1, 63, 1, 0) + scan_ac2
    out += b"\xff\xd9"  # EOI
    return out
