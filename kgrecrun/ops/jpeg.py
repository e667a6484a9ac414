"""Baseline JPEG codec (pure numpy/stdlib) — closes the dominant-web-
image-format gap in the multimodal family (VERDICT r3 item 10): the
media decode stage previously routed JPEG to the error column; it now
decodes baseline (SOF0/SOF1) JPEG natively, like the BMP/PNG/WAV
codecs in ops/media.py.

Decoder (:func:`decode_jpeg`): marker parse (DQT incl. 16-bit tables,
SOF0/1/2, DHT, DRI, SOS, APPn/COM skip), canonical Huffman decode of
the interleaved MCU entropy stream (byte unstuffing, restart-marker DC
resets), dequantize + dezigzag, vectorized orthonormal 8×8 IDCT
(one einsum over all blocks), and returns the **luma (Y) plane** as
(h, w) uint8 — exactly the grayscale surface every media operator here
consumes (features / resize / aHash); chroma blocks are entropy-decoded
to keep the bitstream in sync but never reconstructed. Progressive
(SOF2) streams run the T.81 G.2 successive-approximation passes
(DC/AC first + refinement scans, EOB runs, per-scan Huffman/DRI
snapshots); scans that cannot touch the luma plane are skipped outright
— progressive entropy data is scan-local, so skipping preserves sync.
Lossless/hierarchical/arithmetic-coded JPEGs raise
``NotImplementedError`` into the stage's error column.

Encoders: :func:`encode_jpeg` (baseline, Annex-K example tables,
libjpeg quality scaling) and :func:`encode_jpeg_progressive` (SOF2,
libjpeg's default successive-approximation scan script) — they exist so
round-trip and invariance tests need no external fixture files. Both
share :func:`_prepare_planes`, so the two entropy layouts carry
bit-identical quantized coefficients: the progressive tests assert
bit-identical decoded luma across layouts, a much stronger check than
bounded pixel error. JPEG is lossy: round-trip tests bound pixel error
(flat blocks reconstruct near-exactly; smooth gradients within a few
grey levels at q≥90), they do not byte-compare against the input.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# JPEG spec Annex K.1 example quantization tables (public constants)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

# orthonormal DCT-II basis: dct = C @ x @ C.T, idct = C.T @ X @ C
_C = np.array([[np.sqrt((1.0 if k == 0 else 2.0) / 8.0)
                * np.cos((2 * n + 1) * k * np.pi / 16.0)
                for n in range(8)] for k in range(8)])
# JPEG's DCT uses scale 1/4 · c(u)c(v) relative to the orthonormal
# basis folded here via alpha: coef_jpeg == orthonormal coef (they
# coincide for the 8-point normalized transform above)


def _canonical_codes(bits: list[int], vals: list) -> dict:
    """(length, code) → symbol, canonical Huffman assignment."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


# ---------------------------------------------------------------- decode

class _BitReader:
    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            return 0  # spec: pad with 1s/0s at stream end; EOB-safe
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG entropy stream")


def _ac_first(reader: _BitReader, ac_tbl: dict, blk: np.ndarray,
              ss: int, se: int, al: int, eobrun: int) -> int:
    """Progressive AC first pass (T.81 G.2, Ah=0) over one block's
    zigzag band; returns the remaining end-of-band run."""
    if eobrun:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(reader, ac_tbl)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:  # EOBn: run of (1<<r) + ext end-of-band blocks
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.receive(r)
                return eobrun
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("AC index overflow in progressive scan")
            blk[k] = _extend(reader.receive(s), s) << al
            k += 1
    return 0


def _refine_nonzero(reader: _BitReader, blk: np.ndarray, k: int,
                    bit: int) -> None:
    """Append this scan's correction bit to an already-nonzero coef
    (magnitude grows toward the true value; sign never changes)."""
    if reader.read_bit() and not (blk[k] & bit):
        blk[k] += bit if blk[k] > 0 else -bit


def _ac_refine(reader: _BitReader, ac_tbl: dict, blk: np.ndarray,
               ss: int, se: int, al: int, eobrun: int) -> int:
    """Progressive AC refinement pass (T.81 G.2, Ah>0): newly-nonzero
    coefficients arrive as ±1<<Al; already-nonzero ones receive one
    correction bit each, consumed in positional order during the
    traversal that follows each symbol."""
    bit = 1 << al
    if eobrun:
        for k in range(ss, se + 1):
            if blk[k]:
                _refine_nonzero(reader, blk, k, bit)
        return eobrun - 1
    k = ss
    hit_eob = False
    while k <= se:
        rs = _huff_decode(reader, ac_tbl)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:
                # run length AFTER this block; EOB0 (r=0) still ends
                # THIS block, whose tail corrections follow immediately
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.receive(r)
                hit_eob = True
                break  # rest of this block is correction bits only
            newval = 0  # ZRL: skip 16 zero-history coefficients
        else:
            # s == 1 in any valid refinement scan
            newval = bit if reader.read_bit() else -bit
        while k <= se:
            if blk[k]:
                _refine_nonzero(reader, blk, k, bit)
            else:
                if r == 0:
                    break
                r -= 1
            k += 1
        if newval and k <= se:
            blk[k] = newval
        k += 1
    if hit_eob:
        while k <= se:
            if blk[k]:
                _refine_nonzero(reader, blk, k, bit)
            k += 1
        return eobrun
    return 0


def _decode_progressive(comps: list[dict], scans: list[dict],
                        w: int, h: int) -> np.ndarray:
    """Apply every scan's DC/AC first+refinement passes to per-block
    zigzag coefficient arrays; returns the LUMA array (n_blocks, 64) in
    padded-grid raster order. Scans that cannot touch the luma plane
    (chroma AC / chroma-only DC) are skipped outright — progressive
    entropy data is scan-local, so skipping preserves sync."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for c in comps:
        c["bw_pad"] = mcus_x * c["h"]
        c["bh_pad"] = mcus_y * c["v"]
        c["bw"] = -(-(-(-w * c["h"] // hmax)) // 8)
        c["bh"] = -(-(-(-h * c["v"] // vmax)) // 8)
    coefs = [np.zeros((c["bh_pad"] * c["bw_pad"], 64), dtype=np.int64)
             for c in comps]
    for scan in scans:
        if all(ci != 0 for ci, _, _ in scan["comps"]):
            continue
        _decode_prog_scan(scan, comps, coefs, mcus_x, mcus_y)
    return coefs[0]


def _decode_prog_scan(scan: dict, comps: list[dict],
                      coefs: list[np.ndarray],
                      mcus_x: int, mcus_y: int) -> None:
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    huff, ri = scan["huff"], scan["ri"]
    scomps = scan["comps"]
    interleaved = len(scomps) > 1
    segments = scan["segments"]
    seg_idx = 0
    reader = _BitReader(segments[0])
    if ss == 0:  # DC scan (first or refinement)
        pred = {ci: 0 for ci, _, _ in scomps}
        n_units = (mcus_x * mcus_y if interleaved
                   else comps[scomps[0][0]]["bh"] * comps[scomps[0][0]]["bw"])
        for u in range(n_units):
            if ri and u and u % ri == 0:
                seg_idx += 1
                reader = _BitReader(segments[seg_idx])
                pred = {ci: 0 for ci, _, _ in scomps}
            if interleaved:
                my, mx = divmod(u, mcus_x)
                for ci, td, _ in scomps:
                    comp = comps[ci]
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            idx = ((my * comp["v"] + by) * comp["bw_pad"]
                                   + mx * comp["h"] + bx)
                            _dc_pass(reader, huff, td, coefs[ci][idx],
                                     pred, ci, ah, al)
            else:
                ci, td, _ = scomps[0]
                comp = comps[ci]
                row, col = divmod(u, comp["bw"])
                _dc_pass(reader, huff, td,
                         coefs[ci][row * comp["bw_pad"] + col],
                         pred, ci, ah, al)
    else:  # AC scan — always single-component (T.81 B.2.3)
        ci, _, ta = scomps[0]
        comp = comps[ci]
        ac_tbl = huff[(1, ta)]
        eobrun = 0
        for u in range(comp["bh"] * comp["bw"]):
            if ri and u and u % ri == 0:
                seg_idx += 1
                reader = _BitReader(segments[seg_idx])
                eobrun = 0
            row, col = divmod(u, comp["bw"])
            blk = coefs[ci][row * comp["bw_pad"] + col]
            if ah == 0:
                eobrun = _ac_first(reader, ac_tbl, blk, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine(reader, ac_tbl, blk, ss, se, al, eobrun)


def _dc_pass(reader: _BitReader, huff: dict, td: int, blk: np.ndarray,
             pred: dict, ci: int, ah: int, al: int) -> None:
    if ah == 0:  # first pass: diff-coded DC at reduced precision
        s = _huff_decode(reader, huff[(0, td)])
        pred[ci] += _extend(reader.receive(s), s)
        blk[0] = pred[ci] << al
    else:  # refinement: one raw bit; OR works because the low Al bits
        # of the two's-complement stored value are still zero
        blk[0] |= reader.read_bit() << al


def _reconstruct_luma(zz_blocks: np.ndarray, comps: list[dict],
                      quant: dict, w: int, h: int) -> np.ndarray:
    """Dequantize + IDCT luma coefficient blocks (padded-grid raster
    order) and crop to the image's luma dimensions."""
    luma = comps[0]
    q = quant[luma["tq"]]
    coefs = (zz_blocks[:, UNZIGZAG].reshape(-1, 8, 8) * q).astype(np.float64)
    blocks = np.einsum("ij,njk,kl->nil", _C.T, coefs, _C) + 128.0
    blocks = np.clip(np.rint(blocks), 0, 255).astype(np.uint8)
    bh, bw = luma["bh_pad"], luma["bw_pad"]
    plane = (blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
             .reshape(bh * 8, bw * 8))
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    return plane[:-(-h * luma["v"] // vmax), :-(-w * luma["h"] // hmax)]


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline or progressive JPEG → luma plane (h, w) uint8
    (module docstring)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) → code table
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    progressive = False
    i = 2
    scans: list[dict] = []
    n = len(payload)
    while i < n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", payload[i:i + 2])
        if seg_len < 2:
            raise ValueError("malformed JPEG segment length")
        seg = payload[i + 2:i + seg_len]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0xF
                j += 1
                if pq:
                    q = np.frombuffer(seg[j:j + 128], dtype=">u2").astype(np.int64)
                    j += 128
                else:
                    q = np.frombuffer(seg[j:j + 64], dtype=np.uint8).astype(np.int64)
                    j += 64
                quant[tq] = q[UNZIGZAG].reshape(8, 8)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            h, w = struct.unpack(">HH", seg[1:5])
            nf = seg[5]
            for c in range(nf):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError("non-baseline JPEG SOF not supported")
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0xF
                bits = list(seg[j + 1:j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17:j + 17 + nv])
                huff[(tc, th)] = _canonical_codes(bits, vals)
                j += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cid, tda = seg[1 + 2 * c:3 + 2 * c]
                for ci, comp in enumerate(comps):
                    if comp["id"] == cid:
                        scan_comps.append((ci, tda >> 4, tda & 0xF))
            ss, se, ahal = seg[1 + 2 * ns:4 + 2 * ns]
            # entropy data runs to the next non-RST marker; split at
            # RSTs and unstuff each segment
            segments = []
            j = i + seg_len
            seg_start = j
            while j < n - 1:
                if payload[j] == 0xFF and payload[j + 1] != 0x00:
                    if 0xD0 <= payload[j + 1] <= 0xD7:
                        segments.append(
                            payload[seg_start:j].replace(b"\xff\x00", b"\xff"))
                        j += 2
                        seg_start = j
                        continue
                    break
                j += 1
            segments.append(
                payload[seg_start:j].replace(b"\xff\x00", b"\xff"))
            # huff tables / DRI may be redefined between scans — snapshot
            scans.append({"comps": scan_comps, "ss": ss, "se": se,
                          "ah": ahal >> 4, "al": ahal & 0xF,
                          "segments": segments, "huff": dict(huff),
                          "ri": restart_interval})
            i = j
            continue
        i += seg_len
    if not comps or not scans:
        raise ValueError("JPEG missing SOF/SOS")
    if progressive:
        return _reconstruct_luma(_decode_progressive(comps, scans, w, h),
                                 comps, quant, w, h)
    scan_segments = scans[0]["segments"]
    for ci, td, ta in scans[0]["comps"]:
        comps[ci]["td"], comps[ci]["ta"] = td, ta
    huff = scans[0]["huff"]

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    luma = comps[0]
    blocks_per_mcu_x, blocks_per_mcu_y = luma["h"], luma["v"]
    plane_w, plane_h = mcus_x * 8 * blocks_per_mcu_x, mcus_y * 8 * blocks_per_mcu_y

    y_coefs: list[np.ndarray] = []  # dequantized luma blocks in MCU order
    pred = {c["id"]: 0 for c in comps}
    seg_idx = 0
    reader = _BitReader(scan_segments[0])
    n_mcus = mcus_x * mcus_y
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1
            reader = _BitReader(scan_segments[seg_idx])
            pred = {c["id"]: 0 for c in comps}
        for comp in comps:
            dc_tbl = huff[(0, comp["td"])]
            ac_tbl = huff[(1, comp["ta"])]
            q = quant[comp["tq"]]
            for _ in range(comp["h"] * comp["v"]):
                s = _huff_decode(reader, dc_tbl)
                diff = _extend(reader.receive(s), s)
                pred[comp["id"]] += diff
                zz = np.zeros(64, dtype=np.int64)
                zz[0] = pred[comp["id"]]
                k = 1
                while k < 64:
                    rs = _huff_decode(reader, ac_tbl)
                    r, size = rs >> 4, rs & 0xF
                    if size == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("AC coefficient index overflow")
                    zz[k] = _extend(reader.receive(size), size)
                    k += 1
                if comp is luma:
                    y_coefs.append((zz[UNZIGZAG].reshape(8, 8) * q))

    # vectorized IDCT over all luma blocks
    coefs = np.stack(y_coefs).astype(np.float64)
    blocks = np.einsum("ij,njk,kl->nil", _C.T, coefs, _C) + 128.0
    blocks = np.clip(np.rint(blocks), 0, 255).astype(np.uint8)

    plane = np.zeros((plane_h, plane_w), dtype=np.uint8)
    bi = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(blocks_per_mcu_y):
                for bx in range(blocks_per_mcu_x):
                    y0 = (my * blocks_per_mcu_y + by) * 8
                    x0 = (mx * blocks_per_mcu_x + bx) * 8
                    plane[y0:y0 + 8, x0:x0 + 8] = blocks[bi]
                    bi += 1
    # luma plane dims: ceil(h·v/vmax), ceil(w·h/hmax); crop to image
    crop_h = -(-h * luma["v"] // vmax)
    crop_w = -(-w * luma["h"] // hmax)
    return plane[:crop_h, :crop_w]


# ---------------------------------------------------------------- encode

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


def _enc_codes(bits, vals):
    """symbol → (code, length)."""
    table = _canonical_codes(bits, vals)
    return {sym: (code, length) for (length, code), sym in table.items()}


def _quality_scale(q_tbl: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (q_tbl * s + 50) // 100
    return np.clip(out, 1, 255)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes, ac_codes) -> int:
    dc = int(zz[0])
    diff = dc - pred
    s = _category(diff)
    code, length = dc_codes[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]
            bw.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return dc


def _blocks_of(plane: np.ndarray, ph: int, pw: int):
    """Pad to (ph, pw) — the component's MCU-grid-aligned dims — by
    edge replication, split into 8×8 blocks (row-major) →
    ((n, 8, 8) float64 centered at 0, blocks per row)."""
    padded = np.pad(plane.astype(np.float64),
                    ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                    mode="edge") - 128.0
    return (padded.reshape(ph // 8, 8, pw // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8)), pw // 8


def _prepare_planes(img: np.ndarray, quality: int, subsample: bool) -> dict:
    """Color transform / subsample / pad / DCT / quantize — shared by
    the baseline and progressive encoders so both entropy layouts carry
    IDENTICAL quantized coefficients (the cross-layout exactness tests
    rely on this). Returns per-plane zigzag coefficient arrays in
    padded-MCU-grid raster order plus the grid geometry."""
    color = img.ndim == 3
    h, w = img.shape[:2]
    ql = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)
    if color:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] \
            + 0.5 * rgb[..., 2] + 128.0
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] \
            - 0.081312 * rgb[..., 2] + 128.0
        planes = [np.clip(np.rint(y), 0, 255).astype(np.uint8)]
        for c in (cb, cr):
            c = np.clip(np.rint(c), 0, 255)
            if subsample:
                ph = -(-h // 2) * 2
                pw = -(-w // 2) * 2
                c = np.pad(c, ((0, ph - h), (0, pw - w)), mode="edge")
                c = c.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            planes.append(np.clip(np.rint(c), 0, 255).astype(np.uint8))
        samp = [(2, 2), (1, 1), (1, 1)] if subsample else \
            [(1, 1), (1, 1), (1, 1)]
        qids = [0, 1, 1]
    else:
        planes = [img.astype(np.uint8)]
        samp = [(1, 1)]
        qids = [0]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per-plane quantized coefficient blocks in raster order, each
    # plane padded to ITS MCU-grid-aligned dims (mcus × sampling × 8)
    plane_zz = []
    plane_bw = []  # blocks per (padded) row
    for ci, plane in enumerate(planes):
        hs, vs = samp[ci]
        blocks, bpr = _blocks_of(plane, mcus_y * vs * 8, mcus_x * hs * 8)
        q = (ql if qids[ci] == 0 else qc).reshape(8, 8).astype(np.float64)
        coefs = np.einsum("ij,njk,kl->nil", _C, blocks, _C.T) / q
        zz = np.rint(coefs.reshape(-1, 64)[:, ZIGZAG]).astype(np.int64)
        plane_zz.append(zz)
        plane_bw.append(bpr)
    return {"color": color, "h": h, "w": w, "samp": samp, "qids": qids,
            "ql": ql, "qc": qc, "plane_zz": plane_zz, "plane_bw": plane_bw,
            "mcus_x": mcus_x, "mcus_y": mcus_y}


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsample: bool = True, restart_interval: int = 0) -> bytes:
    """(h, w) uint8 grayscale → baseline grayscale JPEG, or
    (h, w, 3) uint8 RGB → baseline YCbCr JPEG (4:2:0 when ``subsample``
    else 4:4:4). Annex-K tables, libjpeg quality scaling.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (exercises the decoder's restart-resync path)."""
    p = _prepare_planes(img, quality, subsample)
    color, h, w = p["color"], p["h"], p["w"]
    samp, qids, ql, qc = p["samp"], p["qids"], p["ql"], p["qc"]
    plane_zz, plane_bw = p["plane_zz"], p["plane_bw"]
    mcus_x, mcus_y = p["mcus_x"], p["mcus_y"]
    n_planes = len(samp)
    tids = [(0, 0), (1, 1), (1, 1)][:n_planes]

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(b"\xff" + bytes([marker])
                   + struct.pack(">H", len(body) + 2) + body)

    seg(0xDB, bytes([0]) + bytes(ql[ZIGZAG].tolist()))
    if color:
        seg(0xDB, bytes([1]) + bytes(qc[ZIGZAG].tolist()))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([n_planes])
    for ci, (hs, vs) in enumerate(samp):
        sof += bytes([ci + 1, (hs << 4) | vs, qids[ci]])
    seg(0xC0, sof)
    tables = [(0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
              (1, 0, AC_LUMA_BITS, AC_LUMA_VALS)]
    if color:
        tables += [(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
                   (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for tc, th, bits, vals in tables:
        seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([n_planes])
    for ci, (td, ta) in enumerate(tids):
        sos += bytes([ci + 1, (td << 4) | ta])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    dc_l = _enc_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _enc_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _enc_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _enc_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    bw = _BitWriter()
    pred = [0] * n_planes
    mcu_i = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                out.extend(bw.flush())
                out.extend(b"\xff" + bytes([0xD0 + rst]))
                rst = (rst + 1) % 8
                bw = _BitWriter()
                pred = [0] * n_planes
            mcu_i += 1
            for ci in range(n_planes):
                hs, vs = samp[ci]
                dc_codes = dc_l if ci == 0 else dc_c
                ac_codes = ac_l if ci == 0 else ac_c
                for by in range(vs):
                    for bx in range(hs):
                        row = my * vs + by
                        col = mx * hs + bx
                        idx = row * plane_bw[ci] + col
                        pred[ci] = _encode_block(
                            bw, plane_zz[ci][idx], pred[ci],
                            dc_codes, ac_codes)
    out.extend(bw.flush())
    out.extend(b"\xff\xd9")
    return bytes(out)


# ------------------------------------------------- progressive encode

# Fixed-length Huffman tables for the progressive encoder. Progressive
# AC scans need EOBn symbols (rrrr<<4 for rrrr<15), which the Annex-K
# baseline tables do not contain, so a flat table is defined instead:
# every symbol a progressive scan can emit gets one 8-bit code (176
# symbols ≤ 255, and the all-ones code 0xFF stays unused as T.81 Annex C
# requires). Compression is worse than frequency-optimized tables —
# irrelevant here, where the encoder exists to exercise the decoder's
# progressive paths without external fixture files.
PROG_DC_BITS = [0, 0, 0, 12] + [0] * 12  # categories 0..11, 4 bits each
PROG_DC_VALS = list(range(12))
PROG_AC_VALS = ([r << 4 for r in range(15)]            # EOB0..EOB14
                + [0xF0]                               # ZRL
                + [(r << 4) | s for r in range(16)
                   for s in range(1, 11)])             # (run, size)
PROG_AC_BITS = [0] * 16
PROG_AC_BITS[7] = len(PROG_AC_VALS)  # all codes 8 bits long


class _ProgScanWriter:
    """Entropy writer for one progressive scan: wraps _BitWriter with
    the EOB-run and buffered-correction-bit state of T.81 G.1.2
    (mirrors libjpeg's EOBRUN / BE / BR bookkeeping)."""

    def __init__(self, dc_codes: dict, ac_codes: dict):
        self.dc = dc_codes
        self.ac = ac_codes
        self.bw = _BitWriter()
        self.eobrun = 0
        self.be: list[int] = []  # correction bits pending behind EOBn
        self.out = bytearray()

    def symbol(self, table: dict, sym: int) -> None:
        code, length = table[sym]
        self.bw.write(code, length)

    def value(self, v: int, s: int) -> None:
        self.bw.write(v if v >= 0 else v + (1 << s) - 1, s)

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            nb = self.eobrun.bit_length() - 1
            self.symbol(self.ac, nb << 4)
            if nb:
                self.bw.write(self.eobrun - (1 << nb), nb)
            self.eobrun = 0
            for b in self.be:
                self.bw.write(b, 1)
            self.be = []

    def restart(self, rst: int) -> None:
        self.flush_eobrun()
        self.out.extend(self.bw.flush())
        self.out.extend(b"\xff" + bytes([0xD0 + rst]))
        self.bw = _BitWriter()

    def finish(self) -> bytes:
        self.flush_eobrun()
        self.out.extend(self.bw.flush())
        return bytes(self.out)


def _enc_ac_first(w: _ProgScanWriter, zz: np.ndarray,
                  ss: int, se: int, al: int) -> None:
    """AC first pass (Ah=0) for one block's band: magnitudes are the
    point-transformed |coef|>>Al (toward zero), all-zero bands extend
    the EOB run."""
    mags = np.abs(zz[ss:se + 1]) >> al
    if not mags.any():
        w.eobrun += 1
        if w.eobrun == 0x7FFF:
            w.flush_eobrun()
        return
    w.flush_eobrun()
    r = 0
    last_nz = ss + int(np.max(np.nonzero(mags)[0]))
    for k in range(ss, se + 1):
        m = int(mags[k - ss])
        if m == 0:
            r += 1
            continue
        while r > 15:
            w.symbol(w.ac, 0xF0)
            r -= 16
        s = m.bit_length()
        w.symbol(w.ac, (r << 4) | s)
        w.value(m if zz[k] > 0 else -m, s)
        r = 0
    if last_nz < se:  # trailing zeros fold into the EOB run
        w.eobrun += 1
        if w.eobrun == 0x7FFF:
            w.flush_eobrun()


def _enc_ac_refine(w: _ProgScanWriter, zz: np.ndarray,
                   ss: int, se: int, al: int) -> None:
    """AC refinement pass (Ah=Al+1) for one block's band: newly-nonzero
    coefficients (|coef|>>Al == 1) are Huffman-coded with a sign bit;
    already-nonzero ones contribute one buffered correction bit each,
    emitted after the next symbol (libjpeg's BR buffer). ZRLs are
    drained BEFORE buffering a correction so every buffered bit lies
    inside the decoder's 16-zero traversal window."""
    mags = np.abs(zz[ss:se + 1]) >> al
    ones = np.nonzero(mags == 1)[0]
    eob_idx = ss + int(ones[-1]) if ones.size else ss - 1
    r = 0
    br: list[int] = []  # correction bits since the last emitted symbol
    for k in range(ss, se + 1):
        m = int(mags[k - ss])
        if m == 0:
            r += 1
            continue
        while r > 15 and k <= eob_idx:
            w.flush_eobrun()
            w.symbol(w.ac, 0xF0)
            r -= 16
            for b in br:
                w.bw.write(b, 1)
            br = []
        if m > 1:  # already nonzero: buffer its correction bit
            br.append(m & 1)
            continue
        w.flush_eobrun()
        w.symbol(w.ac, (r << 4) | 1)
        w.bw.write(1 if zz[k] > 0 else 0, 1)
        for b in br:
            w.bw.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        w.eobrun += 1
        w.be.extend(br)
        if w.eobrun == 0x7FFF:
            w.flush_eobrun()


def encode_jpeg_progressive(img: np.ndarray, quality: int = 90,
                            subsample: bool = True,
                            restart_interval: int = 0) -> bytes:
    """Progressive (SOF2) JPEG with libjpeg's default successive-
    approximation scan script. Shares :func:`_prepare_planes` with the
    baseline encoder, so for any (img, quality, subsample) the two
    layouts carry bit-identical quantized coefficients and
    :func:`decode_jpeg` must reconstruct bit-identical luma planes —
    the cross-layout exactness the tests assert."""
    p = _prepare_planes(img, quality, subsample)
    color, h, w = p["color"], p["h"], p["w"]
    samp, qids, ql, qc = p["samp"], p["qids"], p["ql"], p["qc"]
    plane_zz, plane_bw = p["plane_zz"], p["plane_bw"]
    mcus_x, mcus_y = p["mcus_x"], p["mcus_y"]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # unpadded per-component block grids (non-interleaved scan order)
    grid = []
    for hs, vs in samp:
        bw_u = -(--(-w * hs // hmax) // 8)
        bh_u = -(--(-h * vs // vmax) // 8)
        grid.append((bh_u, bw_u))

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(b"\xff" + bytes([marker])
                   + struct.pack(">H", len(body) + 2) + body)

    seg(0xDB, bytes([0]) + bytes(ql[ZIGZAG].tolist()))
    if color:
        seg(0xDB, bytes([1]) + bytes(qc[ZIGZAG].tolist()))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(samp)])
    for ci, (hs, vs) in enumerate(samp):
        sof += bytes([ci + 1, (hs << 4) | vs, qids[ci]])
    seg(0xC2, sof)
    seg(0xC4, bytes([0x00]) + bytes(PROG_DC_BITS) + bytes(PROG_DC_VALS))
    seg(0xC4, bytes([0x10]) + bytes(PROG_AC_BITS) + bytes(PROG_AC_VALS))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))

    dc_codes = _enc_codes(PROG_DC_BITS, PROG_DC_VALS)
    ac_codes = _enc_codes(PROG_AC_BITS, PROG_AC_VALS)

    # libjpeg default script (jcparam.c): DC first at Al=1, split AC
    # first passes, then one refinement per successive-approximation
    # level, luma last
    if color:
        script = [([0, 1, 2], 0, 0, 0, 1),
                  ([0], 1, 5, 0, 2), ([2], 1, 63, 0, 1),
                  ([1], 1, 63, 0, 1), ([0], 6, 63, 0, 2),
                  ([0], 1, 63, 2, 1), ([0, 1, 2], 0, 0, 1, 0),
                  ([2], 1, 63, 1, 0), ([1], 1, 63, 1, 0),
                  ([0], 1, 63, 1, 0)]
    else:
        script = [([0], 0, 0, 0, 1), ([0], 1, 5, 0, 2),
                  ([0], 6, 63, 0, 2), ([0], 1, 63, 2, 1),
                  ([0], 0, 0, 1, 0), ([0], 1, 63, 1, 0)]

    for scomps, ss, se, ah, al in script:
        sos = bytes([len(scomps)])
        for ci in scomps:
            sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
        sos += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, sos)
        wtr = _ProgScanWriter(dc_codes, ac_codes)
        rst = 0
        if ss == 0:  # DC scan
            interleaved = len(scomps) > 1
            n_units = (mcus_x * mcus_y if interleaved
                       else grid[scomps[0]][0] * grid[scomps[0]][1])
            pred = {ci: 0 for ci in scomps}
            for u in range(n_units):
                if restart_interval and u and u % restart_interval == 0:
                    wtr.restart(rst)
                    rst = (rst + 1) % 8
                    pred = {ci: 0 for ci in scomps}
                if interleaved:
                    my, mx = divmod(u, mcus_x)
                    blocks = []
                    for ci in scomps:
                        hs, vs = samp[ci]
                        for by in range(vs):
                            for bx in range(hs):
                                idx = ((my * vs + by) * plane_bw[ci]
                                       + mx * hs + bx)
                                blocks.append((ci, idx))
                else:
                    ci = scomps[0]
                    row, col = divmod(u, grid[ci][1])
                    blocks = [(ci, row * plane_bw[ci] + col)]
                for ci, idx in blocks:
                    dc = int(plane_zz[ci][idx][0])
                    if ah == 0:  # first pass: diff-coded DC >> Al
                        v = dc >> al  # arithmetic shift, like libjpeg
                        diff = v - pred[ci]
                        pred[ci] = v
                        s = _category(diff)
                        wtr.symbol(dc_codes, s)
                        if s:
                            wtr.value(diff, s)
                    else:  # refinement: one raw bit per block
                        wtr.bw.write((dc >> al) & 1, 1)
        else:  # AC scan — single component
            ci = scomps[0]
            bh_u, bw_u = grid[ci]
            for u in range(bh_u * bw_u):
                if restart_interval and u and u % restart_interval == 0:
                    wtr.restart(rst)
                    rst = (rst + 1) % 8
                row, col = divmod(u, bw_u)
                zz = plane_zz[ci][row * plane_bw[ci] + col]
                if ah == 0:
                    _enc_ac_first(wtr, zz, ss, se, al)
                else:
                    _enc_ac_refine(wtr, zz, ss, se, al)
        out.extend(wtr.finish())
    out.extend(b"\xff\xd9")
    return bytes(out)
