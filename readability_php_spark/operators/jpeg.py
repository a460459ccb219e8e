"""Sequential-baseline AND progressive JPEG codec — stdlib only.

The container ships no PIL/libjpeg, and JPEG is the #1 web image format,
so the curation pipeline gets a from-scratch decoder for both baseline
(SOF0/1) and progressive (SOF2, ITU T.81 §G — a large share of real web
JPEGs) streams: marker-segment parse → canonical-Huffman entropy decode
(with restart markers and byte unstuffing; for progressive, spectral
selection + successive approximation accumulated across scans into a
per-block coefficient store, incl. EOB runs and AC refinement correction
bits in the libjpeg bit discipline) → dequantize → 8×8 float IDCT →
chroma upsample → JFIF YCbCr→RGB.  Grayscale and 3-component images at
any (h,v) ∈ {1,2} sampling factors decode; arithmetic coding, 12-bit
precision, and hierarchical raise :class:`JpegPixelsUnavailable` so the
feature extractor can fall back to header-only dimensions.

The encoders exist for fixtures and gates: they emit spec-valid JFIF
streams (own DQT/DHT tables, interleaved MCUs, optional restart markers;
the progressive one a multi-scan Al=2→1→0 spectral script) AND the exact
pixel reconstruction an ideal decoder must produce (dequantized
coefficients through the SAME IDCT/upsample/color-convert functions the
decoder uses) — so round-trip tests compare byte-exact decoded pixels,
not "looks close".  JPEG is lossy; the encoder's *reconstruction* is the
ground truth, not its input.  Baseline and progressive encodings of one
image carry the SAME quantized coefficients, so their decodes must agree
byte-for-byte — the cross-codec oracle the tests exploit.

No counterpart in the reference repo (readability.php is text-only);
this is beyond-reference training-data-pipeline surface.
"""

from __future__ import annotations

import math

__all__ = [
    "JpegPixelsUnavailable",
    "decode_jpeg",
    "encode_jpeg",
    "encode_jpeg_with_recon",
    "encode_progressive_jpeg_with_recon",
]


class JpegPixelsUnavailable(NotImplementedError):
    """Structurally-valid JPEG whose pixel stream this decoder doesn't
    cover (arithmetic, 12-bit, hierarchical, or no scan present):
    callers can still use header dimensions."""


# zigzag position -> natural (row*8+col) index
_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
)

_COS = [[math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)] for u in range(8)]
_CU = [1 / math.sqrt(2)] + [1.0] * 7

#: default quantization tables.  DC step 8 makes solid-color blocks
#: reconstruct EXACTLY (DC = 8·(v−128) quantizes losslessly), which the
#: oracle gate exploits; AC steps are a flat mid-quality 16.
DEFAULT_QUANT_LUMA = (8,) + (16,) * 63
DEFAULT_QUANT_CHROMA = (8,) + (24,) * 63


def _idct_block(coef: list) -> list:
    """coef: 64 dequantized values in natural order → 64 floats (separable
    row/column passes; shared by decoder and encoder reconstruction so
    both produce bit-identical floats)."""
    tmp = [0.0] * 64
    for v in range(8):
        row = coef[v * 8 : v * 8 + 8]
        orow = tmp
        for x in range(8):
            s = 0.0
            for u in range(8):
                c = row[u]
                if c:
                    s += _CU[u] * c * _COS[u][x]
            orow[v * 8 + x] = s
    out = [0.0] * 64
    for x in range(8):
        for y in range(8):
            s = 0.0
            for v in range(8):
                t = tmp[v * 8 + x]
                if t:
                    s += _CU[v] * t * _COS[v][y]
            out[y * 8 + x] = s / 4.0
    return out


def _fdct_block(samples: list) -> list:
    """64 level-shifted ints → 64 DCT coefficients, natural order."""
    tmp = [0.0] * 64
    for y in range(8):
        for u in range(8):
            s = 0.0
            for x in range(8):
                s += samples[y * 8 + x] * _COS[u][x]
            tmp[y * 8 + u] = s
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                s += tmp[y * 8 + u] * _COS[v][y]
            out[v * 8 + u] = s * _CU[u] * _CU[v] / 4.0
    return out


def _clamp_block(vals: list) -> list:
    return [min(255, max(0, int(round(v + 128.0)))) for v in vals]


def _canonical_codes(bits: list, symbols: list) -> dict:
    """JPEG canonical Huffman: bits[i] = #codes of length i+1 → {symbol:
    (code, length)} (encoder view)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffTable:
    """Decoder view of a canonical table: per-length first code / count /
    symbol offset, decoded bit-serially (max 16 steps per symbol)."""

    def __init__(self, bits: list, symbols: list):
        self.symbols = symbols
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.valptr[length] = k
                self.mincode[length] = code
                self.maxcode[length] = code + n - 1
                code += n
                k += n
            else:
                self.maxcode[length] = -1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over an unstuffed entropy chunk."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data exhausted")
            self.buf = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if code <= table.maxcode[length]:
                return table.symbols[table.valptr[length] + code - table.mincode[length]]
        raise ValueError("bad JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """DC/AC magnitude decode: t-bit value v → signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _split_entropy(payload: bytes, pos: int) -> tuple:
    """Entropy-coded data from ``pos``: unstuff 0xFF00, split at restart
    markers → (chunks, end_pos just before the terminating marker)."""
    chunks = []
    cur = bytearray()
    n = len(payload)
    while pos < n:
        b = payload[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        if pos + 1 >= n:
            pos += 1
            break
        m = payload[pos + 1]
        if m == 0x00:
            cur.append(0xFF)
            pos += 2
        elif m == 0xFF:  # fill byte
            pos += 1
        elif 0xD0 <= m <= 0xD7:
            chunks.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # real marker: end of scan
            break
    chunks.append(bytes(cur))
    return chunks, pos


def _ycbcr_to_rgb(y: int, cb: int, cr: int) -> tuple:
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return (
        min(255, max(0, int(round(r)))),
        min(255, max(0, int(round(g)))),
        min(255, max(0, int(round(b)))),
    )


def _upsample_to_rgb(width, height, planes, comps, hmax, vmax) -> bytes:
    """Component planes (padded to full MCUs) → interleaved output.
    1 component → grayscale bytes; 3 → JFIF YCbCr→RGB.  Nearest-neighbor
    (box replication) chroma upsampling — shared by decoder and encoder
    reconstruction."""
    if len(comps) == 1:
        pw = comps[0]["pw"]
        plane = planes[0]
        out = bytearray(width * height)
        for yy in range(height):
            base = yy * pw
            row = plane[base : base + width]
            out[yy * width : (yy + 1) * width] = bytes(row)
        return bytes(out)
    out = bytearray(width * height * 3)
    for yy in range(height):
        for xx in range(width):
            vals = []
            for ci, comp in enumerate(comps):
                sx = xx * comp["h"] // hmax
                sy = yy * comp["v"] // vmax
                vals.append(planes[ci][sy * comp["pw"] + sx])
            r, g, b = _ycbcr_to_rgb(*vals)
            o = (yy * width + xx) * 3
            out[o] = r
            out[o + 1] = g
            out[o + 2] = b
    return bytes(out)


def decode_jpeg(payload: bytes, max_pixels: "int | None" = None) -> tuple:
    """Baseline JPEG → ``(width, height, pixels)``; pixels are width ×
    height bytes (grayscale) or ×3 (RGB), row-major.  ``ValueError`` on
    structural corruption, :class:`JpegPixelsUnavailable` on valid-but-
    unsupported streams (progressive/arithmetic/12-bit/scanless) AND on
    images over ``max_pixels`` — the pure-Python entropy decode is
    minutes-per-megapixel, so oversized images fall back to the caller's
    header-dimensions path instead of stalling an executor."""
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG: bad signature")
    quant = {}
    dc_tables = {}
    ac_tables = {}
    frame = None
    prog = None
    restart_interval = 0
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        while pos + 4 <= n and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xFF:
            break
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        if marker == 0xD9:
            break
        seg_len = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        if seg_len < 2 or pos + 2 + seg_len > n:
            raise ValueError("bad JPEG segment length")
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq != 0:
                    raise JpegPixelsUnavailable("16-bit quant tables unsupported")
                if i + 64 > len(body):
                    raise ValueError("truncated DQT")
                tbl = [0] * 64
                for z in range(64):
                    tbl[_ZIGZAG[z]] = body[i + z]
                quant[tq] = tbl
                i += 64
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                cnt = sum(bits)
                syms = list(body[i + 17 : i + 17 + cnt])
                if len(syms) < cnt:
                    raise ValueError("truncated DHT")
                (dc_tables if tc == 0 else ac_tables)[th] = _HuffTable(bits, syms)
                i += 17 + cnt
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / progressive SOF
            prec = body[0]
            if prec != 8:
                raise JpegPixelsUnavailable(f"{prec}-bit precision unsupported")
            height = int.from_bytes(body[1:3], "big")
            width = int.from_bytes(body[3:5], "big")
            nc = body[5]
            if nc not in (1, 3):
                raise JpegPixelsUnavailable(f"{nc}-component JPEG unsupported")
            if max_pixels is not None and width * height > max_pixels:
                raise JpegPixelsUnavailable(
                    f"image exceeds pixel budget ({width}x{height} > "
                    f"{max_pixels}px); dimensions remain available"
                )
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {
                "w": width, "h": height, "comps": comps,
                "progressive": marker == 0xC2,
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegPixelsUnavailable(
                f"non-baseline JPEG (SOF{marker - 0xC0}) unsupported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = {}
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan[cs] = (tt >> 4, tt & 0x0F)
            if not frame["progressive"]:
                return _decode_scan(
                    payload, pos + 2 + seg_len, frame, scan, quant,
                    dc_tables, ac_tables, restart_interval,
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            if prog is None:
                prog = _ProgressiveState(frame)
            pos = _decode_progressive_scan(
                payload, pos + 2 + seg_len, prog, scan,
                ss, se, ah, al, dc_tables, ac_tables, restart_interval,
            )
            continue
        pos += 2 + seg_len
    if prog is not None and prog.scans_done:
        return _finalize_progressive(frame, prog, quant)
    raise JpegPixelsUnavailable("JPEG has no scan data")


def _decode_scan(payload, pos, frame, scan, quant, dc_tables, ac_tables, ri):
    width, height, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps):
        raise JpegPixelsUnavailable("sampling factors outside {1,2} unsupported")
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    planes = []
    for c in comps:
        c["pw"] = mcus_x * 8 * c["h"]
        c["ph"] = mcus_y * 8 * c["v"]
        if c["tq"] not in quant:
            raise ValueError(f"missing quant table {c['tq']}")
        if c["id"] not in scan:
            raise JpegPixelsUnavailable("multi-scan JPEG unsupported")
        td, ta = scan[c["id"]]
        if td not in dc_tables or ta not in ac_tables:
            raise ValueError("missing Huffman table")
        c["q"] = quant[c["tq"]]
        c["dc"] = dc_tables[td]
        c["ac"] = ac_tables[ta]
        planes.append(bytearray(c["pw"] * c["ph"]))

    chunks, _end = _split_entropy(payload, pos)
    chunk_i = 0
    reader = _BitReader(chunks[0])
    preds = [0] * len(comps)
    total_mcus = mcus_x * mcus_y
    for mcu in range(total_mcus):
        if ri and mcu and mcu % ri == 0:
            chunk_i += 1
            if chunk_i >= len(chunks):
                raise ValueError("missing JPEG restart segment")
            reader = _BitReader(chunks[chunk_i])
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcus_x)
        for ci, c in enumerate(comps):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coef = [0] * 64
                    t = reader.decode_huff(c["dc"])
                    diff = _extend(reader.receive(t), t)
                    preds[ci] += diff
                    coef[0] = preds[ci] * c["q"][0]
                    z = 1
                    while z < 64:
                        rs = reader.decode_huff(c["ac"])
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL
                                z += 16
                                continue
                            break  # EOB
                        z += r
                        if z > 63:
                            raise ValueError("JPEG AC index overflow")
                        nat = _ZIGZAG[z]
                        coef[nat] = _extend(reader.receive(s), s) * c["q"][nat]
                        z += 1
                    block = _clamp_block(_idct_block(coef))
                    ox = (mx * c["h"] + bx) * 8
                    oy = (my * c["v"] + by) * 8
                    plane = planes[ci]
                    pw = c["pw"]
                    for yy in range(8):
                        row = (oy + yy) * pw + ox
                        plane[row : row + 8] = bytes(block[yy * 8 : yy * 8 + 8])
    return width, height, _upsample_to_rgb(width, height, planes, comps, hmax, vmax)


# --------------------------------------------------------------------------
# progressive decode (ITU T.81 §G): coefficients accumulate across scans
# --------------------------------------------------------------------------


class _ProgressiveState:
    """Per-component coefficient store for a progressive frame: one
    64-int natural-order block per position of the PADDED (full-MCU)
    grid; DC/AC scans write into it, :func:`_finalize_progressive`
    dequantizes + IDCTs once all scans are in.  Non-interleaved scans
    cover only the UNPADDED block range (T.81 A.2.2) — padded blocks
    keep whatever the interleaved DC scan gave them, which is invisible
    at the output (the upsampler never samples past the component's
    true extent)."""

    def __init__(self, frame):
        comps = frame["comps"]
        if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps):
            raise JpegPixelsUnavailable(
                "sampling factors outside {1,2} unsupported"
            )
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        self.hmax, self.vmax = hmax, vmax
        self.mcus_x = -(-frame["w"] // (8 * hmax))
        self.mcus_y = -(-frame["h"] // (8 * vmax))
        self.scans_done = 0
        self.coefs = []
        for c in comps:
            c["pw"] = self.mcus_x * 8 * c["h"]
            c["ph"] = self.mcus_y * 8 * c["v"]
            # unpadded block dims (non-interleaved scan coverage)
            cw = -(-frame["w"] * c["h"] // hmax)
            ch = -(-frame["h"] * c["v"] // vmax)
            c["bw"], c["bh"] = -(-cw // 8), -(-ch // 8)
            # padded block dims (storage stride / interleaved coverage)
            c["pbw"] = self.mcus_x * c["h"]
            c["pbh"] = self.mcus_y * c["v"]
            self.coefs.append(
                [[0] * 64 for _ in range(c["pbw"] * c["pbh"])]
            )
        self.comps = comps


def _refine_nonzero(blk, idx, reader, p1, m1):
    """One AC-refinement correction bit for an already-nonzero
    coefficient (T.81 G.1.2.3 / libjpeg decode_mcu_AC_refine): a 1 bit
    moves the coefficient one quantum AWAY from zero iff that quantum
    isn't already present."""
    if reader.read_bit():
        if (blk[idx] & p1) == 0:
            blk[idx] += p1 if blk[idx] >= 0 else m1


def _decode_progressive_scan(
    payload, pos, prog, scan, ss, se, ah, al, dc_tables, ac_tables, ri
):
    """Decode ONE progressive scan into the coefficient store; returns
    the payload position of the marker terminating the scan's entropy
    data.  Covers all four scan kinds: DC first (Ss=0, Ah=0 — diff
    Huffman, point transform <<Al), DC refinement (one raw bit per
    block), AC first (EOB-run coded band), AC refinement (correction
    bits per the libjpeg bit discipline).  Restart markers reset DC
    predictors and the EOB run."""
    comps = [c for c in prog.comps if c["id"] in scan]
    if len(comps) != len(scan):
        raise ValueError("progressive scan names unknown component")
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
    else:
        if len(comps) != 1:
            raise JpegPixelsUnavailable(
                "interleaved progressive AC scan unsupported (spec forbids)"
            )
    for c in comps:
        td, ta = scan[c["id"]]
        if ss == 0 and ah == 0:
            if td not in dc_tables:
                raise ValueError("missing Huffman table")
            c["dc"] = dc_tables[td]
        if ss > 0:
            if ta not in ac_tables:
                raise ValueError("missing Huffman table")
            c["ac"] = ac_tables[ta]
    chunks, end = _split_entropy(payload, pos)
    chunk_i = 0
    reader = _BitReader(chunks[0])
    p1, m1 = 1 << al, -(1 << al)

    def next_chunk():
        nonlocal chunk_i, reader
        chunk_i += 1
        if chunk_i >= len(chunks):
            raise ValueError("missing JPEG restart segment")
        reader = _BitReader(chunks[chunk_i])

    if ss == 0 and len(comps) > 1:
        # interleaved DC scan: frame MCU order
        preds = [0] * len(comps)
        total = prog.mcus_x * prog.mcus_y
        store = {c["id"]: prog.coefs[prog.comps.index(c)] for c in comps}
        for mcu in range(total):
            if ri and mcu and mcu % ri == 0:
                next_chunk()
                preds = [0] * len(comps)
            my, mx = divmod(mcu, prog.mcus_x)
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = store[c["id"]][
                            (my * c["v"] + by) * c["pbw"] + (mx * c["h"] + bx)
                        ]
                        if ah == 0:
                            t = reader.decode_huff(c["dc"])
                            diff = _extend(reader.receive(t), t)
                            preds[ci] += diff
                            blk[0] = preds[ci] << al
                        else:
                            if reader.read_bit():
                                blk[0] |= p1
        prog.scans_done += 1
        return end

    # non-interleaved: one component, raster over its UNPADDED blocks
    c = comps[0]
    store = prog.coefs[prog.comps.index(c)]
    pred = 0
    eobrun = 0
    total = c["bw"] * c["bh"]
    for unit in range(total):
        if ri and unit and unit % ri == 0:
            next_chunk()
            pred = 0
            eobrun = 0
        by, bx = divmod(unit, c["bw"])
        blk = store[by * c["pbw"] + bx]
        if ss == 0:
            if ah == 0:
                t = reader.decode_huff(c["dc"])
                diff = _extend(reader.receive(t), t)
                pred += diff
                blk[0] = pred << al
            else:
                if reader.read_bit():
                    blk[0] |= p1
            continue
        if ah == 0:
            # AC first
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = reader.decode_huff(c["ac"])
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.receive(r)
                    break
                k += r
                if k > se:
                    raise ValueError("progressive AC index overflow")
                blk[_ZIGZAG[k]] = _extend(reader.receive(s), s) << al
                k += 1
            continue
        # AC refinement (libjpeg decode_mcu_AC_refine)
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = reader.decode_huff(c["ac"])
                r, s = rs >> 4, rs & 0x0F
                newval = 0
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.receive(r)
                        break
                    # r == 15: sixteen zero-HISTORY coefficients skipped
                else:
                    if s != 1:
                        raise ValueError("bad AC refinement code")
                    newval = p1 if reader.read_bit() else m1
                while k <= se:
                    idx = _ZIGZAG[k]
                    if blk[idx] != 0:
                        _refine_nonzero(blk, idx, reader, p1, m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval:
                    if k > se:
                        raise ValueError("AC refinement overflow")
                    blk[_ZIGZAG[k]] = newval
                k += 1
        if eobrun > 0:
            while k <= se:
                idx = _ZIGZAG[k]
                if blk[idx] != 0:
                    _refine_nonzero(blk, idx, reader, p1, m1)
                k += 1
            eobrun -= 1
    prog.scans_done += 1
    return end


def _finalize_progressive(frame, prog, quant):
    comps = prog.comps
    planes = []
    for ci, c in enumerate(comps):
        if c["tq"] not in quant:
            raise ValueError(f"missing quant table {c['tq']}")
        q = quant[c["tq"]]
        plane = bytearray(c["pw"] * c["ph"])
        pw = c["pw"]
        for bidx, blk in enumerate(prog.coefs[ci]):
            by, bx = divmod(bidx, c["pbw"])
            block = _clamp_block(
                _idct_block([blk[i] * q[i] for i in range(64)])
            )
            ox, oy = bx * 8, by * 8
            for yy in range(8):
                row = (oy + yy) * pw + ox
                plane[row : row + 8] = bytes(block[yy * 8 : yy * 8 + 8])
        planes.append(plane)
    return frame["w"], frame["h"], _upsample_to_rgb(
        frame["w"], frame["h"], planes, comps, prog.hmax, prog.vmax
    )


# --------------------------------------------------------------------------
# encoder (fixtures/gates): spec-valid baseline JFIF + exact reconstruction
# --------------------------------------------------------------------------

#: encoder Huffman tables: DC = the 12 categories at 4 bits; AC = every
#: run/size byte at 9 bits.  Deliberately non-Annex-K so decode tests
#: exercise generic canonical-table machinery; both are valid canonical
#: codes (Kraft ≤ 1, no all-ones code).
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_SYMS = list(range(12))
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
_ENC_AC_SYMS = list(range(256))


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self):
        while self.nbits:
            self.write(1, 1)  # pad with 1s
        return bytes(self.out)


def _category(v: int) -> int:
    return abs(v).bit_length()


def _rgb_to_ycbcr(r: int, g: int, b: int) -> tuple:
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.331264 * b + 128
    return (
        min(255, max(0, int(round(y)))),
        min(255, max(0, int(round(cb)))),
        min(255, max(0, int(round(cr)))),
    )


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _build_comp_planes(
    width, height, pixels, channels, comps, hmax, vmax, mcus_x, mcus_y
) -> list:
    """Input pixels → per-component sample planes, downsampled (box
    mean) and edge-padded to full MCUs — shared by the baseline and
    progressive encoders (identical arithmetic keeps the baseline
    byte-exact fixtures intact)."""
    if channels == 1:
        full = [list(pixels)]
    else:
        ys, cbs, crs = [], [], []
        for i in range(width * height):
            y, cb, cr = _rgb_to_ycbcr(
                pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
            )
            ys.append(y)
            cbs.append(cb)
            crs.append(cr)
        full = [ys, cbs, crs]
    planes = []
    for ci, c in enumerate(comps):
        cw = -(-width * c["h"] // hmax)
        ch = -(-height * c["v"] // vmax)
        fx, fy = hmax // c["h"], vmax // c["v"]
        c["pw"] = mcus_x * 8 * c["h"]
        c["ph"] = mcus_y * 8 * c["v"]
        plane = [0] * (c["pw"] * c["ph"])
        src = full[ci]
        for yy in range(c["ph"]):
            for xx in range(c["pw"]):
                sx, sy = min(xx, cw - 1), min(yy, ch - 1)
                if fx == 1 and fy == 1:
                    v = src[min(sy, height - 1) * width + min(sx, width - 1)]
                else:
                    acc = cnt = 0
                    for dy in range(fy):
                        for dx in range(fx):
                            px = min(sx * fx + dx, width - 1)
                            py = min(sy * fy + dy, height - 1)
                            acc += src[py * width + px]
                            cnt += 1
                    v = int(round(acc / cnt))
                plane[yy * c["pw"] + xx] = v
        planes.append(plane)
    return planes


def encode_jpeg_with_recon(
    width: int,
    height: int,
    pixels: bytes,
    *,
    channels: int = 3,
    subsampling: tuple = (1, 1),
    quant_luma: tuple = DEFAULT_QUANT_LUMA,
    quant_chroma: tuple = DEFAULT_QUANT_CHROMA,
    restart_interval: int = 0,
) -> tuple:
    """Encode → ``(payload, recon)`` where ``recon`` is the EXACT pixel
    buffer :func:`decode_jpeg` must return for ``payload`` (quantized
    coefficients pushed back through the shared IDCT/upsample/color
    functions).  ``subsampling`` is the chroma (h,v) relative to luma's
    fixed (hmax,vmax)=(sub_h,sub_v)… i.e. ``(2, 2)`` → 4:2:0."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    sh, sv = subsampling
    if channels == 1:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0, "q": list(quant_luma)}]
    else:
        comps = [
            {"id": 1, "h": sh, "v": sv, "tq": 0, "q": list(quant_luma)},
            {"id": 2, "h": 1, "v": 1, "tq": 1, "q": list(quant_chroma)},
            {"id": 3, "h": 1, "v": 1, "tq": 1, "q": list(quant_chroma)},
        ]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    planes = _build_comp_planes(
        width, height, pixels, channels, comps, hmax, vmax, mcus_x, mcus_y
    )

    dc_enc = _canonical_codes(_ENC_DC_BITS, _ENC_DC_SYMS)
    ac_enc = _canonical_codes(_ENC_AC_BITS, _ENC_AC_SYMS)
    writer = _BitWriter()
    recon_planes = [bytearray(c["pw"] * c["ph"]) for c in comps]
    preds = [0] * len(comps)
    entropy_parts = []
    rst = 0
    total_mcus = mcus_x * mcus_y
    for mcu in range(total_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            entropy_parts.append(writer.flush())
            entropy_parts.append(bytes([0xFF, 0xD0 + (rst & 7)]))
            rst += 1
            writer = _BitWriter()
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcus_x)
        for ci, c in enumerate(comps):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    ox = (mx * c["h"] + bx) * 8
                    oy = (my * c["v"] + by) * 8
                    pw = c["pw"]
                    samples = [
                        planes[ci][(oy + yy) * pw + (ox + xx)] - 128
                        for yy in range(8)
                        for xx in range(8)
                    ]
                    coefs = _fdct_block(samples)
                    qc = [int(round(coefs[i] / c["q"][i])) for i in range(64)]
                    # entropy-code: DC diff, then zigzag AC run/size
                    diff = qc[0] - preds[ci]
                    preds[ci] = qc[0]
                    t = _category(diff)
                    code, ln = dc_enc[t]
                    writer.write(code, ln)
                    if t:
                        writer.write(diff if diff > 0 else diff + (1 << t) - 1, t)
                    run = 0
                    for z in range(1, 64):
                        v = qc[_ZIGZAG[z]]
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, ln = ac_enc[0xF0]
                            writer.write(code, ln)
                            run -= 16
                        s = _category(v)
                        code, ln = ac_enc[(run << 4) | s]
                        writer.write(code, ln)
                        writer.write(v if v > 0 else v + (1 << s) - 1, s)
                        run = 0
                    if run:
                        code, ln = ac_enc[0x00]  # EOB
                        writer.write(code, ln)
                    # exact reconstruction through the decoder's own path
                    rec = _clamp_block(
                        _idct_block([qc[i] * c["q"][i] for i in range(64)])
                    )
                    rp = recon_planes[ci]
                    for yy in range(8):
                        row = (oy + yy) * pw + ox
                        rp[row : row + 8] = bytes(rec[yy * 8 : yy * 8 + 8])
    entropy_parts.append(writer.flush())
    entropy = b"".join(entropy_parts)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = bytearray()
    dqt.append(0x00)
    dqt += bytes(quant_luma[_ZIGZAG[z]] for z in range(64))
    if channels == 3:
        dqt.append(0x01)
        dqt += bytes(quant_chroma[_ZIGZAG[z]] for z in range(64))
    out += _seg(0xDB, bytes(dqt))
    sof = bytearray([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof.append(len(comps))
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += _seg(0xC0, bytes(sof))
    dht = bytearray()
    dht.append(0x00)  # DC table 0
    dht += bytes(_ENC_DC_BITS) + bytes(_ENC_DC_SYMS)
    dht.append(0x10)  # AC table 0
    dht += bytes(_ENC_AC_BITS) + bytes(_ENC_AC_SYMS)
    out += _seg(0xC4, bytes(dht))
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytearray([len(comps)])
    for c in comps:
        sos += bytes([c["id"], 0x00])  # DC 0 / AC 0 for every component
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, bytes(sos))
    out += entropy
    out += b"\xff\xd9"

    recon = _upsample_to_rgb(width, height, recon_planes, comps, hmax, vmax)
    return bytes(out), recon


def encode_jpeg(width: int, height: int, pixels: bytes, **kw) -> bytes:
    """Payload-only convenience wrapper of :func:`encode_jpeg_with_recon`."""
    return encode_jpeg_with_recon(width, height, pixels, **kw)[0]


# --------------------------------------------------------------------------
# progressive encoder (fixtures/tests): multi-scan spectral-selection +
# successive-approximation stream + exact reconstruction
# --------------------------------------------------------------------------


def _prog_scan_script(ncomps: int) -> list:
    """(component indexes, Ss, Se, Ah, Al) per scan — a libjpeg-shaped
    default progression with TWO approximation levels (Al 2→1→0 for AC,
    1→0 for DC) so every decoder path runs: interleaved DC first +
    refinement, per-component AC first with EOB runs, and repeated AC
    refinement with correction bits."""
    if ncomps == 1:
        return [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    every = list(range(ncomps))
    scans = [(every, 0, 0, 0, 1)]
    scans += [([c], 1, 5, 0, 2) for c in every]
    scans += [([c], 6, 63, 0, 2) for c in every]
    scans += [([c], 1, 63, 2, 1) for c in every]
    scans.append((every, 0, 0, 1, 0))
    scans += [([c], 1, 63, 1, 0) for c in every]
    return scans


class _ProgScanWriter:
    """Entropy writer for ONE progressive scan: the baseline _BitWriter
    plus the EOB-run and buffered-correction-bit discipline of libjpeg's
    jcphuff (emit order: pending EOB code → its extra bits → buffered
    correction bits → next symbol), with restart-marker flushes."""

    #: libjpeg MAX_CORR_BITS − DCTSIZE2 headroom: flush the pending EOB
    #: run before its correction-bit buffer can exceed what one more
    #: block could add
    _MAX_BUFFERED = 937

    def __init__(self, ac_enc, dc_enc):
        self.ac_enc = ac_enc
        self.dc_enc = dc_enc
        self.writer = _BitWriter()
        self.eobrun = 0
        self.bits = []  # correction bits riding the pending EOB run
        self.parts = []
        self.rst = 0

    def sym_ac(self, s):
        code, ln = self.ac_enc[s]
        self.writer.write(code, ln)

    def raw(self, v, n):
        if n:
            self.writer.write(v & ((1 << n) - 1), n)

    def emit_bits_list(self, bits):
        for b in bits:
            self.writer.write(b, 1)

    def flush_eobrun(self):
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.sym_ac(nbits << 4)
            if nbits:
                self.raw(self.eobrun, nbits)
            self.eobrun = 0
            self.emit_bits_list(self.bits)
            self.bits = []

    def restart(self):
        self.flush_eobrun()
        self.parts.append(self.writer.flush())
        self.parts.append(bytes([0xFF, 0xD0 + (self.rst & 7)]))
        self.rst += 1
        self.writer = _BitWriter()

    def finish(self) -> bytes:
        self.flush_eobrun()
        self.parts.append(self.writer.flush())
        return b"".join(self.parts)


def _enc_dc_first(w: _ProgScanWriter, blk, pred, al):
    temp = blk[0] >> al  # arithmetic shift: the DC point transform
    diff = temp - pred
    t = _category(diff)
    code, ln = w.dc_enc[t]
    w.writer.write(code, ln)
    if t:
        w.writer.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    return temp


def _enc_ac_first(w: _ProgScanWriter, blk, ss, se, al):
    r = 0
    for k in range(ss, se + 1):
        v = blk[_ZIGZAG[k]]
        if v < 0:
            t = (-v) >> al
            if t == 0:
                r += 1
                continue
            t2 = ~t  # one's complement codes the negative magnitude
        else:
            t = v >> al
            if t == 0:
                r += 1
                continue
            t2 = t
        w.flush_eobrun()
        while r > 15:
            w.sym_ac(0xF0)
            r -= 16
        nbits = t.bit_length()
        w.sym_ac((r << 4) | nbits)
        w.raw(t2, nbits)
        r = 0
    if r:
        w.eobrun += 1
        if w.eobrun == 0x7FFF:
            w.flush_eobrun()


def _enc_ac_refine(w: _ProgScanWriter, blk, ss, se, al):
    absv = {}
    eob = ss - 1  # index of the LAST newly-significant coefficient
    for k in range(ss, se + 1):
        t = abs(blk[_ZIGZAG[k]]) >> al
        absv[k] = t
        if t == 1:
            eob = k
    r = 0
    br = []  # this block's pending correction bits
    for k in range(ss, se + 1):
        t = absv[k]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            w.flush_eobrun()
            w.sym_ac(0xF0)
            r -= 16
            w.emit_bits_list(br)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        w.flush_eobrun()
        w.sym_ac((r << 4) | 1)
        r = 0
        w.writer.write(0 if blk[_ZIGZAG[k]] < 0 else 1, 1)
        w.emit_bits_list(br)
        br = []
    if r > 0 or br:
        w.eobrun += 1
        w.bits.extend(br)
        if w.eobrun == 0x7FFF or len(w.bits) > w._MAX_BUFFERED:
            w.flush_eobrun()


def encode_progressive_jpeg_with_recon(
    width: int,
    height: int,
    pixels: bytes,
    *,
    channels: int = 3,
    subsampling: tuple = (1, 1),
    quant_luma: tuple = DEFAULT_QUANT_LUMA,
    quant_chroma: tuple = DEFAULT_QUANT_CHROMA,
    restart_interval: int = 0,
) -> tuple:
    """Progressive (SOF2) twin of :func:`encode_jpeg_with_recon`: same
    color/downsample/DCT/quantization arithmetic, so the stream carries
    the IDENTICAL quantized coefficients as the baseline encoding of the
    same input — decoded pixels of both must agree byte-for-byte, which
    is exactly what the round-trip tests assert.  The scan script is
    :func:`_prog_scan_script` (spectral selection + two successive-
    approximation levels); ``restart_interval`` counts MCUs in the
    interleaved DC scan and BLOCKS in the non-interleaved scans, per
    T.81."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    sh, sv = subsampling
    if channels == 1:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0, "q": list(quant_luma)}]
    else:
        comps = [
            {"id": 1, "h": sh, "v": sv, "tq": 0, "q": list(quant_luma)},
            {"id": 2, "h": 1, "v": 1, "tq": 1, "q": list(quant_chroma)},
            {"id": 3, "h": 1, "v": 1, "tq": 1, "q": list(quant_chroma)},
        ]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    planes = _build_comp_planes(
        width, height, pixels, channels, comps, hmax, vmax, mcus_x, mcus_y
    )

    # quantized coefficient blocks over the padded grid + reconstruction
    qcs = []
    recon_planes = []
    for ci, c in enumerate(comps):
        c["pbw"], c["pbh"] = mcus_x * c["h"], mcus_y * c["v"]
        cw = -(-width * c["h"] // hmax)
        ch = -(-height * c["v"] // vmax)
        c["bw"], c["bh"] = -(-cw // 8), -(-ch // 8)
        pw = c["pw"]
        blocks = []
        rp = bytearray(c["pw"] * c["ph"])
        for bidx in range(c["pbw"] * c["pbh"]):
            by, bx = divmod(bidx, c["pbw"])
            ox, oy = bx * 8, by * 8
            samples = [
                planes[ci][(oy + yy) * pw + (ox + xx)] - 128
                for yy in range(8)
                for xx in range(8)
            ]
            coefs = _fdct_block(samples)
            qc = [int(round(coefs[i] / c["q"][i])) for i in range(64)]
            if bx >= c["bw"] or by >= c["bh"]:
                # padded-only block: AC never coded in the non-interleaved
                # AC scans (T.81 coverage) — zero it so recon == decode
                qc = [qc[0]] + [0] * 63
            blocks.append(qc)
            rec = _clamp_block(
                _idct_block([qc[i] * c["q"][i] for i in range(64)])
            )
            for yy in range(8):
                row = (oy + yy) * pw + ox
                rp[row : row + 8] = bytes(rec[yy * 8 : yy * 8 + 8])
        qcs.append(blocks)
        recon_planes.append(rp)

    dc_enc = _canonical_codes(_ENC_DC_BITS, _ENC_DC_SYMS)
    ac_enc = _canonical_codes(_ENC_AC_BITS, _ENC_AC_SYMS)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = bytearray()
    dqt.append(0x00)
    dqt += bytes(quant_luma[_ZIGZAG[z]] for z in range(64))
    if channels == 3:
        dqt.append(0x01)
        dqt += bytes(quant_chroma[_ZIGZAG[z]] for z in range(64))
    out += _seg(0xDB, bytes(dqt))
    sof = bytearray([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof.append(len(comps))
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += _seg(0xC2, bytes(sof))
    dht = bytearray()
    dht.append(0x00)
    dht += bytes(_ENC_DC_BITS) + bytes(_ENC_DC_SYMS)
    dht.append(0x10)
    dht += bytes(_ENC_AC_BITS) + bytes(_ENC_AC_SYMS)
    out += _seg(0xC4, bytes(dht))
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))

    for comp_idxs, ss, se, ah, al in _prog_scan_script(len(comps)):
        w = _ProgScanWriter(ac_enc, dc_enc)
        if ss == 0 and len(comp_idxs) > 1:
            # interleaved DC scan over frame MCUs
            preds = [0] * len(comp_idxs)
            for mcu in range(mcus_x * mcus_y):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    w.restart()
                    preds = [0] * len(comp_idxs)
                my, mx = divmod(mcu, mcus_x)
                for pi, ci in enumerate(comp_idxs):
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = qcs[ci][
                                (my * c["v"] + by) * c["pbw"]
                                + (mx * c["h"] + bx)
                            ]
                            if ah == 0:
                                preds[pi] = _enc_dc_first(w, blk, preds[pi], al)
                            else:
                                w.writer.write((blk[0] >> al) & 1, 1)
        else:
            ci = comp_idxs[0]
            c = comps[ci]
            pred = 0
            for unit in range(c["bw"] * c["bh"]):
                if restart_interval and unit and unit % restart_interval == 0:
                    w.restart()
                    pred = 0
                by, bx = divmod(unit, c["bw"])
                blk = qcs[ci][by * c["pbw"] + bx]
                if ss == 0:
                    if ah == 0:
                        pred = _enc_dc_first(w, blk, pred, al)
                    else:
                        w.writer.write((blk[0] >> al) & 1, 1)
                elif ah == 0:
                    _enc_ac_first(w, blk, ss, se, al)
                else:
                    _enc_ac_refine(w, blk, ss, se, al)
        sos = bytearray([len(comp_idxs)])
        for ci in comp_idxs:
            # DC table 0 / AC table 0 (ignored where the scan kind
            # doesn't use one)
            sos += bytes([comps[ci]["id"], 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, bytes(sos))
        out += w.finish()

    out += b"\xff\xd9"
    recon = _upsample_to_rgb(
        width, height, recon_planes, comps, hmax, vmax
    )
    return bytes(out), recon
