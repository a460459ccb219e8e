"""Baseline sequential JPEG codec — stdlib only.

The container ships no PIL/libjpeg, and JPEG is the #1 web image format,
so the curation pipeline gets a from-scratch baseline (SOF0) decoder:
marker-segment parse → canonical-Huffman entropy decode (with restart
markers and byte unstuffing) → dequantize → 8×8 float IDCT → chroma
upsample → JFIF YCbCr→RGB.  Grayscale and 3-component images at any
(h,v) ∈ {1,2} sampling factors decode; progressive (SOF2), arithmetic
coding, and 12-bit precision raise :class:`JpegPixelsUnavailable` so the
feature extractor can fall back to header-only dimensions.

The encoder exists for fixtures and gates: it emits a spec-valid baseline
JFIF stream (its own DQT/DHT tables, interleaved MCUs, optional restart
markers) AND the exact pixel reconstruction an ideal decoder must produce
(dequantized coefficients through the SAME IDCT/upsample/color-convert
functions the decoder uses) — so round-trip tests compare byte-exact
decoded pixels, not "looks close".  JPEG is lossy; the encoder's
*reconstruction* is the ground truth, not its input.

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
]


class JpegPixelsUnavailable(NotImplementedError):
    """Structurally-valid JPEG whose pixel stream this decoder doesn't
    cover (progressive, arithmetic, 12-bit, or no scan present): callers
    can still use header dimensions."""


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
        elif marker == 0xC0 or marker == 0xC1:  # baseline SOF
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
            frame = {"w": width, "h": height, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
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
            return _decode_scan(
                payload, pos + 2 + seg_len, frame, scan, quant,
                dc_tables, ac_tables, restart_interval,
            )
        pos += 2 + seg_len
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

    # full-res component samples
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

    # per-component planes, downsampled (box mean) + edge-padded to MCUs
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
