"""Pure-stdlib/numpy baseline JPEG codec: the second REAL image decode
lane (after functions/png.py), zero external dependencies.

Scope — decoder (``decode_jpeg``): baseline sequential DCT (SOF0),
8-bit, grayscale or YCbCr with sampling factors 1-2 per axis (4:4:4,
4:2:2, 4:2:0 — interleaved MCU scan, chroma upsampled by pixel
replication), one scan, no restart intervals. That is a REAL decoder:
marker parse, DQT/DHT table management, canonical Huffman decode over
the byte-stuffed entropy stream, DC prediction, zigzag
de-serialization, dequantize, 8×8 IDCT (separable float64 matrix
product), level shift, deterministic round-half-up + clamp, and the
JFIF YCbCr→RGB transform. It decodes a genuine foreign-encoder 4:2:0
file (the CPython test suite's python.jpg — pinned in
tests/test_multimodal_jpeg.py). Anything outside scope (progressive,
DRI, arithmetic coding, 12-bit, >2x sampling) raises with a precise
reason — never silently wrong.

Scope — encoder (``encode_jpeg``): takes QUANTIZED coefficient blocks
directly (the caller controls exact reconstruction values), emits a
standards-conformant baseline stream with the Annex-K example Huffman
tables and byte stuffing. ``synth_jpeg`` builds the deterministic
DC-only grayscale corpus used by the oracle-gated query: with q0 = 16
and quantized DC k, the decoded block is EXACTLY the constant
128 + 2k (F00/8 = 2k, integral, so the float rounding step is a
no-op) — which is why a lossy codec can still be hash-exact against a
closed-form DuckDB oracle. General (AC, color) decode correctness is
pinned in tests/test_multimodal_jpeg.py against an independent
numpy IDCT reference.

Cost model: one pass over the entropy stream per image (bit-level
Python — fine for QC-sized corpus thumbnails; swap PIL/libvips behind
the same seam for production photos), one 8×8×(blocks) numpy IDCT.
"""

from __future__ import annotations

import struct

import numpy as np

# --- zigzag order (index i of the scan -> (row, col)) -------------------
ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

# --- Annex K example Huffman tables (BITS, HUFFVAL) ---------------------
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# Flat quantization table: q0 = 16 for DC (exact DC-only reconstruction:
# 16k/8 = 2k), 16 everywhere else — legal per the standard (any 1-255).
FLAT_Q16 = [16] * 64

# --- separable IDCT basis (float64, built once) -------------------------
_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)  # _C[u, x]: basis; pixels = _C.T @ coeffs @ _C


def idct2(block: np.ndarray) -> np.ndarray:
    """2-D 8×8 type-III DCT (the JPEG IDCT), float64."""
    return _C.T @ np.asarray(block, dtype=np.float64) @ _C


# =========================================================================
# Huffman machinery
# =========================================================================


def _build_codes(bits, vals):
    """Canonical Huffman: returns {symbol: (code, length)}."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decoder(bits, vals):
    """Canonical Huffman decode table: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        if self.pos >= len(self.data):
            raise ValueError("jpeg: entropy stream exhausted")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: dangling 0xFF in entropy stream")
            marker = self.data[self.pos]
            if marker == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise ValueError(
                    f"jpeg: unexpected marker 0xFF{marker:02X} mid-scan "
                    "(restart intervals are out of scope)"
                )
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")


def _magnitude(v: int):
    """JPEG magnitude category + offset bits for a coefficient value."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _extend(bits: int, cat: int) -> int:
    """Inverse of _magnitude: sign-extend the offset bits."""
    if cat == 0:
        return 0
    if bits < (1 << (cat - 1)):
        return bits - (1 << cat) + 1
    return bits


# =========================================================================
# Encoder (quantized coefficients in, conformant baseline stream out)
# =========================================================================


def encode_jpeg(
    coeff_blocks: np.ndarray,
    width: int,
    height: int,
    qtable=FLAT_Q16,
    n_components: int = 1,
) -> bytes:
    """Encode quantized coefficient blocks as a baseline JPEG.

    ``coeff_blocks``: int array (n_comp, blocks_y, blocks_x, 8, 8) of
    QUANTIZED coefficients in natural (row, col) order — the decoder's
    reconstruction is exactly ``idct2(coeffs * qtable)``, so callers
    (tests, synth corpus) know the decoded pixels in closed form.
    Grayscale (1 component) or YCbCr 4:4:4 (3 components, one shared
    quantization + Huffman table set — legal and simplest)."""
    cb = np.asarray(coeff_blocks, dtype=np.int32)
    if cb.ndim == 4:
        cb = cb[None]
    n_comp, by, bx = cb.shape[0], cb.shape[1], cb.shape[2]
    if n_comp != n_components:
        raise ValueError("component count mismatch")
    if (height + 7) // 8 != by or (width + 7) // 8 != bx:
        raise ValueError("block grid does not cover the image dims")

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    # DQT (table 0, 8-bit precision) — qtable is already in zigzag order
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + bytes(qtable)
    # SOF0
    comp_spec = b""
    for cid in range(1, n_comp + 1):
        comp_spec += struct.pack(">BBB", cid, 0x11, 0)  # 1x1 sampling, qtable 0
    out += b"\xff\xc0" + struct.pack(
        ">HBHHB", 8 + 3 * n_comp, 8, height, width, n_comp
    ) + comp_spec
    # DHT: DC table 0 + AC table 0
    out += (
        b"\xff\xc4"
        + struct.pack(">H", 2 + 1 + 16 + len(_DC_LUM_VALS))
        + b"\x00"
        + bytes(_DC_LUM_BITS)
        + bytes(_DC_LUM_VALS)
    )
    out += (
        b"\xff\xc4"
        + struct.pack(">H", 2 + 1 + 16 + len(_AC_LUM_VALS))
        + b"\x10"
        + bytes(_AC_LUM_BITS)
        + bytes(_AC_LUM_VALS)
    )
    # SOS
    sos_comp = b""
    for cid in range(1, n_comp + 1):
        sos_comp += struct.pack(">BB", cid, 0x00)  # DC table 0, AC table 0
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * n_comp, n_comp) + sos_comp
    out += b"\x00\x3f\x00"  # spectral selection 0..63, approx 0

    dc_codes = _build_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _build_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    w = _BitWriter()
    prev_dc = [0] * n_comp
    # interleaved MCU order = block raster order (1x1 sampling)
    for y in range(by):
        for x in range(bx):
            for c in range(n_comp):
                block = cb[c, y, x]
                dc = int(block[0, 0])
                diff = dc - prev_dc[c]
                prev_dc[c] = dc
                cat, bits = _magnitude(diff)
                code, ln = dc_codes[cat]
                w.write(code, ln)
                if cat:
                    w.write(bits, cat)
                # AC in zigzag order with run-length coding
                zz_ac = [int(block[r, cc]) for (r, cc) in ZIGZAG[1:]]
                run = 0
                for v in zz_ac:
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[0xF0]  # ZRL
                        w.write(code, ln)
                        run -= 16
                    cat, bits = _magnitude(v)
                    code, ln = ac_codes[(run << 4) | cat]
                    w.write(code, ln)
                    w.write(bits, cat)
                    run = 0
                if run:
                    code, ln = ac_codes[0x00]  # EOB
                    w.write(code, ln)
    w.flush()
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# =========================================================================
# Decoder
# =========================================================================


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG to uint8 pixels: (h, w) for grayscale,
    (h, w, 3) RGB for YCbCr 4:4:4. Raises ValueError with a precise
    reason for anything out of scope."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qtables = {}
    huff_dc, huff_ac = {}, {}
    frame = None
    scan_comps = None
    entropy_start = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seg_len = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise ValueError("jpeg: 16-bit qtables out of scope")
                vals = seg[p + 1 : p + 65]
                qt = np.zeros((8, 8), dtype=np.int32)
                for i, (r, c) in enumerate(ZIGZAG):
                    qt[r, c] = vals[i]
                qtables[tq] = qt
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                table = _build_decoder(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                sh, sv = hv >> 4, hv & 0xF
                if sh not in (1, 2) or sv not in (1, 2):
                    raise ValueError(
                        f"jpeg: sampling factor {sh}x{sv} out of scope "
                        "(1-2 per axis: 4:4:4 / 4:2:2 / 4:2:0)"
                    )
                comps.append((cid, sh, sv, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"jpeg: SOF{marker - 0xC0} (progressive/extended) out of scope"
            )
        elif marker == 0xDD:
            raise ValueError("jpeg: restart intervals (DRI) out of scope")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comps.append((cs, tables >> 4, tables & 0xF))
            entropy_start = pos + seg_len
            break
        pos += seg_len
    if frame is None or scan_comps is None:
        raise ValueError("jpeg: missing SOF0/SOS")
    h, w, comps = frame
    nc = len(comps)
    if nc not in (1, 3):
        raise ValueError("jpeg: only 1 or 3 components supported")

    # locate EOI (last FFD9) — entropy data is everything before it
    end = data.rfind(b"\xff\xd9")
    reader = _BitReader(data[entropy_start:end])
    hmax = max(sh for _, sh, _, _ in comps)
    vmax = max(sv for _, _, sv, _ in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    comp_meta = {cid: (sh, sv, qtables[tq]) for cid, sh, sv, tq in comps}
    # per-component subsampled planes (decoded at native resolution)
    planes = [
        np.zeros((mcuy * sv * 8, mcux * sh * 8), dtype=np.float64)
        for _, sh, sv, _ in comps
    ]
    comp_index = {cid: i for i, (cid, _, _, _) in enumerate(comps)}
    prev_dc = [0] * nc

    def _decode_block(td, ta, qt, ci):
        coeffs = np.zeros((8, 8), dtype=np.float64)
        cat = reader.read_symbol(huff_dc[td])
        diff = _extend(reader.read_bits(cat), cat) if cat else 0
        prev_dc[ci] += diff
        coeffs[0, 0] = prev_dc[ci] * qt[0, 0]
        k = 1
        while k < 64:
            rs = reader.read_symbol(huff_ac[ta])
            run, cat = rs >> 4, rs & 0xF
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += run
            if k > 63:
                raise ValueError("jpeg: AC index overflow")
            r, c = ZIGZAG[k]
            coeffs[r, c] = _extend(reader.read_bits(cat), cat) * qt[r, c]
            k += 1
        return idct2(coeffs) + 128.0

    # interleaved scan: each MCU carries sh×sv blocks per component
    for my in range(mcuy):
        for mx in range(mcux):
            for cs, td, ta in scan_comps:
                ci = comp_index[cs]
                sh, sv, qt = comp_meta[cs]
                for byi in range(sv):
                    for bxi in range(sh):
                        block = _decode_block(td, ta, qt, ci)
                        py = (my * sv + byi) * 8
                        pxx = (mx * sh + bxi) * 8
                        planes[ci][py : py + 8, pxx : pxx + 8] = block
    # upsample subsampled components by pixel replication (box), then
    # deterministic round-half-up + clamp (documented; np.round would be
    # half-even, and C libraries vary — we OWN this choice)
    full = np.zeros((nc, mcuy * vmax * 8, mcux * hmax * 8), dtype=np.float64)
    for i, (_, sh, sv, _) in enumerate(comps):
        p = planes[i]
        if sh != hmax:
            p = np.repeat(p, hmax // sh, axis=1)
        if sv != vmax:
            p = np.repeat(p, vmax // sv, axis=0)
        full[i] = p
    px = np.floor(full + 0.5)
    px = np.clip(px, 0, 255)
    px = px[:, :h, :w]
    if nc == 1:
        return px[0].astype(np.uint8)
    yp, cb, cr = px[0], px[1] - 128.0, px[2] - 128.0
    r = np.floor(yp + 1.402 * cr + 0.5)
    g = np.floor(yp - 0.344136 * cb - 0.714136 * cr + 0.5)
    b = np.floor(yp + 1.772 * cb + 0.5)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(rgb, 0, 255).astype(np.uint8)


# =========================================================================
# Deterministic synth corpus (DC-only grayscale: decode is closed-form)
# =========================================================================


def synth_jpeg_params(doc_id: int):
    """Closed-form per-doc geometry/pattern params — MIRRORED by the
    DuckDB oracle arithmetically (see multimodal_jpeg_decode)."""
    bw = 2 + (doc_id * 7) % 4   # blocks across: 2..5  (width 16..40)
    bh = 2 + (doc_id * 11) % 4  # blocks down
    a = (doc_id % 5) + 1
    b = (doc_id % 7) + 1
    c = doc_id % 96
    return bw, bh, a, b, c


def synth_jpeg(doc_id: int) -> bytes:
    """DC-only grayscale JPEG: block (bx, by) holds quantized DC
    k = ((bx*a + by*b + c) % 96) - 48, so with q0 = 16 the decoded
    block is exactly the constant 128 + 2k ∈ [32, 222] (no clamp, no
    rounding ambiguity — F00/8 = 2k is integral)."""
    bw, bh, a, b, c = synth_jpeg_params(doc_id)
    coeffs = np.zeros((bh, bw, 8, 8), dtype=np.int32)
    for y in range(bh):
        for x in range(bw):
            coeffs[y, x, 0, 0] = ((x * a + y * b + c) % 96) - 48
    return encode_jpeg(coeffs, bw * 8, bh * 8, FLAT_Q16, 1)
