"""Pure-stdlib+numpy baseline JPEG codec (round 9, VERDICT r8 Next
#5 — the largest real-crawl media gap: PNG/APNG covered the lossless
tier but crawled corpora are mostly JPEG).

Decoder: baseline sequential DCT, Huffman entropy coding (ITU-T.81 /
ISO 10918-1 — the public spec): SOI/APPn/COM/DQT (8- and 16-bit
precision)/DHT/SOF0+SOF1/DRI+RSTn/SOS/EOI, byte-destuffing, DC
difference + AC run-length decode, dequantization, float64
matrix IDCT, chroma upsampling by sample replication for any legal
(h,v) sampling factors, and the spec's YCbCr→RGB. Grayscale (1
component) and YCbCr (3 components) interchange formats.

PROGRESSIVE (SOF2, round 10 — the most common real-crawl variant
after baseline): multi-scan spectral selection + successive
approximation per ITU-T.81 §G.2 — interleaved or per-component DC
first/refine scans (Al shift, then one appended bit per scan),
per-component AC first scans (EOBn end-of-band run coding) and AC
refinement scans (the correction-bit algorithm of §G.1.2.3), DRI/RST
inside any scan, coefficients accumulated across scans and
dequantized + IDCTed once at EOI. Verified two independent ways:
(a) a progressive re-encode of ANY image must decode pixel-identical
to the baseline encode of the same pixels (the coefficient array a
full progressive script reconstructs is exactly the sequential one),
and (b) the closed-form DC-exactness contract holds for progressive
scripts too (block-constant gray + flat Q8 decodes to 128 + dc
bit-exactly). Everything still outside the subset raises
``UnsupportedJpegError`` honestly: lossless (SOF3/7/11/15),
arithmetic coding (SOF9/10), hierarchical (DHP), 12-bit precision,
DNL.

Encoder (test-fixture generator, like png.encode_png and
wav.encode_*): real forward DCT + quantization + canonical-Huffman
entropy coding, grayscale or YCbCr with 4:4:4 / 4:2:0 subsampling,
optional restart intervals. It emits CUSTOM canonical Huffman tables
in DHT (12 four-bit DC codes, 162 eight-bit AC codes — legal,
trivially canonical, and deliberately not the Annex K defaults so
the decoder's DHT walk is exercised generically rather than
pattern-matched).

Exactness contract used by the driver-graded q_media_decode branch:
with the flat all-8s quantization table, a flat 8×8 block of value v
encodes to the single quantized DC coefficient (v-128) with every AC
exactly 0 (the DCT of a constant block is one DC term; float
residues are ~1e-13, far under the rounding threshold), and decodes
back to the constant v — so block-constant grayscale JPEGs
round-trip bit-exactly and a SQL oracle can re-derive the pixels in
closed form.

Used by multimodal.decode_image (payload sniffing: ``FF D8`` routes
here, ``89 PNG`` to png.py) inside the same Arrow-batched
mapInPandas kernel — the plan never changes, only the kernel body.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


class JpegError(ValueError):
    """Malformed/corrupt JPEG payload."""


class UnsupportedJpegError(JpegError):
    """Legal JPEG outside the baseline-sequential-Huffman subset."""


@dataclass(frozen=True)
class JpegImage:
    width: int
    height: int
    channels: int  # 1 gray, 3 RGB
    bit_depth: int  # always 8 in baseline
    pixels: bytes  # row-major, interleaved for RGB


# ---- shared constants ---------------------------------------------------

def _zigzag_order() -> list[tuple[int, int]]:
    """(row, col) visit order of the spec's zigzag — generated, not
    hand-typed: anti-diagonal s walks rows ascending when s is odd,
    descending when s is even."""
    out = []
    for s in range(15):
        rows = range(max(0, s - 7), min(8, s + 1))
        cells = [(r, s - r) for r in rows]
        if s % 2 == 0:
            cells.reverse()
        out.extend(cells)
    return out


_ZIGZAG = _zigzag_order()  # zigzag index k -> (row, col)

# IDCT/DCT basis: M[u, x] = c(u) * cos((2x+1) u pi / 16)
_M = np.array(
    [
        [
            (1 / np.sqrt(2) if u == 0 else 1.0)
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

FLAT_Q8 = [8] * 64  # the exact-DC quantization table (zigzag order)

# Custom canonical Huffman specs: bits[i] = #codes of length i+1.
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = list(range(12))
_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_BITS = [0] * 7 + [len(_AC_VALS)] + [0] * 8


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), the spec's canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


def _extend(v: int, s: int) -> int:
    """The spec's EXTEND: map an s-bit magnitude to its signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ---- decoder ------------------------------------------------------------

class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with
    0xFF00 destuffing; stops at any real marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def at_marker(self) -> bool:
        d, p = self.data, self.pos
        return p + 1 < len(d) and d[p] == 0xFF and d[p + 1] != 0x00

    def byte_align(self) -> None:
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            d, p = self.data, self.pos
            if p >= len(d):
                raise JpegError("truncated entropy-coded segment")
            b = d[p]
            if b == 0xFF:
                if p + 1 >= len(d):
                    raise JpegError("truncated entropy-coded segment")
                if d[p + 1] == 0x00:
                    self.pos = p + 2
                else:
                    raise JpegError(
                        "entropy decoder ran into marker "
                        f"FF{d[p + 1]:02X} mid-block"
                    )
            else:
                self.pos = p + 1
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code (no symbol within 16 bits)")


@dataclass
class _Component:
    cid: int
    h: int
    v: int
    tq: int
    td: int = 0
    ta: int = 0


def _idct_block(coef: np.ndarray) -> np.ndarray:
    return 0.25 * (_M.T @ coef @ _M)


def decode_jpeg(data: bytes) -> JpegImage:
    """Decode a baseline JPEG; raises JpegError / UnsupportedJpegError
    (never crashes on foreign bytes — the mapInPandas kernels catch
    per-row)."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise JpegError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[_Component] = []
    width = height = 0
    restart_interval = 0
    sof_seen = False
    progressive = False
    prog: _ProgressiveState | None = None

    while True:
        if pos + 1 >= len(data):
            raise JpegError("truncated before EOI")
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}, got {data[pos]:02X}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before
        # the marker code — skip the run, first non-0xFF is the code.
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(data):
            raise JpegError("truncated before EOI")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD8:
            continue  # stray SOI
        if marker == 0xD9:
            if progressive and prog.scans_done:
                return prog.reconstruct(qt)
            raise JpegError("EOI before SOS")
        if marker in (0xC3, 0xC7, 0xCB, 0xCF):
            raise UnsupportedJpegError("lossless JPEG")
        if marker in (0xC9, 0xCA, 0xCD, 0xCE):
            raise UnsupportedJpegError("arithmetic-coded JPEG")
        if marker in (0xC5, 0xC6):
            raise UnsupportedJpegError("non-baseline sequential JPEG")
        if marker == 0xDE:
            raise UnsupportedJpegError("hierarchical JPEG (DHP)")
        if marker == 0xDC:
            raise UnsupportedJpegError("DNL segment")
        if pos + 2 > len(data):
            raise JpegError("truncated segment header")
        seglen = int.from_bytes(data[pos:pos + 2], "big")
        seg = data[pos + 2:pos + seglen]
        if len(seg) != seglen - 2:
            raise JpegError("truncated segment body")
        nxt = pos + seglen

        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                n = 128 if pq == 1 else 64
                if i + n > len(seg):
                    raise JpegError("truncated DQT")
                tbl = np.zeros((8, 8))
                for k in range(64):
                    val = (
                        int.from_bytes(seg[i + 2 * k:i + 2 * k + 2], "big")
                        if pq == 1
                        else seg[i + k]
                    )
                    r, c = _ZIGZAG[k]
                    tbl[r, c] = val
                qt[tq] = tbl
                i += n
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                nsyms = sum(bits)
                vals = list(seg[i + 17:i + 17 + nsyms])
                if len(vals) != nsyms:
                    raise JpegError("truncated DHT")
                table = _decode_table(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                i += 17 + nsyms
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog.
            if seg[0] != 8:
                raise UnsupportedJpegError(
                    f"{seg[0]}-bit sample precision (baseline is 8)"
                )
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise UnsupportedJpegError(
                    f"{ncomp}-component JPEG (1=gray / 3=YCbCr supported)"
                )
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append(_Component(cid, hv >> 4, hv & 0x0F, tq))
            sof_seen = True
            progressive = marker == 0xC2
            if progressive:
                prog = _ProgressiveState(width, height, comps)
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            if not sof_seen:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            if progressive:
                scan = []
                by_id = {c.cid: c for c in comps}
                for j in range(ns):
                    cid, tdta = seg[1 + 2 * j:3 + 2 * j]
                    if cid not in by_id:
                        raise JpegError(f"SOS names unknown component {cid}")
                    c = by_id[cid]
                    c.td = tdta >> 4
                    c.ta = tdta & 0x0F
                    scan.append(c)
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                pos = prog.decode_scan(
                    data, nxt, scan, huff_dc, huff_ac,
                    ss, se, ahal >> 4, ahal & 0x0F, restart_interval,
                )
                continue
            if ns != len(comps):
                raise UnsupportedJpegError(
                    "multi-scan / partial-scan JPEG (baseline is one "
                    "interleaved scan)"
                )
            by_id = {c.cid: c for c in comps}
            for j in range(ns):
                cid, tdta = seg[1 + 2 * j:3 + 2 * j]
                if cid not in by_id:
                    raise JpegError(f"SOS names unknown component {cid}")
                by_id[cid].td = tdta >> 4
                by_id[cid].ta = tdta & 0x0F
            pos = nxt
            return _decode_scan(
                data, pos, width, height, comps, qt, huff_dc, huff_ac,
                restart_interval,
            )
        # APPn / COM / anything else: skip
        pos = nxt


def _decode_scan(
    data, pos, width, height, comps, qt, huff_dc, huff_ac, restart_interval
) -> JpegImage:
    if width == 0 or height == 0:
        raise JpegError("zero image dimensions")
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise JpegError("illegal sampling factors")
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    planes = {
        c.cid: np.zeros((mcuy * c.v * 8, mcux * c.h * 8)) for c in comps
    }
    for c in comps:
        if c.tq not in qt:
            raise JpegError(f"component references missing DQT {c.tq}")
        if c.td not in huff_dc or c.ta not in huff_ac:
            raise JpegError("scan references missing DHT")

    br = _BitReader(data, pos)
    pred = {c.cid: 0 for c in comps}
    mcu_count = 0
    rst_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                br.byte_align()
                d, p = br.data, br.pos
                while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0xFF:
                    p += 1  # T.81 B.1.1.2 fill bytes before RST
                if p + 1 >= len(d) or d[p] != 0xFF or d[p + 1] != (
                    0xD0 + rst_idx
                ):
                    raise JpegError("missing/garbled RST marker")
                br.pos = p + 2
                rst_idx = (rst_idx + 1) % 8
                pred = {c.cid: 0 for c in comps}
            for c in comps:
                for by in range(c.v):
                    for bx in range(c.h):
                        block = _decode_block(
                            br, huff_dc[c.td], huff_ac[c.ta], qt[c.tq],
                            pred, c.cid,
                        )
                        y0 = (my * c.v + by) * 8
                        x0 = (mx * c.h + bx) * 8
                        planes[c.cid][y0:y0 + 8, x0:x0 + 8] = block
            mcu_count += 1

    return _planes_to_image(planes, comps, width, height, hmax, vmax)


def _planes_to_image(planes, comps, width, height, hmax, vmax) -> JpegImage:
    """Shared tail of both decode paths: crop grayscale, or upsample
    chroma by replication via index arrays (exact for any legal h/v
    ratio, integral or not) and apply the spec's YCbCr→RGB."""
    if len(comps) == 1:
        y = planes[comps[0].cid][:height, :width]
        px = np.clip(np.round(y), 0, 255).astype(np.uint8)
        return JpegImage(width, height, 1, 8, px.tobytes())

    ys = np.arange(height)
    xs = np.arange(width)
    chan = {}
    for c in comps:
        plane = planes[c.cid]
        chan[c.cid] = plane[np.ix_((ys * c.v) // vmax, (xs * c.h) // hmax)]
    cy, cb, cr = (chan[c.cid] for c in comps)
    r = cy + 1.402 * (cr - 128.0)
    g = cy - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = cy + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.round(ch), 0, 255) for ch in (r, g, b)], axis=-1
    ).astype(np.uint8)
    return JpegImage(width, height, 3, 8, rgb.tobytes())


def _decode_block(br, dc_table, ac_table, q, pred, cid) -> np.ndarray:
    coef = np.zeros((8, 8))
    s = br.decode_huff(dc_table)
    if s > 11:
        raise JpegError(f"DC magnitude category {s} > 11")
    diff = _extend(br.receive(s), s) if s else 0
    pred[cid] += diff
    coef[0, 0] = pred[cid]
    k = 1
    while k < 64:
        rs = br.decode_huff(ac_table)
        r, sz = rs >> 4, rs & 0x0F
        if sz == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += r
        if k > 63:
            raise JpegError("AC run overflows block")
        row, col = _ZIGZAG[k]
        coef[row, col] = _extend(br.receive(sz), sz)
        k += 1
    spatial = _idct_block(coef * q) + 128.0
    return spatial


# ---- progressive decoder (ITU-T.81 §G.2) ---------------------------------

class _ProgressiveState:
    """Coefficient accumulator across a progressive file's scans.
    Per component: an (mcu-padded blocks_y, blocks_x, 64) int64 array
    in zigzag order; DC/AC first and refinement scans mutate it; EOI
    dequantizes + IDCTs once."""

    def __init__(self, width: int, height: int, comps: list[_Component]):
        if width == 0 or height == 0:
            raise JpegError("zero image dimensions")
        self.width = width
        self.height = height
        self.comps = comps
        self.hmax = max(c.h for c in comps)
        self.vmax = max(c.v for c in comps)
        if self.hmax < 1 or self.vmax < 1 or self.hmax > 4 or self.vmax > 4:
            raise JpegError("illegal sampling factors")
        self.mcux = -(-width // (8 * self.hmax))
        self.mcuy = -(-height // (8 * self.vmax))
        self.coef = {
            c.cid: np.zeros((self.mcuy * c.v, self.mcux * c.h, 64), np.int64)
            for c in comps
        }
        # non-interleaved block grid: ceil(ceil(dim · h / hmax) / 8)
        def cdiv(a: int, b: int) -> int:
            return -(-a // b)

        self.cbw = {
            c.cid: cdiv(cdiv(width * c.h, self.hmax), 8) for c in comps
        }
        self.cbh = {
            c.cid: cdiv(cdiv(height * c.v, self.vmax), 8) for c in comps
        }
        self.scans_done = 0

    def decode_scan(
        self, data, pos, scan, huff_dc, huff_ac, ss, se, ah, al,
        restart_interval,
    ) -> int:
        """Decode one scan's entropy segment; returns the position of
        the next marker."""
        if ss == 0:
            if se != 0:
                raise JpegError("progressive DC scan must have Se=0")
            is_dc = True
        else:
            if len(scan) != 1:
                raise JpegError("progressive AC scan must be one component")
            if se < ss or se > 63:
                raise JpegError("bad spectral selection")
            is_dc = False
        for c in scan:
            if is_dc and ah == 0 and c.td not in huff_dc:
                raise JpegError("scan references missing DC DHT")
            if not is_dc and c.ta not in huff_ac:
                raise JpegError("scan references missing AC DHT")

        br = _BitReader(data, pos)
        pred = {c.cid: 0 for c in scan}
        state = {"eobrun": 0}
        rst_idx = 0
        unit = 0

        def maybe_restart() -> None:
            nonlocal rst_idx
            if restart_interval and unit and unit % restart_interval == 0:
                br.byte_align()
                d, p = br.data, br.pos
                while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0xFF:
                    p += 1  # T.81 B.1.1.2 fill bytes before RST
                if p + 1 >= len(d) or d[p] != 0xFF or d[p + 1] != (
                    0xD0 + rst_idx
                ):
                    raise JpegError("missing/garbled RST marker")
                br.pos = p + 2
                rst_idx = (rst_idx + 1) % 8
                for cid in pred:
                    pred[cid] = 0
                state["eobrun"] = 0

        if is_dc and len(scan) > 1:
            # interleaved DC scan: MCU traversal, v×h blocks per comp
            for my in range(self.mcuy):
                for mx in range(self.mcux):
                    maybe_restart()
                    for c in scan:
                        for by in range(c.v):
                            for bx in range(c.h):
                                blk = self.coef[c.cid][
                                    my * c.v + by, mx * c.h + bx
                                ]
                                self._dc_unit(
                                    br, huff_dc, c, blk, ah, al, pred
                                )
                    unit += 1
        else:
            # non-interleaved: the component's own block grid
            c = scan[0]
            for byy in range(self.cbh[c.cid]):
                for bxx in range(self.cbw[c.cid]):
                    maybe_restart()
                    blk = self.coef[c.cid][byy, bxx]
                    if is_dc:
                        self._dc_unit(br, huff_dc, c, blk, ah, al, pred)
                    elif ah == 0:
                        self._ac_first(
                            br, huff_ac[c.ta], blk, ss, se, al, state
                        )
                    else:
                        self._ac_refine(
                            br, huff_ac[c.ta], blk, ss, se, al, state
                        )
                    unit += 1
        self.scans_done += 1
        # skip to the next true marker (the scan may end mid-byte)
        p = br.pos
        while p + 1 < len(data):
            if data[p] == 0xFF and data[p + 1] == 0xFF:
                p += 1  # T.81 B.1.1.2 fill byte before the marker
                continue
            if data[p] == 0xFF and data[p + 1] not in (0x00,) and not (
                0xD0 <= data[p + 1] <= 0xD7
            ):
                return p
            p += 1
        raise JpegError("truncated after progressive scan")

    @staticmethod
    def _dc_unit(br, huff_dc, c, blk, ah, al, pred) -> None:
        if ah == 0:  # first DC scan: Huffman diffs of (DC >> Al)
            s = br.decode_huff(huff_dc[c.td])
            if s > 11:
                raise JpegError(f"DC magnitude category {s} > 11")
            diff = _extend(br.receive(s), s) if s else 0
            pred[c.cid] += diff
            blk[0] = pred[c.cid] << al
        else:  # refinement: one appended bit at position Al
            if br.read_bit():
                blk[0] |= 1 << al

    @staticmethod
    def _ac_first(br, ac_table, blk, ss, se, al, state) -> None:
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = br.decode_huff(ac_table)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    state["eobrun"] = (1 << r) - 1
                    if r:
                        state["eobrun"] += br.receive(r)
                    return
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise JpegError("AC run overflows spectral band")
            blk[k] = _extend(br.receive(s), s) << al
            k += 1

    @staticmethod
    def _ac_refine(br, ac_table, blk, ss, se, al, state) -> None:
        # §G.1.2.3 correction-bit refinement
        p1 = 1 << al
        m1 = -1 << al
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = br.decode_huff(ac_table)
                r, s = rs >> 4, rs & 0x0F
                newval = 0
                if s:
                    if s != 1:
                        raise JpegError(
                            "AC refinement symbol with size != 1"
                        )
                    newval = p1 if br.read_bit() else m1
                else:
                    if r != 15:
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += br.receive(r)
                        break  # fall through to the EOB correction pass
                # advance over r zero-history coefficients, applying
                # correction bits to nonzero-history ones passed
                while k <= se:
                    cur = int(blk[k])
                    if cur != 0:
                        if br.read_bit() and (cur & p1) == 0:
                            blk[k] = cur + (p1 if cur >= 0 else m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    blk[k] = newval
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                cur = int(blk[k])
                if cur != 0:
                    if br.read_bit() and (cur & p1) == 0:
                        blk[k] = cur + (p1 if cur >= 0 else m1)
                k += 1
            state["eobrun"] -= 1

    def reconstruct(self, qt) -> JpegImage:
        planes = {}
        for c in self.comps:
            if c.tq not in qt:
                raise JpegError(f"component references missing DQT {c.tq}")
            zz = self.coef[c.cid].astype(np.float64)
            bv, bh = zz.shape[0], zz.shape[1]
            grid = np.zeros((bv, bh, 8, 8))
            for k in range(64):
                r, col = _ZIGZAG[k]
                grid[:, :, r, col] = zz[:, :, k]
            grid *= qt[c.tq]
            # vectorized _idct_block over every block
            spatial = 0.25 * np.einsum(
                "ru,ijrc,cv->ijuv", _M, grid, _M
            ) + 128.0
            planes[c.cid] = spatial.transpose(0, 2, 1, 3).reshape(
                bv * 8, bh * 8
            )
        return _planes_to_image(
            planes, self.comps, self.width, self.height, self.hmax,
            self.vmax,
        )


# ---- encoder ------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:  # pad with 1-bits, per spec
            self.write(1, 1)


def _magnitude(v: int) -> tuple[int, int]:
    """(size category s, s-bit code) for a signed coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    code = v if v > 0 else v + (1 << s) - 1
    return s, code


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _fdct_quant(block: np.ndarray, q: np.ndarray) -> np.ndarray:
    coef = 0.25 * (_M @ (block - 128.0) @ _M.T)
    return np.round(coef / q).astype(np.int64)


def _encode_block(bw, coef, pred, dc_codes, ac_codes) -> int:
    dc = int(coef[0, 0])
    s, code = _magnitude(dc - pred)
    bw.write(*dc_codes[s])
    if s:
        bw.write(code, s)
    run = 0
    for k in range(1, 64):
        r, c = _ZIGZAG[k]
        v = int(coef[r, c])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write(*ac_codes[0xF0])  # ZRL
            run -= 16
        s, code = _magnitude(v)
        bw.write(*ac_codes[(run << 4) | s])
        bw.write(code, s)
        run = 0
    if run:
        bw.write(*ac_codes[0x00])  # EOB
    return dc


def _pad_edge(plane: np.ndarray, rows: int, cols: int) -> np.ndarray:
    return np.pad(
        plane,
        ((0, rows - plane.shape[0]), (0, cols - plane.shape[1])),
        mode="edge",
    )


def _prep_planes(
    pixels, width, height, channels, quant, subsample, ycbcr_input
):
    """Shared front half of both encoders: validate, color-convert,
    subsample, MCU-pad. Returns (q 8×8, quant zigzag list, samps,
    hmax, vmax, mcux, mcuy, padded planes)."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be 444 or 420")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    quant = list(FLAT_Q8 if quant is None else quant)
    if len(quant) != 64 or not all(1 <= v <= 255 for v in quant):
        raise ValueError("quant must be 64 bytes in [1,255]")
    q = np.zeros((8, 8))
    for k in range(64):
        r, c = _ZIGZAG[k]
        q[r, c] = quant[k]

    arr = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64)
    if channels == 1:
        planes = [arr.reshape(height, width)]
        samps = [(1, 1)]
    else:
        tri = arr.reshape(height, width, 3)
        if ycbcr_input:
            y, cb, cr = tri[..., 0], tri[..., 1], tri[..., 2]
        else:
            r, g, b = tri[..., 0], tri[..., 1], tri[..., 2]
            y = 0.299 * r + 0.587 * g + 0.114 * b
            cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
            cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
            y, cb, cr = (np.clip(np.round(p), 0, 255) for p in (y, cb, cr))
        if subsample == "420":
            # box-average 2x2 (edge-replicated to even dims first)
            def down(p):
                pe = _pad_edge(
                    p, height + height % 2, width + width % 2
                )
                return np.round(
                    (pe[0::2, 0::2] + pe[0::2, 1::2]
                     + pe[1::2, 0::2] + pe[1::2, 1::2]) / 4.0
                )

            planes = [y, down(cb), down(cr)]
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samps = [(1, 1), (1, 1), (1, 1)]

    hmax = max(h for h, _ in samps)
    vmax = max(v for _, v in samps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    padded = [
        _pad_edge(p, mcuy * v * 8, mcux * h * 8)
        for p, (h, v) in zip(planes, samps)
    ]
    return q, quant, samps, hmax, vmax, mcux, mcuy, padded


def encode_jpeg(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    quant=None,
    subsample: str = "444",
    restart_interval: int = 0,
    ycbcr_input: bool = False,
) -> bytes:
    """Baseline JPEG encoder (test-fixture generator). ``pixels`` is
    row-major gray (channels=1) or interleaved RGB (channels=3);
    ``quant`` a 64-entry zigzag quantization table (default FLAT_Q8,
    the exact-DC table); ``subsample`` '444' or '420' (color only).
    ``ycbcr_input=True`` treats a 3-channel buffer as ALREADY
    interleaved Y/Cb/Cr (no color conversion) — the color-exactness
    fixture path: MCU-constant YCbCr planes with the flat quant
    table survive DCT/quant/420-box-average bit-exactly, so the
    decoder recovers the exact YCbCr and only the final (shared,
    closed-form) RGB conversion rounds."""
    q, quant, samps, hmax, vmax, mcux, mcuy, padded = _prep_planes(
        pixels, width, height, channels, quant, subsample, ycbcr_input
    )

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, bytes([0x00]) + bytes(quant))  # DQT table 0
    sof = bytearray([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof.append(channels)
    for i, (h, v) in enumerate(samps):
        sof += bytes([i + 1, (h << 4) | v, 0])
    out += _seg(0xC0, bytes(sof))
    dht = bytearray()
    for tc, (bits, vals) in (
        (0, (_DC_BITS, _DC_VALS)),
        (1, (_AC_BITS, _AC_VALS)),
    ):
        dht += bytes([tc << 4]) + bytes(bits) + bytes(vals)
    out += _seg(0xC4, bytes(dht))
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytearray([channels])
    for i in range(channels):
        sos += bytes([i + 1, 0x00])  # dc table 0 / ac table 0
    sos += bytes([0, 63, 0])  # Ss / Se / AhAl (baseline fixed)
    out += _seg(0xDA, bytes(sos))

    bw = _BitWriter()
    pred = [0] * channels
    mcu_count = 0
    rst_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst_idx])
                rst_idx = (rst_idx + 1) % 8
                pred = [0] * channels
            for ci, (plane, (h, v)) in enumerate(zip(padded, samps)):
                for by in range(v):
                    for bx in range(h):
                        y0 = (my * v + by) * 8
                        x0 = (mx * h + bx) * 8
                        coef = _fdct_quant(
                            plane[y0:y0 + 8, x0:x0 + 8], q
                        )
                        pred[ci] = _encode_block(
                            bw, coef, pred[ci], dc_codes, ac_codes
                        )
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---- progressive encoder (test-fixture generator, §G.1) ------------------

# The progressive AC table adds the EOBn end-of-band symbols
# (r<<4 for r=1..14) the baseline table never needs; 176 codes all at
# length 8 stay trivially canonical.
_AC_VALS_PROG = _AC_VALS + [r << 4 for r in range(1, 15)]
_AC_BITS_PROG = [0] * 7 + [len(_AC_VALS_PROG)] + [0] * 8

# Default scan scripts: component indices, Ss, Se, Ah, Al. Bands are
# kept identical across refinements of the same coefficients (the
# libjpeg convention); gray exercises AC successive approximation,
# color exercises the interleaved-DC + per-component-AC split.
DEFAULT_SCANS_GRAY = (
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
)
DEFAULT_SCANS_COLOR = (
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((2,), 1, 63, 0, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((2,), 1, 63, 1, 0),
)


def _trunc_shift(v: int, al: int) -> int:
    """The spec's AC point transform: divide by 2^Al toward ZERO
    (arithmetic shift would round negatives toward -inf)."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


class _ProgScanWriter:
    """Entropy writer for one progressive scan: wraps _BitWriter with
    the EOB-run + buffered-correction-bit state of §G.1.2.2-3. TWO
    correction-bit buffers, as the spec requires: ``ebits`` ride the
    pending EOB run and are emitted right after its EOBn symbol
    (prior blocks' tails); the CURRENT block's bits accumulate in a
    local buffer and follow that block's next coefficient/ZRL symbol
    — the decoder reads them during its advance AFTER the symbol."""

    def __init__(self, ac_codes):
        self.bw = _BitWriter()
        self.ac_codes = ac_codes
        self.eobrun = 0
        self.ebits: list[int] = []  # correction bits riding the run

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            self.bw.write(*self.ac_codes[r << 4])
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
            for bit in self.ebits:
                self.bw.write(bit, 1)
            self.ebits = []

    def ac_first_block(self, blk, ss, se, al) -> None:
        vals = [_trunc_shift(int(blk[k]), al) for k in range(ss, se + 1)]
        nz = [i for i, v in enumerate(vals) if v]
        if not nz:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()
            return
        self.flush_eobrun()
        run = 0
        last = nz[-1]
        for i in range(last + 1):
            v = vals[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                self.bw.write(*self.ac_codes[0xF0])
                run -= 16
            s, code = _magnitude(v)
            self.bw.write(*self.ac_codes[(run << 4) | s])
            self.bw.write(code, s)
            run = 0
        if last < len(vals) - 1:
            self.eobrun += 1

    def ac_refine_block(self, blk, ss, se, al) -> None:
        band = list(range(ss, se + 1))
        absvals = [abs(int(blk[k])) >> al for k in band]
        eob = 0  # index AFTER the last newly-nonzero coefficient
        for i, t in enumerate(absvals):
            if t == 1:
                eob = i + 1
        r = 0
        br: list[int] = []  # this block's correction bits
        for i, t in enumerate(absvals):
            if t == 0:
                r += 1
                continue
            while r > 15 and i < eob:
                self.flush_eobrun()
                self.bw.write(*self.ac_codes[0xF0])
                r -= 16
                for bit in br:
                    self.bw.write(bit, 1)
                br = []
            if t > 1:  # already nonzero in earlier scans: correction bit
                br.append(t & 1)
                continue
            # newly nonzero (t == 1): flush run, emit (r,1) + sign,
            # then THIS block's buffered correction bits
            self.flush_eobrun()
            self.bw.write(*self.ac_codes[(r << 4) | 1])
            self.bw.write(1 if int(blk[band[i]]) >= 0 else 0, 1)
            for bit in br:
                self.bw.write(bit, 1)
            br = []
            r = 0
        if r > 0 or br:
            self.eobrun += 1
            self.ebits.extend(br)  # tail bits ride the run
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()


def encode_jpeg_progressive(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    quant=None,
    subsample: str = "444",
    scans=None,
    restart_interval: int = 0,
    ycbcr_input: bool = False,
) -> bytes:
    """Progressive (SOF2) JPEG encoder — the fixture generator for
    the progressive decode path. Same pixel/quant/subsample contract
    as ``encode_jpeg``; ``scans`` is a sequence of (component
    indices, Ss, Se, Ah, Al) tuples (defaults exercise interleaved
    DC, spectral selection, and successive approximation). A full
    script reconstructs exactly the sequential coefficient array, so
    ``decode_jpeg`` must return pixels IDENTICAL to the baseline
    encoding of the same input — the equivalence gate the tests
    pin."""
    q, quant, samps, hmax, vmax, mcux, mcuy, padded = _prep_planes(
        pixels, width, height, channels, quant, subsample, ycbcr_input
    )
    if scans is None:
        scans = DEFAULT_SCANS_GRAY if channels == 1 else DEFAULT_SCANS_COLOR

    # quantized coefficients per component, zigzag order
    coefs = []
    for plane, (h, v) in zip(padded, samps):
        bv, bh = mcuy * v, mcux * h
        zz = np.zeros((bv, bh, 64), np.int64)
        for by in range(bv):
            for bx in range(bh):
                c8 = _fdct_quant(plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8], q)
                for k in range(64):
                    r, col = _ZIGZAG[k]
                    zz[by, bx, k] = c8[r, col]
        coefs.append(zz)

    # non-interleaved block grids (ceil of component dims / 8)
    def cdiv(a, b):
        return -(-a // b)

    cbw = [cdiv(cdiv(width * h, hmax), 8) for h, _ in samps]
    cbh = [cdiv(cdiv(height * v, vmax), 8) for _, v in samps]

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS_PROG, _AC_VALS_PROG)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(quant))
    sof = bytearray([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof.append(channels)
    for i, (h, v) in enumerate(samps):
        sof += bytes([i + 1, (h << 4) | v, 0])
    out += _seg(0xC2, bytes(sof))  # SOF2: progressive
    dht = bytearray()
    for tc, (bits, vals) in (
        (0, (_DC_BITS, _DC_VALS)),
        (1, (_AC_BITS_PROG, _AC_VALS_PROG)),
    ):
        dht += bytes([tc << 4]) + bytes(bits) + bytes(vals)
    out += _seg(0xC4, bytes(dht))
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))

    for comp_idx, ss, se, ah, al in scans:
        sos = bytearray([len(comp_idx)])
        for ci in comp_idx:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, bytes(sos))

        w = _ProgScanWriter(ac_codes)
        pred = {ci: 0 for ci in comp_idx}
        rst_idx = 0
        unit = 0

        def maybe_restart():
            nonlocal rst_idx
            if restart_interval and unit and unit % restart_interval == 0:
                w.flush_eobrun()
                w.bw.flush()
                w.bw.out += bytes([0xFF, 0xD0 + rst_idx])
                rst_idx = (rst_idx + 1) % 8
                for ci in pred:
                    pred[ci] = 0

        def dc_unit(ci, blk):
            dc = int(blk[0])
            if ah == 0:
                v = dc >> al  # DC point transform is arithmetic shift
                s, code = _magnitude(v - pred[ci])
                w.bw.write(*dc_codes[s])
                if s:
                    w.bw.write(code, s)
                pred[ci] = v
            else:
                w.bw.write((dc >> al) & 1, 1)

        if ss == 0 and len(comp_idx) > 1:
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart()
                    for ci in comp_idx:
                        h, v = samps[ci]
                        for by in range(v):
                            for bx in range(h):
                                dc_unit(
                                    ci,
                                    coefs[ci][my * v + by, mx * h + bx],
                                )
                    unit += 1
        else:
            ci = comp_idx[0]
            for by in range(cbh[ci]):
                for bx in range(cbw[ci]):
                    maybe_restart()
                    blk = coefs[ci][by, bx]
                    if ss == 0:
                        dc_unit(ci, blk)
                    elif ah == 0:
                        w.ac_first_block(blk, ss, se, al)
                    else:
                        w.ac_refine_block(blk, ss, se, al)
                    unit += 1
        w.flush_eobrun()
        w.bw.flush()
        out += w.bw.out
    out += b"\xff\xd9"
    return bytes(out)
