"""Pure-Python/numpy FLAC codec — real COMPRESSED audio, no external libs.

Shrinks the compressed-audio seam flagged since round 2
(idf/functions/media.py): FLAC is a public, fully-specified lossless
codec (RFC 9639), so — like JFIF/WAV/Y4M before it — it is
implementable in-sandbox from the spec alone. The decoder covers the
full subframe surface a real encoder emits:

- metadata walk (STREAMINFO required; PADDING/VORBIS_COMMENT/... skipped)
- frame headers: all block-size / sample-rate / sample-size codes incl.
  end-of-header follow-ups, UTF-8-coded frame numbers, CRC-8 verified
- subframes: CONSTANT, VERBATIM, FIXED (orders 0-4), LPC (any order,
  signed quantized coefficients + shift), wasted-bits unpacking
- inter-channel decorrelation: independent, left/side, right/side,
  mid/side (side channel at bps+1 per spec)
- residuals: Rice method 0 (4-bit params) and 1 (5-bit), partition
  orders, escape partitions (raw bps, incl. bps=0)
- CRC-16 over every frame; corrupt streams raise FlacError

The encoder exists so the decoder can be tested against REAL compressed
streams without external fixtures: it emits spec-conformant files with
constant / verbatim / fixed(0-2) / explicit-LPC subframes, any of the
four channel assignments, and single-partition Rice residuals with a
searched parameter. Lossless round-trip (encode -> decode == input) is
exact by construction and pinned by tests/test_flac.py, which also
pins WAV-vs-FLAC feature parity through the media stage.

Throughput note: Rice coding is inherently bit-serial; this
implementation is a per-sample Python loop (fine for the feature
stage's clip-sized inputs; the 100-TB path batches clips per actor the
same as WAV). Lossy formats (mp3/aac) remain the honest strict-raise
seam — they require patent-encumbered DSP stacks, not just a parser.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"fLaC"


class FlacError(ValueError):
    pass


# ---------------------------------------------------------------------------
# CRCs (frame header CRC-8 poly 0x07, frame CRC-16 poly 0x8005; init 0)


def _make_crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tbl = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) & mask if r & top else (r << 1) & mask
        tbl.append(r)
    return tbl


_CRC8 = _make_crc_table(0x07, 8)
_CRC16 = _make_crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8[r ^ b]
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFF) ^ _CRC16[(r >> 8) ^ b]
    return r


# ---------------------------------------------------------------------------
# bit I/O


class _BitReader:
    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # byte position
        self.bit = 0  # bits consumed within data[pos]

    def read(self, n: int) -> int:
        """n-bit big-endian unsigned."""
        v = 0
        data, pos, bit = self.data, self.pos, self.bit
        while n > 0:
            if pos >= len(data):
                raise FlacError("truncated stream")
            avail = 8 - bit
            take = min(n, avail)
            byte = data[pos]
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            bit += take
            n -= take
            if bit == 8:
                pos += 1
                bit = 0
        self.pos, self.bit = pos, bit
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        """Count 0-bits until the terminating 1-bit."""
        q = 0
        data, pos, bit = self.data, self.pos, self.bit
        while True:
            if pos >= len(data):
                raise FlacError("truncated unary")
            byte = data[pos]
            rest = byte & ((1 << (8 - bit)) - 1)
            if rest == 0:
                q += 8 - bit
                pos += 1
                bit = 0
                continue
            lead = (8 - bit) - rest.bit_length()
            q += lead
            bit += lead + 1
            if bit == 8:
                pos += 1
                bit = 0
            self.pos, self.bit = pos, bit
            return q

    def align(self) -> None:
        if self.bit:
            self.pos += 1
            self.bit = 0


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


# ---------------------------------------------------------------------------
# UTF-8-coded frame number (extended to 36 bits / 7 bytes per spec)


def _utf8_encode(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    for nbytes, bits in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31), (7, 36)):
        if v < (1 << bits):
            lead = (0xFF << (8 - nbytes)) & 0xFF
            out = [lead | (v >> (6 * (nbytes - 1)))]
            for i in range(nbytes - 2, -1, -1):
                out.append(0x80 | ((v >> (6 * i)) & 0x3F))
            return bytes(out)
    raise FlacError("frame number too large")


def _utf8_decode(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while (b0 << n) & 0x80:
        n += 1
    if n < 2 or n > 7:
        raise FlacError("bad UTF-8 frame number")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise FlacError("bad UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


# ---------------------------------------------------------------------------
# decode

_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}
_BLOCKSIZE_TABLE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608}
_SR_TABLE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_BPS_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def flac_info(data) -> dict:
    """Parse the STREAMINFO metadata block (header-only, no frames)."""
    data = bytes(data) if not isinstance(data, (bytes, bytearray)) else data
    if data[:4] != MAGIC:
        raise FlacError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise FlacError("truncated metadata")
        hdr = data[pos]
        btype, last = hdr & 0x7F, bool(hdr & 0x80)
        (blen,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + blen]
        if btype == 0:  # STREAMINFO
            if blen < 34:
                raise FlacError("short STREAMINFO")
            r = _BitReader(body)
            info = {
                "min_blocksize": r.read(16),
                "max_blocksize": r.read(16),
                "min_framesize": r.read(24),
                "max_framesize": r.read(24),
                "sample_rate": r.read(20),
                "n_channels": r.read(3) + 1,
                "bits": r.read(5) + 1,
                "n_samples": r.read(36),
            }
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise FlacError("missing STREAMINFO")
    info["frames_offset"] = pos
    return info


def _decode_subframe(r: _BitReader, n: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise FlacError("bad subframe padding bit")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
        bps -= wasted
    if stype == 0:  # CONSTANT
        x = np.full(n, r.read_signed(bps), dtype=np.int64)
    elif stype == 1:  # VERBATIM
        x = np.array([r.read_signed(bps) for _ in range(n)], dtype=np.int64)
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype & 0x07
        x = _decode_predicted(r, n, bps, order, _FIXED_COEFS[order], 0)
    elif stype >= 32:  # LPC
        order = (stype & 0x1F) + 1
        warm = [r.read_signed(bps) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise FlacError("invalid LPC precision")
        shift = r.read_signed(5)
        if shift < 0:
            raise FlacError("negative LPC shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        x = _decode_predicted(r, n, bps, order, coefs, shift, warm)
    else:
        raise FlacError(f"reserved subframe type {stype}")
    return x << wasted if wasted else x


def _decode_predicted(
    r: _BitReader, n: int, bps: int, order: int, coefs: list[int], shift: int, warm=None
) -> np.ndarray:
    if warm is None:
        warm = [r.read_signed(bps) for _ in range(order)]
    resid = _decode_residual(r, n, order)
    x = [0] * n
    x[:order] = [int(w) for w in warm]
    c = coefs
    for i in range(order, n):
        acc = 0
        for j in range(order):
            acc += c[j] * x[i - 1 - j]
        x[i] = resid[i - order] + (acc >> shift)
    return np.array(x, dtype=np.int64)


def _decode_residual(r: _BitReader, block_size: int, pred_order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise FlacError("reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = r.read(4)
    n_part = 1 << po
    if block_size % n_part or (block_size >> po) <= pred_order:
        raise FlacError("bad partition order")
    out: list[int] = []
    for p in range(n_part):
        cnt = (block_size >> po) - (pred_order if p == 0 else 0)
        k = r.read(pbits)
        if k == escape:
            raw = r.read(5)
            if raw == 0:
                out.extend([0] * cnt)
            else:
                out.extend(r.read_signed(raw) for _ in range(cnt))
        else:
            for _ in range(cnt):
                q = r.read_unary()
                v = (q << k) | r.read(k)
                out.append(-(v >> 1) - 1 if v & 1 else v >> 1)
    return out


def decode_flac_int(data) -> tuple[np.ndarray, int, int]:
    """FLAC bytes -> (int32 samples (n, channels), sample_rate, bits).
    CRC-8/CRC-16 verified on every frame."""
    data = bytes(data) if not isinstance(data, (bytes, bytearray)) else data
    info = flac_info(data)
    pos = info["frames_offset"]
    chunks: list[np.ndarray] = []
    got = 0
    want = info["n_samples"]
    while pos < len(data) and (want == 0 or got < want):
        r = _BitReader(data, pos)
        sync = r.read(14)
        if sync != 0b11111111111110:
            raise FlacError(f"bad frame sync at {pos}")
        if r.read(1):
            raise FlacError("reserved frame bit set")
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_asgn = r.read(4)
        ss_code = r.read(3)
        if r.read(1):
            raise FlacError("reserved frame bit set")
        _utf8_decode(r)  # frame/sample number
        if bs_code == 0:
            raise FlacError("reserved block size code")
        elif bs_code in _BLOCKSIZE_TABLE:
            block_size = _BLOCKSIZE_TABLE[bs_code]
        elif bs_code == 6:
            block_size = r.read(8) + 1
        elif bs_code == 7:
            block_size = r.read(16) + 1
        else:
            block_size = 256 << (bs_code - 8)
        if sr_code == 0:
            pass
        elif sr_code in _SR_TABLE:
            pass
        elif sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        else:
            raise FlacError("invalid sample rate code")
        bps = info["bits"] if ss_code == 0 else _BPS_TABLE.get(ss_code)
        if bps is None:
            raise FlacError("reserved sample size code")
        hdr_end = r.pos  # crc8 is byte-aligned here by construction
        if r.bit:
            raise FlacError("unaligned frame header")
        if crc8(data[pos:hdr_end]) != r.read(8):
            raise FlacError("frame header CRC-8 mismatch")

        if ch_asgn < 8:
            n_ch = ch_asgn + 1
            subs = [_decode_subframe(r, block_size, bps) for _ in range(n_ch)]
            frame = np.stack(subs, axis=1)
        elif ch_asgn in (8, 9, 10):
            n_ch = 2
            bps_a = bps + (1 if ch_asgn == 9 else 0)
            bps_b = bps + (1 if ch_asgn in (8, 10) else 0)
            a = _decode_subframe(r, block_size, bps_a)
            b = _decode_subframe(r, block_size, bps_b)
            if ch_asgn == 8:  # left/side
                left, right = a, a - b
            elif ch_asgn == 9:  # right/side
                left, right = a + b, b
            else:  # mid/side
                m = (a << 1) | (b & 1)
                left, right = (m + b) >> 1, (m - b) >> 1
            frame = np.stack([left, right], axis=1)
        else:
            raise FlacError("reserved channel assignment")
        if frame.shape[1] != info["n_channels"]:
            raise FlacError("channel count changed mid-stream")
        r.align()
        footer = r.read(16)
        if crc16(data[pos : r.pos - 2]) != footer:
            raise FlacError("frame CRC-16 mismatch")
        chunks.append(frame)
        got += block_size
        pos = r.pos
    x = np.concatenate(chunks, axis=0) if chunks else np.zeros((0, info["n_channels"]), np.int64)
    if want:
        x = x[:want]
    return x.astype(np.int32), info["sample_rate"], info["bits"]


def decode_flac(data) -> tuple[np.ndarray, int]:
    """FLAC bytes -> (float32 in [-1, 1], shape (n, channels),
    sample_rate) — same scaling convention as idf.codecs.wav."""
    x, sr, bits = decode_flac_int(data)
    return (x.astype(np.float32) / float(1 << (bits - 1))), sr


# ---------------------------------------------------------------------------
# encode


def _rice_cost(resid: np.ndarray, k: int) -> int:
    u = np.where(resid >= 0, resid.astype(np.int64) << 1, ((-resid.astype(np.int64)) << 1) - 1)
    return int((u >> k).sum()) + len(u) * (1 + k)


def _best_rice_k(resid: np.ndarray, pbits: int) -> int:
    best_k, best_c = 0, None
    for k in range((1 << pbits) - 1):
        c = _rice_cost(resid, k)
        if best_c is None or c < best_c:
            best_k, best_c = k, c
        if c > 2 * (best_c or c):
            break
    return best_k


def _write_residual(w: _BitWriter, resid: np.ndarray) -> None:
    """Single-partition Rice residual; method/param width chosen by k."""
    k = _best_rice_k(resid, 4)
    if k >= 15:
        k = min(_best_rice_k(resid, 5), 29)
        w.write(1, 2)
        w.write(0, 4)
        w.write(k, 5)
    else:
        w.write(0, 2)
        w.write(0, 4)  # partition order 0
        w.write(k, 4)
    for v in resid.tolist():
        u = (v << 1) if v >= 0 else ((-v) << 1) - 1
        w.write_unary(u >> k)
        if k:
            w.write(u & ((1 << k) - 1), k)


def _write_subframe(
    w: _BitWriter, x: np.ndarray, bps: int, lpc: tuple[list[int], int, int] | None
) -> None:
    x = x.astype(np.int64)
    n = len(x)
    if np.all(x == x[0]):
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)
        w.write(int(x[0]), bps)
        return
    if lpc is not None:
        coefs, prec, shift = lpc
        if not (2 <= prec <= 15) or not (0 <= shift <= 15):
            raise FlacError("LPC precision must be 2-15 bits, shift 0-15")
        if any(c < -(1 << (prec - 1)) or c >= (1 << (prec - 1)) for c in coefs):
            raise FlacError(f"LPC coefficient exceeds {prec}-bit signed range")
        order = len(coefs)
        resid = np.empty(n - order, dtype=np.int64)
        for i in range(order, n):
            acc = sum(coefs[j] * x[i - 1 - j] for j in range(order))
            resid[i - order] = x[i] - (acc >> shift)
        w.write(0, 1)
        w.write(0x20 | (order - 1), 6)
        w.write(0, 1)
        for v in x[:order].tolist():
            w.write(v, bps)
        w.write(prec - 1, 4)
        w.write(shift, 5)
        for c in coefs:
            w.write(c, prec)
        _write_residual(w, resid)
        return
    # best fixed order 0-4 vs verbatim
    cand = []
    for order, coefs in sorted(_FIXED_COEFS.items()):
        if n <= order:
            continue
        resid = x[order:].copy()
        for j, c in enumerate(coefs):
            resid -= c * x[order - 1 - j : n - 1 - j]
        k = _best_rice_k(resid, 4)
        cost = order * bps + 2 + 4 + 4 + _rice_cost(resid, min(k, 14))
        cand.append((cost, order, resid))
    cost, order, resid = min(cand, key=lambda t: t[0])
    if cost >= n * bps:  # VERBATIM smaller
        w.write(0, 1)
        w.write(1, 6)
        w.write(0, 1)
        for v in x.tolist():
            w.write(v, bps)
        return
    w.write(0, 1)
    w.write(8 | order, 6)
    w.write(0, 1)
    for v in x[:order].tolist():
        w.write(v, bps)
    _write_residual(w, resid)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int,
    bits: int = 16,
    block_size: int = 4096,
    stereo: str = "independent",
    lpc: tuple[list[int], int, int] | None = None,
) -> bytes:
    """Integer PCM (n,) or (n, ch) at ``bits`` depth -> FLAC bytes.

    ``stereo``: independent | left_side | right_side | mid_side (2-ch
    inputs only) — exercises every decoder decorrelation path, all
    lossless. ``lpc=(coefs, precision, shift)`` forces explicit-LPC
    subframes (any quantized predictor is lossless; quality only
    affects size)."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    if x.min() < lo or x.max() > hi:
        raise FlacError(f"samples exceed {bits}-bit range")
    if stereo != "independent" and ch != 2:
        raise FlacError("stereo decorrelation requires 2 channels")

    out = bytearray(MAGIC)
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)  # min/max framesize unknown
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(bits - 1, 5)
    si.write(n, 36)
    body = si.out + bytes(16)  # md5 unknown (zeros) — legal per spec
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + bytes(body)

    asgn = {"independent": ch - 1, "left_side": 8, "right_side": 9, "mid_side": 10}[stereo]
    for f, start in enumerate(range(0, n, block_size)):
        blk = x[start : start + block_size]
        bs = len(blk)
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocking
        w.write(7, 4)  # block size: 16-bit follows
        w.write(0, 4)  # sample rate: from STREAMINFO
        w.write(asgn, 4)
        ss = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}.get(bits, 0)
        w.write(ss, 3)
        w.write(0, 1)
        for b in _utf8_encode(f):
            w.write(b, 8)
        w.write(bs - 1, 16)
        hdr = bytes(w.out)
        w.write(crc8(hdr), 8)
        if stereo == "independent":
            for c in range(ch):
                _write_subframe(w, blk[:, c], bits, lpc)
        else:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            if stereo == "left_side":
                _write_subframe(w, left, bits, lpc)
                _write_subframe(w, side, bits + 1, lpc)
            elif stereo == "right_side":
                _write_subframe(w, side, bits + 1, lpc)
                _write_subframe(w, right, bits, lpc)
            else:
                _write_subframe(w, (left + right) >> 1, bits, lpc)
                _write_subframe(w, side, bits + 1, lpc)
        w.align()
        frame = bytes(w.out)
        out += frame + struct.pack(">H", crc16(frame))
    return bytes(out)
