"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus typed metadata — the
schema, partitioning, and Arrow-batched UDF shape are the real,
production-grade part.  Decode is TIERED per blob, probed inside the
Arrow UDFs:

* **images** — PIL when importable (any format), else REAL stdlib
  decoders for PNG (zlib inflate + full unfiltering), 24-bit BMP,
  JPEG — both BASELINE (SOF0) and PROGRESSIVE (SOF2: spectral
  selection, successive approximation incl. AC refinement, EOB runs,
  any sampling factors, restart intervals) — and GIF87a/89a first
  frames (variable-width LZW, interlace, local color tables); resize
  likewise (PIL resample, else nearest-neighbor + PNG re-encode).
  All tiers emit the same 16-bin ITU-R 601-2 luma histogram, so
  features are backend-invariant.
* **audio** — RIFF/WAVE 16-bit PCM decodes for REAL (stdlib ``wave`` +
  numpy rFFT); compressed codecs fall back to the stub.
* **video** — RIFF/AVI containers DEMUX for real (exact frame bytes +
  timestamps via stdlib ``struct``); pixel decode of compressed frames
  stays codec-gated (MJPEG frames feed the image tiers directly).

Undecodable blobs always fall back to a deterministic content-hash stub
so the full pipeline (schema, batching, downstream ANN) is testable in
any environment.

Batch-shape rules encoded here (the part that matters at 100 TB):
* ``mapInPandas`` streams Arrow record batches — media bytes never
  round-trip through Python row objects.
* ``spark.sql.execution.arrow.maxRecordsPerBatch`` should be lowered
  (e.g. 64) for large blobs so a batch stays ≪ executor memory.
* Feature extraction emits fixed-size float arrays → downstream joins/
  ANN reuse the similarity operators unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha", T.StringType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def _imaging():
    """Import-gated imaging backend: PIL's Image module when installed,
    else ``None`` (→ deterministic stub). Called INSIDE the Arrow UDFs so
    the probe runs on the executor that will do the decoding, not the
    driver."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _bmp_pixels(content: bytes):
    """Parse an uncompressed 24-bit BITMAPINFOHEADER BMP to raw rows
    (stdlib struct only): returns (width, height, bpp=3, rows top-down,
    RGB order) — BMP stores bottom-up BGR with 4-byte row padding."""
    import struct

    if content[:2] != b"BM" or len(content) < 54:
        raise ValueError("not a bmp")
    (data_off,) = struct.unpack("<I", content[10:14])
    (hdr_size, width, height) = struct.unpack("<Iii", content[14:26])
    (planes, depth) = struct.unpack("<HH", content[26:30])
    (compression,) = struct.unpack("<I", content[30:34])
    if hdr_size < 40 or depth != 24 or compression != 0 or width <= 0:
        raise ValueError("unsupported bmp variant")
    flip = height > 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3  # rows pad to 4 bytes
    if len(content) < data_off + stride * height:
        raise ValueError("truncated bmp")
    rows = []
    for y in range(height):
        src_y = (height - 1 - y) if flip else y
        off = data_off + src_y * stride
        line = bytearray(width * 3)
        for x in range(width):
            b, g, r = content[off + x * 3:off + x * 3 + 3]
            line[x * 3:x * 3 + 3] = bytes((r, g, b))
        rows.append(line)
    return width, height, 3, rows


def _decode_bmp_stdlib(content: bytes) -> dict:
    """REAL 24-bit BMP decode — same 16-bin luma histogram contract as
    the PNG/PIL tiers."""
    import hashlib

    width, height, bpp, rows = _bmp_pixels(content)
    hist = [0] * 16
    for line in rows:
        for i in range(0, width * bpp, bpp):
            luma = (
                line[i] * 299 + line[i + 1] * 587 + line[i + 2] * 114
            ) // 1000
            hist[luma >> 4] += 1
    total = float(sum(hist)) or 1.0
    digest = hashlib.sha256(content).digest()
    return {
        "sha": digest.hex()[:16],
        "features": [h / total for h in hist],
    }


def _jpeg_pixels(content: bytes):
    """REAL JPEG decode with stdlib + numpy only: marker parse → Huffman
    entropy decode → dequantize → de-zigzag → 8×8 IDCT (orthonormal
    basis matmul) → sampling-factor upsample → JFIF YCbCr→RGB.  Returns
    a (height, width, 3) uint8 array.

    Scope: BASELINE sequential (SOF0) and PROGRESSIVE (SOF2, round 6)
    — multi-scan accumulation into per-block coefficient state with
    spectral selection (Ss..Se bands), successive approximation (DC
    first + refinement, AC first with shared EOB runs + AC refinement
    per T.81 §G.1.2), non-interleaved single-component scan geometry,
    per-scan Huffman table redefinition, and restart intervals in both
    modes.  8-bit precision, grayscale or YCbCr, any h×v sampling.
    Arithmetic coding, hierarchical (SOF5+), and 12-bit precision raise
    ValueError so callers fall through to the next tier.

    The JPEG spec's DCT, F(u,v) = ¼·C(u)C(v)·ΣΣ f·cos·cos with
    C(0)=1/√2, is exactly the orthonormal 8-point basis
    A[u,x] = c(u)·cos((2x+1)uπ/16), c(0)=√(1/8) else ½ — so the IDCT is
    two matrix multiplies, f = Aᵀ·F·A, vectorized across each block.
    """
    import struct

    import numpy as np

    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")

    # --- zigzag order (spec Figure A.6) ---
    ZZ = np.array([
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ])

    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) → codes
    frame = None       # (h, w, comps, progressive)
    restart_interval = 0
    scans = []         # (scan_comps, Ss, Se, Ah, Al, entropy, tables, dri)

    def _entropy_end(data: bytes, start: int) -> int:
        """Index of the marker that terminates an entropy segment
        (skipping stuffed 0xFF00 and RSTn)."""
        j = start
        while j + 1 < len(data):
            if data[j] == 0xFF and data[j + 1] not in (0x00,) and not (
                0xD0 <= data[j + 1] <= 0xD7
            ):
                return j
            j += 1
        return len(data)

    i = 2
    n = len(content)
    while i < n:
        if content[i] != 0xFF:
            raise ValueError(f"marker sync lost at {i}")
        while i < n and content[i] == 0xFF:
            i += 1
        marker = content[i]
        i += 1
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", content[i:i + 2])
        seg = content[i + 2:i + seglen]
        i += seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    vals = np.frombuffer(seg[p:p + 128], ">u2").astype(np.int32)
                    p += 128
                else:
                    vals = np.frombuffer(seg[p:p + 64], np.uint8).astype(np.int32)
                    p += 64
                qtables[tq] = vals  # kept in zigzag order
        elif marker == 0xC4:  # DHT (tables may be redefined between scans)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = seg[p + 1:p + 17]
                p += 17
                table: dict[tuple[int, int], int] = {}
                code = 0
                for length in range(1, 17):
                    for _ in range(counts[length - 1]):
                        table[(length, code)] = seg[p]
                        p += 1
                        code += 1
                    code <<= 1
                huff[(tc, th)] = table
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(f"{prec}-bit precision unsupported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (fh, fw, comps, marker == 0xC2)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF 0x{marker:02x}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — collect this scan, keep walking
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                idx = next(
                    k for k, comp in enumerate(frame[2]) if comp[0] == cs
                )
                scan_comps.append((idx, tdta >> 4, tdta & 15))
            ss, se, ahl = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            end = _entropy_end(content, i)
            scans.append((scan_comps, ss, se, ahl >> 4, ahl & 15,
                          content[i:end], dict(huff), restart_interval))
            i = end
        # APPn / COM / others: skipped

    if frame is None or not scans:
        raise ValueError("missing SOF/SOS")
    fh, fw, comps, progressive = frame
    if not progressive:
        sc, ss, se, ah, al = (scans[0][0], scans[0][1], scans[0][2],
                              scans[0][3], scans[0][4])
        if (ss, se, ah, al) != (0, 63, 0, 0) or len(scans) != 1:
            raise ValueError("baseline frame with progressive-style scans")

    # --- entropy-coded bit reader (0xFF00 stuffing, RSTn boundaries).
    # Byte-at-a-time: a marker byte is never consumed by bit reads (the
    # reader pads with zeros instead), so sync_restart() can byte-align
    # and consume exactly the FF Dn pair — no ambiguity between real
    # bits and padding at a restart boundary.  Per-bit Python is slow,
    # but this tier only runs when PIL is absent; with PIL installed the
    # C decoder takes precedence (probe order in extract_image_features).
    class _Bits:
        def __init__(self, data: bytes):
            self.d = data
            self.pos = 0
            self.cur = 0
            self.nbits = 0

        def _next_byte(self) -> int:
            if self.pos >= len(self.d):
                return 0  # pad past end — spec allows
            b = self.d[self.pos]
            if b == 0xFF:
                nxt = (self.d[self.pos + 1]
                       if self.pos + 1 < len(self.d) else 0xD9)
                if nxt == 0x00:
                    self.pos += 2  # byte-stuffed literal 0xFF
                    return 0xFF
                return 0  # marker reached: pad, do NOT consume
            self.pos += 1
            return b

        def take1(self) -> int:
            if self.nbits == 0:
                self.cur = self._next_byte()
                self.nbits = 8
            self.nbits -= 1
            return (self.cur >> self.nbits) & 1

        def take(self, k: int) -> int:
            v = 0
            for _ in range(k):
                v = (v << 1) | self.take1()
            return v

        def huffman(self, table: dict) -> int:
            code = 0
            for length in range(1, 17):
                code = (code << 1) | self.take1()
                sym = table.get((length, code))
                if sym is not None:
                    return sym
            raise ValueError("invalid Huffman code")

        def sync_restart(self):
            """Byte-align (discard the current byte's leftover bits) and
            consume one RSTn marker."""
            self.nbits = 0
            while self.pos + 1 < len(self.d):
                if (self.d[self.pos] == 0xFF
                        and 0xD0 <= self.d[self.pos + 1] <= 0xD7):
                    self.pos += 2
                    return
                self.pos += 1  # tolerate pre-marker fill bytes
            raise ValueError("expected restart marker")

    def extend(v: int, t: int) -> int:
        return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    # per-component coefficient state, ZIGZAG order per block — scans
    # accumulate into this (progressive), or one scan fills it (baseline)
    geom = []   # per comp: (bw_mcu, bh_mcu, bw_real, bh_real)
    coefs = []
    for cid, hi, vi, tq in comps:
        bw_mcu, bh_mcu = mcux * hi, mcuy * vi
        cw = -(-fw * hi // hmax)   # ceil(w * hi / hmax)
        ch = -(-fh * vi // vmax)
        bw_real, bh_real = -(-cw // 8), -(-ch // 8)
        geom.append((bw_mcu, bh_mcu, bw_real, bh_real))
        coefs.append(np.zeros((bh_mcu, bw_mcu, 64), np.int32))

    for (scan_comps, ss, se, ah, al, entropy, tables, dri) in scans:
        bits = _Bits(entropy)
        pred = [0] * len(comps)
        eobrun = 0
        interleaved = len(scan_comps) > 1

        def decode_dc_first(ci, td, by, bx):
            t = bits.huffman(tables[(0, td)])
            pred[ci] += extend(bits.take(t), t)
            coefs[ci][by, bx, 0] = pred[ci] << al

        def decode_dc_refine(ci, by, bx):
            if bits.take1():
                coefs[ci][by, bx, 0] |= 1 << al

        def decode_ac_first(ci, ta, by, bx):
            nonlocal eobrun
            if eobrun > 0:
                eobrun -= 1
                return
            blk = coefs[ci][by, bx]
            k = ss
            while k <= se:
                sym = bits.huffman(tables[(1, ta)])
                r, s = sym >> 4, sym & 15
                if s == 0:
                    if r < 15:  # EOBn: run of 2^r + extra blocks
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += bits.take(r)
                        return
                    k += 16  # ZRL
                    continue
                k += r
                if k > se:
                    raise ValueError("AC index overflow")
                blk[k] = extend(bits.take(s), s) << al
                k += 1

        def decode_ac_refine(ci, ta, by, bx):
            # T.81 §G.1.2.3: one correction bit per already-nonzero
            # coefficient passed; new coefficients enter as ±1<<al.
            nonlocal eobrun
            p1, m1 = 1 << al, -1 << al
            blk = coefs[ci][by, bx]

            def correct(k):
                if bits.take1() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] > 0 else m1

            k = ss
            if eobrun > 0:
                eobrun -= 1
                for j in range(ss, se + 1):
                    if blk[j]:
                        correct(j)
                return
            while k <= se:
                sym = bits.huffman(tables[(1, ta)])
                r, s = sym >> 4, sym & 15
                newval = 0
                if s == 0:
                    if r < 15:  # EOBn: correct the rest, bank the run
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += bits.take(r)
                        for j in range(k, se + 1):
                            if blk[j]:
                                correct(j)
                        return
                    # ZRL: skip 16 zero-HISTORY positions
                elif s == 1:
                    newval = p1 if bits.take1() else m1
                else:
                    raise ValueError("AC refinement size must be 1")
                # advance past r zero-history coefficients, correcting
                # nonzero ones encountered on the way
                while k <= se:
                    if blk[k]:
                        correct(k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    blk[k] = newval
                k += 1

        def decode_block(ci, td, ta, by, bx):
            if ss == 0 and se == 0:
                if ah == 0:
                    decode_dc_first(ci, td, by, bx)
                else:
                    decode_dc_refine(ci, by, bx)
            elif progressive:
                if ah == 0:
                    decode_ac_first(ci, ta, by, bx)
                else:
                    decode_ac_refine(ci, ta, by, bx)
            else:  # baseline: DC + full AC band in one pass
                decode_dc_first(ci, td, by, bx)
                blk = coefs[ci][by, bx]
                k = 1
                while k < 64:
                    sym = bits.huffman(tables[(1, ta)])
                    if sym == 0:
                        break  # EOB
                    if sym == 0xF0:
                        k += 16
                        continue
                    k += sym >> 4
                    s = sym & 15
                    if k > 63:
                        raise ValueError("AC index overflow")
                    blk[k] = extend(bits.take(s), s)
                    k += 1

        def maybe_restart(unit_idx):
            nonlocal pred, eobrun
            if dri and unit_idx and unit_idx % dri == 0:
                bits.sync_restart()
                pred = [0] * len(comps)
                eobrun = 0

        if interleaved:
            u = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart(u)
                    for ci, td, ta in scan_comps:
                        _, hi, vi, _tq = comps[ci]
                        for by in range(vi):
                            for bx in range(hi):
                                decode_block(
                                    ci, td, ta, my * vi + by, mx * hi + bx
                                )
                    u += 1
        else:
            # non-interleaved: raster over the component's REAL block
            # grid (ceil(comp dims / 8)), not the MCU-padded grid
            ci, td, ta = scan_comps[0]
            _, _, bw_real, bh_real = geom[ci]
            u = 0
            for by in range(bh_real):
                for bx in range(bw_real):
                    maybe_restart(u)
                    decode_block(ci, td, ta, by, bx)
                    u += 1

    # orthonormal 8-point DCT basis
    xs = np.arange(8)
    A = np.cos((2 * xs[None, :] + 1) * xs[:, None] * np.pi / 16)
    A[0] *= np.sqrt(1 / 2)
    A *= 0.5  # c(0)=√(1/8), c(u>0)=½

    planes = []
    for (cid, hi, vi, tq), cf, (bw_mcu, bh_mcu, _, _) in zip(
        comps, coefs, geom
    ):
        q = qtables[tq]
        plane = np.zeros((bh_mcu * 8, bw_mcu * 8), np.float64)
        for by in range(bh_mcu):
            for bx in range(bw_mcu):
                blk = np.zeros(64, np.float64)
                blk[ZZ] = cf[by, bx] * q
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                    A.T @ blk.reshape(8, 8) @ A + 128.0
                )
        planes.append(plane)

    # upsample each plane to full frame resolution (pixel replication —
    # the JFIF-sanctioned nearest-neighbor expansion) and crop padding
    full = []
    for (cid, hi, vi, tq), plane in zip(comps, planes):
        up = np.repeat(np.repeat(plane, vmax // vi, 0), hmax // hi, 1)
        full.append(up[:fh, :fw])
    if len(full) == 1:
        ycc = np.clip(full[0], 0, 255)
        rgb = np.stack([ycc, ycc, ycc], -1)
    else:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.clip(np.stack([r, g, b], -1), 0, 255)
    return np.round(rgb).astype(np.uint8)


def _gif_pixels(content: bytes):
    """REAL GIF decode with stdlib only — first frame of GIF87a/GIF89a:
    logical screen + global/local color table, extension-block skipping,
    variable-width LZW (clear/end codes, 12-bit cap, sub-block
    reassembly, little-endian bit packing), and four-pass interlace
    reassembly.  Returns a (height, width, 3) uint8 RGB array.

    Transparency is ignored (the transparent index renders as its
    palette color): the consumer is the luma-histogram feature tier,
    where compositing against an undefined background would invent
    data.  Animated GIFs decode their FIRST image descriptor only.
    """
    import struct

    import numpy as np

    if content[:4] != b"GIF8" or content[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", content[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = content[pos:pos + 3 * n]
        pos += 3 * n

    def skip_subblocks(p):
        while True:
            sz = content[p]
            p += 1
            if sz == 0:
                return p
            p += sz

    # walk blocks to the first image descriptor
    while True:
        b = content[pos]
        pos += 1
        if b == 0x3B:  # trailer before any image
            raise ValueError("GIF contains no image")
        if b == 0x21:  # extension: label + sub-blocks
            pos += 1
            pos = skip_subblocks(pos)
            continue
        if b == 0x2C:  # image descriptor
            break
        raise ValueError(f"unexpected GIF block 0x{b:02x}")
    ix, iy, iw, ih, iflags = struct.unpack("<HHHHB", content[pos:pos + 9])
    pos += 9
    if iflags & 0x80:  # local color table wins
        n = 2 << (iflags & 7)
        palette = content[pos:pos + 3 * n]
        pos += 3 * n
    else:
        palette = gct
    if palette is None:
        raise ValueError("GIF image without a color table")
    interlaced = bool(iflags & 0x40)

    min_code = content[pos]
    pos += 1
    # reassemble the LZW stream from sub-blocks
    data = bytearray()
    while True:
        sz = content[pos]
        pos += 1
        if sz == 0:
            break
        data += content[pos:pos + sz]
        pos += sz

    clear = 1 << min_code
    end = clear + 1
    width = min_code + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev = None
    acc = 0
    nbits = 0
    bi = 0
    npix = iw * ih
    while len(out) < npix:
        while nbits < width:
            if bi >= len(data):
                raise ValueError("LZW stream truncated")
            acc |= data[bi] << nbits  # GIF packs LSB-first
            bi += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("invalid LZW code")
        out += entry
        prev = entry
        # decoder table growth bumps the code width at 2^width (cap 12)
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < npix:
        raise ValueError("GIF pixel data incomplete")

    idx = np.frombuffer(bytes(out[:npix]), np.uint8).reshape(ih, iw)
    if interlaced:
        deint = np.empty_like(idx)
        rows = (list(range(0, ih, 8)) + list(range(4, ih, 8))
                + list(range(2, ih, 4)) + list(range(1, ih, 2)))
        for src_row, dst_row in enumerate(rows):
            deint[dst_row] = idx[src_row]
        idx = deint
    pal = np.frombuffer(palette, np.uint8).reshape(-1, 3)
    frame = pal[np.minimum(idx, len(pal) - 1)]
    # place the (possibly smaller) frame on the logical screen
    if (iw, ih) != (sw, sh) or ix or iy:
        canvas = np.zeros((sh, sw, 3), np.uint8)
        canvas[iy:iy + ih, ix:ix + iw] = frame
        return canvas
    return frame.astype(np.uint8)


def _decode_gif_stdlib(content: bytes) -> dict:
    """REAL GIF decode — same sha + 16-bin ITU-R 601-2 luma histogram
    contract as the other image tiers."""
    import hashlib

    import numpy as np

    rgb = _gif_pixels(content)
    luma = (
        rgb[:, :, 0].astype("int64") * 299
        + rgb[:, :, 1].astype("int64") * 587
        + rgb[:, :, 2].astype("int64") * 114
    ) // 1000
    hist = np.bincount((luma >> 4).ravel(), minlength=16).astype(float)
    total = hist.sum() or 1.0
    digest = hashlib.sha256(content).digest()
    return {
        "sha": digest.hex()[:16],
        "features": [h / total for h in hist],
    }


def _decode_jpeg_stdlib(content: bytes) -> dict:
    """REAL baseline-JPEG decode — same sha + 16-bin ITU-R 601-2 luma
    histogram contract as the PNG/BMP/PIL tiers."""
    import hashlib

    rgb = _jpeg_pixels(content)
    luma = (
        rgb[:, :, 0].astype("int64") * 299
        + rgb[:, :, 1].astype("int64") * 587
        + rgb[:, :, 2].astype("int64") * 114
    ) // 1000
    import numpy as np

    hist = np.bincount((luma >> 4).ravel(), minlength=16).astype(float)
    total = hist.sum() or 1.0
    digest = hashlib.sha256(content).digest()
    return {
        "sha": digest.hex()[:16],
        "features": [h / total for h in hist],
    }


def _decode_image_stub(content: bytes) -> dict:
    """STUB fallback when no imaging library exists in the environment.

    Deterministic fake: derives pseudo-features from the byte content so
    the full pipeline (schema, batching, downstream ANN) is testable.
    """
    import hashlib

    if content is None:
        raise NotImplementedError("real image decode requires an image library")
    digest = hashlib.sha256(content).digest()
    features = [b / 255.0 for b in digest[:16]]
    return {"sha": digest.hex()[:16], "features": features}


def _decode_image_real(image_mod, content: bytes) -> dict:
    """Real decode path (used automatically when PIL is importable):
    sha identity + a 16-bin normalized grayscale histogram as the
    fixed-size feature vector — deterministic, library-only, and the
    same shape the stub emits so downstream ANN/dedup are unaffected."""
    import hashlib
    import io

    digest = hashlib.sha256(content).digest()
    img = image_mod.open(io.BytesIO(content)).convert("L")
    hist = img.histogram()  # 256 bins for mode L
    coarse = [sum(hist[i:i + 16]) for i in range(0, 256, 16)]
    total = float(sum(coarse)) or 1.0
    return {
        "sha": digest.hex()[:16],
        "features": [c / total for c in coarse],
    }


def _decode_png_stdlib(content: bytes) -> dict:
    """REAL PNG decode with only the stdlib — zlib inflate + full
    filter-type unfiltering (None/Sub/Up/Average/Paeth) for 8-bit
    grayscale/RGB/RGBA non-interlaced images — emitting the SAME
    16-bin luma histogram as the PIL path (ITU-R 601-2 integer luma,
    PIL's convert("L") formula), so features are backend-invariant.
    Raises ValueError on anything it can't decode (caller falls back).
    Correctness-first pure-Python rows; a cluster with PIL installed
    takes the C path automatically."""
    import hashlib

    width, height, bpp, rows = _png_pixels(content)
    hist = [0] * 16
    for line in rows:
        for i in range(0, width * bpp, bpp):
            if bpp == 1:
                luma = line[i]
            else:
                luma = (
                    line[i] * 299 + line[i + 1] * 587 + line[i + 2] * 114
                ) // 1000
            hist[luma >> 4] += 1
    total = float(sum(hist)) or 1.0
    digest = hashlib.sha256(content).digest()
    return {
        "sha": digest.hex()[:16],
        "features": [h / total for h in hist],
    }


def _png_pixels(content: bytes):
    """Parse a PNG to raw unfiltered pixel rows: (width, height, bpp,
    rows) with ``rows[y]`` a bytearray of ``width*bpp`` samples."""
    import struct
    import zlib

    if content[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a png")
    pos, width = 8, None
    idat = []
    while pos + 8 <= len(content):
        (ln,) = struct.unpack(">I", content[pos:pos + 4])
        ctype = content[pos + 4:pos + 8]
        data = content[pos + 8:pos + 8 + ln]
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if depth != 8 or interlace != 0 or color not in (0, 2, 6):
                raise ValueError("unsupported png variant")
            bpp = {0: 1, 2: 3, 6: 4}[color]
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + ln  # len + type + data + crc
    if width is None or not idat:
        raise ValueError("truncated png")
    raw = zlib.decompress(b"".join(idat))
    stride = width * bpp
    if len(raw) < height * (stride + 1):
        raise ValueError("short idat")
    prev = bytearray(stride)
    rows = []
    off = 0
    for _ in range(height):
        ftype = raw[off]
        line = bytearray(raw[off + 1:off + 1 + stride])
        off += 1 + stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c
                )
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad filter {ftype}")
        rows.append(line)
        prev = line
    return width, height, bpp, rows


def _encode_png_stdlib(width: int, height: int, bpp: int, rows) -> bytes:
    """Minimal PNG encoder (filter 0 everywhere, one zlib IDAT) — the
    inverse of ``_png_pixels`` for the stdlib resize tier."""
    import struct
    import zlib

    color = {1: 0, 3: 2, 4: 6}[bpp]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body)))

    raw = b"".join(b"\x00" + bytes(r) for r in rows)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR",
                struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _resize_png_stdlib(content: bytes, tw: int, th: int) -> bytes:
    """Nearest-neighbor PNG resize with only the stdlib: decode, sample
    source pixels on the target grid, re-encode.  Deterministic."""
    w, h, bpp, rows = _png_pixels(content)
    out_rows = []
    for y in range(th):
        sy = min(y * h // th, h - 1)
        src_row = rows[sy]
        line = bytearray(tw * bpp)
        for x in range(tw):
            sx = min(x * w // tw, w - 1)
            line[x * bpp:(x + 1) * bpp] = src_row[sx * bpp:(sx + 1) * bpp]
        out_rows.append(line)
    return _encode_png_stdlib(tw, th, bpp, out_rows)


def _resize_jpeg_to_png_stdlib(content: bytes, tw: int, th: int) -> bytes:
    """Nearest-neighbor resize of a baseline JPEG, re-encoded as PNG
    (lossless container — the stdlib tiers only encode PNG, and a second
    lossy generation would be a silent quality decision).  Deterministic.
    """
    rgb = _jpeg_pixels(content)  # (h, w, 3) uint8
    h, w = rgb.shape[:2]
    out_rows = []
    for y in range(th):
        sy = min(y * h // th, h - 1)
        line = bytearray(tw * 3)
        for x in range(tw):
            sx = min(x * w // tw, w - 1)
            line[x * 3:(x + 1) * 3] = bytes(rgb[sy, sx])
        out_rows.append(line)
    return _encode_png_stdlib(tw, th, 3, out_rows)


def extract_image_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary image content.

    ``mapInPandas`` so each Python invocation sees a whole Arrow batch;
    per-batch loop only touches the blob column.
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        image_mod = _imaging()

        def decode(c):
            if image_mod is not None and c is not None:
                try:
                    return _decode_image_real(image_mod, c)
                except Exception:
                    # undecodable blob (synthetic fixtures, corrupt file):
                    # fall through to the content-hash pseudo-features
                    pass
            if c is not None and c[:8] == b"\x89PNG\r\n\x1a\n":
                try:
                    # no PIL in this environment: PNGs still decode for
                    # real via the stdlib zlib tier (same luma histogram)
                    return _decode_png_stdlib(c)
                except Exception:
                    pass
            if c is not None and c[:2] == b"BM":
                try:
                    return _decode_bmp_stdlib(c)
                except Exception:
                    pass
            if c is not None and c[:2] == b"\xff\xd8":
                try:
                    # baseline + progressive JPEGs decode for real via
                    # the stdlib+numpy tier (12-bit/arith raise → stub)
                    return _decode_jpeg_stdlib(c)
                except Exception:
                    pass
            if c is not None and c[:4] == b"GIF8":
                try:
                    # GIF87a/89a first frame: stdlib LZW tier
                    return _decode_gif_stdlib(c)
                except Exception:
                    pass
            return _decode_image_stub(c)

        for pdf in batches:
            feats = [decode(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "sha": [f["sha"] for f in feats],
                    "features": [f["features"] for f in feats],
                }
            )

    return df.select("media_id", "content").mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("window_ms", T.LongType(), False),
        T.StructField("energy", T.FloatType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def plan_resize(df: DataFrame, max_dim: int = 256) -> DataFrame:
    """Resize planning — pure column math, no Python.

    Adds ``target_width``/``target_height``: the aspect-preserving fit of
    (width, height) into a ``max_dim`` box, never upscaling. Keeping the
    geometry JVM-side means the expensive Python stage below touches only
    rows that actually change size (``needs_resize``)."""
    w = F.coalesce(F.col("width"), F.lit(0))
    h = F.coalesce(F.col("height"), F.lit(0))
    scale = F.least(
        F.lit(float(max_dim)) / F.greatest(w, F.lit(1)),
        F.lit(float(max_dim)) / F.greatest(h, F.lit(1)),
        F.lit(1.0),
    )
    return (
        df.withColumn("target_width", F.greatest((w * scale).cast("int"), F.lit(1)))
        .withColumn("target_height", F.greatest((h * scale).cast("int"), F.lit(1)))
        .withColumn("needs_resize", scale < 1.0)
    )


def apply_resize(df_planned: DataFrame) -> DataFrame:
    """Arrow-batched resize executor — real PIL resize when the library
    is importable on the executor, deterministic sha-tagged stub bytes
    otherwise (and for undecodable blobs), so downstream dedup/tests can
    pin values in either environment. Rows with ``needs_resize = false``
    pass through untouched (and, because the filter is a plain Column,
    Catalyst prunes them from the Python stage entirely when the caller
    splits the union)."""

    def run(batches: Iterator) -> Iterator:
        import hashlib
        import io

        import pandas as pd

        image_mod = _imaging()

        def resize(c, tw, th):
            if image_mod is not None:
                try:
                    img = image_mod.open(io.BytesIO(c))
                    out = io.BytesIO()
                    img.resize((int(tw), int(th))).save(out, format="PNG")
                    return out.getvalue()
                except Exception:
                    pass  # undecodable → deterministic stub bytes
            if c[:8] == b"\x89PNG\r\n\x1a\n":
                try:
                    # no PIL: PNGs still resize for real (stdlib tier)
                    return _resize_png_stdlib(c, int(tw), int(th))
                except Exception:
                    pass
            if c[:2] == b"\xff\xd8":
                try:
                    # no PIL: baseline JPEGs decode via the stdlib tier,
                    # nearest-neighbor sample, re-encode as PNG (the
                    # stdlib tiers have an encoder only for PNG — the
                    # pixels are what downstream features consume)
                    return _resize_jpeg_to_png_stdlib(c, int(tw), int(th))
                except Exception:
                    pass
            tag = hashlib.sha256(c).digest()[:4]
            return bytes(tag) + b"%dx%d" % (tw, th)

        for pdf in batches:
            out_content = []
            for c, nr, tw, th in zip(pdf["content"], pdf["needs_resize"],
                                     pdf["target_width"], pdf["target_height"]):
                if not nr or c is None:
                    out_content.append(c)
                    continue
                out_content.append(resize(c, tw, th))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": out_content,
                    "width": pdf["target_width"],
                    "height": pdf["target_height"],
                }
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
        ]
    )
    return df_planned.select(
        "media_id", "content", "needs_resize", "target_width", "target_height"
    ).mapInPandas(run, schema=schema)


def _decode_wav_window(content: bytes, off_ms: int, window_ms: int):
    """REAL audio decode for RIFF/WAVE 16-bit PCM — stdlib ``wave`` +
    numpy, no external codec needed: RMS energy plus 8 rFFT band
    magnitudes for the [off, off+window) slice.  Returns None when the
    container/precision is unsupported (caller falls back to the stub;
    compressed formats still need a codec library this container lacks).
    """
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(content), "rb") as w:
        nch, sw = w.getnchannels(), w.getsampwidth()
        fr, nf = w.getframerate(), w.getnframes()
        if sw != 2 or nch < 1 or fr <= 0:
            return None
        start = min(int(off_ms * fr / 1000), nf)
        count = min(int(window_ms * fr / 1000), max(nf - start, 0))
        if count <= 0:
            return {"energy": 0.0, "features": [0.0] * 8}
        w.setpos(start)
        raw = w.readframes(count)
    x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    energy = float(np.sqrt(np.mean(x * x)))
    spec = np.abs(np.fft.rfft(x))
    bands = np.array_split(spec, 8)
    feats = [
        float(np.sqrt(np.mean(b * b))) if len(b) else 0.0 for b in bands
    ]
    return {"energy": energy, "features": feats}


def extract_audio_features(df: DataFrame, window_ms: int = 1000) -> DataFrame:
    """Windowed audio features: offsets JVM-side; WAV/PCM content is
    decoded FOR REAL (stdlib ``wave`` + numpy rFFT — no external codec),
    other containers fall back to the deterministic stub.

    Window offsets explode from native ``sequence`` column math (exactly
    like video frame sampling); only the per-window feature extraction
    runs in Python over Arrow batches.  The RIFF/WAVE probe runs per
    blob inside the UDF, mirroring the image path's import gate: real
    features when the bytes are decodable, sha pseudo-features (the
    engine-invariant identity) otherwise, same schema either way."""
    windows = df.withColumn(
        "window_ms",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(window_ms),
            )
        ),
    ).select("media_id", "window_ms", "content")

    def run(batches: Iterator) -> Iterator:
        import hashlib
        import wave

        import pandas as pd

        for pdf in batches:
            energies, feats = [], []
            for c, off in zip(pdf["content"], pdf["window_ms"]):
                if c is None:
                    energies.append(None)
                    feats.append(None)
                    continue
                decoded = None
                if c[:4] == b"RIFF" and c[8:12] == b"WAVE":
                    try:
                        decoded = _decode_wav_window(c, off, window_ms)
                    except (wave.Error, EOFError, ValueError):
                        decoded = None
                if decoded is not None:
                    energies.append(decoded["energy"])
                    feats.append(decoded["features"])
                    continue
                # STUB fallback: non-WAV containers need a codec library
                # this environment lacks; deterministic pseudo-features
                # keep the full shape testable end-to-end.
                digest = hashlib.sha256(c + b"%d" % off).digest()
                energies.append(digest[0] / 255.0)
                feats.append([b / 255.0 for b in digest[:8]])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "window_ms": pdf["window_ms"],
                    "energy": energies,
                    "features": feats,
                }
            )

    return windows.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


def sample_video_frames(
    df: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame offset.

    The offsets come from native column math (sequence over duration);
    only the (stubbed) frame decode would run in Python.
    """
    frames = df.withColumn(
        "frame_ms",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ),
    )
    return frames.select("media_id", "frame_ms", "content")


VIDEO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ms", T.DoubleType(), True),
        T.StructField("frame_bytes", T.BinaryType(), True),
    ]
)


def _parse_avi(content: bytes):
    """REAL RIFF/AVI container demux — stdlib ``struct`` only: walk the
    chunk tree, read ``avih``'s microseconds-per-frame, and collect the
    byte ranges of every video frame chunk (``##dc`` compressed /
    ``##db`` uncompressed).  This is container-level parsing, not codec
    work: the FRAME BYTES come out for real; decoding them to pixels
    still needs a codec (MJPEG frames feed straight into the PIL-gated
    image path when present).  Returns None for non-AVI bytes."""
    import struct

    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        return None
    state = {"uspf": 0, "frames": []}

    def walk(start: int, end: int) -> None:
        pos = start
        while pos + 8 <= end:
            fourcc = content[pos:pos + 4]
            (size,) = struct.unpack("<I", content[pos + 4:pos + 8])
            data_start = pos + 8
            data_end = min(data_start + size, end)
            if fourcc == b"LIST":
                walk(data_start + 4, data_end)
            elif fourcc == b"avih" and size >= 4:
                (state["uspf"],) = struct.unpack(
                    "<I", content[data_start:data_start + 4]
                )
            elif fourcc[2:4] in (b"dc", b"db"):
                state["frames"].append((data_start, data_end - data_start))
            pos = data_end + (size & 1)  # chunks are word-aligned

    walk(12, len(content))
    return state


def demux_avi_frames(df: DataFrame) -> DataFrame:
    """One row per REAL video frame extracted from AVI binary content
    (media_id, frame_idx, frame_ms, frame_bytes) — Arrow-batched
    container demux with no codec dependency; non-AVI blobs contribute
    no rows (use ``sample_video_frames`` for the metadata time-grid
    path).  Composes with ``extract_image_features``: MJPEG frame bytes
    are JPEG images, so the PIL-gated decode applies downstream."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_ms": [],
                   "frame_bytes": []}
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                if c is None:
                    continue
                parsed = _parse_avi(bytes(c))
                if parsed is None:
                    continue
                for i, (off, size) in enumerate(parsed["frames"]):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_ms"].append(i * parsed["uspf"] / 1000.0)
                    out["frame_bytes"].append(bytes(c[off:off + size]))
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(
        run, schema=VIDEO_FRAMES_SCHEMA
    )
