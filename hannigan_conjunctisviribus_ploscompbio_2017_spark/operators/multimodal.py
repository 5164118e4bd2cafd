"""Multimodal (image/audio/video) column operators.

Treats media as opaque `binary` columns + typed metadata, the standard
lakehouse layout for multimodal training data.  The Spark-side plumbing —
schemas, batch iteration, partition sizing — is real and tested, and so
is decode across all three modalities:

- images: PPM (P6) / PGM (P5), 24-bit uncompressed BMP, PNG (stdlib
  zlib inflate + all five filter types), and baseline JPEG (pure-python
  Huffman + IDCT) — no Pillow needed;
- audio: RIFF/WAVE PCM 8/16-bit, parsed with struct+numpy (no ffmpeg);
- video: YUV4MPEG2 (.y4m, the standard uncompressed interchange
  container) — header parse, C420/C422/C444/mono planes, BT.601
  limited-range conversion, real per-frame extraction
  (extract_video_frames); MP4 gets ISO-BMFF box-walk METADATA
  (mp4_metadata) without frame decode.

The remaining compressed codecs (H.264/MP3...) genuinely need external
codec libraries that are not in this container: those raise
NotImplementedError unless `fake=True`, in which case a deterministic
stand-in decoder (seeded from the content hash) keeps the pipeline shape
exercised end to end.

Scale notes: media rows are huge → keep `spark.sql.files.maxPartitionBytes`
small enough that a partition of blobs fits in executor memory, and
ALWAYS select metadata columns without the blob when the blob isn't
needed (column pruning keeps the parquet reader from materializing it).
mapInPandas streams Arrow record batches, so peak memory is one batch of
blobs, not one partition.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, codec string, n_bytes long, "
    "content_sha256 string, feature array<float>"
)


# --------------------------------------------------------------------------
# pure-python decoders (uncompressed formats only — no codec libraries)
# --------------------------------------------------------------------------


def sniff_codec(content: bytes) -> str:
    """Classify a blob by magic bytes:
    ppm|pgm|bmp|wav|png|jpeg|y4m|mp4|unknown."""
    if content[:9] == b"YUV4MPEG2":
        return "y4m"
    if content[:2] == b"P6":
        return "ppm"
    if content[:2] == b"P5":
        return "pgm"
    if content[:2] == b"BM":
        return "bmp"
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return "wav"
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if content[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if content[4:8] == b"ftyp":
        return "mp4"
    return "unknown"


def decode_ppm(content: bytes) -> np.ndarray:
    """PPM P6 (binary RGB) / PGM P5 (binary gray) → uint8 HxWxC array.

    Netpbm header: magic, whitespace/comment-separated width height
    maxval, single whitespace byte, then raw samples."""
    magic = content[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary netpbm file: {magic!r}")
    # tokenize header: fields separated by whitespace, '#' comments to EOL
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":
            while pos < len(content) and content[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(content[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    ch = 3 if magic == b"P6" else 1
    arr = np.frombuffer(content, dtype=np.uint8, count=w * h * ch, offset=pos)
    return arr.reshape(h, w, ch)


def decode_bmp(content: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP → uint8 HxWx3 array (RGB order,
    top row first; BMP stores BGR bottom-up with 4-byte row padding)."""
    if content[:2] != b"BM":
        raise ValueError("not a BMP file")
    data_offset = struct.unpack_from("<I", content, 10)[0]
    header_size = struct.unpack_from("<I", content, 14)[0]
    if header_size < 40:
        raise ValueError("BMP core headers not supported")
    w, h = struct.unpack_from("<ii", content, 18)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    compression = struct.unpack_from("<I", content, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={compression})")
    flip = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        content, dtype=np.uint8, count=row_bytes * h, offset=data_offset
    ).reshape(h, row_bytes)
    img = rows[:, : w * 3].reshape(h, w, 3)[..., ::-1]  # BGR → RGB
    return img[::-1] if flip else img


def decode_wav(content: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM → (sample_rate, float32 samples in [-1, 1], channels
    averaged to mono). Walks RIFF chunks; supports 8-bit unsigned and
    16-bit signed PCM (format tag 1)."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid, size = content[pos : pos + 4], struct.unpack_from("<I", content, pos + 4)[0]
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, sample_rate, _, _, bits = fmt
    if audio_fmt != 1:
        raise ValueError(f"only PCM supported (format tag {audio_fmt})")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"{bits}-bit PCM not supported")
    if channels > 1:
        x = x[: len(x) // channels * channels].reshape(-1, channels).mean(axis=1)
    return sample_rate, x


def _y4m_header(content: bytes) -> tuple:
    """Parse the YUV4MPEG2 stream header → (w, h, fps, ysz, csz, cw,
    ch, data_start). Raises ValueError on any malformed header field
    (the quarantine contract for corrupt blobs)."""
    nl = content.find(b"\n")
    if not content.startswith(b"YUV4MPEG2") or nl < 0:
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    fps = 0.0
    cfmt = "420jpeg"  # spec default when C is absent
    try:
        for tok in content[9:nl].split():
            t, v = chr(tok[0]), tok[1:].decode("ascii", "replace")
            if t == "W":
                w = int(v)
            elif t == "H":
                h = int(v)
            elif t == "F":
                num, den = v.split(":")
                if int(den) == 0:
                    raise ValueError("y4m frame rate has zero denominator")
                fps = int(num) / int(den)
            elif t == "C":
                cfmt = v
    except ValueError:
        raise
    except Exception as e:  # malformed int/split — still a corrupt blob
        raise ValueError(f"malformed y4m header: {e}") from e
    if not w or not h:
        raise ValueError("y4m header missing W/H")
    if cfmt.startswith("420"):
        cw, ch_ = (w + 1) // 2, (h + 1) // 2
    elif cfmt.startswith("422"):
        cw, ch_ = (w + 1) // 2, h
    elif cfmt.startswith("444"):
        cw, ch_ = w, h
    elif cfmt.startswith("mono"):
        cw = ch_ = 0
    else:
        raise ValueError(f"unsupported y4m chroma format C{cfmt}")
    return w, h, fps, w * h, cw * ch_, cw, ch_, nl + 1


def _y4m_frame_offsets(
    content: bytes, hdr: tuple, max_frames: int | None = None
) -> list[int]:
    """Byte offsets of each frame's PAYLOAD — a marker/length scan only,
    no pixel conversion, so indexing a long clip is O(n_frames) pointer
    arithmetic. Raises ValueError on a bad marker or truncated payload."""
    _, _, _, ysz, csz, _, _, pos = hdr
    offsets: list[int] = []
    while pos < len(content):
        if content[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {pos}")
        fnl = content.find(b"\n", pos)
        if fnl < 0:
            raise ValueError("truncated FRAME header")
        pos = fnl + 1
        if pos + ysz + 2 * csz > len(content):
            raise ValueError("truncated frame payload")
        offsets.append(pos)
        pos += ysz + 2 * csz
        if max_frames is not None and len(offsets) >= max_frames:
            break
    if not offsets:
        raise ValueError("y4m stream has no frames")
    return offsets


def _y4m_frame(content: bytes, hdr: tuple, pos: int) -> np.ndarray:
    """Convert ONE frame payload → h x w x 3 RGB uint8 (BT.601 limited
    range, nearest-neighbor chroma upsample)."""
    w, h, _, ysz, csz, cw, ch_, _ = hdr
    y = np.frombuffer(content, np.uint8, ysz, pos).reshape(h, w).astype(np.float32)
    if csz:
        cb = np.frombuffer(content, np.uint8, csz, pos + ysz).reshape(ch_, cw)
        cr = np.frombuffer(content, np.uint8, csz, pos + ysz + csz).reshape(ch_, cw)
        cb = np.repeat(np.repeat(cb, -(-h // ch_), 0), -(-w // cw), 1)[:h, :w]
        cr = np.repeat(np.repeat(cr, -(-h // ch_), 0), -(-w // cw), 1)[:h, :w]
        yl = 1.164383 * (y - 16.0)
        r = yl + 1.596027 * (cr.astype(np.float32) - 128.0)
        g = (
            yl
            - 0.391762 * (cb.astype(np.float32) - 128.0)
            - 0.812968 * (cr.astype(np.float32) - 128.0)
        )
        b = yl + 2.017232 * (cb.astype(np.float32) - 128.0)
        img = np.stack([r, g, b], axis=-1)
    else:
        img = np.repeat((1.164383 * (y - 16.0))[..., None], 3, axis=2)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def decode_y4m(content: bytes, max_frames: int | None = None) -> tuple[float, np.ndarray]:
    """YUV4MPEG2 (.y4m) uncompressed video → (fps, frames[n, h, w, 3]
    RGB uint8). Real video decode without codec libraries: y4m is the
    standard uncompressed interchange container (what
    `ffmpeg -f yuv4mpegpipe` emits).

    Stream header `YUV4MPEG2 W<w> H<h> F<num>:<den> ... [C<fmt>]\\n`,
    then per frame `FRAME[params]\\n` + planar YUV bytes. Chroma formats:
    any C420 variant (jpeg/mpeg2/paldv share the sampling grid at this
    fidelity), C422, C444, and Cmono. Colorimetry is the y4m convention —
    BT.601 limited range (Y 16-235, C 16-240) — NOT the full-range
    matrix the JPEG path uses; both are exact per their format's spec.
    `max_frames` stops parsing early (frame sampling reads a bounded
    prefix of a long video blob). To sample sparsely WITHOUT converting
    every frame, use _y4m_frame_offsets + _y4m_frame (the
    decode_feature path does)."""
    hdr = _y4m_header(content)
    offsets = _y4m_frame_offsets(content, hdr, max_frames)
    return hdr[2], np.stack([_y4m_frame(content, hdr, p) for p in offsets])


def decode_png(content: bytes) -> np.ndarray:
    """PNG → uint8 HxWxC array, pure Python + stdlib zlib (no PIL).

    Supports the dominant real-world profile: 8-bit depth, color types
    0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA),
    non-interlaced, with all five scanline filters (None/Sub/Up/
    Average/Paeth) per the PNG spec §9. Interlaced (Adam7) and 1/2/4/
    16-bit images raise ValueError — they are rare in training corpora
    and the caller quarantines the row.

    Unfiltering is row-sequential by spec (each row depends on the
    previous reconstructed row); Sub/Average/Paeth additionally scan
    left-to-right within the row. Rows use vectorized numpy where the
    filter allows (None/Up fully, Average/Sub/Paeth per-pixel-column
    against the already-reconstructed prior bytes)."""
    if content[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG file")
    pos, idat, plte = 8, [], None
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(content):
        size = struct.unpack_from(">I", content, pos)[0]
        cid = content[pos + 4 : pos + 8]
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif cid == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif cid == b"IDAT":
            idat.append(body)
        elif cid == b"IEND":
            break
        pos += 12 + size  # len + type + body + crc
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    if depth != 8:
        raise ValueError(f"only 8-bit PNG supported (depth={depth})")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG not supported")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unknown PNG color type {ctype}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    rows = np.frombuffer(raw, dtype=np.uint8, count=h * (stride + 1)).reshape(
        h, stride + 1
    )
    filters, data = rows[:, 0], rows[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at 8-bit depth
    for y in range(h):
        f, cur = int(filters[y]), data[y].astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:  # None
            rec = cur
        elif f == 2:  # Up
            rec = (cur + prior) & 0xFF
        elif f == 1:  # Sub — sequential in x, vectorize across channels
            rec = cur.copy()
            for x in range(bpp, stride):
                rec[x] = (rec[x] + rec[x - bpp]) & 0xFF
        elif f == 3:  # Average
            rec = cur.copy()
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((left + prior[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = cur.copy()
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prior[x]
                c = prior[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = rec.astype(np.uint8)
    img = out.reshape(h, w, channels)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        img = plte[img[:, :, 0]]
    return img


# --- baseline JPEG (ITU-T T.81) decode: pure Python + numpy ------------
# Zigzag order for an 8x8 block (spec Figure 5).
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
# orthonormal 8-point DCT-II basis: IDCT is C.T @ X @ C
_DCT_C = np.array(
    [
        [
            (np.sqrt(1.0 / 8.0) if k == 0 else np.sqrt(2.0 / 8.0))
            * np.cos((2 * n + 1) * k * np.pi / 16.0)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


class _BitReader:
    """MSB-first bit reader over JPEG entropy-coded data with 0xFF00
    byte-unstuffing; restart markers are handled by the caller (the
    scan splits on them before reading)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            return 0  # spec: pad with 1s/0s at end of scan; 0 is safe here
        byte = self.data[self.pos]
        b = (byte >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _build_huffman(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman table: {(code_length, code): symbol}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    for _ in range(16):
        code = (code << 1) | br.read_bit()
        length += 1
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid JPEG huffman code")


def _extend(v: int, t: int) -> int:
    """DC/AC magnitude extension (spec F.2.2.1): t-bit value → signed."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(content: bytes) -> np.ndarray:
    """Baseline sequential JPEG (SOF0, 8-bit, Huffman) → uint8 HxWxC —
    pure Python + numpy, no codec libraries. Supports grayscale and
    YCbCr with any 1/2× sampling factors (4:4:4, 4:2:0, 4:2:2), DRI
    restart intervals, and multi-table DQT/DHT. Progressive (SOF2),
    arithmetic coding, and 12-bit precision raise ValueError.

    Decode is entropy-sequential by construction (Huffman + DC
    prediction are stateful across blocks); the IDCT is vectorized
    (orthonormal basis matrix product per block). This is correctness
    plumbing for corpus feature extraction, not a throughput path —
    swap in a native decoder where available."""
    if content[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG file")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (h, w, [(cid, hs, vs, tq)])
    restart_interval = 0
    scan = None
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = content[pos + 1]
        if marker == 0xD9:  # EOI
            break
        size = struct.unpack_from(">H", content, pos + 2)[0]
        body = content[pos + 4 : pos + 2 + size]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(body, np.uint8, 64, i).astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(body, ">u2", 64, i).astype(np.int32)
                    i += 128
                qt[tq] = tbl
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline(+extended seq)
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG (SOF0/1) supported")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                counts = list(body[i + 1 : i + 17])
                n = sum(counts)
                symbols = bytes(body[i + 17 : i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(counts, symbols)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            if scan is not None:
                # T.81 allows multiple scans (non-interleaved baseline);
                # silently overwriting the first would desync Huffman
                # state and emit garbage — refuse instead
                raise ValueError("multi-scan baseline JPEG not supported")
            ns = body[0]
            sel = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                sel.append((cs, tt >> 4, tt & 0x0F))
            scan_start = pos + 2 + size
            # entropy data runs to the next non-RST marker
            end = scan_start
            while end + 1 < len(content):
                if content[end] == 0xFF and content[end + 1] not in (0x00,) and not (
                    0xD0 <= content[end + 1] <= 0xD7
                ):
                    break
                end += 1
            scan = (sel, content[scan_start:end])
            pos = end
            continue
        pos += 2 + size
    if frame is None or scan is None:
        raise ValueError("missing SOF/SOS")
    h, w, comps = frame
    sel, data = scan
    if len(sel) < len(comps):
        raise ValueError("non-interleaved multi-component JPEG not supported")
    if len(comps) == 1:
        # a single-component scan is ALWAYS non-interleaved (T.81
        # A.2.2): MCU = one block, SOF sampling factors do not apply
        # (a 2x2-listed extracted-Y plane would otherwise desync)
        cid0, _, _, tq0 = comps[0]
        comps = [(cid0, 1, 1, tq0)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    # split on restart markers; each segment resets DC predictors
    segments = []
    if restart_interval:
        seg, i = bytearray(), 0
        while i < len(data):
            if data[i] == 0xFF and i + 1 < len(data):
                nxt = data[i + 1]
                if nxt == 0x00:
                    seg.append(0xFF)
                    i += 2
                    continue
                if 0xD0 <= nxt <= 0xD7:
                    segments.append(bytes(seg))
                    seg = bytearray()
                    i += 2
                    continue
            seg.append(data[i])
            i += 1
        segments.append(bytes(seg))
    else:
        segments = [data.replace(b"\xff\x00", b"\xff")]
    sel_by_cid = {s[0]: s for s in sel}
    planes = {
        cid: np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), dtype=np.float64)
        for cid, hs, vs, _ in comps
    }
    pred = {cid: 0 for cid, *_ in comps}
    seg_idx, br = 0, _BitReader(segments[0])
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                seg_idx += 1
                br = _BitReader(segments[seg_idx])
                pred = {cid: 0 for cid, *_ in comps}
            for cid, hs, vs, tq in comps:
                _, td, ta = sel_by_cid[cid]
                q = qt[tq]
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, dtype=np.int32)
                        t = _huff_decode(br, huff_dc[td])
                        diff = _extend(br.read_bits(t), t)
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, huff_ac[ta])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = zz * q
                        px = _DCT_C.T @ block.reshape(8, 8) @ _DCT_C
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = px + 128.0
            mcu_count += 1
    # upsample each component to full MCU-grid resolution, then crop
    out_planes = []
    for cid, hs, vs, _ in comps:
        p = planes[cid]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        img = out_planes[0][..., None]
    elif len(out_planes) == 3:
        y, cb, cr = out_planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        img = np.stack([r, g, b], axis=-1)
    else:
        raise ValueError(f"unsupported component count {len(out_planes)}")
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def _image_feature(img: np.ndarray, dim: int) -> np.ndarray:
    """Fixed-dim image descriptor: [w, h, channels, mean/255, std/255]
    + (dim-5)-bin luminance histogram (density). Alpha channels (RGBA,
    gray+alpha) are excluded from the luminance statistics — the same
    pixels must descriptor-match whether or not the encoding carries
    alpha."""
    h, w, ch = img.shape
    color = img[..., :3] if ch == 4 else (img[..., :1] if ch == 2 else img)
    lum = color.mean(axis=2).ravel() / 255.0
    head = [float(w), float(h), float(ch), float(lum.mean()), float(lum.std())]
    bins = max(dim - len(head), 1)
    hist, _ = np.histogram(lum, bins=bins, range=(0.0, 1.0))
    vec = head + (hist / max(lum.size, 1)).tolist()
    return np.asarray(vec[:dim], dtype=np.float32)


def _audio_feature(sr: int, x: np.ndarray, dim: int) -> np.ndarray:
    """Fixed-dim audio descriptor: [sr, n_samples, rms, zero-cross rate,
    peak] + (dim-5)-bin |amplitude| histogram (density)."""
    n = x.size
    rms = float(np.sqrt(np.mean(x**2))) if n else 0.0
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0
    peak = float(np.abs(x).max()) if n else 0.0
    head = [float(sr), float(n), rms, zcr, peak]
    bins = max(dim - len(head), 1)
    hist, _ = np.histogram(np.abs(x), bins=bins, range=(0.0, 1.0))
    vec = head + (hist / max(n, 1)).tolist()
    return np.asarray(vec[:dim], dtype=np.float32)


def _video_feature(
    fps: float, frames: np.ndarray, dim: int, n_total: int | None = None
) -> np.ndarray:
    """Fixed-dim video descriptor: [fps, n_frames, h, w, mean luminance
    over sampled frames] + (dim-5)-bin luminance histogram (density).
    At most 8 frames, sampled evenly across `frames`, contribute; pass
    `n_total` when `frames` is already the evenly-sampled subset of a
    longer clip (decode_feature's offset-sampled path) so the n_frames
    slot still reports the CLIP length."""
    n, h, w, _ = frames.shape
    idx = np.unique(np.linspace(0, n - 1, num=min(n, 8)).astype(np.int64))
    lum = frames[idx, :, :, :3].mean(axis=3).ravel() / 255.0
    head = [
        float(fps),
        float(n_total if n_total is not None else n),
        float(h),
        float(w),
        float(lum.mean()),
    ]
    bins = max(dim - len(head), 1)
    hist, _ = np.histogram(lum, bins=bins, range=(0.0, 1.0))
    vec = head + (hist / max(lum.size, 1)).tolist()
    return np.asarray(vec[:dim], dtype=np.float32)


def _fake_decode(content: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for compressed codecs: feature vector
    seeded from the content hash. Replace with PIL/torchvision/ffmpeg in
    a container that has them."""
    h = hashlib.sha256(content).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    return rng.random(dim, dtype=np.float32)


def decode_feature(content: bytes, dim: int, fake: bool) -> tuple[str, np.ndarray]:
    """(codec, feature) for one blob: real decode for
    ppm/pgm/bmp/png/jpeg/wav/y4m, fake or NotImplementedError for the
    remaining compressed codecs (mp4/h264, mp3)."""
    codec = sniff_codec(content)
    if codec in ("ppm", "pgm"):
        return codec, _image_feature(decode_ppm(content), dim)
    if codec == "bmp":
        return codec, _image_feature(decode_bmp(content), dim)
    if codec == "png":
        return codec, _image_feature(decode_png(content), dim)
    if codec == "jpeg":
        return codec, _image_feature(decode_jpeg(content), dim)
    if codec == "wav":
        return codec, _audio_feature(*decode_wav(content), dim)
    if codec == "y4m":
        # offset-index the clip and convert ONLY the ≤8 sampled frames:
        # bounded work and memory per blob regardless of clip length
        # (the same idx formula _video_feature uses, so values match a
        # full decode exactly)
        hdr = _y4m_header(content)
        offs = _y4m_frame_offsets(content, hdr)
        idx = np.unique(
            np.linspace(0, len(offs) - 1, num=min(len(offs), 8)).astype(np.int64)
        )
        frames = np.stack([_y4m_frame(content, hdr, offs[i]) for i in idx])
        return codec, _video_feature(hdr[2], frames, dim, n_total=len(offs))
    if fake:
        return codec, _fake_decode(content, dim)
    raise NotImplementedError(
        f"codec {codec!r} requires libraries (ffmpeg) not present in this "
        "container; supported real decodes: ppm/pgm/bmp/png/jpeg/wav/y4m. "
        "Pass fake=True for the deterministic stand-in decoder"
    )


def extract_features(df: DataFrame, dim: int = 16, fake: bool = False) -> DataFrame:
    """Decode + feature-extract each media blob via mapInPandas (Arrow
    batch streaming — one batch of blobs in memory at a time).

    PPM/PGM/BMP images and PCM WAV audio decode for real (pure numpy, no
    codec libraries); compressed formats raise NotImplementedError unless
    fake=True substitutes the deterministic stand-in.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            codecs, feats, lens, digests = [], [], [], []
            # one pass per blob: decode + length + digest together (the
            # blob is bytes()-materialized once, hashed once)
            for c in pdf["content"]:
                raw = bytes(c) if c is not None else b""
                lens.append(len(raw))
                digests.append(hashlib.sha256(raw).hexdigest())
                try:
                    codec, vec = decode_feature(raw, dim, fake)
                    feats.append(vec.tolist())
                except NotImplementedError:
                    raise  # contract: compressed codec without fake=True
                except Exception:
                    # corrupt-but-sniffable blob (truncated WAV/PPM/BMP):
                    # quarantine the ROW (codec tagged, feature NULL)
                    # instead of failing the corpus-wide job on one blob
                    codec = "corrupt:" + sniff_codec(raw)
                    feats.append(None)
                codecs.append(codec)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "codec": codecs,
                    "n_bytes": lens,
                    "content_sha256": digests,
                    "feature": feats,
                }
            )

    return df.mapInPandas(_batches, schema=FEATURE_SCHEMA)


def blob_stats(df: DataFrame, id_col: str = "media_id", content_col: str = "content") -> DataFrame:
    """Per-blob byte stats, fully JVM-side (no decode): (id, n_bytes,
    content_sha256, codec). Codec detection is the same magic-byte rules
    as sniff_codec, expressed in Catalyst so a 100 TB metadata sweep
    never leaves whole-stage codegen — and so DuckDB can replay it."""
    c = F.col(content_col)
    # magic detection over hex() of the FIRST 12 bytes only: position-
    # exact for arbitrary bytes (casting binary→string collapses
    # multi-byte UTF-8 sequences and would shift offsets), and the slice
    # keeps the hex string O(1) instead of 2x the blob
    hx = F.hex(F.substring(c, 1, 12))

    def _hex_at(pos_chars: int, ascii_magic: bytes):
        return F.substring(hx, pos_chars, 2 * len(ascii_magic)) == ascii_magic.hex().upper()

    codec = (
        F.when(_hex_at(1, b"YUV4MPEG2"), "y4m")
        .when(_hex_at(1, b"P6"), "ppm")
        .when(_hex_at(1, b"P5"), "pgm")
        .when(_hex_at(1, b"BM"), "bmp")
        .when(_hex_at(1, b"RIFF") & _hex_at(17, b"WAVE"), "wav")
        # full sniff_codec parity — compressed formats classify too
        .when(F.substring(hx, 1, 16) == b"\x89PNG\r\n\x1a\n".hex().upper(), "png")
        .when(F.substring(hx, 1, 6) == b"\xff\xd8\xff".hex().upper(), "jpeg")
        .when(_hex_at(9, b"ftyp"), "mp4")
        .otherwise("unknown")
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.octet_length(c).alias("n_bytes"),
        F.sha2(c, 256).alias("content_sha256"),
        codec.alias("codec"),
    )


def media_metadata_stats(df: DataFrame) -> DataFrame:
    """Metadata-only rollup — note: does NOT touch `content`, so the
    parquet scan prunes the blob column entirely (verify via
    .explain ReadSchema)."""
    return df.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("width").alias("avg_width"),
        F.avg("height").alias("avg_height"),
        F.sum("duration_ms").alias("total_duration_ms"),
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: explode each video row into (media_id,
    frame_ts_ms) rows — the shuffle-free fan-out that a real frame
    extractor (mapInPandas over content) would consume."""
    n_frames = (F.col("duration_ms") / every_ms).cast("int")
    return (
        # NULL/zero durations contribute ZERO frames: greatest() skips
        # nulls, so an unfiltered NULL duration would emit a phantom
        # frame at ts=0 for a video of unknown length
        df.filter((F.col("kind") == "video") & (F.col("duration_ms") > 0))
        .select(
            "media_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
                    lambda i: i * every_ms,
                )
            ).alias("frame_ts_ms"),
        )
    )


FRAME_SCHEMA = (
    "media_id long, frame_idx int, ts_ms long, height int, width int, "
    "feature array<float>"
)


def extract_video_frames(
    df: DataFrame,
    every_n: int = 1,
    max_frames: int | None = 32,
    dim: int = 16,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """REAL frame extraction: decode each y4m video blob and emit one row
    per sampled frame — (media_id, frame_idx, ts_ms, height, width,
    per-frame image feature). The decode-backed realization of
    frame_sample_plan's metadata fan-out: same shape, but the rows come
    from actual pixel data.

    `every_n` keeps every n-th frame; `max_frames` bounds decode work
    per blob (the parser stops reading the byte stream after
    every_n*max_frames frames, so a long clip costs its sampled prefix,
    not its length). ts_ms derives from the stream's own F rate.
    Compressed containers (mp4/h264) still raise NotImplementedError —
    filter on blob_stats codec first in mixed corpora; corrupt y4m blobs
    quarantine as a single (frame_idx=-1, NULL feature) row rather than
    failing the job. Arrow-batched mapInPandas: peak memory is one batch
    of decoded clips, and media partitions must already be sized for
    blob columns (module scale notes)."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("media_id", "frame_idx", "ts_ms", "height", "width", "feature")}
            for mid, c in zip(pdf[id_col], pdf[content_col]):
                raw = bytes(c) if c is not None else b""
                codec = sniff_codec(raw)
                if codec == "mp4":
                    raise NotImplementedError(
                        "mp4/h264 frame decode requires ffmpeg (absent in "
                        "this container); extract_video_frames decodes y4m"
                    )
                try:
                    # offset scan first, convert only the kept frames:
                    # skipped frames cost pointer arithmetic, not a
                    # YUV->RGB float pass
                    hdr = _y4m_header(raw)
                    limit = None if max_frames is None else every_n * max_frames
                    offs = _y4m_frame_offsets(raw, hdr, max_frames=limit)
                    sel = offs[::every_n]
                    if max_frames is not None:
                        sel = sel[:max_frames]
                    fps = hdr[2]
                    step_ms = 0.0 if fps <= 0 else 1000.0 / fps
                    for j, p in enumerate(sel):
                        frame = _y4m_frame(raw, hdr, p)
                        out["media_id"].append(mid)
                        out["frame_idx"].append(j * every_n)
                        out["ts_ms"].append(int(j * every_n * step_ms))
                        out["height"].append(frame.shape[0])
                        out["width"].append(frame.shape[1])
                        out["feature"].append(_image_feature(frame, dim).tolist())
                except ValueError:
                    # corrupt/non-y4m blob: quarantine the ROW, keep the job
                    out["media_id"].append(mid)
                    out["frame_idx"].append(-1)
                    out["ts_ms"].append(-1)
                    out["height"].append(0)
                    out["width"].append(0)
                    out["feature"].append(None)
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=FRAME_SCHEMA)


# --------------------------------------------------------------------------
# fixture encoders (tests synthesize real media bytes with these)
# --------------------------------------------------------------------------


def encode_y4m(frames: np.ndarray, fps: int = 25, cfmt: str = "444") -> bytes:
    """uint8 [n, h, w, 3] RGB → YUV4MPEG2 bytes (C444 or C420jpeg via
    2x2 mean subsampling). Exact inverse colorimetry of decode_y4m
    (BT.601 limited range), so encode→decode round-trips within
    rounding."""
    n, h, w, _ = frames.shape
    head = f"YUV4MPEG2 W{w} H{h} F{int(fps)}:1 Ip A1:1 C{cfmt}\n".encode()
    parts = [head]
    for f in frames:
        r, g, b = (f[..., i].astype(np.float64) for i in range(3))
        y = 16.0 + (0.299 * r + 0.587 * g + 0.114 * b) * 219.0 / 255.0
        cb = 128.0 + (b - (0.299 * r + 0.587 * g + 0.114 * b)) * 0.564 * 224.0 / 255.0
        cr = 128.0 + (r - (0.299 * r + 0.587 * g + 0.114 * b)) * 0.713 * 224.0 / 255.0
        if cfmt.startswith("420"):
            if h % 2 or w % 2:
                raise ValueError("C420 needs even dimensions")
            cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        elif not cfmt.startswith("444"):
            raise ValueError(f"encoder supports C444/C420*, not C{cfmt}")
        parts.append(b"FRAME\n")
        for plane in (y, cb, cr):
            parts.append(np.clip(np.round(plane), 0, 255).astype(np.uint8).tobytes())
    return b"".join(parts)


def encode_ppm(img: np.ndarray) -> bytes:
    """uint8 HxWx3 → binary PPM (P6)."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def encode_wav(x: np.ndarray, sample_rate: int = 8000) -> bytes:
    """float32 mono [-1, 1] → 16-bit PCM RIFF/WAVE."""
    pcm = (np.clip(x, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def make_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fixture generator: REAL PPM images and PCM WAVs for
    the decodable kinds, opaque mp4-magic bytes for video (the honest
    stub case)."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w, h = rng.randint(4, 12), rng.randint(4, 12)
            img = np.array(
                [rng.randrange(256) for _ in range(w * h * 3)], dtype=np.uint8
            ).reshape(h, w, 3)
            content, mime = encode_ppm(img), "image/x-portable-pixmap"
            width, height, dur = w, h, None
        elif kind == "audio":
            n_samp = rng.randint(200, 1000)
            x = np.array([rng.uniform(-0.8, 0.8) for _ in range(n_samp)], dtype=np.float32)
            content, mime = encode_wav(x, 8000), "audio/wav"
            width = height = None
            dur = int(n_samp / 8000 * 1000)
        else:
            blob = bytes(rng.getrandbits(8) for _ in range(rng.randint(64, 256)))
            content, mime = blob[:4] + b"ftyp" + blob[4:], "video/mp4"
            width = height = None
            dur = rng.randint(1000, 60000)
        rows.append((i, kind, content, mime, width, height, dur))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def resize_image(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbor resize of an (H, W, C) uint8 array — pure numpy
    index mapping, no interpolation libraries. Deterministic: pixel
    (i, j) samples source (floor(i·H/h), floor(j·W/w))."""
    sh, sw = img.shape[0], img.shape[1]
    rows = (np.arange(h) * sh // h).astype(np.int64)
    cols = (np.arange(w) * sw // w).astype(np.int64)
    return img[rows][:, cols]


def resize_images(
    df: DataFrame,
    h: int,
    w: int,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Resize every decodable image blob to (h, w) and re-encode as PPM
    — the standard pre-training normalization step, via mapInPandas so
    one Arrow batch of blobs is in memory per task. Non-image or
    undecodable blobs pass through with resized=0 and their original
    bytes (route them to quarantine downstream, don't lose them).

    Output: (media_id, codec, resized int, width, height, content).
    Scale: stateless per-row transform — partitions process
    independently, no shuffle at all; writer-side `maxRecordsPerFile`
    handles output sizing."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("codec", T.StringType()),
            T.StructField("resized", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("content", T.BinaryType()),
        ]
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, c in zip(pdf[id_col], pdf[content_col]):
                raw = bytes(c) if c is not None else b""
                codec = sniff_codec(raw)
                try:
                    if codec in ("ppm", "pgm"):
                        img = decode_ppm(raw)
                    elif codec == "bmp":
                        img = decode_bmp(raw)
                    else:
                        raise ValueError(codec)
                    if img.ndim == 2:
                        img = np.stack([img] * 3, axis=-1)
                    elif img.shape[2] == 1:
                        # PGM decodes to (h, w, 1): promote to 3
                        # channels or encode_ppm writes a P6 header
                        # over 1/3 of the promised bytes — a corrupt
                        # blob flagged resized=1
                        img = np.repeat(img, 3, axis=2)
                    small = resize_image(img, h, w)
                    rows.append((int(mid), codec, 1, w, h, encode_ppm(small)))
                except Exception:
                    rows.append((int(mid), codec, 0, 0, 0, raw))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "codec", "resized", "width", "height", "content"],
            )

    return df.mapInPandas(_batches, schema=out_schema)


# --------------------------------------------------------------------------
# MP4 / ISO-BMFF metadata (real box-structure parsing, no codec needed)
# --------------------------------------------------------------------------


def _bmff_boxes(buf: bytes, start: int, end: int):
    """Yield (type, payload_start, box_end) for each ISO-BMFF box in
    [start, end): 32-bit size, 64-bit largesize when size==1,
    to-end-of-file when size==0."""
    pos = start
    while pos + 8 <= end:
        size, typ = struct.unpack_from(">I4s", buf, pos)
        header = 8
        if size == 1:
            if pos + 16 > end:
                break
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            header = 16
        elif size == 0:
            size = end - pos
        if size < header or pos + size > end:
            break
        yield typ, pos + header, pos + size
        pos += size


def mp4_metadata(content: bytes) -> dict:
    """REAL MP4/ISO-BMFF metadata from the box structure — no codec
    library: ftyp major brand, mvhd timescale/duration (v0 and v1
    layouts) → duration_ms, track count, and per-track hdlr handler
    types ('vide'/'soun'/...). Frame DECODE stays honestly stubbed
    (needs a codec); the container walk is exact per ISO 14496-12.

    Malformed boxes (truncated mvhd, payload shorter than its layout)
    leave the affected field None instead of raising — a corpus scan
    must survive corrupt blobs (video_metadata promises nulls, and one
    bad blob must not kill an executor task).

    Returns {brand, duration_ms, timescale, n_tracks, handlers}."""
    out = {
        "brand": None,
        "duration_ms": None,
        "timescale": None,
        "n_tracks": 0,
        "handlers": [],
    }
    for typ, s, e in _bmff_boxes(content, 0, len(content)):
        if typ == b"ftyp" and s + 4 <= e:
            out["brand"] = content[s : s + 4].decode("latin1")
        elif typ == b"moov":
            for t2, s2, e2 in _bmff_boxes(content, s, e):
                if t2 == b"mvhd":
                    # bounds-check against the BOX end, not just the
                    # buffer: a short payload must not read into
                    # sibling boxes or off the end of the blob
                    if s2 >= e2:
                        continue
                    ver = content[s2]
                    # bounds cover the LAST byte read, not the first:
                    # v1 reads through s2+32 (4 ver/flags + 16 times +
                    # 4 timescale + 8 duration), v0 through s2+20
                    if ver == 1 and s2 + 32 <= e2:
                        timescale = struct.unpack_from(">I", content, s2 + 4 + 16)[0]
                        duration = struct.unpack_from(">Q", content, s2 + 4 + 20)[0]
                    elif ver == 0 and s2 + 20 <= e2:
                        timescale, duration = struct.unpack_from(
                            ">II", content, s2 + 4 + 8
                        )
                    else:
                        continue
                    out["timescale"] = int(timescale)
                    if timescale:
                        out["duration_ms"] = int(duration * 1000 // timescale)
                elif t2 == b"trak":
                    out["n_tracks"] += 1
                    for t3, s3, e3 in _bmff_boxes(content, s2, e2):
                        if t3 == b"mdia":
                            for t4, s4, e4 in _bmff_boxes(content, s3, e3):
                                if t4 == b"hdlr" and s4 + 12 <= e4:
                                    out["handlers"].append(
                                        content[s4 + 8 : s4 + 12].decode("latin1")
                                    )
    return out


def video_metadata(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Per-blob MP4 metadata over mapInPandas (Arrow batches): the
    content-derived replacement for trusting a caller-supplied
    duration_ms column. Non-BMFF blobs yield nulls. Feeds
    frame_sample_plan via the parsed duration."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                b = bytes(blob) if blob is not None else b""
                m = (
                    mp4_metadata(b)
                    if sniff_codec(b) == "mp4"
                    else {
                        "brand": None,
                        "duration_ms": None,
                        "timescale": None,
                        "n_tracks": 0,
                        "handlers": [],
                    }
                )
                recs.append(
                    {
                        id_col: mid,
                        "brand": m["brand"],
                        "duration_ms": m["duration_ms"],
                        "timescale": m["timescale"],
                        "n_tracks": m["n_tracks"],
                        "handlers": ",".join(m["handlers"]),
                    }
                )
            yield pd.DataFrame(recs)

    schema = (
        f"{id_col} long, brand string, duration_ms long, "
        "timescale long, n_tracks long, handlers string"
    )
    return df.select(id_col, content_col).mapInPandas(_batches, schema)


def encode_minimal_mp4(
    duration_ms: int = 3000, timescale: int = 1000, handlers: tuple = ("vide",)
) -> bytes:
    """Fixture encoder: a structurally valid (if content-free) ISO-BMFF
    file — ftyp + moov(mvhd + one trak/mdia/hdlr per handler) — that
    mp4_metadata parses exactly. Real box framing, honest about having
    no media samples."""

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom" + b"iso2")
    duration = duration_ms * timescale // 1000
    # mvhd v0: version/flags, ctime, mtime, timescale, duration,
    # rate, volume+reserved, reserved x2, matrix(36), predefined(24),
    # next_track_id
    mvhd = box(
        b"mvhd",
        bytes(4)
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)
        + struct.pack(">HH", 0x0100, 0)
        + bytes(8)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + bytes(24)
        + struct.pack(">I", len(handlers) + 1),
    )
    traks = b""
    for h in handlers:
        hdlr = box(
            b"hdlr", bytes(4) + bytes(4) + h.encode("latin1")[:4] + bytes(12) + b"\x00"
        )
        traks += box(b"trak", box(b"mdia", hdlr))
    return ftyp + box(b"moov", mvhd + traks)
