"""REAL media codecs over uncompressed public formats — no codec libraries.

Round 2's multimodal stages proved the Ray plumbing (binary columns, actor
pools, small batches) around clearly-marked STUB decoders, since the container
ships no PIL/ffmpeg.  This module closes the remaining seam with *real*
decoders for three standard uncompressed formats that need nothing beyond
numpy:

- **BMP** (Windows device-independent bitmap, 24-bit uncompressed): header
  layout per the public BITMAPFILEHEADER/BITMAPINFOHEADER spec — pixel-array
  offset at byte 10, width/height/bpp in the DIB header, rows bottom-up and
  padded to 4-byte multiples, BGR byte order.
- **WAV** (RIFF PCM): chunk-walked container, ``fmt `` + ``data`` chunks,
  16-bit mono little-endian samples.
- **Y4M** (YUV4MPEG2, mjpegtools): ASCII stream header with W/H/C params,
  then ``FRAME\\n``-delimited raw planes (C444 = three w×h planes per frame).

Encoders exist so fixtures synthesize *valid files* deterministically and so
tests can pin exact encode→decode roundtrips.  The decoders parse the actual
header fields (offsets, dimensions, chunk sizes) rather than assuming the
fixture's generation parameters — a wrong offset or padding rule fails the
oracle, not just a unit test.

Reference analog: the reference has no media path at all (its only binary-ish
column is HTML MEDIUMTEXT, model/PageEntity.java:28-30); these stages are the
training-data-pipeline extension the 100-TB target needs.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# BMP — 24-bit uncompressed, BITMAPINFOHEADER
# ---------------------------------------------------------------------------


def encode_bmp(rgb: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit bottom-up BMP."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("encode_bmp wants (h, w, 3) uint8")
    h, w, _ = rgb.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    pixel_bytes = stride * h
    data_offset = 14 + 40
    # pixel rows bottom-up, channels BGR, right-padded with zeros
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = rgb[::-1, :, ::-1].reshape(h, row_bytes)
    header = struct.pack(
        "<2sIHHI", b"BM", data_offset + pixel_bytes, 0, 0, data_offset
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0
    )
    return header + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to an (h, w, 3) uint8 RGB array.

    Parses the real header: pixel-array offset from BITMAPFILEHEADER,
    width/height/bpp/compression from BITMAPINFOHEADER; supports both
    bottom-up (positive height) and top-down (negative height) pixel order.
    """
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40:
        raise ValueError(f"unsupported DIB header size {dib_size}")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp})")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    stride = (w * 3 + 3) // 4 * 4
    px = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_offset)
    rows = px.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


# ---------------------------------------------------------------------------
# WAV — RIFF, PCM 16-bit mono
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode an int16 array as a PCM 16-bit mono WAV."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM 16-bit mono WAV → (sample_rate, int16 array).

    Walks RIFF chunks (so extra chunks like LIST/INFO before ``data`` are
    skipped correctly, including the odd-size pad byte the spec requires).
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack_from("<I", payload, 4)[0]
    sample_rate = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate = struct.unpack_from("<HHI", payload, pos + 8)
            bits = struct.unpack_from("<H", payload, pos + 22)[0]
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only PCM 16-bit mono WAV supported")
        elif cid == b"data":
            data = np.frombuffer(payload, dtype="<i2", count=size // 2, offset=pos + 8)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt / data chunk")
    return int(sample_rate), data


# ---------------------------------------------------------------------------
# Y4M — YUV4MPEG2, C444 (three full-resolution planes per frame)
# ---------------------------------------------------------------------------


def encode_y4m(frames: np.ndarray, fps: str = "25:1") -> bytes:
    """Encode an (n_frames, 3, h, w) uint8 array as YUV4MPEG2 C444."""
    if frames.ndim != 4 or frames.shape[1] != 3 or frames.dtype != np.uint8:
        raise ValueError("encode_y4m wants (n, 3, h, w) uint8")
    n, _, h, w = frames.shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps} Ip A1:1 C444\n".encode("ascii")]
    for f in range(n):
        out.append(b"FRAME\n")
        out.append(frames[f].tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a YUV4MPEG2 C444 stream → (w, h, (n, 3, h, w) uint8 array).

    Parses the stream-header parameters (W/H/C tags) and iterates FRAME
    markers; frame headers may carry parameters after ``FRAME`` (ignored, as
    the spec allows)."""
    nl = payload.index(b"\n")
    head = payload[:nl].decode("ascii", errors="replace").split(" ")
    if head[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    colorspace = "C420"  # spec default
    for tag in head[1:]:
        if tag.startswith("W"):
            w = int(tag[1:])
        elif tag.startswith("H"):
            h = int(tag[1:])
        elif tag.startswith("C"):
            colorspace = tag
    if w is None or h is None:
        raise ValueError("missing W/H in Y4M header")
    if not colorspace.startswith("C444"):
        raise ValueError("only C444 supported")
    frame_bytes = 3 * w * h
    frames = []
    pos = nl + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        fnl = payload.index(b"\n", pos)
        start = fnl + 1
        frames.append(
            np.frombuffer(payload, dtype=np.uint8, count=frame_bytes, offset=start)
            .reshape(3, h, w)
        )
        pos = start + frame_bytes
    arr = np.stack(frames) if frames else np.zeros((0, 3, h, w), dtype=np.uint8)
    return w, h, arr


# ---------------------------------------------------------------------------
# Deterministic fixture payload generators (oracle-mirrored closed forms)
# ---------------------------------------------------------------------------
# Every pixel/sample below is a closed-form function of (doc_id, position) so
# a DuckDB oracle can recompute each aggregate exactly via generate_series —
# the decode step itself (offsets, padding, chunk walk, frame markers) is the
# quantity under test.


def image_params(doc_id: int) -> tuple[int, int]:
    return 16 + doc_id % 17, 16 + doc_id % 11  # (w, h)


def gen_image(doc_id: int) -> np.ndarray:
    """pixel[y, x, c] = (x + y + c + doc_id) % 256."""
    w, h = image_params(doc_id)
    x = np.arange(w, dtype=np.int64)[None, :, None]
    y = np.arange(h, dtype=np.int64)[:, None, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]
    return ((x + y + c + doc_id) % 256).astype(np.uint8)


def audio_params(doc_id: int) -> tuple[int, int]:
    return 8000 * (1 + doc_id % 3), 256 + doc_id % 181  # (rate, n_samples)


def gen_audio(doc_id: int) -> np.ndarray:
    """sample[i] = ((7 i + doc_id) % 65536) - 32768, int16."""
    _rate, n = audio_params(doc_id)
    i = np.arange(n, dtype=np.int64)
    return (((7 * i + doc_id) % 65536) - 32768).astype(np.int16)


def video_params(doc_id: int) -> tuple[int, int, int]:
    return 8 + doc_id % 9, 8 + doc_id % 7, 4 + doc_id % 29  # (w, h, n_frames)


def gen_video(doc_id: int) -> np.ndarray:
    """frame f is constant-valued: every plane byte = (31 f + doc_id) % 256.

    Constant planes keep the oracle closed-form while still catching offset
    errors — a misaligned FRAME read blends two frames' constants and the
    per-frame sum is wrong."""
    w, h, n = video_params(doc_id)
    v = ((31 * np.arange(n, dtype=np.int64) + doc_id) % 256).astype(np.uint8)
    return np.broadcast_to(v[:, None, None, None], (n, 3, h, w)).copy()
