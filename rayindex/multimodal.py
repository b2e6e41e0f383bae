"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by actor-pool ``map_batches`` stages.

The container ships no media codecs (no PIL/ffmpeg/torchaudio), so the decode
kernels are **clearly-marked deterministic stubs** gated behind import-try:
every derived quantity is a pure function of the payload bytes, so pipelines
are reproducible and testable end-to-end while the Ray-side plumbing — binary
Arrow columns, small-batch sizing for large payloads, actor setup in
``__init__``, output schema — is real.  Swapping in a real codec only changes
the marked ``_decode_*`` functions.

Batch-size note (SURVEY guidance): binary payload stages must keep
``batch_size`` small so batch × concurrency fits worker heaps; the defaults
here assume ≤ ~1 MB payloads (override per deployment).
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa

import ray.data as rd

from .textops import auto_concurrency

try:  # real codecs are absent in this container; keep the seam explicit
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("meta", pa.string()),  # JSON sidecar (source, codec hints)
    ]
)

_KINDS = ["image", "audio", "video"]


def synth_media(sf_dir: str) -> rd.Dataset:
    """Deterministic media table derived from ``documents`` (payload = UTF-8
    text bytes; kind round-robins) — the fixture for the media stages."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"])

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        srcs = batch.column("source").to_pylist()
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array([_KINDS[i % 3] for i in ids], pa.string()),
                "payload": pa.array([t.encode("utf-8") for t in texts], pa.binary()),
                "meta": pa.array([json.dumps({"source": s}, sort_keys=True) for s in srcs], pa.string()),
            },
            schema=MEDIA_SCHEMA,
        )

    return docs.map_batches(mk, batch_format="pyarrow", zero_copy_batch=True)


# -- STUB decode kernels (deterministic functions of the payload bytes) -----


def _decode_image_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB: real impl would be PIL.Image.open(...).size.  Deterministic fake:
    dimensions derived from payload length + first bytes."""
    n = len(payload)
    width = 16 + (n % 317)
    height = 16 + ((n * 7 + (payload[0] if n else 0)) % 211)
    return width, height, 3


def _decode_audio_stub(payload: bytes) -> tuple[int, int]:
    """STUB: real impl would read the container header.  sample_rate, n_samples."""
    n = len(payload)
    return 16000, n * 4


def _frame_count_stub(payload: bytes) -> int:
    """STUB: real impl would probe the video container."""
    return max(1, len(payload) // 64)


class MediaDecodeStage:
    """Actor stage: payload → typed metadata (width/height/channels,
    sample_rate/duration, frame count).  Real codecs load in ``__init__`` once
    per actor when available."""

    def __init__(self):
        self.have_pil = HAVE_PIL
        if self.have_pil:  # pragma: no cover - not available in container
            from PIL import Image

            self._open = Image.open

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, chans, rates, samples, frames = [], [], [], [], [], []
        for kind, payload in zip(batch.column("kind").to_pylist(), batch.column("payload").to_pylist()):
            w = h = c = sr = ns = nf = 0
            if kind == "image":
                w, h, c = _decode_image_stub(payload)
            elif kind == "audio":
                sr, ns = _decode_audio_stub(payload)
            elif kind == "video":
                nf = _frame_count_stub(payload)
            widths.append(w)
            heights.append(h)
            chans.append(c)
            rates.append(sr)
            samples.append(ns)
            frames.append(nf)
        out = batch.select(["media_id", "kind"])
        out = out.append_column("n_bytes", pa.array([len(p) for p in batch.column("payload").to_pylist()], pa.int64()))
        for name, vals in (
            ("width", widths), ("height", heights), ("channels", chans),
            ("sample_rate", rates), ("n_samples", samples), ("n_frames", frames),
        ):
            out = out.append_column(name, pa.array(vals, pa.int64()))
        return out


class FrameSampleStage:
    """Video → every-Nth frame ids (STUB frame decode); output one row per
    sampled frame, ``flat_map``-shaped inside ``map_batches``."""

    def __init__(self, every_n: int = 8):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids, fids, fhash = [], [], []
        for mid, kind, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if kind != "video":
                continue
            for f in range(0, _frame_count_stub(payload), self.every_n):
                mids.append(mid)
                fids.append(f)
                # STUB frame content hash (real impl: decoded frame bytes);
                # frame f covers BYTES [f*64, f*64+64) — slicing by frame
                # index instead of byte offset was a review finding
                fhash.append(hashlib.md5(payload[f * 64 : f * 64 + 64] or b"\0").hexdigest()[:16])
        return pa.table(
            {
                "media_id": pa.array(mids, pa.int64()),
                "frame_id": pa.array(fids, pa.int64()),
                "frame_hash": pa.array(fhash, pa.string()),
            }
        )


class FeatureStage:
    """Payload → fixed-size embedding (STUB: a deterministic hash-derived
    pseudo-embedding; real impl: a model forward pass, batched).  Emits
    ``list<float32>`` Arrow — the schema/batching a real model stage needs.

    Stub definition (exactly mirrorable in SQL for the correctness gate):
    ``feature[j] = float32(md5_le64(payload ∥ ':' ∥ j) / 2^64)`` — uniform in
    [0, 1), a pure function of the payload bytes."""

    DIM = 16

    def __call__(self, batch: pa.Table) -> pa.Table:
        md5 = hashlib.md5
        feats = []
        for payload in batch.column("payload").to_pylist():
            v = np.fromiter(
                (int.from_bytes(md5(payload + f":{j}".encode()).digest()[:8], "little")
                 for j in range(self.DIM)),
                dtype=np.uint64, count=self.DIM,
            )
            feats.append((v / np.float64(2**64)).astype(np.float32))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            }
        )


# -- REAL codecs (round 3): BMP / WAV / Y4M, numpy-only ----------------------


def synth_media_real(sf_dir: str) -> rd.Dataset:
    """Deterministic media table whose payloads are VALID files in standard
    uncompressed formats (BMP image / WAV audio / Y4M video — see
    media_codecs): kind round-robins on doc_id like :func:`synth_media`, and
    every pixel/sample is a closed-form function of doc_id so the decode
    aggregates below are SQL-oracle-checkable."""
    from . import media_codecs as mc

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        srcs = batch.column("source").to_pylist()
        kinds, payloads = [], []
        for d in ids:
            k = _KINDS[d % 3]
            kinds.append(k)
            if k == "image":
                payloads.append(mc.encode_bmp(mc.gen_image(d)))
            elif k == "audio":
                payloads.append(mc.encode_wav(mc.gen_audio(d), mc.audio_params(d)[0]))
            else:
                payloads.append(mc.encode_y4m(mc.gen_video(d)))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "meta": pa.array(
                    [json.dumps({"source": s, "codec": "real"}, sort_keys=True) for s in srcs],
                    pa.string(),
                ),
            },
            schema=MEDIA_SCHEMA,
        )

    return docs.map_batches(mk, batch_format="pyarrow", zero_copy_batch=True)


class ImageStatsStage:
    """REAL decode: BMP header parse + pixel-array read (media_codecs), then
    per-image integer stats.  Actor-pool shaped like a model stage: construct
    once, decode per batch; payloads stay opaque binary until here."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .media_codecs import decode_bmp

        ids, ws, hs, sums = [], [], [], []
        for mid, kind, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if kind != "image":
                continue
            arr = decode_bmp(payload)
            ids.append(mid)
            hs.append(arr.shape[0])
            ws.append(arr.shape[1])
            sums.append(int(arr.sum(dtype=np.int64)))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "channels": pa.array([3] * len(ids), pa.int64()),
                "pixel_sum": pa.array(sums, pa.int64()),
            }
        )


class AudioStatsStage:
    """REAL decode: RIFF chunk walk + PCM frame read, then integer stats."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .media_codecs import decode_wav

        ids, rates, ns, sums = [], [], [], []
        for mid, kind, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if kind != "audio":
                continue
            rate, samples = decode_wav(payload)
            ids.append(mid)
            rates.append(rate)
            ns.append(samples.size)
            sums.append(int(samples.sum(dtype=np.int64)))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "sample_rate": pa.array(rates, pa.int64()),
                "n_samples": pa.array(ns, pa.int64()),
                "sample_sum": pa.array(sums, pa.int64()),
            }
        )


class VideoFrameStatsStage:
    """REAL decode: Y4M header parse + FRAME iteration; emits one row per
    every-Nth sampled frame (flat_map-shaped) with the frame's byte sum."""

    def __init__(self, every_n: int = 4):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .media_codecs import decode_y4m

        ids, fids, sums = [], [], []
        for mid, kind, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if kind != "video":
                continue
            _w, _h, frames = decode_y4m(payload)
            for f in range(0, frames.shape[0], self.every_n):
                ids.append(mid)
                fids.append(f)
                sums.append(int(frames[f].sum(dtype=np.int64)))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_id": pa.array(fids, pa.int64()),
                "frame_sum": pa.array(sums, pa.int64()),
            }
        )


def media_image_stats(sf_dir: str) -> rd.Dataset:
    """Real-BMP decode pipeline: (media_id, width, height, channels,
    pixel_sum) per image payload."""
    return synth_media_real(sf_dir).map_batches(
        ImageStatsStage, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=auto_concurrency(), batch_size=256,
    )


def media_audio_stats(sf_dir: str) -> rd.Dataset:
    """Real-WAV decode pipeline: (media_id, sample_rate, n_samples,
    sample_sum) per audio payload."""
    return synth_media_real(sf_dir).map_batches(
        AudioStatsStage, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=auto_concurrency(), batch_size=256,
    )


def media_video_frames(sf_dir: str) -> rd.Dataset:
    """Real-Y4M decode pipeline: every-4th-frame (media_id, frame_id,
    frame_sum) per video payload."""
    return synth_media_real(sf_dir).map_batches(
        VideoFrameStatsStage, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=auto_concurrency(), batch_size=256,
    )


def media_meta(sf_dir: str) -> rd.Dataset:
    """Decode-metadata pipeline (SQL-mirrorable: the stub is a deterministic
    function of octet_length + first byte)."""
    return synth_media(sf_dir).map_batches(
        MediaDecodeStage, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=auto_concurrency(), batch_size=256,
    )


def media_frames(sf_dir: str) -> rd.Dataset:
    return synth_media(sf_dir).map_batches(
        FrameSampleStage, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=auto_concurrency(), batch_size=256,
    )


def media_features(sf_dir: str) -> rd.Dataset:
    """Feature extraction → LONG format (media_id, dim_id, value float64) so
    the driver's value-hash check (and any SQL consumer) sees scalar columns;
    ``FeatureStage`` itself emits the list<float32> a model stage would."""
    feats = synth_media(sf_dir).map_batches(
        FeatureStage, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=auto_concurrency(), batch_size=256,
    )

    def explode(t: pa.Table) -> pa.Table:
        f = t.column("feature")
        flat = pa.compute.list_flatten(f).cast(pa.float64())
        parents = pa.compute.list_parent_indices(f)
        ids = t.column("media_id").take(parents)
        n = FeatureStage.DIM
        dims = np.tile(np.arange(n, dtype=np.int64), len(t))
        return pa.table(
            {"media_id": ids, "dim_id": pa.array(dims, pa.int64()), "value": flat}
        )

    return feats.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
