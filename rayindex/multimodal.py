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
                # STUB frame content hash (real impl: decoded frame bytes)
                fhash.append(hashlib.md5(payload[f : f + 64] or b"\0").hexdigest()[:16])
        return pa.table(
            {
                "media_id": pa.array(mids, pa.int64()),
                "frame_id": pa.array(fids, pa.int64()),
                "frame_hash": pa.array(fhash, pa.string()),
            }
        )


class FeatureStage:
    """Payload → fixed-size embedding (STUB: seeded from payload md5; real
    impl: a model forward pass, batched).  Emits ``list<float>`` Arrow."""

    DIM = 16

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch.column("payload").to_pylist():
            seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
            rng = np.random.default_rng(seed)
            feats.append(rng.standard_normal(self.DIM).astype(np.float32))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            }
        )


def media_meta(sf_dir: str) -> rd.Dataset:
    """Decode-metadata pipeline (SQL-mirrorable: the stub is a deterministic
    function of octet_length + first byte)."""
    return synth_media(sf_dir).map_batches(
        MediaDecodeStage, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 4), batch_size=256,
    )


def media_frames(sf_dir: str) -> rd.Dataset:
    return synth_media(sf_dir).map_batches(
        FrameSampleStage, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 4), batch_size=256,
    )


def media_features(sf_dir: str) -> rd.Dataset:
    return synth_media(sf_dir).map_batches(
        FeatureStage, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 4), batch_size=256,
    )
