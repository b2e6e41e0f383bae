"""Posting-list compression: delta + varbyte OR PForDelta, with block-max
metadata.

The reference materializes one MySQL row per (page, lemma) posting
(model/IndexEntity.java:11-23, written row-at-a-time at
dto/indexing/PageIndexer.java:195-203).  At 10^12 documents that layout is
impossible; we compress each term's docid-sorted posting list into
compressed blobs with fixed-size blocks and per-block metadata
(last_doc, max_tf, min_dl) enabling block-max WAND skipping.

Two interchangeable codecs (``EncodedPostings.codec``), selected per build —
``"pfor"`` is the default (measured both faster to build and ~15 % smaller
at 500 k pages, BENCH/bench_r3_s7_500k_pfor.json, with bit-identical ranks);
``"vb"`` remains fully supported and is the implied codec of segment rows
written before the ``codec`` column existed:

* ``"vb"`` — delta + varbyte (LEB128-flavoured): 7 payload bits per byte,
  little-endian groups, MSB set on every byte that has a successor.  Both
  encode and decode are numpy-vectorized (no per-posting Python loop):
  encode fills at most 10 byte-planes per varint; decode classifies
  continuation bits and reduces ≤10 shifted byte-planes.

* ``"pfor"`` — NewPFD-style patched frame-of-reference: per 128-value block,
  a bit width ``b`` covering ~90 % of the block's values is chosen from a
  per-block width histogram; all values' low ``b`` bits are bit-packed
  (little-endian), and the ≤10 % outliers are "patched" via an exception
  list (position byte + varbyte-encoded high bits).  Block layout:
  ``[b:1][n_exc:1][packed ceil(m*b/8)][exc_pos:n_exc][varbyte highs]``.
  Encoding groups full blocks by chosen width so the bit-packing runs as
  whole-matrix ``np.packbits`` calls, not a per-value loop.

Both codecs share the same block framing (per-block byte-length sidecars),
so ``BlockReader`` offsets, block-max metadata and WAND skipping are
codec-independent.  The positional layer stays varbyte under either codec
(per-doc lists are tiny and variable-length).
"""

from __future__ import annotations

import sys
from dataclasses import dataclass

import numpy as np

BLOCK_SIZE = 128  # docs per block (classic block-max posting block size)
_MAX_VARINT_BYTES = 10  # ceil(64 / 7)


def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized varbyte encoding of a uint64 array."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: 1 + number of 7-bit shifts that stay non-zero
    nbytes = np.ones(v.size, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += (tmp > 0)
        tmp >>= np.uint64(7)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for j in range(int(nbytes.max())):
        mask = nbytes > j
        idx = starts[mask] + j
        byte = ((v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] > j + 1).astype(np.uint8) << 7
        out[idx] = byte | cont
    return out.tobytes()


def varbyte_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte count per value (same rule as :func:`varbyte_encode`) —
    lets callers slice a concatenated blob into per-group segments."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    nbytes = np.ones(v.size, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += (tmp > 0)
        tmp >>= np.uint64(7)
    return nbytes


def varbyte_decode(buf: bytes | memoryview | np.ndarray, count: int | None = None) -> np.ndarray:
    """Vectorized decode of a varbyte blob → uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.nonzero((b & 0x80) == 0)[0]  # terminal byte of each varint
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    widths = ends - starts + 1
    out = np.zeros(ends.size, dtype=np.uint64)
    for j in range(int(widths.max())):
        mask = widths > j
        out[mask] |= (b[starts[mask] + j] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * j)
    if count is not None and out.size != count:
        raise ValueError(f"decoded {out.size} values, expected {count}")
    return out


# ---------------------------------------------------------------------------
# PForDelta (NewPFD-style) stream codec

_PFOR_PCTL = 0.9  # inline-width percentile; outliers beyond it are patched
_CHUNK = 512  # blocks per packbits/unpackbits call: caps the bit-matrix at ~34 MB


def _bit_widths(v: np.ndarray) -> np.ndarray:
    """Bits needed per value (0 for 0).

    Computed per 32-bit half via ``np.frexp`` on an exact float64 cast
    (uint32 → float64 is lossless, and frexp's exponent of x>0 is
    floor(log2(x))+1 = the bit width; frexp(0) is 0).  Four kernel passes
    instead of the former 64 compares — byte-identical output, ~5-8× less
    fixed overhead per call, which dominates tail-term posting encodes."""
    hi = (v >> np.uint64(32)).astype(np.uint32)
    lo = v.astype(np.uint32)
    whi = np.frexp(hi.astype(np.float64))[1].astype(np.uint8)
    wlo = np.frexp(lo.astype(np.float64))[1].astype(np.uint8)
    return np.where(hi > 0, whi + np.uint8(32), wlo).astype(np.uint8)


def pfor_encode_stream(values: np.ndarray, bounds: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode a uint64 stream into independently-decodable PFor blocks.

    ``bounds`` are the block boundaries ``[0, B, 2B, ..., n]`` (the same
    posting-block bounds the varbyte path uses).  Returns the concatenated
    blob plus per-block byte counts for the sidecar.  Full blocks are
    grouped by chosen bit width so the packing is one ``np.packbits`` per
    distinct width (vectorized across blocks), not a per-block loop.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b"", np.empty(0, np.uint32)
    n_blocks = len(bounds) - 1
    sizes = np.diff(bounds).astype(np.int64)
    widths = _bit_widths(v)
    block_id = np.repeat(np.arange(n_blocks, dtype=np.int64), sizes)

    # per-block width histogram → smallest b covering >= 90 % of the block
    hist = np.bincount(block_id * 65 + widths, minlength=n_blocks * 65).reshape(
        n_blocks, 65
    )
    cum = hist.cumsum(axis=1)
    need = np.ceil(_PFOR_PCTL * sizes).astype(np.int64)
    bsel = (cum < need[:, None]).sum(axis=1).astype(np.uint8)  # 0..64

    b_per_value = bsel[block_id]
    exc = widths > b_per_value
    highs = v[exc] >> b_per_value[exc].astype(np.uint64)
    exc_pos = (np.arange(n, dtype=np.int64) - bounds[:-1][block_id])[exc].astype(np.uint8)
    exc_block = block_id[exc]
    n_exc = np.bincount(exc_block, minlength=n_blocks).astype(np.int64)
    # varbyte the high bits in one pass; per-block slices via the length rule
    highs_blob = np.frombuffer(varbyte_encode(highs), dtype=np.uint8)
    high_lens = varbyte_lengths(highs) if highs.size else np.empty(0, np.int64)
    high_cum = np.concatenate(([0], np.cumsum(high_lens)))
    high_bounds = np.concatenate(([0], np.cumsum(n_exc)))

    # bit-pack low b bits, grouped by (block length, chosen width)
    packed: list[np.ndarray | None] = [None] * n_blocks
    blocks = np.arange(n_blocks)
    # module-level _CHUNK: blocks per packbits call, caps the bit-matrix
    for m in np.unique(sizes):
        same_m = blocks[sizes == m]
        for b in np.unique(bsel[same_m]):
            grp_all = same_m[bsel[same_m] == b]
            if b == 0:
                for k in grp_all:
                    packed[k] = np.empty(0, np.uint8)
                continue
            shifts = np.arange(int(b), dtype=np.uint64)
            for c0 in range(0, len(grp_all), _CHUNK):
                grp = grp_all[c0 : c0 + _CHUNK]
                idx = bounds[:-1][grp][:, None] + np.arange(m)
                mat = v[idx]  # (k, m)
                bits = ((mat[:, :, None] >> shifts) & np.uint64(1)).astype(np.uint8)
                rows = np.packbits(bits.reshape(len(grp), -1), axis=1, bitorder="little")
                for i, k in enumerate(grp):
                    packed[k] = rows[i]

    parts: list[bytes] = []
    nbytes = np.empty(n_blocks, dtype=np.uint32)
    for k in range(n_blocks):
        e0, e1 = high_bounds[k], high_bounds[k + 1]
        h = highs_blob[high_cum[e0] : high_cum[e1]] if e1 > e0 else b""
        blk = (
            bytes((int(bsel[k]), int(n_exc[k])))
            + packed[k].tobytes()
            + exc_pos[e0:e1].tobytes()
            + (h.tobytes() if isinstance(h, np.ndarray) else h)
        )
        parts.append(blk)
        nbytes[k] = len(blk)
    return b"".join(parts), nbytes


# the window-gather unpack reinterprets 8 raw bytes as one uint64 in NATIVE
# byte order; the blobs are little-endian, so the fast path is LE-hosts-only
# (big-endian hosts keep the endian-neutral unpackbits route)
_LE_HOST = sys.byteorder == "little"


def _unpack_le_windows(
    sw: np.ndarray, plane_starts: np.ndarray, m: int, b: int
) -> np.ndarray:
    """Unpack ``m`` little-endian ``b``-bit values from each of the planes
    starting at ``plane_starts`` (byte offsets into the buffer behind ``sw``).

    ``sw`` is ``sliding_window_view(buf_padded, 8)`` — every row is the 8-byte
    window at one byte offset, read as one uint64.  Value ``j`` of a plane
    occupies bits ``[j·b, j·b+b)``; its window starts at byte ``(j·b)>>3`` and
    the value is ``(window >> (j·b & 7)) & ((1<<b)-1)``.  Valid for
    ``b <= 56`` (window must cover ``(j·b & 7) + b <= 64`` bits).  Bytes the
    window reads past a plane's end feed only bits ``>= j·b+b`` — masked out —
    so planes never need per-block padding, only the buffer-level 8-byte pad.

    ~5× faster than the unpackbits route at web-index doc-delta widths
    (b≈40-50: hashed doc_ids make within-block deltas large): the unpackbits
    path materializes a (G·m·b)-byte bit tensor then widens it 8×, while this
    is one contiguous (G·m, 8)-byte gather reinterpreted in place.
    """
    bit = np.arange(m, dtype=np.int64) * b
    q = bit >> 3
    r = (bit & 7).astype(np.uint64)
    gq = (plane_starts[:, None] + q[None, :]).reshape(-1)
    win = sw[gq].view(np.uint64).reshape(len(plane_starts), m)
    return (win >> r[None, :]) & np.uint64((1 << b) - 1)


def pfor_decode_block(buf: np.ndarray, m: int) -> np.ndarray:
    """Decode one PFor block of ``m`` values from its byte slice."""
    b = int(buf[0])
    k_exc = int(buf[1])
    psize = (m * b + 7) // 8
    if 3 <= b <= 56 and _LE_HOST:
        pad = np.concatenate([buf[2 : 2 + psize], np.zeros(8, np.uint8)])
        sw = np.lib.stride_tricks.sliding_window_view(pad, 8)
        vals = _unpack_le_windows(sw, np.zeros(1, np.int64), m, b)[0].copy()
    elif b:
        bits = np.unpackbits(buf[2 : 2 + psize], bitorder="little")[: m * b]
        shifts = np.arange(b, dtype=np.uint64)
        vals = (bits.reshape(m, b).astype(np.uint64) << shifts).sum(
            axis=1, dtype=np.uint64
        )
    else:
        vals = np.zeros(m, dtype=np.uint64)
    if k_exc:
        pos = buf[2 + psize : 2 + psize + k_exc]
        highs = varbyte_decode(buf[2 + psize + k_exc :], k_exc)
        vals[pos] |= highs << np.uint64(b)
    return vals


def pfor_decode_stream(
    blob: bytes | np.ndarray, nbytes: np.ndarray, sizes: np.ndarray
) -> np.ndarray:
    """Decode a concatenated PFor stream given per-block byte counts and
    per-block value counts.

    Vectorized across blocks (the full-list decode is the query-side ref
    scorer's and the merge path's hot loop): low-bit planes are unpacked one
    ``np.unpackbits`` per distinct (block length, bit width) group — the
    mirror of the encoder's grouping — and exception patches are applied with
    one ragged gather + one varbyte decode over ALL blocks' high bits.
    Value-identical to per-block :func:`pfor_decode_block` (pinned by tests).
    """
    buf = np.frombuffer(blob, dtype=np.uint8) if not isinstance(blob, np.ndarray) else blob
    n_blocks = len(sizes)
    if n_blocks == 0:
        return np.empty(0, np.uint64)
    if n_blocks == 1:
        return pfor_decode_block(buf[: int(np.asarray(nbytes).reshape(-1)[0])], int(sizes[0]))
    sizes = np.asarray(sizes, dtype=np.int64)
    off = np.concatenate(([0], np.cumsum(np.asarray(nbytes, dtype=np.int64))))
    starts = off[:-1]
    b_arr = buf[starts].astype(np.int64)
    k_arr = buf[starts + 1].astype(np.int64)
    psize = (sizes * b_arr + 7) >> 3

    out = np.zeros(int(sizes.sum()), dtype=np.uint64)
    out_off = np.concatenate(([0], np.cumsum(sizes)))

    # 8-byte-window unpack (see _unpack_le_windows) needs the buffer padded so
    # the last plane's final window stays in bounds; one memcpy of the blob
    sw = np.lib.stride_tricks.sliding_window_view(
        np.concatenate([buf, np.zeros(8, np.uint8)]), 8
    )
    blocks = np.arange(n_blocks)
    for m in np.unique(sizes):
        sm = blocks[sizes == m]
        for b in np.unique(b_arr[sm]):
            if b == 0:
                continue  # all-low-zero blocks: out is pre-zeroed
            grp_all = sm[b_arr[sm] == b]
            m_i, b_i = int(m), int(b)
            ps = (m_i * b_i + 7) >> 3
            shifts = np.arange(b_i, dtype=np.uint64)
            for c0 in range(0, len(grp_all), _CHUNK):
                grp = grp_all[c0 : c0 + _CHUNK]
                if 3 <= b_i <= 56 and _LE_HOST:
                    # 8-byte-window gather: ~24 B traffic/value, independent
                    # of b.  The unpackbits tensor costs ~8·b B/value, so the
                    # window wins from b≈3 up (hashed-docid deltas sit at
                    # b≈40-50); below that the bit tensor is already tiny.
                    vals = _unpack_le_windows(sw, starts[grp] + 2, m_i, b_i)
                else:
                    idx = (starts[grp] + 2)[:, None] + np.arange(ps)
                    bits = np.unpackbits(buf[idx], axis=1, bitorder="little")[:, : m_i * b_i]
                    vals = (
                        bits.reshape(len(grp), m_i, b_i).astype(np.uint64) << shifts
                    ).sum(axis=2, dtype=np.uint64)
                out[out_off[grp][:, None] + np.arange(m_i)] = vals

    exc = blocks[k_arr > 0]
    if exc.size:
        ks = k_arr[exc]

        def _ragged(starts_: np.ndarray, lens_: np.ndarray) -> np.ndarray:
            tot = int(lens_.sum())
            base = np.repeat(starts_, lens_)
            within = np.arange(tot, dtype=np.int64) - np.repeat(
                np.concatenate(([0], np.cumsum(lens_)))[:-1], lens_
            )
            return buf[base + within]

        pos_starts = starts[exc] + 2 + psize[exc]
        exc_pos = _ragged(pos_starts, ks).astype(np.int64)
        h_starts = pos_starts + ks
        highs = varbyte_decode(_ragged(h_starts, off[exc + 1] - h_starts), int(ks.sum()))
        gidx = np.repeat(out_off[exc], ks) + exc_pos
        out[gidx] |= highs << np.repeat(b_arr[exc].astype(np.uint64), ks)
    return out


@dataclass
class EncodedPostings:
    """One term's (or one (term, salt) sub-list's) compressed postings."""

    n_docs: int
    n_blocks: int
    b_last_doc: bytes  # uint64[n_blocks] LE
    b_max_tf: bytes  # uint32[n_blocks] LE
    b_min_dl: bytes  # uint32[n_blocks] LE
    b_doc_nbytes: bytes  # uint32[n_blocks] LE
    b_tf_nbytes: bytes  # uint32[n_blocks] LE
    b_dl_nbytes: bytes  # uint32[n_blocks] LE
    docs_blob: bytes
    tfs_blob: bytes
    dls_blob: bytes
    # positional layer (optional — empty in non-positional builds): one
    # delta+varbyte position list per posting, concatenated in docid order,
    # with per-DOC byte lengths (uint32[n_docs] LE) for O(1) slicing
    pos_nbytes_blob: bytes = b""
    pos_blob: bytes = b""
    # stream codec: "pfor" (NewPFD patched FOR, default) or "vb"
    # (delta+varbyte); block framing / metadata / positional layer are
    # codec-independent
    codec: str = "pfor"


def encode_postings(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray, codec: str = "pfor"
) -> EncodedPostings:
    """Encode a docid-sorted posting list into block-max blobs.

    Each block is independently decodable: within a block, docids are stored
    as [first_doc_delta_from_0? no — first abs, then deltas].  Concretely the
    per-block varints are ``docs[0], docs[1]-docs[0], ...`` so a block decodes
    without its predecessor (needed for WAND block skipping).
    """
    n = len(doc_ids)
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint64)
    dls = np.ascontiguousarray(dls, dtype=np.uint64)
    if n == 0:
        z = b""
        return EncodedPostings(0, 0, z, z, z, z, z, z, z, z, z, codec=codec)
    if not bool(np.all(doc_ids[1:] > doc_ids[:-1])):
        raise ValueError("doc_ids must be strictly increasing")

    # block-local deltas: first element absolute, rest delta-1 is not used
    # (deltas are >=1 since strictly increasing; store raw delta)
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = doc_ids[0]
    deltas[1:] = doc_ids[1:] - doc_ids[:-1]
    # reset block heads to absolute docids
    head_idx = np.arange(0, n, BLOCK_SIZE)
    deltas[head_idx] = doc_ids[head_idx]

    n_blocks = len(head_idx)
    tail_idx = np.minimum(head_idx + BLOCK_SIZE, n) - 1
    b_last = doc_ids[tail_idx].astype(np.uint64)
    # per-block reductions via ufunc.reduceat
    b_max_tf = np.maximum.reduceat(tfs, head_idx).astype(np.uint32)
    b_min_dl = np.minimum.reduceat(dls, head_idx).astype(np.uint32)

    # ONE vectorized varbyte pass per stream; per-block byte counts come from
    # the per-value length rule (varbyte is value-local, so the concatenation
    # of per-block encodings IS the whole-stream encoding — byte-identical to
    # the former per-block loop, without n_blocks Python iterations)
    bounds = np.append(head_idx, n)

    if codec == "pfor":
        def _enc(stream: np.ndarray) -> tuple[bytes, np.ndarray]:
            return pfor_encode_stream(stream, bounds)
    elif codec == "vb":
        def _enc(stream: np.ndarray) -> tuple[bytes, np.ndarray]:
            blob = varbyte_encode(stream)
            if n_blocks == 1:  # the common tail-term case: one block = whole blob
                return blob, np.array([len(blob)], dtype=np.uint32)
            cum = np.concatenate(([0], np.cumsum(varbyte_lengths(stream))))
            return blob, np.diff(cum[bounds]).astype(np.uint32)
    else:
        raise ValueError(f"unknown postings codec {codec!r}")

    docs_blob, doc_lens = _enc(deltas)
    tfs_blob, tf_lens = _enc(tfs)
    dls_blob, dl_lens = _enc(dls)

    return EncodedPostings(
        n_docs=n,
        n_blocks=n_blocks,
        b_last_doc=b_last.tobytes(),
        b_max_tf=b_max_tf.tobytes(),
        b_min_dl=b_min_dl.tobytes(),
        b_doc_nbytes=doc_lens.tobytes(),
        b_tf_nbytes=tf_lens.tobytes(),
        b_dl_nbytes=dl_lens.tobytes(),
        docs_blob=docs_blob,
        tfs_blob=tfs_blob,
        dls_blob=dls_blob,
        codec=codec,
    )


@dataclass
class BatchEncodedPostings:
    """Vectorized encode of MANY single-block posting lists (the tail of the
    term distribution: every list has ``1 <= len <= BLOCK_SIZE`` docs, so each
    list is exactly one block).  Arrays are per-list; blob slices for list
    ``i`` are ``blob[off[i]:off[i+1]]``.  Per-list bytes are identical to
    :func:`encode_postings` on that list alone: both codecs encode each block
    independently (PFor picks widths per block; varbyte is value-local), so
    batching amortizes the numpy fixed cost without changing a single byte.
    """

    n: int
    n_docs: np.ndarray  # int64[n]
    b_last_doc: np.ndarray  # uint64[n]
    b_max_tf: np.ndarray  # uint32[n]
    b_min_dl: np.ndarray  # uint32[n]
    docs_blob: bytes
    tfs_blob: bytes
    dls_blob: bytes
    doc_off: np.ndarray  # int64[n+1] byte offsets into docs_blob
    tf_off: np.ndarray
    dl_off: np.ndarray
    codec: str

    def get(self, i: int) -> EncodedPostings:
        """Materialize list ``i`` as an :class:`EncodedPostings` —
        byte-identical to the per-list encoder's output."""
        dv, tv, lv = memoryview(self.docs_blob), memoryview(self.tfs_blob), memoryview(self.dls_blob)
        d0, d1 = int(self.doc_off[i]), int(self.doc_off[i + 1])
        t0, t1 = int(self.tf_off[i]), int(self.tf_off[i + 1])
        l0, l1 = int(self.dl_off[i]), int(self.dl_off[i + 1])
        return EncodedPostings(
            n_docs=int(self.n_docs[i]),
            n_blocks=1,
            b_last_doc=self.b_last_doc[i : i + 1].tobytes(),
            b_max_tf=self.b_max_tf[i : i + 1].tobytes(),
            b_min_dl=self.b_min_dl[i : i + 1].tobytes(),
            b_doc_nbytes=np.uint32(d1 - d0).tobytes(),
            b_tf_nbytes=np.uint32(t1 - t0).tobytes(),
            b_dl_nbytes=np.uint32(l1 - l0).tobytes(),
            docs_blob=bytes(dv[d0:d1]),
            tfs_blob=bytes(tv[t0:t1]),
            dls_blob=bytes(lv[l0:l1]),
            codec=self.codec,
        )


def encode_postings_batch(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    bounds: np.ndarray,
    codec: str = "pfor",
) -> BatchEncodedPostings:
    """Encode many single-block posting lists in one vectorized pass.

    ``bounds`` = ``[0, e0, e1, ..., n]`` delimits consecutive lists in the
    concatenated streams; every list must have ``1 <= len <= BLOCK_SIZE``
    docs (one block each) with strictly increasing doc_ids WITHIN a list.
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint64)
    dls = np.ascontiguousarray(dls, dtype=np.uint64)
    bounds = np.asarray(bounds, dtype=np.int64)
    n_lists = len(bounds) - 1
    n = doc_ids.size
    sizes = np.diff(bounds)
    if n_lists == 0 or n == 0:
        z = np.zeros(1, np.int64)
        return BatchEncodedPostings(
            0, np.empty(0, np.int64), np.empty(0, np.uint64),
            np.empty(0, np.uint32), np.empty(0, np.uint32),
            b"", b"", b"", z, z, z, codec,
        )
    if sizes.min() < 1 or sizes.max() > BLOCK_SIZE:
        raise ValueError("every batched list must have 1..BLOCK_SIZE docs")
    # strictly increasing within each list (boundary pairs exempt) — the same
    # guard encode_postings applies per list
    if n > 1:
        ok = doc_ids[1:] > doc_ids[:-1]
        interior_starts = bounds[1:-1]
        if interior_starts.size:
            ok[interior_starts - 1] = True
        if not bool(ok.all()):
            raise ValueError("doc_ids must be strictly increasing")

    # per-list deltas with the list head absolute (each list = one block, and
    # encode_postings stores block heads absolute)
    deltas = np.empty(n, dtype=np.uint64)
    deltas[1:] = doc_ids[1:] - doc_ids[:-1]
    deltas[bounds[:-1]] = doc_ids[bounds[:-1]]

    heads = bounds[:-1]
    b_last = doc_ids[bounds[1:] - 1].astype(np.uint64)
    b_max_tf = np.maximum.reduceat(tfs, heads).astype(np.uint32)
    b_min_dl = np.minimum.reduceat(dls, heads).astype(np.uint32)

    if codec == "pfor":
        def _enc(stream: np.ndarray) -> tuple[bytes, np.ndarray]:
            return pfor_encode_stream(stream, bounds)
    elif codec == "vb":
        def _enc(stream: np.ndarray) -> tuple[bytes, np.ndarray]:
            blob = varbyte_encode(stream)
            cum = np.concatenate(([0], np.cumsum(varbyte_lengths(stream))))
            return blob, np.diff(cum[bounds]).astype(np.uint32)
    else:
        raise ValueError(f"unknown postings codec {codec!r}")

    docs_blob, doc_lens = _enc(deltas)
    tfs_blob, tf_lens = _enc(tfs)
    dls_blob, dl_lens = _enc(dls)

    def _off(lens: np.ndarray) -> np.ndarray:
        return np.concatenate(([0], np.cumsum(lens.astype(np.int64))))

    return BatchEncodedPostings(
        n_lists, sizes.astype(np.int64), b_last, b_max_tf, b_min_dl,
        docs_blob, tfs_blob, dls_blob,
        _off(doc_lens), _off(tf_lens), _off(dl_lens), codec,
    )


def _block_sizes(n: int) -> np.ndarray:
    head_idx = np.arange(0, n, BLOCK_SIZE)
    return np.diff(np.append(head_idx, n))


def _decode_stream(enc: EncodedPostings, blob: bytes, nbytes: bytes) -> np.ndarray:
    if enc.codec == "pfor":
        return pfor_decode_stream(
            blob, np.frombuffer(nbytes, dtype=np.uint32), _block_sizes(enc.n_docs)
        )
    return varbyte_decode(blob, enc.n_docs)


def decode_postings(enc: EncodedPostings) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full decode → (doc_ids, tfs, dls), all uint64/uint32 arrays."""
    if enc.n_docs == 0:
        return (
            np.empty(0, dtype=np.uint64),
            np.empty(0, dtype=np.uint32),
            np.empty(0, dtype=np.uint32),
        )
    deltas = _decode_stream(enc, enc.docs_blob, enc.b_doc_nbytes)
    if deltas.size != enc.n_docs:
        raise ValueError(f"decoded {deltas.size} values, expected {enc.n_docs}")
    n = enc.n_docs
    head_idx = np.arange(0, n, BLOCK_SIZE)
    # cumulative sum within blocks: global cumsum, then re-anchor each block
    doc_ids = np.cumsum(deltas, dtype=np.uint64)
    if len(head_idx) > 1:
        # each block head stores the absolute docid, so within block b the true
        # value is cumsum[i] - cumsum[head_b - 1]; uint64 wraparound in both the
        # cumsum and the subtraction cancels (arithmetic mod 2^64).
        carry = doc_ids[head_idx[1:] - 1]
        block_sizes = np.diff(np.append(head_idx, n))
        offsets = np.repeat(np.concatenate(([np.uint64(0)], carry)), block_sizes)
        doc_ids = doc_ids - offsets
    tfs = _decode_stream(enc, enc.tfs_blob, enc.b_tf_nbytes).astype(np.uint32)
    dls = _decode_stream(enc, enc.dls_blob, enc.b_dl_nbytes).astype(np.uint32)
    return doc_ids, tfs, dls


@dataclass
class _ArrayEnc:
    """Shim standing in for :class:`EncodedPostings` behind an
    :class:`ArrayBlockReader` (callers read ``reader.enc.n_docs``)."""

    n_docs: int
    codec: str = "array"


class ArrayBlockReader:
    """BlockReader-compatible view over already-decoded, docid-sorted
    (docs, tfs, dls) arrays.

    The multi-shard query path merges each shard's sub-lists into one
    docid-ordered list; re-compressing that merge just so a BlockReader can
    decode it again cost more than the decode itself (encode ≈ 148 ms +
    re-decode ≈ 109 ms per 500 k postings).  This reader serves the same
    block interface straight from the arrays: block metadata (last_doc,
    max_tf, min_dl) comes from one ``reduceat`` pass, ``block``/``tail`` are
    zero-copy slices.  ``drop_decoded`` is a no-op — the arrays ARE the
    storage — so cache-eviction hooks may call it freely; eviction of the
    reader itself frees the memory."""

    def __init__(self, docs: np.ndarray, tfs: np.ndarray, dls: np.ndarray):
        n = int(len(docs))
        self.enc = _ArrayEnc(n_docs=n)
        self.n_blocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
        heads = np.arange(0, n, BLOCK_SIZE)
        if n:
            self.last_doc = np.ascontiguousarray(
                docs[np.minimum(heads + BLOCK_SIZE, n) - 1], dtype=np.uint64
            )
            self.max_tf = np.maximum.reduceat(tfs, heads).astype(np.uint32)
            self.min_dl = np.minimum.reduceat(dls, heads).astype(np.uint32)
        else:
            self.last_doc = np.empty(0, np.uint64)
            self.max_tf = np.empty(0, np.uint32)
            self.min_dl = np.empty(0, np.uint32)
        self._full = (
            np.ascontiguousarray(docs, dtype=np.uint64),
            np.ascontiguousarray(tfs, dtype=np.uint32),
            np.ascontiguousarray(dls, dtype=np.uint32),
        )
        self._docs_all = self._full[0]

    def drop_decoded(self) -> None:
        pass  # arrays are the storage; nothing cheaper to fall back to

    def block(self, k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        o = k * BLOCK_SIZE
        m = int(min(BLOCK_SIZE, self.enc.n_docs - o))
        d, t, l = self._full
        return d[o : o + m], t[o : o + m], l[o : o + m]

    def tail(self, k0: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        if self.n_blocks == 0 or k0 >= self.n_blocks:
            e = np.empty(0, dtype=np.uint64)
            return e, e.astype(np.uint32), e.astype(np.uint32)
        o = k0 * BLOCK_SIZE
        d, t, l = self._full
        return d[o:], t[o:], l[o:]

    def all_docs(self) -> np.ndarray:
        return self._docs_all


class BlockReader:
    """Lazy per-block access for WAND: decode a block only when needed."""

    def __init__(self, enc: EncodedPostings):
        self.enc = enc
        self.n_blocks = enc.n_blocks
        self.last_doc = np.frombuffer(enc.b_last_doc, dtype=np.uint64)
        self.max_tf = np.frombuffer(enc.b_max_tf, dtype=np.uint32)
        self.min_dl = np.frombuffer(enc.b_min_dl, dtype=np.uint32)
        dlen = np.frombuffer(enc.b_doc_nbytes, dtype=np.uint32).astype(np.int64)
        tlen = np.frombuffer(enc.b_tf_nbytes, dtype=np.uint32).astype(np.int64)
        llen = np.frombuffer(enc.b_dl_nbytes, dtype=np.uint32).astype(np.int64)
        self.doc_off = np.concatenate(([0], np.cumsum(dlen)))
        self.tf_off = np.concatenate(([0], np.cumsum(tlen)))
        self.dl_off = np.concatenate(([0], np.cumsum(llen)))
        self._docs_buf = np.frombuffer(enc.docs_blob, dtype=np.uint8)
        self._tfs_buf = np.frombuffer(enc.tfs_blob, dtype=np.uint8)
        self._dls_buf = np.frombuffer(enc.dls_blob, dtype=np.uint8)
        self._cache: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        self._docs_all: np.ndarray | None = None
        self._full: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None

    def drop_decoded(self) -> None:
        """Release every decoded-array cache this reader holds (the full
        three-stream decode ``tail()`` pins, the docs-only ``all_docs()``
        cache, and the per-block cache — whose entries may be VIEWS of the
        full decode and would otherwise keep it alive).  The compressed
        blobs stay; the next access re-decodes.  The query engine calls this
        when a term leaves its decoded-pin budget so long-lived engines hold
        a bounded number of decoded posting lists."""
        self._full = None
        self._docs_all = None
        self._cache.clear()

    def block(self, k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        got = self._cache.get(k)
        if got is not None:
            return got
        if self._full is not None:
            o = k * BLOCK_SIZE
            m = int(min(BLOCK_SIZE, self.enc.n_docs - o))
            d, t, l = self._full
            out = (d[o : o + m], t[o : o + m], l[o : o + m])
            self._cache[k] = out
            return out
        if self.enc.codec == "pfor":
            m = int(min(BLOCK_SIZE, self.enc.n_docs - k * BLOCK_SIZE))
            dec = pfor_decode_block
            deltas = dec(self._docs_buf[self.doc_off[k] : self.doc_off[k + 1]], m)
            tfs = dec(self._tfs_buf[self.tf_off[k] : self.tf_off[k + 1]], m).astype(np.uint32)
            dls = dec(self._dls_buf[self.dl_off[k] : self.dl_off[k + 1]], m).astype(np.uint32)
        else:
            deltas = varbyte_decode(self._docs_buf[self.doc_off[k] : self.doc_off[k + 1]])
            tfs = varbyte_decode(self._tfs_buf[self.tf_off[k] : self.tf_off[k + 1]]).astype(np.uint32)
            dls = varbyte_decode(self._dls_buf[self.dl_off[k] : self.dl_off[k + 1]]).astype(np.uint32)
        docs = np.cumsum(deltas, dtype=np.uint64)
        out = (docs, tfs, dls)
        self._cache[k] = out
        return out

    def tail(self, k0: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Blocks ``k0..`` of all three streams as (docs, tfs, dls), docs
        anchored per block exactly like :meth:`block`.

        The first call pays ONE vectorized full-list decode (cached on the
        reader; readers themselves sit in the engine's FIFO-capped term
        cache); every call — any ``k0`` — is then a zero-copy slice, because
        per-block doc anchoring makes the decoded stream position-independent.
        The WAND bulk-bail path concatenates thousands of tail blocks on
        frequent terms and must not pay a Python call per block."""
        if self.n_blocks == 0 or k0 >= self.n_blocks:
            e = np.empty(0, dtype=np.uint64)
            return e, e.astype(np.uint32), e.astype(np.uint32)
        if self._full is None:
            n = self.enc.n_docs
            sizes = np.full(self.n_blocks, BLOCK_SIZE, dtype=np.int64)
            sizes[-1] = n - (self.n_blocks - 1) * BLOCK_SIZE
            if self.enc.codec == "pfor":
                deltas = pfor_decode_stream(self._docs_buf, np.diff(self.doc_off), sizes)
                tfs = pfor_decode_stream(
                    self._tfs_buf, np.diff(self.tf_off), sizes
                ).astype(np.uint32)
                dls = pfor_decode_stream(
                    self._dls_buf, np.diff(self.dl_off), sizes
                ).astype(np.uint32)
            else:
                deltas = varbyte_decode(self._docs_buf, count=n)
                tfs = varbyte_decode(self._tfs_buf, count=n).astype(np.uint32)
                dls = varbyte_decode(self._dls_buf, count=n).astype(np.uint32)
            docs = np.cumsum(deltas, dtype=np.uint64)
            if self.n_blocks > 1:
                block_ends = np.cumsum(sizes)
                carry = docs[block_ends[:-1] - 1]
                docs[BLOCK_SIZE:] -= np.repeat(carry, sizes[1:])
            self._full = (docs, tfs, dls)
            if self._docs_all is None:
                self._docs_all = docs
        o = k0 * BLOCK_SIZE
        d, t, l = self._full
        return d[o:], t[o:], l[o:]

    def all_docs(self) -> np.ndarray:
        """All doc ids of this sub-list, decoding ONLY the docs stream
        (the tf/dl streams stay compressed), cached on the reader — the
        phrase/NEAR hot path calls :meth:`positions_map` once per query
        term and must not pay a full three-stream decode each time."""
        if self._docs_all is not None:
            return self._docs_all
        n = self.enc.n_docs
        if n == 0:
            self._docs_all = np.empty(0, dtype=np.uint64)
            return self._docs_all
        sizes = np.full(self.n_blocks, BLOCK_SIZE, dtype=np.int64)
        sizes[-1] = n - (self.n_blocks - 1) * BLOCK_SIZE
        if self.enc.codec == "pfor":
            deltas = pfor_decode_stream(self._docs_buf, np.diff(self.doc_off), sizes)
        else:
            deltas = varbyte_decode(self._docs_buf, count=n)
        # segmented cumsum: each block's deltas start from 0 (its first
        # value is the absolute doc id), matching block()'s per-block cumsum
        total = np.cumsum(deltas, dtype=np.uint64)
        if self.n_blocks > 1:
            block_ends = np.cumsum(sizes)
            carry = total[block_ends[:-1] - 1]
            total[BLOCK_SIZE:] -= np.repeat(carry, sizes[1:])
        self._docs_all = total
        return total

    def positions_map(self, wanted: np.ndarray) -> dict[int, np.ndarray]:
        """Token positions for the WANTED docids only (positional builds).

        The per-doc byte-length sidecar gives O(1) slice offsets; only the
        requested documents' position lists are varbyte-decoded — phrase
        verification over k candidates never touches the other postings'
        position bytes."""
        if not self.enc.pos_nbytes_blob:
            return {}
        lens = np.frombuffer(self.enc.pos_nbytes_blob, dtype=np.uint32).astype(np.int64)
        off = np.concatenate(([0], np.cumsum(lens)))
        docs = self.all_docs()
        buf = np.frombuffer(self.enc.pos_blob, dtype=np.uint8)
        idx = np.searchsorted(docs, np.asarray(wanted, dtype=np.uint64))
        out: dict[int, np.ndarray] = {}
        for w, i in zip(np.asarray(wanted, dtype=np.uint64), idx):
            if i < docs.size and docs[i] == w and lens[i]:
                out[int(w)] = np.cumsum(varbyte_decode(buf[off[i] : off[i + 1]]),
                                        dtype=np.uint64)
        return out
