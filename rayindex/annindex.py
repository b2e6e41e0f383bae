"""Persisted ANN artifacts (r4 VERDICT "Next round" #3).

Round 4's ``ann_lsh_topk`` / ``ann_ivf_topk`` recomputed signatures and
cell assignments from the raw embeddings on EVERY query — the right
streaming shape, but at serving scale those are build artifacts.  This
module writes them once and probes them:

- ``build_ann_index(sf_dir, out_dir)`` — one streaming pass over
  ``embeddings.parquet``: per vector a 256-bit SimHash signature (4×uint64
  columns), an IVF coarse-cell assignment, and an m-byte PQ code, written
  as parquet **hive-partitioned by cell** (so an IVF probe reads only the
  probed cells' files) plus a small ``meta.npz`` (centroids, PQ codebooks,
  true cell sizes, seeds).  The embedding itself rides along, making the
  index the self-contained clustered copy a 100 TB deployment would serve
  from.

- ``lsh_topk(index_dir, ...)`` — signature scan (32 B/vec instead of the
  4·dim-byte float payload) → binomial Hamming threshold → pruned read of
  ONLY the candidates' embeddings → exact cosine rerank.  Same planes /
  seed / threshold as the inline path, so the result is IDENTICAL
  (pinned by tests/test_annindex.py).

- ``ivf_topk(index_dir, ...)`` — probe cells in centroid-similarity order
  until the TRUE cell sizes (meta) cover ``coverage`` of the collection;
  exact-scan only the probed partitions; ADC-rescue the rest from the
  persisted PQ codes (m bytes/vec — no float payload) and exact-score the
  top ``rescue_frac`` of the estimates via one more pruned read.

Scale notes: candidate id sets on the driver are bounded by design
(``rerank_frac``/``rescue_frac`` of n); a multi-node serving tier would
push them down as per-partition semi-joins instead — documented here, not
needed at the bench envelope.  Pruned reads use parquet row-level filters
(cell partition pruning for IVF; vec_id ``isin`` for reranks).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .textops import _KMeans, _PQ, _binom_hamming_threshold

ANN_SEED = 99
ANN_PLANES = 256
_SAMPLE_ROWS = 4096


def _planes(n_planes: int, dim: int, seed: int = ANN_SEED) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def _pack_bits(bits: np.ndarray) -> np.ndarray:
    """(n, 256) bool → (n, 4) uint64 (little-endian bit order, consistent
    with _unpack on both the build and probe sides)."""
    return np.packbits(bits, axis=1, bitorder="little").view(np.uint64)


def _sig_cols(emb: np.ndarray, planes: np.ndarray) -> dict[str, np.ndarray]:
    packed = _pack_bits((emb @ planes.T) > 0)
    return {f"sig{i}": packed[:, i].copy() for i in range(packed.shape[1])}


def _hamming_to_query(t: pa.Table, qsig: np.ndarray) -> np.ndarray:
    """Vectorized popcount(sig XOR qsig) over the 4 uint64 signature cols."""
    n = t.num_rows
    words = np.empty((n, len(qsig)), dtype=np.uint64)
    for i in range(len(qsig)):
        words[:, i] = t.column(f"sig{i}").to_numpy()
    x = np.bitwise_xor(words, qsig[None, :])
    return np.unpackbits(x.view(np.uint8), axis=1).sum(axis=1)


def _load_sample(emb_path: str) -> np.ndarray:
    import pyarrow.parquet as pq_

    pf = pq_.ParquetFile(emb_path)
    parts, got = [], 0
    for rg in range(pf.metadata.num_row_groups):
        tt = pf.read_row_group(rg, columns=["embedding"])
        parts.append(tt)
        got += tt.num_rows
        if got >= _SAMPLE_ROWS:
            break
    sample = np.stack(
        pa.concat_tables(parts).slice(0, _SAMPLE_ROWS)
        .column("embedding").to_pandas().to_numpy()
    ).astype(np.float64)
    nrm = np.linalg.norm(sample, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    return sample / nrm


class _EncodeStage:
    """Build-side actor-pool stage: signature + cell + PQ code per vector.
    Heavy state (planes, centroids, codebooks) is built once in __init__
    from the broadcast meta, not per batch."""

    def __init__(self, centroids: np.ndarray, books: np.ndarray,
                 n_planes: int, seed: int):
        self.cent = centroids
        self.planes = _planes(n_planes, centroids.shape[1], seed)
        self.pq = _PQ.__new__(_PQ)
        self.pq.m = books.shape[0]
        self.pq.sub = books.shape[2]
        self.pq.books = [books[s] for s in range(books.shape[0])]

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = np.stack(batch.column("embedding").to_pandas().to_numpy()).astype(np.float64)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        nrm = emb / norms
        cols: dict[str, object] = {"vec_id": batch.column("vec_id").cast(pa.int64())}
        for k, v in _sig_cols(emb, self.planes).items():
            cols[k] = pa.array(v, pa.uint64())
        cols["cell"] = pa.array(
            np.argmax(nrm @ self.cent.T, axis=1).astype(np.int64), pa.int64()
        )
        codes = self.pq.encode(nrm)
        cols["pq"] = pa.array([row.tobytes() for row in codes], pa.binary())
        cols["embedding"] = batch.column("embedding")
        return pa.table(cols)


def build_ann_index(sf_dir: str, out_dir: str, *, n_planes: int = ANN_PLANES,
                    n_clusters: int | None = None, seed: int = ANN_SEED) -> str:
    """One streaming pass over ``{sf_dir}/embeddings.parquet`` → persisted
    ANN index at ``out_dir`` (vectors/ partitioned by cell + meta.npz).
    Returns ``out_dir``.  Deterministic for a given input + seeds."""
    import pyarrow.parquet as pq_

    emb_path = f"{sf_dir}/embeddings.parquet"
    n_vecs = pq_.ParquetFile(emb_path).metadata.num_rows
    if n_clusters is None:
        n_clusters = max(8, min(256, int(3 * np.sqrt(n_vecs))))
    sample = _load_sample(emb_path)
    km = _KMeans(sample, n_clusters, iters=25)
    pq = _PQ(sample)
    books = np.stack(pq.books)

    os.makedirs(out_dir, exist_ok=True)
    stage = _EncodeStage(km.centroids, books, n_planes, seed)
    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"]).map_batches(
        stage, batch_format="pyarrow", zero_copy_batch=True
    )
    vec_dir = os.path.join(out_dir, "vectors")
    ds.write_parquet(vec_dir, partition_cols=["cell"])

    # true cell sizes from the written layout's footers (no re-scan)
    sizes = np.zeros(n_clusters, dtype=np.int64)
    agg = (
        rd.read_parquet(vec_dir, columns=["cell"])
        .groupby("cell").count().to_pandas()
    )
    for _, row in agg.iterrows():
        sizes[int(row["cell"])] = int(row["count()"])
    np.savez(
        os.path.join(out_dir, "meta.npz"),
        centroids=km.centroids, books=books, cell_sizes=sizes,
        n_planes=np.int64(n_planes), seed=np.int64(seed),
        n_vecs=np.int64(n_vecs), pq_m=np.int64(pq.m), pq_sub=np.int64(pq.sub),
    )
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({"n_vecs": int(n_vecs), "n_clusters": int(n_clusters),
                   "n_planes": int(n_planes), "seed": int(seed),
                   "source": emb_path}, f)
    return out_dir


def _load_meta(index_dir: str) -> dict:
    z = np.load(os.path.join(index_dir, "meta.npz"))
    return {k: z[k] for k in z.files}


def _query_vec(index_dir: str, query_vec_id: int) -> np.ndarray | None:
    t = rd.read_parquet(
        os.path.join(index_dir, "vectors"), columns=["vec_id", "embedding"],
        filter=(pc.field("vec_id") == query_vec_id),
    ).take_all()
    if not t:
        return None
    return np.array(t[0]["embedding"], dtype=np.float64)


def _exact_rerank(index_dir: str, cand_ids: np.ndarray, qn: np.ndarray,
                  k: int) -> pd.DataFrame:
    """Pruned read of ONLY the candidate embeddings → exact cosine →
    batch-local top-k → driver merge (O(batches × k) rows)."""

    def score(t: pa.Table) -> pa.Table:
        emb = np.stack(t.column("embedding").to_pandas().to_numpy()).astype(np.float64)
        ids = t.column("vec_id").cast(pa.int64()).to_numpy()
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1.0
        cos = (emb @ qn) / norms
        top = np.lexsort((ids, -cos))[:k]
        return pa.table({"vec_id": pa.array(ids[top], pa.int64()),
                         "cos": pa.array(cos[top], pa.float64())})

    got = (
        rd.read_parquet(
            os.path.join(index_dir, "vectors"), columns=["vec_id", "embedding"],
            filter=pc.field("vec_id").isin(pa.array(cand_ids, pa.int64())),
        )
        .map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    return got.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)


def lsh_topk(index_dir: str, k: int = 10, query_vec_id: int = 0,
             rerank_frac: float = 0.2, with_stats: bool = False):
    """SimHash ANN over the PERSISTED signatures: scan 32 B/vec, admit
    candidates by the binomial Hamming threshold, exact-rerank only those.
    Identical planes/threshold to ``textops.ann_lsh_topk`` → identical
    result (pinned by tests)."""
    meta = _load_meta(index_dir)
    n_planes = int(meta["n_planes"])
    q = _query_vec(index_dir, query_vec_id)
    empty = pd.DataFrame({"rank": pd.Series(dtype="int64"),
                          "vec_id": pd.Series(dtype="int64")})
    if q is None:
        return (empty, {"probed": 0, "scanned": 0, "probed_fraction": 0.0}) \
            if with_stats else empty
    planes = _planes(n_planes, q.shape[0], int(meta["seed"]))
    qn = q / np.linalg.norm(q)
    qsig = _pack_bits(((planes @ qn) > 0)[None, :])[0]
    threshold = _binom_hamming_threshold(n_planes, rerank_frac)
    sig_cols = [f"sig{i}" for i in range(len(qsig))]

    def probe(t: pa.Table) -> pa.Table:
        ham = _hamming_to_query(t, qsig)
        keep = ham <= threshold
        ids = t.column("vec_id").to_numpy()[keep]
        return pa.table({"vec_id": pa.array(ids, pa.int64())})

    # the signature scan never touches the float payload
    cands_df = (
        rd.read_parquet(os.path.join(index_dir, "vectors"),
                        columns=["vec_id", *sig_cols])
        .map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    cand_ids = cands_df["vec_id"].to_numpy(dtype=np.int64)
    scanned = int(meta["n_vecs"])
    probed = len(cand_ids)
    if probed == 0:
        out = empty
    else:
        got = _exact_rerank(index_dir, cand_ids, qn, k)
        out = pd.DataFrame({"vec_id": got["vec_id"].astype("int64").to_numpy()})
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        out = out[["rank", "vec_id"]]
    if with_stats:
        return out, {"probed": probed, "scanned": scanned,
                     "probed_fraction": probed / max(1, scanned)}
    return out


def ivf_topk(index_dir: str, k: int = 10, query_vec_id: int = 0,
             coverage: float = 0.3, rescue_frac: float = 0.05,
             with_stats: bool = False):
    """IVF ANN over the PERSISTED layout: probe cells chosen from the TRUE
    cell-size manifest, exact-scan only the probed partitions, ADC-rescue
    the rest from the persisted PQ codes."""
    meta = _load_meta(index_dir)
    cent = meta["centroids"]
    sizes = meta["cell_sizes"]
    n_vecs = int(meta["n_vecs"])
    q = _query_vec(index_dir, query_vec_id)
    empty = pd.DataFrame({"rank": pd.Series(dtype="int64"),
                          "vec_id": pd.Series(dtype="int64")})
    if q is None:
        return (empty, {"probed": 0, "scanned": 0, "probed_fraction": 0.0}) \
            if with_stats else empty
    qn = q / np.linalg.norm(q)
    order = np.argsort(-(cent @ qn))
    probe, cum = [], 0
    for c in order:
        if cum >= coverage * n_vecs:
            break
        probe.append(int(c))
        cum += int(sizes[c])
    vec_dir = os.path.join(index_dir, "vectors")
    # directory-level partition pruning: hand read_parquet exactly the
    # probed cells' hive directories (a filter on the hive column would
    # also prune, but Ray's fragment sampler resolves filters against the
    # physical file schema, which lacks the partition column)
    cell_dirs = {
        int(d.split("=", 1)[1]): os.path.join(vec_dir, d)
        for d in os.listdir(vec_dir) if d.startswith("cell=")
    }
    probe_set = set(probe)

    def _files(dirs: list[str]) -> list[str]:
        return [os.path.join(d, f) for d in dirs for f in sorted(os.listdir(d))
                if f.endswith(".parquet")]

    probed_paths = _files([p for c, p in sorted(cell_dirs.items()) if c in probe_set])
    unprobed_paths = _files([p for c, p in sorted(cell_dirs.items()) if c not in probe_set])

    def score(t: pa.Table) -> pa.Table:
        emb = np.stack(t.column("embedding").to_pandas().to_numpy()).astype(np.float64)
        ids = t.column("vec_id").cast(pa.int64()).to_numpy()
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1.0
        cos = (emb @ qn) / norms
        top = np.lexsort((ids, -cos))[:k]
        return pa.table({"vec_id": pa.array(ids[top], pa.int64()),
                         "cos": pa.array(cos[top], pa.float64())})

    # exact scan of ONLY the probed partitions
    if probed_paths:
        exact = (
            rd.read_parquet(probed_paths, columns=["vec_id", "embedding"])
            .map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
            .to_pandas()
        )
    else:
        exact = pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                              "cos": pd.Series(dtype="float64")})
    n_in_probe = int(np.sum(sizes[probe])) if probe else 0

    # ADC rescue over the UNPROBED cells' codes (m bytes/vec, no floats)
    pq = _PQ.__new__(_PQ)
    books = meta["books"]
    pq.m, pq.sub = int(meta["pq_m"]), int(meta["pq_sub"])
    pq.books = [books[s] for s in range(books.shape[0])]
    n_rescue_total = int(np.ceil(rescue_frac * n_vecs))

    def est(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").cast(pa.int64()).to_numpy()
        codes = np.frombuffer(
            b"".join(t.column("pq").to_pylist()), dtype=np.uint8
        ).reshape(len(ids), pq.m)
        e = pq.estimate_from_codes(codes, qn)
        # batch-local frac-top keeps the driver-side candidate stream
        # bounded (Σ ceil(frac·batch) ≈ frac·n, never batches × frac·n)
        n_local = int(np.ceil(rescue_frac * len(ids)))
        top = np.lexsort((ids, -e))[:n_local]
        return pa.table({"vec_id": pa.array(ids[top], pa.int64()),
                         "est": pa.array(e[top], pa.float64())})

    rescue_ids = np.array([], dtype=np.int64)
    if n_rescue_total and unprobed_paths:
        est_df = (
            rd.read_parquet(unprobed_paths, columns=["vec_id", "pq"])
            .map_batches(est, batch_format="pyarrow", zero_copy_batch=True)
            .to_pandas()
        )
        est_df = est_df.sort_values(["est", "vec_id"], ascending=[False, True])
        rescue_ids = est_df["vec_id"].to_numpy(dtype=np.int64)[:n_rescue_total]

    parts = [exact]
    if len(rescue_ids):
        parts.append(_exact_rerank(index_dir, rescue_ids, qn, k))
    got = pd.concat(parts, ignore_index=True)
    got = got.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
    out = pd.DataFrame({"vec_id": got["vec_id"].astype("int64").to_numpy()})
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    out = out[["rank", "vec_id"]]
    probed = n_in_probe + len(rescue_ids)
    if with_stats:
        return out, {"probed": probed, "scanned": n_vecs,
                     "probed_fraction": probed / max(1, n_vecs)}
    return out
