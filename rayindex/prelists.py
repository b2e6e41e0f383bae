"""Impact-ordered prelists for head terms (r4 VERDICT "Next round" #4).

The one query shape that falls over at deployment scale is a PURE
dense-term ranked query: WAND has no upper-bound escape when every
matching list is dense (measured honestly in round 4: 4.1-4.7 s for bm25
on the df≈12.8M flagship term at 20M docs; 14.8 s cold).  The classical
fix (Persin et al. 1996 / impact-sorted indexes) is a build-time
artifact: for every term whose df exceeds a threshold, persist its
postings' top-``n_top`` entries ordered by the term's exact BM25
contribution (score desc, doc_id asc — the engine's ranking order), so a
single-dense-term top-k is served by reading k rows instead of decoding
millions.

Exactness: the stored order is computed with the SAME contribution
formula, (k1, b), avgdl, n_docs and df the engine uses, so for a
single-term query the first k live entries of the prelist ARE the
exhaustive top-k (rank identity is pinned by tests and re-verified per
bench run).  The engine refuses the artifact when anything it depends on
has drifted — different (k1, b), changed shard stats, or active
tombstone sites (purges change avgdl) — and falls back to the full path.

Distributed build shape: one filtered ``read_parquet`` over every
shard's segment files (predicate pushdown on the head-term set) → a
``map_batches`` decode stage emitting each sub-list chunk's LOCAL
top-``n_top`` (chunks partition the docid space, so the global top-n is
the top-n of the union of chunk top-ns) → one vocabulary-bounded
``groupby(term).map_groups`` merge → parquet.  Nothing driver-side
except the head-term list (Zipf head: tens to hundreds of terms).
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

PRELIST_DIRNAME = "prelists"
DEFAULT_N_TOP = 4096


def _shard_stats(index_root: str) -> tuple[int, int, list[str]]:
    from .segments import list_shards

    shard_dirs = list_shards(index_root)
    n_docs = total_tf = 0
    for d in shard_dirs:
        with open(os.path.join(d, "stats.json")) as f:
            s = json.load(f)
        n_docs += int(s["n_docs"])
        total_tf += int(s["total_tf"])
    return n_docs, total_tf, shard_dirs


def head_terms(index_root: str, df_threshold: int) -> pd.DataFrame:
    """(term, df) for every term with global df ≥ threshold — one
    distributed scan of the hive-partitioned term_stats dictionaries."""
    from .segments import expand_parquet_paths, list_shards

    stat_dirs = [os.path.join(d, "term_stats") for d in list_shards(index_root)
                 if os.path.isdir(os.path.join(d, "term_stats"))]
    if not stat_dirs:
        return pd.DataFrame({"term": pd.Series(dtype=str),
                             "df": pd.Series(dtype="int64")})
    from ray.data.aggregate import Sum

    agg = (
        rd.read_parquet(expand_parquet_paths(stat_dirs), columns=["term", "df"])
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
        .filter(expr=f"df >= {int(df_threshold)}")
        .to_pandas()
    )
    if "df" not in agg.columns:  # nothing above threshold → schema-less empty
        return pd.DataFrame({"term": pd.Series(dtype=str),
                             "df": pd.Series(dtype="int64")})
    return agg.sort_values(["df", "term"], ascending=[False, True]).reset_index(drop=True)


def build_prelists(index_root: str, *, df_threshold: int | None = None,
                   n_top: int = DEFAULT_N_TOP, k1: float = 1.2,
                   b: float = 0.75) -> dict:
    """Write ``{index_root}/prelists/`` (parquet + meta.json).  Returns a
    summary dict.  Deterministic for a given index state."""
    from .codec import decode_postings
    from .segments import expand_parquet_paths, row_to_encoded

    n_docs, total_tf, shard_dirs = _shard_stats(index_root)
    avgdl = (total_tf / n_docs) if n_docs else 0.0
    if df_threshold is None:
        # the Zipf head: terms in ≥ 5 % of documents (the flagship dense
        # term sits at ~64 %); everything below is already WAND-prunable
        df_threshold = max(1024, n_docs // 20)
    heads = head_terms(index_root, df_threshold)
    out_dir = os.path.join(index_root, PRELIST_DIRNAME)
    os.makedirs(out_dir, exist_ok=True)
    summary = {"n_terms": int(len(heads)), "df_threshold": int(df_threshold),
               "n_top": int(n_top), "k1": k1, "b": b, "avgdl": avgdl,
               "n_docs": int(n_docs), "total_tf": int(total_tf)}
    if not len(heads):
        with open(os.path.join(out_dir, "meta.json"), "w") as f:
            json.dump(summary, f)
        return summary
    dfs = dict(zip(heads["term"], heads["df"].astype(int)))
    terms_arr = pa.array(sorted(dfs), pa.string())
    seg_dirs = [os.path.join(d, "segments") for d in shard_dirs
                if os.path.isdir(os.path.join(d, "segments"))]
    kk1, bb = float(k1), float(b)

    def idf_of(df: int) -> float:
        return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

    def chunk_top(t: pa.Table) -> pa.Table:
        """Decode each head-term sub-list chunk, emit its local impact
        top-``n_top`` (exploded, one row per surviving posting)."""
        if t.num_rows == 0 or "term" not in t.schema.names:
            return pa.table({"term": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.uint64()),
                             "tf": pa.array([], pa.int64()),
                             "dl": pa.array([], pa.int64()),
                             "contrib": pa.array([], pa.float64())})
        if "kind" in t.schema.names:
            t = t.filter(pc.equal(t.column("kind"), "seg"))
        empty = pa.table({"term": pa.array([], pa.string()),
                          "doc_id": pa.array([], pa.uint64()),
                          "tf": pa.array([], pa.int64()),
                          "dl": pa.array([], pa.int64()),
                          "contrib": pa.array([], pa.float64())})
        if t.num_rows == 0:  # e.g. a batch of colocated partial-df rows
            return empty
        outs = {"term": [], "doc_id": [], "tf": [], "dl": [], "contrib": []}
        for row in t.to_pylist():
            term = row["term"]
            docs, tfs, dls = decode_postings(row_to_encoded(row))
            tfv = tfs.astype(np.float64)
            dlv = dls.astype(np.float64)
            idf = idf_of(dfs[term])
            contrib = idf * (tfv * (kk1 + 1.0)) / (
                tfv + kk1 * (1.0 - bb + bb * dlv / avgdl))
            top = np.lexsort((docs, -contrib))[:n_top]
            outs["term"].append(np.repeat(term, len(top)))
            outs["doc_id"].append(docs[top].astype(np.uint64))
            outs["tf"].append(tfs[top].astype(np.int64))
            outs["dl"].append(dls[top].astype(np.int64))
            outs["contrib"].append(contrib[top])
        return pa.table({
            "term": pa.array(np.concatenate(outs["term"]), pa.string()),
            "doc_id": pa.array(np.concatenate(outs["doc_id"]), pa.uint64()),
            "tf": pa.array(np.concatenate(outs["tf"]), pa.int64()),
            "dl": pa.array(np.concatenate(outs["dl"]), pa.int64()),
            "contrib": pa.array(np.concatenate(outs["contrib"]), pa.float64()),
        })

    def merge_term(g: pd.DataFrame) -> pa.Table:
        """Per-term merge of the chunk-local tops → the global impact order
        (contrib desc, doc asc), truncated to n_top.  Emits explicit Arrow
        list columns (NOT numpy arrays inside a pandas block — Ray would
        wrap those in its tensor extension type, which plain pyarrow can't
        read back)."""
        order = np.lexsort((g["doc_id"].to_numpy(), -g["contrib"].to_numpy()))[:n_top]
        term = str(g["term"].iloc[0])
        return pa.table({
            "term": pa.array([term], pa.string()),
            "df": pa.array([dfs[term]], pa.int64()),
            "doc_ids": pa.array(
                [g["doc_id"].to_numpy(dtype=np.uint64)[order].tolist()],
                pa.list_(pa.uint64())),
            "tfs": pa.array([g["tf"].to_numpy(dtype=np.int64)[order].tolist()],
                            pa.list_(pa.int64())),
            "dls": pa.array([g["dl"].to_numpy(dtype=np.int64)[order].tolist()],
                            pa.list_(pa.int64())),
        })

    ds = (
        rd.read_parquet(
            expand_parquet_paths(seg_dirs),
            filter=pc.field("term").isin(terms_arr),
        )
        .map_batches(chunk_top, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .map_groups(merge_term, batch_format="pandas")
        # the groupby's hash shuffle emits schema-less EMPTY partitions
        # (rayindex.joins docstring); consolidate so the parquet sink never
        # writes 0-column fragments that would poison read_prelist's
        # dataset-schema inference
        .repartition(2)
    )
    lists_dir = os.path.join(out_dir, "lists")
    if os.path.isdir(lists_dir):  # idempotent rebuild: never mix generations
        import shutil

        shutil.rmtree(lists_dir)
    ds.write_parquet(lists_dir)
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(summary, f)
    return summary


def load_meta(index_root: str) -> dict | None:
    p = os.path.join(index_root, PRELIST_DIRNAME, "meta.json")
    if not os.path.isfile(p):
        return None
    with open(p) as f:
        return json.load(f)


def read_prelist(index_root: str, term: str):
    """(doc_ids, tfs, dls, df) for one term, in stored impact order — a
    filtered parquet read (row-group pruning on the term column), or None."""
    import pyarrow.dataset as pads

    d = os.path.join(index_root, PRELIST_DIRNAME, "lists")
    if not os.path.isdir(d):
        return None
    t = pads.dataset(d, format="parquet").to_table(
        filter=pc.field("term") == term
    )
    if t.num_rows == 0:
        return None
    row = t.to_pylist()[0]
    return (np.array(row["doc_ids"], dtype=np.uint64),
            np.array(row["tfs"], dtype=np.int64),
            np.array(row["dls"], dtype=np.int64),
            int(row["df"]))
