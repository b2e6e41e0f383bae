"""Training-data operators: dedup family, text analysis, ANN (SURVEY.md
"beyond the reference" ops), verified against brute-force / DuckDB."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def mini_sf(tmp_path_factory):
    """A tiny sf-dir with documents (incl. planted near-dups) + embeddings."""
    root = tmp_path_factory.mktemp("mini_sf")
    rng0 = np.random.default_rng(5)
    texts = []
    for i in range(40):
        # mostly-unique word streams so only the planted pairs are near-dups
        words = ["the quick brown fox".split()[i % 4]] + [
            f"w{i}x{j}y{int(rng0.integers(0, 1000))}" for j in range(18)
        ]
        texts.append(" ".join(words))
    texts[10] = texts[3]  # exact dup of doc 3
    texts[20] = texts[5] + " tiny"  # near dup of doc 5
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(40)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 40, pa.string()),
            "source": pa.array([f"src{i % 4}" for i in range(40)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, str(root / "documents.parquet"))
    rng = np.random.default_rng(11)
    emb = rng.standard_normal((60, 64)).astype(np.float32)
    emb[7] = emb[0] * 2.0  # same direction as vec 0 → top neighbor
    etab = pa.table(
        {
            "vec_id": pa.array(list(range(60)), pa.int64()),
            "embedding": pa.array([e.tolist() for e in emb], pa.list_(pa.float32())),
            "label": pa.array([0] * 60, pa.int32()),
        }
    )
    pq.write_table(etab, str(root / "embeddings.parquet"))
    return str(root)


def test_term_df_vs_duckdb(ray_session, mini_sf):
    import duckdb

    from rayindex.textops import term_df

    got = term_df(mini_sf).to_pandas().sort_values("term").reset_index(drop=True)
    want = duckdb.sql(
        "WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(regexp_replace("
        f"lower(text), '[^a-z0-9]', ' ', 'g')), ' +')) AS term FROM read_parquet('{mini_sf}/documents.parquet')) "
        "SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM toks "
        "WHERE term <> '' AND term NOT IN ('a','an','the','and','of','in','to','is','on','at','by','for','with') "
        "GROUP BY term ORDER BY term"
    ).fetchdf()
    assert got["term"].tolist() == want["term"].tolist()
    assert got["df"].tolist() == want["df"].tolist()


def test_dedup_exact_finds_planted_dup(ray_session, mini_sf):
    from rayindex.textops import dedup_exact

    got = dedup_exact(mini_sf).to_pandas()
    assert len(got) == 39  # 40 docs, one exact dup collapsed
    assert 3 in set(got["doc_id"]) and 10 not in set(got["doc_id"])


def test_minhash_lsh_finds_near_dups(ray_session, mini_sf):
    from rayindex.textops import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(mini_sf)
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (3, 10) in got  # exact dup
    assert (5, 20) in got  # near dup
    # docs sharing only the base sentence shouldn't all pair up
    assert len(got) < 200


def test_simhash_properties(ray_session, mini_sf):
    from rayindex.textops import simhash

    got = simhash(mini_sf).to_pandas().set_index("doc_id")["simhash"]
    assert got[3] == got[10]  # identical text → identical hash
    ham = bin((int(got[5]) ^ int(got[20])) & ((1 << 64) - 1)).count("1")
    assert ham <= 8  # near dup → small Hamming distance
    far = bin((int(got[0]) ^ int(got[33])) & ((1 << 64) - 1)).count("1")
    assert far >= ham


def test_ann_exact_topk(ray_session, mini_sf):
    from rayindex.textops import ann_cosine_topk

    got = ann_cosine_topk(mini_sf, k=5)
    # brute force with numpy
    t = pq.read_table(f"{mini_sf}/embeddings.parquet")
    emb = np.stack(t.column("embedding").to_pandas().to_numpy()).astype(np.float64)
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    q = emb[0]
    scores = emb @ q
    want = np.lexsort((np.arange(len(scores)), -scores))[:5]
    assert got["vec_id"].tolist() == want.tolist()
    assert got["vec_id"].tolist()[0] in (0, 7)  # vec 7 is collinear with 0


def test_ann_lsh_recall(ray_session, mini_sf):
    from rayindex.textops import ann_cosine_topk, ann_lsh_topk

    exact = set(ann_cosine_topk(mini_sf, k=5)["vec_id"])
    approx, stats = ann_lsh_topk(mini_sf, k=5, with_stats=True)
    approx = set(approx["vec_id"])
    # SimHash-threshold rerank: recall ≥ 0.8 at a probed fraction ≤ 50 %
    assert len(exact & approx) >= 4
    assert stats["probed_fraction"] <= 0.5
    assert stats["scanned"] == 60  # every vector's signature was consulted


def test_quality_and_lang_signals(ray_session, mini_sf):
    from rayindex.textops import lang_signals, quality_signals

    q = quality_signals(mini_sf).to_pandas().set_index("doc_id")
    assert int(q.loc[3, "n_tokens"]) == len(
        pq.read_table(f"{mini_sf}/documents.parquet")["text"][3].as_py().split()
    )
    # docs with i % 4 == 0 start with 'the' (a stopword); others have none
    assert int(q.loc[0, "n_stopwords"]) == 1
    assert int(q.loc[1, "n_stopwords"]) == 0
    l = lang_signals(mini_sf).to_pandas()
    assert (l["pred_lang"] == "en").all()
    assert (l["n_cyrillic"] == 0).all()


def test_media_stages(ray_session, mini_sf):
    from rayindex.multimodal import media_features, media_frames, media_meta

    meta = media_meta(mini_sf).to_pandas().set_index("media_id")
    assert set(meta["kind"]) == {"image", "audio", "video"}
    img = meta[meta["kind"] == "image"]
    assert (img["width"] >= 16).all() and (img["channels"] == 3).all()
    aud = meta[meta["kind"] == "audio"]
    assert (aud["sample_rate"] == 16000).all()
    assert (aud["n_samples"] == aud["n_bytes"] * 4).all()

    frames = media_frames(mini_sf).to_pandas()
    assert set(frames["media_id"]) <= set(meta[meta["kind"] == "video"].index)
    assert (frames["frame_id"] % 8 == 0).all()

    feats = media_features(mini_sf).to_pandas()
    assert len(feats) == 40 * 16  # long format: one row per (media, dim)
    assert ((feats["value"] >= 0) & (feats["value"] < 1)).all()
    # determinism: identical payloads (docs 3 and 10) → identical features
    f3 = feats[feats["media_id"] == 3].sort_values("dim_id")["value"].to_numpy()
    f10 = feats[feats["media_id"] == 10].sort_values("dim_id")["value"].to_numpy()
    assert np.array_equal(f3, f10)


def test_embedding_near_dup(ray_session, mini_sf):
    from rayindex.textops import embedding_near_dup

    pairs = embedding_near_dup(mini_sf, tau=0.9)
    got = set(zip(pairs["vec_id_a"], pairs["vec_id_b"]))
    assert (0, 7) in got  # planted collinear pair
    # brute-force cross-check at the same tau
    t = pq.read_table(f"{mini_sf}/embeddings.parquet")
    emb = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    cos = emb @ emb.T
    iu = np.triu_indices(len(emb), k=1)
    want = {(int(a), int(b)) for a, b in zip(iu[0], iu[1]) if cos[a, b] >= 0.9}
    assert got == want


def test_embedding_near_dup_lsh_path(ray_session, mini_sf):
    """Forced LSH path: planted collinear pair found; result ⊆ exact pairs."""
    from rayindex.textops import embedding_near_dup

    exact = embedding_near_dup(mini_sf, tau=0.9, method="exact")
    lsh = embedding_near_dup(mini_sf, tau=0.9, method="lsh")
    se = set(zip(exact["vec_id_a"], exact["vec_id_b"]))
    sl = set(zip(lsh["vec_id_a"], lsh["vec_id_b"]))
    assert sl <= se  # in-bucket verify is exact → no false positives
    assert (0, 7) in sl  # collinear pair collides in every band


def test_dedup_near_clusters_transitive(ray_session, mini_sf):
    """Clusters = transitive closure of pairs; winner = min id; singletons
    map to themselves."""
    from rayindex.textops import dedup_near_clusters, embedding_near_dup

    tau = 0.3
    out = dedup_near_clusters(mini_sf, tau=tau)
    assert len(out) == 60 and (out["cluster_id"] <= out["vec_id"]).all()
    pairs = embedding_near_dup(mini_sf, tau=tau)
    # brute-force union-find over the same pairs
    parent = {i: i for i in range(60)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["vec_id_a"], pairs["vec_id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in range(60)}
    got = dict(zip(out["vec_id"], out["cluster_id"]))
    assert got == want


def test_cosine_topk_boundary_ties(ray_session, tmp_path):
    """Tied scores at the k-th boundary keep the SMALLER vec_id, even when
    the tie spans a batch's local top-k cut (review regression)."""
    import pandas as pd

    from rayindex.textops import ann_cosine_topk

    root = tmp_path / "ties"
    root.mkdir()
    n, dim = 30, 8
    q = np.zeros(dim, dtype=np.float32)
    q[0] = 1.0
    emb = np.tile(q, (n, 1))  # every vector identical → all scores tie at 1.0
    etab = pa.table(
        {
            "vec_id": pa.array(list(range(n)), pa.int64()),
            "embedding": pa.array([e.tolist() for e in emb], pa.list_(pa.float32())),
            "label": pa.array([0] * n, pa.int32()),
        }
    )
    pq.write_table(etab, str(root / "embeddings.parquet"))
    got = ann_cosine_topk(str(root), k=10)
    assert got["vec_id"].tolist() == list(range(10))  # smallest ids win ties


def test_dedup_corpus_applies_winners(ray_session, mini_sf):
    """The hash-join apply step keeps exactly the min-id winner rows."""
    from rayindex.textops import dedup_corpus

    kept = dedup_corpus(mini_sf).to_pandas()
    assert len(kept) == 39  # 40 docs, one exact dup (doc 10 = doc 3) removed
    ids = set(kept["doc_id"])
    assert 3 in ids and 10 not in ids
    assert set(kept.columns) == {"doc_id", "source", "n_chars"}


def test_dedup_corpus_writes_partitioned(ray_session, mini_sf, tmp_path):
    import os

    from rayindex.textops import dedup_corpus

    out = str(tmp_path / "deduped")
    dedup_corpus(mini_sf, out_dir=out)
    parts = [d for d in os.listdir(out) if d.startswith("source=")]
    assert len(parts) == 4  # one resumable partition per source shard


def test_ann_ivf_recall(ray_session, mini_sf):
    from rayindex.textops import ann_cosine_topk, ann_ivf_topk

    exact = set(ann_cosine_topk(mini_sf, k=5)["vec_id"])
    approx, stats = ann_ivf_topk(mini_sf, k=5, with_stats=True)
    approx = set(approx["vec_id"])
    # IVF + ADC rescue: recall ≥ 0.8 at a probed fraction ≤ 50 %
    assert len(exact & approx) >= 4
    assert stats["probed_fraction"] <= 0.5
    # the collinear planted neighbor must survive probing
    assert 0 in approx or 7 in approx
