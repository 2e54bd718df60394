"""Relational ops, text ops, dedup family, similarity, multimodal plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def ds_of(d: dict) -> rd.Dataset:
    return rd.from_arrow(pa.table(d))


def test_keep_first_and_topk():
    from raylink.ops import keep_first, top_k

    ds = ds_of({"k": [1, 1, 2], "o": [5, 3, 9], "v": ["a", "b", "c"]})
    out = keep_first(ds, ["k"], ["o"]).to_pandas().sort_values("k")
    assert out["v"].tolist() == ["b", "c"]
    top = top_k(ds, [("o", True)], 2).to_pandas()
    assert top["o"].tolist() == [9, 5]


def test_grouped_mode_tiebreak():
    from raylink.ops import grouped_mode

    ds = ds_of({"g": [1, 1, 1, 2, 2], "v": ["b", "a", "b", "z", "a"]})
    out = grouped_mode(ds, "g", "v", "m").to_pandas().sort_values("g")
    assert out["m"].tolist() == ["b", "a"]  # count wins; tie -> min value


def test_distinct_count_and_degrees():
    from raylink.ops import degree_table, distinct_count

    ds = ds_of({"g": ["x", "x", "y"], "v": [1, 1, 2]})
    out = distinct_count(ds, "g", "v", "n").to_pandas().sort_values("g")
    assert out["n"].tolist() == [1, 1]
    edges = ds_of({"src": [1, 1, 2], "dst": [2, 3, 3]})
    deg = degree_table(edges).to_pandas().set_index("v").sort_index()
    assert deg.loc[1, "out_deg"] == 2 and deg.loc[3, "in_deg"] == 2


def test_transition_edges_dedup():
    from raylink.ops import transition_edges

    ev = ds_of({"event_id": [0, 1, 2, 3, 4], "user_id": [7, 7, 8, 7, 8]})
    out = transition_edges(ev).to_pandas()
    got = sorted(map(tuple, out[["src", "dst"]].values.tolist()))
    assert got == [(7, 8), (8, 7)]


def test_transition_and_dedup_exchange_match_dataset_paths(monkeypatch):
    """The round-5 session-3 exchange rewrites of transition_edges and
    dedup_edges produce exactly the Dataset sort-shuffle paths' rows —
    including chunk-boundary mirroring (tiny chunk), id gaps, string
    keys, and the weighted distinct=False variant."""
    from raylink.graph import dedup_edges
    from raylink.ops import transition_edges

    rng = np.random.RandomState(3)
    ids = np.sort(rng.choice(np.arange(500), size=300, replace=False))
    ev = rd.from_pandas(pd.DataFrame({
        "event_id": ids.astype(np.int64),
        "user_id": np.array([f"u{v}" for v in rng.randint(0, 12, 300)],
                            dtype=object),
        "val": rng.randint(1, 5, 300).astype(np.int64),
    })).repartition(5)

    def rows(ds, cols):
        return sorted(map(tuple, ds.to_pandas()[cols].values.tolist()))

    a1 = rows(transition_edges(ev, chunk=16), ["src", "dst"])
    a2 = rows(transition_edges(ev, chunk=16, distinct=False,
                               value_col="val"), ["src", "dst", "w"])
    eds = rd.from_pandas(pd.DataFrame({
        "src": np.array([f"u{v}" for v in rng.randint(0, 9, 400)],
                        dtype=object),
        "dst": np.array([f"u{v}" for v in rng.randint(0, 9, 400)],
                        dtype=object)})).repartition(4)
    a3 = rows(dedup_edges(eds), ["src", "dst"])

    monkeypatch.setenv("RAYLINK_TRANSITION_EXCHANGE", "dataset")
    monkeypatch.setenv("RAYLINK_EDGEDEDUP_EXCHANGE", "dataset")
    b1 = rows(transition_edges(ev, chunk=16), ["src", "dst"])
    b2 = rows(transition_edges(ev, chunk=16, distinct=False,
                               value_col="val"), ["src", "dst", "w"])
    b3 = rows(dedup_edges(eds), ["src", "dst"])
    assert a1 == b1
    assert a2 == b2
    assert a3 == b3
    assert len(a3) == len(set(a3))


def test_transition_edges_null_actor_matches_dataset_path(monkeypatch):
    """Null actors must neither crash the exchange reduce nor change the
    edge set vs the Dataset twin (numpy semantics: None != 'x' keeps the
    pair; None != None drops it as a self-transition)."""
    from raylink.ops import transition_edges

    ev = rd.from_pandas(pd.DataFrame({
        "event_id": np.arange(12, dtype=np.int64),
        "user_id": pd.array(["a", None, "b", "b", None, None,
                             "c", "a", None, "c", "b", "a"], dtype=object),
        "val": np.arange(12, dtype=np.int64),
    })).repartition(3)

    def rows(**kw):
        df = transition_edges(ev, chunk=4, **kw).to_pandas()
        return sorted(map(tuple, df.fillna("<null>").values.tolist()))

    a1 = rows()
    a2 = rows(distinct=False, value_col="val")
    monkeypatch.setenv("RAYLINK_TRANSITION_EXCHANGE", "dataset")
    monkeypatch.setenv("RAYLINK_EDGEDEDUP_EXCHANGE", "dataset")
    assert rows() == a1
    assert rows(distinct=False, value_col="val") == a2
    assert len(a2) > 0


def test_checkpoint_resume_cannot_truncate(tmp_path):
    """Resuming with max_iter below the checkpointed superstep raises
    instead of silently returning the longer run's state (Katz would
    even return ~alpha_inv**k-misnormalized scores)."""
    import pytest as _pytest

    from raylink import graph as G
    from raylink.kernels import katz, sssp

    src, dst = zip(*[(f"v{i}", f"v{i + 1}") for i in range(30)])
    eds = rd.from_arrow(pa.table({"src": pa.array(src),
                                  "dst": pa.array(dst)}))
    g = G.build_graph(eds, P=4)
    ck = str(tmp_path / "k")
    katz(g, alpha_inv=10, max_iter=4, checkpoint_dir=ck)
    with _pytest.raises(ValueError, match="cannot be truncated"):
        katz(g, alpha_inv=10, max_iter=2, checkpoint_dir=ck)
    # equal horizon resumes cleanly and matches fresh
    again = katz(g, alpha_inv=10, max_iter=4,
                 checkpoint_dir=ck).to_pandas()
    fresh = katz(g, alpha_inv=10, max_iter=4).to_pandas()
    m = again.merge(fresh, on="vid", suffixes=("_r", "_f"))
    assert (m["katz_r"] == m["katz_f"]).all()

    gs = G.build_graph(eds, P=4, symmetric=True)
    ck2 = str(tmp_path / "s")
    sssp(gs, 0, max_iter=5, checkpoint_dir=ck2)
    with _pytest.raises(ValueError, match="cannot be truncated"):
        sssp(gs, 0, max_iter=3, checkpoint_dir=ck2)


def test_exact_dedup_and_fingerprints():
    from raylink.dedup import exact_dedup_groups
    from raylink.textops import fingerprints

    docs = ds_of({"doc_id": [3, 1, 2], "text": ["xx", "xx", "yy"]})
    out = exact_dedup_groups(docs).to_pandas().sort_values("keep_id")
    assert out["keep_id"].tolist() == [1, 2]
    assert out["n_copies"].tolist() == [2, 1]
    fp = fingerprints(docs).to_pandas()
    assert fp[fp.doc_id == 3]["fp"].iloc[0] == fp[fp.doc_id == 1]["fp"].iloc[0]


def test_exact_dedup_and_lsh_exchange_match_dataset_paths(monkeypatch):
    from raylink.dedup import (exact_dedup_groups, lsh_candidate_pairs,
                               minhash_signatures)

    rng = np.random.RandomState(9)
    words = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(words, 25)) for _ in range(50)]
    texts += texts[:10]  # exact duplicates
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(60, dtype=np.int64), "text": texts}
    )).repartition(4)
    sigs = minhash_signatures(docs).materialize()

    def dd_rows():
        return sorted(map(tuple, exact_dedup_groups(docs).to_pandas()
                          [["fp", "keep_id", "n_copies"]].values.tolist()))

    def lsh_rows():
        return sorted(map(tuple, lsh_candidate_pairs(sigs, cap=8)
                          .to_pandas()[["a", "b"]].values.tolist()))

    a_dd, a_lsh = dd_rows(), lsh_rows()
    monkeypatch.setenv("RAYLINK_EXACTDD_EXCHANGE", "dataset")
    monkeypatch.setenv("RAYLINK_LSH_EXCHANGE", "dataset")
    assert dd_rows() == a_dd
    assert lsh_rows() == a_lsh  # incl. identical cap-truncation picks
    assert len(a_lsh) == len(set(a_lsh))


def test_minhash_lsh_finds_near_dups():
    from raylink.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        near_dup_clusters,
        verify_jaccard,
    )

    words = [f"word{i}" for i in range(60)]
    base = " ".join(words)
    near = " ".join(words[:55] + ["changed"] + words[56:])  # ~0.9 Jaccard
    docs = ds_of({
        "doc_id": [0, 1, 2],
        "text": [base, near, "completely different words here entirely"],
    })
    sigs = minhash_signatures(docs)
    cand = lsh_candidate_pairs(sigs, bands=32)
    ver = verify_jaccard(cand, docs, threshold=0.5).to_pandas()
    pairs = set(map(tuple, ver[["a", "b"]].values.tolist()))
    assert (0, 1) in pairs
    assert all(2 not in p for p in pairs)
    clusters = near_dup_clusters(verify_jaccard(cand, docs, threshold=0.5))
    assert clusters.get(1) == 0


def test_simhash_close_for_similar():
    from raylink.dedup import SimHasher

    sh = SimHasher()
    a = sh.simhash("alpha beta gamma delta epsilon zeta eta theta")
    b = sh.simhash("alpha beta gamma delta epsilon zeta eta iota")
    c = sh.simhash("totally unrelated content words xyzzy plugh")
    ham = lambda x, y: bin((x ^ y) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham(a, b) < ham(a, c)


def test_cosine_topk_and_lsh_recall():
    from raylink.similarity import cosine_topk, lsh_topk

    rng = np.random.default_rng(0)
    mat = rng.standard_normal((200, 16)).astype(np.float32)
    q = mat[17] + rng.standard_normal(16) * 0.01
    emb = ds_of({"vec_id": list(range(200)),
                 "embedding": [v.tolist() for v in mat]})
    top = cosine_topk(emb, q, 5).to_pandas()
    assert top["vec_id"].iloc[0] == 17
    approx = lsh_topk(emb, q, 5, n_planes=6).to_pandas()
    assert 17 in approx["vec_id"].tolist()  # query's own bucket is probed


def test_lang_id_heuristic():
    from raylink.textops import lang_id

    docs = ds_of({
        "doc_id": [0, 1, 2],
        "text": ["the cat and the dog of it is that",
                 "der hund und die katze ist ein nicht zu",
                 "qqq www zzz"],
    })
    out = lang_id(ds := docs).to_pandas().sort_values("doc_id")
    assert out["pred_lang"].tolist() == ["en", "de", "xx"]


def test_multimodal_plumbing():
    from raylink.multimodal import DecoderPool, extract_features, frame_sample, media_dataset

    media = media_dataset(30, parallelism=3)
    feats = extract_features(media, codec="fake", batch_size=8).to_pandas()
    assert len(feats) == 30 and feats["decode_ok"].all()
    assert all(len(f) == DecoderPool.DIM for f in feats["feature"])
    # deterministic
    feats2 = extract_features(media_dataset(30, parallelism=5), codec="fake").to_pandas()
    f1 = feats.sort_values("media_id")["feature"].tolist()
    f2 = feats2.sort_values("media_id")["feature"].tolist()
    assert all(list(a) == list(b) for a, b in zip(f1, f2))
    # real codec on NON-real payloads annotates, never crashes
    bad = DecoderPool(codec="real")(
        media_dataset(2).take_batch(2, batch_format="pyarrow"))
    assert not bad["decode_ok"].to_pylist()[0]
    frames = frame_sample(media_dataset(10), every_k=5).to_pandas()
    assert (frames["frame_idx"] % 5 == 0).all()


def test_real_media_codecs_roundtrip_and_stats():
    """Round 3: the real byte-level codecs — BMP (row padding, bottom-up
    BGR), WAV (RIFF chunk walk incl. junk chunk), concatenated-BMP video
    (bfSize frame advance) — roundtrip exactly, and the distributed
    StatsPool matches ground truth computed from the arrays (never the
    bytes), with truncated payloads annotating decode_ok=False."""
    from raylink.multimodal import (
        ResizePool, _synth_pixels, _synth_samples, decode_bmp, decode_wav,
        encode_bmp, encode_wav, media_stats, media_stats_truth,
        real_media_dataset)

    px = _synth_pixels(3, 13, 7)  # odd width exercises 4-byte row padding
    b = encode_bmp(px)
    px2, end = decode_bmp(b)
    assert end == len(b) and np.array_equal(px, px2)
    s = _synth_samples(5, 321)    # odd byte length exercises the pad byte
    assert np.array_equal(decode_wav(encode_wav(s)), s)
    # corrupted header -> ValueError, not garbage
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + b[2:])
    with pytest.raises(ValueError):
        decode_wav(encode_wav(s)[:20])

    n = 40
    got = (media_stats(real_media_dataset(n, parallelism=4), batch_size=8)
           .to_pandas().sort_values("media_id").reset_index(drop=True))
    exp = pd.DataFrame(media_stats_truth(n), columns=got.columns)
    assert got.equals(exp)
    assert not got["decode_ok"].all()  # the truncated rows are exercised

    # real nearest-neighbor resize: output is a REAL decodable BMP of the
    # target geometry whose pixels are the nearest-neighbor sample
    rp = ResizePool(target_w=5, target_h=4, codec="real")
    small, _ = decode_bmp(rp._real_payload(b, "image"))
    assert small.shape == (4, 5, 3)
    ri = (np.arange(4) * 7) // 4
    ci = (np.arange(5) * 13) // 5
    assert np.array_equal(small, px[ri][:, ci])


def test_sessionize_gap_splitting():
    from raylink.ops import sessionize

    base = np.datetime64("2026-01-01T00:00:00", "us")
    mins = [0, 5, 10, 120, 125, 500]  # two gaps > 30 min -> 3 sessions
    ds = ds_of({
        "event_id": list(range(6)),
        "user_id": [1] * 6,
        "ts": [base + np.timedelta64(m, "m") for m in mins],
    })
    out = sessionize(ds, "user_id", "ts", ["ts", "event_id"],
                     30 * 60 * 1_000_000).to_pandas().sort_values("session_id")
    assert out["session_id"].tolist() == [1, 2, 3]
    assert out["n_events"].tolist() == [3, 2, 1]


def test_ngram_jaccard_pairs_windowing():
    from raylink.dedup import ngram_jaccard_pairs

    ds = ds_of({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b c d", "a b c e", "z y x w", "a b c d"],
        "lang": ["en", "en", "en", "de"],
        "n_chars": [7, 7, 7, 7],
    })
    out = ngram_jaccard_pairs(ds, window=0).to_pandas()
    pairs = {(r.a_id, r.b_id): r.jaccard for r in out.itertuples()}
    assert pairs[(1, 2)] == 600_000  # |{a,b,c}| / |{a,b,c,d,e}| = 3/5
    assert pairs[(1, 3)] == 0
    assert (1, 4) not in pairs  # different lang bucket


def test_iqr_outliers_two_pass():
    from raylink.ops import iqr_outliers

    vals = list(np.linspace(0.0, 1.0, 101))
    ds = ds_of({"x": vals, "id": list(range(101))})
    out = iqr_outliers(ds, "x", 0.1, ["id", "x"]).to_pandas()
    # uniform: q1=0.25 q3=0.75 iqr=0.5 -> keep outside [0.2, 0.8]
    assert len(out) > 0
    assert (out["x"] < 0.2).sum() + (out["x"] > 0.8).sum() == len(out)


def test_hll_approx_distinct_accuracy():
    from raylink.sketches import approx_distinct

    rng = np.random.default_rng(7)
    groups, vals = [], []
    truth = {"a": 5000, "b": 300, "c": 12}
    for g, n in truth.items():
        ids = rng.choice(n * 10, size=n, replace=False)  # n distinct
        for rep in range(2):  # duplicates must not inflate the estimate
            groups += [g] * n
            vals += [int(x) for x in ids]
    ds = ds_of({"g": groups, "v": vals})
    out = approx_distinct(ds, "g", "v", "nd", p=12).to_pandas().set_index("g")["nd"]
    for g, n in truth.items():
        assert abs(out[g] - n) / n < 0.06, (g, out[g], n)


def test_embedding_near_dups_chunked_exact_and_lsh_recall():
    """The chunk-pair exact path must find every pair regardless of
    chunking; the LSH-bucketed path emits no false positives and has
    useful recall (dedup.embedding_near_dups / embedding_near_dups_lsh)."""
    from raylink.dedup import embedding_near_dups, embedding_near_dups_lsh

    rng = np.random.default_rng(5)
    base = rng.standard_normal((20, 16))
    vecs = [(b + 0.05 * rng.standard_normal(16)).tolist()
            for b in base for _ in range(3)]
    ds = ds_of({"vec_id": list(range(len(vecs))), "embedding": vecs})
    exact = embedding_near_dups(ds, threshold=0.9, chunk_rows=16).to_pandas()
    one_chunk = embedding_near_dups(ds, threshold=0.9).to_pandas()
    ep = set(zip(exact.a_id, exact.b_id))
    assert ep == set(zip(one_chunk.a_id, one_chunk.b_id))
    assert len(ep) >= 20  # the planted triples are found
    approx = embedding_near_dups_lsh(ds, threshold=0.9, n_tables=6).to_pandas()
    ap = set(zip(approx.a_id, approx.b_id))
    assert ap <= ep  # verified candidates: no false positives
    assert len(ap) >= 0.7 * len(ep)


def test_quantile_summary_bounded_error():
    """Mergeable quantile summary: rank error of every queried quantile is
    within ~2/q of exact on skewed data (sketches.quantile_summary)."""
    from raylink.sketches import quantile_summary, summary_quantile

    rng = np.random.default_rng(11)
    x = rng.lognormal(3.0, 1.0, size=50_000)
    ds = ds_of({"x": x}).repartition(16)
    q = 512
    vals, w, n = quantile_summary(ds, "x", q=q)
    assert n == len(x)
    xs = np.sort(x)
    for p in (0.01, 0.25, 0.5, 0.75, 0.99):
        v = summary_quantile(vals, w, p)
        true_rank = np.searchsorted(xs, v) / n
        assert abs(true_rank - p) <= 2.0 / q + 1e-9, (p, true_rank)


def test_approx_iqr_outliers_close_to_exact():
    from raylink.ops import iqr_outliers
    from raylink.sketches import approx_iqr_outliers

    rng = np.random.default_rng(12)
    df = {"id": np.arange(30_000),
          "x": rng.lognormal(2.0, 0.8, size=30_000)}
    ds = ds_of(df).repartition(8)
    exact = set(iqr_outliers(ds, "x", 1.5, ["id"]).to_pandas()["id"])
    approx = set(approx_iqr_outliers(ds, "x", 1.5, ["id"]).to_pandas()["id"])
    sym = len(exact ^ approx)
    assert sym <= max(10, 0.01 * len(exact))  # boundary rows only


def test_rolling_median_and_anomaly_topk():
    from raylink.ops import rolling_median, window_anomaly_topk

    n = 60
    vals = np.sin(np.arange(n) / 3.0)
    vals[40] = 9.0  # planted discord
    ds = ds_of({"eid": np.arange(n), "k": np.zeros(n, dtype=np.int64),
                "v": vals})
    out = rolling_median(ds, "k", ["eid"], "v", "rm", window=5,
                         keep_cols=["eid", "k"]).to_pandas().sort_values("eid")
    truth = pd.Series(vals).rolling(5, center=True, min_periods=1).median()
    assert np.array_equal(out["rm"].to_numpy(),
                          np.floor(truth.to_numpy() * 1e6 + 0.5).astype(np.int64))
    top = window_anomaly_topk(ds, "k", ["eid"], "v", window=20, k=3,
                              keep_cols=["eid", "k"]).to_pandas()
    assert int(top.iloc[0]["eid"]) == 40  # the planted spike wins


def test_impute_strategies_and_transforms():
    from raylink.ops import impute, power_transform

    ds = ds_of({"id": [0, 1, 2, 3, 4],
                "x": pd.array([1.0, None, 3.0, None, 5.0], dtype="float64")})
    mean = impute(ds, "x", strategy="mean", keep_cols=["id"],
                  out_col="f").to_pandas().sort_values("id")
    assert mean["f"].tolist() == [1.0, 3.0, 3.0, 3.0, 5.0]
    med = impute(ds, "x", strategy="median", keep_cols=["id"],
                 out_col="f").to_pandas().sort_values("id")
    assert med["f"].tolist() == [1.0, 3.0, 3.0, 3.0, 5.0]
    dsm = ds_of({"id": [0, 1, 2, 3], "x": pd.array([7.0, 7.0, 2.0, None],
                                                   dtype="float64")})
    mode = impute(dsm, "x", strategy="mode", keep_cols=["id"],
                  out_col="f").to_pandas().sort_values("id")
    assert mode["f"].tolist() == [7.0, 7.0, 2.0, 7.0]
    tr = power_transform(ds_of({"id": [0], "x": [4.0]}), "x", method="boxcox",
                         lam=0.5, keep_cols=["id"],
                         out_col="t").to_pandas()
    assert tr["t"].iloc[0] == int(np.floor((2.0 - 1.0) / 0.5 * 1e4 + 0.5))


def test_ivf_topk_recall():
    """IVF coarse-quantized ANN: high recall vs brute force at
    n_probe/n_lists fraction of the scan (similarity.ivf_topk)."""
    from raylink.similarity import cosine_topk, ivf_topk

    rng = np.random.default_rng(9)
    mat = rng.standard_normal((2000, 24))
    q = mat[0] + 0.01 * rng.standard_normal(24)
    ds = ds_of({"vec_id": list(range(2000)),
                "embedding": [r.tolist() for r in mat]})
    exact = cosine_topk(ds, q, 10).to_pandas()
    approx = ivf_topk(ds, q, 10, n_lists=16, n_probe=6).to_pandas()
    hits = len(set(exact.vec_id) & set(approx.vec_id))
    assert hits >= 7  # recall >= 0.7 at 6/16 of the scan


def test_exact_quantiles_bisection_matches_numpy():
    from raylink.ops import exact_quantiles

    rng = np.random.default_rng(21)
    x = np.concatenate([rng.lognormal(1.0, 1.5, 40_000),
                        np.repeat(7.25, 5_000)])  # heavy ties too
    ds = ds_of({"x": x}).repartition(8)
    got = exact_quantiles(ds, "x", [0.0, 0.25, 0.5, 0.75, 0.99, 1.0],
                          gather_limit=2048)
    want = np.quantile(x, [0.0, 0.25, 0.5, 0.75, 0.99, 1.0])
    assert np.allclose(got, want, rtol=0, atol=0)  # exact, not approximate


def test_empty_inputs_do_not_crash():
    """Every fit/aggregate op must yield an empty (or defined-degenerate)
    result on an empty table, not raise (annotate-don't-crash, SURVEY §2.4)."""
    import raylink.ops as O

    ev_schema = pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()),
                           ("ts", pa.timestamp("us")), ("value", pa.float64()),
                           ("event_type", pa.string())])
    e = rd.from_arrow(ev_schema.empty_table())
    assert O.transition_edges(e).count() == 0
    assert O.iqr_outliers(e, "value", 1.5).count() == 0
    assert O.standard_scale(e, "value", "z", ["event_id"]).count() == 0
    assert O.impute(e, "value", strategy="mean").count() == 0
    assert O.pearson_corr(e, "value", "value").count() == 1  # degenerate 0
    n, m, s = O.column_moments(e, "value")
    assert n == 0 and np.isnan(m)


def test_ivf_persisted_index_recall_rises_with_probes():
    """Recall harness (ROADMAP 6): a built IvfIndex serves several queries
    without re-assignment; recall@10 vs brute force is monotone-ish in
    n_probe and reaches 1.0 when probing every list."""
    from raylink.similarity import cosine_topk, ivf_build, ivf_query

    rng = np.random.default_rng(17)
    centers = rng.standard_normal((8, 16)) * 3
    mat = np.concatenate(
        [c + 0.3 * rng.standard_normal((250, 16)) for c in centers])
    ds = ds_of({"vec_id": list(range(len(mat))),
                "embedding": [r.tolist() for r in mat]})
    index = ivf_build(ds, n_lists=16, seed=5)
    assert "ivf_list" in [f.name for f in index.assigned.schema().base_schema]
    recalls = []
    for q_i in (3, 700, 1500):
        q = mat[q_i] + 0.05 * rng.standard_normal(16)
        exact = set(cosine_topk(ds, q, 10).to_pandas().vec_id)
        r = {}
        for n_probe in (1, 4, 16):
            got = set(ivf_query(index, q, 10, n_probe=n_probe)
                      .to_pandas().vec_id)
            r[n_probe] = len(exact & got) / 10
        assert r[16] == 1.0           # probing all lists == brute force
        assert r[4] >= r[1] - 0.2     # more probes, no big recall loss
        recalls.append(r[4])
    assert np.mean(recalls) >= 0.8   # clustered corpus: 4/16 lists suffice


def test_cosine_topk_multi_matches_per_query():
    """Batched multi-query ANN == per-query brute force, including the
    (rounded score desc, id asc) tie rule at the cut."""
    from raylink.similarity import cosine_topk, cosine_topk_multi

    rng = np.random.default_rng(23)
    mat = rng.standard_normal((600, 12))
    ds = ds_of({"vec_id": list(range(600)),
                "embedding": [r.tolist() for r in mat]}).repartition(6)
    qmat = mat[[5, 99, 300]] + 0.02 * rng.standard_normal((3, 12))
    multi = cosine_topk_multi(ds, qmat, 10, query_ids=[5, 99, 300]).to_pandas()
    assert len(multi) == 30
    for qi, q in zip([5, 99, 300], qmat):
        single = cosine_topk(ds, q, 10).to_pandas()
        part = multi[multi.query_id == qi]
        assert part.vec_id.tolist() == single.vec_id.tolist()
        assert part.cos_sim.tolist() == single.cos_sim.tolist()


def test_ann_ops_tolerate_empty_blocks():
    """Datasets with empty blocks (more partitions than rows) must not
    crash any ANN scorer (empty-batch guards before the matmuls)."""
    from raylink.similarity import (cosine_topk, cosine_topk_multi,
                                    ivf_build, ivf_query, lsh_topk)

    rng = np.random.default_rng(3)
    mat = rng.standard_normal((12, 8))
    ds = ds_of({"vec_id": list(range(12)),
                "embedding": [r.tolist() for r in mat]}).repartition(30)
    q = mat[0]
    assert len(cosine_topk(ds, q, 5).to_pandas()) == 5
    assert len(lsh_topk(ds, q, 5).to_pandas()) <= 5
    idx = ivf_build(ds, n_lists=4)
    assert len(ivf_query(idx, q, 5, n_probe=1).to_pandas()) <= 5
    assert len(cosine_topk_multi(ds, mat[:2], 5).to_pandas()) == 10


def test_ivfpq_topk_recall_and_compression():
    """IVF-PQ ANN: the compressed corpus carries only M uint8 codes per
    vector (raw embedding column dropped); ADC scoring keeps useful recall
    vs brute force and finds the planted near-duplicate (similarity.
    ivfpq_build/ivfpq_query/ivfpq_topk)."""
    from raylink.similarity import cosine_topk, ivfpq_build, ivfpq_query

    rng = np.random.default_rng(9)
    mat = rng.standard_normal((2000, 24))
    q = mat[0] + 0.01 * rng.standard_normal(24)
    ds = ds_of({"vec_id": list(range(2000)),
                "embedding": [r.tolist() for r in mat]})
    index = ivfpq_build(ds, n_lists=16, m_subspaces=8, seed=9)
    cols = [f.name for f in index.compressed.schema().base_schema]
    assert "embedding" not in cols                  # memory-bound: codes only
    assert set(cols) == {"vec_id", "ivf_list", "pq_code"}
    row = index.compressed.take(1)[0]
    assert len(row["pq_code"]) == 8                 # 8 bytes vs 96 raw
    exact = cosine_topk(ds, q, 10).to_pandas()
    approx = ivfpq_query(index, q, 10, n_probe=6).to_pandas()
    hits = len(set(exact.vec_id) & set(approx.vec_id))
    assert hits >= 6                                # measured 9/10; slack
    assert 0 in set(approx.vec_id)                  # planted near-dup found
    again = ivfpq_query(index, q, 10, n_probe=6).to_pandas()
    assert approx.equals(again)                     # deterministic


def test_semi_anti_join_exact_with_and_without_bloom():
    from raylink.ops import anti_join, semi_join

    rng = np.random.default_rng(7)
    lk = rng.integers(0, 400, 2000)
    left = ds_of({"k": lk, "v": np.arange(2000)})
    rk = np.arange(0, 400, 3)
    right = ds_of({"rk": rk, "x": rk * 2})
    in_right = np.isin(lk, rk)

    for bb in (0, 1 << 14):
        semi = semi_join(left, right, "k", right_on="rk",
                         num_partitions=4, bloom_bits=bb).to_pandas()
        anti = anti_join(left, right, "k", right_on="rk",
                         num_partitions=4, bloom_bits=bb).to_pandas()
        # exact partition of left, left columns only, no duplication
        assert sorted(semi.columns) == ["k", "v"] == sorted(anti.columns)
        assert len(semi) == int(in_right.sum())
        assert len(anti) == int((~in_right).sum())
        assert np.isin(semi["k"].to_numpy(), rk).all()
        assert not np.isin(anti["k"].to_numpy(), rk).any()
        assert sorted(semi["v"].tolist() + anti["v"].tolist()) == list(range(2000))


def test_bloom_filter_no_false_negatives_and_bounded_fp():
    from raylink.sketches import bloom_build, bloom_may_contain

    keys = np.arange(0, 5000, 2)  # evens present
    ds = ds_of({"k": keys})
    bits = bloom_build(ds, "k", num_bits=1 << 16, num_hashes=5)
    probe = pa.array(np.arange(10000))
    maybe = bloom_may_contain(bits, probe, num_hashes=5)
    truth = np.isin(np.arange(10000), keys)
    assert maybe[truth].all()  # Bloom never loses a present key
    # m/n = 65536/2500 ≈ 26 bits/key -> theoretical FP ~3e-4; allow slack
    assert float(maybe[~truth].mean()) < 0.01


def test_tfidf_topk_hand_computed():
    from raylink.textops import tfidf_topk

    docs = ds_of({
        "doc_id": [1, 2, 3, 4],
        "text": ["apple apple banana", "apple cherry", "banana cherry date",
                 "DATE! date, fig?"],
    })
    out = tfidf_topk(docs, k=2, num_partitions=4).to_pandas()
    n = 4
    # doc 1: apple tf=2 df=2 -> 2*ln(2); banana tf=1 df=2 -> ln(2)
    d1 = out[out.doc_id == 1].sort_values("score", ascending=False)
    assert d1.term.tolist() == ["apple", "banana"]
    assert d1.score.tolist() == [
        int(np.floor(2.0 * np.log(n / 2.0) * 1e6 + 0.5)),
        int(np.floor(1.0 * np.log(n / 2.0) * 1e6 + 0.5)),
    ]
    # doc 4: punctuation stripped, case-folded: date tf=2 df=2, fig tf=1 df=1
    d4 = out[out.doc_id == 4].sort_values("score", ascending=False)
    assert d4.term.tolist() == ["date", "fig"]
    # ties broken term-asc: doc 2 apple/cherry both tf=1 df=2
    d2 = out[out.doc_id == 2]
    assert d2.sort_values(["score", "term"], ascending=[False, True])[
        "term"].tolist() == ["apple", "cherry"]


def test_hash_split_deterministic_disjoint_and_group_aware():
    import hashlib

    from raylink.ops import hash_split

    ids = np.arange(1000)
    groups = ids % 97  # key by group -> whole groups land in one fold
    ds = ds_of({"doc_id": ids, "grp": groups})
    out = hash_split(ds, "grp").to_pandas()
    assert set(out["split"]) <= {"train", "val", "test"}
    assert len(out) == 1000
    # same key -> same split everywhere (group-aware)
    assert (out.groupby("grp")["split"].nunique() == 1).all()
    # matches the md5-bucket spec exactly
    for g, s in out.groupby("grp")["split"].first().items():
        h = hashlib.md5(str(g).encode()).hexdigest()[:4]
        want = "train" if h < "cccc" else ("val" if h < "e666" else "test")
        assert s == want
    # roughly the requested fractions at the group level
    per = out.groupby("grp")["split"].first().value_counts(normalize=True)
    assert 0.6 < per.get("train", 0) < 0.95


def test_stratified_sample_matches_sequential():
    import hashlib

    from raylink.ops import stratified_sample

    rng = np.random.default_rng(3)
    g = rng.integers(0, 5, 500)
    ids = rng.permutation(500)
    ds = ds_of({"g": g, "id": ids})
    out = stratified_sample(ds, "g", "id", 7).to_pandas()
    pdf = pd.DataFrame({"g": g, "id": ids})
    pdf["_h"] = [hashlib.md5(str(k).encode()).hexdigest() for k in pdf["id"]]
    want = (pdf.sort_values(["_h", "id"]).groupby("g").head(7)
            .drop(columns="_h"))
    a = out.sort_values(["g", "id"]).reset_index(drop=True)
    b = want.sort_values(["g", "id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_redact_emails_then_digit_runs():
    from raylink.textops import redact

    docs = ds_of({
        "doc_id": [1, 2, 3],
        "text": ["mail me at jo.doe+x@site-a.example.org or call 555 1234",
                 "no pii here", "ids 007 and 42"],
    })
    out = redact(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.redacted.tolist() == [
        "mail me at [EMAIL] or call [NUM] [NUM]",
        "no pii here", "ids [NUM] and [NUM]"]
    assert out.n_emails.tolist() == [1, 0, 0]
    # digit runs counted AFTER email removal (the email's digits don't count)
    assert out.n_nums.tolist() == [2, 0, 2]


def test_host_edges_contracts_and_weights():
    from raylink.extract import host_edges

    edges = ds_of({
        "src": ["http://a.x/1", "http://a.x/1", "http://a.x/2",
                "http://a.x/2", "http://b.x/1", "http://b.x/1"],
        "dst": ["http://b.x/1", "http://b.x/1", "http://b.x/2",
                "http://a.x/1", "http://a.x/9", "http://b.x/1"],
    })
    out = host_edges(edges).to_pandas().sort_values(
        ["src_host", "dst_host"]).reset_index(drop=True)
    # duplicates collapse before counting; page self-loop b1->b1 dropped;
    # same-host a2->a1 kept as intra-host mass
    want = {("a.x", "a.x"): 1, ("a.x", "b.x"): 2, ("b.x", "a.x"): 1}
    got = {(r.src_host, r.dst_host): r.n_links for r in out.itertuples()}
    assert got == want


def test_hash_split_zero_fraction_fold_gets_nothing():
    """A fold requested at 0%% must receive 0 rows even when a cumulative
    fraction hits 1.0 before the last fold (the '10000' hex-bound case)."""
    from raylink.ops import hash_split

    ds = ds_of({"doc_id": np.arange(2000)})
    out = hash_split(ds, "doc_id",
                     fractions={"train": 0.8, "val": 0.2, "test": 0.0}
                     ).to_pandas()
    counts = out["split"].value_counts().to_dict()
    assert counts.get("test", 0) == 0
    assert 0.75 < counts["train"] / 2000 < 0.85
    assert 0.15 < counts["val"] / 2000 < 0.25


def test_stratified_sample_keeps_all_columns():
    from raylink.ops import stratified_sample

    ds = ds_of({"g": np.arange(100) % 4, "id": np.arange(100),
                "payload": np.arange(100) * 2.5})
    out = stratified_sample(ds, "g", "id", 3).to_pandas()
    assert sorted(out.columns) == ["g", "id", "payload"]
    assert len(out) == 12
    assert (out["payload"] == out["id"] * 2.5).all()


def test_histogram_and_column_summary():
    from raylink.ops import column_summary, histogram

    rng = np.random.default_rng(5)
    x = rng.uniform(0, 100, 5000)
    x[::97] = np.nan  # null-ish
    ds = ds_of({"v": x})
    h = histogram(ds, "v", 0.0, 100.0, 10).to_pandas().set_index("bucket")
    clean = x[~np.isnan(x)]
    want = np.bincount(np.clip((clean // 10).astype(int), 0, 9), minlength=10)
    assert [h.loc[b, "n"] if b in h.index else 0
            for b in range(10)] == want.tolist()
    assert h["n"].sum() == len(clean)

    s = column_summary(ds, "v").to_pandas().iloc[0]
    assert s.n == 5000 and s.n_null == 0  # NaN is not arrow-null here
    assert s.min_v == clean.min() and s.max_v == clean.max()
    # mean over non-NaN values only (denominator = n_valid, not n)
    fp = np.floor(clean * 1e6 + 0.5).astype(np.int64).sum()
    assert s.mean_fp == int(np.floor(fp / len(clean) + 0.5))


def test_grouped_topk_matches_reference_with_ties():
    rng = np.random.default_rng(7)
    n = 500
    df = pd.DataFrame({
        "g": rng.integers(0, 5, n),
        "v": rng.integers(0, 20, n).astype(float),  # many ties
        "id": np.arange(n, dtype=np.int64),
    })
    from raylink.ops import grouped_topk

    got = (grouped_topk(rd.from_pandas(df).repartition(7), ["g"],
                        [("v", True), ("id", False)], 4)
           .to_pandas().sort_values(["g", "v", "id"],
                                    ascending=[True, False, True])
           .reset_index(drop=True))
    exp = (df.sort_values(["v", "id"], ascending=[False, True],
                          kind="mergesort")
           .groupby("g", sort=False).head(4)
           .sort_values(["g", "v", "id"], ascending=[True, False, True])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_grouped_quantile_percentile_disc_semantics():
    # even/odd group sizes; value must be an ACTUAL element at
    # index floor(q*(n-1)) of the sorted group
    df = pd.DataFrame({
        "g": ["a"] * 4 + ["b"] * 5,
        "v": [10.0, 1.0, 3.0, 2.0, 50.0, 10.0, 30.0, 20.0, 40.0],
    })
    from raylink.ops import grouped_quantile

    got = (grouped_quantile(rd.from_pandas(df).repartition(3), "g", "v",
                            0.5, "med", scale=1.0)
           .to_pandas().sort_values("g").reset_index(drop=True))
    # a: sorted [1,2,3,10], idx floor(0.5*3)=1 -> 2; b: idx 2 -> 30
    assert got["med"].tolist() == [2, 30]
    got75 = (grouped_quantile(rd.from_pandas(df), "g", "v", 0.75, "q3",
                              scale=1.0)
             .to_pandas().sort_values("g").reset_index(drop=True))
    # a: idx floor(0.75*3)=2 -> 3; b: idx 3 -> 40
    assert got75["q3"].tolist() == [3, 40]


def test_asof_join_matches_bruteforce():
    rng = np.random.default_rng(11)
    nl, nr = 300, 200
    left = pd.DataFrame({
        "k": rng.integers(0, 12, nl),
        "lts": pd.to_datetime(rng.integers(0, 1000, nl), unit="s"),
        "lid": np.arange(nl, dtype=np.int64),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 14, nr),  # some keys have no left rows
        "rts": pd.to_datetime(rng.integers(0, 1000, nr) // 7 * 7, unit="s"),
        "rid": np.arange(1000, 1000 + nr, dtype=np.int64),
        "payload": rng.normal(size=nr),
    })
    from raylink.ops import asof_join

    got = asof_join(
        rd.from_pandas(left).repartition(5),
        rd.from_pandas(right).repartition(4),
        "k", left_ts="lts", right_ts="rts", tie_col="rid",
        right_cols={"rid": "m_rid", "payload": "m_payload"},
        num_partitions=8,
    ).to_pandas().sort_values("lid").reset_index(drop=True)

    rows = []
    for _, lr in left.iterrows():
        cand = right[(right["k"] == lr["k"]) & (right["rts"] <= lr["lts"])]
        if cand.empty:
            continue  # inner join: unmatched dropped
        best = cand.sort_values(["rts", "rid"],
                                ascending=[False, False]).iloc[0]
        rows.append({**lr, "m_rid": best["rid"], "m_payload": best["payload"]})
    exp = pd.DataFrame(rows).sort_values("lid").reset_index(drop=True)
    assert len(got) == len(exp)
    assert got["m_rid"].tolist() == exp["m_rid"].tolist()
    assert np.allclose(got["m_payload"], exp["m_payload"])
    assert got["lid"].tolist() == exp["lid"].tolist()


def test_heavy_hitters_exact_and_candidate_superset():
    rng = np.random.default_rng(3)
    # zipf-ish stream over a large key space: few hot keys, long tail
    hot = np.repeat(np.arange(5, dtype=np.int64), [900, 700, 500, 300, 200])
    tail = rng.integers(1000, 200000, 7400)
    v = np.concatenate([hot, tail.astype(np.int64)])
    rng.shuffle(v)
    ds = rd.from_arrow(pa.table({"u": pa.array(v, pa.int64())})).repartition(9)
    from raylink.sketches import heavy_hitters

    phi = 0.02  # threshold = 200
    got = (heavy_hitters(ds, "u", phi=phi).to_pandas()
           .sort_values("u").reset_index(drop=True))
    ser = pd.Series(v).value_counts()
    thr = int(np.ceil(phi * len(v)))
    exp = ser[ser >= thr].sort_index()
    assert got["u"].tolist() == exp.index.tolist()
    assert got["n"].tolist() == exp.values.tolist()
    # tiny k still cannot LOSE a true heavy hitter (MG merge guarantee)
    got_small_k = (heavy_hitters(ds, "u", phi=phi, k=int(np.ceil(2 / phi)))
                   .to_pandas().sort_values("u").reset_index(drop=True))
    assert got_small_k["u"].tolist() == exp.index.tolist()


def test_pivot_count_matches_crosstab():
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "g": rng.integers(0, 8, 400),
        "c": rng.choice(["a", "b", "c", "zz"], 400),  # 'zz' not listed
    })
    from raylink.ops import pivot_count

    got = (pivot_count(rd.from_pandas(df).repartition(5), "g", "c",
                       ["a", "b", "c"])
           .to_pandas().sort_values("g").reset_index(drop=True))
    ct = pd.crosstab(df["g"], df["c"])
    for cat in ["a", "b", "c"]:
        exp = ct[cat].reindex(got["g"]).fillna(0).astype(np.int64)
        assert got[f"n_{cat}"].tolist() == exp.tolist()
    assert "n_zz" not in got.columns  # unlisted categories ignored


def test_quantile_bins_disc_thresholds_and_duplicates():
    # skewed ints: the quartile thresholds coincide -> buckets collapse
    x = np.array([1.0] * 50 + [2.0] * 5 + [9.0] * 5)
    rng = np.random.default_rng(9)
    rng.shuffle(x)
    df = pd.DataFrame({"id": np.arange(len(x), dtype=np.int64), "v": x})
    from raylink.ops import exact_quantiles, quantile_bins

    got = (quantile_bins(rd.from_pandas(df).repartition(4), "v", 4, "bin")
           .to_pandas().sort_values("id").reset_index(drop=True))
    s = np.sort(x)
    n = len(s)
    th = sorted({float(s[int(np.floor(q * (n - 1)))])
                 for q in (0.25, 0.5, 0.75)})
    exp = np.searchsorted(th, df["v"].to_numpy(), side="right")
    assert got["bin"].tolist() == exp.tolist()
    # disc mode of the bisection returns ACTUAL elements at floor(q*(n-1))
    qd = exact_quantiles(rd.from_pandas(df), "v", [0.25, 0.5, 0.75],
                         disc=True)
    assert qd == [float(s[int(np.floor(q * (n - 1)))])
                  for q in (0.25, 0.5, 0.75)]


def test_repetition_scores_hand_computed():
    from raylink.textops import repetition_scores

    df = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": [
            "a a a b",        # n=4 nd=2 dup=.5; bigrams: (a,a)x2 (a,b)x1 -> 2/3
            "x y z",          # all distinct, max bigram 1 -> 1/2
            "",               # empty -> all zeros
            "solo",           # single token: dup 0, bigram 0
            "w w w w",        # n=4 nd=1 dup=.75; (w,w)x3 -> 3/3=1
        ],
    })
    got = (repetition_scores(rd.from_pandas(df).repartition(3))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["n_tokens"].tolist() == [4, 3, 0, 1, 4]
    assert got["dup_token_ratio"].tolist() == [500000, 0, 0, 0, 750000]
    assert got["top_bigram_ratio"].tolist() == [666667, 500000, 0, 0, 1000000]


def test_pack_sequences_matches_sequential_scan():
    from raylink.ops import pack_sequences

    rng = np.random.default_rng(7)
    # sparse, skewed ids: order must follow id, not partition layout
    ids = np.unique(rng.integers(0, 10_000_000, size=400).astype(np.int64))
    n = rng.integers(0, 900, size=len(ids)).astype(np.int64)
    df = pd.DataFrame({"id": ids, "n": n})
    shuffled = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    got = (pack_sequences(rd.from_pandas(shuffled).repartition(7),
                          "id", "n", 512, num_buckets=5)
           .to_pandas().sort_values("id").reset_index(drop=True))
    start = np.cumsum(n) - n
    assert got["id"].tolist() == ids.tolist()
    assert got["start_tok"].tolist() == start.tolist()
    assert got["seq_id"].tolist() == (start // 512).tolist()


def test_pack_sequences_exchange_matches_dataset_path(monkeypatch):
    from raylink.ops import pack_sequences

    rng = np.random.default_rng(11)
    ids = np.unique(rng.integers(0, 50_000, size=300).astype(np.int64))
    df = pd.DataFrame({"id": ids,
                       "n": rng.integers(0, 90, len(ids)).astype(np.int64)})
    ds = rd.from_pandas(df.sample(frac=1.0, random_state=5)).repartition(4)
    a = (pack_sequences(ds, "id", "n", 128, num_buckets=6)
         .to_pandas().sort_values("id").reset_index(drop=True))
    monkeypatch.setenv("RAYLINK_PACK_EXCHANGE", "dataset")
    b = (pack_sequences(ds, "id", "n", 128, num_buckets=6)
         .to_pandas().sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_chunk_dup_stats_cross_and_within_doc():
    from raylink.dedup import chunk_dup_stats

    c1 = "a b c d e f g h"            # one 8-token chunk
    df = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": [
            c1 + " i j k l m n o p",  # doc0: 2 chunks; chunk1 shared w/ doc1
            c1 + " q r s t u v w x",  # doc1: 2 chunks; chunk1 shared w/ doc0
            "z z z z z",              # doc2: 5 tokens -> 0 chunks
            c1 + " " + c1,            # doc3: same chunk twice WITHIN the doc
            "unique words only here eight tokens exactly now",  # doc4: 1 chunk
        ],
    })
    got = (chunk_dup_stats(rd.from_pandas(df).repartition(3), width=8)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["n_chunks"].tolist() == [2, 2, 0, 2, 1]
    # c1 appears 4x corpus-wide (docs 0,1 and twice in 3) -> dup everywhere
    assert got["n_dup_chunks"].tolist() == [1, 1, 0, 2, 0]
    assert got["dup_chunk_ratio"].tolist() == [500000, 500000, 0, 1000000, 0]


def test_chunk_dup_stats_exchange_matches_dataset_path(monkeypatch):
    from raylink.dedup import chunk_dup_stats

    rng = np.random.RandomState(7)
    texts = [" ".join(f"w{rng.randint(0, 12)}" for _ in range(rng.randint(0, 30)))
             for _ in range(60)]
    df = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                       "text": texts})
    ds = rd.from_pandas(df).repartition(4)
    a = (chunk_dup_stats(ds, width=4, stride=2).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    monkeypatch.setenv("RAYLINK_CHUNKDD_EXCHANGE", "dataset")
    b = (chunk_dup_stats(ds, width=4, stride=2).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_decontaminate_flags_exact_ngram_overlap():
    from raylink.dedup import decontaminate

    ev = pd.DataFrame({"doc_id": np.array([100], dtype=np.int64),
                       "text": ["the quick brown fox jumps"]})
    tr = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [
            "a quick brown fox ran",   # shares "quick brown fox" -> 1 hit of 3
            "totally clean document here",  # 0 hits of 2
            "xx yy",                   # shorter than k -> 0 grams
            "the quick brown fox jumps",    # full overlap: 3 of 3
        ],
    })
    got = (decontaminate(rd.from_pandas(tr).repartition(2),
                         rd.from_pandas(ev), k=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["n_ngrams"].tolist() == [3, 2, 0, 3]
    assert got["n_contaminated"].tolist() == [1, 0, 0, 3]
    assert got["contaminated"].tolist() == [1, 0, 0, 1]


def test_lm_surprisal_hand_computed():
    from raylink.textops import lm_surprisal

    df = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["a a b", "a rare", ""],  # corpus: a x3, b x1, rare x1
    })
    got = (lm_surprisal(rd.from_pandas(df).repartition(2))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    n_tok = 5.0
    u = {t: int(np.floor(np.log(n_tok / c) * 1e6 + 0.5))
         for t, c in (("a", 3), ("b", 1), ("rare", 1))}
    assert got["n_terms"].tolist() == [3, 2, 0]
    assert got["surprisal_fp"].tolist() == [
        2 * u["a"] + u["b"], u["a"] + u["rare"], 0]


def test_new_text_ops_degenerate_inputs():
    """Empty eval set, all-empty corpus, and single-doc inputs do not
    crash or mislabel the continuation-session text ops."""
    from raylink.dedup import chunk_dup_stats, decontaminate
    from raylink.ops import pack_sequences
    from raylink.textops import lm_surprisal, repetition_scores

    empty_txt = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                              "text": ["", "   ", ""]})
    ds = rd.from_pandas(empty_txt)

    rep = repetition_scores(ds).to_pandas()
    assert (rep[["n_tokens", "dup_token_ratio",
                 "top_bigram_ratio"]] == 0).all().all()

    cd = chunk_dup_stats(ds).to_pandas()
    assert (cd[["n_chunks", "n_dup_chunks", "dup_chunk_ratio"]] == 0)\
        .all().all() and len(cd) == 3

    lm = lm_surprisal(ds).to_pandas()
    assert (lm[["n_terms", "surprisal_fp"]] == 0).all().all()

    # empty eval set -> nothing contaminated
    train = pd.DataFrame({"doc_id": np.array([0], dtype=np.int64),
                          "text": ["some real tokens here"]})
    out = decontaminate(rd.from_pandas(train), ds, k=3).to_pandas()
    assert out["contaminated"].tolist() == [0]
    assert out["n_ngrams"].tolist() == [2]

    # zero-row pack keeps the typed schema
    none = rd.from_pandas(pd.DataFrame({"id": pd.Series([], dtype="int64"),
                                        "n": pd.Series([], dtype="int64")}))
    packed = pack_sequences(none, "id", "n", 512)
    assert packed.count() == 0


def test_global_rank_matches_lexsort():
    from raylink.ops import global_rank

    rng = np.random.default_rng(11)
    vals = np.round(rng.normal(100, 20, 500), 1)
    vals[::7] = 100.0  # heavy ties, same bucket by construction
    ids = rng.permutation(500).astype(np.int64)
    df = pd.DataFrame({"id": ids, "v": vals})
    got = (global_rank(rd.from_pandas(df).repartition(6), "v", "id",
                       num_buckets=8)
           .to_pandas().sort_values("id").reset_index(drop=True))
    order = np.lexsort((df["id"].to_numpy(), df["v"].to_numpy()))
    exp = np.empty(500, dtype=np.int64)
    exp[order] = np.arange(1, 501)
    expdf = df.assign(rank=exp).sort_values("id").reset_index(drop=True)
    assert got["rank"].tolist() == expdf["rank"].tolist()


def test_pca_matches_numpy_full_data():
    from raylink.similarity import pca_fit, pca_transform

    rng = np.random.default_rng(5)
    d, n, k = 8, 400, 3
    base = rng.normal(size=(n, d)) @ np.diag([5, 3, 2, 1, .5, .3, .2, .1])
    tab = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([r.astype(np.float32).tolist() for r in base],
                              pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tab).repartition(5)
    mean, comps = pca_fit(ds, k)
    X = base.astype(np.float32).astype(np.float64)
    m = X.mean(axis=0)
    cov = (X.T @ X) / n - np.outer(m, m)
    w, v = np.linalg.eigh(cov)
    exp = v[:, ::-1][:, :k].T
    for i in range(k):
        j = int(np.argmax(np.abs(exp[i])))
        if exp[i, j] < 0:
            exp[i] = -exp[i]
    assert np.allclose(mean, m, atol=1e-9)
    assert np.allclose(comps, exp, atol=1e-7)
    got = (pca_transform(ds, mean, comps).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    proj = np.stack(got["proj"].to_numpy())
    assert np.allclose(proj, (X - m) @ exp.T, atol=1e-7)
    # projected variance is (near-)diagonal with descending magnitudes
    pv = proj.var(axis=0)
    assert pv[0] > pv[1] > pv[2]


def test_weighted_resample_deterministic_multiset():
    import hashlib

    from raylink.ops import weighted_resample

    df = pd.DataFrame({
        "doc_id": np.arange(200, dtype=np.int64),
        "source": ["a" if i % 2 == 0 else "b" for i in range(200)],
    })
    got = (weighted_resample(rd.from_pandas(df).repartition(4), "doc_id",
                             "source", {"a": 2.5, "b": 0.25})
           .to_pandas().sort_values(["doc_id", "copy"])
           .reset_index(drop=True))

    def n_copies(k, w):
        h = hashlib.md5(str(k).encode()).hexdigest()[:4]
        frac = w - int(w)
        return int(w) + (1 if h < format(int(frac * 65536), "04x") else 0)

    exp = {int(r.doc_id): n_copies(r.doc_id, 2.5 if r.source == "a"
                                   else 0.25) for r in df.itertuples()}
    counts = got.groupby("doc_id").size().to_dict()
    assert all(counts.get(k, 0) == v for k, v in exp.items())
    # 'a' rows appear 2 or 3 times, 'b' rows 0 or 1; copy is 0..n-1
    assert set(got[got["source"] == "a"]["copy"]) <= {0, 1, 2}
    per = got.groupby("doc_id")["copy"].agg(["min", "max", "size"])
    assert (per["min"] == 0).all() and (per["max"] == per["size"] - 1).all()


def test_simhash_pairs_exact_within_radius():
    """Pigeonhole-banded Hamming pair mining == brute force over all
    pairs, at two radii, on a corpus engineered to have near-dups."""
    from raylink.dedup import SimHasher, simhash_pairs, simhash_table

    words = [f"tok{i}" for i in range(40)]
    texts = [" ".join(words)]
    for i in range(12):  # perturbations at varying distances
        t = list(words)
        for j in range(i):
            t[3 * j % 40] = f"chg{i}_{j}"
        texts.append(" ".join(t))
    texts += ["utterly different content here"] * 2
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    sigs = simhash_table(rd.from_pandas(df).repartition(3)).materialize()
    sh = SimHasher()
    sims = {int(r.doc_id): sh.simhash(r.text) for r in df.itertuples()}

    def ham(x, y):
        return bin((x ^ y) & 0xFFFFFFFFFFFFFFFF).count("1")

    for radius in (2, 3):
        got = simhash_pairs(sigs, radius=radius).to_pandas()
        got_pairs = {(int(a), int(b)): int(h) for a, b, h in
                     zip(got["a"], got["b"], got["hamming"])}
        exp = {(a, b): ham(sims[a], sims[b])
               for a in sims for b in sims if a < b
               and ham(sims[a], sims[b]) <= radius}
        assert got_pairs == exp and len(exp) > 0


def test_scan_ops_property_random_shapes():
    """Property check (hypothesis): pack_sequences and global_rank match
    their sequential definitions for arbitrary id gaps, duplicate values,
    and partition counts."""
    from hypothesis import given, settings, strategies as st

    from raylink.ops import global_rank, pack_sequences

    @settings(max_examples=5, deadline=None)
    @given(st.data())
    def inner(data):
        k = data.draw(st.integers(3, 60))
        ids = data.draw(st.lists(st.integers(0, 10_000), min_size=k,
                                 max_size=k, unique=True))
        counts = data.draw(st.lists(st.integers(0, 700), min_size=k,
                                    max_size=k))
        nparts = data.draw(st.integers(1, 5))
        df = pd.DataFrame({"id": np.array(ids, np.int64),
                           "n": np.array(counts, np.int64)})
        ds = rd.from_pandas(df.sample(frac=1.0, random_state=1)) \
            .repartition(nparts)

        got = (pack_sequences(ds, "id", "n", 128, num_buckets=4)
               .to_pandas().sort_values("id").reset_index(drop=True))
        sorted_df = df.sort_values("id").reset_index(drop=True)
        start = sorted_df["n"].cumsum() - sorted_df["n"]
        assert got["start_tok"].tolist() == start.tolist()
        assert got["seq_id"].tolist() == (start // 128).tolist()

        vals = data.draw(st.lists(st.integers(-50, 50), min_size=k,
                                  max_size=k))
        df2 = pd.DataFrame({"id": np.array(ids, np.int64),
                            "v": np.array(vals, np.float64)})
        got2 = (global_rank(rd.from_pandas(df2).repartition(nparts), "v",
                            "id", num_buckets=4)
                .to_pandas().sort_values("id").reset_index(drop=True))
        order = np.lexsort((df2["id"].to_numpy(), df2["v"].to_numpy()))
        exp = np.empty(k, dtype=np.int64)
        exp[order] = np.arange(1, k + 1)
        expdf = df2.assign(r=exp).sort_values("id").reset_index(drop=True)
        assert got2["rank"].tolist() == expdf["r"].tolist()

    inner()


def test_decontaminate_join_path_equals_broadcast():
    from raylink.dedup import decontaminate

    rng = np.random.default_rng(6)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 25)))
             for _ in range(60)]
    ev = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64),
                       "text": texts[:5]})
    tr = pd.DataFrame({"doc_id": np.arange(100, 155, dtype=np.int64),
                       "text": texts[5:]})
    a = (decontaminate(rd.from_pandas(tr).repartition(3),
                       rd.from_pandas(ev), k=3)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (decontaminate(rd.from_pandas(tr).repartition(3),
                       rd.from_pandas(ev), k=3, broadcast=False)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b[a.columns])
    assert a["contaminated"].sum() > 0  # the fixture does overlap


def test_funnel_depths_hand_built():
    from raylink.ops import funnel

    base = np.datetime64("2026-01-01T00:00:00", "us")

    def ts(m):
        return base + np.timedelta64(m, "m")

    rows = [
        # u1 completes A,B,C in order
        (1, ts(0), "A"), (1, ts(1), "B"), (1, ts(2), "C"),
        # u2: B before A -> depth 1 (A found, no later B)
        (2, ts(0), "B"), (2, ts(1), "A"),
        # u3: A, C, B, C -> greedy A(0) B(2) C(3) = 3
        (3, ts(0), "A"), (3, ts(1), "C"), (3, ts(2), "B"), (3, ts(3), "C"),
        # u4: only noise -> 0
        (4, ts(0), "Z"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    got = (funnel(rd.from_pandas(df).repartition(3), "user_id", "ts",
                  "event_type", ["A", "B", "C"])
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    assert got["depth"].tolist() == [3, 1, 3, 0]


def test_lm_surprisal2_hand_computed():
    from raylink.textops import lm_surprisal2

    df = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["a b a b", "a c", "x"],  # bigrams: ab, ba, ab | ac | none
    })
    got = (lm_surprisal2(rd.from_pandas(df).repartition(2))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # cnt2: ab=2 ba=1 ac=1 ; cnt1 (non-final pos): a=3 (ab,ab,ac) b=1 (ba)
    u = lambda c1, c2: int(np.floor(np.log(c1 / c2) * 1e6 + 0.5))  # noqa
    assert got["n_bigrams"].tolist() == [3, 1, 0]
    assert got["surprisal2_fp"].tolist() == [
        2 * u(3.0, 2.0) + u(1.0, 1.0), u(3.0, 1.0), 0]


def test_chunk_dup_stats_overlapping_stride():
    from raylink.dedup import chunk_dup_stats

    # 12 tokens, width 8 stride 2 -> starts 0,2,4: 3 chunks per doc
    words = " ".join(f"t{i}" for i in range(12))
    df = pd.DataFrame({"doc_id": np.array([0, 1], dtype=np.int64),
                       "text": [words, words]})
    got = (chunk_dup_stats(rd.from_pandas(df), width=8, stride=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["n_chunks"].tolist() == [3, 3]
    assert got["n_dup_chunks"].tolist() == [3, 3]  # twin docs: all dup
    assert got["dup_chunk_ratio"].tolist() == [1000000, 1000000]


def test_rollup_sum_levels_hand_built():
    from raylink.ops import rollup_sum

    ds = ds_of({"a": ["x", "x", "y", "y", "y"],
                "b": ["p", "q", "p", "p", "q"],
                "v": [1, 2, 4, 8, 16]})
    out = rollup_sum(ds, ["a", "b"], "v", "t").to_pandas()
    got = {(r["a"], r["b"]): r["t"] for _, r in out.iterrows()}
    # pandas None/NaN normalization
    got = {(a if isinstance(a, str) else None,
            b if isinstance(b, str) else None): int(t)
           for (a, b), t in got.items()}
    assert got == {
        ("x", "p"): 1, ("x", "q"): 2, ("y", "p"): 12, ("y", "q"): 16,
        ("x", None): 3, ("y", None): 28, (None, None): 31,
    }
    assert len(out) == 7


def test_fuzzy_lookup_distances_and_tiebreak():
    from raylink.ops import fuzzy_lookup

    ds = ds_of({"s": ["kitten", "abc", "zzz", ""]})
    out = fuzzy_lookup(ds, "s", ["sitting", "abd", "abe"]).to_pandas()
    by = out.set_index("s")
    assert by.loc["kitten", "dist"] == 3  # classic
    # "abc" ties abd/abe at 1 -> lexicographically smallest candidate
    assert by.loc["abc", "best_match"] == "abd"
    assert by.loc["abc", "dist"] == 1
    assert by.loc["zzz", "dist"] == 3
    assert by.loc["", "best_match"] == "abd"  # "" -> insertions only
    assert by.loc["", "dist"] == 3


def test_running_total_order_and_exactness():
    from raylink.ops import running_total

    ds = ds_of({"k": [1, 1, 1, 2], "o": [3, 1, 2, 9],
                "v": np.array([10, 1, 100, 7], dtype=np.int64)})
    out = running_total(ds, "k", ["o"], "v", "run").to_pandas()
    out = out.sort_values(["k", "o"])
    assert out["run"].tolist() == [1, 101, 111, 7]


def test_running_total_rejects_floats():
    from raylink.ops import running_total

    ds = ds_of({"k": [1], "o": [1], "v": [1.5]})
    with pytest.raises(Exception):
        running_total(ds, "k", ["o"], "v").to_pandas()


def test_regex_extract_first_match_and_empty():
    from raylink.textops import regex_extract

    ds = ds_of({"doc_id": [1, 2, 3],
                "text": ["xx abcdefgh then zzzzzzzzz", "short words", None]})
    out = regex_extract(ds, pattern=r"[a-z]{8,}").to_pandas()
    out = out.sort_values("doc_id")
    assert out["extracted"].tolist() == ["abcdefgh", "", ""]


def test_cube_sum_all_subsets():
    from raylink.ops import cube_sum

    ds = ds_of({"a": ["x", "x", "y"], "b": ["p", "q", "p"],
                "v": [1, 2, 4]})
    out = cube_sum(ds, ["a", "b"], "v", "t").to_pandas()
    norm = {(r["a"] if isinstance(r["a"], str) else None,
             r["b"] if isinstance(r["b"], str) else None): int(r["t"])
            for _, r in out.iterrows()}
    assert norm == {
        ("x", "p"): 1, ("x", "q"): 2, ("y", "p"): 4,
        ("x", None): 3, ("y", None): 4,
        (None, "p"): 5, (None, "q"): 2,
        (None, None): 7,
    }
    assert len(out) == 8


def test_grouped_rank_ties_and_gaps():
    from raylink.ops import grouped_rank

    ds = ds_of({"g": [1, 1, 1, 1, 2], "v": [9.0, 9.0, 5.0, 7.0, 3.0]})
    out = grouped_rank(ds, "g", "v").to_pandas().sort_values(["g", "v"],
                                                             ascending=False)
    # g=1 desc: 9,9 -> rank 1,1; 7 -> 3 (gap); 5 -> 4. g=2: 3 -> 1
    assert out[out["g"] == 1]["rank"].tolist() == [1, 1, 3, 4]
    assert out[out["g"] == 2]["rank"].tolist() == [1]


def test_top_terms_counts_and_tiebreak():
    from raylink.textops import top_terms

    ds = ds_of({"text": ["aa bb aa", "bb cc. AA!", None, "dd dd dd"]})
    out = top_terms(ds, k=3).to_pandas()
    # counts: aa=3, bb=2, dd=3, cc=1 -> top3 by (n desc, term asc)
    assert list(zip(out["term"], out["n"])) == [("aa", 3), ("dd", 3),
                                                ("bb", 2)]


def test_top_terms_exchange_matches_dataset_path(monkeypatch):
    from raylink.textops import top_terms

    rng = np.random.RandomState(5)
    texts = [" ".join(f"t{rng.randint(0, 50)}" for _ in range(40))
             for _ in range(80)]
    ds = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(4)
    a = top_terms(ds, k=15).to_pandas().reset_index(drop=True)
    monkeypatch.setenv("RAYLINK_TOPTERMS_EXCHANGE", "dataset")
    b = top_terms(ds, k=15).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_grouped_entropy_hand_computed():
    from raylink.ops import grouped_entropy

    # g=1: counts {a:2, b:2} -> H = ln 2; g=2: single value -> H = 0
    ds = ds_of({"g": [1, 1, 1, 1, 2, 2], "v": ["a", "a", "b", "b", "x", "x"]})
    out = grouped_entropy(ds, "g", "v").to_pandas().sort_values("g")
    assert out["n_rows"].tolist() == [4, 2]
    assert out["entropy_fp"].tolist() == [
        int(np.floor(np.log(2) * 1e6 + 0.5)), 0]


def test_cooccurrence_hand_built():
    from raylink.ops import cooccurrence

    ds = ds_of({"g": [1, 1, 1, 1, 2, 2, 3],
                "i": ["x", "y", "y", "z", "x", "y", "x"]})
    out = cooccurrence(ds, "g", "i").to_pandas()
    got = {(r["a"], r["b"]): int(r["n"]) for _, r in out.iterrows()}
    # g1: {x,y,z} -> xy, xz, yz; g2: {x,y} -> xy; g3: {x} -> none
    assert got == {("x", "y"): 2, ("x", "z"): 1, ("y", "z"): 1}
    out2 = cooccurrence(ds, "g", "i", min_count=2).to_pandas()
    assert {(r["a"], r["b"]) for _, r in out2.iterrows()} == {("x", "y")}


def test_cooccurrence_pmi_hand_computed():
    from raylink.ops import cooccurrence_pmi

    # groups: g1={x,y}, g2={x,y}, g3={x}, g4={z}  (N=4, nx=3, ny=2, nz=1)
    ds = ds_of({"g": [1, 1, 2, 2, 3, 4], "i": ["x", "y", "x", "y", "x", "z"]})
    out = cooccurrence_pmi(ds, "g", "i").to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["a"], r["b"], r["n"]) == ("x", "y", 2)
    # PMI = ln(2*4/(3*2)) = ln(4/3)
    assert r["pmi_fp"] == int(np.floor(np.log(2 * 4.0 / (3.0 * 2.0)) * 1e6 + 0.5))


def test_sliding_count_value_based_frame():
    from raylink.ops import sliding_count

    ts = pd.to_datetime(["2020-01-01 00:00:00", "2020-01-01 00:30:00",
                         "2020-01-01 01:00:00", "2020-01-01 02:30:00",
                         "2020-01-01 02:30:00"])
    ds = ds_of({"event_id": [1, 2, 3, 4, 5], "u": [7, 7, 7, 7, 7],
                "ts": ts})
    out = sliding_count(ds, "u", "ts", window_us=3_600_000_000,
                        ).to_pandas().sort_values("event_id")
    # 00:00 -> {1}; 00:30 -> {1,2}; 01:00 -> {1,2,3} (inclusive 1h);
    # 02:30 twins -> both count both ties -> 2 each
    assert out["n_window"].tolist() == [1, 2, 3, 2, 2]


def test_remove_dup_chunks_rewrite():
    from raylink.dedup import remove_dup_chunks

    c1 = "a b c d e f g h"          # 8-token chunk
    c2 = "p q r s t u v w"
    ds = ds_of({"doc_id": [1, 2, 3],
                "text": [f"{c1} {c2} tail1 tail2",   # canonical for c1, c2
                         f"{c2} {c1}",               # both dup -> all dropped
                         "short text"]})
    out = remove_dup_chunks(ds).to_pandas().set_index("doc_id")
    assert out.loc[1, "clean_text"] == f"{c1} {c2} tail1 tail2"
    assert out.loc[1, "n_dropped"] == 0
    # doc 2: c2 at idx0 and c1 at idx1 both already seen in doc 1
    assert out.loc[2, "clean_text"] == ""
    assert out.loc[2, "n_dropped"] == 2
    assert out.loc[3, "clean_text"] == "short text"  # tail-only, kept
    assert out.loc[3, "n_dropped"] == 0


def test_hash_join_full_outer():
    from raylink.ops import hash_join

    left = ds_of({"k": [1, 2, 3], "l": ["a", "b", "c"]})
    right = ds_of({"k": [2, 3, 4], "r": [20, 30, 40]})
    out = hash_join(left, right, "k", how="full_outer",
                    num_partitions=4).to_pandas().sort_values("k")
    assert out["k"].tolist() == [1, 2, 3, 4]
    assert out["l"].tolist()[:3] == ["a", "b", "c"] and pd.isna(
        out["l"].iloc[3])
    assert pd.isna(out["r"].iloc[0]) and out["r"].tolist()[1:] == [20, 30, 40]


def test_rollup_and_entropy_property_random_tables():
    """Property check on random small tables: rollup levels equal pandas
    re-aggregation; grouped entropy equals the direct formula."""
    from hypothesis import given, settings, strategies as st

    from raylink.ops import grouped_entropy, rollup_sum

    @settings(max_examples=12, deadline=None)
    @given(st.lists(st.tuples(st.sampled_from("ab"), st.sampled_from("xyz"),
                              st.integers(-50, 50)),
                    min_size=1, max_size=30))
    def check(rows):
        df = pd.DataFrame(rows, columns=["a", "b", "v"])
        ds = ds_of({"a": df["a"].tolist(), "b": df["b"].tolist(),
                    "v": df["v"].astype("int64").tolist()})
        out = rollup_sum(ds, ["a", "b"], "v", "t").to_pandas()
        norm = {(r["a"] if isinstance(r["a"], str) else None,
                 r["b"] if isinstance(r["b"], str) else None): int(r["t"])
                for _, r in out.iterrows()}
        expect = {}
        for (a, b), sub in df.groupby(["a", "b"]):
            expect[(a, b)] = int(sub["v"].sum())
        for a, sub in df.groupby("a"):
            expect[(a, None)] = int(sub["v"].sum())
        expect[(None, None)] = int(df["v"].sum())
        assert norm == expect

        ent = grouped_entropy(ds, "a", "b").to_pandas()
        for _, r in ent.iterrows():
            counts = df[df["a"] == r["a"]]["b"].value_counts().to_numpy(
            ).astype(np.float64)
            n = counts.sum()
            s = np.floor(counts * np.log(counts) * 1e9 + 0.5).astype(
                np.int64).sum()
            h = np.log(n) - (float(s) / 1e9) / n
            assert r["entropy_fp"] == int(np.floor(h * 1e6 + 0.5))
            assert r["n_rows"] == int(n)

    check()


def test_fuzzy_lookup_property_vs_reference_dp():
    from hypothesis import given, settings, strategies as st

    from raylink.ops import fuzzy_lookup

    def ref_lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    cands = ["abc", "abcd", "xyz", ""]

    @settings(max_examples=10, deadline=None)
    @given(st.lists(st.text(alphabet="abcxyz", max_size=6),
                    min_size=1, max_size=12))
    def check(vals):
        ds = ds_of({"s": vals})
        out = fuzzy_lookup(ds, "s", cands).to_pandas()
        for _, r in out.iterrows():
            best = min(((ref_lev(r["s"], c), c) for c in sorted(cands)),
                       key=lambda t: (t[0], t[1]))
            assert (r["dist"], r["best_match"]) == best

    check()


def test_grouped_mad_exact_quarter_grid():
    from raylink.ops import grouped_mad

    # g=1: vals 1,2,4,10 -> med 3.0, |d| = 2,1,1,7 -> mad 1.5 -> x4 = 6
    ds = ds_of({"g": [1, 1, 1, 1, 2],
                "v": np.array([1, 2, 4, 10, 5], np.int64)})
    out = grouped_mad(ds, "g", "v").to_pandas().sort_values("g")
    assert out["mad_x4"].tolist() == [6, 0]


def test_grouped_percent_rank_hand_case():
    from raylink.ops import grouped_percent_rank

    ds = ds_of({"g": [1, 1, 1, 1, 2], "v": [10.0, 20.0, 20.0, 40.0, 7.0]})
    out = grouped_percent_rank(ds, "g", "v").to_pandas().sort_values(
        ["g", "v"])
    # ranks asc: 1,2,2,4 over n=4 -> pr = 0, 1/3, 1/3, 1; single row -> 0
    third = int(np.floor(1 / 3 * 1e6 + 0.5))
    assert out["prank_fp"].tolist() == [0, third, third, 1_000_000, 0]


def test_json_extract_int_missing_and_negative():
    from raylink.textops import json_extract_int

    ds = ds_of({"props": ['{"k": 7}', '{"k": -3, "z": 1}', '{"z": 9}',
                          None]})
    out = json_extract_int(ds, "props", "k").to_pandas()
    got = out["k"].tolist()
    assert got[0] == 7 and got[1] == -3
    assert pd.isna(got[2]) and pd.isna(got[3])


def test_mode_value_high_cardinality_bounded_driver():
    """Exact mode via the MG two-pass (sketches.mode_value): matches the
    full grouped count on a 50k-distinct column while the verify pass
    broadcasts only a tiny candidate set (VERDICT r2 item #7)."""
    from raylink.sketches import mode_value

    rng = np.random.default_rng(11)
    tail = rng.integers(10_000, 60_000, 20_000).astype(np.int64)
    hot = np.full(900, 77, np.int64)        # clear mode
    runner = np.full(880, 33, np.int64)     # close runner-up
    v = np.concatenate([tail, hot, runner])
    rng.shuffle(v)
    ds = rd.from_arrow(pa.table({"u": pa.array(v)})).repartition(11)
    val, info = mode_value(ds, "u", k=256)
    assert val == 77
    assert info["exact_via_sketch"]
    # driver-byte bound: candidates within slack of the max, not the
    # 50k-value dictionary
    assert info["n_candidates"] < 1000
    # min-value tiebreak on an exact tie
    tie = np.concatenate([np.full(50, 5, np.int64), np.full(50, 3, np.int64),
                          np.arange(100, 140, dtype=np.int64)])
    val2, _ = mode_value(rd.from_arrow(pa.table({"u": pa.array(tie)}))
                         .repartition(4), "u", k=64)
    assert val2 == 3
    # pathologically flat distribution: guard trips, fallback stays exact
    flat = np.arange(2000, dtype=np.int64)
    val3, info3 = mode_value(rd.from_arrow(pa.table({"u": pa.array(flat)}))
                             .repartition(4), "u", k=8)
    assert val3 == 0 and not info3["exact_via_sketch"]


def test_resample_regrid_interp_and_edges():
    """resample_regrid: exact integer interpolation, duplicate-ts collapse
    (max vf), single-sample keys, negative-value guard."""
    from raylink.ops import resample_regrid

    df = pd.DataFrame({
        "k": [1, 1, 1, 1, 2, 3],
        # key 1: samples at t=5,5(dup),10,30; step 10 grid -> 10, 20, 30
        "t": pd.to_datetime([5, 5, 10, 30, 95, 40], unit="us"),
        "v": [0.002, 0.001, 0.010, 0.030, 0.007, 0.004],
    })
    out = (resample_regrid(rd.from_pandas(df).repartition(3), "k", "t", "v",
                           step=10, scale=1000.0)
           .to_pandas().sort_values(["k", "t_grid"]).reset_index(drop=True))
    # key 1 @10 -> sample hit (vf=10); @20 -> between (10,10) and (30,30):
    # (10*10 + 30*10)//20 = 20; @30 -> sample hit (vf=30)
    k1 = out[out.k == 1]
    assert k1.t_grid.tolist() == [10, 20, 30]
    assert k1.v_fp.tolist() == [10, 20, 30]
    # key 2: single sample at t=95 -> no grid multiple inside [95, 95]
    assert (out.k == 2).sum() == 0
    # key 3: single sample exactly on the lattice -> one exact row
    k3 = out[out.k == 3]
    assert k3.t_grid.tolist() == [40] and k3.v_fp.tolist() == [4]
    with pytest.raises(Exception):
        resample_regrid(
            rd.from_pandas(pd.DataFrame({
                "k": [1, 1], "t": pd.to_datetime([0, 10], unit="us"),
                "v": [-5.0, 1.0]})), "k", "t", "v", step=5).to_pandas()


def test_matrix_profile_discords_vs_bruteforce():
    """_mp_best_corr == brute-force z-norm NN correlation (identical float
    expression over exact integer window sums); the halo-sharded
    single-series path is bit-equal to the in-core kernel; series_discords
    returns the k smallest best-corr rows."""
    from raylink.ops import (_mp_best_corr, matrix_profile_discords_single,
                             series_discords)

    rng = np.random.default_rng(31)
    m, n = 6, 90
    v = rng.integers(0, 5000, n).astype(np.int64)
    v[40:46] = np.arange(6) * 900  # a planted unique shape
    best, has = _mp_best_corr(v, m)

    nw = n - m + 1
    S = np.array([v[i:i + m].sum() for i in range(nw)])
    Q = np.array([(v[i:i + m] ** 2).sum() for i in range(nw)])
    sig = np.sqrt((m * Q - S * S).astype(np.float64))
    exp = np.full(nw, -np.inf)
    exp_has = np.zeros(nw, bool)
    for i in range(nw):
        if m * Q[i] - S[i] * S[i] <= 0:
            continue
        for j in range(nw):
            if abs(j - i) < m or m * Q[j] - S[j] * S[j] <= 0:
                continue
            qt = int((v[i:i + m] * v[j:j + m]).sum())
            c = float(m * qt - S[i] * S[j]) / (sig[i] * sig[j])
            exp[i] = max(exp[i], c)
            exp_has[i] = True
    assert np.array_equal(has, exp_has)
    assert np.array_equal(best[has], exp[exp_has])  # bit-equal floats

    sharded = matrix_profile_discords_single(v, m=m, k=5, n_shards=7)
    fp = np.floor(best[has] * 1e9 + 0.5).astype(np.int64)
    pos = np.flatnonzero(has)
    order = np.lexsort((pos, fp))[:5]
    assert sharded["pos"].to_pylist() == pos[order].tolist()
    assert sharded["mp_corr_fp"].to_pylist() == fp[order].tolist()

    # Dataset-level per-key path: discord (smallest best-corr) comes first
    df = pd.DataFrame({"k": 1, "t": np.arange(n), "val": v / 100.0})
    out = series_discords(rd.from_pandas(df).repartition(3), "k", "val",
                          ["t"], m=m, k=3, scale=100.0).to_pandas()
    assert len(out) == 3
    assert out["mp_corr_fp"].tolist() == sorted(fp)[:3]
