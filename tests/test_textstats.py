"""Unit tests for text-analysis stages + ANN + multimodal plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pcompress_ray.stages.textstats import (
    doc_stats_batch,
    fingerprint_batch,
    lang_id_batch,
    quality_batch,
)


def _df(texts):
    return pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})


def test_doc_stats_counts():
    out = doc_stats_batch(_df(["Hello, world! 42", "", "a b c"]))
    assert out.n_chars.tolist() == [16, 0, 5]
    assert out.n_tokens.tolist() == [3, 0, 3]
    assert out.punct_count.tolist() == [2, 0, 0]


def test_lang_id_heuristic():
    out = lang_id_batch(_df([
        "the cat and the dog of the house is big",
        "der hund und die katze ist nicht ein tier",
        "le chat est dans les maisons pour une nuit",
        "el gato es una cosa para como siempre",
        "il gatto che per con sono della casa",
        "het huis een van niet dat zijn hier",
        "os gatos uma com nao por mais tempo",
        "这是一个没有空格的中文文档",
        "xyzzy qwerty asdf",
    ]))
    assert out.lang_pred.tolist() == [
        "en", "de", "fr", "es", "it", "nl", "pt", "zh", "unk"]


def test_lang_id_tie_breaks_alphabetical():
    # one stopword hit for en and fr each -> earliest alphabetical max wins
    out = lang_id_batch(_df(["the est", "und the est el"]))
    assert out.lang_pred.tolist() == ["en", "de"]


def test_quality_score_ranges():
    out = quality_batch(_df(["the and of to in is " * 50, "!!!???", ""]))
    assert ((out.quality_score >= 0) & (out.quality_score <= 1)).all()
    assert out.quality_score.iloc[0] > out.quality_score.iloc[1]


def test_fingerprint_deterministic_and_shift_invariant():
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    f1 = fingerprint_batch(_df([base])).fingerprint.iloc[0]
    f2 = fingerprint_batch(_df([base])).fingerprint.iloc[0]
    assert f1 == f2
    # min-hash fingerprint is robust to appends (min over ngrams persists)
    f3 = fingerprint_batch(_df([base + " omega extra tokens"])).fingerprint.iloc[0]
    assert f3 <= f1


def test_ann_brute_force(ray_session):
    import ray.data as rd

    import pcompress_ray

    pcompress_ray.register_for_ray()
    from pcompress_ray.stages.ann import brute_force_topk

    rng = np.random.default_rng(9)
    M = rng.standard_normal((300, 16)).astype(np.float32)
    tab = pa.table({"vec_id": pa.array(np.arange(300, dtype=np.int64)),
                    "embedding": pa.array([list(r) for r in M],
                                          pa.list_(pa.float32()))})
    ds = rd.from_arrow(tab).repartition(4)
    out = brute_force_topk(ds, np.arange(5), k=3).to_pandas()
    # oracle
    Mn = M.astype(np.float64)
    Mn /= np.linalg.norm(Mn, axis=1, keepdims=True)
    S = Mn @ Mn.T
    for q in range(5):
        s = S[q].copy()
        s[q] = -np.inf
        want = set(np.argsort(-s)[:3].tolist())
        got = set(out[out.query_id == q].neighbor_id.astype(int).tolist())
        assert got == want, (q, got, want)


def test_multimodal_plumbing(ray_session):
    import ray.data as rd

    import pcompress_ray

    pcompress_ray.register_for_ray()
    from pcompress_ray.stages.multimodal import (
        FrameSampleStage,
        ImageDecodeStage,
        detect_media_type,
        make_fake_media_table,
    )

    tab = make_fake_media_table(30)
    assert detect_media_type(tab["payload"][0].as_py()) == "image/png"
    ds = rd.from_arrow(tab)
    feats = ds.map_batches(ImageDecodeStage, fn_constructor_kwargs={"dim": 8},
                           batch_format="pyarrow", batch_size=16,
                           concurrency=(1, 2)).to_pandas()
    assert len(feats) == 30
    assert all(len(f) == 8 for f in feats.features)
    assert (feats.media_type == feats.media_type_detected).all()
    # deterministic features
    f2 = ds.map_batches(ImageDecodeStage, fn_constructor_kwargs={"dim": 8},
                        batch_format="pyarrow", batch_size=16,
                        concurrency=(1, 2)).to_pandas()
    assert all((np.asarray(a) == np.asarray(b)).all()
               for a, b in zip(feats.features, f2.features))
    # frame sampling expands rows deterministically
    frames = ds.map_batches(FrameSampleStage, batch_format="pyarrow",
                            batch_size=16, concurrency=(1, 2)).to_pandas()
    assert frames.media_id.nunique() == 30
    assert (frames.groupby("media_id").frame_idx.min() == 0).all()


def test_decode_stub_raises_without_fake():
    from pcompress_ray.stages.multimodal import ImageDecodeStage, make_fake_media_table

    stage = ImageDecodeStage(fake=False)
    with pytest.raises(NotImplementedError):
        stage(make_fake_media_table(2))


def test_stop_shingles_detects_template(ray_session):
    import ray
    import ray.data as rd

    import pcompress_ray

    pcompress_ray.register_for_ray()
    from pcompress_ray.config import PipelineConfig
    from pcompress_ray.sources.corpus import make_corpus
    from pcompress_ray.stages.signatures import SignatureStage, compute_stop_shingles

    cfg = PipelineConfig()
    pages, _, _ = make_corpus(100, 7)
    pages = pages.append_column("rank", pa.array(np.arange(100), pa.int64()))
    ds = rd.from_arrow(pages)
    stop = compute_stop_shingles(ds, cfg)
    # the shared nav/footer template yields a stable stop set
    assert 10 <= stop.size <= 200
    stop2 = compute_stop_shingles(rd.from_arrow(pages).repartition(7), cfg)
    assert (np.sort(stop) == np.sort(stop2)).all()


def test_token_kernel_edge_cases():
    """Empty text / all-space text / single-token docs through the shared
    tokenization kernels: no rows for token-free docs (matching the SQL
    twins' UNNEST), exact counts otherwise."""
    import pyarrow as pa

    from pcompress_ray.stages.textstats import (bigram_counts,
                                                doc_token_counts,
                                                gopher_stats_batch)

    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "text": pa.array(["", "   ", "solo", "a a a a a a a a a a"],
                                   pa.string())})
    g = gopher_stats_batch(t).to_pandas().set_index("doc_id")
    assert list(g.index) == [3, 4]  # docs 1,2 emit no row
    assert g.loc[3, "n_tokens"] == 1 and g.loc[3, "top_ratio_e6"] == 1_000_000
    assert g.loc[4, "n_tokens"] == 10 and g.loc[4, "n_distinct"] == 1
    assert g.loc[4, "pass_gopher"] == 0  # top ratio 1.0 > 0.2

    c = doc_token_counts(t).to_pandas()
    assert len(c) == 2
    assert c.set_index("doc_id").loc[4, "c"] == 10

    b = bigram_counts(t).to_pandas().set_index("bigram")
    assert b.loc["a a", "n"] == 9  # no cross-doc bigrams, no empty tokens

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    assert len(gopher_stats_batch(empty)) == 0
    assert len(doc_token_counts(empty)) == 0
    assert len(bigram_counts(empty)) == 0


def test_token_kernels_accept_null_text():
    """Null text cells flow through every tokenization-based kernel as
    empty docs (the review-caught NaN-length crash class)."""
    import pyarrow as pa

    from pcompress_ray.stages.textstats import (bigram_counts,
                                                contamination_batch,
                                                doc_token_counts,
                                                gopher_stats_batch,
                                                lm_score_batch,
                                                unigram_vocab_counts)

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["a b", None, "b c"], pa.string())})
    g = gopher_stats_batch(t)
    assert g["doc_id"].to_pylist() == [1, 3]
    assert doc_token_counts(t).num_rows == 4
    assert bigram_counts(t)["bigram"].to_pylist() == ["a b", "b c"]
    v = unigram_vocab_counts(t).to_pandas().set_index("tok")["n"]
    assert v.to_dict() == {"a": 1, "b": 2, "c": 1}
    import numpy as np
    toks = np.array(["a", "b", "c"]); lp = np.array([10, 20, 30], np.int64)
    lm = lm_score_batch(t, toks, lp)
    assert lm["doc_id"].to_pylist() == [1, 3]  # null doc emits no row
    c = contamination_batch(t, {"a b"}, n=2)
    assert c["doc_id"].to_pylist() == [1, 2, 3]   # every doc emits a row
    assert c["n_contaminated"].to_pylist() == [1, 0, 0]


def test_lm_score_empty_model_raises():
    import pyarrow as pa
    import pytest

    from pcompress_ray.stages.textstats import lm_score_batch

    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["a b"], pa.string())})
    with pytest.raises(ValueError, match="empty model"):
        lm_score_batch(t, np.empty(0, object), np.empty(0, np.int64))


def test_doc_segments_fixed_windows():
    import pyarrow as pa

    from pcompress_ray.stages.textstats import doc_segments

    # doc 1: 12 tokens -> segs of 10 + 2; doc 2: exactly 3 (w=3) -> 1 seg;
    # doc 3: null -> no rows; doc 4: multi-space runs collapse (empty
    # tokens dropped before windowing, matching the oracle's list_filter)
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["t0 t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11",
                          "x y z", None, "a  b   c d"], pa.string())})
    s = doc_segments(t, w=10)
    assert s["doc_id"].to_pylist() == [1, 1, 2, 4]
    assert s["seg_no"].to_pylist() == [0, 1, 0, 0]
    assert s["seg"].to_pylist() == [
        "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9", "t10 t11", "x y z", "a b c d"]
    s3 = doc_segments(t, w=3)
    assert s3["seg"].to_pylist() == [
        "t0 t1 t2", "t3 t4 t5", "t6 t7 t8", "t9 t10 t11",
        "x y z", "a b c", "d"]
    empty = doc_segments(pa.table({"doc_id": pa.array([], pa.int64()),
                                   "text": pa.array([], pa.string())}))
    assert empty.num_rows == 0


def test_doc_token_len_counts_nonempty_tokens():
    import pyarrow as pa

    from pcompress_ray.stages.textstats import doc_token_len

    t = pa.table({"doc_id": pa.array([7, 8, 9], pa.int64()),
                  "text": pa.array(["a  b c", None, ""], pa.string())})
    out = doc_token_len(t)
    assert out["doc_id"].to_pylist() == [7, 8, 9]
    assert out["n_tokens"].to_pylist() == [3, 0, 0]


def test_intradoc_repetition_planted():
    import pyarrow as pa

    from pcompress_ray.stages.textstats import intradoc_repetition

    # doc 1: "a b c a b c a b" -> 3-grams: abc bca cab abc bca cab -> 6
    # grams, 3 distinct -> 3 dups (ratio 0.5); doc 2: all distinct;
    # doc 3: too short -> zeros; doc 4: null -> zeros
    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "text": pa.array(["a b c a b c a b", "p q r s",
                                    "x y", None], pa.string())})
    out = intradoc_repetition(t)
    assert out["doc_id"].to_pylist() == [1, 2, 3, 4]
    assert out["n_grams"].to_pylist() == [6, 2, 0, 0]
    assert out["n_dup_grams"].to_pylist() == [3, 0, 0, 0]
    assert out["dup_ratio_e6"].to_pylist() == [500000, 0, 0, 0]


def test_bench_jaccard_planted():
    """bench_jaccard_batch: identical doc -> J=1 flag, disjoint/short/null
    docs -> bench_id=-1; tie goes to the smaller bench id."""
    from pcompress_ray.stages.textstats import (bench_gram_index,
                                                bench_jaccard_batch)

    bench_ids = np.array([0, 1], dtype=np.int64)
    b0 = "alpha beta gamma delta epsilon zeta"         # 2 5-grams
    b1 = "one two three four five six seven"           # 3 5-grams
    vocab, mat, sizes = bench_gram_index(bench_ids, [b0, b1], n=5)
    assert sizes.tolist() == [2, 3]

    t = pa.table({
        "doc_id": pa.array([10, 11, 12, 13, 14], pa.int64()),
        "text": pa.array([
            b0,                      # identical to bench 0 -> J = 1
            "totally disjoint words here with no overlap at all",
            "short doc",             # < 5 tokens -> no grams
            None,                    # null text
            # shares its single 5-gram with BOTH benches? impossible here —
            # instead: shares 1 of bench1's grams -> J = 1/(1+3-1) = 1/3
            "one two three four five",
        ], pa.string()),
    })
    out = bench_jaccard_batch(t, vocab, mat, sizes, bench_ids, n=5,
                              thr_num=1, thr_den=5).to_pandas()
    r = out.set_index("doc_id")
    assert (r.loc[10, "bench_id"], r.loc[10, "n_inter"],
            r.loc[10, "n_union"], r.loc[10, "jacc_e6"],
            r.loc[10, "is_contaminated"]) == (0, 2, 2, 1_000_000, 1)
    for d in (11, 12, 13):
        assert (r.loc[d, "bench_id"], r.loc[d, "is_contaminated"]) == (-1, 0)
    assert (r.loc[14, "bench_id"], r.loc[14, "n_inter"],
            r.loc[14, "n_union"]) == (1, 1, 3)
    assert r.loc[14, "jacc_e6"] == 333_333
    assert r.loc[14, "is_contaminated"] == 1  # 1/3 >= 1/5


def test_nb_classifier_separable_accuracy():
    """nb_score_batch semantics: on a class-separable vocabulary the
    classifier must recover every label (and the e6-int pipeline must
    agree with a float reference argmin)."""
    import numpy as np
    import pyarrow as pa

    from pcompress_ray.stages.textstats import nb_score_batch, source_token_counts

    rng = np.random.default_rng(3)
    cls_vocab = {"a": ["apple", "ant", "axe"],
                 "b": ["bear", "bone", "bat"],
                 "c": ["cat", "coal", "cup"]}
    rows = []
    for ci, (c, vs) in enumerate(sorted(cls_vocab.items())):
        for d in range(30):
            toks = list(rng.choice(vs, 20)) + ["the", "and"]  # shared noise
            rows.append((ci * 30 + d, " ".join(toks), c))
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string()),
                  "source": pa.array([r[2] for r in rows], pa.string())})

    # fit exactly like q_nb_classify
    import pandas as pd
    ctc = source_token_counts(t).to_pandas()
    classes = np.sort(pd.unique(ctc["source"]))
    vocab = np.sort(pd.unique(ctc["tok"]))
    cmat = np.zeros((classes.size, vocab.size), np.int64)
    cmat[np.searchsorted(classes, ctc["source"]),
         np.searchsorted(vocab, ctc["tok"])] = ctc["n"].to_numpy(np.int64)
    tot = cmat.sum(axis=1)
    lp = np.floor(-np.log((cmat + 1.0) / (tot[:, None] + float(vocab.size)))
                  * 1e6 + 0.5).astype(np.int64)
    prior = np.floor(-np.log(np.full(classes.size, 1 / classes.size))
                     * 1e6 + 0.5).astype(np.int64)

    out = nb_score_batch(t, vocab, lp, prior, classes).to_pandas()
    assert len(out) == len(rows)
    assert (out["pred_source"] == out["true_source"]).all()

    # e6-int argmin == float argmin on this data
    lpf = -np.log((cmat + 1.0) / (tot[:, None] + float(vocab.size)))
    for did, txt, _ in rows[:10]:
        toks = txt.split()
        ix = np.searchsorted(vocab, toks)
        want = classes[np.argmin(lpf[:, ix].sum(axis=1))]
        got = out.loc[out.doc_id == did, "pred_source"].iloc[0]
        assert got == want
