"""CLI + plugin-registry tests (SURVEY §2.10 user-extension surface)."""

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pcompress_ray.config import PipelineConfig


def test_registry_resolve_and_register():
    from pcompress_ray.registry import names, register, resolve
    from pcompress_ray.stages.cdc import CDCChunker

    cfg = PipelineConfig()
    ch = resolve("chunker", "rabin")(cfg)
    assert isinstance(ch, CDCChunker) and ch.mode == "rabin"
    assert resolve("chunker", "fixed")(cfg).mode == "fixed"
    assert {"rabin", "fixed"} <= set(names("chunker"))

    @register("chunker", "test_custom")
    def custom(cfg):
        return CDCChunker(cfg, mode="fixed", fixed_block_size=128)

    assert resolve("chunker", "test_custom")(cfg).fixed_block == 128
    with pytest.raises(KeyError):
        resolve("chunker", "nope")
    with pytest.raises(KeyError):
        register("nosuchslot", "x")


def test_fixed_chunker_pipeline_runs(ray_session):
    """The registry's 'fixed' chunker (-F mode) drives the full pipeline."""
    import ray.data as rd

    import pcompress_ray

    pcompress_ray.register_for_ray()
    from pcompress_ray.pipelines.dedup import dedup_pipeline
    from pcompress_ray.sources.corpus import make_corpus

    pages, _, _ = make_corpus(50, 42, with_oracle=False)
    pages = pages.append_column(
        "rank", pa.array(np.arange(len(pages["url"]), dtype=np.int64)))
    res = dedup_pipeline(rd.from_arrow(pages).repartition(2),
                         PipelineConfig(chunker="fixed"), compute_pairs=False)
    assert res.clusters.count() == 50
    # exact duplicate docs must still cluster (doc-hash layer is chunker-free)
    cl = res.clusters.to_pandas()
    assert (~cl.is_canonical).sum() > 0


def test_cli_dedup_roundtrip(ray_session, tmp_path, capsys):
    """CLI dedup command end-to-end: parquet in -> clusters/lineage/metrics
    out (rank derived from url order)."""
    import pcompress_ray

    pcompress_ray.register_for_ray()
    from pcompress_ray.cli import cmd_dedup
    from pcompress_ray.sources.corpus import make_corpus

    pages, _, _ = make_corpus(50, 42, with_oracle=False)
    inp = str(tmp_path / "pages.parquet")
    pq.write_table(pages, inp)  # NO rank column — CLI must derive it
    out = str(tmp_path / "out")
    rc = cmd_dedup(argparse.Namespace(
        input=inp, output=out, checkpoint_dir=None, locality_sort=False,
        pairs=False, num_cpus=None))
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["n_docs"] == 50
    assert os.path.isdir(os.path.join(out, "clusters"))
    assert os.path.exists(os.path.join(out, "lineage.parquet"))


def test_cli_archive_restore_append(ray_session, tmp_path, capsys):
    """CLI archive -> append -> restore chain: parquet docs in, archive
    dir out, appended batch folded in, restore exits 0 with every SHA
    verified (exit 1 on any mismatch is the integrity contract)."""
    import pcompress_ray

    pcompress_ray.register_for_ray()
    from pcompress_ray.cli import cmd_archive, cmd_restore
    from pcompress_ray.sources.corpus import make_corpus

    pages, _, _ = make_corpus(60, 42, with_oracle=False)
    inp = str(tmp_path / "pages.parquet")
    pq.write_table(pages.select(["url", "text"]), inp)
    arch = str(tmp_path / "arch")
    rc = cmd_archive(argparse.Namespace(
        input=inp, output=arch, text_col="text", near_dedup=False,
        append=False, num_cpus=None))
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["n_docs"] == 60 and line["overall_ratio"] > 1.0

    more, _, _ = make_corpus(30, 99, with_oracle=False)
    inp2 = str(tmp_path / "more.parquet")
    pq.write_table(pa.table({
        "url": pa.array([f"b://{u}" for u in more["url"].to_pylist()]),
        "text": more["text"]}), inp2)
    rc = cmd_archive(argparse.Namespace(
        input=inp2, output=arch, text_col="text", near_dedup=False,
        append=True, num_cpus=None))
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["n_new_docs"] == 30

    out = str(tmp_path / "restored")
    rc = cmd_restore(argparse.Namespace(input=arch, output=out,
                                        num_cpus=None))
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["n_docs"] == 90 and line["n_sha_ok"] == 90


def test_cli_spans_modes(ray_session, tmp_path, capsys):
    """CLI spans command: coverage / excise / anchors over a pages parquet
    without doc_id (derived from url rank); excise output splices text."""
    import pandas as pd

    import pcompress_ray

    pcompress_ray.register_for_ray()
    from pcompress_ray.cli import cmd_spans
    from pcompress_ray.sources.corpus import make_corpus

    pages, _, _ = make_corpus(40, 7, with_oracle=False)
    inp = str(tmp_path / "pages.parquet")
    pq.write_table(pages.select(["url", "text"]), inp)

    for mode in ("coverage", "excise", "anchors"):
        out = str(tmp_path / mode)
        rc = cmd_spans(argparse.Namespace(
            input=inp, output=out, mode=mode, length=16, window=4,
            against=None, num_cpus=None))
        assert rc == 0
        line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert line["mode"] == mode and line["n_rows"] >= 1

    ex = pd.read_parquet(str(tmp_path / "excise"))
    assert set(ex.columns) == {"doc_id", "new_text", "removed_chars"}
    assert len(ex) == 40 and (ex["removed_chars"] >= 0).all()
    # the planted-duplicate corpus must lose SOMETHING to self-excision
    assert ex["removed_chars"].sum() > 0


def test_cli_ingest_warc_dir(ray_session, tmp_path, capsys):
    """CLI ingest: .warc.gz directory -> pages parquet with extracted text
    and a derived rank column, ready for `dedup`."""
    import pcompress_ray

    pcompress_ray.register_for_ray()
    from pcompress_ray.cli import cmd_ingest
    from pcompress_ray.sources.warc import _EPOCH_BASE, synth_html, write_warc

    wd = tmp_path / "warc"
    wd.mkdir()
    for f in range(2):
        recs = [(f"http://s{f}.example.com/p/{i}", _EPOCH_BASE + i,
                 synth_html(i, f"alpha beta gamma {f} {i}"))
                for i in range(10)]
        (wd / f"p{f}.warc.gz").write_bytes(
            write_warc(recs, gzip_per_record=True))
    out = str(tmp_path / "pages")
    rc = cmd_ingest(argparse.Namespace(input=str(wd), output=out,
                                       num_cpus=None))
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["n_pages"] == 20
    t = pq.read_table(out)
    assert len(t) == 20
    assert {"url", "warc_ts", "html", "text", "rank"} <= set(t.schema.names)
    # extractor really stripped the tags
    assert "<html>" not in t["text"][0].as_py()
    # rank is the dense url order
    ranks = sorted(t["rank"].to_pylist())
    assert ranks == list(range(20))


def test_cli_scrub_and_schedule(ray_session, tmp_path, capsys):
    """scrub removes cross-doc boilerplate lines; schedule parses hosts
    from urls and caps per-round host fetches."""
    import pandas as pd
    import pcompress_ray

    pcompress_ray.register_for_ray()
    from pcompress_ray.cli import cmd_schedule, cmd_scrub

    docs = pa.table({
        "url": pa.array([f"https://h{i % 2}.ex/p{i}" for i in range(6)]),
        "text": pa.array(["nav bar\nbody %d" % i for i in range(6)]),
    })
    inp = str(tmp_path / "docs.parquet")
    pq.write_table(docs, inp)

    out = str(tmp_path / "scrubbed")
    rc = cmd_scrub(argparse.Namespace(input=inp, output=out, min_docs=2,
                                      num_cpus=None))
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["n_removed"] == 6          # 'nav bar' in all 6 docs
    got = pd.read_parquet(out)
    # doc_id is url-lexicographic rank; compare as a set of cleaned texts
    assert sorted(got["new_text"]) == [f"body {i}" for i in range(6)]

    out2 = str(tmp_path / "sched")
    rc = cmd_schedule(argparse.Namespace(input=inp, output=out2,
                                         per_round=2, num_cpus=None))
    assert rc == 0
    sched = pd.read_parquet(out2)
    assert set(sched["host"]) == {"h0.ex", "h1.ex"}
    per = sched.groupby(["host", "fetch_round"]).size()
    assert (per <= 2).all()
    assert sched["fetch_round"].max() == 1  # 3 urls/host at cap 2 -> 2 rounds


def test_cli_search(ray_session, tmp_path, capsys):
    """search returns the doc with the highest query-term density first."""
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["ray data engine", "ray ray ray data",
                          "unrelated words entirely"]),
    })
    inp = str(tmp_path / "d.parquet")
    pq.write_table(docs, inp)
    from pcompress_ray.cli import cmd_search

    rc = cmd_search(argparse.Namespace(input=inp, terms=["ray"], k=2,
                                       num_cpus=None))
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    hits = line["hits"]
    assert [h["doc_id"] for h in hits] == [1, 0]
    assert hits[0]["score_e6"] > hits[1]["score_e6"] > 0


def test_bm25_absent_terms_typed_empty(ray_session):
    import ray.data as rd

    from pcompress_ray.stages.search import bm25_topk

    docs = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                     "text": pa.array(["alpha beta", "gamma delta"])})
    out = bm25_topk(rd.from_arrow(docs), ["zzz"], k=5)
    assert out.count() == 0
    assert out.schema().names == ["doc_id", "n_terms", "score_e6"]


def test_cli_curate(ray_session, tmp_path, capsys):
    """curate CLI: pages parquet in -> curated parquet + funnel json."""
    import numpy as np
    import pcompress_ray

    pcompress_ray.register_for_ray()
    from pcompress_ray.cli import cmd_curate

    rng = np.random.default_rng(3)
    texts = []
    for i in range(12):
        toks = [f"w{int(x)}" for x in rng.integers(0, 500, 60)]
        toks[0] = "the"
        texts.append(" ".join(toks))
    texts[11] = texts[0]  # exact dup under a different url
    pages = pa.table({
        "url": pa.array([f"http://c{i}.ex/p" for i in range(12)]),
        "text": pa.array(texts)})
    inp = str(tmp_path / "p.parquet")
    pq.write_table(pages, inp)
    out = str(tmp_path / "cur")
    rc = cmd_curate(argparse.Namespace(input=inp, output=out,
                                       benchmark=None, min_docs_line=2,
                                       checkpoint_dir=None,
                                       num_cpus=None))
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    f = line["funnel"]
    assert f["raw"] == 12 and f["near_dedup"] == 11
    vals = list(f.values())
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_optional_codec_slots_probe_guarded():
    """zstd/lz4 registry slots (pcompress.h:126-314 vtable parity) appear
    iff their wheel imports on this host; when absent, the codec name is
    NOT listed and calling it fails with a clear ValueError."""
    import pytest

    from pcompress_ray import registry
    from pcompress_ray.stages.compress import (OPTIONAL_CODECS,
                                               compress_chunk,
                                               decompress_chunk)

    listed = registry.names("codec")
    for name in ("zstd", "lz4"):
        if name in OPTIONAL_CODECS:
            assert name in listed
            payload = b"the same bytes again and again " * 40
            assert decompress_chunk(compress_chunk(payload, name),
                                    name) == payload
        else:
            assert name not in listed
            with pytest.raises(ValueError, match="unavailable"):
                compress_chunk(b"x", name)
            with pytest.raises(ValueError, match="unavailable"):
                decompress_chunk(b"x", name)


def test_cli_select_dsir(ray_session, tmp_path, capsys):
    """select picks mostly target-style docs and writes them with scores."""
    rng = np.random.default_rng(9)
    sci = [f"atom{i}" for i in range(40)]
    spam = [f"buy{i}" for i in range(40)]
    raw_texts = [" ".join(rng.choice(sci if i % 2 == 0 else spam, 30))
                 for i in range(40)]
    tgt_texts = [" ".join(rng.choice(sci, 30)) for _ in range(10)]
    raw_p = str(tmp_path / "raw.parquet")
    tgt_p = str(tmp_path / "tgt.parquet")
    out_p = str(tmp_path / "sel")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": pa.array(raw_texts)}), raw_p)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "text": pa.array(tgt_texts)}), tgt_p)
    from pcompress_ray.cli import cmd_select

    rc = cmd_select(argparse.Namespace(
        input=raw_p, target=tgt_p, output=out_p, k=10, seed=0,
        id_col="doc_id", text_col="text", num_cpus=None))
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["k"] == 10
    got = pq.read_table(out_p).to_pandas()
    assert len(got) == 10
    assert {"doc_id", "text", "score_e6"} <= set(got.columns)
    # selection is importance-biased: >=8 of 10 picks are sci (even ids)
    assert (got["doc_id"].to_numpy() % 2 == 0).sum() >= 8


def test_cli_reweight_softdedup(ray_session, tmp_path, capsys):
    """reweight writes integer SoftDeDup weights; dups share downweight."""
    texts = ["alpha beta gamma"] * 3 + ["delta one", "epsilon two"]
    inp = str(tmp_path / "docs.parquet")
    out_p = str(tmp_path / "w")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(texts)}), inp)
    from pcompress_ray.cli import cmd_reweight

    rc = cmd_reweight(argparse.Namespace(
        input=inp, output=out_p, alpha=1,
        id_col="doc_id", text_col="text", num_cpus=None))
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["alpha"] == 1
    got = pq.read_table(out_p).to_pandas().sort_values("doc_id")
    assert list(got["dup_count"]) == [3, 3, 3, 1, 1]
    assert list(got["weight_e6"]) == [333333] * 3 + [1000000] * 2
    # mean-1 normalization: total mass within n_docs of n_docs * 1e6
    assert abs(got["norm_weight_e6"].sum() - 5_000_000) <= 5
