"""Driver contract for the graft builder (Ray Data target).

entry(): flagship near-dup pipeline on sf0.001 documents.
queries(): one callable per implemented operator/pipeline (SURVEY.md §2).
oracle_sql(): DuckDB-equivalent SQL for every SQL-expressible query; column
names match exactly. Float aggregates are rounded on BOTH sides so the
order-insensitive value-hash compare is stable across engines.

Ray is initialised by the driver BEFORE importing this module — nothing here
calls ray.init/shutdown.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pandas as pd
import pyarrow as pa


def _setup():
    import pcompress_ray

    pcompress_ray.register_for_ray()
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
    except Exception:
        pass


def _read(sf_dir: str, table: str, columns=None, min_blocks: int = 8):
    import ray.data as rd

    path = os.path.join(sf_dir, f"{table}.parquet")
    kw = {}
    sz = os.path.getsize(path)
    if sz < (256 << 20):
        # small test tables: Ray's default split (2x CPUs = 64 blocks)
        # turns a 500-row file into 64 near-empty blocks and every
        # downstream operator into dozens of no-op tasks — size the block
        # count to the bytes instead (~4 MB/block, floor 8 for stage
        # parallelism). Queries whose map stages are CPU-BOUND per row
        # (archive compression, JPEG/AVI decode, delta coding) pass
        # min_blocks=32 so the expensive stage still fans out across the
        # machine. Big files keep Ray's row-group-driven default, which
        # is the right behavior at real scale.
        kw["override_num_blocks"] = max(min_blocks,
                                        min(64, int(sz // (4 << 20)) + 8))
    return rd.read_parquet(path, columns=columns, **kw)


# --------------------------------------------------------------------------
# flagship pipeline
# --------------------------------------------------------------------------

_DEDUP_MEMO: dict = {}


def _ray_session_key():
    """Job id of the LIVE ray session, else None. Memo entries are keyed
    by it so materialized datasets are never served across sessions (the
    blocks die with the session); None (no live session yet — Ray Data
    auto-inits on first execution) means 'do not memoize'."""
    import ray

    if not ray.is_initialized():
        return None
    try:
        return ray.get_runtime_context().get_job_id()
    except Exception:
        return None


def _dedup_clusters(sf_dir: str, compute_pairs: bool = False):
    """Near-dup detection + clustering over the documents table (adapted to
    the pages shape; rank = doc_id).

    Memoized per (sf_dir, ray session): the pipeline's outputs are
    MATERIALIZED datasets, and four driver queries (dedup_clusters,
    dedup_pairs, delta_gain, dedup_recall_eval) compose the same flagship
    run — re-executing it per query paid 3-4 s each for identical blocks.
    At most one corpus is held (the memo clears on sf_dir change); the
    session key is re-read AFTER the run (Ray is certainly live then), so
    a first call that auto-inits Ray still stores a usable entry and a
    dead session can never be served."""
    from pcompress_ray.config import PipelineConfig
    from pcompress_ray.pipelines.dedup import dedup_pipeline
    from pcompress_ray.sources.corpus import pages_from_documents

    _setup()
    sess = _ray_session_key()
    if sess is not None:
        # a compute_pairs=True result serves compute_pairs=False callers
        for cp in ({True, compute_pairs} if not compute_pairs
                   else {compute_pairs}):
            hit = _DEDUP_MEMO.get((sf_dir, cp, sess))
            if hit is not None:
                return hit

    pages = pages_from_documents(sf_dir)

    def add_rank(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return t.append_column("rank", t["doc_id"].cast(pa.int64()))

    pages = pages.map_batches(add_rank, batch_format="pyarrow")
    res = dedup_pipeline(pages, PipelineConfig(), compute_pairs=compute_pairs)
    sess = _ray_session_key()  # live now: materialize ran inside this run
    if sess is not None:
        _DEDUP_MEMO.clear()
        _DEDUP_MEMO[(sf_dir, compute_pairs, sess)] = res
    return res


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    res = _dedup_clusters("/root/testdata/sf0.001")
    return res.clusters.select_columns(["url", "cluster_id", "is_canonical"])


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def q_q1_pricing(sf_dir: str):
    """TPC-H Q1-style pricing summary (groupby aggregate, A4 analog)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    _setup()
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount"])

    def derive(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        return t.append_column("revenue", rev)

    out = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("l_quantity", alias_name="sum_qty"),
                      Sum("revenue", alias_name="sum_revenue"),
                      Count(alias_name="n_rows")))

    def rnd(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "sum_qty": pc.round(t["sum_qty"], 4),
            "sum_revenue": pc.round(t["sum_revenue"], 4),
            "n_rows": t["n_rows"].cast(pa.int64()),
        })

    return out.map_batches(rnd, batch_format="pyarrow")


def q_q3_top_orders(sf_dir: str):
    """3-way join + top-k (broadcast semi-join + partitioned agg)."""
    import pyarrow.compute as pc

    from pcompress_ray.functions.ops import broadcast_join, hash_join

    _setup()
    # filter the dimension distributively; only BUILDING keys reach the driver
    cust = (_read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
            .map_batches(lambda t: t.replace_schema_metadata(None)
                         .filter(pc.equal(t["c_mktsegment"], "BUILDING"))
                         .select(["c_custkey"]),
                         batch_format="pyarrow")
            .to_pandas())
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    o_b = broadcast_join(orders, cust, "o_custkey", "c_custkey")
    # the BUILDING orderkey set is small (≈20% of orders, 8 B each):
    # broadcast it as a semi-join filter instead of shuffling lineitem
    # through a hash join; fall back to the join past the driver guard
    okeys = np.unique(o_b.select_columns(["o_orderkey"]).to_pandas()
                      ["o_orderkey"].to_numpy(dtype=np.int64))
    if okeys.size <= 5_000_000:
        from pcompress_ray.functions.ops import semi_join_filter

        joined = semi_join_filter(li, okeys, on="l_orderkey")
    else:
        joined = hash_join(li, o_b.select_columns(["o_orderkey"]),
                           "l_orderkey", "o_orderkey", n_buckets=16)

    def derive(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        rev = pc.multiply(t["l_extendedprice"].cast(pa.float64()),
                          pc.subtract(1.0, t["l_discount"].cast(pa.float64())))
        return pa.table({"orderkey": t["l_orderkey"].cast(pa.int64()),
                         "revenue": rev})

    from pcompress_ray.functions.ops import grouped_partitions

    def agg_part(part: pd.DataFrame) -> pa.Table:
        g = part.groupby("orderkey", as_index=False, sort=False).agg(
            revenue=("revenue", "sum"), n_items=("revenue", "size"))
        return pa.table({
            "orderkey": pa.array(g["orderkey"].to_numpy(dtype=np.int64)),
            "revenue": pc.round(
                pa.array(g["revenue"].to_numpy(dtype=np.float64)), 4),
            "n_items": pa.array(g["n_items"].to_numpy(dtype=np.int64))})

    agg = grouped_partitions(joined.map_batches(derive, batch_format="pyarrow"),
                             ["orderkey"], agg_part, n_parts=32)
    return agg.sort(["revenue", "orderkey"],
                    descending=[True, False]).limit(10)


def q_customer_nation(sf_dir: str):
    """Broadcast join (small dimension side) + count per group."""
    from ray.data.aggregate import Count

    from pcompress_ray.functions.ops import broadcast_join

    _setup()
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j = broadcast_join(cust, nation, "c_nationkey", "n_nationkey")
    out = j.groupby("n_name").aggregate(Count(alias_name="n_customers"))

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"nation": t["n_name"].cast(pa.string()),
                         "n_customers": t["n_customers"].cast(pa.int64())})

    return out.map_batches(rn, batch_format="pyarrow")


def q_top_orders_per_segment(sf_dir: str):
    """Top-3 orders by total price per market segment — top-k PER GROUP,
    computed as map-side partial top-k per batch, then one vectorized
    final top-k per hash partition (never a global sort)."""
    from pcompress_ray.functions.ops import broadcast_join, grouped_partitions

    _setup()
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    j = broadcast_join(orders, cust, "o_custkey", "c_custkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # map-side combine: only each batch's per-segment top-3 survive
        return df.sort_values(["o_totalprice", "o_orderkey"],
                              ascending=[False, True]) \
            .groupby("c_mktsegment", sort=False).head(3)

    def final(part: pd.DataFrame) -> pd.DataFrame:
        if len(part) == 0:
            return pd.DataFrame({"segment": pd.Series(dtype=object),
                                 "o_orderkey": pd.Series(dtype=np.int64),
                                 "total_e2": pd.Series(dtype=np.int64)})
        top = part.sort_values(["o_totalprice", "o_orderkey"],
                               ascending=[False, True]) \
            .groupby("c_mktsegment", sort=False).head(3)
        return pd.DataFrame({
            "segment": top["c_mktsegment"].astype(str),
            "o_orderkey": top["o_orderkey"].to_numpy(dtype=np.int64),
            "total_e2": np.floor(top["o_totalprice"].to_numpy(np.float64)
                                 * 100 + 0.5).astype(np.int64)})

    parts = j.map_batches(partial, batch_format="pandas")
    return grouped_partitions(parts, ["c_mktsegment"], final, n_parts=8)


def q_customers_without_orders(sf_dir: str):
    """Anti-join: customers with NO order above 300k (distributed filter on
    the fact side, distinct keys pulled, broadcast key-set anti-filter)."""
    import pyarrow.compute as pc

    from pcompress_ray.functions.ops import semi_join_filter

    _setup()
    okeys = (_read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
             .map_batches(lambda t: t.replace_schema_metadata(None)
                          .filter(pc.greater(t["o_totalprice"], 300000.0))
                          .select(["o_custkey"]), batch_format="pyarrow")
             .to_pandas()["o_custkey"].unique())
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    out = semi_join_filter(cust, okeys, on="c_custkey", negate=True)

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"c_custkey": t["c_custkey"].cast(pa.int64()),
                         "c_name": t["c_name"].cast(pa.string())})

    return out.map_batches(rn, batch_format="pyarrow")


def q_key_skew(sf_dir: str):
    """Pre-shuffle skew diagnostic over events.user_id: per hash-bucket
    (user_id % 64) row count, distinct-key count, hottest key and its row
    count — the report you read BEFORE committing a 100-TB groupby to
    decide whether salting/combining is needed (functions/ops.skew_report;
    the engine acts on the same signal in stages/candidates.py salted
    windows)."""
    from pcompress_ray.functions.ops import skew_report

    _setup()
    ev = _read(sf_dir, "events", ["user_id"])
    out = skew_report(ev, "user_id", n_buckets=64, n_parts=32)

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({c: t[c].cast(pa.int64())
                         for c in ["bucket", "n_rows", "n_keys",
                                   "max_key_rows", "top_key"]})

    return out.map_batches(rn, batch_format="pyarrow")


def q_hourly_active_users(sf_dir: str):
    """Distinct users per hour: per-batch (hour, user) dedup (map-side
    combine), then vectorized distinct-count per hash partition."""
    from pcompress_ray.functions.ops import grouped_partitions

    _setup()
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hour = us // 3_600_000_000
        if uid.size and (uid.max() >= 1 << 32 or uid.min() < 0):
            raise ValueError("hourly_active_users packs (hour, user) into "
                             "one int64; user_id must fit in uint32")
        comp = np.unique((hour << np.int64(32)) | uid)  # batch-level dedup
        return pa.table({"hour_id": pa.array(comp >> np.int64(32)),
                         "comp": pa.array(comp)})

    def count(part: pd.DataFrame) -> pd.DataFrame:
        if len(part) == 0:
            return pd.DataFrame({"hour_id": pd.Series(dtype=np.int64),
                                 "n_users": pd.Series(dtype=np.int64)})
        comp = np.unique(part["comp"].to_numpy(dtype=np.int64))
        hours = comp >> np.int64(32)
        uh, cnt = np.unique(hours, return_counts=True)
        return pd.DataFrame({"hour_id": uh, "n_users": cnt.astype(np.int64)})

    parts = ds.map_batches(derive, batch_format="pyarrow")
    return grouped_partitions(parts, ["hour_id"], count, n_parts=16)


def q_doc_stats(sf_dir: str):
    """Per-doc token/char/punct counts (M7 analyzer analog, SQL-matched)."""
    from pcompress_ray.stages.textstats import doc_stats_batch

    _setup()
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        doc_stats_batch, batch_format="pandas")


def q_lang_id(sf_dir: str):
    """Stopword-heuristic language ID (SQL-matched)."""
    from pcompress_ray.stages.textstats import lang_id_batch

    _setup()
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        lang_id_batch, batch_format="pandas")


def q_lang_stats(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    _setup()
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    out = ds.groupby("lang").aggregate(Count(alias_name="n_docs"),
                                       Sum("n_chars", alias_name="total_chars"))

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"lang": t["lang"].cast(pa.string()),
                         "n_docs": t["n_docs"].cast(pa.int64()),
                         "total_chars": t["total_chars"].cast(pa.int64())})

    return out.map_batches(rn, batch_format="pyarrow")


def q_top_tokens(sf_dir: str):
    """Corpus token frequency top-50 (map-side combine + groupby-sum +
    sort + limit) — only (token, partial_count) rows enter the shuffle."""
    from ray.data.aggregate import Sum

    from pcompress_ray.stages.textstats import token_counts

    _setup()
    ds = _read(sf_dir, "documents", ["text"])
    out = (ds.map_batches(token_counts, batch_format="pyarrow")
           .groupby("token").aggregate(Sum("n", alias_name="n")))

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"token": t["token"].cast(pa.string()),
                         "n": t["n"].cast(pa.int64())})

    return (out.map_batches(rn, batch_format="pyarrow")
            .sort(["n", "token"], descending=[True, False]).limit(50))


def _canon_min_id(key_col: str):
    """Partition reducer assigning canonical_doc_id = min doc_id per
    ``key_col`` group — vectorized min-per-group over the whole hash
    partition (shared by the exact and normalized dedup tiers)."""
    from pcompress_ray.functions.ops import group_boundaries

    def canon(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values([key_col, "doc_id"])
        key = part[key_col].to_numpy()
        ids = part["doc_id"].to_numpy(dtype=np.int64)
        first, gid, _ = group_boundaries(key)
        return pd.DataFrame({"doc_id": ids, key_col: key,
                             "canonical_doc_id": ids[first][gid]})

    return canon


def q_exact_dup_docs(sf_dir: str):
    """Doc-level exact-dup canonical assignment via md5 (A1/J1 keep-first)."""
    import hashlib

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def md5col(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        texts = t["text"].to_pylist()
        h = [hashlib.md5((x or "").encode("utf-8")).hexdigest() for x in texts]
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "text_md5": pa.array(h, pa.string())})

    from pcompress_ray.functions.ops import grouped_partitions

    return grouped_partitions(ds.map_batches(md5col, batch_format="pyarrow"),
                              ["text_md5"], _canon_min_id("text_md5"))


def q_norm_text_dedup(sf_dir: str):
    """Normalized-exact dedup tier (C4-style): ASCII-lowercase + collapse
    [ \\t\\r\\n]+ runs + trim, then exact match on the normalized text —
    the tier between byte-exact (`exact_dup_docs`) and MinHash near-dup.
    Normalization is pyarrow RE2 kernels so the DuckDB twin (translate +
    regexp_replace, also RE2) is byte-identical; reference analog is the
    identity-chunk dedup after the preproc normalize pass
    (pcompress.c:239-276 filters before rabin_dedup.c identity match)."""
    import hashlib

    import pyarrow.compute as pc

    from pcompress_ray.functions.ops import grouped_partitions

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def norm_md5(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        s = pc.fill_null(t["text"], "")
        s = pc.ascii_lower(s)                                  # exact ASCII
        s = pc.replace_substring_regex(s, r"[ \t\r\n]+", " ")  # RE2, global
        s = pc.utf8_trim(s, " ")
        h = [hashlib.md5(x.encode("utf-8")).hexdigest()
             for x in s.to_pylist()]
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "norm_md5": pa.array(h, pa.string())})

    return grouped_partitions(ds.map_batches(norm_md5, batch_format="pyarrow"),
                              ["norm_md5"], _canon_min_id("norm_md5"))


def q_soft_dedup_weights(sf_dir: str):
    """SoftDeDup (He et al. 2024, arXiv:2407.06654) over the normalized-
    exact tier: instead of dropping duplicates, every doc gets an integer
    e6 sampling weight ∝ 1/dup_count, renormalized to mean 1 — hard dedup
    is the alpha→∞ limit (reference analog: the A3 gain accounting
    pcompress.c:175-195 turned into reweighting). Duplication key is the
    same ASCII-lower + whitespace-collapse md5 as `norm_text_dedup`, so
    the tiers compose. All arithmetic is fixed-point floor division
    (stages/softdedup.py) — the DuckDB twin is integer-exact."""
    import hashlib

    import pyarrow.compute as pc

    from pcompress_ray.stages.softdedup import soft_dedup_weights

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def norm_md5(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        s = pc.fill_null(t["text"], "")
        s = pc.ascii_lower(s)
        s = pc.replace_substring_regex(s, r"[ \t\r\n]+", " ")
        s = pc.utf8_trim(s, " ")
        h = [hashlib.md5(x.encode("utf-8")).hexdigest()
             for x in s.to_pylist()]
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "norm_md5": pa.array(h, pa.string())})

    return soft_dedup_weights(
        ds.map_batches(norm_md5, batch_format="pyarrow"), "norm_md5")


def q_cluster_explain(sf_dir: str, top: int = 3):
    """Audit/explain for the flagship's cluster assignments (the north
    rule's matching criterion made inspectable): for the ``top`` largest
    non-singleton clusters, every member's KMV-estimated Jaccard against
    its cluster canonical — (cluster_id, url, is_canonical, n_members,
    jaccard_vs_canon_e6). A curation reviewer reads this to see WHY docs
    clustered (1.0 = verbatim dup; near threshold = borderline member).
    Rows-only for the driver (MinHash/KMV state); planted-fixture pinned
    by tests/test_cluster_explain.py. Core: pipelines/explain.py."""
    from pcompress_ray.pipelines.explain import cluster_explain

    res = _dedup_clusters(sf_dir)
    return cluster_explain(res, top=top)


def q_lsh_plan(sf_dir: str):
    """LSH banding plan for the flagship's 128-perm signature at the
    default candidate threshold 1/2 (stages/lshplan.py — the MMDS §3.4.3
    S-curve error minimization in exact rational arithmetic, e12
    fixed-point output): one row per feasible (bands, rows), the chosen
    row being the argmin of recall-weighted error. The chosen row IS the
    flagship default 32×4 (config.py:59) — this query is the planner's
    justification of that default against the recall gate. Pure
    deterministic driver-side math (sf_dir unused beyond the signature);
    rows-only for the driver (exact rational powers are not
    SQL-expressible), pinned bit-for-bit by tests/test_lshplan.py."""
    from pcompress_ray.stages.lshplan import plan_bands

    return plan_bands(128)


def q_redirect_resolve(sf_dir: str):
    """Redirect/canonical-chain resolution (stages/redirects.py): every
    page attributed to the FINAL target of its redirect chain, with the
    exact hop count — Wyllie pointer doubling as a raw-Ray BSP (the
    pagerank execution shape: P node%P state blocks, two task waves per
    round, fixpoint in O(log chain) rounds, no executor launch in the
    loop). Chains synthesized deterministically: doc i redirects to i-1
    unless i % 13 == 0 (a root), giving chains up to 12 hops — 4
    doubling rounds. The DuckDB twin is a recursive CTE following the
    SAME closed-form pointer function one hop at a time; final_id and
    hops match bit-for-bit (all int64)."""
    from pcompress_ray.stages.redirects import resolve_pointers

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id"])

    def links(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ptr = np.where(ids % 13 == 0, ids, ids - 1)
        return pa.table({"node": pa.array(ids), "ptr": pa.array(ptr)})

    out = resolve_pointers(ds.map_batches(links, batch_format="pyarrow"))

    def rename(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"doc_id": t["node"],
                         "final_id": t["final_id"],
                         "hops": t["hops"]})

    return out.map_batches(rename, batch_format="pyarrow")


def q_mirror_domains(sf_dir: str):
    """Mirror-site detection (stages/mirror.py): domain pairs ranked by
    EXACT rare-content Jaccard — each domain's set of distinct content
    fingerprints (md5 of 8-token reflowed segments, the line_dedup /
    segment_dedup granularity, since the flat testdata has no newlines),
    restricted to content on ≤ 8 domains: ubiquitous boilerplate carries
    no mirror signal and is excluded as part of the operator's
    semantics, identically in the twin — AND the cap bounds per-key pair
    fan-out at C(cap,2), the skew defusal. jaccard_e6 is integer floor
    arithmetic, so the DuckDB twin is bit-exact. Hosts synthesized from
    doc_id (the domain-tier construction); one key exchange + two count
    exchanges + two hash joins — domain sizes flow through the join,
    nothing driver-side."""
    import hashlib

    from pcompress_ray.stages.mirror import mirror_domain_pairs
    from pcompress_ray.stages.textstats import doc_segments

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        seg = doc_segments(t, w=8)
        ids = seg["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = [hashlib.md5(x.encode("utf-8")).hexdigest()
             for x in seg["seg"].to_pylist()]
        return pa.table({
            "domain": pa.array(_synth_hosts(ids).to_numpy(), pa.string()),
            "key": pa.array(h, pa.string())})

    return mirror_domain_pairs(
        ds.map_batches(prep, batch_format="pyarrow"), "domain", "key",
        cap=8)


def q_soft_cluster_weights(sf_dir: str):
    """SoftDeDup weights over the FLAGSHIP near-dup tier: duplication key
    is the MinHash/LSH cluster id, so whole near-duplicate families share
    the downweight (the paper's actual construction — commonness from
    near-dup multiplicity, not just exact). Rows-only for the driver
    (MinHash clusters are not SQL-expressible); the weighting arithmetic
    itself is pinned by the exact `soft_dedup_weights` twin and
    tests/test_softdedup.py."""
    from pcompress_ray.stages.softdedup import soft_dedup_weights

    res = _dedup_clusters(sf_dir)

    def with_doc_id(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        ids = np.asarray([int(u[6:]) for u in t["url"].to_pylist()],
                         np.int64)
        return pa.table({"doc_id": pa.array(ids),
                         "cluster_id": t["cluster_id"].cast(pa.int64())})

    ds = res.clusters.map_batches(with_doc_id, batch_format="pyarrow")
    return soft_dedup_weights(ds, "cluster_id")


def _dsir_scored(sf_dir: str):
    """Shared DSIR scoring pipeline (stages/dsir.py): fit hashed-n-gram
    (unigram+bigram, md5 mod 8192) occurrence counts on the target split
    (doc_id % 10 == 0 — the harness's stand-in for a curated sample) and
    on the full raw corpus — each ONE streaming pass of fixed-size
    per-block bincount partials folded on the driver — then score every
    document against the broadcast e6-quantized log-likelihood-ratio
    vector in a single map pass. Integer contributions pre-quantized
    before the per-doc sum (bm25 trick) keep the score order-free and
    the DuckDB twin exact."""
    import pyarrow.compute as pc

    from pcompress_ray.stages.dsir import (
        dsir_log_ratio_e6,
        dsir_scores,
        fit_hashed_ngram_counts,
    )

    _setup()
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def tgt_only(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(d % 10 == 0))

    target = docs.map_batches(tgt_only, batch_format="pyarrow")
    llr = dsir_log_ratio_e6(fit_hashed_ngram_counts(target),
                            fit_hashed_ngram_counts(docs))
    return dsir_scores(docs, llr)


def q_dsir_weights(sf_dir: str):
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169) for
    every document: (doc_id, n_ngrams, score_e6) where score_e6 sums the
    e6-quantized per-bucket log ratios of Laplace-smoothed hashed-n-gram
    LMs fit on the target split vs the raw corpus. Exact DuckDB twin
    (md5-derived buckets, integer contributions). Zero-token docs score
    0 with n_ngrams 0."""
    return _dsir_scored(sf_dir).sort("doc_id")


def q_dsir_sample(sf_dir: str):
    """DSIR Gumbel top-k resampling: select k=100 documents without
    replacement with probability proportional to exp(importance weight),
    via the deterministic md5-derived Gumbel key (stages/dsir.py
    gumbel_key_e6, seed 0) — total-order top-k (O3), exact twin."""
    from pcompress_ray.stages.dsir import dsir_resample

    return dsir_resample(_dsir_scored(sf_dir), k=100, seed=0)


def q_simhash_fingerprint(sf_dir: str):
    """Content-derived 64-bit SimHash per document (hash-based Charikar:
    bit j of md5(token) contributes +/-1; fingerprint bit = sign of the
    sum over the doc's DISTINCT token set). No RNG, no broadcast state,
    so the DuckDB twin reproduces every fingerprint bit for bit — unlike
    the flagship's projection-matrix SimHash (J4), this one is an exact-
    oracle fingerprint. Output (doc_id, n_tokens, simhash hex16)."""
    from pcompress_ray.stages.candidates import md5_simhash

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    fp = md5_simhash(ds)

    def to_hex(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        v = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "n_tokens": t["n_tokens"].cast(pa.int64()),
                         "simhash": pa.array([format(x, "016x")
                                              for x in v], pa.string())})

    return fp.map_batches(to_hex, batch_format="pyarrow")


def q_simhash_hamming_pairs(sf_dir: str):
    """All document pairs within Hamming distance <= 3 of the md5-derived
    SimHash — EXACT by pigeonhole (4 x 16-bit bands: <=3 differing bits
    touch <=3 bands, so every qualifying pair shares a band), then
    Hamming-verified, so the O(n^2) cross-join twin matches exactly.
    bucket_cap is lifted for this query (the capped windowed path trades
    exactness for linear pair count in hot buckets — at 100-TB scale use
    the default cap or the flagship's J4 stage instead; documented
    partitioning assumption: exactness holds while every (band, value)
    bucket fits one partition)."""
    from pcompress_ray.config import PipelineConfig
    from pcompress_ray.stages.candidates import md5_simhash, simhash_candidates

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def as_sig(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"rank": t["doc_id"].cast(pa.int64()),
                         "simhash": t["simhash"],
                         "n_shingles": t["n_tokens"].cast(pa.int64())})

    sig = md5_simhash(ds).map_batches(as_sig, batch_format="pyarrow")
    cfg = PipelineConfig(bucket_cap=1 << 30)
    pairs = simhash_candidates(sig, cfg)
    return pairs.map_batches(
        lambda t: pa.table({"a": t["a"].cast(pa.int64()),
                            "b": t["b"].cast(pa.int64())}),
        batch_format="pyarrow")


def q_events_hourly(sf_dir: str):
    """Tumbling-window aggregate per user (streaming-window analog).
    One (user, hour)-keyed exchange; the per-partition reduce is a single
    lexsort+reduceat (Ray's per-key aggregate costs ~100us of Python per
    group — ruinous at 10k groups)."""
    from pcompress_ray.functions.ops import grouped_partitions

    _setup()
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour_id = us // 3_600_000_000
        return pa.table({"user_id": t["user_id"].cast(pa.int64()),
                         "hour_id": pa.array(hour_id.astype(np.int64)),
                         "value": t["value"].cast(pa.float64())})

    def agg(part: pd.DataFrame) -> pd.DataFrame:
        if not len(part):
            return pd.DataFrame({"user_id": pd.Series(dtype=np.int64),
                                 "hour_id": pd.Series(dtype=np.int64),
                                 "n_events": pd.Series(dtype=np.int64),
                                 "sum_value": pd.Series(dtype=np.float64)})
        u = part["user_id"].to_numpy(np.int64)
        h = part["hour_id"].to_numpy(np.int64)
        v = part["value"].to_numpy(np.float64)
        order = np.lexsort((h, u))
        u, h, v = u[order], h[order], v[order]
        first = np.empty(len(u), bool)
        first[0] = True
        first[1:] = (u[1:] != u[:-1]) | (h[1:] != h[:-1])
        starts = np.flatnonzero(first)
        n = np.diff(np.append(starts, len(u)))
        s = np.add.reduceat(v, starts)
        return pd.DataFrame({
            "user_id": u[starts], "hour_id": h[starts],
            "n_events": n.astype(np.int64), "sum_value": s})

    out = grouped_partitions(ds.map_batches(derive, batch_format="pyarrow"),
                             ["user_id", "hour_id"], agg, n_parts=32)

    def rnd(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.replace_schema_metadata(None)
        return pa.table({"user_id": t["user_id"].cast(pa.int64()),
                         "hour_id": t["hour_id"].cast(pa.int64()),
                         "n_events": t["n_events"].cast(pa.int64()),
                         "sum_value": pc.round(t["sum_value"].cast(
                             pa.float64()), 6)})

    return out.map_batches(rnd, batch_format="pyarrow")


def q_event_gaps(sf_dir: str):
    """LAG window analog: per event, microseconds since the same user's
    previous event (first event per user omitted). Hash-partitioned by
    user_id, ONE vectorized diff per partition — the general lag/lead
    primitive a streaming pipeline needs for inter-arrival features."""
    from pcompress_ray.functions.ops import grouped_partitions

    _setup()
    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts"])

    def gaps_part(part: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"user_id": pd.Series(dtype=np.int64),
                              "event_id": pd.Series(dtype=np.int64),
                              "gap_us": pd.Series(dtype=np.int64)})
        if len(part) == 0:
            return empty
        part = part.sort_values(["user_id", "ts", "event_id"])
        uid = part["user_id"].to_numpy(dtype=np.int64)
        eid = part["event_id"].to_numpy(dtype=np.int64)
        us = part["ts"].astype("int64").to_numpy()
        same_user = uid[1:] == uid[:-1]
        gaps = (us[1:] - us[:-1])[same_user]
        return pd.DataFrame({"user_id": uid[1:][same_user],
                             "event_id": eid[1:][same_user],
                             "gap_us": gaps.astype(np.int64)}) \
            if same_user.any() else empty

    res = grouped_partitions(ds, ["user_id"], gaps_part)

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"user_id": t["user_id"].cast(pa.int64()),
                         "event_id": t["event_id"].cast(pa.int64()),
                         "gap_us": t["gap_us"].cast(pa.int64())})

    return res.map_batches(rn, batch_format="pyarrow")


def q_user_running_value(sf_dir: str):
    """Cumulative window function: per event, the running sum of ``value``
    within its user's timeline (ORDER BY ts, event_id ROWS UNBOUNDED
    PRECEDING). Hash-partitioned by user_id, ONE vectorized segmented
    cumsum per partition. Values are scaled to integers BEFORE summing
    (floor(v*1e6+0.5) on both sides) so the running sum is exact — a
    float cumsum would round differently from DuckDB's windowed sum."""
    from pcompress_ray.functions.ops import grouped_partitions

    _setup()
    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def run_part(part: pd.DataFrame) -> pa.Table:
        part = part.sort_values(["user_id", "ts", "event_id"])
        uid = part["user_id"].to_numpy(dtype=np.int64)
        eid = part["event_id"].to_numpy(dtype=np.int64)
        v = np.floor(part["value"].to_numpy(dtype=np.float64) * 1e6 + 0.5) \
            .astype(np.int64)
        cs = np.cumsum(v)
        # segmented cumsum: subtract the running total just before each
        # user's first row
        first = np.ones(uid.size, dtype=bool)
        first[1:] = uid[1:] != uid[:-1]
        base = np.repeat(cs[first] - v[first], np.diff(
            np.append(np.flatnonzero(first), uid.size)))
        run = cs - base
        return pa.table({"user_id": pa.array(uid), "event_id": pa.array(eid),
                         "run_value_e6": pa.array(run.astype(np.int64))})

    return grouped_partitions(ds, ["user_id"], run_part)


def q_user_first_last(sf_dir: str):
    """arg-min/arg-max window shape: each user's first and last event_type
    by (ts, event_id) plus event count — one vectorized boundary pick per
    hash partition."""
    from pcompress_ray.functions.ops import grouped_partitions

    _setup()
    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    def fl_part(part: pd.DataFrame) -> pa.Table:
        part = part.sort_values(["user_id", "ts", "event_id"])
        uid = part["user_id"].to_numpy(dtype=np.int64)
        et = part["event_type"].to_numpy()
        first = np.ones(uid.size, dtype=bool)
        first[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], uid.size) - 1
        return pa.table({
            "user_id": pa.array(uid[starts]),
            "first_type": pa.array(et[starts].astype(str), pa.string()),
            "last_type": pa.array(et[ends].astype(str), pa.string()),
            "n_events": pa.array((ends - starts + 1).astype(np.int64)),
        })

    return grouped_partitions(ds, ["user_id"], fl_part)


def q_sessionize(sf_dir: str):
    """Gap-based sessionization per user (1800s gap). Hash-partitioned by
    user_id; ONE vectorized scan per partition (sort by user,ts; numpy
    segment boundaries) — not one Python call per user."""
    from pcompress_ray.functions.ops import grouped_partitions

    _setup()
    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts"])

    def sess_part(part: pd.DataFrame) -> pd.DataFrame:
        if len(part) == 0:
            return pd.DataFrame({"user_id": pd.Series(dtype=np.int64),
                                 "session_id": pd.Series(dtype=np.int64),
                                 "n_events": pd.Series(dtype=np.int64)})
        part = part.sort_values(["user_id", "ts", "event_id"])
        uid = part["user_id"].to_numpy(dtype=np.int64)
        us = part["ts"].astype("int64").to_numpy()
        n = len(part)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        np.not_equal(uid[1:], uid[:-1], out=new_user[1:])
        gap_break = np.empty(n, dtype=bool)
        gap_break[0] = False
        gap_break[1:] = (us[1:] - us[:-1]) > 1_800_000_000
        new_sess = new_user | gap_break
        # session_id restarts at 0 per user
        gsid = np.cumsum(new_sess) - 1
        uidx = np.cumsum(new_user) - 1
        sid = gsid - gsid[new_user][uidx]
        starts = np.flatnonzero(new_sess)
        sizes = np.diff(np.append(starts, n))
        return pd.DataFrame({"user_id": uid[starts],
                             "session_id": sid[starts],
                             "n_events": sizes.astype(np.int64)})

    res = grouped_partitions(ds, ["user_id"], sess_part)

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"user_id": t["user_id"].cast(pa.int64()),
                         "session_id": t["session_id"].cast(pa.int64()),
                         "n_events": t["n_events"].cast(pa.int64())})

    return res.map_batches(rn, batch_format="pyarrow")


def q_events_sliding(sf_dir: str):
    """Trailing 3-hour sliding-window aggregate per user (RANGE window over
    sparse hours) — the streaming-window analog, computed as ONE vectorized
    scan per user hash-partition (composite-key searchsorted for the window
    left edge; no per-user Python). Value sums are integer micro-units
    (floor(v*1e6+0.5) per EVENT) so window sums are exact integers on both
    engines — float window sums would differ in summation order."""
    from pcompress_ray.functions.ops import grouped_partitions

    _setup()
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def slide(part: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"user_id": pd.Series(dtype=np.int64),
                              "hour_id": pd.Series(dtype=np.int64),
                              "n_events_3h": pd.Series(dtype=np.int64),
                              "sum_value_e6_3h": pd.Series(dtype=np.int64)})
        if len(part) == 0:
            return empty
        uid = part["user_id"].to_numpy(dtype=np.int64)
        hour = part["ts"].astype("int64").to_numpy() // 3_600_000_000
        ve6 = np.floor(part["value"].to_numpy(dtype=np.float64) * 1e6
                       + 0.5).astype(np.int64)
        order = np.lexsort((hour, uid))
        uid, hour, ve6 = uid[order], hour[order], ve6[order]
        n = uid.size
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = (uid[1:] != uid[:-1]) | (hour[1:] != hour[:-1])
        gid = np.cumsum(first) - 1
        cnt = np.bincount(gid)
        sv = np.bincount(gid, weights=ve6.astype(np.float64)).astype(np.int64)
        gu, gh = uid[first], hour[first]
        if gu.max() >= 1 << 31 or gu.min() < 0:
            raise ValueError("events_sliding packs (user_id, hour) into one "
                             "int64; user_id must fit in 31 bits")
        if gh.max() >= 1 << 31 or gh.min() < 0:
            raise ValueError("events_sliding packs (user_id, hour) into one "
                             "int64; epoch-hour must fit in 31 bits")
        comp = (gu << np.int64(32)) | gh
        # clamp the window's left edge at hour 0 so (gh - 2) can never go
        # negative and OR garbage into the packed key
        left = np.searchsorted(comp, (gu << np.int64(32)) | np.maximum(gh - 2, 0))
        csn = np.concatenate([[0], np.cumsum(cnt)])
        csv = np.concatenate([[0], np.cumsum(sv)])
        idx = np.arange(gu.size)
        return pd.DataFrame({
            "user_id": gu,
            "hour_id": gh,
            "n_events_3h": (csn[idx + 1] - csn[left]).astype(np.int64),
            "sum_value_e6_3h": (csv[idx + 1] - csv[left]).astype(np.int64)})

    return grouped_partitions(ds, ["user_id"], slide)


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-5 for query vectors vec_id<10 (int output)."""
    from pcompress_ray.stages.ann import brute_force_topk

    _setup()
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = brute_force_topk(emb, np.arange(10), k=5)

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"query_id": t["query_id"].cast(pa.int64()),
                         "neighbor_id": t["neighbor_id"].cast(pa.int64())})

    return out.map_batches(rn, batch_format="pyarrow")


def q_embedding_neardup(sf_dir: str):
    """All embedding pairs with cosine ≥ 0.35 (near-dup by embedding)."""
    from pcompress_ray.stages.ann import cosine_neardup_pairs

    _setup()
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = cosine_neardup_pairs(emb, 0.35)

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"vec_a": t["vec_a"].cast(pa.int64()),
                         "vec_b": t["vec_b"].cast(pa.int64())})

    return out.map_batches(rn, batch_format="pyarrow")


def q_embedding_clusters(sf_dir: str):
    """Connected components over exact cosine>=0.35 embedding pairs →
    (vec_id, cluster_id = min vec_id of the component). Oracle-checked:
    the SQL twin walks the same edges with a recursive CTE. Scale path for
    real corpora: lsh_bucketed_pairs + distributed label_propagation
    (stages/components.py); this query is the exact small-scale tool."""
    from pcompress_ray.stages.ann import cosine_neardup_pairs
    from pcompress_ray.stages.components import (lookup_labels,
                                                 min_label_components)

    _setup()
    import ray

    emb = _read(sf_dir, "embeddings", ["vec_id"])
    emb_full = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    pdf = cosine_neardup_pairs(emb_full, 0.35).to_pandas()  # small (oracle twin)
    keys, vals = min_label_components(pdf["vec_a"].to_numpy(np.int64),
                                      pdf["vec_b"].to_numpy(np.int64))
    ref = ray.put((keys, vals))

    def assign(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        keys_, vals_ = ray.get(ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cid = lookup_labels(keys_, vals_, ids)
        return pa.table({"vec_id": pa.array(ids), "cluster_id": pa.array(cid)})

    return emb.map_batches(assign, batch_format="pyarrow")


def q_dedup_clusters(sf_dir: str):
    res = _dedup_clusters(sf_dir)
    return res.clusters.select_columns(["url", "cluster_id", "is_canonical"])


def q_dedup_pairs(sf_dir: str):
    res = _dedup_clusters(sf_dir, compute_pairs=True)
    return res.pairs


def q_dup_gain_by_source(sf_dir: str):
    """Dedup-gain metrics per origin (A3 analog, rabin_dedup.c:1250-1257
    gain accounting): per source, how many docs/chars an exact keep-first
    dedup removes. Composes T1 exact-dup canonical assignment with A4
    aggregates; all-integer output so the oracle hash is dtype-stable."""
    import hashlib

    from ray.data.aggregate import Count, Sum

    from pcompress_ray.functions.ops import group_boundaries, grouped_partitions

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text", "source", "n_chars"])

    def md5col(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        h = [hashlib.md5((x or "").encode("utf-8")).hexdigest()
             for x in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "source": t["source"].cast(pa.string()),
                         "n_chars": t["n_chars"].cast(pa.int64()),
                         "text_md5": pa.array(h, pa.string())})

    def mark_dups(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["text_md5", "doc_id"])
        ids = part["doc_id"].to_numpy(dtype=np.int64)
        first, gid, _ = group_boundaries(part["text_md5"].to_numpy())
        dup = (ids != ids[first][gid]).astype(np.int64)
        nch = part["n_chars"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"source": part["source"].to_numpy(),
                             "is_dup": dup, "n_chars": nch,
                             "dup_chars": nch * dup})

    marked = grouped_partitions(ds.map_batches(md5col, batch_format="pyarrow"),
                                ["text_md5"], mark_dups)
    agg = marked.groupby("source").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="total_chars"),
        Sum("is_dup", alias_name="dup_docs"),
        Sum("dup_chars", alias_name="dup_chars"))

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"source": t["source"].cast(pa.string()),
                         "n_docs": t["n_docs"].cast(pa.int64()),
                         "total_chars": t["total_chars"].cast(pa.int64()),
                         "dup_docs": t["dup_docs"].cast(pa.int64()),
                         "dup_chars": t["dup_chars"].cast(pa.int64())})

    return agg.map_batches(rn, batch_format="pyarrow")


_ARCHIVE_MEMO: dict = {}


def _archive_result(sf_dir: str):
    """Memoized like _dedup_clusters: archive_stats and archive_roundtrip
    share one archive build. The store/manifest are MATERIALIZED ray
    datasets (object store, not disk), so entries are session-keyed the
    same way — never served across sessions, key re-read after the run."""
    from pcompress_ray.config import PipelineConfig
    from pcompress_ray.pipelines.archive import archive_write
    from pcompress_ray.sources.corpus import pages_from_documents

    _setup()
    sess = _ray_session_key()
    if sess is not None:
        hit = _ARCHIVE_MEMO.get((sf_dir, sess))
        if hit is not None:
            return hit
    res = archive_write(pages_from_documents(sf_dir), PipelineConfig(),
                        text_col="text")
    sess = _ray_session_key()
    if sess is not None:
        _ARCHIVE_MEMO.clear()
        _ARCHIVE_MEMO[(sf_dir, sess)] = res
    return res


def q_archive_stats(sf_dir: str):
    """Dedup-compressed archive statistics (A4 analog, pcompress.c:175-195 +
    adaptive per-algo chunk counts adaptive_compress.c:130-159): one row per
    codec chosen by the adaptive selector over the documents table, plus the
    store-wide byte accounting. Deterministic (stdlib codecs are)."""
    res = _archive_result(sf_dir)
    m = res.metrics
    codecs = sorted(m["codec_chunks"])
    return pd.DataFrame({
        "codec": codecs,
        "n_chunks": [m["codec_chunks"][c] for c in codecs],
        "stored_bytes": [m["codec_stored_bytes"][c] for c in codecs],
    })


def q_archive_roundtrip(sf_dir: str):
    """End-to-end archive integrity: write the dedup-compressed archive of
    the documents table, restore it, and report doc/verify counts (the
    reference's decompress-verify path, pcompress.c:519-615). A mismatch
    between n_docs and n_sha_ok would mean a chunk-identity collision or a
    reassembly bug."""
    import pyarrow.compute as pc

    from pcompress_ray.config import PipelineConfig
    from pcompress_ray.pipelines.archive import archive_restore

    res = _archive_result(sf_dir)
    restored = archive_restore(res.store, res.manifest, PipelineConfig())

    def partial(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        ok = int(pc.sum(t["sha_ok"].cast(pa.int64())).as_py() or 0)
        return pa.table({"n_docs": pa.array([len(t)], pa.int64()),
                         "n_sha_ok": pa.array([ok], pa.int64())})

    s = restored.map_batches(partial, batch_format="pyarrow").to_pandas().sum()
    return pd.DataFrame({
        "n_docs": [int(s["n_docs"])],
        "n_sha_ok": [int(s["n_sha_ok"])],
        "n_unique_chunks": [int(res.metrics["n_unique_chunks"])],
        "dedup_gain_bytes": [int(res.metrics["dedup_gain_bytes"])],
    })


def q_delta_gain(sf_dir: str):
    """Similarity-delta savings per dedup cluster member (DELTA refs /
    bspatch analog, rabin/rabin_dedup.c:1300-1346): run near-dup clustering,
    delta-encode every non-canonical member against its canonical, and
    report per-member byte savings. delta_len == -1 marks members the gain
    gate keeps whole."""
    from pcompress_ray.config import PipelineConfig
    from pcompress_ray.sources.corpus import pages_from_documents
    from pcompress_ray.stages.delta import delta_encode_members

    res = _dedup_clusters(sf_dir)

    def add_rank(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return t.append_column("rank", t["doc_id"].cast(pa.int64()))

    pages = pages_from_documents(sf_dir).map_batches(
        add_rank, batch_format="pyarrow")
    out = delta_encode_members(res.clusters, pages, PipelineConfig())
    return out.select_columns(["rank", "base_rank", "orig_len", "delta_len"])


def q_corpus_sample(sf_dir: str):
    """Deterministic hash-based corpus subsample (~1/8): keep docs whose
    text-md5 first byte < 0x20. The training-data sampling primitive —
    reproducible across runs/engines (content-addressed, no RNG), so the
    DuckDB oracle selects the exact same rows."""
    import hashlib

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def sample(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        h = np.array([hashlib.md5((x or "").encode("utf-8")).hexdigest()
                      for x in t["text"].to_pylist()], dtype=object)
        keep = np.array([x[:2] < "20" for x in h], dtype=bool)
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()).filter(
                             pa.array(keep)),
                         "text_md5": pa.array(h[keep], pa.string())})

    return ds.map_batches(sample, batch_format="pyarrow")


def q_cdc_chunks(sf_dir: str):
    """Per-doc CDC chunk counts + total chunk bytes (M1+M3)."""
    from pcompress_ray.config import PipelineConfig
    from pcompress_ray.stages.cdc import CDCChunker

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(CDCChunker(PipelineConfig(), text_col="text"),
                         batch_format="pyarrow")

    def rn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.replace_schema_metadata(None)
        counts = pc.list_value_length(t["chunk_lengths"]).fill_null(0) \
                   .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(t["chunk_lengths"]).to_numpy(zero_copy_only=False)
        csum = np.concatenate([[0], np.cumsum(flat, dtype=np.int64)])
        ends = np.cumsum(counts)
        total = csum[ends] - csum[ends - counts]
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "n_chunks": t["n_chunks"].cast(pa.int64()),
                         "chunk_bytes": pa.array(total)})

    return out.map_batches(rn, batch_format="pyarrow")


def q_content_type_stats(sf_dir: str):
    """Byte-histogram TEXT/BINARY/MARKUP classifier (M7/F4 analyzer analog,
    filters/analyzer/analyzer.c:32-99 semantics; SQL-matched)."""
    from pcompress_ray.stages.textstats import content_type_batch

    _setup()
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        content_type_batch, batch_format="pandas")


def q_fixed_chunks(sf_dir: str):
    """Fixed-block chunker (M2, reference -F mode) — per-doc chunk counts
    + total bytes at a 64-byte block size (SQL-matched)."""
    from pcompress_ray.config import PipelineConfig
    from pcompress_ray.stages.cdc import CDCChunker

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(
        CDCChunker(PipelineConfig(), text_col="text", mode="fixed",
                   fixed_block_size=64),
        batch_format="pyarrow")

    def rn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.replace_schema_metadata(None)
        counts = pc.list_value_length(t["chunk_lengths"]).fill_null(0) \
                   .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(t["chunk_lengths"]).to_numpy(zero_copy_only=False)
        csum = np.concatenate([[0], np.cumsum(flat, dtype=np.int64)])
        ends = np.cumsum(counts)
        total = csum[ends] - csum[ends - counts]
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "n_chunks": t["n_chunks"].cast(pa.int64()),
                         "chunk_bytes": pa.array(total)})

    return out.map_batches(rn, batch_format="pyarrow")


def q_minhash_signatures(sf_dir: str):
    """Signature stage output stats (M5/M6): shingles, simhash, minhash sum."""
    from pcompress_ray.config import PipelineConfig
    from pcompress_ray.pipelines.dedup import build_signatures
    from pcompress_ray.sources.corpus import pages_from_documents

    _setup()
    pages = pages_from_documents(sf_dir)

    def add_rank(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return t.append_column("rank", t["doc_id"].cast(pa.int64()))

    sig = build_signatures(pages.map_batches(add_rank, batch_format="pyarrow"),
                           PipelineConfig())

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"rank": t["rank"].cast(pa.int64()),
                         "n_tokens": t["n_tokens"].cast(pa.int64()),
                         "n_shingles": t["n_shingles"].cast(pa.int64()),
                         "simhash": t["simhash"]})

    return sig.map_batches(rn, batch_format="pyarrow")


def q_quality_scores(sf_dir: str):
    """Quality scoring (length/punct/stopword ratios + composite score),
    SQL-matched: every float emitted as floor(x*1e6+0.5) scaled int on both
    sides (no round(): half-even vs half-away divergence)."""
    from pcompress_ray.stages.textstats import quality_batch

    _setup()
    out = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        quality_batch, batch_format="pandas")

    def rnd(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)

        # every float column as scaled int (floor(x*1e6+0.5)): same IEEE ops
        # as the SQL twin, immune to round()'s half-even/half-away divergence
        # (pc.round is half-to-even, DuckDB round() is half-away-from-zero)
        def e6(col: str) -> pa.Array:
            v = t[col].to_numpy(zero_copy_only=False)
            return pa.array(np.floor(v * 1e6 + 0.5).astype(np.int64))

        return pa.table({
            "doc_id": t["doc_id"].cast(pa.int64()),
            "n_tokens": t["n_tokens"].cast(pa.int64()),
            "punct_ratio_e6": e6("punct_ratio"),
            "stopword_ratio_e6": e6("stopword_ratio"),
            "avg_token_len_e6": e6("avg_token_len"),
            "quality_score_e6": e6("quality_score"),
        })

    return out.map_batches(rnd, batch_format="pyarrow")


def q_fingerprints(sf_dir: str):
    from pcompress_ray.stages.textstats import fingerprint_batch

    _setup()
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fingerprint_batch, batch_format="pandas")


def q_ivf_topk(sf_dir: str):
    """IVF coarse-quantized top-5 for query vectors vec_id<10 (the ANN
    scale path for top-k; recall vs brute force pinned in pytest)."""
    from pcompress_ray.stages.ann import ivf_topk

    _setup()
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = ivf_topk(emb, np.arange(10), k=5, n_centroids=32, nprobe=16)

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"query_id": t["query_id"].cast(pa.int64()),
                         "neighbor_id": t["neighbor_id"].cast(pa.int64())})

    return out.map_batches(rn, batch_format="pyarrow")


def q_ngram_jaccard(sf_dir: str):
    """Exact token-5-gram Jaccard dedup pairs over documents (threshold
    0.5) — the SQL-oracle-checked exact counterpart of the MinHash path.
    jaccard emitted as floor(j*1e6+0.5) so both engines do identical IEEE
    ops (round() half-modes differ on exact dyadic halves)."""
    from pcompress_ray.stages.candidates import ngram_jaccard_pairs

    _setup()
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ngram_jaccard_pairs(docs, k=5, threshold=0.5)

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        jac = t["jaccard"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_a": t["doc_a"].cast(pa.int64()),
            "doc_b": t["doc_b"].cast(pa.int64()),
            "inter": t["inter"].cast(pa.int64()),
            "union_sz": t["union_sz"].cast(pa.int64()),
            "jaccard_e6": pa.array(np.floor(jac * 1e6 + 0.5).astype(np.int64)),
        })

    return out.map_batches(rn, batch_format="pyarrow")


def q_ngram_containment(sf_dir: str):
    """Exact token-5-gram CONTAINMENT pairs (|A∩B| / min(|A|,|B|) ≥ 0.8) —
    the excerpt/subset metric: a short doc quoted verbatim inside a long
    one scores ~1.0 here but near 0 on Jaccard. The asymmetric-size dup
    detector used for benchmark decontamination and quote collapse."""
    from pcompress_ray.stages.candidates import ngram_jaccard_pairs

    _setup()
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ngram_jaccard_pairs(docs, k=5, threshold=0.8, score="containment")

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        c = t["containment"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_a": t["doc_a"].cast(pa.int64()),
            "doc_b": t["doc_b"].cast(pa.int64()),
            "inter": t["inter"].cast(pa.int64()),
            "min_sz": t["min_sz"].cast(pa.int64()),
            "containment_e6": pa.array(
                np.floor(c * 1e6 + 0.5).astype(np.int64)),
        })

    return out.map_batches(rn, batch_format="pyarrow")


def q_lsh_ann_pairs(sf_dir: str):
    """Hyperplane-LSH bucketed near-dup pairs (ANN scale path). (4 bits,
    16 tables) is calibrated for the low 0.35 cosine threshold:
    P(collide) = 1-(1-(1-arccos(0.35)/pi)^4)^16 ≈ 0.92 per pair."""
    from pcompress_ray.stages.ann import lsh_bucketed_pairs

    _setup()
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = lsh_bucketed_pairs(emb, 0.35, dim=64, n_bits=4, n_tables=16)

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"vec_a": t["vec_a"].cast(pa.int64()),
                         "vec_b": t["vec_b"].cast(pa.int64())})

    return out.map_batches(rn, batch_format="pyarrow")


def q_simhash_neardup(sf_dir: str):
    """SimHash banding near-dup candidates over documents (M5 analog)."""
    from pcompress_ray.config import PipelineConfig
    from pcompress_ray.pipelines.dedup import build_signatures
    from pcompress_ray.sources.corpus import pages_from_documents
    from pcompress_ray.stages.candidates import simhash_candidates

    _setup()
    cfg = PipelineConfig()
    pages = pages_from_documents(sf_dir)

    def add_rank(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return t.append_column("rank", t["doc_id"].cast(pa.int64()))

    sig = build_signatures(pages.map_batches(add_rank, batch_format="pyarrow"),
                           cfg).materialize()
    out = simhash_candidates(sig, cfg)

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"a": t["a"].cast(pa.int64()),
                         "b": t["b"].cast(pa.int64())})

    return out.map_batches(rn, batch_format="pyarrow")


def q_substring_spans(sf_dir: str):
    """Maximal shared spans (offsets + lengths) and exact LCS for
    substring-dup edges, via rolling-hash LCS + CDC-anchored run coalescing.
    Runs on a synthesized planted-span corpus (the sf documents are
    ~300 chars — below the 2 KiB span floor)."""
    import ray.data as rd

    from pcompress_ray.config import PipelineConfig
    from pcompress_ray.pipelines.dedup import build_signatures, union_edges
    from pcompress_ray.sources.corpus import make_corpus
    from pcompress_ray.stages.exact import chunk_exact_edges, doc_exact_edges
    from pcompress_ray.stages.suffix import substring_verify

    _setup()
    cfg = PipelineConfig()
    pages, _, _ = make_corpus(150, 42, with_oracle=False)
    pages = pages.append_column(
        "rank", pa.array(np.arange(len(pages["url"]), dtype=np.int64)))
    ds = rd.from_arrow(pages).repartition(4)
    # minimal edge lineage: substring_verify only consumes kind=="substring",
    # and per-pair best-kind needs only exact (outranks substring) + the
    # substring partials — near edges never mask substring, so the LSH /
    # verify / components phases of the full pipeline are skipped here
    sig = build_signatures(ds, cfg).materialize()
    edges = union_edges(doc_exact_edges(sig), chunk_exact_edges(sig, cfg),
                        cfg=cfg)
    spans = substring_verify(edges, ds, cfg)

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"a": t["a"].cast(pa.int64()),
                         "b": t["b"].cast(pa.int64()),
                         "a_off": t["a_off"].cast(pa.int64()),
                         "b_off": t["b_off"].cast(pa.int64()),
                         "span_len": t["span_len"].cast(pa.int64()),
                         "lcs_bytes": t["lcs_bytes"].cast(pa.int64())})

    return spans.map_batches(rn, batch_format="pyarrow")


def q_substring_excise(sf_dir: str):
    """Span-excision REWRITE (Lee et al. 2022 exact-substring dedup as an
    ACTION, not just a signal): cut every shared span >= the floor from the
    later doc, keep-first — the corpus analog of pcompress emitting only
    the residue behind a backward reference (rabin/rabin_dedup.c:1426-1448).
    Same planted-span corpus + edge plumbing as substring_spans; emits
    (rank, cut_spans, cut_bytes, text_sha256). Rows-only for the driver
    (suffix/LCS spans are not SQL-expressible); pinned byte-exactly against
    a pure-Python splice oracle in tests/test_excise.py."""
    import ray.data as rd

    from pcompress_ray.config import PipelineConfig
    from pcompress_ray.pipelines.dedup import build_signatures, union_edges
    from pcompress_ray.sources.corpus import make_corpus
    from pcompress_ray.stages.exact import chunk_exact_edges, doc_exact_edges
    from pcompress_ray.stages.suffix import substring_excise, substring_verify

    _setup()
    cfg = PipelineConfig()
    pages, _, _ = make_corpus(150, 42, with_oracle=False)
    pages = pages.append_column(
        "rank", pa.array(np.arange(len(pages["url"]), dtype=np.int64)))
    ds = rd.from_arrow(pages).repartition(4)
    sig = build_signatures(ds, cfg).materialize()
    edges = union_edges(doc_exact_edges(sig), chunk_exact_edges(sig, cfg),
                        cfg=cfg)
    spans = substring_verify(edges, ds, cfg)
    return (substring_excise(spans, ds, min_len=cfg.substring_min_bytes)
            .sort("rank"))


def q_asof_purchase(sf_dir: str):
    """As-of join: each 'click' event matched to the user's most recent
    'purchase' at-or-before it (inclusive; -1 if none). The asof operator
    Ray Data lacks, composed as tagged union + one hash shuffle on user_id
    + a vectorized forward-fill scan per partition (functions/ops.py)."""
    import pyarrow.compute as pc

    from pcompress_ray.functions.ops import asof_join

    _setup()
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def prep(kind):
        def f(t: pa.Table) -> pa.Table:
            t = t.replace_schema_metadata(None)
            t = t.filter(pc.equal(t["event_type"], kind))
            return pa.table({"event_id": t["event_id"].cast(pa.int64()),
                             "user_id": t["user_id"].cast(pa.int64()),
                             "ts_us": t["ts"].cast(pa.int64())})
        return f

    clicks = ev.map_batches(prep("click"), batch_format="pyarrow")
    buys = ev.map_batches(prep("purchase"), batch_format="pyarrow")
    out = asof_join(clicks, buys, by="user_id", on="ts_us",
                    right_val="event_id", out_col="matched_event_id")

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"event_id": t["event_id"].cast(pa.int64()),
                         "user_id": t["user_id"].cast(pa.int64()),
                         "ts_us": t["ts_us"].cast(pa.int64()),
                         "matched_event_id":
                             t["matched_event_id"].cast(pa.int64())})

    return out.map_batches(rn, batch_format="pyarrow")


def q_price_band_join(sf_dir: str):
    """Range (band) join: per part, how many lineitems have unit price
    (l_extendedprice / l_quantity) within ±2% of p_retailprice. Quantized
    bucketize-and-replicate band join — the pair set (1.1M at sf0.01) is
    never materialized, only counted (functions/ops.py band_join_count)."""
    import pyarrow.compute as pc

    from pcompress_ray.functions.ops import band_join_count

    _setup()
    part = _read(sf_dir, "part", ["p_partkey", "p_retailprice"])
    li = _read(sf_dir, "lineitem", ["l_extendedprice", "l_quantity"])

    def unit(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        u = pc.divide(t["l_extendedprice"].cast(pa.float64()),
                      t["l_quantity"].cast(pa.float64()))
        return pa.table({"unit_price": u})

    li_u = li.map_batches(unit, batch_format="pyarrow")
    return band_join_count(part, li_u, left_key="p_partkey",
                           left_val="p_retailprice", right_val="unit_price",
                           lo_mul=0.98, hi_mul=1.02, width=25.0)


def q_events_rollup(sf_dir: str):
    """ROLLUP aggregate: (event_type, hour) detail + per-type subtotals +
    grand total, from ONE shuffle — the subtotal levels re-aggregate the
    (small) detail result, never the raw events. Value sums are integer
    micro-units so all three levels are order-independent and exact."""
    from ray.data.aggregate import Count, Sum

    _setup()
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "event_type": t["event_type"].cast(pa.string()),
            "hour_id": pa.array(us // 3_600_000_000),
            "v_e6": pa.array(np.floor(v * 1e6 + 0.5).astype(np.int64))})

    detail = (ds.map_batches(derive, batch_format="pyarrow")
              .groupby(["event_type", "hour_id"])
              .aggregate(Count(alias_name="n_events"),
                         Sum("v_e6", alias_name="sum_value_e6")))

    def lvl0(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"event_type": t["event_type"].cast(pa.string()),
                         "hour_id": t["hour_id"].cast(pa.int64()),
                         "n_events": t["n_events"].cast(pa.int64()),
                         "sum_value_e6": t["sum_value_e6"].cast(pa.int64())})

    detail = detail.map_batches(lvl0, batch_format="pyarrow").materialize()
    by_type = (detail.groupby("event_type")
               .aggregate(Sum("n_events", alias_name="n_events"),
                          Sum("sum_value_e6", alias_name="sum_value_e6")))

    def lvl1(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        n = len(t)
        return pa.table({
            "event_type": t["event_type"].cast(pa.string()),
            "hour_id": pa.array(np.full(n, -1, dtype=np.int64)),
            "n_events": t["n_events"].cast(pa.int64()),
            "sum_value_e6": t["sum_value_e6"].cast(pa.int64())})

    tot = detail.aggregate(Sum("n_events", alias_name="n"),
                           Sum("sum_value_e6", alias_name="sv"))
    import ray.data as rd

    total = rd.from_arrow(pa.table({
        "event_type": pa.array(["ALL"]),
        "hour_id": pa.array([-1], pa.int64()),
        "n_events": pa.array([int(tot["n"])], pa.int64()),
        "sum_value_e6": pa.array([int(tot["sv"])], pa.int64())}))
    return detail.union(by_type.map_batches(lvl1, batch_format="pyarrow"),
                        total)


def q_lang_token_diversity(sf_dir: str):
    """Per-language DISTINCT token count + total occurrences. Distinct runs
    as per-batch (lang, token) dedup (map-side combine) → hash-partition
    on (lang, token) → partition-local dedup + per-lang partial counts →
    tiny per-lang sum; token occurrences never leave the map side."""
    import re

    from ray.data.aggregate import Sum

    from pcompress_ray.functions.ops import grouped_partitions

    _setup()
    ds = _read(sf_dir, "documents", ["lang", "text"])
    tok = re.compile(r"[a-z0-9]+")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        # map-side combine: (lang, token, partial count) per batch
        toks = [tok.findall((t or "").lower()) for t in df["text"]]
        lang = np.repeat(df["lang"].to_numpy(),
                         np.fromiter((len(x) for x in toks), dtype=np.int64,
                                     count=len(toks)))
        flat = np.concatenate([np.asarray(x, dtype=object) for x in toks]) \
            if toks else np.empty(0, dtype=object)
        p = pd.DataFrame({"lang": lang, "token": flat})
        return p.groupby(["lang", "token"], as_index=False).size() \
            .rename(columns={"size": "n"})

    def count_part(part: pd.DataFrame) -> pd.DataFrame:
        if len(part) == 0:
            return pd.DataFrame({"lang": pd.Series(dtype=object),
                                 "n_distinct": pd.Series(dtype=np.int64),
                                 "n_occ": pd.Series(dtype=np.int64)})
        # every (lang, token) pair lands in exactly one partition
        g = part.groupby("lang", as_index=False).agg(
            n_distinct=("token", "nunique"), n_occ=("n", "sum"))
        g["n_distinct"] = g["n_distinct"].astype(np.int64)
        g["n_occ"] = g["n_occ"].astype(np.int64)
        return g

    parts = grouped_partitions(ds.map_batches(pairs, batch_format="pandas"),
                               ["lang", "token"], count_part, n_parts=32)
    out = parts.groupby("lang").aggregate(
        Sum("n_distinct", alias_name="n_distinct_tokens"),
        Sum("n_occ", alias_name="n_tokens"))

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({
            "lang": t["lang"].cast(pa.string()),
            "n_distinct_tokens": t["n_distinct_tokens"].cast(pa.int64()),
            "n_tokens": t["n_tokens"].cast(pa.int64())})

    return out.map_batches(rn, batch_format="pyarrow")


def q_lang_length_quantiles(sf_dir: str):
    """Per-language exact p50/p90 of n_chars (linear interpolation, the
    quantile_cont contract), one vectorized pass per lang hash-partition.
    Emitted as e6-scaled ints; the SQL twin interpolates with the same
    IEEE ops. Exact quantiles need the group co-located — at 100-TB group
    sizes swap in a t-digest/KLL sketch merge instead."""
    from pcompress_ray.functions.ops import group_boundaries, grouped_partitions

    _setup()
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])

    def quant(part: pd.DataFrame) -> pd.DataFrame:
        if len(part) == 0:
            return pd.DataFrame({"lang": pd.Series(dtype=object),
                                 "n_docs": pd.Series(dtype=np.int64),
                                 "p50_e6": pd.Series(dtype=np.int64),
                                 "p90_e6": pd.Series(dtype=np.int64)})
        part = part.sort_values(["lang", "n_chars"])
        langs = part["lang"].to_numpy()
        x = part["n_chars"].to_numpy(dtype=np.float64)
        first, gid, sizes = group_boundaries(langs)
        starts = np.flatnonzero(first)
        out = {"lang": langs[starts], "n_docs": sizes.astype(np.int64)}
        for q, col in ((0.5, "p50_e6"), (0.9, "p90_e6")):
            h = (sizes - 1) * q
            f = np.floor(h)
            lo = x[starts + f.astype(np.int64)]
            hi = x[starts + np.minimum(f.astype(np.int64) + 1, sizes - 1)]
            v = lo + (hi - lo) * (h - f)
            out[col] = np.floor(v * 1e6 + 0.5).astype(np.int64)
        return pd.DataFrame(out)

    res = grouped_partitions(ds, ["lang"], quant, n_parts=8)

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"lang": t["lang"].cast(pa.string()),
                         "n_docs": t["n_docs"].cast(pa.int64()),
                         "p50_e6": t["p50_e6"].cast(pa.int64()),
                         "p90_e6": t["p90_e6"].cast(pa.int64())})

    return res.map_batches(rn, batch_format="pyarrow")


def q_file_type_stats(sf_dir: str):
    """Full 35-subtype file-type taxonomy (M8, utils/utils.h:276-324 +
    pc_archive.c:1915-2070 magic dispatch re-expressed in
    stages/filetype.py): counts per detected type over a deterministic
    corpus covering every detectable kind. No SQL oracle (the corpus is
    synthesized in-process; per-kind expectations are pytest-pinned in
    tests/test_filetype.py)."""
    import ray.data as rd

    from pcompress_ray.stages.filetype import (detect_types_batch,
                                               make_fake_file_table)

    _setup()
    files = rd.from_arrow(make_fake_file_table(repeats=8))
    typed = files.map_batches(
        lambda t: detect_types_batch(t, path_col="path"),
        batch_format="pyarrow", batch_size=64)

    def agg(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.replace_schema_metadata(None)
        g = t.group_by("ftype_name").aggregate([("file_id", "count")])
        return g.rename_columns(["ftype_name", "n_files"])

    out = typed.select_columns(["file_id", "ftype_name"]) \
        .map_batches(agg, batch_format="pyarrow") \
        .groupby("ftype_name").sum("n_files")

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"ftype_name": t["ftype_name"].cast(pa.string()),
                         "n_files": t["sum(n_files)"].cast(pa.int64())})

    return out.map_batches(rn, batch_format="pyarrow").sort("ftype_name")


def q_video_frames(sf_dir: str):
    """REAL video path: MJPEG-AVI containers are RIFF-walked
    (FrameSampleStage, every 2nd frame), each sampled frame decoded by the
    from-scratch T.81 JPEG codec — per-frame dimensions + mean-luma stats,
    no codec library anywhere. No SQL oracle (binary container parsing);
    pytest-pinned against the planted frame counts/gradients."""
    import ray.data as rd

    from pcompress_ray.stages.jpeg import decode_jpeg
    from pcompress_ray.stages.multimodal import (FrameSampleStage,
                                                 make_fake_video_table)

    _setup()
    videos = rd.from_arrow(make_fake_video_table(40))
    frames = videos.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"fps_divisor": 2, "max_frames": 4,
                               "fake": False},
        batch_format="pyarrow", batch_size=8, concurrency=(1, 2))

    def decode(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        w, h, luma = [], [], []
        for p in t["frame_payload"].to_pylist():
            img = decode_jpeg(p)
            h.append(img.shape[0])
            w.append(img.shape[1])
            luma.append(int(np.floor(float(img.mean()) * 1e3 + 0.5)))
        return pa.table({
            "media_id": t["media_id"].cast(pa.int64()),
            "frame_idx": t["frame_idx"].cast(pa.int32()),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(h, pa.int32()),
            "mean_luma_e3": pa.array(luma, pa.int64()),
        })

    return frames.map_batches(decode, batch_format="pyarrow",
                              batch_size=64).sort(["media_id", "frame_idx"])


def q_media_features(sf_dir: str):
    """Multimodal plumbing: magic-byte typing + (stubbed) decode features."""
    import ray.data as rd

    from pcompress_ray.stages.multimodal import ImageDecodeStage, make_fake_media_table

    _setup()
    media = rd.from_arrow(make_fake_media_table(200))
    out = media.map_batches(ImageDecodeStage, fn_constructor_kwargs={"dim": 16},
                            batch_format="pyarrow", batch_size=32,
                            concurrency=(1, 2))
    return out.select_columns(["media_id", "media_type", "media_type_detected"])


def q_image_features(sf_dir: str):
    """REAL image decode over the synthetic media table: PNG (stdlib-zlib
    parse + unfiltering) AND baseline JPEG (from-scratch T.81 Huffman+IDCT,
    stages/jpeg.py) rows both yield genuine dimensions + channel stats."""
    import ray.data as rd

    from pcompress_ray.stages.multimodal import ImageDecodeStage, make_fake_media_table

    _setup()
    media = rd.from_arrow(make_fake_media_table(200))
    out = media.map_batches(ImageDecodeStage, fn_constructor_kwargs={"dim": 16},
                            batch_format="pyarrow", batch_size=32,
                            concurrency=(1, 2))

    def rn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.replace_schema_metadata(None)
        t = t.filter(pc.is_in(t["media_type_detected"],
                              pa.array(["image/png", "image/jpeg"])))
        f = np.asarray(t["features"].to_pylist(), dtype=np.float32)
        return pa.table({
            "media_id": t["media_id"].cast(pa.int64()),
            "media_type_detected": t["media_type_detected"],
            "img_w": pa.array(f[:, 0].astype(np.int64)),
            "img_h": pa.array(f[:, 1].astype(np.int64)),
            "channels": pa.array(f[:, 2].astype(np.int64)),
            "mean_e3": pa.array(np.floor(f[:, 3].astype(np.float64) * 1e3
                                         + 0.5).astype(np.int64)),
        })

    return out.map_batches(rn, batch_format="pyarrow")


def q_audio_features(sf_dir: str):
    """REAL audio decode (PCM WAV struct parse + FFT features) over the
    synthetic media table — actor-pool stage, small batches (binary rows)."""
    import ray.data as rd

    from pcompress_ray.stages.multimodal import AudioFeatureStage, make_fake_media_table

    _setup()
    media = rd.from_arrow(make_fake_media_table(200))
    out = media.map_batches(AudioFeatureStage, batch_format="pyarrow",
                            batch_size=32, concurrency=(1, 2))

    def rn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.replace_schema_metadata(None)
        t = t.filter(pc.equal(t["is_audio"], True))
        return pa.table({
            "media_id": t["media_id"].cast(pa.int64()),
            "sample_rate": t["sample_rate"].cast(pa.int64()),
            "n_samples": t["n_samples"].cast(pa.int64()),
            "duration_ms_decoded": t["duration_ms_decoded"].cast(pa.int64()),
            "zero_crossings": t["zero_crossings"].cast(pa.int64()),
            "dominant_freq_hz": pc.round(t["dominant_freq_hz"], 3),
        })

    return out.map_batches(rn, batch_format="pyarrow")


def q_gopher_quality(sf_dir: str):
    """Gopher-style repetition/diversity quality rule (Rae et al. 2021
    §A1.1 analog): per-doc token count, distinct-token count, top-token
    ratio + pass flag. Embarrassingly parallel — one vectorized
    ``map_batches`` (lexsort+reduceat per batch), NO shuffle; the analog of
    the reference analyzer's per-buffer dictionary-density heuristics
    (filters/analyzer/analyzer.c:32-124) at document granularity."""
    from pcompress_ray.stages.textstats import gopher_stats_batch

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(gopher_stats_batch,
                          batch_format="pyarrow").sort("doc_id")


def q_top_bigrams(sf_dir: str):
    """Corpus bigram frequency top-30: map-side combine (adjacency-aware,
    per-batch partial counts) → groupby-sum → total-order top-k. Only
    (bigram, partial_n) rows enter the shuffle — bounded by batch
    vocabulary², not corpus token count."""
    from ray.data.aggregate import Sum

    from pcompress_ray.stages.textstats import bigram_counts

    _setup()
    ds = _read(sf_dir, "documents", ["text"])
    out = (ds.map_batches(bigram_counts, batch_format="pyarrow")
           .groupby("bigram").aggregate(Sum("n", alias_name="n")))

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"bigram": t["bigram"].cast(pa.string()),
                         "n": t["n"].cast(pa.int64())})

    return (out.map_batches(rn, batch_format="pyarrow")
            .sort(["n", "bigram"], descending=[True, False]).limit(30))


def q_tfidf_top_term(sf_dir: str):
    """Per-doc top TF-IDF term (keyword extraction): exploded (doc, tok, c)
    term frequencies → ONE token-keyed exchange that computes document
    frequency AND attaches the quantized idf to every row (no join — df is
    complete within each token partition) → ONE doc-keyed exchange for the
    vectorized per-doc argmax. idf is quantized to e6 ints BEFORE the
    multiply so tfidf_e6 = c * idf_e6 is exact integer math on both sides
    (a float tf*idf product would hash-diverge on ln() ULPs)."""
    from pcompress_ray.functions.ops import grouped_partitions
    from pcompress_ray.stages.textstats import doc_token_counts

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()  # parquet metadata only
    tokc = ds.map_batches(doc_token_counts, batch_format="pyarrow")

    def attach_idf(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby("tok")["doc_id"].transform("size").to_numpy(np.float64)
        idf_e6 = np.floor(np.log(n_docs / d) * 1e6 + 0.5).astype(np.int64)
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "tok": g["tok"].astype(str),
            "tfidf_e6": g["c"].to_numpy(np.int64) * idf_e6})

    scored = grouped_partitions(tokc, ["tok"], attach_idf, n_parts=32)

    def top1(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "tfidf_e6", "tok"],
                          ascending=[True, False, True], kind="stable")
        out = g.loc[~g["doc_id"].duplicated()]
        return pd.DataFrame({
            "doc_id": out["doc_id"].to_numpy(np.int64),
            "top_term": out["tok"].astype(str),
            "tfidf_e6": out["tfidf_e6"].to_numpy(np.int64)})

    res = grouped_partitions(scored, ["doc_id"], top1, n_parts=16)

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "top_term": t["top_term"].cast(pa.string()),
                         "tfidf_e6": t["tfidf_e6"].cast(pa.int64())})

    return res.map_batches(rn, batch_format="pyarrow").sort("doc_id")


def q_lm_quality(sf_dir: str):
    """CCNet-style unigram-LM quality signal: per-doc mean negative
    log-likelihood against the corpus unigram model. Two passes — (1) build
    the model with a map-side combiner + token groupby (shuffle bounded by
    vocabulary, not corpus); the fitted table is pulled to the driver
    (bounded by VOCAB size) and broadcast via ray.put — the classic
    broadcast-model pattern; at web scale (vocab ≫ memory) swap the
    broadcast for a token-keyed grouped_partitions join, same as
    tfidf_top_term. (2) score every doc in one streaming map_batches
    (searchsorted + reduceat per batch). Logprobs are quantized to e6 ints
    before aggregation so the SQL twin hashes identically."""
    import ray
    from ray.data.aggregate import Sum

    from pcompress_ray.stages.textstats import (lm_score_batch,
                                                unigram_vocab_counts)

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    vocab = (ds.map_batches(unigram_vocab_counts, batch_format="pyarrow")
             .groupby("tok").aggregate(Sum("n", alias_name="n"))
             .to_pandas())  # bounded by vocabulary size
    n = vocab["n"].to_numpy(np.float64)
    order = np.argsort(vocab["tok"].to_numpy())
    toks = vocab["tok"].to_numpy()[order]
    lp_e6 = np.floor(-np.log(n[order] / n.sum()) * 1e6 + 0.5) \
        .astype(np.int64)
    toks_ref, lp_ref = ray.put(toks), ray.put(lp_e6)

    def score(t: pa.Table) -> pa.Table:
        return lm_score_batch(t, ray.get(toks_ref), ray.get(lp_ref))

    return ds.map_batches(score, batch_format="pyarrow").sort("doc_id")


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination (GPT-3 appendix-C style): flag every doc
    sharing a 13-token n-gram with the benchmark set (here: doc_id < 20 as
    the stand-in benchmark). The benchmark's n-gram set is tiny by nature —
    pulled once to the driver and broadcast via ray.put; each batch then
    builds its n-grams vectorized (one join over 13 shifted views) and
    membership-tests against the broadcast set. One streaming pass, no
    shuffle. At web scale with a HUGE benchmark, swap the broadcast for a
    gram-keyed grouped_partitions semi-join."""
    import ray

    from pcompress_ray.stages.textstats import (_split_tokens,
                                                contamination_batch,
                                                ngram_strings)

    import pyarrow.dataset as pads
    import ray.data as rd

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    # benchmark extraction: a FILTERED parquet read (row-group pushdown) —
    # constant cost at any corpus size, not a second full scan
    bench_rows = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        filter=(pads.field("doc_id") < 20)).take_all()
    bt = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in bench_rows], pa.int64()),
        "text": pa.array([r["text"] for r in bench_rows], pa.string())})
    doc, words = _split_tokens(bt, "text")
    _, grams = ngram_strings(doc, words, 13)
    bench_ref = ray.put(frozenset(grams.tolist()))

    def score(t: pa.Table) -> pa.Table:
        return contamination_batch(t, ray.get(bench_ref), n=13)

    return ds.map_batches(score, batch_format="pyarrow").sort("doc_id")


def q_dup_span_coverage(sf_dir: str):
    """Corpus-wide duplicate-span coverage — the suffix-array substring
    stage (north-star item) at corpus scope rather than per candidate
    pair: per doc, how many positions start a corpus-duplicated 16-gram,
    how many maximal merged spans they form (the reference's run merging,
    rabin/rabin_dedup.c:1426-1448), and the union char length covered.
    One distinct-gram discovery exchange (batch-local combiner first),
    then broadcast marking — zero further shuffles at this dup-set size;
    the positional semi-join fallback covers corpora whose duplicated
    vocabulary outgrows the broadcast budget (tested equal)."""
    from pcompress_ray.stages.dupspans import dup_span_stats

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dup_span_stats(ds, L=16).sort("doc_id")


_BPE_MERGES = 48  # merge count for the bpe_* queries (vocab-sized work;
# small enough that the sf tables' compact synthetic vocabulary does NOT
# fully merge — n_bpe_tokens stays a non-degenerate per-doc signal)


def _bpe_train(sf_dir: str):
    """Shared trainer for the bpe_* queries: one word-count exchange, then
    vocabulary-sized driver work (see stages/bpe.py scale notes)."""
    from pcompress_ray.stages.bpe import train_bpe, word_vocab

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    vocab = word_vocab(ds, max_words=50_000)
    merges = train_bpe(vocab["word"].tolist(), vocab["cnt"].tolist(),
                       n_merges=_BPE_MERGES)
    return ds, merges


def q_bpe_merges(sf_dir: str):
    """BPE tokenizer training (Sennrich et al. 2016) — the corpus-statistics
    analog of the reference's adaptive dictionary learning: ONE distributed
    word-frequency exchange (batch-local Counter combiner, per-partition
    deterministic top-k, bounded driver pull) compresses the corpus into a
    weighted vocabulary; merges are trained on that table, corpus-size-
    independent. Deterministic tie-breaks -> same merges at any parallelism.
    Not SQL-expressible (iterative); pinned by the Sennrich fixed-vector +
    determinism pytest."""
    _, merges = _bpe_train(sf_dir)
    return pd.DataFrame({
        "rank": np.arange(len(merges), dtype=np.int64),
        "left": [m[0] for m in merges],
        "right": [m[1] for m in merges],
        "pair_count": np.array([m[2] for m in merges], dtype=np.int64),
    })


def q_bpe_token_counts(sf_dir: str):
    """Apply the trained BPE: per-doc (n_words, n_bpe_tokens) via an
    embarrassingly parallel map_batches with per-worker word->len memoization
    (merge ranks ride plasma once). Rows-only; pytest pins encode semantics
    against the training fixed point (encoding a training word reproduces
    its final training sequence)."""
    import ray

    from pcompress_ray.stages.bpe import bpe_token_counts

    ds, merges = _bpe_train(sf_dir)
    ref = ray.put([(l, r) for l, r, _ in merges])
    return bpe_token_counts(ds, ref).sort("doc_id")


def q_dup_span_excise(sf_dir: str):
    """The ACTION half of dup_span_coverage — Lee-et-al exact substring
    self-dedup as a corpus rewrite: every position whose 16-gram occurred
    at a strictly earlier global (doc_id, off) is excised (islands merged
    at gap<=16 == the reference's backward-reference run coalescing,
    rabin/rabin_dedup.c:1426-1448; 'earlier occurrence wins' == its
    backward-pointing refs), and the spliced documents are re-emitted.
    Discovery carries (count, min packed position) per distinct gram;
    broadcast marking, with a two-exchange fallback where doc text crosses
    the wire exactly once (tested equal)."""
    from pcompress_ray.stages.dupspans import dup_span_excise

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dup_span_excise(ds, L=16).sort("doc_id")


def q_dup_span_anchors(sf_dir: str):
    """Winnowed (minimizer-sampled) duplicate-anchor scan — the
    sub-O(positions) scale path for the suffix-array substring stage
    (Schleimer et al. 2003 robust winnowing): discovery carries ~2/(w+1)
    of the exact mode's rows, and any shared span of length >= w+L-1 is
    GUARANTEED to raise n_dup_anchors on both copies (pytest-pinned).
    Rows-only: the minimizer selection runs on engine polynomial hashes,
    which SQL cannot reproduce; the exact-mode twin (dup_span_coverage)
    carries the oracle burden for this family."""
    from pcompress_ray.stages.dupspans import dup_span_anchors

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dup_span_anchors(ds, L=16, w=4).sort("doc_id")


def q_cross_span_excise(sf_dir: str):
    """Cross-corpus span excision — the Lee-et-al DECONTAMINATION action
    at span granularity (decontaminate/fuzzy_decontaminate SCORE docs;
    this one REWRITES them): positions of corpus A (doc_id%7!=0) whose
    16-gram occurs anywhere in corpus B (doc_id%7==0, the 'benchmark'
    side) are excised and the documents re-spliced. Same both-engines-
    apply-the-rule split as snapshot_diff; exact string_agg splice
    oracle."""
    from pcompress_ray.stages.dupspans import cross_span_excise

    _setup()
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def a_side(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 7 != 0))

    def b_side(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 7 == 0))

    a = docs.map_batches(a_side, batch_format="pyarrow")
    b = docs.map_batches(b_side, batch_format="pyarrow")
    return cross_span_excise(a, b, L=16).sort("doc_id")


def q_corpus_grep(sf_dir: str):
    """Distributed literal grep — the corpus-tooling primitive every
    engine ships (the reference greps its own streams for magic markers,
    e.g. the DICOM/text scanners in utils/utils.c type detection): one
    zero-copy Arrow pass with pc.count_substring, no shuffle. Pattern
    'batch' is self-overlap-free so engine occurrence counts equal the
    oracle's replace-length arithmetic exactly."""
    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def scan(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        n = pc.count_substring(t["text"], "batch")
        out = pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                        "n_hits": n.cast(pa.int64())})
        return out.filter(pc.greater(out["n_hits"], 0))

    return ds.map_batches(scan, batch_format="pyarrow").sort("doc_id")


def q_hll_registers(sf_dir: str):
    """HyperLogLog distinct-token sketch — 256 bytes summarize an
    unbounded key space (the summary that sizes a similarity index at
    10^12 keys, cf. the reference's segmented-index geometry). Per-batch
    FIXED-size partial registers over batch-unique tokens, elementwise-max
    merge, no vocabulary shuffle. The oracle REPRODUCES THE SKETCH (the
    length_hist_quantiles pattern): sha256-derived hash, bucket and rank
    are exact-integer in both engines, so the 256-row register table
    matches bit for bit; the float cardinality estimate stays out of the
    hash-checked output and is accuracy-gated in pytest instead."""
    import re as _re

    from pcompress_ray.functions.hll import batch_hll_partial, merge_registers

    _setup()
    ds = _read(sf_dir, "documents", ["text"])
    tok = _re.compile(_TOKEN_SQL)
    partials = ds.map_batches(lambda t: batch_hll_partial(t, tok),
                              batch_format="pyarrow").to_pandas()
    return merge_registers(partials)


def q_snapshot_diff(sf_dir: str):
    """Cross-snapshot corpus diff — the incremental-crawl primitive
    (pipelines/incremental.py folds new docs in; this op REPORTS what
    changed between two crawls): per doc, added / deleted / changed /
    unchanged. Snapshot B is derived deterministically from the documents
    table (doc_id%11==0 deleted, doc_id%7==0 text appended, doc_id%13==0
    cloned as a new id), the same both-engines-apply-the-rule pattern as
    bloom_dedup. ONE doc_id-keyed exchange of tagged rows, status decided
    per partition fully vectorized; at web scale ship (id, sha) not text."""
    import pyarrow.compute as pc

    from pcompress_ray.functions.ops import grouped_partitions

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tag_a(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "side": pa.array(np.zeros(len(t), np.int64)),
                         "text": pc.fill_null(t["text"].cast(pa.string()),
                                              "")})

    def tag_b(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        txt = np.array([x or "" for x in t["text"].to_pylist()],
                       dtype=object)
        keep = ids % 11 != 0
        mod = ids % 7 == 0
        txt = np.where(mod, txt + " updated", txt)
        new_mask = ids % 13 == 0
        out_ids = np.concatenate([ids[keep], ids[new_mask] + 1_000_000])
        out_txt = np.concatenate([
            txt[keep],
            np.array(["new page " + str(i) for i in ids[new_mask]],
                     dtype=object)])
        return pa.table({"doc_id": pa.array(out_ids),
                         "side": pa.array(np.ones(out_ids.size, np.int64)),
                         "text": pa.array(out_txt.tolist(), pa.string())})

    tagged = ds.map_batches(tag_a, batch_format="pyarrow").union(
        ds.map_batches(tag_b, batch_format="pyarrow"))

    def diff(part: pd.DataFrame) -> pa.Table:
        rows_id, rows_st = [], []
        if len(part):
            ids = part["doc_id"].to_numpy(np.int64)
            side = part["side"].to_numpy(np.int64)
            txt = part["text"].to_numpy()
            o = np.lexsort((side, ids))
            ids, side, txt = ids[o], side[o], txt[o]
            first = np.ones(ids.size, dtype=bool)
            first[1:] = ids[1:] != ids[:-1]
            starts = np.flatnonzero(first)
            sizes = np.diff(np.append(starts, ids.size))
            # size 1: side 0 -> deleted, side 1 -> added
            # size 2: rows sorted (side0, side1) -> compare texts
            one = sizes == 1
            s1 = starts[one]
            rows_id.extend(ids[s1].tolist())
            rows_st.extend(np.where(side[s1] == 0, "deleted",
                                    "added").tolist())
            two = sizes == 2
            s2 = starts[two]
            eq = txt[s2] == txt[s2 + 1]
            rows_id.extend(ids[s2].tolist())
            rows_st.extend(np.where(eq, "unchanged", "changed").tolist())
        return pa.table({"doc_id": pa.array(rows_id, pa.int64()),
                         "status": pa.array(rows_st, pa.string())})

    return grouped_partitions(tagged, ["doc_id"], diff, n_parts=32)


def q_length_hist_quantiles(sf_dir: str):
    """Per-language APPROXIMATE p50/p90 of n_chars via a fixed-width
    histogram sketch — the scale path lang_length_quantiles' docstring
    promises (exact quantiles need the group co-located; a histogram's
    counts are additive, so partials are fixed-size and merge in any
    order/layout). Bucket = min(n_chars // 16, 2047); the reported
    quantile is the bucket lower bound (error <= 16 chars). Every step is
    integer-exact, so the DuckDB twin reproduces the SKETCH itself, not
    just a tolerance band. Exchange volume: <= #blocks x #langs x 2048
    pre-aggregated rows — no corpus shuffle at any scale."""
    from pcompress_ray.functions.ops import grouped_partitions

    _setup()
    W, B = 16, 2048
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        df = pd.DataFrame({
            "lang": t["lang"].to_numpy(zero_copy_only=False),
            "b": np.minimum(t["n_chars"].to_numpy(zero_copy_only=False)
                            // W, B - 1).astype(np.int64)})
        g = df.groupby(["lang", "b"], sort=False).size().reset_index(name="c")
        return pa.table({"lang": pa.array(g["lang"], pa.string()),
                         "b": pa.array(g["b"].to_numpy(np.int64)),
                         "c": pa.array(g["c"].to_numpy(np.int64))})

    def extract(part: pd.DataFrame) -> pa.Table:
        rows = {"lang": [], "n_docs": [], "p50_approx": [], "p90_approx": []}
        if len(part):
            g = (part.groupby(["lang", "b"])["c"].sum().reset_index()
                 .sort_values(["lang", "b"]))
            for lang, sub in g.groupby("lang", sort=True):
                cc = sub["c"].to_numpy(np.int64).cumsum()
                n = int(cc[-1])
                bs = sub["b"].to_numpy(np.int64)
                rows["lang"].append(lang)
                rows["n_docs"].append(n)
                rows["p50_approx"].append(
                    int(bs[np.searchsorted(cc, (n + 1) // 2)]) * W)
                rows["p90_approx"].append(
                    int(bs[np.searchsorted(cc, (9 * n + 9) // 10)]) * W)
        # explicit Arrow schema (empty groups must not degrade to null type)
        return pa.table({"lang": pa.array(rows["lang"], pa.string()),
                         "n_docs": pa.array(rows["n_docs"], pa.int64()),
                         "p50_approx": pa.array(rows["p50_approx"],
                                                pa.int64()),
                         "p90_approx": pa.array(rows["p90_approx"],
                                                pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_partitions(parts, ["lang"], extract, n_parts=16)


def q_fuzzy_decontaminate(sf_dir: str):
    """Fuzzy benchmark decontamination (the near-dup complement of the
    exact-13-gram decontaminate): per corpus doc (doc_id >= 20), the EXACT
    max token-5-gram-set Jaccard vs every benchmark doc (doc_id < 20),
    winner + flag (J >= 1/5) decided by integer cross-multiplication so
    the DuckDB twin agrees bit-exactly. One streaming pass vs a broadcast
    (vocab, membership-matrix) index — no shuffle; at web scale with a
    huge benchmark, shard the index by gram hash and turn the pass into a
    gram-keyed semi-join + per-doc partial-sum exchange."""
    import ray

    import pyarrow.dataset as pads
    import ray.data as rd

    from pcompress_ray.stages.textstats import (bench_gram_index,
                                                bench_jaccard_batch)

    _setup()
    bench_rows = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        filter=(pads.field("doc_id") < 20)).take_all()
    bench_rows.sort(key=lambda r: r["doc_id"])
    bench_ids = np.array([r["doc_id"] for r in bench_rows], np.int64)
    index_ref = ray.put(bench_gram_index(
        bench_ids, [r["text"] for r in bench_rows], n=5))

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.greater_equal(t["doc_id"], 20))
        vocab, mat, sizes = ray.get(index_ref)
        return bench_jaccard_batch(t, vocab, mat, sizes, bench_ids, n=5,
                                   thr_num=1, thr_den=5)

    return ds.map_batches(score, batch_format="pyarrow").sort("doc_id")


def q_dataset_split(sf_dir: str):
    """Deterministic train/val/test split (~80/10/10) by content hash —
    the reproducible splitting primitive for training corpora: no RNG, no
    state, identical assignment across runs/engines/shard layouts (the
    same content-addressed idea as corpus_sample, three-way). One
    streaming map, no shuffle."""
    import hashlib

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def assign(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        h2 = [hashlib.md5((x or "").encode("utf-8")).hexdigest()[:2]
              for x in t["text"].to_pylist()]
        split = ["train" if x < "cc" else ("val" if x < "e6" else "test")
                 for x in h2]
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "split": pa.array(split, pa.string())})

    return ds.map_batches(assign, batch_format="pyarrow").sort("doc_id")


def q_segment_dedup(sf_dir: str):
    """Segment-level exact dedup (CCNet-style repeated-passage removal at
    fixed 10-token windows — the corpus analog of pcompress's fixed-block
    identity dedup, rabin/rabin_dedup.c:711-724 + the global hash index):
    per doc, how many of its segments are corpus-wide duplicates of an
    EARLIER occurrence (first occurrence = min (doc_id, seg_no), the same
    backward-reference canonical order the reference's stream dedup uses,
    rabin/rabin_dedup.c:1606-1617). Segment strings are the shuffle key so
    the DuckDB twin compares equal sets (no hash-collision caveat); at
    100-TB scale, key the exchange on a 128-bit segment hash instead
    (collision-free in practice, ~2x lighter payload) — the string key is
    kept here for oracle-exactness. Two bounded exchanges: segment-keyed
    dup marking (partials emitted per partition), then a doc-keyed sum
    (vectorized grouped_partitions, not Ray's per-key aggregate)."""
    from pcompress_ray.functions.ops import grouped_partitions
    from pcompress_ray.stages.textstats import doc_segments

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    segs = ds.map_batches(doc_segments, batch_format="pyarrow")

    def mark(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["seg", "doc_id", "seg_no"], kind="stable")
        segv = g["seg"].to_numpy()
        firsts = np.empty(len(g), bool)
        if len(g):
            firsts[0] = True
            firsts[1:] = segv[1:] != segv[:-1]
        part = pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64),
                             "dup": (~firsts).astype(np.int64)})
        agg = part.groupby("doc_id", sort=False)["dup"] \
            .agg(n_segs="size", n_dup_segs="sum").reset_index()
        return agg.astype({"doc_id": np.int64, "n_segs": np.int64,
                           "n_dup_segs": np.int64})

    partial = grouped_partitions(segs, ["seg"], mark, n_parts=32)

    def sum_doc(part: pd.DataFrame) -> pd.DataFrame:
        agg = part.groupby("doc_id", sort=False, as_index=False).sum()
        return agg.astype({"doc_id": np.int64, "n_segs": np.int64,
                           "n_dup_segs": np.int64})

    out = grouped_partitions(partial, ["doc_id"], sum_doc, n_parts=32)

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "n_segs": t["n_segs"].cast(pa.int64()),
                         "n_dup_segs": t["n_dup_segs"].cast(pa.int64())})

    return out.map_batches(rn, batch_format="pyarrow").sort("doc_id")


def q_top_dup_segments(sf_dir: str):
    """Boilerplate detection: the 20 most-repeated 10-token segments
    corpus-wide (occurrence count + distinct-doc count). Map-side combine:
    each batch emits (seg, n_occ, n_docs) partials — docs never span
    batches, so summing per-batch distinct-doc counts is exact — then one
    segment-keyed groupby-sum bounded by distinct segments, a total-order
    top-k, and a >1-occurrence filter."""
    from ray.data.aggregate import Sum

    from pcompress_ray.stages.textstats import doc_segments

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def combine(t: pa.Table) -> pa.Table:
        s = doc_segments(t)
        df = pd.DataFrame({"seg": s["seg"].to_numpy(zero_copy_only=False),
                           "doc_id": s["doc_id"].to_numpy()})
        g = df.groupby("seg", sort=False)["doc_id"] \
            .agg(n_occ="size", n_docs="nunique").reset_index()
        return pa.table({"seg": pa.array(g["seg"], pa.string()),
                         "n_occ": pa.array(g["n_occ"].to_numpy(np.int64)),
                         "n_docs": pa.array(g["n_docs"].to_numpy(np.int64))})

    out = (ds.map_batches(combine, batch_format="pyarrow")
           .groupby("seg")
           .aggregate(Sum("n_occ", alias_name="n_occ"),
                      Sum("n_docs", alias_name="n_docs")))

    def rn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.replace_schema_metadata(None)
        t = pa.table({"seg": t["seg"].cast(pa.string()),
                      "n_occ": t["n_occ"].cast(pa.int64()),
                      "n_docs": t["n_docs"].cast(pa.int64())})
        return t.filter(pc.greater(t["n_occ"], 1))

    return (out.map_batches(rn, batch_format="pyarrow")
            .sort(["n_occ", "seg"], descending=[True, False]).limit(20))


def q_pack_sequences(sf_dir: str, seq_len: int = 256, n_parts: int = 16):
    """Sequence packing for pretraining: assign each doc (in doc_id order)
    to a fixed-token-budget training bin via a DISTRIBUTED EXCLUSIVE
    PREFIX SUM — bin_id = (tokens before this doc) // seq_len. The scan
    pattern: (1) one streaming pass reduces each doc to two ints
    (doc_id, n_tokens), materialized — the smallest possible intermediate
    (16 B/doc; at 10^12 docs this spills to the object store rather than
    re-tokenizing the corpus twice); (2) range-partition by doc_id
    (bounds from a metadata-cheap min/max), per-range token totals via a
    tiny groupby-sum pulled to the driver (n_parts rows) and exclusive-
    scanned there; (3) one partition-parallel pass applies
    local-sort + segmented cumsum + the broadcast range offset. No
    global sort, ONE small shuffle."""
    from ray.data.aggregate import Max, Min, Sum

    from pcompress_ray.stages.textstats import doc_token_len

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    tpd = ds.map_batches(doc_token_len, batch_format="pyarrow") \
        .materialize()

    mm = tpd.aggregate(Min("doc_id"), Max("doc_id"))
    lo, hi = int(mm["min(doc_id)"]), int(mm["max(doc_id)"])
    width = max(1, (hi - lo) // n_parts + 1)

    def add_rp(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        rp = ((t["doc_id"].to_numpy(zero_copy_only=False) - lo)
              // width).astype(np.int32)
        return t.append_column("rp", pa.array(rp))

    parted = tpd.map_batches(add_rp, batch_format="pyarrow")
    totals = (parted.groupby("rp")
              .aggregate(Sum("n_tokens", alias_name="tot")).to_pandas())
    totals = totals.sort_values("rp")
    offsets = dict(zip(
        totals["rp"].to_numpy(np.int64),
        (totals["tot"].cumsum() - totals["tot"]).to_numpy(np.int64)))

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        n = g["n_tokens"].to_numpy(np.int64)
        excl = np.cumsum(n) - n + offsets[int(g["rp"].iat[0])]
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "n_tokens": n,
            "bin_id": (excl // seq_len).astype(np.int64)})

    return (parted.groupby("rp").map_groups(scan, batch_format="pandas")
            .sort("doc_id"))


def q_lang_temperature_sample(sf_dir: str):
    """Multilingual corpus rebalancing (CC100/XLM-R temperature sampling,
    tau=0.5): downsample each language at rate sqrt(n_min/n_lang) so
    high-resource languages shrink toward the low-resource ones.
    Deterministic and engine-exact: keep-decisions are content-hash
    thresholds — first 8 md5 hex chars compared against a per-lang
    fixed-width lowercase-hex threshold floor(rate*2^32) (IEEE sqrt is
    correctly rounded, so numpy and DuckDB produce the identical
    integer; rate>=1 languages get sentinel 'g', above every hex char).
    Two stages: a tiny lang-count groupby pulled to the driver (bounded
    by #languages), then one streaming keep-filter pass."""
    import hashlib

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    counts = ds.groupby("lang").count().to_pandas()  # bounded by #langs
    n = counts["count()"].to_numpy(np.float64)
    nmin = n.min()
    thr = {}
    for lang, ni in zip(counts["lang"], n):
        thr[lang] = ("g" if ni <= nmin else
                     format(int(np.floor(np.sqrt(nmin / ni) * 2.0**32)),
                            "08x"))

    def keep(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        langs = t["lang"].to_pylist()
        h8 = [hashlib.md5((x or "").encode("utf-8")).hexdigest()[:8]
              for x in t["text"].to_pylist()]
        mask = pa.array([h < thr[lg] for h, lg in zip(h8, langs)])
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "lang": t["lang"].cast(pa.string())}).filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow").sort("doc_id")


def q_pq_topk(sf_dir: str):
    """Product-quantization ADC top-5 for query vectors vec_id<10 — the
    compressed-domain ANN scale path (uint8 codes, 8-32x smaller than
    f32; recall vs brute force pinned in pytest alongside IVF/LSH)."""
    from pcompress_ray.stages.ann import pq_topk

    _setup()
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = pq_topk(emb, np.arange(10), k=5, m=16, ks=64)

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"query_id": t["query_id"].cast(pa.int64()),
                         "neighbor_id": t["neighbor_id"].cast(pa.int64())})

    return out.map_batches(rn, batch_format="pyarrow")


def q_ivfpq_topk(sf_dir: str):
    """IVF-PQ ADC top-5 (FAISS IndexIVFPQ layout: uint16 list id + m uint8
    residual codes per vector) for query vectors vec_id<10 — the combined
    memory-AND-compute ANN scale path (nprobe list pruning x 32x code
    compression); recall vs brute force pinned in pytest."""
    from pcompress_ray.stages.ann import ivfpq_topk

    _setup()
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = ivfpq_topk(emb, np.arange(10), k=5, n_centroids=64, nprobe=16,
                     m=16, ks=64)

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"query_id": t["query_id"].cast(pa.int64()),
                         "neighbor_id": t["neighbor_id"].cast(pa.int64())})

    return out.map_batches(rn, batch_format="pyarrow")


def q_kcenter_probes(sf_dir: str):
    """Greedy k-center diversity selection over the embeddings table
    (Gonzalez farthest-point 2-approximation) — the data-pruning /
    exemplar-picking counterpart of SemDeDup. k streaming passes, each
    emitting one candidate row per batch against the broadcast chosen
    set; deterministic seed + tie-breaks (pytest-pinned vs an in-memory
    greedy reference; not SQL-expressible — iterative argmin chains)."""
    from pcompress_ray.stages.ann import kcenter_select

    _setup()
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = kcenter_select(emb, k=8)
    out["vec_id"] = out["vec_id"].astype(np.int64)
    out["order"] = out["order"].astype(np.int64)
    out["min_cos_e6"] = np.floor(
        out.pop("min_cos_to_prev").to_numpy() * 1e6 + 0.5).astype(np.int64)
    return out


def q_curate_funnel(sf_dir: str):
    """The composed end-to-end curation funnel (pipelines/curate.py):
    url dedup -> heuristics -> near-dup dedup -> line scrub, run over the
    documents table with the domain tier's synthetic urls; returns the
    per-stage surviving-doc counts (stage, n_docs). Rows-only: the funnel
    composes the MinHash pipeline (not SQL-expressible); every component
    stage has its own oracle elsewhere, and the composition is pinned by
    tests/test_curate.py's planted-victim fixture."""
    from pcompress_ray.config import PipelineConfig
    from pcompress_ray.pipelines.curate import curate_pipeline

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def as_pages(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "url": ("http://" + _synth_hosts(ids) + "/p"
                    + pd.Series(ids).astype(str)).to_numpy(),
            "text": df["text"].to_numpy()})

    pages = ds.map_batches(as_pages, batch_format="pandas")
    res = curate_pipeline(pages, PipelineConfig(sig_concurrency=4))
    stages = list(res.funnel.items())
    return pa.table({
        "stage_no": pa.array(np.arange(len(stages), dtype=np.int64)),
        "stage": pa.array([s for s, _ in stages], pa.string()),
        "n_docs": pa.array(np.asarray([n for _, n in stages], np.int64)),
    })


def q_span_corruption(sf_dir: str, period: int = 10, span: int = 3):
    """T5-style span-corruption noising (Raffel et al. 2020 §3.1.4) as a
    deterministic training-data transform: every token position p with
    (p + doc_id) % period == 0 starts a ``span``-token mask; the span is
    replaced by ONE sentinel <extra_id_K> (K = span index within doc).
    Deterministic positions (not sampled) so the DuckDB twin reproduces
    the corrupted text exactly — same tokens, same sentinels, compared by
    sha256. One streaming map_batches, fully vectorized (segmented
    cumsum + one binary_join per batch); zero-token docs drop out."""
    import hashlib

    from pcompress_ray.stages.textstats import _split_tokens

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def corrupt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.replace_schema_metadata(None)
        doc, words = _split_tokens(t, "text")
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if doc.size == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "n_spans": pa.array([], pa.int64()),
                             "n_masked": pa.array([], pa.int64()),
                             "corrupted_sha": pa.array([], pa.string())})
        first = np.empty(doc.size, bool)
        first[0] = True
        first[1:] = doc[1:] != doc[:-1]
        starts_ = np.flatnonzero(first)
        sizes = np.diff(np.append(starts_, doc.size))
        pos = np.arange(doc.size, dtype=np.int64) - np.repeat(starts_, sizes)
        d_row = np.repeat(ids[doc[starts_]], sizes)
        is_start = (pos + d_row) % period == 0
        # inside-span (dropped) = a start lies 1..span-1 positions back
        dropped = np.zeros(doc.size, bool)
        for k in range(1, span):
            back = (pos - k >= 0) & (((pos - k) + d_row) % period == 0)
            dropped |= back
        dropped &= ~is_start
        # sentinel index K: per-doc running count of starts (exclusive)
        cs = np.cumsum(is_start.astype(np.int64))
        base = np.repeat(cs[starts_] - is_start[starts_].astype(np.int64),
                         sizes)
        kidx = cs - 1 - base                     # valid where is_start
        out_tok = words.astype(object).copy()
        out_tok[is_start] = np.char.add(
            np.char.add("<extra_id_", kidx[is_start].astype(str)), ">")
        keep = ~dropped
        ck = np.cumsum(keep.astype(np.int64))
        off = np.empty(starts_.size + 1, np.int64)
        off[0] = 0
        off[1:] = ck[starts_ + sizes - 1]
        lst = pa.LargeListArray.from_arrays(
            pa.array(off), pa.array(out_tok[keep], pa.string()))
        corrupted = pc.binary_join(lst, " ").to_pylist()
        n_spans = np.add.reduceat(is_start.astype(np.int64), starts_)
        n_masked = np.add.reduceat(
            (is_start | dropped).astype(np.int64), starts_)
        return pa.table({
            "doc_id": pa.array(ids[doc[starts_]]),
            "n_tokens": pa.array(sizes.astype(np.int64)),
            "n_spans": pa.array(n_spans),
            "n_masked": pa.array(n_masked),
            "corrupted_sha": pa.array(
                [hashlib.sha256(s.encode("utf-8")).hexdigest()
                 for s in corrupted], pa.string()),
        })

    return ds.map_batches(corrupt, batch_format="pyarrow").sort("doc_id")


def q_intradoc_repetition(sf_dir: str):
    """Per-doc duplicate-3-gram fraction (the Gopher repetition filter's
    n-gram arm): embarrassingly parallel, ONE streaming map_batches with
    a shared vectorized n-gram builder, no shuffle."""
    from pcompress_ray.stages.textstats import intradoc_repetition

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(intradoc_repetition,
                          batch_format="pyarrow").sort("doc_id")


def q_url_dedup(sf_dir: str):
    """URL-canonicalization exact dedup (the cheapest web-corpus dedup
    tier, RefinedWeb/CCNet practice: canonical-URL dedup precedes MinHash).
    Messy URLs are synthesized deterministically from doc_id (the sf tables
    carry no url column); the kernel lowercases scheme/host, strips default
    ports, fragments, utm_* params and trailing slashes — all vectorized
    pandas str ops — then one hash-partitioned exchange assigns per-group
    canonical_doc_id = min(doc_id), exactly like exact_dup_docs."""
    from pcompress_ray.functions.ops import group_boundaries, grouped_partitions
    from pcompress_ray.stages.urlnorm import canonicalize_urls, synthesize_messy_urls

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id"])

    def canon_col(df: pd.DataFrame) -> pd.DataFrame:
        urls = synthesize_messy_urls(df["doc_id"].to_numpy())
        return pd.DataFrame({"doc_id": df["doc_id"].astype(np.int64),
                             "canon_url": canonicalize_urls(urls)})

    def assign(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["canon_url", "doc_id"])
        key = part["canon_url"].to_numpy()
        ids = part["doc_id"].to_numpy(dtype=np.int64)
        first, gid, _ = group_boundaries(key)
        return pd.DataFrame({"doc_id": ids, "canon_url": key,
                             "canonical_doc_id": ids[first][gid]})

    return grouped_partitions(ds.map_batches(canon_col, batch_format="pandas"),
                              ["canon_url"], assign)


def q_token_doc_freq(sf_dir: str):
    """Corpus document-frequency top-50 (stopword/df extraction): per-batch
    per-doc-distinct partial counts → groupby-sum → sort/limit. Same
    map-side-combine shuffle shape as top_tokens."""
    from ray.data.aggregate import Sum

    from pcompress_ray.stages.textstats import token_doc_counts

    _setup()
    ds = _read(sf_dir, "documents", ["text"])
    out = (ds.map_batches(token_doc_counts, batch_format="pyarrow")
           .groupby("token").aggregate(Sum("df", alias_name="df")))

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"token": t["token"].cast(pa.string()),
                         "df": t["df"].cast(pa.int64())})

    return (out.map_batches(rn, batch_format="pyarrow")
            .sort(["df", "token"], descending=[True, False]).limit(50))


def q_length_buckets(sf_dir: str):
    """Per-(lang, power-of-2 token-length bucket) doc counts — the sequence
    length histogram a packing/curriculum stage reads to pick seq_len.
    Buckets are exact integer comparisons (no float log2) on both sides."""
    from ray.data.aggregate import Count

    _setup()
    ds = _read(sf_dir, "documents", ["lang", "text"])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        from pcompress_ray.stages.textstats import TOKEN_RE

        n = df["text"].fillna("").str.lower().str.count(TOKEN_RE) \
            .to_numpy(dtype=np.int64)
        edges = 2 ** np.arange(13, dtype=np.int64)  # 1,2,...,4096
        idx = np.searchsorted(edges, n, side="right")  # 0 → n==0
        lo = np.where(idx == 0, 0, edges[np.maximum(idx - 1, 0)])
        return pd.DataFrame({"lang": df["lang"].astype(str),
                             "bucket_lo": np.minimum(lo, 4096).astype(np.int64)})

    out = ds.map_batches(bucketize, batch_format="pandas") \
            .groupby(["lang", "bucket_lo"]).aggregate(Count(alias_name="n_docs"))

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"lang": t["lang"].cast(pa.string()),
                         "bucket_lo": t["bucket_lo"].cast(pa.int64()),
                         "n_docs": t["n_docs"].cast(pa.int64())})

    return out.map_batches(rn, batch_format="pyarrow")


def q_shingle_novelty(sf_dir: str):
    """Per-doc shingle novelty (curation signal: how much of a doc's
    content is first seen HERE, in rank order): for each doc, the count of
    its distinct token 3-grams, and how many of those have this doc as
    their global min-doc_id first occurrence. One shingle-keyed exchange
    (each shingle wholly in one partition ⇒ its min is global) emitting
    tiny (first_doc, count) partials; the per-doc stats rows (map-only)
    are UNIONED into the same doc-keyed summing exchange instead of a
    separate hash_join — one exchange total over (doc_id, two int
    counters) after the shingle leg."""
    from pcompress_ray.functions.ops import grouped_partitions
    from pcompress_ray.stages.textstats import (doc_shingle_rows,
                                                doc_shingle_stats)

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    exploded = ds.map_batches(doc_shingle_rows, batch_format="pyarrow")

    def min_doc_partials(part: pd.DataFrame) -> pd.DataFrame:
        if len(part) == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "novel": pd.Series(dtype=np.int64),
                                 "n_sh": pd.Series(dtype=np.int64)})
        m = part.groupby("sh", sort=False)["doc_id"].min()
        vc = m.value_counts()
        return pd.DataFrame({"doc_id": vc.index.to_numpy(np.int64),
                             "novel": vc.to_numpy(np.int64),
                             "n_sh": np.zeros(len(vc), np.int64)})

    partials = grouped_partitions(exploded, ["sh"], min_doc_partials)

    def stats_rows(t: pa.Table) -> pa.Table:
        s = doc_shingle_stats(t)
        return pa.table({"doc_id": s["doc_id"],
                         "novel": pa.array(np.zeros(len(s), np.int64)),
                         "n_sh": s["n_shingles"]})

    stats = ds.map_batches(stats_rows, batch_format="pyarrow")

    def sum_part(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby("doc_id", as_index=False)[["novel", "n_sh"]].sum()
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64),
                             "n_shingles": g["n_sh"].to_numpy(np.int64),
                             "n_novel": g["novel"].to_numpy(np.int64)})

    out = grouped_partitions(partials.union(stats), ["doc_id"], sum_part,
                             n_parts=16)

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "n_shingles": t["n_shingles"].cast(pa.int64()),
                         "n_novel": t["n_novel"].cast(pa.int64())})

    return out.map_batches(rn, batch_format="pyarrow").sort("doc_id")


def q_source_overlap(sf_dir: str):
    """Cross-source contamination matrix: for every source pair, the count
    of distinct token 3-grams present in BOTH sources. One shingle-keyed
    exchange; per partition a vectorized self-merge over the (few) sources
    sharing each shingle; final per-pair sum is tiny (#sources² rows)."""
    from pcompress_ray.functions.ops import grouped_partitions
    from pcompress_ray.stages.textstats import doc_shingle_rows

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    exploded = ds.map_batches(
        lambda t: doc_shingle_rows(t, carry_col="source"),
        batch_format="pyarrow")

    def pair_partials(part: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"source_a": pd.Series(dtype=str),
                              "source_b": pd.Series(dtype=str),
                              "n": pd.Series(dtype=np.int64)})
        if len(part) == 0:
            return empty
        d = part[["sh", "source"]].drop_duplicates()
        m = d.merge(d, on="sh")
        m = m[m["source_x"] < m["source_y"]]
        if len(m) == 0:
            return empty
        g = m.groupby(["source_x", "source_y"], as_index=False).size()
        return pd.DataFrame({"source_a": g["source_x"].astype(str),
                             "source_b": g["source_y"].astype(str),
                             "n": g["size"].to_numpy(np.int64)})

    partials = grouped_partitions(exploded, ["sh"], pair_partials)

    def sum_part(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby(["source_a", "source_b"], as_index=False)["n"].sum()
        return pd.DataFrame({"source_a": g["source_a"].astype(str),
                             "source_b": g["source_b"].astype(str),
                             "n_shared": g["n"].to_numpy(np.int64)})

    out = grouped_partitions(partials, ["source_a", "source_b"], sum_part,
                             n_parts=8)

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"source_a": t["source_a"].cast(pa.string()),
                         "source_b": t["source_b"].cast(pa.string()),
                         "n_shared": t["n_shared"].cast(pa.int64())})

    return out.map_batches(rn, batch_format="pyarrow") \
              .sort(["source_a", "source_b"])


def q_corpus_merkle(sf_dir: str):
    """Order-SENSITIVE Merkle integrity manifest: 64 hash-bucket rows,
    each sha256 over the doc_id-ordered concatenation of per-doc sha256
    leaves (hex). Complements corpus_fingerprint's commutative XOR — the
    Merkle form also catches reordering/duplication inside a bucket, and a
    resumable 100-TB job re-verifies one bucket at a time (the reference's
    decoded-payload SHA gate, test/backward_compat/, at manifest
    granularity). One bucket-keyed exchange; leaves hashed where the data
    lives, only 64 digests leave the workers."""
    import hashlib

    from pcompress_ray.functions.ops import grouped_partitions

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def add_leaf(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        leaves = [hashlib.sha256((x or "").encode("utf-8")).hexdigest()
                  for x in t["text"].to_pylist()]
        return pa.table({"bucket": pa.array(ids % 64),
                         "doc_id": pa.array(ids),
                         "leaf": pa.array(leaves, pa.string())})

    def roll(part: pd.DataFrame) -> pd.DataFrame:
        if not len(part):
            return pd.DataFrame({"bucket": pd.Series([], dtype=np.int64),
                                 "n_docs": pd.Series([], dtype=np.int64),
                                 "bucket_sha": pd.Series([], dtype=object)})
        part = part.sort_values(["bucket", "doc_id"], kind="stable")
        out_b, out_n, out_s = [], [], []
        for bkt, g in part.groupby("bucket", sort=True):
            out_b.append(int(bkt))
            out_n.append(len(g))
            out_s.append(hashlib.sha256(
                "".join(g["leaf"]).encode("ascii")).hexdigest())
        return pd.DataFrame({"bucket": np.asarray(out_b, np.int64),
                             "n_docs": np.asarray(out_n, np.int64),
                             "bucket_sha": out_s})

    out = grouped_partitions(ds.map_batches(add_leaf,
                                            batch_format="pyarrow"),
                             ["bucket"], roll, n_parts=16)

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"bucket": t["bucket"].cast(pa.int64()),
                         "n_docs": t["n_docs"].cast(pa.int64()),
                         "bucket_sha": t["bucket_sha"].cast(pa.string())})

    return out.map_batches(rn, batch_format="pyarrow").sort("bucket")


def q_corpus_fingerprint(sf_dir: str):
    """Order-invariant per-lang corpus fingerprint: XOR of each doc's
    first-60-bit SHA-256 prefix + doc count — the dataset-versioning /
    integrity-manifest analog of the reference's decoded-payload SHA
    gate (test/backward_compat/). Per-block partials (XOR commutes), one
    tiny per-lang combine; no driver materialization."""
    from pcompress_ray.functions.ops import grouped_partitions
    from pcompress_ray.stages.textstats import sha_prefix_fingerprint

    _setup()
    ds = _read(sf_dir, "documents", ["lang", "text"])
    partials = ds.map_batches(sha_prefix_fingerprint, batch_format="pyarrow")

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby("lang", as_index=False).agg(
            n_docs=("n_docs", "sum"),
            fingerprint=("fingerprint",
                         lambda s: np.bitwise_xor.reduce(s.to_numpy())))
        return pd.DataFrame({"lang": g["lang"].astype(str),
                             "n_docs": g["n_docs"].to_numpy(np.int64),
                             "fingerprint": g["fingerprint"].to_numpy(np.int64)})

    out = grouped_partitions(partials, ["lang"], combine, n_parts=8)

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"lang": t["lang"].cast(pa.string()),
                         "n_docs": t["n_docs"].cast(pa.int64()),
                         "fingerprint": t["fingerprint"].cast(pa.int64())})

    return out.map_batches(rn, batch_format="pyarrow").sort("lang")


def q_stratified_sample(sf_dir: str):
    """Deterministic per-stratum eval-set carving: the k=20 docs with the
    smallest (md5(text), doc_id) key per language — no RNG, identical
    across runs/engines/shard layouts (content-addressed like
    dataset_split, but fixed-size per stratum). Scale shape: per-batch
    partial top-k (map-side combiner) → one lang-keyed exchange of ≤ k
    rows per (lang, batch) → final top-k; the corpus never shuffles."""
    import hashlib

    from pcompress_ray.functions.ops import grouped_partitions

    _setup()
    K = 20
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        key = [hashlib.md5((x if x is not None else "").encode("utf-8"))
               .hexdigest() for x in df["text"]]
        out = pd.DataFrame({"lang": df["lang"].astype(str),
                            "doc_id": df["doc_id"].to_numpy(np.int64),
                            "key": key})
        return out.sort_values(["lang", "key", "doc_id"]) \
                  .groupby("lang", sort=False).head(K)

    partials = ds.map_batches(partial_topk, batch_format="pandas")

    def final_topk(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values(["lang", "key", "doc_id"]) \
             .groupby("lang", sort=False).head(K)
        return pd.DataFrame({"lang": p["lang"].astype(str),
                             "doc_id": p["doc_id"].to_numpy(np.int64)})

    out = grouped_partitions(partials, ["lang"], final_topk, n_parts=8)

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"lang": t["lang"].cast(pa.string()),
                         "doc_id": t["doc_id"].cast(pa.int64())})

    return out.map_batches(rn, batch_format="pyarrow").sort(["lang", "doc_id"])


def q_pmi_bigrams(sf_dir: str):
    """Phrase mining (tokenizer-vocab candidates): top-30 bigrams by
    pointwise-mutual-information LIFT = c_ab·N / (c_a·c_b) among bigrams
    with c_ab ≥ 5. The lift is computed as an EXACT integer
    floor(c_ab·N·1e6 / (c_a·c_b)) on both sides — no log(), no float, no
    ULP drift (same idea as tfidf_top_term's pre-quantized idf). Unigram
    model broadcast like lm_quality (bounded by vocabulary, not corpus);
    bigram counts arrive map-side-combined like top_bigrams."""
    import ray
    from ray.data.aggregate import Sum

    from pcompress_ray.stages.textstats import (bigram_counts,
                                                unigram_vocab_counts)

    _setup()
    MIN_AB = 5
    ds = _read(sf_dir, "documents", ["text"])
    vocab = (ds.map_batches(unigram_vocab_counts, batch_format="pyarrow")
             .groupby("tok").aggregate(Sum("n", alias_name="n"))
             .to_pandas())  # bounded by vocabulary size
    toks = vocab["tok"].to_numpy()
    order = np.argsort(toks)
    toks_sorted = toks[order]
    cnt_sorted = vocab["n"].to_numpy(np.int64)[order]
    n_total = int(cnt_sorted.sum())
    # int64 bound: lift numerator ≤ N²·1e6 — exact in int64 for N ≤ 3e6
    # tokens; beyond that fall back to arbitrary-precision Python ints
    use_np = n_total <= 3_000_000
    toks_ref, cnt_ref = ray.put(toks_sorted), ray.put(cnt_sorted)

    big = (ds.map_batches(bigram_counts, batch_format="pyarrow")
           .groupby("bigram").aggregate(Sum("n", alias_name="n_ab")))

    def lift(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n_ab"].to_numpy() >= MIN_AB]
        if len(df) == 0:
            return pd.DataFrame({"bigram": pd.Series(dtype=str),
                                 "n_ab": pd.Series(dtype=np.int64),
                                 "lift_e6": pd.Series(dtype=np.int64)})
        tk, ct = ray.get(toks_ref), ray.get(cnt_ref)
        parts = df["bigram"].str.split(" ", n=1, expand=True)
        ca = ct[np.searchsorted(tk, parts[0].to_numpy())]
        cb = ct[np.searchsorted(tk, parts[1].to_numpy())]
        n_ab = df["n_ab"].to_numpy(np.int64)
        if use_np:
            lift_e6 = (n_ab * n_total * 1_000_000) // (ca * cb)
        else:
            lift_e6 = np.fromiter(
                ((int(a) * n_total * 1_000_000) // (int(x) * int(y))
                 for a, x, y in zip(n_ab, ca, cb)), np.int64, n_ab.size)
        return pd.DataFrame({"bigram": df["bigram"].astype(str),
                             "n_ab": n_ab,
                             "lift_e6": lift_e6.astype(np.int64)})

    out = big.map_batches(lift, batch_format="pandas")

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"bigram": t["bigram"].cast(pa.string()),
                         "n_ab": t["n_ab"].cast(pa.int64()),
                         "lift_e6": t["lift_e6"].cast(pa.int64())})

    return (out.map_batches(rn, batch_format="pyarrow")
            .sort(["lift_e6", "bigram"], descending=[True, False]).limit(30))


def q_cms_top_tokens(sf_dir: str):
    """Approximate heavy hitters via Count-Min sketch: top-20 tokens by
    estimated count from FIXED-size per-block partial sketches (64 KB
    each) + per-block local top-k candidate unions — no vocabulary-sized
    shuffle at all, the summary the engine would use where the key space
    is unbounded (URLs, raw byte n-grams) at 10^12 docs. One-sided error:
    estimate ≥ true count. Deterministic (fixed hash seeds, merge is a
    sum). Rows-only for the driver (approximate by design); pinned by the
    pytest sketch oracle (tests/test_cms.py)."""
    import ray.data as rd

    from pcompress_ray.functions.cms import CountMinSketch
    from pcompress_ray.hashing import hash_strings
    from pcompress_ray.stages.textstats import unigram_vocab_counts

    _setup()
    K, CAND = 20, 64
    ds = _read(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        counts = unigram_vocab_counts(t)
        toks = counts["tok"].to_numpy(zero_copy_only=False)
        n = counts["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = CountMinSketch.empty().add(hash_strings(toks.astype(str)), n)
        top = np.lexsort((toks, -n))[:CAND]  # local exact top candidates
        return pa.table({
            "sketch": pa.array([sk.table.tobytes()], pa.binary()),
            "shape": pa.array([list(sk.table.shape)],
                              pa.list_(pa.int64())),
            "cand_toks": pa.array([[str(x) for x in toks[top]]],
                                  pa.list_(pa.string())),
        })

    def combine(t: pa.Table) -> pa.Table:
        # combine tier: driver ingress #blocks/32 x 64 KB, not #blocks
        acc, cands = None, []
        for i in range(len(t)):
            d, w = t["shape"][i].as_py()
            sk = CountMinSketch(np.frombuffer(
                t["sketch"][i].as_py(), np.int64).reshape(d, w).copy())
            acc = sk if acc is None else acc.merge(sk)
            cands.extend(t["cand_toks"][i].as_py())
        cands = sorted(set(cands))
        return pa.table({
            "sketch": pa.array([acc.table.tobytes()], pa.binary()),
            "shape": pa.array([list(acc.table.shape)], pa.list_(pa.int64())),
            "cand_toks": pa.array([cands], pa.list_(pa.string())),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow") \
        .map_batches(combine, batch_size=32, batch_format="pyarrow") \
        .take_all()
    # driver merge: #blocks/32 × 64 KB partials — bounded, not corpus-sized
    merged, cand = None, []
    for row in parts:
        d, w = row["shape"]
        sk = CountMinSketch(
            np.frombuffer(row["sketch"], np.int64).reshape(d, w).copy())
        merged = sk if merged is None else merged.merge(sk)
        cand.extend(row["cand_toks"])
    cand = np.array(sorted(set(cand)), dtype=object)
    if merged is None:
        return pa.table({"token": pa.array([], pa.string()),
                         "est_n": pa.array([], pa.int64())})
    est = merged.estimate(hash_strings(cand.astype(str)))
    sel = np.lexsort((cand.astype(str), -est))[:K]
    return pa.table({"token": pa.array(cand[sel].astype(str), pa.string()),
                     "est_n": pa.array(est[sel], pa.int64())})


def q_dedup_rewrite(sf_dir: str):
    """RefinedWeb/CCNet-style corpus REWRITE: remove every 10-token segment
    already seen earlier corpus-wide (first occurrence by (doc_id, seg_no)
    keeps it) and re-emit the cleaned document — the corpus analog of
    pcompress re-emitting the deduplicated stream with backward references
    (rabin/rabin_dedup.c:711-724, 1606-1617), where q_segment_dedup only
    reports the counts. Two hash-partitioned exchanges
    (stages/rewrite.py); output carries sha256 of the rewritten text so
    the oracle compares full content without shipping it."""
    import hashlib

    from pcompress_ray.stages.rewrite import segment_dedup_rewrite

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = segment_dedup_rewrite(ds, w=10, n_parts=32)

    def finish(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        txt = t["new_text"].to_pylist()
        return pa.table({
            "doc_id": t["doc_id"].cast(pa.int64()),
            "n_segs": t["n_segs"].cast(pa.int64()),
            "n_kept": t["n_kept"].cast(pa.int64()),
            "new_n_chars": pa.array([len(s) for s in txt], pa.int64()),
            "new_sha": pa.array(
                [hashlib.sha256(s.encode("utf-8")).hexdigest()
                 for s in txt], pa.string()),
        })

    return out.map_batches(finish, batch_format="pyarrow").sort("doc_id")


def q_line_dedup(sf_dir: str):
    """CCNet/RefinedWeb-style LINE-level boilerplate scrub: every line whose
    trimmed form occurs in >= 2 distinct documents is removed from ALL of
    them (template/nav/footer removal — the remove-everywhere complement of
    dedup_rewrite's keep-first passage dedup). The flat testdata docs carry
    no newlines, so BOTH sides first reflow each doc into lines of 8 tokens
    (deterministic, identical in Ray and SQL — same trick as the
    segment_dedup family); zero-token docs drop out of the reflow on both
    sides. Output: per-doc line counts + sha256 of the rewritten text."""
    import hashlib

    from pcompress_ray.stages.rewrite import line_dedup_rewrite
    from pcompress_ray.stages.textstats import doc_segments

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def reflow(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        seg = doc_segments(t, w=8)
        doc = seg["doc_id"].to_numpy(zero_copy_only=False)
        if doc.size == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "text": pa.array([], pa.string())})
        first = np.empty(doc.size, bool)
        first[0] = True
        first[1:] = doc[1:] != doc[:-1]
        starts = np.flatnonzero(first)
        offs = np.append(starts, doc.size).astype(np.int64)
        lst = pa.LargeListArray.from_arrays(
            pa.array(offs), seg["seg"].combine_chunks()
            if isinstance(seg["seg"], pa.ChunkedArray) else seg["seg"])
        return pa.table({"doc_id": pa.array(doc[starts].astype(np.int64)),
                         "text": pc.binary_join(lst, "\n")})

    out = line_dedup_rewrite(ds.map_batches(reflow, batch_format="pyarrow"),
                             min_docs=2, n_parts=32)

    def finish(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        txt = t["new_text"].to_pylist()
        return pa.table({
            "doc_id": t["doc_id"].cast(pa.int64()),
            "n_lines": t["n_lines"].cast(pa.int64()),
            "n_kept": t["n_kept"].cast(pa.int64()),
            "new_n_chars": pa.array([len(s) for s in txt], pa.int64()),
            "new_sha": pa.array(
                [hashlib.sha256(s.encode("utf-8")).hexdigest()
                 for s in txt], pa.string()),
        })

    return out.map_batches(finish, batch_format="pyarrow").sort("doc_id")


def q_anchor_index(sf_dir: str):
    """Anchor-text index — the classic webgraph ranking signal: extract
    every <a href> link with its inner text from real HTML, then aggregate
    per target (in-link count, distinct source docs, dominant anchor
    string). The flat testdata has no HTML, so BOTH sides first wrap each
    doc in a deterministic 3-link HTML page whose hrefs/anchors derive from
    (doc_id, tokens) — the pii_redact trick — and BOTH sides then parse
    that HTML with the same RE2-compatible regex (DuckDB regexp_extract_all
    runs the identical pattern, so the parse itself is oracle-checked).
    Zero-token docs drop out on both sides."""
    from pcompress_ray.stages.extract import anchor_index, extract_links_batch

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def wrap(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t["text"].to_pylist()
        out_id, out_html = [], []
        for d, txt in zip(ids, texts):
            tk = [w for w in (txt or "").split(" ") if w]
            n = len(tk)
            if n == 0:
                continue
            parts = ["<html><body>"]
            for i in range(3):
                href = f"http://h{(d * 7 + i) % 200}.example/p{(d * 13 + 5 * i) % 50}"
                a1 = tk[(3 * i) % n]
                a2 = tk[(3 * i + 1) % n]
                parts.append(f'<a class="l{i}" href="{href}">'
                             f"{a1} <b>{a2}</b></a>")
            parts.append("</body></html>")
            out_id.append(int(d))
            out_html.append("".join(parts))
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "html": pa.array(out_html, pa.string())})

    links = ds.map_batches(wrap, batch_format="pyarrow") \
        .map_batches(extract_links_batch, batch_format="pyarrow")
    out = anchor_index(links, n_parts=32)

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"href": t["href"].cast(pa.string()),
                         "n_links": t["n_links"].cast(pa.int64()),
                         "n_src_docs": t["n_src_docs"].cast(pa.int64()),
                         "top_anchor": t["top_anchor"].cast(pa.string())})

    return out.map_batches(rn, batch_format="pyarrow")


def q_ctph_neardup(sf_dir: str):
    """ssdeep-style CTPH fuzzy-match pairs over documents (no SQL oracle —
    rolling-trigger piecewise digests + edit-distance scoring are not
    SQL-expressible; the kernels are pinned byte-for-byte against a pure-
    Python reference in tests/test_ctph.py). Exact-dup docs score 100;
    locally-edited near-dups land in (60, 100)."""
    from pcompress_ray.stages.ctph import ctph_candidate_pairs, ctph_digest_batch

    _setup()
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    sigs = docs.map_batches(ctph_digest_batch, batch_format="pyarrow")
    out = ctph_candidate_pairs(sigs, min_score=60, n_parts=32)

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"doc_a": t["doc_a"].cast(pa.int64()),
                         "doc_b": t["doc_b"].cast(pa.int64()),
                         "blocksize": t["blocksize"].cast(pa.int64()),
                         "score": t["score"].cast(pa.int64())})

    return out.map_batches(rn, batch_format="pyarrow")


def q_pii_redact(sf_dir: str):
    """PII redaction (emails / IPv4 / phone-shaped tokens) — the fixed-order
    pattern-rewrite preprocessing pass of a webtext pipeline (reference
    analog: the preproc filter chain, archive/pc_arc_filter.c:71-125). The
    synthetic corpus contains no PII, so BOTH sides first append a
    deterministic doc_id-derived PII suffix (pure test harness — identical
    string construction in Ray and SQL), then run the byte-identical
    regexes (stages/pii.py PII_PATTERNS, common Python-re/RE2 subset).
    Output: per-doc match counts + sha256 of the redacted text."""
    import hashlib

    from pcompress_ray.stages.pii import redact_batch

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def aug(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        d = pd.Series(t["doc_id"].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        base = pd.Series(t["text"].to_pandas()).fillna("")
        phone = pd.Series(np.where(
            d % 3 == 0,
            " call 555-" + (d % 10000).astype(str).str.zfill(4), ""))
        txt = (base + " contact user" + d.astype(str)
               + "@example.com or 10." + (d % 256).astype(str) + "."
               + ((d // 256) % 256).astype(str) + ".7" + phone)
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "text": pa.array(txt.to_numpy(), pa.string())})

    out = (ds.map_batches(aug, batch_format="pyarrow")
           .map_batches(redact_batch, batch_format="pyarrow"))

    def finish(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        red = t["red_text"].to_pylist()
        return pa.table({
            "doc_id": t["doc_id"],
            "n_email": t["n_email"],
            "n_ipv4": t["n_ipv4"],
            "n_phone": t["n_phone"],
            "red_n_chars": pa.array([len(s) for s in red], pa.int64()),
            "red_sha": pa.array(
                [hashlib.sha256(s.encode("utf-8")).hexdigest()
                 for s in red], pa.string()),
        })

    return out.map_batches(finish, batch_format="pyarrow").sort("doc_id")


def q_heuristic_filter(sf_dir: str):
    """C4/Gopher-style heuristic pre-filter: fixed ordered rule set per doc
    (min/max words, mean token length band, top-token dominance, stopword
    presence, blocklist) reported as a fail BITMASK + keep flag — the
    corpus analog of pcompress's per-block gating before expensive work
    (incompressible gate, pcompress.c:3698-3741). All thresholds are
    exact-integer comparisons shared with the generated SQL twin
    (stages/filter_rules.py)."""
    from pcompress_ray.stages.filter_rules import heuristic_filter_batch

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return (ds.map_batches(heuristic_filter_batch, batch_format="pyarrow")
            .sort("doc_id"))


def q_incremental_neardup(sf_dir: str):
    """Incremental NEAR-dup fold-in — the fuzzy sibling of bloom_dedup
    (pipelines/incremental.dedup_increment; reference analog: appending
    to pcompress's grow-only global chunk index, rabin/global/index.c):
    run the flagship on the first 80% of docs (the historical store),
    then fold the last 20% in as an increment. The increment's shas /
    chunk hashes / band keys ship as broadcast prefilters so only
    TOUCHED buckets pay the exchange (metrics record how few that is);
    prior docs' cluster ids and canonical flags are stable by
    construction. Equivalence to a full recompute over the union is the
    pytest oracle (tests/test_incremental.py); MinHash perm state =>
    rows-only for the driver. Stop-shingle sampling is disabled so the
    store and increment band under the same suppression set."""
    from pcompress_ray.config import PipelineConfig
    from pcompress_ray.pipelines.dedup import dedup_pipeline
    from pcompress_ray.pipelines.incremental import dedup_increment
    from pcompress_ray.sources.corpus import pages_from_documents

    _setup()
    cfg = PipelineConfig(stop_shingle_df=0)
    pages = pages_from_documents(sf_dir)

    def add_rank(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        ids = t["doc_id"].cast(pa.int64())
        return t.append_column("rank", ids)

    pages = pages.map_batches(add_rank, batch_format="pyarrow")
    # row count from parquet FOOTER metadata — no execution pass
    import pyarrow.parquet as pq_mod
    n = pq_mod.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    cut = (n * 4) // 5  # append-only rank contract: increment = newest 20%

    def split(keep_store: bool):
        def f(t: pa.Table) -> pa.Table:
            t = t.replace_schema_metadata(None)
            r = t["rank"].to_numpy(zero_copy_only=False)
            m = r < cut if keep_store else r >= cut
            return t.filter(pa.array(m))
        return f

    store = pages.map_batches(split(True), batch_format="pyarrow")
    newer = pages.map_batches(split(False), batch_format="pyarrow")
    prev = dedup_pipeline(store, cfg, compute_pairs=False)
    inc = dedup_increment(prev.signatures, prev.edges, newer, cfg)
    return inc.clusters.select_columns(
        ["url", "cluster_id", "is_canonical"]).sort("url")


def q_bloom_dedup(sf_dir: str):
    """Incremental exact dedup behind a broadcast Bloom prefilter: the
    store (even doc_ids) ships once as fixed-size Bloom bits; the
    increment (odd doc_ids) resolves "definitely new" locally and only the
    maybe sliver pays the exact sha exchange
    (pipelines/incremental.bloom_prefilter_dedup — the 100-TB analog of
    probing pcompress's global chunk index, rabin/global/index.c). The
    Bloom has no false negatives, so is_dup is EXACT and the DuckDB twin
    is plain text-equality EXISTS; Bloom internals (FP rate, merge) are
    pinned by tests/test_bloom_dedup.py. The raw documents table has zero
    exact text dups, so BOTH sides first replace doc_id % 7 < 2 texts with
    one of 3 shared boilerplate templates (deterministic harness
    injection, identical string on both engines) — giving the increment a
    real mix of dups and uniques."""
    import pyarrow.compute as pc

    from pcompress_ray.pipelines.incremental import bloom_prefilter_dedup

    _setup()
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def inject(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        txt = pd.Series(t["text"].to_pandas()).fillna("").to_numpy(object)
        boiler = d % 7 < 2
        tmpl = np.array([f"template page v{v}" for v in range(3)],
                        dtype=object)
        txt = np.where(boiler, tmpl[d % 3], txt)
        return pa.table({"doc_id": pa.array(d),
                         "text": pa.array(txt, pa.string())})

    docs = docs.map_batches(inject, batch_format="pyarrow")

    def parity(keep_even: bool):
        def f(t: pa.Table) -> pa.Table:
            t = t.replace_schema_metadata(None)
            even = pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0)
            return t.filter(even if keep_even else pc.invert(even))
        return f

    store = docs.map_batches(parity(True), batch_format="pyarrow")
    new = docs.map_batches(parity(False), batch_format="pyarrow")
    out = bloom_prefilter_dedup(new, store, n_bits=1 << 20, k=7)

    def finish(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "is_dup": t["is_dup"].cast(pa.int64())})

    return out.map_batches(finish, batch_format="pyarrow").sort("doc_id")


def q_kmeans_clusters(sf_dir: str):
    """Distributed Lloyd k-means over the embeddings table
    (stages/kmeans.py): deterministic rank-invariant init, per-iteration
    fixed-size partial sums folded on the driver (#blocks x k x dim — no
    shuffle at any corpus size), final stateless argmin assignment.
    Iterative => no SQL twin (rows-only for the driver); pinned exactly
    against a same-update-rule numpy oracle in tests/test_kmeans.py."""
    from pcompress_ray.stages.kmeans import kmeans_assign, kmeans_fit

    _setup()
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cents = kmeans_fit(emb, k=8, n_iter=5)
    return kmeans_assign(emb, cents).sort("vec_id")


def q_semdedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023) semantic dedup over the embeddings
    table (stages/semdedup.py): no-shuffle distributed k-means, then ONE
    cluster-keyed map_groups exchange applying the deterministic
    farthest-from-centroid-first greedy cosine scan (eps=0.97). The
    embedding-space analog of pcompress's sketch->bucket->verify similarity
    index (rabin/rabin_dedup.c:1606-1617). Iterative k-means => no SQL twin
    (rows-only for the driver); pinned exactly against a same-rules numpy
    oracle in tests/test_semdedup.py."""
    from pcompress_ray.stages.semdedup import semdedup

    _setup()
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return semdedup(emb, k=8, eps=0.97, n_iter=5).sort("vec_id")


def q_weighted_sample(sf_dir: str):
    """Deterministic weight-proportional Poisson sampling (inclusion
    probability ~ n_chars — the 'sample long documents more' mixture
    primitive): doc kept iff H * W < T * w * 2^60 where H = first 60 bits
    of md5(text), w = max(n_chars,1), W = corpus-wide sum(w), T = 64
    expected picks. ALL-INTEGER math (Python bigint / DuckDB HUGEINT), so
    the oracle selects the exact same rows — no float thresholds, no RNG.
    Scale shape: pass 1 is a fixed-size per-block partial sum folded to one
    scalar (map-side combiner, no shuffle), pass 2 a stateless broadcast
    filter; the corpus never shuffles and never leaves the workers."""
    import hashlib

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def partial_w(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        w = np.maximum(t["n_chars"].to_numpy(zero_copy_only=False), 1)
        return pa.table({"w": pa.array([int(w.sum())], pa.int64())})

    total_w = int(ds.map_batches(partial_w, batch_format="pyarrow")
                  .sum("w"))
    target = 64

    def pick(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        texts = t["text"].to_pylist()
        w = np.maximum(t["n_chars"].to_numpy(zero_copy_only=False),
                       1).tolist()
        keep = []
        for x, wi in zip(texts, w):
            h = int(hashlib.md5((x or "").encode("utf-8"))
                    .hexdigest()[:15], 16)
            keep.append(h * total_w < (target * int(wi)) << 60)
        m = pa.array(keep, pa.bool_())
        return pa.table({
            "doc_id": t["doc_id"].cast(pa.int64()).filter(m),
            "n_chars": t["n_chars"].cast(pa.int64()).filter(m),
        })

    return ds.map_batches(pick, batch_format="pyarrow")


def q_corpus_shuffle(sf_dir: str, n_shards: int = 16, seed: int = 42):
    """Seeded DETERMINISTIC global shuffle — the last stage of a
    training-data pipeline (order randomization + fixed shard assignment
    before the shards are written as partitioned parquet). Key =
    sha256(doc_id || '-' || seed): shard = first 8 hex digits mod
    n_shards, in-shard position = rank of the full digest. Reproducible
    across runs AND cluster sizes by construction (a pure function of
    doc_id), unlike ds.random_shuffle() whose layout depends on block
    boundaries. ONE shard-keyed exchange; the in-shard rank is a
    per-partition sort (a shard never spans partitions). At 10^12 docs
    swap the string sha for the splitmix64 path (hashing.py) — sha256 is
    kept here so DuckDB's sha256 twins the key bit-for-bit."""
    import hashlib

    from pcompress_ray.functions.ops import group_boundaries, grouped_partitions

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id"])

    def key(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hx = [hashlib.sha256(f"{i}-{seed}".encode()).hexdigest()
              for i in ids]
        shard = np.fromiter((int(h[:8], 16) % n_shards for h in hx),
                            np.int64, len(hx))
        return pa.table({"doc_id": pa.array(ids),
                         "shard_id": pa.array(shard),
                         "k": pa.array(hx, pa.string())})

    def rank(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["shard_id", "k", "doc_id"], kind="stable")
        sh = part["shard_id"].to_numpy(np.int64)
        first, gid, _ = group_boundaries(sh)
        starts = np.flatnonzero(first)
        pos = np.arange(len(part), dtype=np.int64) - starts[gid]
        return pd.DataFrame({"doc_id": part["doc_id"].to_numpy(np.int64),
                             "shard_id": sh, "pos": pos})

    keyed = ds.map_batches(key, batch_format="pyarrow")
    return grouped_partitions(keyed, ["shard_id"], rank,
                              n_parts=n_shards).sort("doc_id")


_BM25_TERMS = ("hash", "merge", "scan", "table")


def q_bm25_topk(sf_dir: str, k: int = 20):
    """BM25 top-k full-text search (k1=1.5, b=0.75 — exactly-representable
    constants) for a fixed 4-term query over documents. Shape: one
    streaming map_batches emits (doc, term, tf, dl) rows for query terms
    only (dl from the same batch — a doc never spans batches); tiny df/N/
    total aggregates; per-row contribution in ONE broadcast-consts map;
    per-doc integer sum via a doc-keyed exchange. Every contribution is
    floor(x*1e6+0.5)-quantized BEFORE summing so the per-doc total is
    order-free integer math — the SQL twin (same IEEE op order inside each
    contribution) hashes identically. Top-k by (score DESC, doc_id).
    Implementation: stages/search.bm25_topk (also `cli search`)."""
    from pcompress_ray.stages.search import bm25_topk

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return bm25_topk(ds, list(_BM25_TERMS), k=k)


def q_inverted_index(sf_dir: str, top_k: int = 20):
    """Impact-ordered inverted index with champion lists (the tiered /
    impact-sorted postings layout of web search engines): per token, its
    document frequency plus the top-``top_k`` posting doc_ids by
    (tf DESC, doc_id) joined as a comma champion list — the
    bounded-output index build a corpus engine ships alongside grep. One
    exploded (doc, tok, tf) map-side pass (batch-local, complete), then
    ONE token-keyed exchange; per-partition top-k is a sort + per-group
    prefix mask and the champion strings are wrapped as a ListArray and
    joined by a single pc.binary_join — no per-token Python. Output is
    bounded by vocab x top_k regardless of corpus size."""
    import pyarrow.compute as pc

    from pcompress_ray.functions.ops import group_boundaries, grouped_partitions
    from pcompress_ray.stages.textstats import doc_token_counts

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    tokc = ds.map_batches(doc_token_counts, batch_format="pyarrow")

    def build(part: pd.DataFrame) -> pd.DataFrame:
        if not len(part):
            return pd.DataFrame({"tok": pd.Series([], dtype=object),
                                 "df": pd.Series([], dtype=np.int64),
                                 "champions": pd.Series([], dtype=object)})
        # rows are FINAL tfs already — doc_token_counts emits one row per
        # distinct (doc, tok) and a doc never spans batches — so no
        # re-aggregation here, just the per-token impact sort.
        agg = part.sort_values(["tok", "c", "doc_id"],
                               ascending=[True, False, True], kind="stable")
        tokv = agg["tok"].to_numpy()
        first, gid, sizes = group_boundaries(tokv)
        starts = np.flatnonzero(first)
        pos = np.arange(len(agg), dtype=np.int64) - starts[gid]
        keep = pos < top_k
        ck = np.cumsum(keep.astype(np.int64))
        off = np.empty(starts.size + 1, dtype=np.int64)
        off[0] = 0
        off[1:] = ck[starts + sizes - 1]
        champs = agg["doc_id"].to_numpy(np.int64)[keep].astype(str)
        lst = pa.LargeListArray.from_arrays(pa.array(off),
                                            pa.array(champs, pa.string()))
        joined = pc.binary_join(lst, ",").to_pandas()
        return pd.DataFrame({"tok": tokv[starts],
                             "df": sizes.astype(np.int64),
                             "champions": joined.to_numpy()})

    return grouped_partitions(tokc, ["tok"], build, n_parts=32).sort("tok")


def q_dedup_keep_best(sf_dir: str):
    """Quality-aware canonical selection: exact URL-tier dedup where the
    kept copy is the HIGHEST-QUALITY member of each canon_url group (tie:
    lowest doc_id) — the policy real webtext pipelines use when the same
    page is crawled repeatedly (keep the best extraction, not merely the
    first), vs url_dedup/exact_dup_docs' keep-first. Composes two
    oracle-proven kernels: urlnorm's messy-URL synthesis +
    canonicalization and quality_batch's e6-quantized composite score.
    ONE canon_url-keyed exchange; per-partition argmax is a vectorized
    (key, -q, id) sort + group-start gather."""
    from pcompress_ray.functions.ops import group_boundaries, grouped_partitions
    from pcompress_ray.stages.textstats import quality_batch
    from pcompress_ray.stages.urlnorm import canonicalize_urls, synthesize_messy_urls

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def feat(df: pd.DataFrame) -> pd.DataFrame:
        q = quality_batch(df)
        ids = q["doc_id"].to_numpy(np.int64)
        urls = synthesize_messy_urls(ids)
        return pd.DataFrame({
            "doc_id": ids,
            "canon_url": canonicalize_urls(urls).to_numpy(),
            "quality_score_e6": np.floor(
                q["quality_score"].to_numpy(np.float64) * 1e6 + 0.5)
            .astype(np.int64)})

    def assign(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(
            ["canon_url", "quality_score_e6", "doc_id"],
            ascending=[True, False, True], kind="stable")
        key = part["canon_url"].to_numpy()
        ids = part["doc_id"].to_numpy(np.int64)
        first, gid, _ = group_boundaries(key)
        canon = ids[first][gid]
        return pd.DataFrame({
            "doc_id": ids, "canon_url": key,
            "quality_score_e6": part["quality_score_e6"]
            .to_numpy(np.int64),
            "canonical_doc_id": canon,
            "is_kept": (ids == canon).astype(np.int64)})

    featd = ds.map_batches(feat, batch_format="pandas")
    return grouped_partitions(featd, ["canon_url"], assign).sort("doc_id")


def q_nb_classify(sf_dir: str):
    """Multinomial Naive-Bayes source classifier, trained AND applied in
    one job — the fastText-style quality/domain-classifier slot of a
    webtext pipeline (e.g. CCNet's LM filter, GPT-3's WebText-vs-crawl
    classifier) with the classifier reduced to exactly-reproducible
    integer math. Pass 1 fits the model with a map-side (source, tok)
    combiner — shuffle bounded by classes x vocabulary, NOT corpus size —
    pulled to the driver (classes x vocab table) and broadcast via
    ray.put. Pass 2 scores every doc in one streaming map_batches
    (searchsorted + per-class reduceat). Every logprob is quantized to
    floor(-ln(p)*1e6+0.5) ints BEFORE summation (the lm_quality
    precedent: int sums, 1-ulp ln() exposure only at quantization), and
    prediction = argmin over classes with ties to the smallest class
    name, so the SQL twin hashes identically. At web scale (vocab >>
    driver memory) the broadcast swaps for a token-keyed
    grouped_partitions join, same as tfidf_top_term."""
    import ray
    from ray.data.aggregate import Sum

    from pcompress_ray.stages.textstats import (nb_score_batch,
                                                source_token_counts)

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    ctc = (ds.map_batches(source_token_counts, batch_format="pyarrow")
           .groupby(["source", "tok"]).aggregate(Sum("n", alias_name="n"))
           .to_pandas())  # bounded by classes x vocabulary
    nd = (_read(sf_dir, "documents", ["source"])
          .groupby("source").count().to_pandas())  # bounded by classes

    classes = np.sort(nd["source"].to_numpy())
    ndocs = nd.set_index("source").loc[classes, "count()"] \
        .to_numpy(np.int64)
    vocab = np.sort(ctc["tok"].unique())
    V = vocab.size
    cmat = np.zeros((classes.size, V), np.int64)
    ci = np.searchsorted(classes, ctc["source"].to_numpy())
    ti = np.searchsorted(vocab, ctc["tok"].to_numpy())
    cmat[ci, ti] = ctc["n"].to_numpy(np.int64)
    tot = cmat.sum(axis=1)
    # same IEEE ops as the twin: int+1 -> double, / (tot+V) double, -ln
    lp = np.floor(-np.log((cmat + 1.0) / (tot[:, None] + float(V)))
                  * 1e6 + 0.5).astype(np.int64)
    prior = np.floor(-np.log(ndocs / float(ndocs.sum())) * 1e6 + 0.5) \
        .astype(np.int64)
    vr, lr, pr, cr = (ray.put(vocab), ray.put(lp), ray.put(prior),
                      ray.put(classes))

    def score(t: pa.Table) -> pa.Table:
        return nb_score_batch(t, ray.get(vr), ray.get(lr), ray.get(pr),
                              ray.get(cr))

    return ds.map_batches(score, batch_format="pyarrow").sort("doc_id")


def q_warc_pages(sf_dir: str):
    """WARC container ingest, oracle-checked end to end: synthesize a
    per-record-gzipped WARC file per batch from the documents table (a
    deterministic html template a SQL twin rebuilds char-for-char,
    including a CRLFCRLF framing trap inside every 5th body), then parse
    it back with the from-scratch Content-Length/gzip-member reader
    (sources/warc.py — the Common-Crawl container slot of the reference's
    libarchive ingest, archive/pc_archive.c extract path). The recovered
    (url, warc_ts, html) must hash-match the independent SQL
    reconstruction — any framing, gzip-member, HTTP-envelope or charset
    slip breaks the sha. Parsing is file-per-task parallel; payload
    bytes never visit the driver."""
    import hashlib

    from pcompress_ray.sources.warc import synth_warc_batch, warc_pages_batch

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    blobs = ds.map_batches(synth_warc_batch, batch_format="pyarrow")
    pages = blobs.map_batches(warc_pages_batch, batch_format="pyarrow")

    def finish(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        htmls = t["html"].to_pylist()
        return pa.table({
            "url": t["url"].cast(pa.string()),
            "ts_us": t["warc_ts"].cast(pa.int64()),
            "n_bytes": pa.array([len(h) for h in htmls], pa.int64()),
            "html_sha": pa.array(
                [hashlib.sha256(h).hexdigest() for h in htmls],
                pa.string()),
        })

    return pages.map_batches(finish, batch_format="pyarrow").sort("url")


def q_pagerank(sf_dir: str, iters: int = 5):
    """Distributed PageRank over a deterministic synthesized link graph —
    the webgraph centrality signal crawl pipelines rank hosts by, and the
    ITERATIVE bulk-synchronous dataflow pattern. Page i links to
    (7i+1, 7i+2, 7i+3) mod N (outdegree exactly 3; contiguous doc_ids
    asserted). All arithmetic is e12-scaled integer (pr//3 contributions,
    (15*base + 85*sum)//100 damping), so the SQL twin — five chained CTEs
    of the same floor divisions — matches bit for bit; no float ever
    appears. Edges are a pure function of the source id, so contributions
    are EMITTED per batch (no edge table, no join); a per-node zero row
    keeps in-link-less nodes alive, twin of the oracle's LEFT JOIN.

    Execution: the BSP loop runs as RAW Ray tasks — the state is P arrow
    blocks partitioned by doc_id % P (a stable partitioning reused every
    round), each round is one slicer task per state block (emit + local
    per-dst combiner sum, so ≤N rows cross the wire regardless of edge
    count) + one reducer task per partition (sum + damp). State is bounded
    (16 B/node) and int64 sums are order-independent, so this is bit
    identical to the former per-round Dataset groupby-sum — minus the
    5 streaming-executor launches whose fixed latency dominated the loop
    (measured 5.1 s -> ~1 s at 40k nodes). At cluster scale set P ~ total
    cores; each round is still ONE all-to-all of ≤16 B/node."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Max, Min

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id"])
    n = ds.count()  # parquet metadata only
    mm = ds.aggregate(Min("doc_id"), Max("doc_id"))
    if int(mm["min(doc_id)"]) != 0 or int(mm["max(doc_id)"]) != n - 1:
        raise ValueError("pagerank synthesis needs contiguous doc_ids")
    total = 10**12
    base_pr = total // n
    teleport = 15 * base_pr
    P = 16

    def slicer(t: pa.Table):
        """emit + per-partition combiner: returns P (doc_id, c) tables,
        each already summed per dst within this block."""
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["pr_e12"].to_numpy(zero_copy_only=False).astype(np.int64) // 3
        dst = np.concatenate([(ids * 7 + 1) % n, (ids * 7 + 2) % n,
                              (ids * 7 + 3) % n, ids])
        cc = np.concatenate([c, c, c, np.zeros_like(c)])
        order = np.argsort(dst, kind="stable")
        dst, cc = dst[order], cc[order]
        first = np.empty(dst.size, dtype=bool)
        first[0] = True
        np.not_equal(dst[1:], dst[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        udst = dst[starts]
        usum = np.add.reduceat(cc, starts)
        part = udst % P
        return tuple(
            pa.table({"doc_id": pa.array(udst[part == p]),
                      "c": pa.array(usum[part == p])})
            for p in range(P))

    def reducer(*tables):
        """sum contributions per doc_id across slicer outputs, damp."""
        t = pa.concat_tables([x for x in tables if len(x)])
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(d, kind="stable")
        d, c = d[order], c[order]
        first = np.empty(d.size, dtype=bool)
        first[0] = True
        np.not_equal(d[1:], d[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        s = np.add.reduceat(c, starts)
        return pa.table({"doc_id": pa.array(d[starts]),
                         "pr_e12": pa.array((teleport + 85 * s) // 100)})

    slice_t = ray.remote(slicer).options(num_returns=P)
    reduce_t = ray.remote(reducer)
    # initial state: partition p holds doc_ids ≡ p (mod P) at base_pr
    # (ids synthesized from the asserted-contiguous range — identical to
    # reading them back out of the table)
    state = [ray.put(pa.table({
        "doc_id": pa.array(np.arange(p, n, P, dtype=np.int64)),
        "pr_e12": pa.array(np.full(len(range(p, n, P)), base_pr,
                                   np.int64))})) for p in range(P)]
    for _ in range(iters):
        sliced = [slice_t.remote(b) for b in state]
        state = [reduce_t.remote(*[s[p] for s in sliced])
                 for p in range(P)]
    return rd.from_arrow_refs(state).sort("doc_id")


def q_hits(sf_dir: str, iters: int = 3):
    """HITS hubs/authorities over the same deterministic link graph as
    q_pagerank (i -> (7i+1, 7i+2, 7i+3) mod N) — the OTHER classic
    webgraph signal, and a second exercise of the iterative BSP shape
    with a different normalization: after each half-step the scores are
    rescaled to max = 10^6 by integer floor division, so all arithmetic
    stays exact int64 and the SQL twin (chained CTEs with the same
    floor-divs) matches bit for bit. Authority step pushes hub mass down
    OUT-edges (pure-function emit, no edge table); hub step pushes
    authority mass UP in-edges via the modular inverse of 7 (engine-side
    only — the oracle uses an explicit edge CTE instead). Per-node
    keep-alive zero rows preserve nodes the other side never reaches.
    Requires gcd(7, N) == 1 (holds for every sf table; asserted).

    Execution: like q_pagerank, the BSP loop runs as RAW Ray tasks over P
    node%P-partitioned state blocks — per half-step one slicer task per
    block (rescale-fused emit + local per-dst combiner sum) and one
    reducer per partition; each reducer ALSO returns its local max so the
    between-step global max is a P-int driver reduce instead of an
    aggregate(Max) executor launch. The final hub/authority join is a
    per-partition zip (both sides carry every node of the partition via
    the keep-alive rows, asserted). Bit identical to the former Dataset
    groupby-sum loop; 12+ launches -> 1 final sort."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Max, Min

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id"])
    n = ds.count()
    mm = ds.aggregate(Min("doc_id"), Max("doc_id"))
    if int(mm["min(doc_id)"]) != 0 or int(mm["max(doc_id)"]) != n - 1:
        raise ValueError("hits synthesis needs contiguous doc_ids")
    scale = 10**6
    try:
        inv7 = pow(7, -1, n)
    except ValueError as exc:
        raise ValueError("hits needs gcd(7, N) == 1 for the modular-"
                         "inverse transpose; other N would need an "
                         "explicit edge join") from exc
    P = 16

    def slicer(t: pa.Table, mx: int, out_edges: bool):
        """rescale-fused emit + per-dst combiner; P (node, c) tables."""
        ids = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["s"].to_numpy(zero_copy_only=False).astype(np.int64) \
            * scale // mx
        if out_edges:   # value flows to out-neighbors (7i+k) % n
            dst = np.concatenate([(ids * 7 + 1) % n, (ids * 7 + 2) % n,
                                  (ids * 7 + 3) % n, ids])
        else:           # value flows to in-neighbors ((i-k) * inv7) % n
            dst = np.concatenate([(((ids - k) % n) * inv7) % n
                                  for k in (1, 2, 3)] + [ids])
        vv = np.concatenate([v, v, v, np.zeros_like(v)])
        order = np.argsort(dst, kind="stable")
        dst, vv = dst[order], vv[order]
        first = np.empty(dst.size, dtype=bool)
        first[0] = True
        np.not_equal(dst[1:], dst[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        udst = dst[starts]
        usum = np.add.reduceat(vv, starts)
        part = udst % P
        return tuple(
            pa.table({"node": pa.array(udst[part == p]),
                      "c": pa.array(usum[part == p])})
            for p in range(P))

    def reducer(*tables):
        """per-node sum across slicer outputs; returns (state, local max)."""
        t = pa.concat_tables([x for x in tables if len(x)])
        d = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(d, kind="stable")
        d, c = d[order], c[order]
        first = np.empty(d.size, dtype=bool)
        first[0] = True
        np.not_equal(d[1:], d[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        s = np.add.reduceat(c, starts)
        return pa.table({"node": pa.array(d[starts]), "s": pa.array(s)}), \
            int(s.max()) if s.size else 0

    slice_t = ray.remote(slicer).options(num_returns=P)
    reduce_t = ray.remote(reducer).options(num_returns=2)

    def half_step(state, mx, out_edges):
        sliced = [slice_t.remote(b, mx, out_edges) for b in state]
        outs = [reduce_t.remote(*[s[p] for s in sliced]) for p in range(P)]
        new_state = [o[0] for o in outs]
        new_mx = max(ray.get([o[1] for o in outs]))
        return new_state, new_mx

    h = [ray.put(pa.table({
        "node": pa.array(np.arange(p, n, P, dtype=np.int64)),
        "s": pa.array(np.full(len(range(p, n, P)), scale, np.int64))}))
        for p in range(P)]
    h_mx, a, a_mx = scale, None, scale
    for _ in range(iters):
        a, a_mx = half_step(h, h_mx, True)
        h, h_mx = half_step(a, a_mx, False)

    def zip_join(at: pa.Table, ht: pa.Table, _amx=a_mx, _hmx=h_mx):
        an = at["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        hn = ht["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        ao = np.argsort(an, kind="stable")
        ho = np.argsort(hn, kind="stable")
        if not np.array_equal(an[ao], hn[ho]):
            raise AssertionError("hub/authority partitions diverged")
        av = at["s"].to_numpy(zero_copy_only=False).astype(np.int64)[ao]
        hv = ht["s"].to_numpy(zero_copy_only=False).astype(np.int64)[ho]
        return pa.table({
            "node": pa.array(an[ao]),
            "authority_e6": pa.array(av * scale // _amx),
            "hub_e6": pa.array(hv * scale // _hmx)})

    join_t = ray.remote(zip_join)
    out = [join_t.remote(a[p], h[p]) for p in range(P)]
    return rd.from_arrow_refs(out).sort("node")


def q_cocitation(sf_dir: str, min_shared: int = 2):
    """Co-citation similarity over the deterministic link graph: pairs of
    pages cited together (same out-target) weighted by how many targets
    they share — the webgraph 'related pages' signal (Dean & Henzinger
    1999). The engine EMITS each target's 3 in-neighbors directly from
    the modular-inverse formula (one streaming pass, no edge table, no
    join) and counts pairs with one (a,b)-keyed exchange; the oracle
    self-joins an explicit edge CTE. Emitted pairs are ordered a < b."""
    from pcompress_ray.functions.ops import grouped_partitions

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id"])
    n = ds.count()
    try:
        inv7 = pow(7, -1, n)
    except ValueError as exc:
        raise ValueError("cocitation needs gcd(7, N) == 1") from exc

    def emit(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        tgt = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = [(((tgt - k) % n) * inv7) % n for k in (1, 2, 3)]
        outs_a, outs_b = [], []
        for x in range(3):
            for y in range(x + 1, 3):
                a = np.minimum(nb[x], nb[y])
                b = np.maximum(nb[x], nb[y])
                keep = a != b
                outs_a.append(a[keep])
                outs_b.append(b[keep])
        return pa.table({"a": pa.array(np.concatenate(outs_a)),
                         "b": pa.array(np.concatenate(outs_b))})

    def count(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(["a", "b"], as_index=False, sort=False).size() \
            .rename(columns={"size": "shared"})
        g = g[g["shared"] >= min_shared]
        return g.astype({"a": np.int64, "b": np.int64, "shared": np.int64})

    out = grouped_partitions(ds.map_batches(emit, batch_format="pyarrow"),
                             ["a", "b"], count, n_parts=16)

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"page_a": t["a"].cast(pa.int64()),
                         "page_b": t["b"].cast(pa.int64()),
                         "shared": t["shared"].cast(pa.int64())})

    return out.map_batches(rn, batch_format="pyarrow")


def _hits_sql(iters: int = 3) -> str:
    """q_hits's twin: explicit edge CTE + chained half-step CTEs with the
    identical max-rescale floor division each half-step."""
    parts = ["""
        WITH nn AS (SELECT COUNT(*) AS c FROM documents),
        e AS (
            SELECT doc_id AS src,
                   (doc_id * 7 + k) % (SELECT c FROM nn) AS dst
            FROM documents, UNNEST([1, 2, 3]) AS t(k)
        ),
        h0 AS (SELECT doc_id AS node, CAST(1000000 AS BIGINT) AS v
               FROM documents)"""]
    prev_h = "h0"
    for i in range(1, iters + 1):
        parts.append(f""",
        a{i}r AS (
            SELECT d.doc_id AS node, COALESCE(SUM(ph.v), 0) AS v
            FROM documents d
            LEFT JOIN e ON e.dst = d.doc_id
            LEFT JOIN {prev_h} ph ON ph.node = e.src
            GROUP BY d.doc_id
        ),
        a{i} AS (
            SELECT node, v * 1000000 // (SELECT MAX(v) FROM a{i}r) AS v
            FROM a{i}r
        ),
        h{i}r AS (
            SELECT d.doc_id AS node, COALESCE(SUM(pa.v), 0) AS v
            FROM documents d
            LEFT JOIN e ON e.src = d.doc_id
            LEFT JOIN a{i} pa ON pa.node = e.dst
            GROUP BY d.doc_id
        ),
        h{i} AS (
            SELECT node, v * 1000000 // (SELECT MAX(v) FROM h{i}r) AS v
            FROM h{i}r
        )""")
        prev_h = f"h{i}"
    parts.append(f"""
        SELECT a{iters}.node,
               CAST(a{iters}.v AS BIGINT) AS authority_e6,
               CAST(h{iters}.v AS BIGINT) AS hub_e6
        FROM a{iters} JOIN h{iters} ON h{iters}.node = a{iters}.node
        ORDER BY a{iters}.node""")
    return "".join(parts)


_BLOCKLIST = ["site3.example.com", "site11.example.com",
              "site24.example.com", "ads.example.net"]
_SUBS = ["", "m.", "cdn.", "shop."]


def _host_expr_sql() -> str:
    """SQL twin of the host synthesis in q_domain_blocklist/_stats."""
    subs = ", ".join(f"'{s}'" for s in _SUBS)
    return (f"[{subs}][doc_id % 4 + 1] || 'site' || "
            "CAST(doc_id % 37 AS VARCHAR) || '.example.com'")


def _synth_hosts(ids: np.ndarray) -> pd.Series:
    d = pd.Series(ids.astype(np.int64))
    subs = pd.Series(np.array(_SUBS, object)[(d % 4).to_numpy()])
    return subs + "site" + (d % 37).astype(str) + ".example.com"


def q_domain_blocklist(sf_dir: str):
    """UT1-style domain blocklist filter (the RefinedWeb/CCNet URL tier):
    a host is blocked when it EQUALS a blocklist entry or is a SUBDOMAIN
    of one (suffix match at a label boundary) — first matching entry in
    fixed list order wins. Hosts are synthesized deterministically from
    doc_id with rotating subdomains (m./cdn./shop.) so the suffix rule is
    actually exercised; the SQL twin is generated from the SAME
    _BLOCKLIST/_SUBS constants, so the pattern set is shared by
    construction. Stateless streaming map_batches, no shuffle; at scale
    the blocklist (millions of entries) broadcasts once via ray.put and
    matching flips to searchsorted over reversed-host prefixes."""
    _setup()
    ds = _read(sf_dir, "documents", ["doc_id"])

    def mark(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        host = _synth_hosts(ids)
        blocked = np.zeros(ids.size, np.int64)
        entry = np.full(ids.size, "", object)
        for b in _BLOCKLIST:  # fixed order; first match wins
            hit = ((host == b) | host.str.endswith("." + b)).to_numpy()
            new = hit & (blocked == 0)
            blocked[new] = 1
            entry[new] = b
        return pd.DataFrame({"doc_id": ids, "host": host.to_numpy(),
                             "blocked": blocked, "matched_entry": entry})

    return (ds.map_batches(mark, batch_format="pandas").sort("doc_id"))


def q_domain_stats(sf_dir: str):
    """Per-host corpus rollup (the 'host table' crawl pipelines maintain:
    page counts, distinct canonical pages, bytes) over the same synthetic
    hosts + the urlnorm canonical key. One host-keyed groupby with
    map-side combine; output bounded by distinct hosts."""
    from ray.data.aggregate import Sum

    from pcompress_ray.functions.ops import grouped_partitions
    from pcompress_ray.stages.urlnorm import canonicalize_urls, synthesize_messy_urls

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def feat(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "host": _synth_hosts(ids).to_numpy(),
            "canon_url": canonicalize_urls(
                synthesize_messy_urls(ids)).to_numpy(),
            "n_chars": df["n_chars"].to_numpy(np.int64)})

    def roll(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("host", sort=False).agg(
            n_docs=("canon_url", "size"),
            n_pages=("canon_url", "nunique"),
            total_chars=("n_chars", "sum")).reset_index()
        return g.astype({"n_docs": np.int64, "n_pages": np.int64,
                         "total_chars": np.int64})

    featd = ds.map_batches(feat, batch_format="pandas")
    # host-keyed partitions: all rows of a host co-locate, so per-host
    # nunique is exact without a second exchange
    return grouped_partitions(featd, ["host"], roll,
                              n_parts=16).sort("host")


def q_crawl_schedule(sf_dir: str):
    """Crawl-frontier politeness schedule: at most 4 fetches per host per
    round, per-host FIFO by doc_id — the deterministic frontier assignment
    a recrawl pipeline materializes before dispatch (stages/crawl.py; one
    host-keyed exchange, rank via sort + run-boundary subtraction). Hosts
    are the same synthetic ones the domain tier uses."""
    from pcompress_ray.stages.crawl import crawl_schedule

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id"])

    def feat(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame({"doc_id": ids,
                             "host": _synth_hosts(ids).to_numpy()})

    out = crawl_schedule(ds.map_batches(feat, batch_format="pandas"),
                         per_round=4, n_parts=16)

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "host": t["host"].cast(pa.string()),
                         "fetch_round": t["fetch_round"].cast(pa.int64()),
                         "slot": t["slot"].cast(pa.int64())})

    return out.map_batches(rn, batch_format="pyarrow")


def q_robots_filter(sf_dir: str):
    """robots.txt frontier filter (RFC 9309 longest-match subset,
    stages/robots.py): per URL, is fetching allowed under its host's
    robots rules? Hosts/paths are the domain tier's synthetic ones; the
    per-host robots.txt TEXT is synthesized deterministically (every host
    disallows /p7; site-K hosts with K%3==0 also disallow /p1 but Allow
    /p12 — exercising longest-match precedence — plus a decoy non-*
    agent group the parser must skip). The ENGINE parses the actual
    robots.txt text end-to-end; the oracle reproduces the decisions from
    the same rule formulas in arithmetic."""
    from pcompress_ray.stages.robots import decide, rules_table

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id"])

    robots_by_host = {}
    for k in range(37):
        txt = ("# synthetic robots\n"
               "User-agent: evilbot\nDisallow: /\n\n"
               "User-agent: *\nDisallow: /p7\n")
        if k % 3 == 0:
            txt += "Disallow: /p1\nAllow: /p12\n"
        for sub in _SUBS:
            robots_by_host[f"{sub}site{k}.example.com"] = txt
    rules = rules_table(robots_by_host)

    def feat(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        out = pd.DataFrame({
            "doc_id": ids,
            "host": _synth_hosts(ids).to_numpy(),
            "path": ("/p" + pd.Series(ids % 23).astype(str)).to_numpy()})
        out["allowed"] = decide(out[["host", "path"]].copy(),
                                rules).astype(np.int64)
        return out

    out = ds.map_batches(feat, batch_format="pandas")

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "host": t["host"].cast(pa.string()),
                         "path": t["path"].cast(pa.string()),
                         "allowed": t["allowed"].cast(pa.int64())})

    return out.map_batches(rn, batch_format="pyarrow")


def q_event_window_dedup(sf_dir: str, window_s: int = 600):
    """Streaming-window dedup over the events table (the telemetry analog
    of pcompress's stream dedup: suppress a record that repeats its key
    within a trailing window): an event is a dup when the same
    (user_id, event_type) occurred within the previous ``window_s``
    seconds. ANY-prior-within-window reduces to the IMMEDIATELY-preceding
    event in key order, so one user-keyed partition sort + a shifted
    comparison answers it exactly — the same vectorized-partition shape
    as sessionize, no per-key Python, and the SQL twin is a plain LAG.
    At stream scale this runs per arriving micro-batch against a
    per-worker (user,type)->last_ts dict, same semantics."""
    from pcompress_ray.functions.ops import grouped_partitions

    _setup()
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def mark(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["user_id", "event_type", "ts", "event_id"],
                                kind="stable")
        u = part["user_id"].to_numpy(np.int64)
        et = part["event_type"].to_numpy()
        ts = part["ts"].astype("int64").to_numpy()  # us
        same = np.zeros(len(part), bool)
        if len(part) > 1:
            same[1:] = (u[1:] == u[:-1]) & (et[1:] == et[:-1])
        gap = np.empty(len(part), np.int64)
        gap[0] = 0
        if len(part) > 1:
            gap[1:] = ts[1:] - ts[:-1]
        dup = same & (gap <= window_s * 1_000_000)
        return pd.DataFrame({
            "event_id": part["event_id"].to_numpy(np.int64),
            "is_dup": dup.astype(np.int64)})

    return grouped_partitions(ds, ["user_id"], mark,
                              n_parts=32).sort("event_id")


def q_cdx_index(sf_dir: str):
    """CDX-style capture index (the Common Crawl / OpenWayback index file
    a web archive is randomly accessed through): per doc a SURT key
    (stages/urlnorm.py surt_keys over the canonicalized synthetic url), a
    deterministic capture timestamp, and the payload sha256 digest, then
    ONE GLOBAL SORT by (surt, ts, doc_id) with a dense index position —
    the distributed sort + two-pass block-offset rank (zip_with_rank, the
    same T5 canonical-order machinery as the flagship). The composite
    order rides a single padded sort_key string; the oracle orders by the
    identical string, so idx is bit-exact. Scale shape: one range-
    partitioned sort (Ray's sort), tiny per-block count scan, no driver
    materialization."""
    import hashlib

    from pcompress_ray.functions.ops import zip_with_rank
    from pcompress_ray.stages.urlnorm import (canonicalize_urls,
                                              surt_keys,
                                              synthesize_messy_urls)

    _setup()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        surt = surt_keys(canonicalize_urls(synthesize_messy_urls(ids)))
        ts = 1704067200000000 + ((ids * 7919) % 31536000) * 1000000
        dig = [hashlib.sha256((t or "").encode()).hexdigest()
               for t in df["text"]]
        sk = (surt + "|" + pd.Series(ts).astype(str).str.zfill(20)
              + "|" + pd.Series(ids).astype(str).str.zfill(12))
        return pd.DataFrame({"sort_key": sk.to_numpy(),
                             "surt_key": surt.to_numpy(),
                             "ts_us": ts, "doc_id": ids,
                             "digest": np.asarray(dig, object)})

    ranked = zip_with_rank(ds.map_batches(derive, batch_format="pandas"),
                           "sort_key", rank_col="idx")

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"idx": t["idx"].cast(pa.int64()),
                         "surt_key": t["surt_key"].cast(pa.string()),
                         "ts_us": t["ts_us"].cast(pa.int64()),
                         "doc_id": t["doc_id"].cast(pa.int64()),
                         "digest": t["digest"].cast(pa.string())})

    return ranked.map_batches(rn, batch_format="pyarrow")


def _cdx_index_sql() -> str:
    """cdx_index oracle: same synthesis + canonicalization + SURT twins,
    same padded composite sort key, row_number over it."""
    from pcompress_ray.stages.urlnorm import (canonicalize_sql, surt_sql,
                                              synthesize_messy_urls_sql)

    canon = canonicalize_sql(synthesize_messy_urls_sql("doc_id"))
    return f"""
        WITH s AS (
            SELECT doc_id, {surt_sql(canon)} AS surt_key,
                   1704067200000000 + ((doc_id * 7919) % 31536000)
                       * 1000000 AS ts_us,
                   sha256(coalesce(text, '')) AS digest
            FROM documents
        ), k AS (
            SELECT *, surt_key || '|'
                   || lpad(CAST(ts_us AS VARCHAR), 20, '0') || '|'
                   || lpad(CAST(doc_id AS VARCHAR), 12, '0') AS sk
            FROM s
        )
        SELECT CAST(row_number() OVER (ORDER BY sk) - 1 AS BIGINT) AS idx,
               surt_key, CAST(ts_us AS BIGINT) AS ts_us,
               CAST(doc_id AS BIGINT) AS doc_id, digest
        FROM k
    """


def q_dedup_recall_eval(sf_dir: str):
    """North-rule quality harness: dup-pair RECALL (and precision) of the
    flagship MinHash/LSH pipeline against exact ground truth on the same
    corpus. Ground truth = exact token-5-gram Jaccard >= 0.5 pairs
    (ngram_jaccard_pairs, itself oracle-checked); found = intra-cluster
    pairs of the flagship's cluster assignment. Both pair sets are
    id-keyed Datasets; the comparison is one hash-partitioned exchange
    (union + per-partition set ops) — no driver pull. No SQL oracle (the
    LSH side is the engine under test); the planted-corpus recall gates in
    tests/ pin >= 0.99, this query makes the number a driver-visible
    artifact. One summary row: (n_truth, n_found, n_inter, recall_e6,
    precision_e6)."""
    import ray.data as rd

    from pcompress_ray.functions.ops import grouped_partitions
    from pcompress_ray.stages.candidates import ngram_jaccard_pairs

    _setup()
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    truth = ngram_jaccard_pairs(docs, k=5, threshold=0.5, n_parts=32)

    res = _dedup_clusters(sf_dir)

    def intra_pairs(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["cluster_id", "rank"], kind="stable")
        cid = part["cluster_id"].to_numpy(np.int64)
        rk = part["rank"].to_numpy(np.int64)
        first = np.empty(len(part), bool)
        if len(part):
            first[0] = True
            first[1:] = cid[1:] != cid[:-1]
        starts = np.flatnonzero(first)
        sizes = np.diff(np.append(starts, len(part)))
        out_a, out_b = [], []
        for s, m in zip(starts, sizes):
            if m < 2:
                continue
            seg = rk[s:s + int(m)]
            ai, bi = np.triu_indices(int(m), k=1)
            out_a.append(seg[ai])
            out_b.append(seg[bi])
        if not out_a:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64)})
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)})

    found = grouped_partitions(
        res.clusters.select_columns(["rank", "cluster_id"]),
        ["cluster_id"], intra_pairs, n_parts=32)

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            t = t.replace_schema_metadata(None)
            cols = {"a": t["doc_a" if side == 0 else "a"].cast(pa.int64()),
                    "b": t["doc_b" if side == 0 else "b"].cast(pa.int64())}
            return pa.table({**cols, "side": pa.array(
                np.full(len(t), side, np.int8))})
        return f

    u = truth.map_batches(tag(0), batch_format="pyarrow").union(
        found.map_batches(tag(1), batch_format="pyarrow"))

    def count_overlap(part: pd.DataFrame) -> pd.DataFrame:
        if not len(part):
            return pd.DataFrame({"n_truth": pd.Series(dtype=np.int64),
                                 "n_found": pd.Series(dtype=np.int64),
                                 "n_inter": pd.Series(dtype=np.int64)})
        a = part["a"].to_numpy(np.int64)
        b = part["b"].to_numpy(np.int64)
        side = part["side"].to_numpy(np.int8)
        m = side == 0
        t = set(zip(a[m].tolist(), b[m].tolist()))
        f = set(zip(a[~m].tolist(), b[~m].tolist()))
        return pd.DataFrame({"n_truth": [len(t)], "n_found": [len(f)],
                             "n_inter": [len(t & f)]})

    parts = grouped_partitions(u, ["a", "b"], count_overlap,
                               n_parts=32).to_pandas()
    n_truth = int(parts["n_truth"].sum())
    n_found = int(parts["n_found"].sum())
    n_inter = int(parts["n_inter"].sum())
    rec = int(np.floor(n_inter / max(n_truth, 1) * 1e6 + 0.5))
    prec = int(np.floor(n_inter / max(n_found, 1) * 1e6 + 0.5))
    return pd.DataFrame({"n_truth": [n_truth], "n_found": [n_found],
                         "n_inter": [n_inter], "recall_e6": [rec],
                         "precision_e6": [prec]})


def queries() -> dict[str, Callable[[str], Any]]:
    # Ordered least-proven-first: the correctness driver samples the
    # FIRST 50 entries. Cumulative driver coverage through r04 is 100 of
    # 126 queries (CORRECTNESS_r01-r04); the 26 never-driver-checked
    # entries lead this dict (oracle-backed first, then the rows-only
    # ones) so the r05 window completes the driver record at 126/126.
    # The remaining 24 window slots re-verify previously-green queries.
    # Coverage for everything below the window: the committed full-gate
    # logs (GATE_r*.log, tools/check_queries.py) + pytest oracles.
    return {
        # -- never driver-checked through r04: oracle-backed first --
        "corpus_shuffle": q_corpus_shuffle,
        "inverted_index": q_inverted_index,
        "dedup_keep_best": q_dedup_keep_best,
        "nb_classify": q_nb_classify,
        "warc_pages": q_warc_pages,
        "pagerank": q_pagerank,
        "domain_blocklist": q_domain_blocklist,
        "domain_stats": q_domain_stats,
        "event_window_dedup": q_event_window_dedup,
        # -- never driver-checked, no SQL oracle (rows-only + pytest) --
        "soft_cluster_weights": q_soft_cluster_weights,
        "lsh_plan": q_lsh_plan,
        "cluster_explain": q_cluster_explain,
        "dedup_recall_eval": q_dedup_recall_eval,
        "pq_topk": q_pq_topk,
        "cms_top_tokens": q_cms_top_tokens,
        "ctph_neardup": q_ctph_neardup,
        "ivfpq_topk": q_ivfpq_topk,
        "kcenter_probes": q_kcenter_probes,
        "curate_funnel": q_curate_funnel,
        "kmeans_clusters": q_kmeans_clusters,
        "semdedup": q_semdedup,
        "incremental_neardup": q_incremental_neardup,
        "substring_excise": q_substring_excise,
        "dup_span_anchors": q_dup_span_anchors,
        "bpe_merges": q_bpe_merges,
        "bpe_token_counts": q_bpe_token_counts,
        # -- driver-proven green in CORRECTNESS_r04 --
        "redirect_resolve": q_redirect_resolve,
        "mirror_domains": q_mirror_domains,
        "soft_dedup_weights": q_soft_dedup_weights,
        "dsir_weights": q_dsir_weights,
        "dsir_sample": q_dsir_sample,
        "norm_text_dedup": q_norm_text_dedup,
        "simhash_fingerprint": q_simhash_fingerprint,
        "simhash_hamming_pairs": q_simhash_hamming_pairs,
        "cdx_index": q_cdx_index,
        "top_bigrams": q_top_bigrams,
        "tfidf_top_term": q_tfidf_top_term,
        "lm_quality": q_lm_quality,
        "decontaminate": q_decontaminate,
        "dataset_split": q_dataset_split,
        "segment_dedup": q_segment_dedup,
        "top_dup_segments": q_top_dup_segments,
        "pack_sequences": q_pack_sequences,
        "lang_temperature_sample": q_lang_temperature_sample,
        "intradoc_repetition": q_intradoc_repetition,
        "url_dedup": q_url_dedup,
        "token_doc_freq": q_token_doc_freq,
        "length_buckets": q_length_buckets,
        "shingle_novelty": q_shingle_novelty,
        "source_overlap": q_source_overlap,
        "corpus_fingerprint": q_corpus_fingerprint,
        "stratified_sample": q_stratified_sample,
        "pmi_bigrams": q_pmi_bigrams,
        "dedup_rewrite": q_dedup_rewrite,
        "line_dedup": q_line_dedup,
        "anchor_index": q_anchor_index,
        "key_skew": q_key_skew,
        "bm25_topk": q_bm25_topk,
        "corpus_merkle": q_corpus_merkle,
        "crawl_schedule": q_crawl_schedule,
        "hits_scores": q_hits,
        "robots_filter": q_robots_filter,
        "cocitation": q_cocitation,
        "span_corruption": q_span_corruption,
        "pii_redact": q_pii_redact,
        "heuristic_filter": q_heuristic_filter,
        "bloom_dedup": q_bloom_dedup,
        "weighted_sample": q_weighted_sample,
        "fuzzy_decontaminate": q_fuzzy_decontaminate,
        "length_hist_quantiles": q_length_hist_quantiles,
        "snapshot_diff": q_snapshot_diff,
        "dup_span_coverage": q_dup_span_coverage,
        "dup_span_excise": q_dup_span_excise,
        "cross_span_excise": q_cross_span_excise,
        "corpus_grep": q_corpus_grep,
        "hll_registers": q_hll_registers,
        # -- driver-proven green in CORRECTNESS_r03 --
        "q1_pricing": q_q1_pricing,
        "q3_top_orders": q_q3_top_orders,
        "customer_nation": q_customer_nation,
        "doc_stats": q_doc_stats,
        "lang_id": q_lang_id,
        "lang_stats": q_lang_stats,
        "top_tokens": q_top_tokens,
        "exact_dup_docs": q_exact_dup_docs,
        "dup_gain_by_source": q_dup_gain_by_source,
        "corpus_sample": q_corpus_sample,
        "events_hourly": q_events_hourly,
        "events_sliding": q_events_sliding,
        "top_orders_per_segment": q_top_orders_per_segment,
        "customers_without_orders": q_customers_without_orders,
        "hourly_active_users": q_hourly_active_users,
        "sessionize": q_sessionize,
        "event_gaps": q_event_gaps,
        "user_running_value": q_user_running_value,
        "user_first_last": q_user_first_last,
        "ann_topk": q_ann_topk,
        "embedding_neardup": q_embedding_neardup,
        "dedup_clusters": q_dedup_clusters,
        "dedup_pairs": q_dedup_pairs,
        "cdc_chunks": q_cdc_chunks,
        "fixed_chunks": q_fixed_chunks,
        "content_type_stats": q_content_type_stats,
        "minhash_signatures": q_minhash_signatures,
        "quality_scores": q_quality_scores,
        "fingerprints": q_fingerprints,
        "lsh_ann_pairs": q_lsh_ann_pairs,
        "ivf_topk": q_ivf_topk,
        "ngram_jaccard": q_ngram_jaccard,
        "ngram_containment": q_ngram_containment,
        "embedding_clusters": q_embedding_clusters,
        "media_features": q_media_features,
        "file_type_stats": q_file_type_stats,
        "video_frames": q_video_frames,
        "audio_features": q_audio_features,
        "image_features": q_image_features,
        "simhash_neardup": q_simhash_neardup,
        "substring_spans": q_substring_spans,
        "asof_purchase": q_asof_purchase,
        "price_band_join": q_price_band_join,
        "events_rollup": q_events_rollup,
        "lang_token_diversity": q_lang_token_diversity,
        "lang_length_quantiles": q_lang_length_quantiles,
        "archive_stats": q_archive_stats,
        "archive_roundtrip": q_archive_roundtrip,
        "delta_gain": q_delta_gain,
        "gopher_quality": q_gopher_quality,
    }


# --------------------------------------------------------------------------
# DuckDB oracles (omitted for non-SQL-expressible ops → rows-only checks)
# --------------------------------------------------------------------------

_TOKEN_SQL = r"[a-z0-9]+"
_PUNCT_SQL = r"[!-/:-@\[-`{-~]"


def _lang_id_sql() -> str:
    """Generate the lang_id oracle as a first-alphabetical-argmax CASE
    cascade over the SAME per-language patterns the Ray side counts
    (stages/textstats.py LANG_STOPWORDS). The cascade is sound without
    re-checking earlier langs: if an earlier lang lost, the max lives in a
    later column, so any non-max later lang fails its own >= chain too."""
    from pcompress_ray.stages.textstats import _LANG_ORDER, LANG_STOPWORDS

    def sql_pat(lang: str) -> str:
        # Python's explicit CJK range == RE2 hex-escaped range, same charset
        return (r"[\x{4E00}-\x{9FFF}]" if lang == "zh"
                else LANG_STOPWORDS[lang])

    counts = ",\n                ".join(
        f"len(regexp_extract_all(lower(coalesce(text, '')), "
        f"'{sql_pat(lang)}')) AS c_{lang}" for lang in _LANG_ORDER)
    whens = "\n                ".join(
        "WHEN " + " AND ".join([f"c_{a} >= c_{b}"
                                for b in _LANG_ORDER[i + 1:]] + [f"c_{a} > 0"])
        + f" THEN '{a}'"
        for i, a in enumerate(_LANG_ORDER))
    return f"""
            SELECT doc_id, CASE
                {whens}
                ELSE 'unk' END AS lang_pred
            FROM (SELECT doc_id,
                {counts}
                FROM documents)
        """


def _url_dedup_sql() -> str:
    """url_dedup oracle: the SAME messy-URL synthesis + canonicalization
    rule sequence as stages/urlnorm.py, composed from its SQL twins."""
    from pcompress_ray.stages.urlnorm import (
        canonicalize_sql,
        synthesize_messy_urls_sql,
    )

    return f"""
        WITH c AS (
            SELECT doc_id,
                   {canonicalize_sql(synthesize_messy_urls_sql("doc_id"))}
                       AS canon_url
            FROM documents
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id, canon_url,
               min(doc_id) OVER (PARTITION BY canon_url) AS canonical_doc_id
        FROM c
    """


def _dedup_keep_best_sql() -> str:
    """dedup_keep_best oracle: urlnorm's messy-URL synthesis +
    canonicalization composed with the quality_scores composite (same
    float ops in the same order, e6-floored), canonical member =
    first_value over (quality DESC, doc_id)."""
    from pcompress_ray.stages.urlnorm import (
        canonicalize_sql,
        synthesize_messy_urls_sql,
    )

    return f"""
        WITH c AS (
            SELECT doc_id,
                   {canonicalize_sql(synthesize_messy_urls_sql("doc_id"))}
                       AS canon_url
            FROM documents
        ), f AS (
            SELECT doc_id,
                CAST(length(coalesce(text, '')) AS DOUBLE) AS n_chars,
                CAST(len(regexp_extract_all(lower(coalesce(text, '')),
                    '[a-z0-9]+')) AS DOUBLE) AS n_tokens,
                CAST(len(regexp_extract_all(coalesce(text, ''),
                    '[!-/:-@\\[-`{{-~]')) AS DOUBLE) AS n_punct,
                CAST(len(regexp_extract_all(lower(coalesce(text, '')),
                    '\\b(the|and|of|to|in|is)\\b')) AS DOUBLE) AS n_stop
            FROM documents
        ), q AS (
            SELECT doc_id,
                CAST(floor((least(n_tokens / 100.0, 1.0) * 0.4
                    + least(n_stop / greatest(n_tokens, 1.0) * 5.0, 1.0)
                        * 0.3
                    + (1.0 - least(n_punct / greatest(n_chars, 1.0) * 10.0,
                                   1.0)) * 0.3)
                    * 1000000.0 + 0.5) AS BIGINT) AS quality_score_e6
            FROM f
        )
        SELECT CAST(c.doc_id AS BIGINT) AS doc_id, c.canon_url,
               q.quality_score_e6,
               first_value(c.doc_id) OVER (
                   PARTITION BY c.canon_url
                   ORDER BY q.quality_score_e6 DESC, c.doc_id)
                   AS canonical_doc_id,
               CAST(CASE WHEN c.doc_id = first_value(c.doc_id) OVER (
                        PARTITION BY c.canon_url
                        ORDER BY q.quality_score_e6 DESC, c.doc_id)
                    THEN 1 ELSE 0 END AS BIGINT) AS is_kept
        FROM c JOIN q ON c.doc_id = q.doc_id
        ORDER BY doc_id
    """


def _domain_blocklist_sql() -> str:
    """Generated from the SAME _BLOCKLIST/_SUBS constants as the Ray
    kernel — equal-or-subdomain-suffix match, first entry wins."""
    ms = ",\n                   ".join(
        f"(host = '{b}' OR host LIKE '%.{b}') AS m{i}"
        for i, b in enumerate(_BLOCKLIST))
    any_m = " OR ".join(f"m{i}" for i in range(len(_BLOCKLIST)))
    first = "\n                   ".join(
        f"WHEN m{i} THEN '{b}'" for i, b in enumerate(_BLOCKLIST))
    return f"""
        WITH h AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   {_host_expr_sql()} AS host
            FROM documents
        ), m AS (
            SELECT doc_id, host,
                   {ms}
            FROM h
        )
        SELECT doc_id, host,
               CAST(CASE WHEN {any_m} THEN 1 ELSE 0 END AS BIGINT)
                   AS blocked,
               CASE {first}
                   ELSE '' END AS matched_entry
        FROM m ORDER BY doc_id
    """


def _domain_stats_sql() -> str:
    from pcompress_ray.stages.urlnorm import (
        canonicalize_sql,
        synthesize_messy_urls_sql,
    )

    return f"""
        WITH f AS (
            SELECT {_host_expr_sql()} AS host,
                   {canonicalize_sql(synthesize_messy_urls_sql("doc_id"))}
                       AS canon_url,
                   n_chars
            FROM documents
        )
        SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT canon_url) AS BIGINT) AS n_pages,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM f GROUP BY host ORDER BY host
    """


def _pagerank_sql(iters: int = 5) -> str:
    """q_pagerank's twin: the same e12 integer arithmetic as five chained
    CTEs — floor-div contributions, LEFT JOIN keeps in-link-less nodes
    (the engine's zero-row), (teleport + 85*sum)//100 damping."""
    head = """
        WITH consts AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(15 * (1000000000000 // count(*)) AS BIGINT) AS tp
            FROM documents
        ), base AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents
        ), it0 AS (
            SELECT doc_id,
                   CAST(1000000000000 // (SELECT n FROM consts) AS BIGINT)
                       AS pr
            FROM base
        )"""
    step = """, it{t1} AS (
            SELECT b.doc_id,
                   CAST(((SELECT tp FROM consts)
                         + 85 * coalesce(s.s, 0)) // 100 AS BIGINT) AS pr
            FROM base b LEFT JOIN (
                SELECT dst AS doc_id, CAST(sum(c) AS BIGINT) AS s
                FROM (SELECT unnest([
                              (doc_id*7+1) % (SELECT n FROM consts),
                              (doc_id*7+2) % (SELECT n FROM consts),
                              (doc_id*7+3) % (SELECT n FROM consts)]) AS dst,
                             pr // 3 AS c
                      FROM it{t0})
                GROUP BY dst) s ON b.doc_id = s.doc_id
        )"""
    body = "".join(step.format(t0=t, t1=t + 1) for t in range(iters))
    return (head + body
            + f"\n        SELECT doc_id, pr AS pr_e12 FROM it{iters}"
            + "\n        ORDER BY doc_id")


def _pii_sql() -> str:
    """Generated from the SAME stages/pii.PII_PATTERNS constants the Ray
    kernel compiles, so the RE2 pattern bytes are identical by
    construction; the doc_id-derived PII suffix mirrors q_pii_redact's
    aug() string-for-string."""
    from pcompress_ray.stages.pii import PII_PATTERNS

    aug = ("coalesce(text, '') || ' contact user' || "
           "CAST(doc_id AS VARCHAR) || '@example.com or 10.' || "
           "CAST(doc_id % 256 AS VARCHAR) || '.' || "
           "CAST((doc_id // 256) % 256 AS VARCHAR) || '.7' || "
           "CASE WHEN doc_id % 3 = 0 THEN ' call 555-' || "
           "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END")
    rt = "txt"
    for _, pat, repl in PII_PATTERNS:
        rt = f"regexp_replace({rt}, '{pat}', '{repl}', 'g')"
    counts = ",\n                   ".join(
        f"CAST(len(regexp_extract_all(txt, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in PII_PATTERNS)
    return f"""
            WITH aug AS (SELECT doc_id, {aug} AS txt FROM documents),
                 red AS (SELECT doc_id, txt, {rt} AS rt FROM aug)
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   {counts},
                   CAST(length(rt) AS BIGINT) AS red_n_chars,
                   sha256(rt) AS red_sha
            FROM red ORDER BY doc_id
        """


def oracle_sql() -> dict[str, str]:
    from pcompress_ray.stages.filter_rules import heuristic_filter_sql

    return {
        "pii_redact": _pii_sql(),
        "heuristic_filter": heuristic_filter_sql(),
        # duplicate-span coverage: every position whose 16-gram (chars)
        # recurs anywhere in the corpus; gap<=16 islands merge into spans.
        # Literal-substring grouping — the engine's 128-bit rolling-hash
        # twin must agree exactly.
        "dup_span_coverage": """
            WITH g AS (
              SELECT doc_id, off, substr(t, off, 16) AS gram
              FROM (
                SELECT doc_id, t,
                       unnest([i FOR i IN generate_series(1, length(t) - 15)]) AS off
                FROM (SELECT doc_id, text AS t FROM documents)
              )
            ),
            dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
            m AS (SELECT doc_id, off FROM g WHERE gram IN (SELECT gram FROM dup)),
            isl AS (
              SELECT doc_id, off,
                     CASE WHEN off - lag(off) OVER (PARTITION BY doc_id ORDER BY off) <= 16
                          THEN 0 ELSE 1 END AS brk
              FROM m
            ),
            grp AS (
              SELECT doc_id, off,
                     SUM(brk) OVER (PARTITION BY doc_id ORDER BY off) AS gid
              FROM isl
            ),
            spans AS (
              SELECT doc_id, gid, count(*) AS c, min(off) AS mn, max(off) AS mx
              FROM grp GROUP BY doc_id, gid
            )
            SELECT doc_id,
                   CAST(SUM(c) AS BIGINT) AS dup_starts,
                   CAST(COUNT(*) AS BIGINT) AS n_spans,
                   CAST(SUM(mx - mn + 16) AS BIGINT) AS dup_chars
            FROM spans GROUP BY doc_id ORDER BY doc_id
        """,
        # duplicate-span EXCISION: remove positions whose 16-gram occurred
        # at a strictly earlier (doc_id*1e6+off); splice kept pieces back
        # with string_agg. Same packing constant as the engine's
        # dupspans._POS_BASE (both guard off < 1e6-1).
        "dup_span_excise": """
            WITH g AS (
              SELECT doc_id, off, substr(t, off, 16) AS gram
              FROM (
                SELECT doc_id, t,
                       unnest([i FOR i IN generate_series(1, length(t) - 15)]) AS off
                FROM (SELECT doc_id, text AS t FROM documents)
              )
            ),
            stats AS (
              SELECT gram, count(*) AS c, min(doc_id * 1000000 + off) AS mn
              FROM g GROUP BY gram
            ),
            rem AS (
              SELECT doc_id, off FROM g JOIN stats USING (gram)
              WHERE c >= 2 AND doc_id * 1000000 + off > mn
            ),
            isl AS (
              SELECT doc_id, off,
                     CASE WHEN off - lag(off) OVER (PARTITION BY doc_id ORDER BY off) <= 16
                          THEN 0 ELSE 1 END AS brk
              FROM rem
            ),
            grp AS (
              SELECT doc_id, off,
                     SUM(brk) OVER (PARTITION BY doc_id ORDER BY off) AS gid
              FROM isl
            ),
            spans AS (
              SELECT doc_id, min(off) AS s, max(off) + 16 AS e
              FROM grp GROUP BY doc_id, gid
            ),
            pieces AS (
              SELECT doc_id,
                     coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 1) AS ks,
                     s AS ke
              FROM spans
              UNION ALL
              SELECT sp.doc_id, max(sp.e), any_value(length(d.text)) + 1
              FROM spans sp JOIN documents d USING (doc_id) GROUP BY sp.doc_id
            ),
            rebuilt AS (
              SELECT p.doc_id,
                     string_agg(substr(d.text, p.ks, p.ke - p.ks), ''
                                ORDER BY p.ks) AS new_text
              FROM pieces p JOIN documents d USING (doc_id)
              GROUP BY p.doc_id
            )
            SELECT d.doc_id,
                   coalesce(r.new_text, d.text) AS new_text,
                   CAST(length(d.text) - length(coalesce(r.new_text, d.text))
                        AS BIGINT) AS removed_chars
            FROM documents d LEFT JOIN rebuilt r USING (doc_id)
            ORDER BY d.doc_id
        """,
        # HLL register twin: identical sha256-derived hash/bucket/rank
        # arithmetic (exact integers; bin() gives bit_length) over DISTINCT
        # tokens; empty buckets filled with 0 via generate_series
        "hll_registers": f"""
            WITH toks AS (
              SELECT DISTINCT unnest(regexp_extract_all(
                         lower(coalesce(text, '')), '{_TOKEN_SQL}')) AS token
              FROM documents
            ),
            hashed AS (
              SELECT CAST('0x' || substr(sha256(token), 1, 16) AS UBIGINT) AS h
              FROM toks
            ),
            ranks AS (
              SELECT CAST(h >> 56 AS BIGINT) AS bucket,
                     CAST(CASE WHEN (h & ((1::UBIGINT << 56) - 1)) = 0 THEN 57
                          ELSE 56 - length(bin(h & ((1::UBIGINT << 56) - 1))) + 1
                          END AS BIGINT) AS rank
              FROM hashed
            ),
            agg AS (SELECT bucket, max(rank) AS mr FROM ranks GROUP BY bucket)
            SELECT g.b AS bucket, CAST(coalesce(a.mr, 0) AS BIGINT) AS max_rank
            FROM generate_series(0, 255) AS g(b)
            LEFT JOIN agg a ON a.bucket = g.b
            ORDER BY bucket
        """,
        # distributed grep: non-self-overlapping literal, so the
        # replace-length occurrence count is exact
        "corpus_grep": """
            SELECT doc_id,
                   CAST((length(text) - length(replace(text, 'batch', '')))
                        / 5 AS BIGINT) AS n_hits
            FROM documents
            WHERE text LIKE '%batch%'
            ORDER BY doc_id
        """,
        # cross-corpus span excision: A = doc_id%7!=0, B ('benchmark') =
        # doc_id%7==0; A positions whose 16-gram occurs anywhere in B are
        # removed (gap<=16 islands) and docs re-spliced via string_agg.
        "cross_span_excise": """
            WITH a AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0),
            bg AS (
              SELECT DISTINCT substr(t, off, 16) AS gram
              FROM (
                SELECT t, unnest([i FOR i IN generate_series(1, length(t) - 15)]) AS off
                FROM (SELECT text AS t FROM documents WHERE doc_id % 7 = 0)
              )
            ),
            ag AS (
              SELECT doc_id, off, substr(t, off, 16) AS gram
              FROM (
                SELECT doc_id, t,
                       unnest([i FOR i IN generate_series(1, length(t) - 15)]) AS off
                FROM (SELECT doc_id, text AS t FROM a)
              )
            ),
            rem AS (SELECT doc_id, off FROM ag WHERE gram IN (SELECT gram FROM bg)),
            isl AS (
              SELECT doc_id, off,
                     CASE WHEN off - lag(off) OVER (PARTITION BY doc_id ORDER BY off) <= 16
                          THEN 0 ELSE 1 END AS brk
              FROM rem
            ),
            grp AS (
              SELECT doc_id, off,
                     SUM(brk) OVER (PARTITION BY doc_id ORDER BY off) AS gid
              FROM isl
            ),
            spans AS (
              SELECT doc_id, min(off) AS s, max(off) + 16 AS e
              FROM grp GROUP BY doc_id, gid
            ),
            pieces AS (
              SELECT doc_id,
                     coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 1) AS ks,
                     s AS ke
              FROM spans
              UNION ALL
              SELECT sp.doc_id, max(sp.e), any_value(length(d.text)) + 1
              FROM spans sp JOIN a d USING (doc_id) GROUP BY sp.doc_id
            ),
            rebuilt AS (
              SELECT p.doc_id,
                     string_agg(substr(d.text, p.ks, p.ke - p.ks), ''
                                ORDER BY p.ks) AS new_text
              FROM pieces p JOIN a d USING (doc_id) GROUP BY p.doc_id
            )
            SELECT d.doc_id,
                   coalesce(r.new_text, d.text) AS new_text,
                   CAST(length(d.text) - length(coalesce(r.new_text, d.text))
                        AS BIGINT) AS removed_chars
            FROM a d LEFT JOIN rebuilt r USING (doc_id)
            ORDER BY d.doc_id
        """,
        # snapshot diff: FULL OUTER JOIN of snapshot A vs the derived B
        # (same deterministic derivation rule the engine applies)
        "snapshot_diff": """
            WITH a AS (
                SELECT doc_id, coalesce(text, '') AS text FROM documents
            ), b0 AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 7 = 0 THEN text || ' updated'
                            ELSE text END AS text
                FROM a WHERE doc_id % 11 <> 0
            ), badd AS (
                SELECT doc_id + 1000000 AS doc_id,
                       'new page ' || CAST(doc_id AS VARCHAR) AS text
                FROM a WHERE doc_id % 13 = 0
            ), b AS (
                SELECT * FROM b0 UNION ALL SELECT * FROM badd
            )
            SELECT CAST(coalesce(a.doc_id, b.doc_id) AS BIGINT) AS doc_id,
                   CASE WHEN a.doc_id IS NULL THEN 'added'
                        WHEN b.doc_id IS NULL THEN 'deleted'
                        WHEN a.text = b.text THEN 'unchanged'
                        ELSE 'changed' END AS status
            FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
            ORDER BY doc_id
        """,
        # histogram-sketch quantiles: the twin reproduces the SKETCH
        # (bucket = min(n_chars // 16, 2047), rank = ceil(q*n) in exact
        # ints, quantile = bucket lower bound), not a tolerance band
        "length_hist_quantiles": """
            WITH h AS (
                SELECT lang, LEAST(n_chars // 16, 2047) AS b,
                       COUNT(*) AS c
                FROM documents GROUP BY 1, 2
            ), cum AS (
                SELECT lang, b,
                       SUM(c) OVER (PARTITION BY lang ORDER BY b) AS cc,
                       SUM(c) OVER (PARTITION BY lang) AS n
                FROM h
            )
            SELECT lang,
                   CAST(MAX(n) AS BIGINT) AS n_docs,
                   CAST(MIN(CASE WHEN cc >= (n + 1) // 2 THEN b END) * 16
                        AS BIGINT) AS p50_approx,
                   CAST(MIN(CASE WHEN cc >= (9 * n + 9) // 10 THEN b END)
                        * 16 AS BIGINT) AS p90_approx
            FROM cum GROUP BY lang ORDER BY lang
        """,
        # fuzzy decontamination: max 5-gram-set Jaccard per corpus doc vs
        # the doc_id<20 benchmark; double ORDER BY is safe (union sizes
        # ~100 => distinct-ratio spacing >= 1/u^2 >> double eps) and ties
        # break to the smaller bench_id on both sides; jacc_e6 and the
        # flag are exact-integer on both sides
        "fuzzy_decontaminate": """
            WITH corpus AS (
                SELECT doc_id,
                       list_filter(string_split(coalesce(text, ''), ' '),
                                   x -> x <> '') AS tk
                FROM documents WHERE doc_id >= 20
            ), bench AS (
                SELECT doc_id AS bench_id,
                       list_filter(string_split(coalesce(text, ''), ' '),
                                   x -> x <> '') AS tk
                FROM documents WHERE doc_id < 20
            ), cg AS (
                SELECT DISTINCT doc_id,
                       unnest(list_transform(range(0, len(tk) - 4),
                           s -> array_to_string(tk[s+1 : s+5], ' '))) AS gram
                FROM corpus WHERE len(tk) >= 5
            ), bg AS (
                SELECT DISTINCT bench_id,
                       unnest(list_transform(range(0, len(tk) - 4),
                           s -> array_to_string(tk[s+1 : s+5], ' '))) AS gram
                FROM bench WHERE len(tk) >= 5
            ), cs AS (
                SELECT doc_id, COUNT(*) AS c FROM cg GROUP BY doc_id
            ), bs AS (
                SELECT bench_id, COUNT(*) AS c FROM bg GROUP BY bench_id
            ), iv AS (
                SELECT cg.doc_id, bg.bench_id, COUNT(*) AS i
                FROM cg JOIN bg USING (gram) GROUP BY 1, 2
            ), sc AS (
                SELECT iv.doc_id, iv.bench_id, iv.i,
                       cs.c + bs.c - iv.i AS u,
                       row_number() OVER (PARTITION BY iv.doc_id
                           ORDER BY CAST(iv.i AS DOUBLE)
                                    / (cs.c + bs.c - iv.i) DESC,
                                    iv.bench_id) AS rn
                FROM iv
                JOIN cs ON iv.doc_id = cs.doc_id
                JOIN bs ON iv.bench_id = bs.bench_id
            )
            SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
                   CAST(coalesce(sc.bench_id, -1) AS BIGINT) AS bench_id,
                   CAST(coalesce(sc.i, 0) AS BIGINT) AS n_inter,
                   CAST(coalesce(sc.u, 0) AS BIGINT) AS n_union,
                   CAST(coalesce(CAST(sc.i AS HUGEINT) * 1000000 // sc.u,
                                 0) AS BIGINT) AS jacc_e6,
                   CAST(CASE WHEN sc.i * 5 >= sc.u THEN 1 ELSE 0 END
                        AS BIGINT) AS is_contaminated
            FROM documents d
            LEFT JOIN (SELECT * FROM sc WHERE rn = 1) sc
                   ON d.doc_id = sc.doc_id
            WHERE d.doc_id >= 20 ORDER BY doc_id
        """,
        # weight-proportional Poisson sample: H*W < T*w*2^60, all exact
        # integers (HUGEINT); H = first 15 hex chars (60 bits, fits signed
        # BIGINT) of md5(text) — identical expression to the engine's
        "weighted_sample": """
            WITH tot AS (
                SELECT CAST(SUM(GREATEST(n_chars, 1)) AS HUGEINT) AS w
                FROM documents
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(n_chars AS BIGINT) AS n_chars
            FROM documents, tot
            WHERE CAST(CAST('0x' || substr(md5(coalesce(text, '')), 1, 15)
                            AS BIGINT) AS HUGEINT) * tot.w
                  < 64 * CAST(GREATEST(n_chars, 1) AS HUGEINT)
                       * CAST(1152921504606846976 AS HUGEINT)
            ORDER BY doc_id
        """,
        "bloom_dedup": """
            WITH aug AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 7 < 2
                            THEN 'template page v' ||
                                 CAST(doc_id % 3 AS VARCHAR)
                            ELSE coalesce(text, '') END AS txt
                FROM documents
            )
            SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
                   CAST(CASE WHEN EXISTS (
                        SELECT 1 FROM aug s
                        WHERE s.doc_id % 2 = 0 AND s.txt = d.txt)
                        THEN 1 ELSE 0 END AS BIGINT) AS is_dup
            FROM aug d WHERE d.doc_id % 2 = 1 ORDER BY doc_id
        """,
        "q1_pricing": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_revenue,
                   count(*) AS n_rows
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
        """,
        "q3_top_orders": """
            SELECT l.l_orderkey AS orderkey,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
                   count(*) AS n_items
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
            GROUP BY l.l_orderkey
            ORDER BY revenue DESC, orderkey
            LIMIT 10
        """,
        "customer_nation": """
            SELECT n.n_name AS nation, count(*) AS n_customers
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """,
        "doc_stats": f"""
            -- coalesce: Ray side fillna('') — align NULL text on both sides
            SELECT doc_id,
                   length(coalesce(text, '')) AS n_chars,
                   len(regexp_extract_all(lower(coalesce(text, '')), '{_TOKEN_SQL}')) AS n_tokens,
                   len(regexp_extract_all(coalesce(text, ''), '{_PUNCT_SQL}')) AS punct_count
            FROM documents
        """,
        "lang_id": _lang_id_sql(),
        "lang_stats": """
            -- CAST: DuckDB sum(BIGINT) is HUGEINT -> pandas float64; the Ray
            -- side emits int64 and the driver's value-hash is dtype-sensitive
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM documents GROUP BY lang
        """,
        "top_tokens": f"""
            SELECT token, count(*) AS n
            FROM (SELECT unnest(regexp_extract_all(lower(coalesce(text, '')), '{_TOKEN_SQL}')) AS token
                  FROM documents)
            GROUP BY token
            ORDER BY n DESC, token
            LIMIT 50
        """,
        "exact_dup_docs": """
            -- coalesce: Ray side hashes (text or '') — DuckDB md5(NULL)=NULL
            SELECT doc_id, md5(coalesce(text, '')) AS text_md5,
                   min(doc_id) OVER (PARTITION BY md5(coalesce(text, '')))
                       AS canonical_doc_id
            FROM documents
        """,
        "redirect_resolve": """
            -- recursive-CTE twin of the pointer-doubling resolver: walk
            -- the same closed-form chain (i -> i-1 unless i%13==0) one
            -- hop at a time; engine doubles, oracle single-steps —
            -- identical fixpoint (final_id, hops), all int64
            WITH RECURSIVE chain AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 13 = 0 THEN doc_id
                            ELSE doc_id - 1 END AS ptr,
                       CAST(CASE WHEN doc_id % 13 = 0 THEN 0
                                 ELSE 1 END AS BIGINT) AS hops
                FROM documents
                UNION ALL
                SELECT c.doc_id,
                       CASE WHEN c.ptr % 13 = 0 THEN c.ptr
                            ELSE c.ptr - 1 END,
                       c.hops + 1
                FROM chain c WHERE c.ptr % 13 <> 0
            )
            SELECT doc_id, ptr AS final_id, hops
            FROM chain WHERE ptr % 13 = 0
        """,
        "mirror_domains": f"""
            -- exact twin of stages/mirror.py: rare-content Jaccard per
            -- domain pair over md5'd 8-token reflowed segments (the
            -- line_dedup construction), integer e6 floor arithmetic;
            -- cap = 8 distinct domains per key (operator semantics,
            -- both sides)
            WITH toks AS (
                SELECT doc_id, list_filter(string_split(text, ' '),
                                           x -> x <> '') AS tk
                FROM documents
            ), lnl AS (
                SELECT doc_id,
                       list_transform(
                           range(0, CAST(ceil(len(tk) / 8.0) AS BIGINT)),
                           s -> array_to_string(tk[s*8+1 : s*8+8], ' '))
                           AS lns
                FROM toks WHERE len(tk) > 0
            ), dm AS (
                SELECT DISTINCT {_host_expr_sql()} AS domain,
                       md5(unnest(lns)) AS k
                FROM lnl),
            g AS (SELECT k, count(*) AS nd FROM dm GROUP BY k),
            rare AS (
                SELECT dm.domain, dm.k FROM dm
                JOIN g USING (k) WHERE g.nd <= 8),
            sizes AS (
                SELECT domain, CAST(count(*) AS BIGINT) AS n
                FROM rare GROUP BY domain),
            pairs AS (
                SELECT a.domain AS domain_a, b.domain AS domain_b,
                       CAST(count(*) AS BIGINT) AS shared
                FROM rare a JOIN rare b
                  ON a.k = b.k AND a.domain < b.domain
                GROUP BY 1, 2)
            SELECT p.domain_a, p.domain_b, p.shared,
                   sa.n AS n_a, sb.n AS n_b,
                   CAST(p.shared * 1000000 // (sa.n + sb.n - p.shared)
                        AS BIGINT) AS jaccard_e6
            FROM pairs p
            JOIN sizes sa ON p.domain_a = sa.domain
            JOIN sizes sb ON p.domain_b = sb.domain
        """,
        "soft_dedup_weights": """
            -- exact twin of stages/softdedup.py over the norm-text tier:
            -- dup_count per normalized-md5 group, weight_e6 = 1e6 //
            -- dup_count, norm_weight_e6 = n_docs * weight_e6 * 1e6 //
            -- sum(weight_e6) — all floor division on integers, so the
            -- engine's fixed-point arithmetic is reproduced exactly
            WITH n AS (
                SELECT doc_id,
                       md5(trim(regexp_replace(
                           translate(coalesce(text, ''),
                                     'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                     'abcdefghijklmnopqrstuvwxyz'),
                           '[ \t\r\n]+', ' ', 'g'), ' ')) AS norm_md5
                FROM documents),
            c AS (
                SELECT doc_id,
                       CAST(count(*) OVER (PARTITION BY norm_md5) AS BIGINT)
                           AS dup_count
                FROM n),
            w AS (
                SELECT doc_id, dup_count,
                       CAST(1000000 // dup_count AS BIGINT) AS weight_e6
                FROM c)
            SELECT doc_id, dup_count, weight_e6,
                   CAST((SELECT count(*) FROM w) * weight_e6 * 1000000
                        // (SELECT sum(weight_e6) FROM w) AS BIGINT)
                       AS norm_weight_e6
            FROM w
        """,
        "dsir_weights": f"""
            -- exact twin of stages/dsir.py: md5-mod-8192 hashed
            -- unigram+bigram occurrences, Laplace-smoothed target
            -- (doc_id % 10 = 0) vs raw LMs, per-bucket log ratio
            -- floor(x*1e6+0.5)-quantized BEFORE the per-doc sum
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '{_TOKEN_SQL}') AS tk
                FROM documents),
            uni AS (SELECT doc_id, unnest(tk) AS g FROM toks),
            big AS (SELECT doc_id, tk[g.i] || ' ' || tk[g.i + 1] AS g
                    FROM toks, LATERAL (SELECT unnest(range(1, len(tk)))
                                        AS i) g),
            ng AS (SELECT * FROM uni UNION ALL SELECT * FROM big),
            hb AS (SELECT doc_id,
                          (('0x' || substr(md5(g), 1, 16))::UBIGINT
                           % 8192)::BIGINT AS b
                   FROM ng),
            tgt AS (SELECT b, count(*) AS c FROM hb
                    WHERE doc_id % 10 = 0 GROUP BY b),
            raw AS (SELECT b, count(*) AS c FROM hb GROUP BY b),
            tot AS (SELECT (SELECT count(*) FROM hb
                            WHERE doc_id % 10 = 0) AS nt,
                           (SELECT count(*) FROM hb) AS nr),
            llr AS (SELECT r.b,
                           floor(1e6 * (
                               ln((coalesce(t.c, 0) + 1.0)
                                  / (tot.nt + 8192.0))
                             - ln((r.c + 1.0) / (tot.nr + 8192.0))
                           ) + 0.5)::BIGINT AS c_e6
                    FROM raw r LEFT JOIN tgt t USING (b), tot),
            sc AS (SELECT hb.doc_id, count(*) AS n_ngrams,
                          sum(llr.c_e6)::BIGINT AS score_e6
                   FROM hb JOIN llr USING (b) GROUP BY hb.doc_id)
            SELECT d.doc_id, coalesce(sc.n_ngrams, 0)::BIGINT AS n_ngrams,
                   coalesce(sc.score_e6, 0)::BIGINT AS score_e6
            FROM documents d LEFT JOIN sc USING (doc_id)
        """,
        "dsir_sample": f"""
            -- Gumbel top-k twin: key = score_e6 + e6-quantized
            -- -ln(-ln(u)), u = (md5("doc_id:0") leading-16-hex + 0.5)
            -- / 2^64 — identical doubles on both engines
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '{_TOKEN_SQL}') AS tk
                FROM documents),
            uni AS (SELECT doc_id, unnest(tk) AS g FROM toks),
            big AS (SELECT doc_id, tk[g.i] || ' ' || tk[g.i + 1] AS g
                    FROM toks, LATERAL (SELECT unnest(range(1, len(tk)))
                                        AS i) g),
            ng AS (SELECT * FROM uni UNION ALL SELECT * FROM big),
            hb AS (SELECT doc_id,
                          (('0x' || substr(md5(g), 1, 16))::UBIGINT
                           % 8192)::BIGINT AS b
                   FROM ng),
            tgt AS (SELECT b, count(*) AS c FROM hb
                    WHERE doc_id % 10 = 0 GROUP BY b),
            raw AS (SELECT b, count(*) AS c FROM hb GROUP BY b),
            tot AS (SELECT (SELECT count(*) FROM hb
                            WHERE doc_id % 10 = 0) AS nt,
                           (SELECT count(*) FROM hb) AS nr),
            llr AS (SELECT r.b,
                           floor(1e6 * (
                               ln((coalesce(t.c, 0) + 1.0)
                                  / (tot.nt + 8192.0))
                             - ln((r.c + 1.0) / (tot.nr + 8192.0))
                           ) + 0.5)::BIGINT AS c_e6
                    FROM raw r LEFT JOIN tgt t USING (b), tot),
            sc AS (SELECT hb.doc_id,
                          sum(llr.c_e6)::BIGINT AS score_e6
                   FROM hb JOIN llr USING (b) GROUP BY hb.doc_id),
            scf AS (SELECT d.doc_id,
                           coalesce(sc.score_e6, 0)::BIGINT AS score_e6
                    FROM documents d LEFT JOIN sc USING (doc_id)),
            keyed AS (SELECT doc_id, score_e6,
                             (score_e6 + floor(1e6 * -ln(-ln(
                                 ((('0x' || substr(md5(doc_id::VARCHAR
                                     || ':0'), 1, 16))::UBIGINT)::DOUBLE
                                  + 0.5) / 18446744073709551616.0))
                              + 0.5)::BIGINT) AS key_e6
                      FROM scf)
            SELECT doc_id, score_e6, key_e6 FROM keyed
            ORDER BY key_e6 DESC, doc_id LIMIT 100
        """,
        "simhash_fingerprint": f"""
            -- hash-derived Charikar SimHash, bit-exact twin of
            -- stages/candidates.md5_simhash: same md5-leading-16-hex
            -- uint64 per DISTINCT token, same s >= 0 tie rule
            WITH toks AS (
                SELECT DISTINCT doc_id,
                       unnest(regexp_extract_all(lower(coalesce(text, '')),
                                                 '{_TOKEN_SQL}')) AS tok
                FROM documents),
            th AS (
                SELECT doc_id,
                       ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h
                FROM toks),
            nt AS (SELECT doc_id, count(*) AS n_tokens FROM th
                   GROUP BY doc_id),
            bits AS (
                SELECT doc_id, b.b AS b,
                       sum(CASE WHEN (h >> b.b) & 1 = 1
                                THEN 1 ELSE -1 END) AS s
                FROM th, (SELECT unnest(range(64)) AS b) b
                GROUP BY doc_id, b.b),
            fp AS (
                SELECT doc_id,
                       CAST(sum(CASE WHEN s >= 0 THEN (1::HUGEINT << b)
                                     ELSE 0 END) AS UBIGINT) AS h
                FROM bits GROUP BY doc_id)
            SELECT f.doc_id, nt.n_tokens,
                   lower(lpad(to_hex(f.h), 16, '0')) AS simhash
            FROM fp f JOIN nt USING (doc_id)
        """,
        "simhash_hamming_pairs": f"""
            -- exact cross-join twin of the banded engine (pigeonhole:
            -- hamming <= 3 over 4 x 16-bit bands always shares a band)
            WITH toks AS (
                SELECT DISTINCT doc_id,
                       unnest(regexp_extract_all(lower(coalesce(text, '')),
                                                 '{_TOKEN_SQL}')) AS tok
                FROM documents),
            th AS (
                SELECT doc_id,
                       ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h
                FROM toks),
            bits AS (
                SELECT doc_id, b.b AS b,
                       sum(CASE WHEN (h >> b.b) & 1 = 1
                                THEN 1 ELSE -1 END) AS s
                FROM th, (SELECT unnest(range(64)) AS b) b
                GROUP BY doc_id, b.b),
            fp AS (
                SELECT doc_id,
                       CAST(sum(CASE WHEN s >= 0 THEN (1::HUGEINT << b)
                                     ELSE 0 END) AS UBIGINT) AS h
                FROM bits GROUP BY doc_id)
            SELECT x.doc_id AS a, y.doc_id AS b
            FROM fp x JOIN fp y ON x.doc_id < y.doc_id
            WHERE bit_count(xor(x.h, y.h)) <= 3
        """,
        "norm_text_dedup": """
            -- translate = exact ASCII lower (engine uses pc.ascii_lower);
            -- regexp_replace is RE2 on both sides, so byte-identical norms
            WITH n AS (
                SELECT doc_id,
                       md5(trim(regexp_replace(
                           translate(coalesce(text, ''),
                                     'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                     'abcdefghijklmnopqrstuvwxyz'),
                           '[ \t\r\n]+', ' ', 'g'), ' ')) AS norm_md5
                FROM documents)
            SELECT doc_id, norm_md5,
                   min(doc_id) OVER (PARTITION BY norm_md5)
                       AS canonical_doc_id
            FROM n
        """,
        "dup_gain_by_source": """
            SELECT source, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   CAST(sum(CASE WHEN doc_id <> cid THEN 1 ELSE 0 END)
                        AS BIGINT) AS dup_docs,
                   CAST(sum(CASE WHEN doc_id <> cid THEN n_chars ELSE 0 END)
                        AS BIGINT) AS dup_chars
            FROM (SELECT source, doc_id, n_chars,
                         min(doc_id) OVER (
                             PARTITION BY md5(coalesce(text, ''))) AS cid
                  FROM documents)
            GROUP BY source
        """,
        "corpus_sample": """
            SELECT doc_id, md5(coalesce(text, '')) AS text_md5
            FROM documents
            WHERE substr(md5(coalesce(text, '')), 1, 2) < '20'
        """,
        "events_hourly": """
            SELECT user_id,
                   CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id,
                   count(*) AS n_events,
                   round(sum(value), 6) AS sum_value
            FROM events
            GROUP BY user_id, hour_id
        """,
        "top_orders_per_segment": """
            SELECT segment, o_orderkey, total_e2 FROM (
                SELECT c.c_mktsegment AS segment, o.o_orderkey,
                       CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                           AS total_e2,
                       row_number() OVER (PARTITION BY c.c_mktsegment
                                          ORDER BY o.o_totalprice DESC,
                                                   o.o_orderkey) AS rn
                FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
            WHERE rn <= 3
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN
                (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
        """,
        "hourly_active_users": """
            SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1
        """,
        "events_sliding": """
            WITH e AS (
                SELECT user_id,
                       CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id,
                       CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v_e6
                FROM events
            ), h AS (
                SELECT user_id, hour_id, count(*) AS n, sum(v_e6) AS sv
                FROM e GROUP BY user_id, hour_id
            )
            SELECT user_id, hour_id,
                   CAST(sum(n) OVER w AS BIGINT) AS n_events_3h,
                   CAST(sum(sv) OVER w AS BIGINT) AS sum_value_e6_3h
            FROM h
            WINDOW w AS (PARTITION BY user_id ORDER BY hour_id
                         RANGE BETWEEN 2 PRECEDING AND CURRENT ROW)
        """,
        "sessionize": """
            WITH w AS (
                SELECT user_id, event_id, ts,
                       epoch(ts) - lag(epoch(ts), 1, epoch(ts))
                           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
                FROM events),
            s AS (
                SELECT user_id,
                       sum(CASE WHEN gap > 1800.0 THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
                FROM w)
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   count(*) AS n_events
            FROM s GROUP BY user_id, session_id
        """,
        "user_first_last": """
            WITH w AS (
                SELECT user_id, event_type,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC)
                           AS rn_last,
                       count(*) OVER (PARTITION BY user_id) AS n
                FROM events)
            SELECT user_id,
                   max(CASE WHEN rn = 1 THEN event_type END) AS first_type,
                   max(CASE WHEN rn_last = 1 THEN event_type END) AS last_type,
                   CAST(max(n) AS BIGINT) AS n_events
            FROM w GROUP BY user_id
        """,
        "user_running_value": """
            SELECT user_id, event_id,
                   CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_value_e6
            FROM events
        """,
        "event_gaps": """
            SELECT user_id, event_id, CAST(ts_us - prev_us AS BIGINT) AS gap_us
            FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                         lag(epoch_us(ts)) OVER (
                             PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_us
                  FROM events)
            WHERE prev_us IS NOT NULL
        """,
        "fixed_chunks": """
            SELECT doc_id,
                   CAST(ceil(octet_length(encode(coalesce(text, ''))) / 64.0) AS BIGINT)
                       AS n_chunks,
                   CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT)
                       AS chunk_bytes
            FROM documents
        """,
        "embedding_clusters": """
            -- connected components over cosine>=0.35 pairs: min reachable
            -- vec_id per node via recursive label walk (edges both ways;
            -- the lbl < node guard keeps the walk monotone-decreasing)
            WITH RECURSIVE p AS (
                SELECT a.vec_id AS va, b.vec_id AS vb
                FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
                WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.35
            ), e AS (
                SELECT va AS a, vb AS b FROM p
                UNION ALL SELECT vb, va FROM p
            ), walk(node, lbl) AS (
                SELECT vec_id, vec_id FROM embeddings
                UNION
                SELECT e.b, w.lbl FROM walk w JOIN e ON e.a = w.node
                WHERE w.lbl < e.b
            )
            SELECT node AS vec_id, CAST(min(lbl) AS BIGINT) AS cluster_id
            FROM walk GROUP BY node
        """,
        "ngram_jaccard": r"""
            -- exact token-5-gram Jaccard >= 0.5 (string shingles; the Ray
            -- side uses 64-bit shingle hashes — collision odds ~2^-64)
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-z0-9]+') AS t
                FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS s
                FROM toks, UNNEST(range(1, len(t) - 3)) AS u(i)
                WHERE len(t) >= 5
            ), sz AS (
                SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), pairs AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       count(*) AS inter
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT p.doc_a, p.doc_b,
                   CAST(p.inter AS BIGINT) AS inter,
                   CAST(sa.n + sb.n - p.inter AS BIGINT) AS union_sz,
                   CAST(floor(p.inter / (sa.n + sb.n - p.inter)
                              * 1000000.0 + 0.5) AS BIGINT) AS jaccard_e6
            FROM pairs p
            JOIN sz sa ON sa.doc_id = p.doc_a
            JOIN sz sb ON sb.doc_id = p.doc_b
            WHERE p.inter / (sa.n + sb.n - p.inter) >= 0.5
        """,
        "ngram_containment": r"""
            -- exact token-5-gram containment |A∩B|/min(|A|,|B|) >= 0.8
            -- (excerpt/subset detection; same shingling as ngram_jaccard)
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-z0-9]+') AS t
                FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS s
                FROM toks, UNNEST(range(1, len(t) - 3)) AS u(i)
                WHERE len(t) >= 5
            ), sz AS (
                SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), pairs AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       count(*) AS inter
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT p.doc_a, p.doc_b,
                   CAST(p.inter AS BIGINT) AS inter,
                   CAST(least(sa.n, sb.n) AS BIGINT) AS min_sz,
                   CAST(floor(p.inter / least(sa.n, sb.n)
                              * 1000000.0 + 0.5) AS BIGINT) AS containment_e6
            FROM pairs p
            JOIN sz sa ON sa.doc_id = p.doc_a
            JOIN sz sb ON sb.doc_id = p.doc_b
            WHERE p.inter / least(sa.n, sb.n) >= 0.8
        """,
        "quality_scores": r"""
            -- exact float twin of textstats.quality_batch (same ops, same
            -- order, every float emitted as floor(x*1e6+0.5) scaled int)
            WITH c AS (
                SELECT doc_id,
                    CAST(length(coalesce(text, '')) AS DOUBLE) AS n_chars,
                    CAST(len(regexp_extract_all(lower(coalesce(text, '')),
                        '[a-z0-9]+')) AS DOUBLE) AS n_tokens,
                    CAST(len(regexp_extract_all(coalesce(text, ''),
                        '[!-/:-@\[-`{-~]')) AS DOUBLE) AS n_punct,
                    CAST(len(regexp_extract_all(lower(coalesce(text, '')),
                        '\b(the|and|of|to|in|is)\b')) AS DOUBLE) AS n_stop
                FROM documents
            ), r AS (
                SELECT doc_id, n_tokens,
                    n_punct / greatest(n_chars, 1.0) AS punct_ratio,
                    n_stop / greatest(n_tokens, 1.0) AS stop_ratio,
                    CASE WHEN n_tokens > 0
                         THEN n_chars / greatest(n_tokens, 1.0)
                         ELSE 0.0 END AS avg_token_len
                FROM c
            )
            SELECT doc_id,
                CAST(n_tokens AS BIGINT) AS n_tokens,
                CAST(floor(punct_ratio * 1000000.0 + 0.5) AS BIGINT)
                    AS punct_ratio_e6,
                CAST(floor(stop_ratio * 1000000.0 + 0.5) AS BIGINT)
                    AS stopword_ratio_e6,
                CAST(floor(avg_token_len * 1000000.0 + 0.5) AS BIGINT)
                    AS avg_token_len_e6,
                CAST(floor((least(n_tokens / 100.0, 1.0) * 0.4
                    + least(stop_ratio * 5.0, 1.0) * 0.3
                    + (1.0 - least(punct_ratio * 10.0, 1.0)) * 0.3)
                    * 1000000.0 + 0.5) AS BIGINT) AS quality_score_e6
            FROM r
        """,
        "content_type_stats": r"""
            -- analyzer.c:32-99 rebuilt in SQL. All counted chars ('<','>',
            -- ' ', controls) are single-byte ASCII, so char counts == byte
            -- counts; tot8b = total bytes - ASCII chars (every byte of a
            -- multi-byte UTF-8 char is >127).
            WITH b AS (
                SELECT doc_id,
                       coalesce(text, '') AS t,
                       CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes,
                       replace(coalesce(text, ''), ' ', '') AS ns
                FROM documents
            ), c AS (
                SELECT doc_id, n_bytes,
                    n_bytes - length(regexp_replace(t, '[^\x00-\x7f]', '', 'g')) AS tot8b,
                    CAST(length(t) - length(regexp_replace(t, '[\x00-\x1f]', '', 'g')) AS BIGINT) AS lbytes,
                    CAST(length(t) - length(replace(t, ' ', '')) AS BIGINT) AS spc,
                    CAST(length(t) - length(replace(t, '<', '')) AS BIGINT) AS tag1,
                    CAST(length(t) - length(replace(t, '>', '')) AS BIGINT) AS tag2,
                    CAST((length(ns) - length(replace(ns, '</', ''))) // 2
                       + (length(ns) - length(replace(ns, '/>', ''))) // 2 AS BIGINT) AS tag3
                FROM b
            ), d AS (
                SELECT *,
                    CASE WHEN tag1 > tag2 - 4 AND tag1 < tag2 + 4
                              AND tag3 > tag1 * 0.40
                              AND tag1 + tag2 > spc * 0.06
                         THEN '|MARKUP' ELSE '' END AS mk
                FROM c
            )
            SELECT doc_id, n_bytes, tot8b, lbytes, spc, tag1, tag2, tag3,
                CASE WHEN tot8b <= n_bytes / 10.0
                          AND lbytes < (n_bytes // 2 + n_bytes // 4 + n_bytes // 8)
                     THEN 'TEXT' ELSE 'BINARY' END || mk AS btype_10,
                CASE WHEN tot8b + lbytes > n_bytes / 10.0 * 3
                     THEN 'BINARY' ELSE 'TEXT' END || mk AS btype_30,
                CASE WHEN tot8b + lbytes > n_bytes / 10.0 * 5
                     THEN 'BINARY' ELSE 'TEXT' END || mk AS btype_50
            FROM d
        """,
        "asof_purchase": """
            -- deterministic: (user_id, ts) is unique within each event_type
            WITH l AS (SELECT event_id, user_id,
                              CAST(epoch_us(ts) AS BIGINT) AS ts_us
                       FROM events WHERE event_type = 'click'),
            r AS (SELECT event_id AS r_event, user_id,
                         CAST(epoch_us(ts) AS BIGINT) AS ts_us
                  FROM events WHERE event_type = 'purchase')
            SELECT l.event_id, l.user_id, l.ts_us,
                   coalesce(r.r_event, -1) AS matched_event_id
            FROM l ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND l.ts_us >= r.ts_us
        """,
        "price_band_join": """
            SELECT p.p_partkey, count(l.unit_price) AS n_matches
            FROM part p LEFT JOIN
                 (SELECT l_extendedprice / l_quantity AS unit_price
                  FROM lineitem) l
              ON l.unit_price BETWEEN p.p_retailprice * 0.98
                                  AND p.p_retailprice * 1.02
            GROUP BY p.p_partkey
        """,
        "events_rollup": """
            WITH e AS (SELECT event_type,
                              CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id,
                              CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v_e6
                       FROM events)
            SELECT coalesce(event_type, 'ALL') AS event_type,
                   coalesce(hour_id, -1) AS hour_id,
                   count(*) AS n_events,
                   CAST(sum(v_e6) AS BIGINT) AS sum_value_e6
            FROM e GROUP BY ROLLUP(event_type, hour_id)
        """,
        "lang_token_diversity": """
            WITH t AS (SELECT lang,
                              unnest(regexp_extract_all(
                                  lower(coalesce(text, '')), '[a-z0-9]+')) AS token
                       FROM documents)
            SELECT lang, count(DISTINCT token) AS n_distinct_tokens,
                   count(*) AS n_tokens
            FROM t GROUP BY lang
        """,
        "lang_length_quantiles": """
            -- linear-interpolated quantiles, same IEEE ops as the Ray side:
            -- h=(n-1)q; v = x[floor(h)] + (x[min(floor(h)+1,n-1)]-x[floor(h)])
            --           * (h-floor(h)); emit floor(v*1e6+0.5)
            WITH o AS (SELECT lang, CAST(n_chars AS DOUBLE) AS x,
                              row_number() OVER (PARTITION BY lang
                                                 ORDER BY n_chars) - 1 AS rn,
                              count(*) OVER (PARTITION BY lang) AS n
                       FROM documents),
            g AS (SELECT lang, max(n) AS n, (max(n) - 1) * 0.5 AS h50,
                         (max(n) - 1) * 0.9 AS h90
                  FROM o GROUP BY lang),
            v AS (SELECT g.lang, g.n, g.h50, g.h90,
                  max(CASE WHEN o.rn = CAST(floor(g.h50) AS BIGINT)
                           THEN o.x END) AS lo50,
                  max(CASE WHEN o.rn = least(CAST(floor(g.h50) AS BIGINT) + 1,
                                             g.n - 1) THEN o.x END) AS hi50,
                  max(CASE WHEN o.rn = CAST(floor(g.h90) AS BIGINT)
                           THEN o.x END) AS lo90,
                  max(CASE WHEN o.rn = least(CAST(floor(g.h90) AS BIGINT) + 1,
                                             g.n - 1) THEN o.x END) AS hi90
                  FROM g JOIN o ON o.lang = g.lang
                  GROUP BY g.lang, g.n, g.h50, g.h90)
            SELECT lang, CAST(n AS BIGINT) AS n_docs,
                   CAST(floor((lo50 + (hi50 - lo50) * (h50 - floor(h50)))
                              * 1000000.0 + 0.5) AS BIGINT) AS p50_e6,
                   CAST(floor((lo90 + (hi90 - lo90) * (h90 - floor(h90)))
                              * 1000000.0 + 0.5) AS BIGINT) AS p90_e6
            FROM v
        """,
        "ann_topk": """
            SELECT query_id, neighbor_id FROM (
                SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY a.vec_id
                           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC,
                                    b.vec_id) AS rn
                FROM embeddings a, embeddings b
                WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id)
            WHERE rn <= 5
        """,
        "embedding_neardup": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(a.embedding, b.embedding) >= 0.35
        """,
        # tokenization twin of stages/textstats._split_tokens: split on
        # single spaces, drop empties; ratio rounding twin of
        # gopher_stats_batch (floor(x*1e6+0.5), outer CASTs per the
        # dtype-family gate)
        "gopher_quality": """
            WITH tok AS (
                SELECT doc_id, t.tok
                FROM documents, UNNEST(string_split(text, ' ')) AS t(tok)
                WHERE t.tok <> ''
            ), cnt AS (
                SELECT doc_id, tok, COUNT(*) AS c
                FROM tok GROUP BY doc_id, tok
            ), agg AS (
                SELECT doc_id, SUM(c) AS n_tokens, COUNT(*) AS n_distinct,
                       MAX(c) AS max_c
                FROM cnt GROUP BY doc_id
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(n_distinct AS BIGINT) AS n_distinct,
                   CAST(floor(max_c * 1e6 / n_tokens + 0.5) AS BIGINT)
                       AS top_ratio_e6,
                   CAST(floor(n_distinct * 1e6 / n_tokens + 0.5) AS BIGINT)
                       AS distinct_ratio_e6,
                   CAST((max_c * 1.0 / n_tokens <= 0.2
                         AND n_distinct * 1.0 / n_tokens >= 0.3
                         AND n_tokens BETWEEN 10 AND 100000) AS BIGINT)
                       AS pass_gopher
            FROM agg
        """,
        "top_bigrams": """
            WITH l AS (
                SELECT list_filter(string_split(text, ' '),
                                   x -> x <> '') AS toks
                FROM documents
            ), b AS (
                SELECT UNNEST([toks[i] || ' ' || toks[i + 1]
                               FOR i IN generate_series(1, len(toks) - 1)])
                    AS bigram
                FROM l
            )
            SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n FROM b
            GROUP BY bigram ORDER BY n DESC, bigram LIMIT 30
        """,
        # idf quantized to e6 ints BEFORE the multiply (twin of
        # q_tfidf_top_term: integer c * idf_e6, immune to ln() ULP drift);
        # argmax tie-break = (tfidf desc, tok asc) on both sides
        "tfidf_top_term": """
            WITH tok AS (
                SELECT doc_id, t.tok
                FROM documents, UNNEST(string_split(text, ' ')) AS t(tok)
                WHERE t.tok <> ''
            ), tf AS (
                SELECT doc_id, tok, COUNT(*) AS c
                FROM tok GROUP BY doc_id, tok
            ), df AS (
                SELECT tok, COUNT(*) AS d FROM tf GROUP BY tok
            ), nd AS (SELECT COUNT(*) AS n FROM documents),
            scored AS (
                SELECT tf.doc_id, tf.tok,
                       CAST(tf.c AS BIGINT)
                       * CAST(floor(ln(nd.n * 1.0 / df.d) * 1e6 + 0.5)
                              AS BIGINT) AS tfidf_e6
                FROM tf JOIN df USING (tok) CROSS JOIN nd
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id, tok AS top_term,
                   tfidf_e6
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY doc_id
                      ORDER BY tfidf_e6 DESC, tok) AS rn FROM scored)
            WHERE rn = 1
        """,
        # per-token logprob quantized to e6 ints BEFORE the per-doc mean
        # (twin of q_lm_quality: SUM(c*lp_e6) is exact integer math; the
        # single 1.0*sum/n division + floor(+0.5) is identical IEEE double
        # arithmetic on both sides)
        "lm_quality": """
            WITH tok AS (
                SELECT doc_id, t.tok
                FROM documents, UNNEST(string_split(text, ' ')) AS t(tok)
                WHERE t.tok <> ''
            ), tf AS (
                SELECT doc_id, tok, COUNT(*) AS c
                FROM tok GROUP BY doc_id, tok
            ), vocab AS (
                SELECT tok, SUM(c) AS n FROM tf GROUP BY tok
            ), tot AS (SELECT SUM(n) AS nn FROM vocab),
            lp AS (
                SELECT tok,
                       CAST(floor(-ln(n * 1.0 / tot.nn) * 1e6 + 0.5)
                            AS BIGINT) AS lp_e6
                FROM vocab CROSS JOIN tot
            )
            SELECT CAST(tf.doc_id AS BIGINT) AS doc_id,
                   CAST(SUM(tf.c) AS BIGINT) AS n_tokens,
                   CAST(floor(1.0 * SUM(tf.c * lp.lp_e6) / SUM(tf.c) + 0.5)
                        AS BIGINT) AS lm_score_e6
            FROM tf JOIN lp USING (tok) GROUP BY tf.doc_id
        """,
        # 13-gram construction twin of ngram_strings (filter empties, then
        # join 13 adjacent tokens); benchmark = doc_id < 20, LEFT JOIN so
        # gram-free docs still emit 0 like the engine
        "decontaminate": """
            WITH l AS (
                SELECT doc_id, list_filter(string_split(text, ' '),
                                           x -> x <> '') AS toks
                FROM documents
            ), grams AS (
                SELECT doc_id,
                       UNNEST([array_to_string(toks[i:i+12], ' ')
                               FOR i IN generate_series(1, len(toks) - 12)])
                    AS g
                FROM l
            ), bench AS (
                SELECT DISTINCT g FROM grams WHERE doc_id < 20
            ), hits AS (
                SELECT doc_id, COUNT(*) AS n_hits
                FROM grams WHERE g IN (SELECT g FROM bench) GROUP BY doc_id
            )
            SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
                   CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_contaminated,
                   CAST(COALESCE(h.n_hits, 0) > 0 AS BIGINT)
                       AS is_contaminated
            FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        """,
        # lowercase-hex string thresholds: 'cc' = 204/256 (~80%),
        # 'e6' = 230/256 (~90%) — lexicographic compare == numeric compare
        # on fixed-width lowercase hex, same expression the engine uses
        "dataset_split": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CASE WHEN substr(md5(coalesce(text, '')), 1, 2) < 'cc'
                            THEN 'train'
                        WHEN substr(md5(coalesce(text, '')), 1, 2) < 'e6'
                            THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        """,
        # fixed 10-token windows; duplicate = any occurrence after the
        # (doc_id, seg_no)-minimal one, matching the engine's canonical
        # backward-reference order
        "segment_dedup": """
            WITH toks AS (
                SELECT doc_id, list_filter(string_split(text, ' '),
                                           x -> x <> '') AS tk
                FROM documents
            ), segl AS (
                SELECT doc_id,
                       list_transform(
                           range(0, CAST(ceil(len(tk) / 10.0) AS BIGINT)),
                           s -> array_to_string(tk[s*10+1 : s*10+10], ' '))
                           AS segs
                FROM toks WHERE len(tk) > 0
            ), ex AS (
                SELECT doc_id, unnest(segs) AS seg,
                       unnest(range(0, len(segs))) AS seg_no
                FROM segl
            ), marked AS (
                SELECT doc_id,
                       row_number() OVER (PARTITION BY seg
                                          ORDER BY doc_id, seg_no) AS rn
                FROM ex
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   COUNT(*) AS n_segs,
                   CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_dup_segs
            FROM marked GROUP BY doc_id ORDER BY doc_id
        """,
        "top_dup_segments": """
            WITH toks AS (
                SELECT doc_id, list_filter(string_split(text, ' '),
                                           x -> x <> '') AS tk
                FROM documents
            ), segl AS (
                SELECT doc_id,
                       list_transform(
                           range(0, CAST(ceil(len(tk) / 10.0) AS BIGINT)),
                           s -> array_to_string(tk[s*10+1 : s*10+10], ' '))
                           AS segs
                FROM toks WHERE len(tk) > 0
            ), ex AS (
                SELECT doc_id, unnest(segs) AS seg FROM segl
            )
            SELECT seg, COUNT(*) AS n_occ,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
            FROM ex GROUP BY seg HAVING COUNT(*) > 1
            ORDER BY n_occ DESC, seg LIMIT 20
        """,
        "pack_sequences": """
            WITH t AS (
                SELECT doc_id,
                       COALESCE(len(list_filter(string_split(text, ' '),
                                                x -> x <> '')), 0)
                           AS n_tokens
                FROM documents
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) // 256
                        AS BIGINT) AS bin_id
            FROM t ORDER BY doc_id
        """,
        # tau=0.5 temperature sampling; fixed-width lowercase-hex compare
        # == numeric compare; IEEE sqrt is correctly rounded so both
        # engines derive the identical integer threshold
        "lang_temperature_sample": """
            WITH c AS (
                SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
            ), m AS (SELECT MIN(n) AS nmin FROM c
            ), r AS (
                SELECT lang,
                       CASE WHEN n = (SELECT nmin FROM m) THEN 'g'
                            ELSE printf('%08x',
                                 CAST(floor(sqrt((SELECT nmin FROM m) * 1.0
                                                 / n) * 4294967296.0)
                                      AS BIGINT))
                       END AS thr
                FROM c
            )
            SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang
            FROM documents d JOIN r ON d.lang = r.lang
            WHERE substr(md5(coalesce(d.text, '')), 1, 8) < r.thr
            ORDER BY doc_id
        """,
        "intradoc_repetition": """
            WITH l AS (
                SELECT doc_id, list_filter(string_split(text, ' '),
                                           x -> x <> '') AS toks
                FROM documents
            ), grams AS (
                SELECT doc_id,
                       UNNEST([array_to_string(toks[i:i+2], ' ')
                               FOR i IN generate_series(1, len(toks) - 2)])
                    AS g
                FROM l
            ), agg AS (
                SELECT doc_id, COUNT(*) AS n_grams,
                       CAST(COUNT(*) - COUNT(DISTINCT g) AS BIGINT) AS n_dup
                FROM grams GROUP BY doc_id
            )
            SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
                   CAST(COALESCE(a.n_grams, 0) AS BIGINT) AS n_grams,
                   CAST(COALESCE(a.n_dup, 0) AS BIGINT) AS n_dup_grams,
                   CAST(CASE WHEN COALESCE(a.n_grams, 0) = 0 THEN 0
                        ELSE floor(COALESCE(a.n_dup, 0) * 1e6 / a.n_grams
                                   + 0.5) END AS BIGINT) AS dup_ratio_e6
            FROM documents d LEFT JOIN agg a USING (doc_id)
            ORDER BY doc_id
        """,
        "url_dedup": _url_dedup_sql(),
        "cdx_index": _cdx_index_sql(),
        "token_doc_freq": f"""
            SELECT token, count(*) AS df
            FROM (SELECT DISTINCT doc_id,
                         unnest(regexp_extract_all(lower(coalesce(text, '')),
                                                   '{_TOKEN_SQL}')) AS token
                  FROM documents)
            GROUP BY token
            ORDER BY df DESC, token
            LIMIT 50
        """,
        "length_buckets": f"""
            SELECT lang,
                   CAST(CASE WHEN n_tok = 0 THEN 0
                        WHEN n_tok >= 4096 THEN 4096
                        WHEN n_tok >= 2048 THEN 2048
                        WHEN n_tok >= 1024 THEN 1024
                        WHEN n_tok >= 512 THEN 512
                        WHEN n_tok >= 256 THEN 256
                        WHEN n_tok >= 128 THEN 128
                        WHEN n_tok >= 64 THEN 64
                        WHEN n_tok >= 32 THEN 32
                        WHEN n_tok >= 16 THEN 16
                        WHEN n_tok >= 8 THEN 8
                        WHEN n_tok >= 4 THEN 4
                        WHEN n_tok >= 2 THEN 2
                        ELSE 1 END AS BIGINT) AS bucket_lo,
                   count(*) AS n_docs
            FROM (SELECT lang,
                         len(regexp_extract_all(lower(coalesce(text, '')),
                                                '{_TOKEN_SQL}')) AS n_tok
                  FROM documents)
            GROUP BY lang, bucket_lo
        """,
        # shingle construction shared with the Ray side (_split_tokens +
        # ngram_strings): whitespace split, empty tokens dropped, 3 tokens
        # joined by ' '
        "shingle_novelty": """
            WITH sh AS (
                SELECT DISTINCT doc_id,
                       UNNEST([toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
                               FOR i IN generate_series(1, len(toks) - 2)]) AS sh
                FROM (SELECT doc_id,
                             list_filter(string_split(coalesce(text, ''), ' '),
                                         x -> x <> '') AS toks
                      FROM documents)
            ), per AS (
                SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
                FROM sh GROUP BY doc_id
            ), nov AS (
                SELECT first_doc AS doc_id, CAST(count(*) AS BIGINT) AS n_novel
                FROM (SELECT sh, min(doc_id) AS first_doc FROM sh GROUP BY sh)
                GROUP BY first_doc
            )
            SELECT d.doc_id,
                   coalesce(per.n_shingles, 0) AS n_shingles,
                   coalesce(nov.n_novel, 0) AS n_novel
            FROM documents d
            LEFT JOIN per ON d.doc_id = per.doc_id
            LEFT JOIN nov ON d.doc_id = nov.doc_id
            ORDER BY d.doc_id
        """,
        "source_overlap": """
            WITH d AS (
                SELECT DISTINCT source,
                       UNNEST([toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
                               FOR i IN generate_series(1, len(toks) - 2)]) AS sh
                FROM (SELECT source,
                             list_filter(string_split(coalesce(text, ''), ' '),
                                         x -> x <> '') AS toks
                      FROM documents)
            )
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM d a JOIN d b ON a.sh = b.sh AND a.source < b.source
            GROUP BY source_a, source_b
            ORDER BY source_a, source_b
        """,
        "corpus_fingerprint": """
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   bit_xor(CAST(('0x' || substr(sha256(coalesce(text, '')),
                                                1, 15)) AS BIGINT))
                       AS fingerprint
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "stratified_sample": """
            SELECT lang, CAST(doc_id AS BIGINT) AS doc_id
            FROM (SELECT lang, doc_id,
                         row_number() OVER (
                             PARTITION BY lang
                             ORDER BY md5(coalesce(text, '')), doc_id) AS rn
                  FROM documents)
            WHERE rn <= 20
            ORDER BY lang, doc_id
        """,
        # exact integer lift (no log/float): HUGEINT product, floor
        # division, result cast back to BIGINT — twin of the Ray side's
        # int64 (or python-int) arithmetic
        "pmi_bigrams": """
            WITH toks AS (
                SELECT list_filter(string_split(coalesce(text, ''), ' '),
                                   x -> x <> '') AS tk
                FROM documents
            ), uni AS (
                SELECT t AS tok, CAST(count(*) AS BIGINT) AS c
                FROM (SELECT unnest(tk) AS t FROM toks) GROUP BY t
            ), tot AS (
                SELECT CAST(sum(c) AS HUGEINT) AS n FROM uni
            ), bic AS (
                SELECT bigram, CAST(count(*) AS BIGINT) AS n_ab
                FROM (SELECT UNNEST([tk[i] || ' ' || tk[i + 1]
                                     FOR i IN generate_series(1, len(tk) - 1)])
                          AS bigram
                      FROM toks)
                GROUP BY bigram HAVING count(*) >= 5
            )
            SELECT bigram, n_ab,
                   CAST((CAST(n_ab AS HUGEINT) * (SELECT n FROM tot)
                         * 1000000)
                        // (CAST(u1.c AS HUGEINT) * u2.c) AS BIGINT)
                       AS lift_e6
            FROM bic
            JOIN uni u1 ON u1.tok = string_split(bigram, ' ')[1]
            JOIN uni u2 ON u2.tok = string_split(bigram, ' ')[2]
            ORDER BY lift_e6 DESC, bigram
            LIMIT 30
        """,
        "dedup_rewrite": """
            WITH toks AS (
                SELECT doc_id, list_filter(string_split(text, ' '),
                                           x -> x <> '') AS tk
                FROM documents
            ), segl AS (
                SELECT doc_id,
                       list_transform(
                           range(0, CAST(ceil(len(tk) / 10.0) AS BIGINT)),
                           s -> array_to_string(tk[s*10+1 : s*10+10], ' '))
                           AS segs
                FROM toks WHERE len(tk) > 0
            ), ex AS (
                SELECT doc_id, unnest(segs) AS seg,
                       unnest(range(0, len(segs))) AS seg_no
                FROM segl
            ), marked AS (
                SELECT doc_id, seg_no, seg,
                       row_number() OVER (PARTITION BY seg
                                          ORDER BY doc_id, seg_no) AS rn
                FROM ex
            ), re AS (
                SELECT doc_id,
                       COUNT(*) AS n_segs,
                       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_kept,
                       COALESCE(string_agg(CASE WHEN rn = 1 THEN seg END,
                                           ' ' ORDER BY seg_no), '')
                           AS new_text
                FROM marked GROUP BY doc_id
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(n_segs AS BIGINT) AS n_segs,
                   n_kept,
                   CAST(length(new_text) AS BIGINT) AS new_n_chars,
                   sha256(new_text) AS new_sha
            FROM re ORDER BY doc_id
        """,
        "line_dedup": """
            -- reflow 8-token lines, then remove EVERY occurrence of a line
            -- whose trimmed form appears in >= 2 distinct docs (boilerplate
            -- scrub; blank-after-trim lines are never removed)
            WITH toks AS (
                SELECT doc_id, list_filter(string_split(text, ' '),
                                           x -> x <> '') AS tk
                FROM documents
            ), lnl AS (
                SELECT doc_id,
                       list_transform(
                           range(0, CAST(ceil(len(tk) / 8.0) AS BIGINT)),
                           s -> array_to_string(tk[s*8+1 : s*8+8], ' '))
                           AS lns
                FROM toks WHERE len(tk) > 0
            ), ex AS (
                SELECT doc_id, unnest(lns) AS line,
                       unnest(range(0, len(lns))) AS line_no
                FROM lnl
            ), keyed AS (
                SELECT doc_id, line_no, line,
                       trim(line, ' ' || chr(9) || chr(13) || chr(11)
                                  || chr(12)) AS key
                FROM ex
            ), cnt AS (
                SELECT key, COUNT(DISTINCT doc_id) AS nd
                FROM keyed GROUP BY key
            ), mk AS (
                SELECT k.doc_id, k.line_no, k.line,
                       (c.nd >= 2 AND c.key <> '') AS rm
                FROM keyed k JOIN cnt c ON k.key = c.key
            ), re AS (
                SELECT doc_id,
                       COUNT(*) AS n_lines,
                       CAST(SUM(CASE WHEN rm THEN 0 ELSE 1 END) AS BIGINT)
                           AS n_kept,
                       COALESCE(string_agg(CASE WHEN NOT rm THEN line END,
                                           chr(10) ORDER BY line_no), '')
                           AS new_text
                FROM mk GROUP BY doc_id
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(n_lines AS BIGINT) AS n_lines,
                   n_kept,
                   CAST(length(new_text) AS BIGINT) AS new_n_chars,
                   sha256(new_text) AS new_sha
            FROM re ORDER BY doc_id
        """,
        "span_corruption": """
            -- same deterministic T5 mask: 0-based position p starts a
            -- 3-token span iff (p + doc_id) % 10 = 0; span -> one
            -- <extra_id_K> sentinel; K = (p - p0)/10 with p0 the doc's
            -- first start position
            WITH toks AS (
                SELECT doc_id, list_filter(string_split(text, ' '),
                                           x -> x <> '') AS tk
                FROM documents
            ), base AS (
                SELECT doc_id, tk, len(tk) AS n,
                       (10 - (doc_id % 10)) % 10 AS p0
                FROM toks WHERE len(tk) > 0
            ), m AS (
                SELECT doc_id, n,
                       list_transform(range(1, n + 1), i -> CASE
                           WHEN ((i - 1) + doc_id) % 10 = 0
                           THEN '<extra_id_' ||
                                CAST(((i - 1) - p0) // 10 AS VARCHAR) || '>'
                           WHEN (i >= 3 AND ((i - 3) + doc_id) % 10 = 0)
                             OR (i >= 2 AND ((i - 2) + doc_id) % 10 = 0)
                           THEN NULL
                           ELSE tk[i] END) AS out_toks,
                       len(list_filter(range(1, n + 1),
                           i -> ((i - 1) + doc_id) % 10 = 0)) AS n_spans,
                       len(list_filter(range(1, n + 1),
                           i -> ((i - 1) + doc_id) % 10 = 0
                             OR (i >= 3 AND ((i - 3) + doc_id) % 10 = 0)
                             OR (i >= 2 AND ((i - 2) + doc_id) % 10 = 0)))
                           AS n_masked
                FROM base
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(n AS BIGINT) AS n_tokens,
                   CAST(n_spans AS BIGINT) AS n_spans,
                   CAST(n_masked AS BIGINT) AS n_masked,
                   sha256(array_to_string(
                       list_filter(out_toks, x -> x IS NOT NULL), ' '))
                       AS corrupted_sha
            FROM m ORDER BY doc_id
        """,
        "corpus_merkle": """
            SELECT doc_id % 64 AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   sha256(string_agg(sha256(coalesce(text, '')), ''
                                     ORDER BY doc_id)) AS bucket_sha
            FROM documents
            GROUP BY doc_id % 64
            ORDER BY bucket
        """,
        "bm25_topk": """
            -- BM25 (k1=1.5, b=0.75) over the fixed 4-term query; each
            -- term contribution quantized to e6 BEFORE the per-doc sum so
            -- float addition order cannot matter; IEEE op order inside a
            -- contribution mirrors the engine exactly
            WITH toks AS (
                SELECT doc_id, list_filter(string_split(text, ' '),
                                           x -> x <> '') AS tk
                FROM documents
            ), ex AS (
                SELECT doc_id, unnest(tk) AS tok FROM toks
            ), tf AS (
                SELECT doc_id, tok, COUNT(*) AS c FROM ex
                WHERE tok IN ('hash', 'merge', 'scan', 'table')
                GROUP BY doc_id, tok
            ), dl AS (
                SELECT doc_id, COUNT(*) AS dl FROM ex GROUP BY doc_id
            ), stats AS (
                SELECT (SELECT COUNT(*) FROM documents) AS n,
                       (SELECT COUNT(*) FROM ex) AS tot
            ), df AS (
                SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
            ), sc AS (
                SELECT tf.doc_id,
                       CAST(floor(
                           ln(1.0 + ((s.n - df.df) + 0.5) / (df.df + 0.5))
                           * ((tf.c * 2.5) /
                              (tf.c + 1.5 * (0.25 + 0.75 *
                                  (dl.dl / (s.tot / CAST(s.n AS DOUBLE))))))
                           * 1000000.0 + 0.5) AS BIGINT) AS e6
                FROM tf
                JOIN dl ON dl.doc_id = tf.doc_id
                JOIN df ON df.tok = tf.tok
                CROSS JOIN stats s
            )
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_terms,
                   CAST(SUM(e6) AS BIGINT) AS score_e6
            FROM sc GROUP BY doc_id
            ORDER BY score_e6 DESC, doc_id
            LIMIT 20
        """,
        "key_skew": """
            WITH per_key AS (
                SELECT user_id % 64 AS bucket, user_id AS key,
                       COUNT(*) AS c
                FROM events GROUP BY 1, 2
            ), mx AS (
                SELECT bucket, MAX(c) AS max_key_rows FROM per_key
                GROUP BY bucket
            )
            SELECT p.bucket,
                   CAST(SUM(p.c) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) AS BIGINT) AS n_keys,
                   CAST(m.max_key_rows AS BIGINT) AS max_key_rows,
                   CAST(MIN(CASE WHEN p.c = m.max_key_rows THEN p.key END)
                        AS BIGINT) AS top_key
            FROM per_key p JOIN mx m ON m.bucket = p.bucket
            GROUP BY p.bucket, m.max_key_rows
        """,
        "anchor_index": """
            -- build the same deterministic 3-link HTML wrapper, parse it
            -- with the same regex the engine uses, aggregate per target
            WITH toks AS (
                SELECT doc_id, list_filter(string_split(text, ' '),
                                           x -> x <> '') AS tk
                FROM documents
            ), h AS (
                SELECT doc_id,
                       '<html><body>'
                       || '<a class="l0" href="http://h'
                       || (doc_id * 7 + 0) % 200 || '.example/p'
                       || (doc_id * 13 + 0) % 50 || '">'
                       || tk[(0 % len(tk)) + 1] || ' <b>'
                       || tk[(1 % len(tk)) + 1] || '</b></a>'
                       || '<a class="l1" href="http://h'
                       || (doc_id * 7 + 1) % 200 || '.example/p'
                       || (doc_id * 13 + 5) % 50 || '">'
                       || tk[(3 % len(tk)) + 1] || ' <b>'
                       || tk[(4 % len(tk)) + 1] || '</b></a>'
                       || '<a class="l2" href="http://h'
                       || (doc_id * 7 + 2) % 200 || '.example/p'
                       || (doc_id * 13 + 10) % 50 || '">'
                       || tk[(6 % len(tk)) + 1] || ' <b>'
                       || tk[(7 % len(tk)) + 1] || '</b></a>'
                       || '</body></html>' AS html
                FROM toks WHERE len(tk) > 0
            ), ex AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(html,
                           '<a\\s[^>]*href="([^"]*)"[^>]*>(.*?)</a\\s*>',
                           1, 'is')) AS href,
                       unnest(regexp_extract_all(html,
                           '<a\\s[^>]*href="([^"]*)"[^>]*>(.*?)</a\\s*>',
                           2, 'is')) AS raw
                FROM h
            ), an AS (
                SELECT doc_id, href,
                       trim(regexp_replace(regexp_replace(lower(raw),
                           '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g')) AS anchor
                FROM ex WHERE href <> ''
            ), cnt AS (
                SELECT href, anchor, COUNT(*) AS c
                FROM an GROUP BY href, anchor
            ), top AS (
                SELECT href, anchor,
                       row_number() OVER (PARTITION BY href
                                          ORDER BY c DESC, anchor) AS rn
                FROM cnt
            )
            SELECT a.href,
                   COUNT(*) AS n_links,
                   CAST(COUNT(DISTINCT a.doc_id) AS BIGINT) AS n_src_docs,
                   any_value(t.anchor) AS top_anchor
            FROM an a JOIN top t ON t.href = a.href AND t.rn = 1
            GROUP BY a.href
        """,
        "corpus_shuffle": """
            WITH s AS (
                SELECT doc_id,
                       sha256(CAST(doc_id AS VARCHAR) || '-42') AS h
                FROM documents
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(('0x' || substr(h, 1, 8)) AS BIGINT) % 16
                       AS shard_id,
                   CAST(row_number() OVER (
                       PARTITION BY CAST(('0x' || substr(h, 1, 8))
                                         AS BIGINT) % 16
                       ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
            FROM s ORDER BY doc_id
        """,
        # champion lists: space-split tokenization shared with
        # doc_token_counts (string_split + empty filter)
        "inverted_index": """
            WITH tok AS (
                SELECT doc_id,
                       unnest(list_filter(string_split(coalesce(text, ''),
                                                       ' '),
                                          x -> x <> '')) AS tok
                FROM documents
            ), tf AS (
                SELECT tok, doc_id, CAST(count(*) AS BIGINT) AS c
                FROM tok GROUP BY tok, doc_id
            ), r AS (
                SELECT tok, doc_id,
                       row_number() OVER (PARTITION BY tok
                                          ORDER BY c DESC, doc_id) AS rn,
                       count(*) OVER (PARTITION BY tok) AS df
                FROM tf
            )
            SELECT tok, CAST(df AS BIGINT) AS df,
                   string_agg(CAST(doc_id AS VARCHAR), ','
                              ORDER BY rn) AS champions
            FROM r WHERE rn <= 20 GROUP BY tok, df ORDER BY tok
        """,
        "dedup_keep_best": _dedup_keep_best_sql(),
        # NB twin: identical model arithmetic (int -> double divisions,
        # -ln, e6 floor) and int sums; outer sums CAST to BIGINT (DuckDB
        # SUM(BIGINT) is HUGEINT -- the dtype-hash bug class)
        "nb_classify": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(list_filter(string_split(coalesce(text, ''),
                                                       ' '),
                                          x -> x <> '')) AS tok
                FROM documents
            ), docsrc AS (
                SELECT doc_id, source FROM documents
            ), cls AS (
                SELECT source AS cls, CAST(count(*) AS BIGINT) AS n_docs
                FROM documents GROUP BY source
            ), tot_docs AS (
                SELECT CAST(count(*) AS BIGINT) AS n FROM documents
            ), ctc AS (
                SELECT d.source AS cls, t.tok,
                       CAST(count(*) AS BIGINT) AS c
                FROM toks t JOIN docsrc d USING (doc_id)
                GROUP BY d.source, t.tok
            ), ctot AS (
                SELECT cls, CAST(sum(c) AS BIGINT) AS tot
                FROM ctc GROUP BY cls
            ), vocab AS (
                SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM toks
            ), lp AS (
                SELECT g.cls, g.tok,
                       CAST(floor(-ln((coalesce(ctc.c, 0) + 1)
                                      / CAST(ctot.tot + vocab.v AS DOUBLE))
                                  * 1000000.0 + 0.5) AS BIGINT) AS lp_e6
                FROM (SELECT c.cls, vt.tok
                      FROM (SELECT DISTINCT tok FROM toks) vt
                      CROSS JOIN cls c) g
                JOIN ctot ON ctot.cls = g.cls
                CROSS JOIN vocab
                LEFT JOIN ctc ON ctc.cls = g.cls AND ctc.tok = g.tok
            ), prior AS (
                SELECT cls,
                       CAST(floor(-ln(n_docs /
                                      CAST((SELECT n FROM tot_docs)
                                           AS DOUBLE))
                                  * 1000000.0 + 0.5) AS BIGINT) AS prior_e6
                FROM cls
            ), score AS (
                SELECT t.doc_id, l.cls,
                       p.prior_e6 + CAST(sum(l.lp_e6) AS BIGINT) AS s
                FROM toks t
                JOIN lp l ON l.tok = t.tok
                JOIN prior p ON p.cls = l.cls
                GROUP BY t.doc_id, l.cls, p.prior_e6
            ), best AS (
                SELECT doc_id, cls AS pred_source, s AS score_e6,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY s, cls) AS rn
                FROM score
            )
            SELECT CAST(b.doc_id AS BIGINT) AS doc_id,
                   d.source AS true_source, b.pred_source,
                   CAST(b.score_e6 AS BIGINT) AS score_e6
            FROM best b JOIN docsrc d USING (doc_id)
            WHERE rn = 1 ORDER BY doc_id
        """,
        # independent reconstruction of what the WARC parse must recover
        # (same template as sources/warc.synth_html; strlen = BYTE length,
        # sha256 hashes the UTF-8 bytes — both match the engine's bytes)
        "warc_pages": """
            WITH h AS (
                SELECT doc_id,
                       'http://crawl.example.com/doc/'
                           || CAST(doc_id AS VARCHAR) AS url,
                       '<html><head><title>doc' || CAST(doc_id AS VARCHAR)
                           || '</title></head><body>'
                           || CASE WHEN doc_id % 5 = 0
                              THEN chr(13) || chr(10) || chr(13) || chr(10)
                              ELSE ' ' END
                           || '<p>' || coalesce(text, '')
                           || '</p></body></html>' AS html
                FROM documents
            )
            SELECT url,
                   CAST((1700000000 + doc_id) * 1000000 AS BIGINT) AS ts_us,
                   CAST(strlen(html) AS BIGINT) AS n_bytes,
                   sha256(html) AS html_sha
            FROM h ORDER BY url
        """,
        "pagerank": _pagerank_sql(),
        "hits_scores": _hits_sql(),
        "cocitation": """
            -- explicit edge self-join twin of the formula-emit engine
            WITH nn AS (SELECT COUNT(*) AS c FROM documents),
            e AS (
                SELECT doc_id AS src,
                       (doc_id * 7 + k) % (SELECT c FROM nn) AS dst
                FROM documents, UNNEST([1, 2, 3]) AS t(k)
            )
            SELECT e1.src AS page_a, e2.src AS page_b,
                   CAST(COUNT(*) AS BIGINT) AS shared
            FROM e e1 JOIN e e2 ON e1.dst = e2.dst AND e1.src < e2.src
            GROUP BY e1.src, e2.src
            HAVING COUNT(*) >= 2
        """,
        "domain_blocklist": _domain_blocklist_sql(),
        "domain_stats": _domain_stats_sql(),
        "robots_filter": f"""
            -- same decisions from the rule formulas: /p7 disallowed
            -- everywhere; K%3==0 hosts disallow /p1* except the longer
            -- Allow /p12 wins; everything else allowed
            SELECT doc_id,
                   {_host_expr_sql()} AS host,
                   '/p' || CAST(doc_id % 23 AS VARCHAR) AS path,
                   CAST(CASE
                        WHEN doc_id % 23 = 7 THEN 0
                        WHEN (doc_id % 37) % 3 = 0
                             AND (doc_id % 23 = 1
                                  OR doc_id % 23 BETWEEN 10 AND 19)
                        THEN CASE WHEN doc_id % 23 = 12 THEN 1 ELSE 0 END
                        ELSE 1 END AS BIGINT) AS allowed
            FROM documents
        """,
        "crawl_schedule": f"""
            WITH f AS (
                SELECT doc_id, {_host_expr_sql()} AS host FROM documents
            ), r AS (
                SELECT doc_id, host,
                       row_number() OVER (PARTITION BY host
                                          ORDER BY doc_id) - 1 AS rk
                FROM f
            )
            SELECT doc_id, host,
                   CAST(rk // 4 AS BIGINT) AS fetch_round,
                   CAST(rk % 4 AS BIGINT) AS slot
            FROM r
        """,
        # ANY-prior-within-window == immediately-preceding-within-window,
        # so the twin is a plain LAG over the key order
        "event_window_dedup": """
            SELECT CAST(event_id AS BIGINT) AS event_id,
                   CAST(CASE WHEN prev_ts IS NOT NULL
                             AND epoch_us(ts) - prev_ts <= 600000000
                        THEN 1 ELSE 0 END AS BIGINT) AS is_dup
            FROM (SELECT event_id, ts,
                         LAG(epoch_us(ts)) OVER (
                             PARTITION BY user_id, event_type
                             ORDER BY ts, event_id) AS prev_ts
                  FROM events)
            ORDER BY event_id
        """,
    }
