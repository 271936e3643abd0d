"""CLI entry points — `ray job submit`-compatible (SURVEY §2.10, north rule).

    python -m pcompress_ray.cli dedup --input /data/pages --output /out \
        [--checkpoint-dir /ck] [--locality-sort] [--pairs] [--num-cpus N]

    ray job submit --working-dir . -- python -m pcompress_ray.cli dedup ...

The input is a Parquet directory/file with columns (url, text[, html, lang,
warc_ts]); a dense ``rank`` ordering column is derived from url sort order
if absent. Outputs: clusters/ + dup_pairs/ partitioned Parquet,
lineage.parquet, metrics.json (see pipelines.dedup.write_outputs).

This module OWNS its Ray session (guarded init — under `ray job submit` or
an existing cluster it attaches instead of starting one).
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False}
        if num_cpus:
            kwargs.update(address="local", num_cpus=num_cpus)
        ray.init(**kwargs)
    import pcompress_ray

    pcompress_ray.register_for_ray()


def _ensure_rank(ds):
    """Derive the dense url-ordered rank column when the input lacks one."""
    if "rank" in ds.schema().names:
        return ds
    from pcompress_ray.functions.ops import zip_with_rank

    return zip_with_rank(ds, "url")


def cmd_dedup(args) -> int:
    import ray.data as rd

    from pcompress_ray.config import PipelineConfig
    from pcompress_ray.pipelines.dedup import dedup_pipeline, write_outputs

    _init_ray(args.num_cpus)
    cfg = PipelineConfig(locality_sort=args.locality_sort)
    pages = _ensure_rank(rd.read_parquet(args.input))
    if getattr(args, "increment", False):
        from pcompress_ray.pipelines.incremental import (
            dedup_increment_from_checkpoint)

        if not args.checkpoint_dir:
            raise SystemExit("--increment requires --checkpoint-dir")
        res = dedup_increment_from_checkpoint(args.checkpoint_dir, pages, cfg,
                                              compute_pairs=args.pairs)
    else:
        res = dedup_pipeline(pages, cfg, checkpoint_dir=args.checkpoint_dir,
                             compute_pairs=args.pairs)
    out = write_outputs(res, args.output)
    print(json.dumps({"output": out, **res.metrics}))
    return 0


def cmd_analyze(args) -> int:
    """Content-type + text stats over a documents/pages Parquet table."""
    import ray.data as rd

    from pcompress_ray.stages.textstats import content_type_batch, doc_stats_batch

    _init_ray(args.num_cpus)
    ds = rd.read_parquet(args.input)
    if "doc_id" not in ds.schema().names:
        import pyarrow as pa

        def add_id(t: pa.Table) -> pa.Table:
            import numpy as np
            t = t.replace_schema_metadata(None)
            return t.append_column(
                "doc_id", pa.array(np.arange(len(t), dtype=np.int64)))

        ds = ds.map_batches(add_id, batch_format="pyarrow")
    stats = ds.map_batches(doc_stats_batch, batch_format="pandas")
    ctypes = ds.map_batches(content_type_batch, batch_format="pandas")
    stats.write_parquet(args.output + "/doc_stats")
    ctypes.write_parquet(args.output + "/content_types")
    print(json.dumps({"output": args.output, "n_docs": stats.count()}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="pcompress_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dedup", help="near-dup detection + clustering")
    d.add_argument("--input", required=True)
    d.add_argument("--output", required=True)
    d.add_argument("--checkpoint-dir", default=None)
    d.add_argument("--locality-sort", action="store_true")
    d.add_argument("--pairs", action="store_true",
                   help="also emit the url-pair table")
    d.add_argument("--increment", action="store_true",
                   help="fold --input as NEW docs into the run checkpointed "
                        "at --checkpoint-dir (incremental dedup)")
    d.add_argument("--num-cpus", type=int, default=None)
    d.set_defaults(fn=cmd_dedup)

    a = sub.add_parser("analyze", help="content-type + text stats")
    a.add_argument("--input", required=True)
    a.add_argument("--output", required=True)
    a.add_argument("--num-cpus", type=int, default=None)
    a.set_defaults(fn=cmd_analyze)

    args = p.parse_args(argv)
    rc = args.fn(args)
    import ray

    if ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
