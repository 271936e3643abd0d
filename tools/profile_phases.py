"""Phase-scaling profiler: run the headline dedup pipeline once (after a
full-width warm-up) at a given CPU count with per-phase timing, printing one
JSON line {"num_cpus": N, "total_sec": T, "phase_sec": {...}}.

Usage: python tools/profile_phases.py <num_cpus> [n_docs]
Compare phase_sec between 4 and 16 CPUs to attribute the non-scaling time
(the f in T(c) = f + W/c) to specific phases.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ncpu = int(sys.argv[1])
    ndocs = int(sys.argv[2]) if len(sys.argv) > 2 else 480000

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pcompress_ray

    pcompress_ray.register_for_ray()
    from pcompress_ray.config import PipelineConfig
    from pcompress_ray.pipelines.dedup import dedup_pipeline
    from pcompress_ray.sources.corpus import read_bench_corpus, write_bench_corpus

    corpus = f"/tmp/pcompress_ray_bench/pages_{ndocs}"
    write_bench_corpus(corpus, ndocs)
    cfg = PipelineConfig(sig_concurrency=max(2, ncpu // 2))
    warm_docs = min(ndocs, max(8000, 1000 * ncpu))
    warm = read_bench_corpus(corpus).limit(warm_docs)
    dedup_pipeline(warm, cfg, compute_pairs=False).clusters.count()

    pages = read_bench_corpus(corpus)
    t0 = time.time()
    res = dedup_pipeline(pages, cfg, compute_pairs=False)
    res.clusters.count()
    total = time.time() - t0
    ray.shutdown()
    print(json.dumps({"num_cpus": ncpu, "n_docs": ndocs,
                      "total_sec": round(total, 2),
                      "phase_sec": res.metrics["phase_sec"]}))


if __name__ == "__main__":
    main()
