"""Mirror-domain detection: planted mirrors must rank first with exact
integer Jaccard; ubiquitous keys are capped out (stages/mirror.py)."""

import numpy as np
import pyarrow as pa


def _run(rows, cap=8, min_jaccard_e6=0):
    import ray.data as rd

    import pcompress_ray

    pcompress_ray.register_for_ray()
    from pcompress_ray.stages.mirror import mirror_domain_pairs

    ds = rd.from_arrow(pa.table({
        "domain": pa.array([r[0] for r in rows], pa.string()),
        "key": pa.array([r[1] for r in rows], pa.string())}))
    out = mirror_domain_pairs(ds.repartition(3), "domain", "key", cap=cap,
                              min_jaccard_e6=min_jaccard_e6).to_pandas()
    return out.sort_values(["domain_a", "domain_b"]).reset_index(drop=True)


def test_planted_mirror(ray_session):
    # m1/m2 share 3 of their 4 keys (J = 3/5); x is disjoint
    rows = [("m1.com", k) for k in ["a", "b", "c", "d"]] \
         + [("m2.com", k) for k in ["a", "b", "c", "e"]] \
         + [("x.com", k) for k in ["p", "q"]]
    out = _run(rows)
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["domain_a"], r["domain_b"]) == ("m1.com", "m2.com")
    assert (r["shared"], r["n_a"], r["n_b"]) == (3, 4, 4)
    assert r["jaccard_e6"] == 3 * 1_000_000 // 5   # 600000, floor-exact


def test_duplicate_rows_are_distinct(ray_session):
    # repeated (domain, key) rows must not inflate counts
    rows = [("m1.com", "a")] * 3 + [("m2.com", "a")] * 2 \
         + [("m1.com", "b"), ("m2.com", "b")]
    out = _run(rows)
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["shared"], r["n_a"], r["n_b"]) == (2, 2, 2)
    assert r["jaccard_e6"] == 1_000_000


def test_cap_excludes_ubiquitous_keys(ray_session):
    # key "boiler" on 5 domains; with cap=4 it contributes NOTHING —
    # neither to pairs nor to sizes
    doms = [f"d{i}.com" for i in range(5)]
    rows = [(d, "boiler") for d in doms] \
         + [("d0.com", "u0"), ("d1.com", "u1")]
    out = _run(rows, cap=4)
    assert len(out) == 0
    assert "domain_a" in out.columns      # typed empty, not schemaless
    # with the cap lifted all C(5,2) pairs appear
    out2 = _run(rows, cap=8)
    assert len(out2) == 10
    pair01 = out2[(out2["domain_a"] == "d0.com")
                  & (out2["domain_b"] == "d1.com")].iloc[0]
    # d0: {boiler, u0}, d1: {boiler, u1} -> J = 1/3
    assert (pair01["shared"], pair01["n_a"], pair01["n_b"]) == (1, 2, 2)
    assert pair01["jaccard_e6"] == 1_000_000 // 3


def test_min_jaccard_filter(ray_session):
    rows = [("m1.com", k) for k in ["a", "b", "c", "d"]] \
         + [("m2.com", k) for k in ["a", "b", "c", "e"]] \
         + [("w.com", "a")]                      # weak 1-key overlap
    out = _run(rows, min_jaccard_e6=500_000)
    assert list(out["domain_a"]) == ["m1.com"]
    assert list(out["domain_b"]) == ["m2.com"]


def test_parallelism_invariance(ray_session):
    import ray.data as rd

    import pcompress_ray

    pcompress_ray.register_for_ray()
    from pcompress_ray.stages.mirror import mirror_domain_pairs

    rng = np.random.default_rng(3)
    rows = [(f"d{int(i)}.com", f"k{int(k)}")
            for i, k in zip(rng.integers(0, 12, 400),
                            rng.integers(0, 60, 400))]
    t = pa.table({"domain": pa.array([r[0] for r in rows], pa.string()),
                  "key": pa.array([r[1] for r in rows], pa.string())})
    outs = []
    for parts in (1, 5):
        ds = rd.from_arrow(t).repartition(parts)
        o = mirror_domain_pairs(ds, "domain", "key", cap=8).to_pandas()
        outs.append(o.sort_values(["domain_a", "domain_b"])
                    .reset_index(drop=True))
    assert outs[0].equals(outs[1])


def test_random_vs_bruteforce(ray_session):
    """Randomized corpora match a 15-line pure-Python oracle exactly."""
    import ray.data as rd

    import pcompress_ray

    pcompress_ray.register_for_ray()
    from pcompress_ray.stages.mirror import mirror_domain_pairs

    rng = np.random.default_rng(11)
    for trial in range(3):
        nd, nk, n = 8, 30, 150
        rows = list(zip((f"d{int(i)}" for i in rng.integers(0, nd, n)),
                        (f"k{int(k)}" for k in rng.integers(0, nk, n))))
        cap = int(rng.integers(2, 6))
        # brute force
        from collections import defaultdict
        keysets = defaultdict(set)
        for d, k in rows:
            keysets[d].add(k)
        dom_count = defaultdict(set)
        for d, k in set(rows):
            dom_count[k].add(d)
        rare = {k for k, ds_ in dom_count.items() if len(ds_) <= cap}
        sets = {d: ks & rare for d, ks in keysets.items()}
        exp = {}
        doms = sorted(sets)
        for i, a in enumerate(doms):
            for b in doms[i + 1:]:
                sh = len(sets[a] & sets[b])
                if sh:
                    exp[(a, b)] = (sh, len(sets[a]), len(sets[b]),
                                   sh * 1_000_000
                                   // (len(sets[a]) + len(sets[b]) - sh))
        ds = rd.from_arrow(pa.table({
            "domain": pa.array([r[0] for r in rows], pa.string()),
            "key": pa.array([r[1] for r in rows], pa.string())}))
        out = mirror_domain_pairs(ds.repartition(4), "domain", "key",
                                  cap=cap)
        out = out.to_pandas() if hasattr(out, "to_pandas") else out
        got = {(r.domain_a, r.domain_b):
               (r.shared, r.n_a, r.n_b, r.jaccard_e6)
               for r in out.itertuples()}
        assert got == exp, f"trial {trial} cap {cap}"
