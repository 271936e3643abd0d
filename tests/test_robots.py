"""robots.txt parser + longest-match decision oracles (pure in-process;
the distributed twin is robots_filter in tests/test_query_oracles.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pcompress_ray.stages.robots import decide, parse_robots, rules_table


def test_parse_sections_comments_and_merge():
    txt = """
# header comment
User-agent: evilbot
Disallow: /

User-agent: *
Disallow: /private   # trailing comment
Allow: /private/ok

User-agent: other
User-agent: *
Disallow: /tmp
Disallow:
"""
    rules = parse_robots(txt)
    # only * groups kept, both groups merged, empty Disallow dropped
    assert rules == [("disallow", "/private"), ("allow", "/private/ok"),
                     ("disallow", "/tmp")]


def test_parse_consecutive_agents_and_no_star():
    assert parse_robots("User-agent: a\nUser-agent: *\nDisallow: /x") == \
        [("disallow", "/x")]
    assert parse_robots("User-agent: bot\nDisallow: /x") == []
    assert parse_robots("") == []


def _decisions(paths, txt, host="h"):
    rules = rules_table({host: txt})
    df = pd.DataFrame({"host": [host] * len(paths), "path": paths})
    return decide(df, rules).tolist()


def test_longest_match_and_tie_breaks():
    txt = ("User-agent: *\n"
           "Disallow: /a\n"
           "Allow: /a/b\n"
           "Disallow: /a/b/c\n"
           "Allow: /z\n"
           "Disallow: /z\n")
    got = _decisions(["/a", "/a/x", "/a/b", "/a/b/q", "/a/b/c", "/a/b/cd",
                      "/z", "/other"], txt)
    #   /a, /a/x        -> disallow (/a)
    #   /a/b, /a/b/q    -> allow (/a/b longer)
    #   /a/b/c, /a/b/cd -> disallow (/a/b/c longest)
    #   /z              -> equal-length allow+disallow: allow wins
    #   /other          -> no rule: allowed
    assert got == [False, False, True, True, False, False, True, True]


def test_decide_multi_host_and_ruleless_host():
    rules = rules_table({"a": "User-agent: *\nDisallow: /x",
                         "b": "User-agent: *\nAllow: /x"})
    df = pd.DataFrame({"host": ["a", "b", "c", "a"],
                       "path": ["/x1", "/x1", "/x1", "/y"]})
    assert decide(df, rules).tolist() == [False, True, True, True]


def test_matches_bruteforce_on_random_rules():
    rng = np.random.default_rng(21)
    prefixes = ["/a", "/a/b", "/ab", "/c", "/c/d/e"]
    for trial in range(20):
        k = int(rng.integers(1, 5))
        chosen = [(("allow", "disallow")[int(rng.integers(0, 2))],
                   prefixes[int(rng.integers(0, len(prefixes)))])
                  for _ in range(k)]
        txt = "User-agent: *\n" + "\n".join(
            f"{d.capitalize()}: {p}" for d, p in chosen)
        paths = ["/a", "/a/b/c", "/ab9", "/c/d/e/f", "/c/x", "/zz"]

        def ref(path):
            best = None  # (plen, allow)
            for d, p in chosen:
                if path.startswith(p):
                    cand = (len(p), d == "allow")
                    if best is None or cand[0] > best[0] or \
                            (cand[0] == best[0] and cand[1] and not best[1]):
                        best = cand
            return True if best is None else best[1]

        got = _decisions(paths, txt)
        assert got == [ref(p) for p in paths], (trial, chosen)
