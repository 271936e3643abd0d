"""robots.txt politeness filter (RFC 9309 subset).

Completes the crawl tier (urlnorm -> domain_blocklist -> robots ->
crawl_schedule): a frontier must drop URLs a host's robots.txt disallows
BEFORE scheduling fetches. Implemented as the standard two-piece design:

- ``parse_robots``: a real robots.txt parser — ``User-agent`` sections,
  ``Allow`` / ``Disallow`` path-prefix rules, comments, blank-line section
  breaks; only the ``*`` agent group is kept (the corpus engine crawls as
  a generic agent). No wildcard/``$`` support (documented subset).
- ``robots_decisions``: vectorized longest-match evaluation — per URL the
  longest matching rule prefix decides, ties broken toward ``allow``
  (RFC 9309 §2.2.2), empty Disallow means allow-all, no matching rule
  means allowed.

Scale shape: the rules table (one row per (host, directive, prefix)) is
small — a few rules per distinct host — so decisions are a broadcast
merge inside map_batches: each batch joins its URLs to its hosts' rules
(row x rules-per-host amplification, bounded), computes startswith on the
aligned arrays, and argmaxes match length per URL. No shuffle at all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def parse_robots(text: str) -> list[tuple[str, str]]:
    """robots.txt -> ordered [(directive, prefix)] for the ``*`` agent.

    Directives are lowercased 'allow' / 'disallow'. A group applies when
    any of its User-agent lines is '*'. Later groups append (RFC 9309
    merges groups for the same agent). Empty-prefix Disallow is DROPPED —
    it matches nothing, so dropping it is decision-equivalent to the
    standard allow-all interpretation.
    """
    rules: list[tuple[str, str]] = []
    in_star_group = False
    seen_rule_in_group = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if seen_rule_in_group:
                in_star_group = val == "*"
                seen_rule_in_group = False
            else:
                in_star_group = in_star_group or val == "*"
        elif key in ("allow", "disallow"):
            seen_rule_in_group = True
            if in_star_group and val:
                rules.append((key, val))
    return rules


def rules_table(robots_by_host: dict[str, str]) -> pd.DataFrame:
    """{host: robots.txt text} -> (host, directive, prefix, plen) rows."""
    h, d, p = [], [], []
    for host, txt in sorted(robots_by_host.items()):
        for directive, prefix in parse_robots(txt):
            h.append(host)
            d.append(directive)
            p.append(prefix)
    return pd.DataFrame({
        "host": np.asarray(h, object),
        "directive": np.asarray(d, object),
        "prefix": np.asarray(p, object),
        "plen": np.asarray([len(x) for x in p], np.int64)})


def decide(df: pd.DataFrame, rules: pd.DataFrame) -> np.ndarray:
    """allowed flag per row of (host, path) given a rules_table frame.

    Vectorized: merge URLs x their host's rules (bounded amplification),
    mask to prefix matches, pick the longest match per URL (tie -> allow),
    default allowed when nothing matches.
    """
    if not len(df):
        return np.zeros(0, dtype=bool)
    df = df.reset_index(drop=True)
    df["__row"] = np.arange(len(df), dtype=np.int64)
    m = df.merge(rules, on="host", how="left")
    has_rule = m["prefix"].notna().to_numpy()
    starts = np.zeros(len(m), dtype=bool)
    if has_rule.any():
        # vectorized per UNIQUE prefix (rule sets are small; rows are not):
        # one str.startswith scan per distinct prefix instead of a Python
        # call per (row, rule)
        paths = m["path"].astype(str)
        prefixes = m["prefix"]
        for pfx in prefixes.dropna().unique():
            sel = (prefixes == pfx).to_numpy()
            starts[sel] = paths[sel].str.startswith(pfx).to_numpy()
    # rank matches: longer prefix wins; equal length -> allow wins
    plen = np.where(starts, m["plen"].fillna(0).to_numpy(np.int64), -1)
    is_allow = (m["directive"] == "allow").to_numpy()
    rank = plen * 2 + np.where(is_allow, 1, 0)
    rows = m["__row"].to_numpy(np.int64)
    best = np.full(len(df), -1, np.int64)
    np.maximum.at(best, rows, rank)
    decision_allow = np.ones(len(df), dtype=bool)
    matched = best >= 0
    decision_allow[matched] = (best[matched] & 1).astype(bool)
    # best == -1 means no matching rule -> allowed; best even -> disallow
    decision_allow[best == -1] = True
    return decision_allow
