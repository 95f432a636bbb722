"""robots.txt (RFC 9309) parsing + URL policy evaluation — the crawl
-politeness gate every Common-Crawl-style corpus passes through before
fetch, recast as a broadcast-rules batch filter.

``parse_robots`` implements the Robots Exclusion Protocol grouping
rules from the RFC: ``User-agent`` lines open a group (consecutive
agent lines share it), ``Allow``/``Disallow`` lines attach to the
open group, comments (``#``) strip anywhere, unknown directives are
ignored, and the group applying to a product token is the one whose
agent token is the LONGEST match (exact token beats ``*``; only when
no group names the agent does the ``*`` group apply). An empty
``Disallow:`` value means allow-all (ignored as a rule).

``robots_filter`` evaluates RFC longest-match semantics per URL: the
matching rule with the most octets in its path wins; on a tie Allow
wins; no match ⇒ allowed. ``*`` (any octets) and ``$`` (end anchor)
wildcards are supported — wildcard rules compile once to regexes;
plain prefix rules stay on the numpy fast path.

Scale shape: the rule set is crawl metadata (small), broadcast once
via ``ray.put`` and read zero-copy in every map task — never
re-shipped per batch; the per-batch evaluation is one vectorized
host equality + prefix probe per RULE over the batch (R small). If R
grows to millions of hosts, partition BOTH sides by host and evaluate
bucket-locally — the documented scale-out path; the broadcast arm is
the common case (a crawl allowlist is ~10⁴ rules).

Reference analog: none in Feast — SURVEY §2.4 web-corpus utility
family (q52 canonicalization, q55 host quotas, q157 eTLD+1 are the
siblings).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

_URL_RX = re.compile(r"^[a-z][a-z0-9+.-]*://([^/?#]*)([^?#]*)")


def parse_robots(text: str, agent: str) -> "list[tuple[bool, str]]":
    """Parse one robots.txt body for ``agent`` (product token, case-
    insensitive): returns [(allow, path_pattern), ...] from the group
    with the longest-matching user-agent token (``*`` only as the
    fallback). Empty-path rules are dropped (allow-all no-ops)."""
    agent = agent.lower()
    groups: "list[tuple[list[str], list[tuple[bool, str]]]]" = []
    open_agents: "list[str]" = []
    cur_rules: "list[tuple[bool, str]] | None" = None
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if cur_rules is not None:
                groups.append((open_agents, cur_rules))
                open_agents, cur_rules = [], None
            open_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            if cur_rules is None:
                if not open_agents:
                    continue  # rule before any user-agent line
                cur_rules = []
            if val:  # empty Allow/Disallow values are allow-all no-ops
                cur_rules.append((key == "allow", val))
    if open_agents:
        groups.append((open_agents, cur_rules or []))

    best_len, best_rules = -1, []
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                if best_len < 0:
                    best_rules = rules
            elif agent.startswith(a) and len(a) > best_len:
                best_len, best_rules = len(a), rules
    return best_rules


def _split_urls(urls: pd.Series) -> "tuple[pd.Series, pd.Series]":
    ext = urls.str.extract(_URL_RX)
    host = ext[0].str.lower().fillna("")
    path = ext[1].fillna("")
    return host, path.mask(path.eq(""), "/")


def compile_rules(
    host_rules: "list[tuple[str, bool, str]]",
) -> "list[tuple[str, bool, int, object]]":
    """(host, allow, path) → (host, allow, octets, matcher) where
    matcher is a plain prefix string or a compiled regex for rules
    containing ``*``/``$`` (RFC wildcard forms)."""
    out = []
    for host, allow, path in host_rules:
        octets = len(path.encode())
        if "*" in path or path.endswith("$"):
            anchored = path.endswith("$")
            body = path[:-1] if anchored else path
            rx = "".join(".*" if ch == "*" else re.escape(ch)
                         for ch in body)
            out.append((host.lower(), allow, octets,
                        re.compile(rx + ("$" if anchored else ""))))
        else:
            out.append((host.lower(), allow, octets, path))
    return out


def robots_filter(
    ds: ray.data.Dataset,
    url_col: str,
    host_rules: "list[tuple[str, bool, str]]",
    *,
    allowed_as: str = "allowed",
    host_as: "str | None" = "host",
) -> ray.data.Dataset:
    """Append ``allowed`` (bool) per row by RFC 9309 longest-match:
    among matching rules for the URL's host, most path octets wins,
    Allow wins ties, no match ⇒ allowed. Rules broadcast once."""
    rules_ref = ray.put(compile_rules(host_rules))

    def _eval(tbl: pa.Table) -> pa.Table:
        rules = ray.get(rules_ref)
        urls = tbl[url_col].to_pandas().astype(str)
        host, path = _split_urls(urls)
        n = len(tbl)
        best_pri = np.full(n, -1, dtype=np.int64)  # octets*2 + allow
        best_allow = np.ones(n, dtype=bool)
        hv = host.to_numpy()
        for r_host, r_allow, octets, matcher in rules:
            hmask = hv == r_host
            if not hmask.any():
                continue
            if isinstance(matcher, str):
                pmask = path.str.startswith(matcher).to_numpy()
            else:
                pmask = path.str.match(matcher).to_numpy()
            pri = octets * 2 + int(r_allow)
            upd = hmask & pmask & (pri > best_pri)
            best_pri[upd] = pri
            best_allow[upd] = r_allow
        out = tbl
        if host_as is not None:
            out = out.append_column(host_as, pa.array(hv))
        return out.append_column(allowed_as, pa.array(best_allow))

    return ds.map_batches(_eval, batch_format="pyarrow")
