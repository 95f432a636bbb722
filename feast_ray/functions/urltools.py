"""URL canonicalization — the standard web-dedup preprocessing step.

Two pages that differ only in tracking parameters, host case, a
default port, a fragment, or query-parameter order are the same
resource; URL-keyed dedup (``keep_latest`` on ``url``) under-merges
without canonicalizing first. Reference analog: none (Feast has no
URL ops) — this belongs to the web-text operator surface the engine
adds (SURVEY.md §2 extension, same tier as langid/scrub).

Canonical form (deterministic, SQL-reproducible — the q52 oracle
recomputes it in DuckDB):

1. drop the fragment (everything from the first ``#``);
2. lowercase the scheme and the host (never the path/query);
3. drop a default port (``:80`` for http, ``:443`` for https);
4. split the query (after the first ``?``) on ``&``, drop tracking
   parameters (``utm_*``, ``gclid``, ``fbclid``, ``msclkid``,
   ``mc_cid``, ``mc_eid``), sort the survivors bytewise, rejoin;
   drop the ``?`` when nothing survives.

Vectorized end to end: pandas C-backed ``.str`` regex kernels for
1-3, split→explode→mask→sort→groupby-join for the parameter step —
no per-row Python in the batch path.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

TRACKING_PARAM_RE = r"^(?:utm_[a-z0-9_]+|gclid|fbclid|msclkid|mc_cid|mc_eid)="

_SCHEME_HOST_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)(.*)$"


def canonicalize_url_series(s: pd.Series) -> pd.Series:
    """Vectorized canonicalization of a string Series (see module
    docstring for the exact rules)."""
    s = s.astype("string").fillna("").reset_index(drop=True)
    # 1. fragment off
    s = s.str.partition("#")[0]
    # 2-3. scheme/host lowercase + default-port drop
    parts = s.str.extract(_SCHEME_HOST_RE)
    scheme, host, rest = (
        parts[0].str.lower(),
        parts[1].str.lower(),
        parts[2].fillna(""),
    )
    host = host.mask(scheme == "http", host.str.replace(r":80$", "", regex=True))
    host = host.mask(scheme == "https", host.str.replace(r":443$", "", regex=True))
    rebuilt = (scheme + "://" + host + rest).where(parts[0].notna(), s)
    # 4. query parameters
    split = rebuilt.str.partition("?")
    base, qmark, query = split[0], split[1], split[2]
    out = base.copy()
    qidx = query.index[qmark == "?"]
    if len(qidx):
        exploded = query.loc[qidx].str.split("&").explode()
        exploded = exploded[
            ~exploded.str.contains(TRACKING_PARAM_RE, regex=True, na=False)
        ]
        ef = exploded.rename("p").reset_index()
        ef = ef.sort_values(["index", "p"], kind="stable")
        joined = ef.groupby("index", sort=False)["p"].agg("&".join)
        joined = joined[joined.str.len() > 0]
        out.loc[joined.index] = base.loc[joined.index] + "?" + joined
    return out


def canonicalize_urls(
    ds: ray.data.Dataset, url_col: str = "url", out_col: str | None = None
) -> ray.data.Dataset:
    """Add (or replace) the canonical-URL column on a Dataset."""
    out = out_col or url_col

    def _canon(tbl: pa.Table) -> pa.Table:
        vals = pa.array(
            canonicalize_url_series(tbl[url_col].to_pandas()).astype(object),
            pa.string(),
        )
        if out in tbl.column_names:
            return tbl.set_column(tbl.schema.get_field_index(out), out, vals)
        return tbl.append_column(out, vals)

    return ds.map_batches(_canon, batch_format="pyarrow")


def extract_host_series(s: pd.Series) -> pd.Series:
    """Registrable host of each URL: the authority between ``://`` and
    the first ``/?#``, userinfo and port stripped, lowercased; ''
    when the URL has no authority. The exact rule the q66 oracle
    restates in SQL."""
    hostport = s.str.extract(r"://([^/?#]+)", expand=False)
    hostport = hostport.str.replace(r"^.*@", "", regex=True)
    hostport = hostport.str.replace(r":[0-9]+$", "", regex=True)
    return hostport.str.lower().fillna("")


def block_domains(
    ds: ray.data.Dataset,
    blocked: "list[str]",
    url_col: str = "url",
    *,
    mode: str = "drop",
    flag_col: str = "blocked",
) -> ray.data.Dataset:
    """Domain-blocklist filter (the RefinedWeb/Dolma URL hygiene
    step): a row is blocked when its host EQUALS a blocked domain or
    is a subdomain of one (label-boundary suffix match — ``x.dom.com``
    blocks, ``xdom.com`` does not).

    Scale: the blocklist (typically 10^5-10^7 domains) broadcasts once
    via ``ray.put``; the probe strips one label per iteration (a
    vectorized pandas pass per DEPTH, never per row) and checks
    membership against the hashed set — no shuffle, streams.
    ``mode="drop"`` filters; ``mode="annotate"`` appends ``flag_col``.
    """
    import ray as _ray

    ref = _ray.put(frozenset(d.lower() for d in blocked))

    def _probe(tbl: pa.Table) -> pa.Table:
        bset = _ray.get(ref)
        host = extract_host_series(tbl[url_col].to_pandas())
        hit = host.isin(bset)
        suf = host
        while True:  # one pass per label DEPTH; unbounded like the
            # documented suffix rule (no cap an adversarial deep
            # subdomain could hide behind)
            suf = suf.str.split(".", n=1).str[1]
            if not suf.notna().any():
                break
            hit |= suf.fillna("").isin(bset)
        blocked_arr = hit.to_numpy(dtype=bool)
        if mode == "annotate":
            return tbl.append_column(flag_col, pa.array(blocked_arr))
        return tbl.filter(pa.array(~blocked_arr))

    return ds.map_batches(_probe, batch_format="pyarrow")


# --- registrable domain (public-suffix longest match) ----------------

# A deterministic sample of the Mozilla Public Suffix List shapes the
# engine exercises: plain TLDs, a two-label country suffix pair where
# the one-label parent is ALSO a suffix ("uk" vs "co.uk" — longest
# match must win), and a private-registry entry ("github.io") whose
# registrable domains are user sites. The real PSL (~10k rules) drops
# in unchanged: the matcher is generic over the set.
DEFAULT_PUBLIC_SUFFIXES = (
    "com", "org", "net", "gov", "uk", "co.uk", "ac.uk", "com.au",
    "github.io",
)


def registrable_domain_series(
    host: pd.Series,
    suffixes: tuple[str, ...] | list[str] = DEFAULT_PUBLIC_SUFFIXES,
) -> pd.Series:
    """eTLD+1 extraction: the registrable domain is the matched
    public suffix plus exactly one preceding label; the LONGEST
    listed suffix that sits on a label boundary wins (PSL semantics).
    Hosts with no listed suffix yield <NA>; a host EQUAL to its
    longest matching suffix (e.g. ``co.uk`` itself) is a public
    suffix, not a registrable domain — also <NA>, and a shorter
    listed suffix (``uk``) must NOT rescue it.

    Vectorized: one C-backed ``.str.endswith`` pass per DISTINCT
    suffix DEPTH group (not per suffix — suffixes of equal label
    count are probed via a hash ``isin`` on the host's k-label tail),
    so the real 10k-rule PSL costs ~5 passes, not 10k."""
    host = host.astype("string").str.lower()
    by_depth: dict[int, set[str]] = {}
    for s in suffixes:
        by_depth.setdefault(s.count(".") + 1, set()).add(s.lower())
    maxk = max(by_depth)
    # tail_k = last k labels of each host, built incrementally from
    # the right (tail_1 = last label, tail_k = label + "." + tail_{k-1});
    # rsplit keeps any deeper prefix joined in element 0, so every
    # indexed element below is a single label.
    parts = host.str.rsplit(".", n=maxk + 1)
    out = pd.Series(pd.NA, index=host.index, dtype="string")
    tail = pd.Series(pd.NA, index=host.index, dtype="string")
    nlab = host.str.count(r"\.") + 1
    for k in range(1, maxk + 1):
        piece = parts.str[-k]
        tail = piece if k == 1 else piece + "." + tail
        if k not in by_depth:
            continue
        # increasing k = longer suffix, so later masks overwrite:
        # longest match wins by loop order
        ok = tail.isin(by_depth[k])
        out = out.mask(ok & (nlab > k), parts.str[-(k + 1)] + "." + tail)
        # host == the suffix: it IS a public suffix — clobber any
        # shorter match (PSL longest-match, not first-usable-match)
        out = out.mask(ok & (nlab == k), pd.NA)
    return out
