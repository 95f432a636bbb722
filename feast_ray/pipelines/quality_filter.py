"""The flagship pipeline: web-text quality filter.

Recasts the reference's materialization loop (feature_store.py:2788,
compute_engines/base.py:113 → Source→Transform→Filter→Dedup→Validate→
Output, feature_builder.py:81-142) as per-document feature computation
per the north rule:

    read pages → validate → extract (html→text, byte-stable) →
    drop html payload → dedup latest crawl per url →
    textstats (vectorized Arrow) → langid (actor pool) →
    perplexity (actor pool) → decide keep/drop →
    scrub kept text (actor pool) → output

Everything is one lazy Ray Dataset chain (the reference's DerivedRead
chaining, ray/nodes.py:769-834, without the disk round-trip). Scale
notes inline; the fat ``html`` column is dropped immediately after
extraction so the shuffle (url dedup) never carries it twice.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from feast_ray.functions.extract import EXTRACTOR_VERSION, extract_batch
from feast_ray.functions.langid import LangIdModel
from feast_ray.functions.perplexity import PerplexityModel
from feast_ray.functions.scrub import Scrubber
from feast_ray.functions.textstats import (
    MAX_DUP_2GRAM_FRAC,
    add_repetition_stats,
    apply_quality_rules,
    compute_textstats,
)
from feast_ray.schema import WEBPAGE_SCHEMA, Schema
from feast_ray.stages.aggregate import AggSpec, grouped_agg
from feast_ray.stages.dedup import keep_latest
from feast_ray.stages.validate import validate_stage

# additional (non-SQL) rules on top of textstats' heuristic set
MAX_PPL = 160.0          # byte-trigram perplexity vs seed corpus
MIN_LANG_CONF = 0.0      # lang rule: drop only 'und' by default

OUTPUT_SCHEMA = Schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("lang_pred", pa.string()),
        ("lang_conf", pa.float64()),
        ("n_chars", pa.int64()),
        ("n_words", pa.int64()),
        ("mean_word_len", pa.float64()),
        ("digit_frac", pa.float64()),
        ("symbol_frac", pa.float64()),
        ("stop_count", pa.int64()),
        ("dup_2gram_frac", pa.float64()),
        ("ppl", pa.float64()),
        ("keep", pa.bool_()),
        ("drop_reason", pa.string()),
        ("text_scrubbed", pa.string()),
    ]
)


def domain_of(urls: "pa.ChunkedArray | pa.Array"):
    """Vectorized url → domain (for per-domain metrics / salting)."""
    stripped = pc.replace_substring_regex(urls, r"^https?://", "")
    return pc.replace_substring_regex(stripped, r"/.*$", "")


def _model_rules(tbl: pa.Table) -> pa.Table:
    """Fold the model-based rules (perplexity, language, repetition)
    into keep/drop_reason, after the heuristic rules. Priority:
    heuristic reasons stay; then 'lang_unknown'; then
    'high_perplexity'; then 'repetition' (Gopher dup-2gram rule)."""
    reason = tbl["drop_reason"]
    lang_bad = pc.or_(
        pc.equal(tbl["lang_pred"], "und"),
        pc.less(tbl["lang_conf"], MIN_LANG_CONF),
    )
    ppl_bad = pc.greater(tbl["ppl"], MAX_PPL)
    rep_bad = pc.greater(tbl["dup_2gram_frac"], MAX_DUP_2GRAM_FRAC)
    reason = pc.if_else(
        pc.is_null(reason),
        pc.if_else(
            lang_bad,
            pa.scalar("lang_unknown"),
            pc.if_else(
                ppl_bad,
                pa.scalar("high_perplexity"),
                pc.if_else(
                    rep_bad, pa.scalar("repetition"), pa.nulls(len(tbl), pa.string())
                ),
            ),
        ),
        reason,
    )
    keep = pc.is_null(reason)
    tbl = tbl.set_column(tbl.schema.get_field_index("keep"), "keep", keep)
    tbl = tbl.set_column(tbl.schema.get_field_index("drop_reason"), "drop_reason", reason)
    return tbl


class QualityScorer:
    """One actor-pool stage fusing every per-row model step: text
    stats → langid → perplexity → rules → scrub. They have no shuffle
    between them, so fusing removes three pool hand-offs and lets a
    single pool own all CPUs (the reference materializes per-view
    chains the same way — one worker pass per row set, ray/nodes.py
    Transform→Filter fusion via lazy Datasets)."""

    def __init__(self, text_col: str = "extracted_text"):
        self.text_col = text_col
        self.langid = LangIdModel(text_col=text_col)
        self.ppl = PerplexityModel(text_col=text_col)
        self.scrub = Scrubber(text_col=text_col, out_col="text_scrubbed", only_where="keep")

    def __call__(self, tbl: pa.Table) -> pa.Table:
        from feast_ray.functions.textstats import ByteText

        # one byte-classification context shared by the three
        # byte-path stages (buffer view, counts, \w+ runs each
        # computed once per batch, not once per stage)
        ctx = ByteText(tbl[self.text_col])
        tbl = compute_textstats(tbl, self.text_col, ctx=ctx)
        tbl = add_repetition_stats(tbl, self.text_col, ctx=ctx)
        tbl = self.langid(tbl, ctx=ctx)
        tbl = self.ppl(tbl)
        tbl = apply_quality_rules(tbl)
        tbl = _model_rules(tbl)
        return self.scrub(tbl)


# per-worker-process model cache for the stateless-task execution mode:
# Ray reuses worker processes across tasks, so the scorer (regexes,
# dense LM tables) is built once per process — the same amortization an
# actor pool gives, WITHOUT statically reserving CPUs. A fixed actor
# pool held 3/4 of the cluster from pipeline start and capped the
# pre-shuffle read/extract phase at the leftover CPUs (measured ~2-10
# concurrent tasks); elastic tasks let every phase use every CPU.
_SCORER_CACHE: dict = {}


def _scorer_task(tbl: pa.Table, text_col: str = "extracted_text") -> pa.Table:
    scorer = _SCORER_CACHE.get(text_col)
    if scorer is None:
        scorer = _SCORER_CACHE[text_col] = QualityScorer(text_col=text_col)
    return scorer(tbl)


def quality_filter(
    pages: ray.data.Dataset,
    *,
    dedup: bool = True,
    dedup_mode: str = "global",
    dedup_pairs: "ray.data.Dataset | None" = None,
    keep_only: bool = False,
    model_concurrency=None,
    validate_input: bool = True,
) -> ray.data.Dataset:
    """Build the full lazy pipeline over a pages Dataset with schema
    (url, warc_ts, html, text, lang). Returns one row per (deduped)
    url with features, decision and scrubbed text (OUTPUT_SCHEMA).

    ``keep_only=True`` filters to kept docs (the production corpus
    output); the default keeps drop rows too so metrics/F1 can be
    computed downstream from the same stream.

    Dedup mode choice (round-2 measurements, 300k pages, 32 CPUs,
    post-vectorized-extract: global 5.6 s / exchange 6.9 s /
    sketch 13.5 s; 4→16 CPU scaling: global 0.94):
    - ``global`` (DEFAULT): Ray-native streaming groupby shuffle with
      a per-block combiner — backpressured, spillable, no driver
      state, no materialization barrier; the shuffle carries extracted
      text only (html is dropped before it).
    - ``sketch``: barrier-free two-pass dedup whose only shuffle is
      16-byte (hash, ts) pairs — wins when rows stay FAT through the
      dedup point (e.g. 50-100 KB html payloads that can't be dropped
      pre-shuffle); pass A serializes before the main pass, which is
      what costs it the lead on thin rows. Pass ``dedup_pairs`` (a
      column-pruned (url, warc_ts) read — see
      :func:`quality_filter_from_parquet`) so pass A reads megabytes.
    - ``exchange``: raw-Ray bucketed exchange; fastest single-node
      variant in round 1, but it materializes the corpus into the
      object store (a barrier) — kept for thin-row single-node runs.
    """
    ds = pages
    if validate_input:
        ds = validate_stage(ds, WEBPAGE_SCHEMA, strict=False)

    # latest crawl per url — PIT invariant analog (SURVEY.md §2.2).
    # Mode trade-offs are measured and documented in the function
    # docstring above ("global" is the default; "sketch" dedups BEFORE
    # extraction with a 16 B/row pass A — the fat-row mode; "exchange"
    # is the raw-Ray single-node alternative). All modes tested
    # equivalent. ``dedup_pairs``: optionally a column-pruned
    # (url, warc_ts) read of the same source, so sketch's pass A reads
    # megabytes, not the corpus
    if dedup and dedup_mode == "sketch":
        from feast_ray.stages.dedup import keep_latest_sketch

        ds = keep_latest_sketch(ds, "url", "warc_ts", pairs_ds=dedup_pairs)

    # extract, then drop the fat payload column immediately
    ds = ds.map_batches(
        lambda t: extract_batch(t, "html", "extracted_text").drop_columns(["html", "text"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    if dedup and dedup_mode != "sketch":
        import ray as _ray

        ncpu = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
        ds = keep_latest(ds, ["url"], "warc_ts", mode=dedup_mode,
                         num_buckets=max(64, 8 * ncpu))

    # one fused model stage: stats + langid + ppl + rules + scrub
    # (scrub skips dropped rows via only_where="keep"). Stateless tasks
    # + per-worker model cache; pass concurrency to pin an actor pool
    # instead (e.g. when a model is too big for every worker).
    if model_concurrency is not None:
        ds = ds.map_batches(
            QualityScorer,
            fn_constructor_kwargs={"text_col": "extracted_text"},
            batch_format="pyarrow",
            batch_size=2048,
            concurrency=model_concurrency,
        )
    else:
        ds = ds.map_batches(_scorer_task, batch_format="pyarrow", batch_size=2048)

    if keep_only:
        ds = ds.map_batches(
            lambda t: t.filter(t["keep"]), batch_format="pyarrow", zero_copy_batch=True
        )

    def _project(tbl: pa.Table) -> pa.Table:
        cols = {name: tbl[name] for name in OUTPUT_SCHEMA.names if name in tbl.column_names}
        return pa.table(cols)

    return ds.map_batches(_project, batch_format="pyarrow")


def quality_filter_from_parquet(
    pages_path: str,
    *,
    override_num_blocks: int | None = None,
    **kwargs,
) -> ray.data.Dataset:
    """Flagship pipeline over a parquet pages directory with the
    sketch dedup's pass A wired to a COLUMN-PRUNED re-read of the same
    files — (url, warc_ts) only, megabytes per TB of corpus — so the
    pipeline is barrier-free end to end and never reads the fat html
    column twice."""
    kw = {}
    if override_num_blocks is not None:
        kw["override_num_blocks"] = override_num_blocks
    pages = ray.data.read_parquet(pages_path, **kw)
    if kwargs.get("dedup", True) and kwargs.get("dedup_mode") == "sketch":
        kwargs.setdefault(
            "dedup_pairs",
            ray.data.read_parquet(pages_path, columns=["url", "warc_ts"]),
        )
    return quality_filter(pages, **kwargs)


def quality_metrics(result: ray.data.Dataset) -> ray.data.Dataset:
    """Per-(domain, drop_reason) lineage metrics over the pipeline
    output — the reference's monitoring/registry records
    (monitoring_utils.py:24-60) as a grouped aggregate. Two-phase agg
    makes the hot domain cost one partial row per block (skew-safe)."""

    def _add_domain(tbl: pa.Table) -> pa.Table:
        tbl = tbl.append_column("domain", domain_of(tbl["url"]))
        reason = pc.fill_null(tbl["drop_reason"], "kept")
        return tbl.set_column(
            tbl.schema.get_field_index("drop_reason"), "drop_reason", reason
        )

    with_domain = result.map_batches(_add_domain, batch_format="pyarrow")
    return grouped_agg(
        with_domain,
        ["domain", "drop_reason"],
        [
            AggSpec(None, "count", "n_docs"),
            AggSpec("n_words", "sum", "total_words"),
            AggSpec("ppl", "mean", "avg_ppl"),
        ],
    )


PIPELINE_VERSION = f"quality_filter/1.0.0+extractor-{EXTRACTOR_VERSION}"
