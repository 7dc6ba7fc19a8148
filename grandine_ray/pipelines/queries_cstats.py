"""Round-3 corpus-statistics queries: cross-source vocabulary overlap,
stopword ratios, boilerplate-prefix duplicate detection, word-length
distributions, value histograms, and semi-structured (JSON) property
extraction — the corpus-profiling passes a training-data pipeline runs
before filtering decisions.

Scale contract: tokenization is the shared Arrow-kernel pass
(stages/corpus._batch_terms — lowercase + whitespace split, zero Python
loops); every shuffle moves VOCABULARY-sized partials (distinct
(source, term) pairs, per-(lang, len) counts, histogram bins), never
corpus rows. The only quadratic step — source pairs per term in
source_overlap — is bounded by #sources² per term; a web-scale source
domain would cap or MinHash it (documented on the query).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .queries_ext import _np

STOPWORDS = ["the", "a"]
PREFIX_K = 5
HIST_BIN_MILLI = 50_000  # 50.0 value units per bin


def _chunk(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _count_by_key(keys: pa.Array) -> pa.Table:
    """Per-block partial: dictionary-encode a string key array and
    bincount it. Returns (key, n)."""
    enc = pc.dictionary_encode(_chunk(keys))
    codes = _np(enc.indices).astype(np.int64)
    cnt = np.bincount(codes, minlength=len(enc.dictionary))
    return pa.table({"key": enc.dictionary,
                     "n": pa.array(cnt.astype(np.int64), pa.int64())})


def _crc_part(col, P: int) -> pa.Array:
    """Deterministic hash partition of a string column (crc32 —
    Python's hash() is process-salted and would split a key's rows
    across partitions)."""
    import zlib

    h = np.array([zlib.crc32(s.encode()) for s in
                  _chunk(col).to_pylist()], np.int64)
    return pa.array((h % P).astype(np.int32), pa.int32())


def pairs_within_groups(t: pa.Table, group_col: str, item_col: str,
                        sep: str = "\x1f") -> pa.Table:
    """All a<b item pairs within each group of a partition, fully
    vectorized over every group at once (one sort + repeat/offset
    arithmetic — NO per-group Python call; #groups per partition is
    unbounded at scale). Items must be distinct within a group. Returns
    (pair, n=1) rows with pair = a+sep+b in item sort order."""
    order = pc.sort_indices(t, sort_keys=[(group_col, "ascending"),
                                          (item_col, "ascending")])
    ts = t.take(order)
    enc = pc.dictionary_encode(_chunk(ts[group_col]))
    codes = _np(enc.indices).astype(np.int64)
    n = len(codes)
    new = np.ones(n, bool)
    if n:
        new[1:] = codes[1:] != codes[:-1]
    idx = np.arange(n, dtype=np.int64)
    run_start = np.maximum.accumulate(np.where(new, idx, 0))
    starts = np.nonzero(new)[0]
    run_len_per_run = np.r_[starts[1:], n] - starts if n else starts
    run_len = np.repeat(run_len_per_run, run_len_per_run) if n \
        else np.empty(0, np.int64)
    rem = run_len - 1 - (idx - run_start)  # partners after each row
    total = int(rem.sum())
    offs = np.cumsum(rem) - rem
    seq = np.arange(total, dtype=np.int64) - np.repeat(offs, rem)
    left = np.repeat(idx, rem)
    right = left + 1 + seq
    items = _chunk(ts[item_col])
    pair = pc.binary_join_element_wise(
        items.take(pa.array(left)), items.take(pa.array(right)), sep)
    return pa.table({
        "pair": pair,
        "n": pa.array(np.ones(total, np.int64), pa.int64()),
    })


# ------------------------------------- cross-source vocabulary overlap


def q_source_overlap(sf_dir: str):
    """Shared-vocabulary counts for every source pair: |vocab(a) ∩
    vocab(b)|. Stage 1 dedups (source, term) on a fused string key (the
    shuffle is the distinct domain, ≤ sources × vocab); stage 2
    hash-partitions terms and expands each term's source pairs with the
    vectorized pairs_within_groups kernel (C(s,2) per term, no per-term
    Python call — at a web-scale source domain, cap the per-term source
    list or switch to per-source MinHash sketches); stage 3 sums pair
    counts. Exact for bounded source domains."""
    from ray.data.aggregate import Sum
    from ..stages.corpus import _batch_terms

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])

    def st_partial(b: pa.Table) -> pa.Table:
        flat, doc_of, _, _ = _batch_terms(b, "text")
        src_of = _chunk(b["source"]).take(pa.array(doc_of))
        fused = pc.binary_join_element_wise(src_of, flat, "\x1f")
        uniq = pc.unique(fused)
        return pa.table({"st": uniq,
                         "one": pa.array(np.ones(len(uniq), np.int64),
                                         pa.int64())})

    st = docs.map_batches(st_partial, batch_format="pyarrow") \
        .groupby("st").aggregate(Sum("one", alias_name="one"))

    def to_ts(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b["st"], "\x1f")
        return pa.table({"source": pc.list_element(parts, 0),
                         "term": pc.list_element(parts, 1)})

    def addpart(b: pa.Table) -> pa.Table:
        return b.append_column("_part", _crc_part(b["term"], 32))

    pr = st.map_batches(to_ts, batch_format="pyarrow") \
        .map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(
            lambda t: pairs_within_groups(t, "term", "source"),
            batch_format="pyarrow") \
        .groupby("pair").aggregate(Sum("n", alias_name="n_common"))

    def split(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b["pair"], "\x1f")
        return pa.table({
            "src_a": pc.list_element(parts, 0),
            "src_b": pc.list_element(parts, 1),
            "n_common": pc.cast(b["n_common"], pa.int64()),
        })

    return pr.map_batches(split, batch_format="pyarrow")


# ------------------------------------------------------ stopword ratio


def q_stopword_stats(sf_dir: str):
    """Per-language stopword counts: documents, total tokens, stopword
    tokens. One vocabulary-sized shuffle of per-block (lang, counts)
    partials; the stopword test is one Arrow is_in over the flat term
    array."""
    from ray.data.aggregate import Sum
    from ..stages.corpus import _batch_terms

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "text"])

    def partial(b: pa.Table) -> pa.Table:
        flat, doc_of, _, _ = _batch_terms(b, "text")
        enc = pc.dictionary_encode(_chunk(b["lang"]))
        dcodes = _np(enc.indices).astype(np.int64)
        K = len(enc.dictionary)
        tcodes = dcodes[doc_of]
        stop = pc.is_in(flat, value_set=pa.array(STOPWORDS)) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "lang": enc.dictionary,
            "n_docs": pa.array(np.bincount(dcodes, minlength=K)
                               .astype(np.int64), pa.int64()),
            "n_tokens": pa.array(np.bincount(tcodes, minlength=K)
                                 .astype(np.int64), pa.int64()),
            "n_stop": pa.array(np.bincount(tcodes, weights=stop,
                                           minlength=K)
                               .astype(np.int64), pa.int64()),
        })

    agg = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("lang").aggregate(
            *(Sum(c, alias_name=c) for c in
              ("n_docs", "n_tokens", "n_stop")))

    def widen(b: pa.Table) -> pa.Table:
        cols = {"lang": b["lang"]}
        for c in ("n_docs", "n_tokens", "n_stop"):
            cols[c] = pc.cast(b[c], pa.int64())
        return pa.table(cols)

    return agg.map_batches(widen, batch_format="pyarrow")


# --------------------------------------- boilerplate-prefix duplicates


def q_prefix_dups(sf_dir: str):
    """Boilerplate detection: groups of documents sharing their first
    5 words (the cheap pre-pass before shingle dedup — shared prefixes
    are how mirrored/templated pages cluster). Per block: one Arrow
    split + list_slice + join builds the prefix key; the shuffle moves
    (prefix, count) partials; survivors are prefixes with ≥2 docs."""
    from ray.data.aggregate import Sum

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(_chunk(b["text"]))
        words = pc.utf8_split_whitespace(lower)
        pre = pc.binary_join(pc.list_slice(words, 0, PREFIX_K), " ")
        t = _count_by_key(pre)
        return pa.table({"prefix": t["key"], "n": t["n"]})

    agg = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("prefix").aggregate(Sum("n", alias_name="n_docs"))

    def keep_dups(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater(b["n_docs"], 1))
        return pa.table({"prefix": t["prefix"],
                         "n_docs": pc.cast(t["n_docs"], pa.int64())})

    return agg.map_batches(keep_dups, batch_format="pyarrow")


# ---------------------------------------------- word-length distribution


def q_word_len_dist(sf_dir: str):
    """Token-length histogram per language — the char-level profile pass
    (language mixes shift it; tokenizer bugs show up as spikes). Fused
    (lang, len) string partials, one vocabulary-sized shuffle."""
    from ray.data.aggregate import Sum
    from ..stages.corpus import _batch_terms

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "text"])

    def partial(b: pa.Table) -> pa.Table:
        flat, doc_of, _, _ = _batch_terms(b, "text")
        lang_of = _chunk(b["lang"]).take(pa.array(doc_of))
        lens = pc.cast(pc.utf8_length(flat), pa.string())
        fused = pc.binary_join_element_wise(lang_of, lens, "\x1f")
        t = _count_by_key(fused)
        return pa.table({"ll": t["key"], "n": t["n"]})

    agg = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("ll").aggregate(Sum("n", alias_name="n"))

    def split(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b["ll"], "\x1f")
        return pa.table({
            "lang": pc.list_element(parts, 0),
            "word_len": pc.cast(pc.list_element(parts, 1), pa.int64()),
            "n": pc.cast(b["n"], pa.int64()),
        })

    return agg.map_batches(split, batch_format="pyarrow")


# --------------------------------------------------- value histogram


def q_value_histogram(sf_dir: str):
    """Fixed-width histogram of event values per event type (50-unit
    bins on integer milli values — exact bin edges, no float compare).
    Per-block fused (type, bin) bincount partials; the shuffle is
    O(types × bins)."""
    from ray.data.aggregate import Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        vm = np.floor(_np(b["value"]) * 1000 + 0.5).astype(np.int64)
        bins = vm // HIST_BIN_MILLI
        fused = pc.binary_join_element_wise(
            _chunk(b["event_type"]),
            pa.array(bins.astype("U"), pa.string()), "\x1f")
        t = _count_by_key(fused)
        return pa.table({"tb": t["key"], "n": t["n"]})

    agg = ev.map_batches(partial, batch_format="pyarrow") \
        .groupby("tb").aggregate(Sum("n", alias_name="n"))

    def split(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b["tb"], "\x1f")
        return pa.table({
            "event_type": pc.list_element(parts, 0),
            "bin": pc.cast(pc.list_element(parts, 1), pa.int64()),
            "n": pc.cast(b["n"], pa.int64()),
        })

    return agg.map_batches(split, batch_format="pyarrow")


# ------------------------------------------- JSON property extraction


def q_props_extract(sf_dir: str):
    """Semi-structured extraction: pull the integer ``k`` out of the
    JSON props column (one vectorized RE2 extract_regex, no per-row
    json.loads) and aggregate sum/min/max/count per event type. The
    shuffle moves one partial row per (block, type)."""
    from ray.data.aggregate import Max, Min, Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])

    def partial(b: pa.Table) -> pa.Table:
        ex = pc.extract_regex(_chunk(b["props"]), r'"k": (?P<k>\d+)')
        k = _np(pc.cast(pc.struct_field(ex, "k"), pa.int64())) \
            .astype(np.int64)
        enc = pc.dictionary_encode(_chunk(b["event_type"]))
        codes = _np(enc.indices).astype(np.int64)
        K = len(enc.dictionary)
        order = np.argsort(codes, kind="stable")
        c_s, k_s = codes[order], k[order]
        starts = np.ones(len(c_s), bool)
        if len(c_s):
            starts[1:] = c_s[1:] != c_s[:-1]
        idx = np.nonzero(starts)[0]
        red = (lambda f: f.reduceat(k_s, idx) if len(c_s)
               else np.empty(0, np.int64))
        return pa.table({
            "event_type": enc.dictionary.take(pa.array(c_s[idx]
                                                       if len(c_s)
                                                       else codes)),
            "sum_k": pa.array(red(np.add), pa.int64()),
            "min_k": pa.array(red(np.minimum), pa.int64()),
            "max_k": pa.array(red(np.maximum), pa.int64()),
            "n": pa.array((np.r_[idx[1:], len(c_s)] - idx)
                          .astype(np.int64) if len(c_s)
                          else np.empty(0, np.int64), pa.int64()),
        })

    agg = ev.map_batches(partial, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Sum("sum_k", alias_name="sum_k"),
            Min("min_k", alias_name="min_k"),
            Max("max_k", alias_name="max_k"),
            Sum("n", alias_name="n"))

    def widen(b: pa.Table) -> pa.Table:
        cols = {"event_type": b["event_type"]}
        for c in ("sum_k", "min_k", "max_k", "n"):
            cols[c] = pc.cast(b[c], pa.int64())
        return pa.table(cols)

    return agg.map_batches(widen, batch_format="pyarrow")


# ------------------------------- above-source-average (string-key join)


def q_above_avg_docs(sf_dir: str):
    """Documents longer than their SOURCE's average length — the
    correlated-average pattern on a STRING group key, exercising
    hash_join_str (blake2b-partitioned + post-join string verification).
    The per-source aggregate pre-collapses per block, the comparison is
    integer cross-multiplication (n_chars · n_src > Σ, no division)."""
    from ray.data.aggregate import Sum
    from ..stages import relational

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source", "n_chars"])

    def src_partial(b: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(_chunk(b["source"]))
        codes = _np(enc.indices).astype(np.int64)
        K = len(enc.dictionary)
        nc = _np(b["n_chars"]).astype(np.int64)
        return pa.table({
            "source": enc.dictionary,
            "s": pa.array(np.bincount(codes, weights=nc, minlength=K)
                          .astype(np.int64), pa.int64()),
            "n": pa.array(np.bincount(codes, minlength=K)
                          .astype(np.int64), pa.int64()),
        })

    agg = docs.map_batches(src_partial, batch_format="pyarrow") \
        .groupby("source").aggregate(Sum("s", alias_name="s"),
                                     Sum("n", alias_name="n"))

    def widen(b: pa.Table) -> pa.Table:
        return pa.table({"source": b["source"],
                         "s": pc.cast(b["s"], pa.int64()),
                         "n": pc.cast(b["n"], pa.int64())})

    joined = relational.hash_join_str(
        docs, agg.map_batches(widen, batch_format="pyarrow"),
        key="source",
        left_carry={"doc_id": pa.int64(), "n_chars": pa.int64()},
        right_carry={"s": pa.int64(), "n": pa.int64()},
        P=relational.adaptive_parts(sf_dir))

    def above(b: pa.Table) -> pa.Table:
        keep = _np(pc.cast(b["n_chars"], pa.int64())) * _np(b["n"]) \
            > _np(b["s"])
        t = b.filter(pa.array(keep))
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "source": t["source"],
            "n_chars": pc.cast(t["n_chars"], pa.int64()),
        })

    return joined.map_batches(above, batch_format="pyarrow")


# -------------------------------------- per-source duplication ratio


def q_dup_by_source(sf_dir: str):
    """Exact-duplicate pressure per source: documents whose full text
    appears more than once corpus-wide, attributed to each source — the
    per-provider dedup report that decides which feeds get filtered.
    Stage 1 counts content hashes (64-bit blake2b, the exact_dedup key);
    stage 2 re-walks the corpus attaching each doc's hash multiplicity
    via a hash join and reduces per source."""
    from ray.data.aggregate import Sum
    from ..stages import relational
    from ..stages.text import content_hash

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source", "text"])
    hashed = docs.map_batches(content_hash, batch_format="pyarrow")

    def h_partial(b: pa.Table) -> pa.Table:
        h = _np(b["content_hash"]).astype(np.int64)
        keys, cnt = np.unique(h, return_counts=True)
        return pa.table({"content_hash": pa.array(keys, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64),
                                       pa.int64())})

    counts = hashed.map_batches(h_partial, batch_format="pyarrow") \
        .groupby("content_hash").aggregate(Sum("n", alias_name="n")) \
        .map_batches(lambda b: pa.table({
            "content_hash": pc.cast(b["content_hash"], pa.int64()),
            "n": pc.cast(b["n"], pa.int64())}), batch_format="pyarrow")

    def doc_slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "content_hash": pc.cast(b["content_hash"], pa.int64()),
            "source": b["source"],
        })

    joined = relational.hash_join_i64(
        hashed.map_batches(doc_slim, batch_format="pyarrow"),
        counts, key="content_hash",
        left_carry={"source": pa.string()},
        right_carry={"n": pa.int64()},
        P=relational.adaptive_parts(sf_dir))

    def src_partial(b: pa.Table) -> pa.Table:
        dup = (_np(b["n"]).astype(np.int64) > 1).astype(np.int64)
        enc = pc.dictionary_encode(_chunk(b["source"]))
        codes = _np(enc.indices).astype(np.int64)
        K = len(enc.dictionary)
        return pa.table({
            "source": enc.dictionary,
            "n_docs": pa.array(np.bincount(codes, minlength=K)
                               .astype(np.int64), pa.int64()),
            "n_dup_docs": pa.array(np.bincount(codes, weights=dup,
                                               minlength=K)
                                   .astype(np.int64), pa.int64()),
        })

    return joined.map_batches(src_partial, batch_format="pyarrow") \
        .groupby("source").aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_dup_docs", alias_name="n_dup_docs")) \
        .map_batches(lambda b: pa.table({
            "source": b["source"],
            "n_docs": pc.cast(b["n_docs"], pa.int64()),
            "n_dup_docs": pc.cast(b["n_dup_docs"], pa.int64())}),
            batch_format="pyarrow")


# ------------------------------------------- robust stats: MAD per group


def q_value_mad(sf_dir: str):
    """Median absolute deviation of event values per type — the robust
    spread statistic (outlier-resistant quality gates use it instead of
    std). Two composed histogram-quantile passes: the per-type median
    (≤ |types| rows) broadcasts as a plain dict, the deviation pass
    re-runs the same value-count shuffle on |vm − med|. Rows never
    move; both shuffles are O(types × distinct values)."""
    from ..stages import stats as stats_stage

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def milli(b: pa.Table) -> pa.Table:
        vm = np.floor(_np(b["value"]) * 1000 + 0.5).astype(np.int64)
        return pa.table({"event_type": b["event_type"],
                         "vm": pa.array(vm, pa.int64())})

    ds1 = ev.map_batches(milli, batch_format="pyarrow")
    med_rows = stats_stage.group_quantiles(
        ds1, "event_type", "vm", [0.5], ["med"]).take_all()
    meds = {r["event_type"]: int(r["med"]) for r in med_rows}

    def dev(b: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(_chunk(b["event_type"]))
        dmed = np.array([meds[s] for s in enc.dictionary.to_pylist()],
                        np.int64)
        med = dmed[_np(enc.indices).astype(np.int64)]
        return pa.table({
            "event_type": b["event_type"],
            "dev": pa.array(np.abs(_np(b["vm"]) - med), pa.int64()),
        })

    mad = stats_stage.group_quantiles(
        ds1.map_batches(dev, batch_format="pyarrow"),
        "event_type", "dev", [0.5], ["mad_milli"])

    def attach_med(b: pa.Table) -> pa.Table:
        med = np.array([meds[s] for s in b["event_type"].to_pylist()],
                       np.int64)
        return pa.table({
            "event_type": b["event_type"],
            "n_rows": pc.cast(b["n_rows"], pa.int64()),
            "med_milli": pa.array(med, pa.int64()),
            "mad_milli": pc.cast(b["mad_milli"], pa.int64()),
        })

    return mad.map_batches(attach_med, batch_format="pyarrow")


# ------------------------------------------- lang-ID confusion matrix


def q_lang_confusion(sf_dir: str):
    """Language-ID quality report: the engine's stopword-profile
    heuristic (stages/text.LangId) against the labeled lang column as a
    confusion matrix — how a pipeline validates its lang gate before
    trusting it for filtering. One streaming langid pass + fused
    (pred, actual) count partials; oracled by an independent scalar
    mirror of the heuristic SPEC (expected v11)."""
    from ray.data.aggregate import Sum
    from ..stages.text import langid_batch

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "text"])
    pred = docs.map_batches(langid_batch, batch_format="pyarrow")

    def partial(b: pa.Table) -> pa.Table:
        fused = pc.binary_join_element_wise(
            _chunk(b["lang_pred"]), _chunk(b["lang"]), "\x1f")
        t = _count_by_key(fused)
        return pa.table({"pa_": t["key"], "n": t["n"]})

    agg = pred.map_batches(partial, batch_format="pyarrow") \
        .groupby("pa_").aggregate(Sum("n", alias_name="n"))

    def split(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b["pa_"], "\x1f")
        return pa.table({
            "lang_pred": pc.list_element(parts, 0),
            "lang": pc.list_element(parts, 1),
            "n": pc.cast(b["n"], pa.int64()),
        })

    return agg.map_batches(split, batch_format="pyarrow")


# ------------------------------------------ robust outlier gating


def q_value_outliers(sf_dir: str):
    """Robust outlier counts per event type: events with
    |v − median| > 3·MAD — the outlier gate that doesn't move when the
    outliers themselves do (unlike z-scores). Both statistics come from
    the histogram-quantile path and broadcast as dicts (≤ |types| rows);
    the gate itself is one exact integer compare per row in a streaming
    scan."""
    from ray.data.aggregate import Sum
    from ..stages import stats as stats_stage

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def milli(b: pa.Table) -> pa.Table:
        vm = np.floor(_np(b["value"]) * 1000 + 0.5).astype(np.int64)
        return pa.table({"event_type": b["event_type"],
                         "vm": pa.array(vm, pa.int64())})

    ds1 = ev.map_batches(milli, batch_format="pyarrow")
    med_rows = stats_stage.group_quantiles(
        ds1, "event_type", "vm", [0.5], ["med"]).take_all()
    meds = {r["event_type"]: int(r["med"]) for r in med_rows}

    def dev(b: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(_chunk(b["event_type"]))
        dmed = np.array([meds[s] for s in enc.dictionary.to_pylist()],
                        np.int64)
        med = dmed[_np(enc.indices).astype(np.int64)]
        return pa.table({
            "event_type": b["event_type"],
            "dev": pa.array(np.abs(_np(b["vm"]) - med), pa.int64()),
        })

    mad_rows = stats_stage.group_quantiles(
        ds1.map_batches(dev, batch_format="pyarrow"),
        "event_type", "dev", [0.5], ["mad"]).take_all()
    mads = {r["event_type"]: int(r["mad"]) for r in mad_rows}

    def gate(b: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(_chunk(b["event_type"]))
        codes = _np(enc.indices).astype(np.int64)
        dvals = enc.dictionary.to_pylist()
        med = np.array([meds[s] for s in dvals], np.int64)[codes]
        mad = np.array([mads[s] for s in dvals], np.int64)[codes]
        out = (np.abs(_np(b["vm"]) - med) > 3 * mad).astype(np.int64)
        K = len(enc.dictionary)
        return pa.table({
            "event_type": enc.dictionary,
            "n_outliers": pa.array(np.bincount(codes, weights=out,
                                               minlength=K)
                                   .astype(np.int64), pa.int64()),
            "n": pa.array(np.bincount(codes, minlength=K)
                          .astype(np.int64), pa.int64()),
        })

    return ds1.map_batches(gate, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Sum("n_outliers", alias_name="n_outliers"),
            Sum("n", alias_name="n")) \
        .map_batches(lambda b: pa.table({
            "event_type": b["event_type"],
            "n_outliers": pc.cast(b["n_outliers"], pa.int64()),
            "n": pc.cast(b["n"], pa.int64())}), batch_format="pyarrow")


# -------------------------------------------------- regex corpus filter


REGEX_PATTERN = r"\bjoin\b.*\bsort\b"


def q_regex_filter(sf_dir: str):
    """Per-language match counts for an RE2 pattern over the corpus —
    the regex-gate pass (PII patterns, boilerplate markers) as one
    vectorized match_substring_regex per block; the shuffle moves one
    (lang, n_match, n_docs) partial per block."""
    from ray.data.aggregate import Sum

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "text"])

    def partial(b: pa.Table) -> pa.Table:
        hit = pc.match_substring_regex(_chunk(b["text"]), REGEX_PATTERN) \
            .to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(_chunk(b["lang"]))
        codes = _np(enc.indices).astype(np.int64)
        K = len(enc.dictionary)
        return pa.table({
            "lang": enc.dictionary,
            "n_match": pa.array(np.bincount(codes, weights=hit,
                                            minlength=K)
                                .astype(np.int64), pa.int64()),
            "n_docs": pa.array(np.bincount(codes, minlength=K)
                               .astype(np.int64), pa.int64()),
        })

    agg = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("lang").aggregate(Sum("n_match", alias_name="n_match"),
                                   Sum("n_docs", alias_name="n_docs"))

    def widen(b: pa.Table) -> pa.Table:
        return pa.table({
            "lang": b["lang"],
            "n_match": pc.cast(b["n_match"], pa.int64()),
            "n_docs": pc.cast(b["n_docs"], pa.int64()),
        })

    return agg.map_batches(widen, batch_format="pyarrow")


# ---------------------------------------------- trigram novelty per doc


def q_trigram_novelty(sf_dir: str):
    """Per-document novelty: how many of a doc's word-trigram instances
    are unique to it corpus-wide (df = 1) — the self-information signal
    that separates boilerplate from original text. Three bounded
    exchanges: (1) (trigram, doc) instance counts dedup on a fused
    string key; (2) document frequency per trigram (one count row per
    distinct pair); (3) a string-keyed hash join attaches df back and
    per-doc partials sum the instance counts. Every shuffle is trigram-
    vocabulary sized, never corpus sized."""
    from ray.data.aggregate import Sum
    from ..stages.corpus import _batch_terms
    from ..stages import relational

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def inst_partial(b: pa.Table) -> pa.Table:
        flat, doc_of, _, _ = _batch_terms(b, "text")
        L = len(flat)
        if L < 3:
            return pa.table({"td": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        tri = pc.binary_join_element_wise(
            flat.slice(0, L - 2), flat.slice(1, L - 2),
            flat.slice(2, L - 2), " ")
        same = (doc_of[2:] == doc_of[:-2])
        tri = tri.filter(pa.array(same))
        dids = _np(b["doc_id"]).astype(np.int64)[doc_of[:-2][same]]
        fused = pc.binary_join_element_wise(
            tri, pa.array(dids.astype("U"), pa.string()), "\x1f")
        t = _count_by_key(fused)
        return pa.table({"td": t["key"], "n": t["n"]})

    pairs = docs.map_batches(inst_partial, batch_format="pyarrow") \
        .groupby("td").aggregate(Sum("n", alias_name="n"))

    def split_pairs(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b["td"], "\x1f")
        return pa.table({
            "tri": pc.list_element(parts, 0),
            "doc_id": pc.cast(pc.list_element(parts, 1), pa.int64()),
            "n": pc.cast(b["n"], pa.int64()),
        })

    rows = pairs.map_batches(split_pairs, batch_format="pyarrow")

    def df_partial(b: pa.Table) -> pa.Table:
        t = _count_by_key(b["tri"])
        return pa.table({"tri": t["key"], "df": t["n"]})

    df = rows.map_batches(df_partial, batch_format="pyarrow") \
        .groupby("tri").aggregate(Sum("df", alias_name="df")) \
        .map_batches(lambda b: pa.table({
            "tri": b["tri"], "df": pc.cast(b["df"], pa.int64())}),
            batch_format="pyarrow")

    joined = relational.hash_join_str(
        rows, df, key="tri",
        left_carry={"doc_id": pa.int64(), "n": pa.int64()},
        right_carry={"df": pa.int64()},
        P=relational.adaptive_parts(sf_dir))

    def doc_partial(b: pa.Table) -> pa.Table:
        did = _np(b["doc_id"]).astype(np.int64)
        n = _np(b["n"]).astype(np.int64)
        uniq = n * (_np(b["df"]).astype(np.int64) == 1)
        order = np.argsort(did, kind="stable")
        d_s = did[order]
        starts = np.ones(len(d_s), bool)
        if len(d_s):
            starts[1:] = d_s[1:] != d_s[:-1]
        idx = np.nonzero(starts)[0]
        red = (lambda v: np.add.reduceat(v[order], idx) if len(d_s)
               else v)
        return pa.table({
            "doc_id": pa.array(d_s[idx] if len(d_s) else d_s,
                               pa.int64()),
            "n_tri": pa.array(red(n), pa.int64()),
            "n_unique": pa.array(red(uniq), pa.int64()),
        })

    return joined.map_batches(doc_partial, batch_format="pyarrow") \
        .groupby("doc_id").aggregate(
            Sum("n_tri", alias_name="n_tri"),
            Sum("n_unique", alias_name="n_unique")) \
        .map_batches(lambda b: pa.table({
            "doc_id": pc.cast(b["doc_id"], pa.int64()),
            "n_tri": pc.cast(b["n_tri"], pa.int64()),
            "n_unique": pc.cast(b["n_unique"], pa.int64())}),
            batch_format="pyarrow")


# -------------------------------- multimodal-aware sequence packing


MM_BUDGET = 512
MM_MEDIA_COST = 256
MM_GEOM_COST = 16
MM_SHARD = 100


def q_pack_multimodal(sf_dir: str):
    """Sequence packing over the INTERLEAVED corpus schema: a doc's
    budget cost is its text whitespace tokens plus a fixed token cost
    per media span (256 — an image-patch budget) and per geom span (16)
    — how a multimodal training pipeline actually packs mixed
    documents. One Arrow list-flatten pass computes costs; the greedy
    shard-restarted packer is the shared stages/corpus.pack_sequences
    kernel. Oracled by an independent scalar loop (expected v8)."""
    from ..stages.corpus import pack_sequences
    from .queries import _docs_ds

    docs = _docs_ds(sf_dir)

    def cost(b: pa.Table) -> pa.Table:
        spans = b["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        lens = pc.list_value_length(spans) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        m = len(lens)
        flat = pc.list_flatten(spans)
        kind = flat.field("kind")
        doc_of = np.repeat(np.arange(m, dtype=np.int64), lens)
        # text token counts per span: split, flatten, drop empties
        words = pc.utf8_split_whitespace(flat.field("text"))
        wlens = pc.list_value_length(words) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flatw = pc.list_flatten(words)
        span_of = np.repeat(np.arange(len(wlens), dtype=np.int64),
                            wlens)
        nonempty = pc.not_equal(flatw, "") \
            .to_numpy(zero_copy_only=False)
        ntok = np.bincount(span_of[nonempty],
                           minlength=len(wlens)).astype(np.int64)
        is_text = pc.equal(kind, "text").to_numpy(zero_copy_only=False)
        is_media = pc.equal(kind, "media") \
            .to_numpy(zero_copy_only=False)
        is_geom = pc.equal(kind, "geom").to_numpy(zero_copy_only=False)
        span_cost = np.where(is_text, ntok, 0) \
            + is_media * MM_MEDIA_COST + is_geom * MM_GEOM_COST
        n_cost = np.bincount(doc_of, weights=span_cost, minlength=m) \
            .astype(np.int64)
        dids = np.array([int(s[4:]) for s in
                         b["doc_id"].to_pylist()], np.int64)
        return pa.table({
            "doc_id": pa.array(dids, pa.int64()),
            "n_cost": pa.array(n_cost, pa.int64()),
        })

    return pack_sequences(docs.map_batches(cost, batch_format="pyarrow"),
                          budget=MM_BUDGET, shard_size=MM_SHARD,
                          tok_col="n_cost")


# ------------------------------------------- video frame sampling


def q_video_frames(sf_dir: str):
    """Frame-sampling pipeline over media spans: span extraction →
    payload fetch → FrameSampler actor pool (K evenly spaced frames;
    ffmpeg stubbed behind the deterministic-fake contract — the Ray
    plumbing, schema and batch shape are real). Output pins each
    frame's 16-byte digest as hex; oracled by a scalar span walk
    (expected v9)."""
    from ..stages import media as media_stage
    from .queries import _docs_ds

    ds = _docs_ds(sf_dir) \
        .map_batches(media_stage.media_span_rows, batch_format="pyarrow") \
        .map_batches(media_stage.fetch_media, batch_format="pyarrow",
                     batch_size=512) \
        .map_batches(media_stage.FrameSampler, batch_format="pyarrow",
                     batch_size=512, concurrency=(1, 4),
                     fn_constructor_kwargs={"deterministic_fake": True})

    def widen(b: pa.Table) -> pa.Table:
        frames = b["frames"]
        if isinstance(frames, pa.ChunkedArray):
            frames = frames.combine_chunks()
        # .flatten() is offset-aware (honors a sliced block); .values
        # would read from the buffer start and shift every digest.
        flat = frames.flatten().to_pylist()  # k per row, row-major
        k = frames.type.list_size
        cols = {
            "doc_id": b["doc_id"],
            "span_idx": pc.cast(b["span_idx"], pa.int64()),
            "media_ref": b["media_ref"],
        }
        for fi in range(k):
            cols[f"f{fi}"] = pa.array(
                [flat[r * k + fi].hex() for r in range(b.num_rows)],
                pa.string())
        return pa.table(cols)

    return ds.map_batches(widen, batch_format="pyarrow")


# --------------------------------------------- audio chunk windows


def q_audio_windows(sf_dir: str):
    """Audio-chunking pipeline over media spans: span extraction →
    payload fetch → AudioChunker actor pool (fixed 64-byte windows,
    hop 32, per-window integer energy; PCM decode stubbed behind the
    deterministic-fake contract). Completes the image / video / audio
    stage triple. Oracled by a scalar span walk (expected v10)."""
    from ..stages import media as media_stage
    from .queries import _docs_ds

    ds = _docs_ds(sf_dir) \
        .map_batches(media_stage.media_span_rows, batch_format="pyarrow") \
        .map_batches(media_stage.fetch_media, batch_format="pyarrow",
                     batch_size=512) \
        .map_batches(media_stage.AudioChunker, batch_format="pyarrow",
                     batch_size=512, concurrency=(1, 4),
                     fn_constructor_kwargs={"deterministic_fake": True})

    def widen(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"],
            "span_idx": pc.cast(b["span_idx"], pa.int64()),
            "media_ref": b["media_ref"],
            "win_idx": pc.cast(b["win_idx"], pa.int64()),
            "energy": pc.cast(b["energy"], pa.int64()),
        })

    return ds.map_batches(widen, batch_format="pyarrow")


# ----------------------------------- token/char covariance moments


def q_token_char_moments(sf_dir: str):
    """Exact integer moment sums (n, Σx, Σy, Σxy, Σx², Σy²) of
    (whitespace-token count, char count) per language — everything a
    downstream Pearson correlation / regression needs, shipped as
    order-independent int64 partials (products ≤ chars·tokens per doc,
    far below 2^63 at any corpus size when summed per block then
    groupby-reduced)."""
    from ray.data.aggregate import Sum
    from ..stages.corpus import _batch_terms

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "text", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        _, doc_of, _, _ = _batch_terms(b, "text")
        ntok = np.bincount(doc_of, minlength=b.num_rows) \
            .astype(np.int64)
        nch = _np(b["n_chars"]).astype(np.int64)
        enc = pc.dictionary_encode(_chunk(b["lang"]))
        codes = _np(enc.indices).astype(np.int64)
        K = len(enc.dictionary)

        def agg(v):
            return np.bincount(codes, weights=v, minlength=K) \
                .astype(np.int64)

        return pa.table({
            "lang": enc.dictionary,
            "n": pa.array(np.bincount(codes, minlength=K)
                          .astype(np.int64), pa.int64()),
            "sx": pa.array(agg(ntok), pa.int64()),
            "sy": pa.array(agg(nch), pa.int64()),
            "sxy": pa.array(agg(ntok * nch), pa.int64()),
            "sxx": pa.array(agg(ntok * ntok), pa.int64()),
            "syy": pa.array(agg(nch * nch), pa.int64()),
        })

    agg = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("lang").aggregate(
            *(Sum(c, alias_name=c) for c in
              ("n", "sx", "sy", "sxy", "sxx", "syy")))

    def widen(b: pa.Table) -> pa.Table:
        cols = {"lang": b["lang"]}
        for c in ("n", "sx", "sy", "sxy", "sxx", "syy"):
            cols[c] = pc.cast(b[c], pa.int64())
        return pa.table(cols)

    return agg.map_batches(widen, batch_format="pyarrow")


# ------------------------------------------ compression-ratio signal


def q_compression_ratio(sf_dir: str):
    """zlib compressibility per document — the cheap redundancy signal
    web-scale filters use (highly compressible ⇒ repetitive/boilerplate;
    incompressible ⇒ noise/binary junk). Embarrassingly parallel: one
    stdlib-zlib pass per document inside map_batches, ZERO shuffles.
    Oracled by an independent scalar loop (oracle/expected.py)."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def ratios(b: pa.Table) -> pa.Table:
        import zlib

        texts = b["text"].to_pylist()
        raw = np.array([len(t.encode("utf-8")) for t in texts], np.int64)
        comp = np.array([len(zlib.compress(t.encode("utf-8"), 6))
                         for t in texts], np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(
                raw > 0,
                np.floor(comp / np.maximum(raw, 1) * 1_000_000 + 0.5)
                .astype(np.int64), 0)
        return pa.table({
            "doc_id": pc.cast(b["doc_id"], pa.int64()),
            "raw_len": pa.array(raw, pa.int64()),
            "zlib_len": pa.array(comp, pa.int64()),
            "ratio_micro": pa.array(ratio, pa.int64()),
        })

    return docs.map_batches(ratios, batch_format="pyarrow")


# ------------------------------------------------- crosstab (wide pivot)


PIVOT_LANGS = ["de", "en", "es", "fr", "zh"]


def q_lang_source_matrix(sf_dir: str):
    """Source × language crosstab pivoted WIDE (one n_<lang> column per
    language) — the report-shaped output analytics tools expect. Counts
    ride fused (source, lang) partials through one vocabulary-sized
    shuffle; the pivot is one 2-D scatter-add per source-hash partition
    (no per-source Python call — the source domain is unbounded at web
    scale). The language column set is fixed (schema contract) —
    unknown languages land in n_other."""
    from ray.data.aggregate import Sum

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        fused = pc.binary_join_element_wise(
            _chunk(b["source"]), _chunk(b["lang"]), "\x1f")
        t = _count_by_key(fused)
        return pa.table({"sl": t["key"], "n": t["n"]})

    agg = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("sl").aggregate(Sum("n", alias_name="n"))

    def to_rows(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b["sl"], "\x1f")
        return pa.table({
            "source": pc.list_element(parts, 0),
            "lang": pc.list_element(parts, 1),
            "n": pc.cast(b["n"], pa.int64()),
        })

    def addpart(b: pa.Table) -> pa.Table:
        return b.append_column("_part", _crc_part(b["source"], 32))

    def pivot(t: pa.Table) -> pa.Table:
        # vectorized over every source in the partition: one 2-D
        # scatter-add, no per-source Python call (the source domain is
        # unbounded at web scale)
        enc = pc.dictionary_encode(_chunk(t["source"]))
        src_codes = _np(enc.indices).astype(np.int64)
        K = len(enc.dictionary)
        lang_pos = {lg: i for i, lg in enumerate(PIVOT_LANGS)}
        li = np.array([lang_pos.get(s, len(PIVOT_LANGS))
                       for s in t["lang"].to_pylist()], np.int64)
        ns = _np(t["n"]).astype(np.int64)
        mat = np.zeros((K, len(PIVOT_LANGS) + 1), np.int64)
        np.add.at(mat, (src_codes, li), ns)
        cols = {"source": enc.dictionary}
        for i, lg in enumerate(PIVOT_LANGS):
            cols[f"n_{lg}"] = pa.array(mat[:, i], pa.int64())
        cols["n_other"] = pa.array(mat[:, -1], pa.int64())
        cols["n_total"] = pa.array(mat.sum(axis=1), pa.int64())
        return pa.table(cols)

    return agg.map_batches(to_rows, batch_format="pyarrow") \
        .map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(pivot, batch_format="pyarrow")


def q_lexical_stats(sf_dir: str):
    """Per-source lexical richness profile: token count, vocabulary
    size (types), hapax legomena (terms occurring exactly once in the
    source), type-token ratio and hapax share in exact ppm — the
    corpus-health numbers a curation report leads with (low TTR ⇒
    boilerplate/dup-heavy source; hapax share tracks Zipf-tail mass).
    Stage 1 counts (source, term) pairs on a fused key (the shuffle is
    the per-source vocabulary domain, the same exchange tfidf_terms
    rides); stage 2 reduces each aggregate block to per-source partials
    (rows seen / hapax rows / token sum) so the second groupby is
    sources-sized. Ratios are non-negative integer floor-division —
    trunc/floor agree, no float crosses the boundary."""
    from ray.data.aggregate import Sum
    from ..stages.corpus import _batch_terms

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])

    def st_counts(b: pa.Table) -> pa.Table:
        flat, doc_of, _, _ = _batch_terms(b, "text")
        src_of = _chunk(b["source"]).take(pa.array(doc_of))
        fused = pc.binary_join_element_wise(src_of, flat, "\x1f")
        return _count_by_key(fused)

    st = docs.map_batches(st_counts, batch_format="pyarrow") \
        .groupby("key").aggregate(Sum("n", alias_name="n"))

    def per_source(b: pa.Table) -> pa.Table:
        src = _chunk(pc.list_element(pc.split_pattern(b["key"], "\x1f"),
                                     0))
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        enc = pc.dictionary_encode(src)
        codes = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        k = len(enc.dictionary)
        return pa.table({
            "source": enc.dictionary,
            "n_tokens": pa.array(np.bincount(codes, n, k)
                                 .astype(np.int64), pa.int64()),
            "n_types": pa.array(np.bincount(codes, minlength=k)
                                .astype(np.int64), pa.int64()),
            "n_hapax": pa.array(np.bincount(codes, n == 1, k)
                                .astype(np.int64), pa.int64()),
        })

    agg = st.map_batches(per_source, batch_format="pyarrow") \
        .groupby("source").aggregate(Sum("n_tokens", alias_name="n_tokens"),
                                     Sum("n_types", alias_name="n_types"),
                                     Sum("n_hapax", alias_name="n_hapax"))

    def ratios(b: pa.Table) -> pa.Table:
        tok = b["n_tokens"].to_numpy(zero_copy_only=False)
        typ = b["n_types"].to_numpy(zero_copy_only=False)
        hap = b["n_hapax"].to_numpy(zero_copy_only=False)
        return pa.table({
            "source": b["source"],
            "n_tokens": pc.cast(b["n_tokens"], pa.int64()),
            "n_types": pc.cast(b["n_types"], pa.int64()),
            "n_hapax": pc.cast(b["n_hapax"], pa.int64()),
            "ttr_ppm": pa.array(typ * 1_000_000 // np.maximum(tok, 1),
                                pa.int64()),
            "hapax_ppm": pa.array(hap * 1_000_000 // np.maximum(typ, 1),
                                  pa.int64()),
        })

    return agg.map_batches(ratios, batch_format="pyarrow")


SIMHASH_HAM_T = 3
_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], np.uint8)


def _hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b).view(np.uint8).reshape(-1, 8)
    return _POPCNT8[x].sum(axis=1).astype(np.int64)


def q_simhash_hamming_pairs(sf_dir: str):
    """EXACT SimHash near-duplicate pairs: every doc pair whose 64-bit
    SimHash signatures differ in ≤ SIMHASH_HAM_T bits. The banded
    pigeonhole makes it exact WITHOUT the O(n²) self-join: with 4
    16-bit bands, ≤ 3 differing bits can dirty at most 3 bands, so
    every qualifying pair agrees on ≥ 1 band — each signature fans out
    4 (band_id, band_value) rows, candidates pair up inside band
    buckets only, and an exact Hamming verify + one (a,b) dedup groupby
    finish the job. Skewed band values (boilerplate-heavy corpora)
    bound the bucket pair fan-out — at scale the hot-bucket salting of
    pip_join applies. Oracle: O(n²) bit_count join over the INDEPENDENT
    scalar SimHash table (oracle/expected.py) — also re-verifying the
    engine's signature kernel end-to-end."""
    from ray.data.aggregate import Min

    from ..stages import text as text_stage

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    sigs = docs.map_batches(text_stage.simhasher_batch,
                            batch_format="pyarrow") \
        .select_columns(["doc_id", "simhash"])

    def band_fan_out(b: pa.Table) -> pa.Table:
        h = b["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(h)
        bands = np.empty(4 * n, np.int64)
        for i in range(4):
            val = (h >> np.uint64(16 * i)) & np.uint64(0xFFFF)
            bands[i * n:(i + 1) * n] = (np.int64(i) << 16) | \
                val.astype(np.int64)
        return pa.table({
            "band": pa.array(bands, pa.int64()),
            "doc_id": pa.array(np.tile(did, 4), pa.int64()),
            "sig": pa.array(np.tile(h, 4).view(np.int64), pa.int64()),
        })

    def addpart(b: pa.Table) -> pa.Table:
        v = b["band"].to_numpy(zero_copy_only=False).astype(np.uint64)
        p = ((v * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(48)) \
            % np.uint64(32)
        return b.append_column("_part", pa.array(p.astype(np.int32),
                                                 pa.int32()))

    def bucket_pairs(t: pa.Table) -> pa.Table:
        band = t["band"].to_numpy(zero_copy_only=False)
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        sig = t["sig"].to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.lexsort((did, band))
        band, did, sig = band[order], did[order], sig[order]
        starts = np.searchsorted(band, np.unique(band), "left")
        bounds = np.append(starts, len(band))
        out_a, out_b, out_h = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            m = e - s
            if m < 2:
                continue
            i, j = np.triu_indices(m, k=1)
            ham = _hamming64(sig[s + i], sig[s + j])
            keep = ham <= SIMHASH_HAM_T
            # identical doc repeated in a bucket cannot happen (one row
            # per (doc, band)); a<b by doc_id from the lexsort
            out_a.append(did[s + i[keep]])
            out_b.append(did[s + j[keep]])
            out_h.append(ham[keep])
        if not out_a:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        return pa.table({
            "doc_a": pa.array(np.concatenate(out_a), pa.int64()),
            "doc_b": pa.array(np.concatenate(out_b), pa.int64()),
            "hamming": pa.array(np.concatenate(out_h), pa.int64()),
        })

    return sigs.map_batches(band_fan_out, batch_format="pyarrow") \
        .map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(bucket_pairs,
                                     batch_format="pyarrow") \
        .groupby(["doc_a", "doc_b"]) \
        .aggregate(Min("hamming", alias_name="hamming"))


HH_K = 500  # heavy hitter = token share > 1/HH_K


def _hh_union_task(*blocks):
    """Union the per-block candidate term lists on a worker from block
    refs (never collected on the driver); returns a python set."""
    cand = set()
    for t in blocks:
        if t.num_rows:
            cand.update(t["term"].to_pylist())
    return cand


_HH_CACHE: dict = {}


def _hh_cached(ref):
    key = ref.hex()
    if key not in _HH_CACHE:
        import ray

        _HH_CACHE[key] = ray.get(ref)
    return _HH_CACHE[key]


def q_heavy_hitters(sf_dir: str):
    """EXACT heavy hitters without a vocabulary shuffle: every term
    whose global token share exceeds 1/HH_K. Two passes: pass 1 emits
    each block's LOCALLY heavy terms (local_count·K > block_tokens) —
    by the weighted-average pigeonhole a globally heavy term is locally
    heavy in at least one block, and each block emits < K candidates,
    so the candidate domain is O(K · blocks) no matter how large the
    vocabulary is (the full-vocab groupby that tfidf/lexical_stats pay
    never happens). The candidate set is unioned on a worker from block
    refs and broadcast once (decontaminate pattern); pass 2
    exact-counts candidates only, plus each block's token total under a
    reserved key, and one candidate-sized groupby + threshold filter
    give the exact answer."""
    import ray
    from ray.data.aggregate import Sum
    from ..stages.corpus import _batch_terms

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])

    def local_heavy(b: pa.Table) -> pa.Table:
        _, _, codes, terms = _batch_terms(b, "text")
        s_b = len(codes)
        cnt = np.bincount(codes, minlength=len(terms))
        heavy = np.nonzero(cnt * HH_K > s_b)[0]
        return pa.table({"term": terms.take(pa.array(heavy))})

    part = docs.map_batches(local_heavy, batch_format="pyarrow")
    blocks = part.materialize().get_internal_block_refs()
    fn = ray.remote(num_cpus=1)(_hh_union_task)
    cand_ref = fn.remote(*blocks)

    def verify_counts(b: pa.Table) -> pa.Table:
        cand = _hh_cached(cand_ref)
        _, _, codes, terms = _batch_terms(b, "text")
        s_b = len(codes)
        cnt = np.bincount(codes, minlength=len(terms))
        tl = terms.to_pylist()
        sel = [i for i, t in enumerate(tl) if t in cand]
        out_t = [tl[i] for i in sel] + ["\x01TOTAL"]
        out_n = [int(cnt[i]) for i in sel] + [s_b]
        return pa.table({"term": pa.array(out_t, pa.string()),
                         "n": pa.array(out_n, pa.int64())})

    agg = docs.map_batches(verify_counts, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("n", alias_name="n")).take_all()
    S = sum(r["n"] for r in agg if r["term"] == "\x01TOTAL")
    rows = sorted((r["term"], r["n"]) for r in agg
                  if r["term"] != "\x01TOTAL" and r["n"] * HH_K > S)
    return pa.table({
        "term": pa.array([t for t, _ in rows], pa.string()),
        "n": pa.array([n for _, n in rows], pa.int64()),
    })


# ----------------------------------------------------------- registry


QUERIES_CSTATS = {
    "lexical_stats": q_lexical_stats,
    "heavy_hitters": q_heavy_hitters,
    "simhash_hamming_pairs": q_simhash_hamming_pairs,
    "source_overlap": q_source_overlap,
    "stopword_stats": q_stopword_stats,
    "prefix_dups": q_prefix_dups,
    "word_len_dist": q_word_len_dist,
    "value_histogram": q_value_histogram,
    "props_extract": q_props_extract,
    "above_avg_docs": q_above_avg_docs,
    "value_mad": q_value_mad,
    "value_outliers": q_value_outliers,
    "lang_confusion": q_lang_confusion,
    "regex_filter": q_regex_filter,
    "lang_source_matrix": q_lang_source_matrix,
    "trigram_novelty": q_trigram_novelty,
    "compression_ratio": q_compression_ratio,
    "token_char_moments": q_token_char_moments,
    "pack_multimodal": q_pack_multimodal,
    "video_frames": q_video_frames,
    "dup_by_source": q_dup_by_source,
    "audio_windows": q_audio_windows,
}


ORACLE_SQL_CSTATS = {
    "simhash_hamming_pairs": f"""
WITH s AS (SELECT doc_id, simhash
           FROM read_parquet('/tmp/graft_expected/simhash.parquet'))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_HAM_T}""",
    "heavy_hitters": rf"""
WITH w AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
  FROM documents WHERE trim(text) <> ''),
tc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY term),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS s FROM w)
SELECT term, n FROM tc, tot WHERE n * {HH_K} > s""",
    "lexical_stats": r"""
WITH w AS (
  SELECT source,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
  FROM documents WHERE trim(text) <> ''),
tc AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS n
       FROM w GROUP BY 1, 2)
SELECT source,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(COUNT(*) FILTER (n = 1) AS BIGINT) AS n_hapax,
       CAST((COUNT(*) * 1000000) // GREATEST(SUM(n), 1) AS BIGINT)
         AS ttr_ppm,
       CAST((COUNT(*) FILTER (n = 1) * 1000000)
            // GREATEST(COUNT(*), 1) AS BIGINT) AS hapax_ppm
FROM tc GROUP BY source""",
    "source_overlap": r"""
WITH st AS (
  SELECT DISTINCT source,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
  FROM documents WHERE trim(text) <> '')
SELECT a.source AS src_a, b.source AS src_b,
       CAST(COUNT(*) AS BIGINT) AS n_common
FROM st a JOIN st b USING (term)
WHERE a.source < b.source
GROUP BY a.source, b.source""",
    "stopword_stats": r"""
WITH w AS (
  SELECT lang,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
  FROM documents WHERE trim(text) <> ''),
tok AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) FILTER (term IN ('the', 'a')) AS BIGINT) AS n_stop
  FROM w GROUP BY lang),
d AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY lang)
SELECT lang, n_docs, n_tokens, n_stop FROM tok JOIN d USING (lang)""",
    "prefix_dups": r"""
WITH p AS (
  SELECT array_to_string(
           list_slice(regexp_split_to_array(trim(lower(text)), '\s+'),
                      1, 5), ' ') AS prefix
  FROM documents)
SELECT prefix, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM p GROUP BY prefix HAVING COUNT(*) > 1""",
    "word_len_dist": r"""
WITH w AS (
  SELECT lang,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
  FROM documents WHERE trim(text) <> '')
SELECT lang, CAST(length(term) AS BIGINT) AS word_len,
       CAST(COUNT(*) AS BIGINT) AS n
FROM w GROUP BY lang, word_len""",
    "value_histogram": """
SELECT event_type,
       CAST(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) // 50000
            AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY event_type, bin""",
    "props_extract": r"""
WITH k AS (
  SELECT event_type,
         CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
  FROM events)
SELECT event_type,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k,
       CAST(COUNT(*) AS BIGINT) AS n
FROM k GROUP BY event_type""",
    "above_avg_docs": """
WITH a AS (SELECT source AS src, CAST(SUM(n_chars) AS BIGINT) AS s,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM documents GROUP BY source)
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
FROM documents JOIN a ON source = src
WHERE CAST(n_chars AS BIGINT) * n > s""",
    "value_mad": """
WITH v AS (SELECT event_type,
                  CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm
           FROM events),
m AS (SELECT event_type, CAST(quantile_disc(vm, 0.5) AS BIGINT) AS med
      FROM v GROUP BY event_type)
SELECT v.event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(m.med AS BIGINT) AS med_milli,
       CAST(quantile_disc(abs(vm - med), 0.5) AS BIGINT) AS mad_milli
FROM v JOIN m USING (event_type)
GROUP BY v.event_type, m.med""",
    "value_outliers": """
WITH v AS (SELECT event_type,
                  CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm
           FROM events),
m AS (SELECT event_type, CAST(quantile_disc(vm, 0.5) AS BIGINT) AS med
      FROM v GROUP BY event_type),
d AS (SELECT v.event_type, vm, med, abs(vm - med) AS dev
      FROM v JOIN m USING (event_type)),
md AS (SELECT event_type, CAST(quantile_disc(dev, 0.5) AS BIGINT) AS mad
       FROM d GROUP BY event_type)
SELECT d.event_type,
       CAST(COUNT(*) FILTER (dev > 3 * mad) AS BIGINT) AS n_outliers,
       CAST(COUNT(*) AS BIGINT) AS n
FROM d JOIN md USING (event_type)
GROUP BY d.event_type""",
    "regex_filter": r"""
SELECT lang,
       CAST(COUNT(*) FILTER (
         regexp_matches(text, '\bjoin\b.*\bsort\b')) AS BIGINT)
         AS n_match,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents GROUP BY lang""",
    "lang_source_matrix": """
SELECT source,
       CAST(COUNT(*) FILTER (lang = 'de') AS BIGINT) AS n_de,
       CAST(COUNT(*) FILTER (lang = 'en') AS BIGINT) AS n_en,
       CAST(COUNT(*) FILTER (lang = 'es') AS BIGINT) AS n_es,
       CAST(COUNT(*) FILTER (lang = 'fr') AS BIGINT) AS n_fr,
       CAST(COUNT(*) FILTER (lang = 'zh') AS BIGINT) AS n_zh,
       CAST(COUNT(*) FILTER (lang NOT IN ('de', 'en', 'es', 'fr', 'zh'))
            AS BIGINT) AS n_other,
       CAST(COUNT(*) AS BIGINT) AS n_total
FROM documents GROUP BY source""",
    "trigram_novelty": r"""
WITH words AS (
  SELECT doc_id, regexp_split_to_array(TRIM(lower(text)), '\s+') AS ws
  FROM documents WHERE TRIM(text) <> ''),
tri AS (
  SELECT doc_id,
         UNNEST([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                 for i in generate_series(1, len(ws) - 2)]) AS g
  FROM words WHERE len(ws) >= 3),
df AS (SELECT g, COUNT(DISTINCT doc_id) AS df FROM tri GROUP BY g)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tri,
       CAST(COUNT(*) FILTER (df = 1) AS BIGINT) AS n_unique
FROM tri JOIN df USING (g)
GROUP BY doc_id""",
    "compression_ratio":
        "SELECT * FROM "
        "read_parquet('/tmp/graft_expected/compression_ratio.parquet')",
    "token_char_moments": r"""
WITH d AS (
  SELECT lang, CAST(n_chars AS BIGINT) AS y,
         CAST(CASE WHEN TRIM(text) = '' THEN 0
              ELSE len(regexp_split_to_array(TRIM(text), '\s+')) END
              AS BIGINT) AS x
  FROM documents)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
       CAST(SUM(x * y) AS BIGINT) AS sxy,
       CAST(SUM(x * x) AS BIGINT) AS sxx,
       CAST(SUM(y * y) AS BIGINT) AS syy
FROM d GROUP BY lang""",
    "pack_multimodal":
        "SELECT * FROM "
        "read_parquet('/tmp/graft_expected/pack_multimodal.parquet')",
    "video_frames":
        "SELECT * FROM "
        "read_parquet('/tmp/graft_expected/video_frames.parquet')",
    "lang_confusion":
        "SELECT * FROM "
        "read_parquet('/tmp/graft_expected/lang_confusion.parquet')",
    "dup_by_source": """
WITH n AS (SELECT text, COUNT(*) AS n FROM documents GROUP BY text)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (n > 1) AS BIGINT) AS n_dup_docs
FROM documents JOIN n USING (text)
GROUP BY source""",
    "audio_windows":
        "SELECT * FROM "
        "read_parquet('/tmp/graft_expected/audio_windows.parquet')",
}
