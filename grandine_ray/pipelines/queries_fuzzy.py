"""Fuzzy string matching + lexical diversity operators.

* ``typo_pairs`` — edit-distance-≤1 similarity self-join over the
  distinct product labels, the SymSpell deletion-neighborhood shape:
  every string fans out to itself + its single-character deletions, a
  hash shuffle on the variant co-locates all candidates, pairs are
  generated per bucket with the vectorized pairs_within_groups kernel
  and VERIFIED with an exact two-pointer Levenshtein≤1 check (deletion
  candidates guarantee lev ≤ 2, so false positives exist and exactness
  comes from the verify — same contract as the Bloom semi join).
  Scale shape: the fan-out is O(L) rows per DISTINCT string (the
  vocabulary domain, not the corpus), versus the O(V²) naive join the
  DuckDB oracle runs at sf0.01.
* ``simpson_diversity`` — per-source lexical diversity as EXACT integer
  sufficient statistics: token count N, distinct count V, and the
  collision sum Σc² (the unnormalized Simpson/Herfindahl index — the
  repetitiveness signal a corpus mixer reads). One token-count shuffle,
  then a per-source combine; no float crosses engines.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def _lev_le1(a: str, b: str) -> bool:
    """Exact levenshtein(a, b) ≤ 1 for a ≠ b (two-pointer, O(len))."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        diff = 0
        for x, y in zip(a, b):
            if x != y:
                diff += 1
                if diff > 1:
                    return False
        return True
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = j = 0
    used = False
    while i < la:
        if a[i] == b[j]:
            i += 1
            j += 1
        elif not used:
            used = True
            j += 1
        else:
            return False
    return True


def q_typo_pairs(sf_dir: str):
    """All unordered pairs of distinct ``p_name || ' ' || p_brand``
    labels within Levenshtein distance 1 (fuzzy near-duplicate product
    labels), via the deletion-neighborhood join."""
    from ray.data.aggregate import Count

    from .queries_cstats import pairs_within_groups

    parts = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_name", "p_brand"])

    def fuse(b: pa.Table) -> pa.Table:
        s = pc.binary_join_element_wise(b["p_name"], b["p_brand"], " ")
        return pa.table({"s": pc.unique(s)})

    distinct = parts.map_batches(fuse, batch_format="pyarrow") \
        .groupby("s").aggregate(Count(alias_name="_c")) \
        .select_columns(["s"])

    def variants(b: pa.Table) -> pa.Table:
        # vocabulary-domain fan-out: O(len) variants per DISTINCT string
        out_v: list[str] = []
        out_s: list[str] = []
        for s in b["s"].to_pylist():
            seen = {s}
            for i in range(len(s)):
                seen.add(s[:i] + s[i + 1:])
            out_v.extend(seen)
            out_s.extend([s] * len(seen))
        return pa.table({"v": pa.array(out_v, pa.string()),
                         "s": pa.array(out_s, pa.string())})

    from .queries_cstats import _crc_part

    def addpart(b: pa.Table) -> pa.Table:
        return b.append_column("_part", _crc_part(b["v"], 32))

    cand = distinct.map_batches(variants, batch_format="pyarrow") \
        .map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(
            lambda t: pairs_within_groups(t, "v", "s"),
            batch_format="pyarrow") \
        .groupby("pair").aggregate(Count(alias_name="_c"))

    def verify(b: pa.Table) -> pa.Table:
        out_a, out_b = [], []
        for p in b["pair"].to_pylist():
            a, c = p.split("\x1f")
            if _lev_le1(a, c):
                out_a.append(a)
                out_b.append(c)
        return pa.table({"s_a": pa.array(out_a, pa.string()),
                         "s_b": pa.array(out_b, pa.string())})

    return cand.map_batches(verify, batch_format="pyarrow")


def q_simpson_diversity(sf_dir: str):
    """Per-source exact lexical diversity statistics over whitespace
    tokens: N (tokens), V (distinct), Σc² (collision sum)."""
    from ray.data.aggregate import Sum

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            pc.utf8_trim_whitespace(pc.utf8_lower(b["text"])), " ")
        n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        src = b["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        src_of = src.take(pa.array(np.repeat(np.arange(len(b)), n_tok)))
        fused = pc.binary_join_element_wise(src_of, flat, "\x1f")
        uk, counts = np.unique(fused.to_numpy(zero_copy_only=False),
                               return_counts=True)
        return pa.table({"st": pa.array(uk.tolist(), pa.string()),
                         "n": pa.array(counts.astype(np.int64),
                                       pa.int64())})

    per_term = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("st").aggregate(Sum("n", alias_name="n"))

    def combine(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b["st"], "\x1f")
        src = pc.list_element(parts, 0)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        uk, inv = np.unique(src.to_numpy(zero_copy_only=False),
                            return_inverse=True)
        N = np.zeros(len(uk), np.int64)
        V = np.zeros(len(uk), np.int64)
        C2 = np.zeros(len(uk), np.int64)
        np.add.at(N, inv, n)
        np.add.at(V, inv, 1)
        np.add.at(C2, inv, n * n)
        return pa.table({"source": pa.array(uk.tolist(), pa.string()),
                         "pn": pa.array(N, pa.int64()),
                         "pv": pa.array(V, pa.int64()),
                         "pc2": pa.array(C2, pa.int64())})

    agg = per_term.map_batches(combine, batch_format="pyarrow") \
        .groupby("source").aggregate(Sum("pn", alias_name="n_tokens"),
                                     Sum("pv", alias_name="n_distinct"),
                                     Sum("pc2", alias_name="collision_sum"))

    def cast(b: pa.Table) -> pa.Table:
        return pa.table({
            "source": b["source"],
            "n_tokens": pc.cast(b["n_tokens"], pa.int64()),
            "n_distinct": pc.cast(b["n_distinct"], pa.int64()),
            "collision_sum": pc.cast(b["collision_sum"], pa.int64()),
        })

    return agg.map_batches(cast, batch_format="pyarrow")


QUERIES_FUZZY = {
    "typo_pairs": q_typo_pairs,
    "simpson_diversity": q_simpson_diversity,
}


ORACLE_SQL_FUZZY = {
    "typo_pairs": """
WITH s AS (SELECT DISTINCT p_name || ' ' || p_brand AS s FROM part)
SELECT a.s AS s_a, b.s AS s_b
FROM s a JOIN s b
  ON a.s < b.s AND ABS(LENGTH(a.s) - LENGTH(b.s)) <= 1
 AND levenshtein(a.s, b.s) <= 1""",
    "simpson_diversity": r"""
WITH toks AS (
  SELECT source,
         UNNEST(regexp_split_to_array(TRIM(lower(text)), '\s+')) AS term
  FROM documents WHERE TRIM(text) <> ''),
tc AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
       FROM toks GROUP BY 1, 2)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(c * c) AS BIGINT) AS collision_sum
FROM tc GROUP BY source""",
}
