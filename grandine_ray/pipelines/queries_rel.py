"""Round-3 relational-depth queries: the TPC-H join family beyond the
star join (shipping-priority top-k, returned-item customer revenue,
large-volume orders, distinct-supplier counts) plus a correlated
above-group-average filter.

Shared scale contract (same as queries_ext.py): per-block partial
aggregation before every shuffle, all joins via
stages/relational.hash_join_i64 (union + part-groupby + searchsorted; no
Ray Dataset.join), money integer-ized per row with floor(x*100 + 0.5) on
BOTH engines, tiny dimensions (nation, 25 rows) broadcast as plain
dicts. Distinct counts are global dedups on fused integer keys (never
a driver-side set).

Reference scope note: the reference engine (thomersch/grandine) has no
relational layer; these extend the training-data-pipeline surface
(SURVEY.md §2.7b) with DuckDB as the parity oracle.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .queries_ext import _cents, _fuse20, _group_sums, _np, _ts_us


def _widen_i64(*names):
    """Post-groupby batch fn casting every named column to int64 (Ray's
    Sum can emit int32/float depending on input width)."""
    def fn(b: pa.Table) -> pa.Table:
        return pa.table({n: pc.cast(b[n], pa.int64()) for n in names})
    return fn


# ---------------------------------------- TPC-H Q3: shipping priority


Q3_CUTOFF = np.datetime64("1998-03-15", "us").astype(np.int64)
Q3_SEGMENT = "BUILDING"


def q_top_unshipped(sf_dir: str):
    """Top-10 highest-revenue orders still unshipped at the cutoff
    (TPC-H Q3 family): BUILDING-segment customers, orders placed before
    the cutoff, revenue from lineitems shipped after it. Three
    exchanges, all pre-collapsed: a semi join filters orders by the
    customer segment (orders ship only (okey, od, priority)); lineitem
    collapses per block to (okey, cents) before the revenue groupby;
    the final join attaches order attrs to the per-order revenue rows
    (one row per order, not per lineitem). The top-k sort sees only
    per-order rows."""
    from ray.data.aggregate import Sum
    from ..stages import relational

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])

    def cust_keys(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["c_mktsegment"], Q3_SEGMENT))
        return pa.table({"custkey": pc.cast(t["c_custkey"], pa.int64())})

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate", "o_orderpriority"])

    def ord_slim(b: pa.Table) -> pa.Table:
        od = _ts_us(b["o_orderdate"])
        t = b.filter(pa.array(od < Q3_CUTOFF))
        return pa.table({
            "custkey": pc.cast(t["o_custkey"], pa.int64()),
            "okey": pc.cast(t["o_orderkey"], pa.int64()),
            "od_us": pa.array(od[od < Q3_CUTOFF], pa.int64()),
            "o_orderpriority": t["o_orderpriority"],
        })

    seg_orders = relational.hash_join_i64(
        orders.map_batches(ord_slim, batch_format="pyarrow"),
        cust.map_batches(cust_keys, batch_format="pyarrow"),
        key="custkey",
        left_carry={"okey": pa.int64(), "od_us": pa.int64(),
                    "o_orderpriority": pa.string()},
        right_carry={}, how="semi",
        P=relational.adaptive_parts(sf_dir))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate",
                                  "l_extendedprice", "l_discount"])

    def li_partial(b: pa.Table) -> pa.Table:
        keep = _ts_us(b["l_shipdate"]) > Q3_CUTOFF
        t = b.filter(pa.array(keep))
        ok = _np(t["l_orderkey"]).astype(np.int64)
        ep = _np(t["l_extendedprice"])
        dc = _np(t["l_discount"])
        cents = np.floor(ep * (1.0 - dc) * 100.0 + 0.5).astype(np.int64)
        keys, (sc,) = _group_sums(ok, cents)
        return pa.table({"okey": pa.array(keys, pa.int64()),
                         "cents": pa.array(sc, pa.int64())})

    rev = li.map_batches(li_partial, batch_format="pyarrow") \
        .groupby("okey").aggregate(Sum("cents", alias_name="revenue_cents")) \
        .map_batches(_widen_i64("okey", "revenue_cents"),
                     batch_format="pyarrow")

    joined = relational.hash_join_i64(
        rev, seg_orders, key="okey",
        left_carry={"revenue_cents": pa.int64()},
        right_carry={"od_us": pa.int64(), "o_orderpriority": pa.string()},
        P=relational.adaptive_parts(sf_dir))

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": pc.cast(b["okey"], pa.int64()),
            "revenue_cents": pc.cast(b["revenue_cents"], pa.int64()),
            "od_us": pc.cast(b["od_us"], pa.int64()),
            "o_orderpriority": b["o_orderpriority"],
        })

    return joined.map_batches(rename, batch_format="pyarrow") \
        .sort(["revenue_cents", "o_orderkey"],
              descending=[True, False]).limit(10)


# --------------------------------------- TPC-H Q10: returned items


Q10_FROM = np.datetime64("1996-01-01", "us").astype(np.int64)
Q10_TO = np.datetime64("1996-07-01", "us").astype(np.int64)


def q_returned_items(sf_dir: str):
    """Top-20 customers by revenue lost to returned items in a 6-month
    order window (TPC-H Q10 family). lineitem keeps only R-flag rows and
    collapses per block to (okey, cents); the order join (date-windowed,
    unique okey) swaps the key to custkey; a second per-block collapse +
    groupby yields one row per customer before the customer join; nation
    (25 rows) is a broadcast dict. The sort ranks customers, not
    lineitems."""
    from ray.data.aggregate import Sum
    from ..stages import relational

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_returnflag",
                                  "l_extendedprice", "l_discount"])

    def li_partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["l_returnflag"], "R"))
        ok = _np(t["l_orderkey"]).astype(np.int64)
        ep = _np(t["l_extendedprice"])
        dc = _np(t["l_discount"])
        cents = np.floor(ep * (1.0 - dc) * 100.0 + 0.5).astype(np.int64)
        keys, (sc,) = _group_sums(ok, cents)
        return pa.table({"okey": pa.array(keys, pa.int64()),
                         "cents": pa.array(sc, pa.int64())})

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def ord_slim(b: pa.Table) -> pa.Table:
        od = _ts_us(b["o_orderdate"])
        keep = (od >= Q10_FROM) & (od < Q10_TO)
        t = b.filter(pa.array(keep))
        return pa.table({
            "okey": pc.cast(t["o_orderkey"], pa.int64()),
            "custkey": pc.cast(t["o_custkey"], pa.int64()),
        })

    j1 = relational.hash_join_i64(
        li.map_batches(li_partial, batch_format="pyarrow"),
        orders.map_batches(ord_slim, batch_format="pyarrow"),
        key="okey",
        left_carry={"cents": pa.int64()},
        right_carry={"custkey": pa.int64()},
        P=relational.adaptive_parts(sf_dir))

    def cust_partial(b: pa.Table) -> pa.Table:
        ck = _np(b["custkey"]).astype(np.int64)
        cents = _np(b["cents"]).astype(np.int64)
        keys, (sc,) = _group_sums(ck, cents)
        return pa.table({"custkey": pa.array(keys, pa.int64()),
                         "cents": pa.array(sc, pa.int64())})

    rev = j1.map_batches(cust_partial, batch_format="pyarrow") \
        .groupby("custkey") \
        .aggregate(Sum("cents", alias_name="revenue_cents")) \
        .map_batches(_widen_i64("custkey", "revenue_cents"),
                     batch_format="pyarrow")

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name", "c_nationkey"])

    def cust_slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "custkey": pc.cast(b["c_custkey"], pa.int64()),
            "c_name": b["c_name"],
            "nationkey": pc.cast(b["c_nationkey"], pa.int64()),
        })

    j2 = relational.hash_join_i64(
        rev, cust.map_batches(cust_slim, batch_format="pyarrow"),
        key="custkey",
        left_carry={"revenue_cents": pa.int64()},
        right_carry={"c_name": pa.string(), "nationkey": pa.int64()},
        P=relational.adaptive_parts(sf_dir))

    import pyarrow.parquet as pq

    nt = pq.read_table(f"{sf_dir}/nation.parquet",
                       columns=["n_nationkey", "n_name"])
    nmap = dict(zip(nt["n_nationkey"].to_pylist(), nt["n_name"].to_pylist()))

    def final(b: pa.Table) -> pa.Table:
        nk = _np(b["nationkey"])
        return pa.table({
            "c_custkey": pc.cast(b["custkey"], pa.int64()),
            "c_name": b["c_name"],
            "n_name": pa.array([nmap[int(k)] for k in nk], pa.string()),
            "revenue_cents": pc.cast(b["revenue_cents"], pa.int64()),
        })

    return j2.map_batches(final, batch_format="pyarrow") \
        .sort(["revenue_cents", "c_custkey"],
              descending=[True, False]).limit(20)


# ------------------------------------ TPC-H Q18: large-volume orders


Q18_MIN_QTY = 250


def q_big_orders(sf_dir: str):
    """Large-volume orders (TPC-H Q18 family): orders whose total
    lineitem quantity exceeds 250, with customer name and order totals.
    The HAVING filter runs on the per-order aggregate (a tiny survivor
    set), so both downstream joins move only qualifying orders."""
    from ray.data.aggregate import Sum
    from ..stages import relational

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])

    def li_partial(b: pa.Table) -> pa.Table:
        ok = _np(b["l_orderkey"]).astype(np.int64)
        qty = np.floor(_np(b["l_quantity"]) + 0.5).astype(np.int64)
        keys, (sq,) = _group_sums(ok, qty)
        return pa.table({"okey": pa.array(keys, pa.int64()),
                         "qty": pa.array(sq, pa.int64())})

    def keep_big(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater(b["qty"], Q18_MIN_QTY))
        return pa.table({"okey": pc.cast(t["okey"], pa.int64()),
                         "sum_qty": pc.cast(t["qty"], pa.int64())})

    big = li.map_batches(li_partial, batch_format="pyarrow") \
        .groupby("okey").aggregate(Sum("qty", alias_name="qty")) \
        .map_batches(keep_big, batch_format="pyarrow")

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate", "o_totalprice"])

    def ord_slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "okey": pc.cast(b["o_orderkey"], pa.int64()),
            "custkey": pc.cast(b["o_custkey"], pa.int64()),
            "od_us": pa.array(_ts_us(b["o_orderdate"]), pa.int64()),
            "total_cents": pa.array(_cents(_np(b["o_totalprice"])),
                                    pa.int64()),
        })

    j1 = relational.hash_join_i64(
        big, orders.map_batches(ord_slim, batch_format="pyarrow"),
        key="okey",
        left_carry={"sum_qty": pa.int64()},
        right_carry={"custkey": pa.int64(), "od_us": pa.int64(),
                     "total_cents": pa.int64()},
        P=relational.adaptive_parts(sf_dir))

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])

    def cust_slim(b: pa.Table) -> pa.Table:
        return pa.table({"custkey": pc.cast(b["c_custkey"], pa.int64()),
                         "c_name": b["c_name"]})

    j2 = relational.hash_join_i64(
        j1, cust.map_batches(cust_slim, batch_format="pyarrow"),
        key="custkey",
        left_carry={"okey": pa.int64(), "sum_qty": pa.int64(),
                    "od_us": pa.int64(), "total_cents": pa.int64()},
        right_carry={"c_name": pa.string()},
        P=relational.adaptive_parts(sf_dir))

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_name": b["c_name"],
            "c_custkey": pc.cast(b["custkey"], pa.int64()),
            "o_orderkey": pc.cast(b["okey"], pa.int64()),
            "od_us": pc.cast(b["od_us"], pa.int64()),
            "total_cents": pc.cast(b["total_cents"], pa.int64()),
            "sum_qty": pc.cast(b["sum_qty"], pa.int64()),
        })

    return j2.map_batches(rename, batch_format="pyarrow") \
        .sort(["sum_qty", "o_orderkey"], descending=[True, False])


# --------------------------- TPC-H Q16 family: distinct suppliers/brand


def q_brand_suppliers(sf_dir: str):
    """COUNT(DISTINCT supplier) per part brand from lineitem (TPC-H Q16
    family without partsupp). Two-level distributed distinct: (1) the
    (partkey, suppkey) pair domain is deduped on a fused int64 key (pk
    << 20 | sk — valid for suppkey < 2^20 ≈ TPC-H sf < 100; _fuse20
    raises beyond that rather than corrupt the distinct count) so the
    part join moves each pair once; (2) after the brand
    attach, (brand, suppkey) dedups on a fused string key, and the final
    count is a per-block bincount partial + brand groupby. Every shuffle
    is bounded by the DISTINCT domain, never the fact-table row count."""
    from ray.data.aggregate import Sum
    from ..stages import relational

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])

    def pair_partial(b: pa.Table) -> pa.Table:
        pk = _np(b["l_partkey"]).astype(np.int64)
        sk = _np(b["l_suppkey"]).astype(np.int64)
        fused = np.unique(_fuse20(pk, sk, "(partkey, suppkey)"))
        return pa.table({"pair": pa.array(fused, pa.int64()),
                         "one": pa.array(np.ones(len(fused), np.int64),
                                         pa.int64())})

    pairs = li.map_batches(pair_partial, batch_format="pyarrow") \
        .groupby("pair").aggregate(Sum("one", alias_name="one"))

    def unfuse(b: pa.Table) -> pa.Table:
        fused = _np(b["pair"]).astype(np.int64)
        return pa.table({
            "partkey": pa.array(fused >> np.int64(20), pa.int64()),
            "suppkey": pa.array(fused & np.int64((1 << 20) - 1),
                                pa.int64()),
        })

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand"])

    def part_slim(b: pa.Table) -> pa.Table:
        return pa.table({"partkey": pc.cast(b["p_partkey"], pa.int64()),
                         "p_brand": b["p_brand"]})

    joined = relational.hash_join_i64(
        pairs.map_batches(unfuse, batch_format="pyarrow"),
        part.map_batches(part_slim, batch_format="pyarrow"),
        key="partkey",
        left_carry={"suppkey": pa.int64()},
        right_carry={"p_brand": pa.string()},
        P=relational.adaptive_parts(sf_dir))

    def bs_partial(b: pa.Table) -> pa.Table:
        brand = b["p_brand"].combine_chunks() if isinstance(
            b["p_brand"], pa.ChunkedArray) else b["p_brand"]
        sk = pc.cast(b["suppkey"], pa.string())
        fused = pc.binary_join_element_wise(brand, sk, "\x1f")
        uniq = pc.unique(fused)
        return pa.table({"bs": uniq,
                         "one": pa.array(np.ones(len(uniq), np.int64),
                                         pa.int64())})

    bs = joined.map_batches(bs_partial, batch_format="pyarrow") \
        .groupby("bs").aggregate(Sum("one", alias_name="one"))

    def brand_partial(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b["bs"], "\x1f")
        brand = pc.list_element(parts, 0)
        brand = brand.combine_chunks() if isinstance(
            brand, pa.ChunkedArray) else brand
        enc = pc.dictionary_encode(brand)
        codes = _np(enc.indices).astype(np.int64)
        cnt = np.bincount(codes, minlength=len(enc.dictionary))
        return pa.table({
            "p_brand": enc.dictionary,
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    return bs.map_batches(brand_partial, batch_format="pyarrow") \
        .groupby("p_brand") \
        .aggregate(Sum("n", alias_name="supplier_cnt")) \
        .map_batches(lambda b: pa.table({
            "p_brand": b["p_brand"],
            "supplier_cnt": pc.cast(b["supplier_cnt"], pa.int64())}),
            batch_format="pyarrow")


# -------------------------- correlated filter: above nation-average


def q_above_avg_balance(sf_dir: str):
    """Per-nation count and sum of customer balances strictly above the
    nation's average balance — the correlated-subquery pattern
    (customers vs their own group's aggregate). The group aggregate
    (≤25 rows) comes from one pre-collapsed groupby; the comparison is
    exact integer cross-multiplication (cents · n_group > sum_group, no
    division), so both engines agree bit-for-bit even on negative
    balances."""
    from ray.data.aggregate import Sum
    from ..stages import relational

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey",
                                    "c_acctbal"])

    def slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "nationkey": pc.cast(b["c_nationkey"], pa.int64()),
            "cents": pa.array(_cents(_np(b["c_acctbal"])), pa.int64()),
        })

    slimmed = cust.map_batches(slim, batch_format="pyarrow")

    def nation_partial(b: pa.Table) -> pa.Table:
        nk = _np(b["nationkey"]).astype(np.int64)
        cents = _np(b["cents"]).astype(np.int64)
        ones = np.ones(len(nk), np.int64)
        keys, (sc, n) = _group_sums(nk, cents, ones)
        return pa.table({"nationkey": pa.array(keys, pa.int64()),
                         "s": pa.array(sc, pa.int64()),
                         "n": pa.array(n, pa.int64())})

    agg = slimmed.map_batches(nation_partial, batch_format="pyarrow") \
        .groupby("nationkey").aggregate(Sum("s", alias_name="s"),
                                        Sum("n", alias_name="n")) \
        .map_batches(_widen_i64("nationkey", "s", "n"),
                     batch_format="pyarrow")

    joined = relational.hash_join_i64(
        slimmed, agg, key="nationkey",
        left_carry={"cents": pa.int64()},
        right_carry={"s": pa.int64(), "n": pa.int64()},
        P=relational.adaptive_parts(sf_dir))

    def above_partial(b: pa.Table) -> pa.Table:
        keep = _np(b["cents"]) * _np(b["n"]) > _np(b["s"])
        t = b.filter(pa.array(keep))
        nk = _np(t["nationkey"]).astype(np.int64)
        cents = _np(t["cents"]).astype(np.int64)
        ones = np.ones(len(nk), np.int64)
        keys, (sc, n) = _group_sums(nk, cents, ones)
        return pa.table({"nationkey": pa.array(keys, pa.int64()),
                         "above_cents": pa.array(sc, pa.int64()),
                         "n_above": pa.array(n, pa.int64())})

    return joined.map_batches(above_partial, batch_format="pyarrow") \
        .groupby("nationkey") \
        .aggregate(Sum("n_above", alias_name="n_above"),
                   Sum("above_cents", alias_name="above_cents")) \
        .map_batches(_widen_i64("nationkey", "n_above", "above_cents"),
                     batch_format="pyarrow")


# -------------------------------------------------- cohort analysis


def q_orders_cohort(sf_dir: str):
    """Cohort matrix: orders counted by (customer's first-order month,
    order month). The cohort map is a per-customer MIN aggregate
    (pre-collapsed per block), attached back with one hash join; the
    final count shuffles fused (cohort_ym, ym) int partials — output
    cardinality is months², constant in order volume."""
    from ray.data.aggregate import Min, Sum
    from ..stages import relational

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate"])

    def _ym(us: np.ndarray) -> np.ndarray:
        mc = us.astype("datetime64[us]").astype("datetime64[M]") \
            .astype(np.int64)
        return (1970 + mc // 12) * 100 + (mc % 12 + 1)

    def min_partial(b: pa.Table) -> pa.Table:
        ck = _np(b["o_custkey"]).astype(np.int64)
        od = _ts_us(b["o_orderdate"])
        order = np.argsort(ck, kind="stable")
        ck_s, od_s = ck[order], od[order]
        starts = np.ones(len(ck_s), bool)
        if len(ck_s):
            starts[1:] = ck_s[1:] != ck_s[:-1]
        idx = np.nonzero(starts)[0]
        return pa.table({
            "custkey": pa.array(ck_s[idx] if len(ck_s) else ck_s,
                                pa.int64()),
            "first_us": pa.array(np.minimum.reduceat(od_s, idx)
                                 if len(ck_s) else od_s, pa.int64()),
        })

    cohort = orders.map_batches(min_partial, batch_format="pyarrow") \
        .groupby("custkey").aggregate(Min("first_us",
                                          alias_name="first_us"))

    def cohort_ym(b: pa.Table) -> pa.Table:
        return pa.table({
            "custkey": pc.cast(b["custkey"], pa.int64()),
            "cohort_ym": pa.array(_ym(_np(b["first_us"])
                                      .astype(np.int64)), pa.int64()),
        })

    def ord_ym(b: pa.Table) -> pa.Table:
        return pa.table({
            "custkey": pc.cast(b["o_custkey"], pa.int64()),
            "ym": pa.array(_ym(_ts_us(b["o_orderdate"])), pa.int64()),
        })

    joined = relational.hash_join_i64(
        orders.map_batches(ord_ym, batch_format="pyarrow"),
        cohort.map_batches(cohort_ym, batch_format="pyarrow"),
        key="custkey",
        left_carry={"ym": pa.int64()},
        right_carry={"cohort_ym": pa.int64()},
        P=relational.adaptive_parts(sf_dir))

    def count_partial(b: pa.Table) -> pa.Table:
        fused = (_np(b["cohort_ym"]).astype(np.int64) << np.int64(20)) \
            | _np(b["ym"]).astype(np.int64)
        keys, (n,) = _group_sums(fused,
                                 np.ones(len(fused), np.int64))
        return pa.table({"cy": pa.array(keys, pa.int64()),
                         "n": pa.array(n, pa.int64())})

    agg = joined.map_batches(count_partial, batch_format="pyarrow") \
        .groupby("cy").aggregate(Sum("n", alias_name="n"))

    def unfuse(b: pa.Table) -> pa.Table:
        cy = _np(b["cy"]).astype(np.int64)
        return pa.table({
            "cohort_ym": pa.array(cy >> np.int64(20), pa.int64()),
            "ym": pa.array(cy & np.int64((1 << 20) - 1), pa.int64()),
            "n": pc.cast(b["n"], pa.int64()),
        })

    return agg.map_batches(unfuse, batch_format="pyarrow")


# ---------------------------------------------- inter-order gap stats


def q_order_gaps(sf_dir: str):
    """Days between consecutive orders of the same customer, aggregated
    per market segment (n_gaps, total, max). One custkey-hash shuffle +
    one lexsort computes per-CUSTOMER gap aggregates (every customer's
    history lives in one partition), the segment attaches with one hash
    join on those per-customer rows, and the final groupby sees
    segment-domain partials. Order dates are whole days, so gaps are
    exact integer day counts."""
    from ray.data.aggregate import Max, Sum
    from ..stages import relational

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])
    P = 32
    DAY_US = 86_400_000_000

    def addpart(b: pa.Table) -> pa.Table:
        ck = _np(b["o_custkey"]).astype(np.int64)
        return pa.table({
            "ck": pa.array(ck, pa.int64()),
            "okey": pc.cast(b["o_orderkey"], pa.int64()),
            "od_us": pa.array(_ts_us(b["o_orderdate"]), pa.int64()),
            "_part": pa.array((ck % P).astype(np.int32), pa.int32()),
        })

    def gaps(t: pa.Table) -> pa.Table:
        ck = _np(t["ck"])
        od = _np(t["od_us"])
        ok = _np(t["okey"])
        order = np.lexsort((ok, od, ck))
        ck_s, od_s = ck[order], od[order]
        same = np.zeros(len(ck_s), bool)
        if len(ck_s):
            same[1:] = ck_s[1:] == ck_s[:-1]
        gap = np.zeros(len(ck_s), np.int64)
        gap[1:] = (od_s[1:] - od_s[:-1]) // DAY_US
        g_ck, g_gap = ck_s[same], gap[same]
        keys, (n, s) = _group_sums(g_ck, np.ones(len(g_ck), np.int64),
                                   g_gap)
        # per-customer max gap: maximum.reduceat over the sorted runs
        order2 = np.argsort(g_ck, kind="stable")
        gk_s, gg_s = g_ck[order2], g_gap[order2]
        starts = np.ones(len(gk_s), bool)
        if len(gk_s):
            starts[1:] = gk_s[1:] != gk_s[:-1]
        idx = np.nonzero(starts)[0]
        mx = np.maximum.reduceat(gg_s, idx) if len(gk_s) else gg_s
        return pa.table({
            "custkey": pa.array(keys, pa.int64()),
            "n_gaps": pa.array(n, pa.int64()),
            "sum_gap_days": pa.array(s, pa.int64()),
            "max_gap_days": pa.array(mx, pa.int64()),
        })

    per_cust = orders.map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(gaps, batch_format="pyarrow")

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])

    def cust_slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "custkey": pc.cast(b["c_custkey"], pa.int64()),
            "c_mktsegment": b["c_mktsegment"],
        })

    joined = relational.hash_join_i64(
        per_cust, cust.map_batches(cust_slim, batch_format="pyarrow"),
        key="custkey",
        left_carry={"n_gaps": pa.int64(), "sum_gap_days": pa.int64(),
                    "max_gap_days": pa.int64()},
        right_carry={"c_mktsegment": pa.string()},
        P=relational.adaptive_parts(sf_dir))

    agg = joined.groupby("c_mktsegment").aggregate(
        Sum("n_gaps", alias_name="n_gaps"),
        Sum("sum_gap_days", alias_name="sum_gap_days"),
        Max("max_gap_days", alias_name="max_gap_days"))

    def widen(b: pa.Table) -> pa.Table:
        cols = {"c_mktsegment": b["c_mktsegment"]}
        for c in ("n_gaps", "sum_gap_days", "max_gap_days"):
            cols[c] = pc.cast(b[c], pa.int64())
        return pa.table(cols)

    return agg.map_batches(widen, batch_format="pyarrow")


# ------------------------------------- TPC-H Q7: cross-nation trade


def q_nation_trade(sf_dir: str):
    """Cross-nation trade matrix (TPC-H Q7 family): revenue per
    (customer nation, supplier nation, ship year) where the nations
    differ. Two dimension attaches on the fact table: the supplier →
    nation map is genuinely broadcast-small (one dict via one small
    read); the order → customer chain is two hash joins with per-block
    partial collapses between them. The final shuffle carries fused
    (c_nat, s_nat, year) int partials — nations² × years keys."""
    from ray.data.aggregate import Sum
    from ..stages import relational
    import pyarrow.parquet as pq

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    smap_keys = np.asarray(sup["s_suppkey"].to_pylist(), np.int64)
    smap_vals = np.asarray(sup["s_nationkey"].to_pylist(), np.int64)
    order = np.argsort(smap_keys)
    smap_keys, smap_vals = smap_keys[order], smap_vals[order]

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_shipdate", "l_extendedprice",
                                  "l_discount"])

    def li_slim(b: pa.Table) -> pa.Table:
        ok = _np(b["l_orderkey"]).astype(np.int64)
        sk = _np(b["l_suppkey"]).astype(np.int64)
        pos = np.minimum(np.searchsorted(smap_keys, sk),
                         len(smap_keys) - 1)
        if not (smap_keys[pos] == sk).all():
            raise ValueError(
                "nation_trade: lineitem references a suppkey missing "
                "from supplier.parquet (referential integrity broken)")
        snat = smap_vals[pos]
        year = _ts_us(b["l_shipdate"]).astype("datetime64[us]") \
            .astype("datetime64[Y]").astype(np.int64) + 1970
        ep = _np(b["l_extendedprice"])
        dc = _np(b["l_discount"])
        cents = np.floor(ep * (1.0 - dc) * 100.0 + 0.5).astype(np.int64)
        # collapse per (okey, snat, year) before the order join
        fused = (ok << np.int64(17)) | (snat << np.int64(12)) | \
            (year - 1970)
        keys, (sc,) = _group_sums(fused, cents)
        return pa.table({
            "okey": pa.array(keys >> np.int64(17), pa.int64()),
            "sy": pa.array(keys & np.int64((1 << 17) - 1), pa.int64()),
            "cents": pa.array(sc, pa.int64()),
        })

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])

    def ord_slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "okey": pc.cast(b["o_orderkey"], pa.int64()),
            "custkey": pc.cast(b["o_custkey"], pa.int64()),
        })

    j1 = relational.hash_join_i64(
        li.map_batches(li_slim, batch_format="pyarrow"),
        orders.map_batches(ord_slim, batch_format="pyarrow"),
        key="okey",
        left_carry={"sy": pa.int64(), "cents": pa.int64()},
        right_carry={"custkey": pa.int64()},
        P=relational.adaptive_parts(sf_dir))

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])

    def cust_slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "custkey": pc.cast(b["c_custkey"], pa.int64()),
            "cnat": pc.cast(b["c_nationkey"], pa.int64()),
        })

    j2 = relational.hash_join_i64(
        j1, cust.map_batches(cust_slim, batch_format="pyarrow"),
        key="custkey",
        left_carry={"sy": pa.int64(), "cents": pa.int64()},
        right_carry={"cnat": pa.int64()},
        P=relational.adaptive_parts(sf_dir))

    def final_partial(b: pa.Table) -> pa.Table:
        sy = _np(b["sy"]).astype(np.int64)
        snat = sy >> np.int64(12)
        year = (sy & np.int64((1 << 12) - 1)) + 1970
        cnat = _np(b["cnat"]).astype(np.int64)
        cents = _np(b["cents"]).astype(np.int64)
        keep = cnat != snat
        fused = ((cnat << np.int64(20)) | (snat << np.int64(12))
                 | (year - 1970))[keep]
        keys, (sc,) = _group_sums(fused, cents[keep])
        return pa.table({"k": pa.array(keys, pa.int64()),
                         "cents": pa.array(sc, pa.int64())})

    agg = j2.map_batches(final_partial, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("cents", alias_name="revenue_cents"))

    def unfuse(b: pa.Table) -> pa.Table:
        k = _np(b["k"]).astype(np.int64)
        return pa.table({
            "cust_nation": pa.array(k >> np.int64(20), pa.int64()),
            "supp_nation": pa.array((k >> np.int64(12))
                                    & np.int64(0xFF), pa.int64()),
            "ship_year": pa.array((k & np.int64((1 << 12) - 1)) + 1970,
                                  pa.int64()),
            "revenue_cents": pc.cast(b["revenue_cents"], pa.int64()),
        })

    return agg.map_batches(unfuse, batch_format="pyarrow")


# ----------------------------------- TPC-H Q6: forecast revenue delta


def q_forecast_revenue(sf_dir: str):
    """Single-scalar filter aggregate (TPC-H Q6 family): discounted
    revenue from 1997 lineitems with discount in [0.05, 0.07] and
    quantity < 24 — the pure streaming scan with one tiny reduce (each
    block collapses to ONE partial row)."""
    from ray.data.aggregate import Sum

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_shipdate", "l_quantity",
                                  "l_extendedprice", "l_discount"])
    y0 = np.datetime64("1997-01-01", "us").astype(np.int64)
    y1 = np.datetime64("1998-01-01", "us").astype(np.int64)

    def partial(b: pa.Table) -> pa.Table:
        ts = _ts_us(b["l_shipdate"])
        qty = _np(b["l_quantity"])
        dc = _np(b["l_discount"])
        dmilli = np.floor(dc * 1000 + 0.5).astype(np.int64)
        keep = (ts >= y0) & (ts < y1) & (qty < 24) \
            & (dmilli >= 50) & (dmilli <= 70)
        ep = _np(b["l_extendedprice"])[keep]
        cents = np.floor(ep * dc[keep] * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "g": pa.array([0], pa.int64()),
            "revenue_cents": pa.array([int(cents.sum())], pa.int64()),
            "n": pa.array([int(keep.sum())], pa.int64()),
        })

    agg = li.map_batches(partial, batch_format="pyarrow") \
        .groupby("g").aggregate(Sum("revenue_cents",
                                    alias_name="revenue_cents"),
                                Sum("n", alias_name="n"))

    def widen(b: pa.Table) -> pa.Table:
        return pa.table({
            "revenue_cents": pc.cast(b["revenue_cents"], pa.int64()),
            "n": pc.cast(b["n"], pa.int64()),
        })

    return agg.map_batches(widen, batch_format="pyarrow")


# -------------------------------- supplier concentration per brand


def q_brand_concentration(sf_dir: str):
    """Supply-concentration profile per brand: Σcnt and Σcnt² of
    per-supplier lineitem counts — the integer numerators of the
    Herfindahl index (HHI = Σ(cnt/total)² = sum_sq/n_items²), computed
    without a single float. Chain: fused (partkey, suppkey) count
    partials → brand attach → fused (brand, supplier) merge → per-brand
    square-sum partials. Every shuffle is bounded by a distinct
    domain."""
    from ray.data.aggregate import Sum
    from ..stages import relational
    from .queries_cstats import _chunk

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])

    def pair_partial(b: pa.Table) -> pa.Table:
        pk = _np(b["l_partkey"]).astype(np.int64)
        sk = _np(b["l_suppkey"]).astype(np.int64)
        fused = _fuse20(pk, sk, "(partkey, suppkey)")
        keys, (cnt,) = _group_sums(fused, np.ones(len(fused), np.int64))
        return pa.table({"pair": pa.array(keys, pa.int64()),
                         "cnt": pa.array(cnt, pa.int64())})

    pairs = li.map_batches(pair_partial, batch_format="pyarrow") \
        .groupby("pair").aggregate(Sum("cnt", alias_name="cnt"))

    def unfuse(b: pa.Table) -> pa.Table:
        fused = _np(b["pair"]).astype(np.int64)
        return pa.table({
            "partkey": pa.array(fused >> np.int64(20), pa.int64()),
            "suppkey": pa.array(fused & np.int64((1 << 20) - 1),
                                pa.int64()),
            "cnt": pc.cast(b["cnt"], pa.int64()),
        })

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand"])

    def part_slim(b: pa.Table) -> pa.Table:
        return pa.table({"partkey": pc.cast(b["p_partkey"], pa.int64()),
                         "p_brand": b["p_brand"]})

    joined = relational.hash_join_i64(
        pairs.map_batches(unfuse, batch_format="pyarrow"),
        part.map_batches(part_slim, batch_format="pyarrow"),
        key="partkey",
        left_carry={"suppkey": pa.int64(), "cnt": pa.int64()},
        right_carry={"p_brand": pa.string()},
        P=relational.adaptive_parts(sf_dir))

    def bs_partial(b: pa.Table) -> pa.Table:
        fused = _chunk(pc.binary_join_element_wise(
            _chunk(b["p_brand"]),
            _chunk(pc.cast(b["suppkey"], pa.string())), "\x1f"))
        enc = pc.dictionary_encode(fused)
        codes = _np(enc.indices).astype(np.int64)
        K = len(enc.dictionary)
        cnt = np.bincount(codes, weights=_np(b["cnt"]), minlength=K) \
            .astype(np.int64)
        return pa.table({"bs": enc.dictionary,
                         "cnt": pa.array(cnt, pa.int64())})

    bs = joined.map_batches(bs_partial, batch_format="pyarrow") \
        .groupby("bs").aggregate(Sum("cnt", alias_name="cnt"))

    def brand_partial(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b["bs"], "\x1f")
        brand = pc.list_element(parts, 0)
        brand = brand.combine_chunks() if isinstance(
            brand, pa.ChunkedArray) else brand
        enc = pc.dictionary_encode(brand)
        codes = _np(enc.indices).astype(np.int64)
        K = len(enc.dictionary)
        cnt = _np(b["cnt"]).astype(np.int64)
        return pa.table({
            "p_brand": enc.dictionary,
            "n_items": pa.array(np.bincount(codes, weights=cnt,
                                            minlength=K)
                                .astype(np.int64), pa.int64()),
            "sum_sq": pa.array(np.bincount(codes, weights=cnt * cnt,
                                           minlength=K)
                               .astype(np.int64), pa.int64()),
        })

    return bs.map_batches(brand_partial, batch_format="pyarrow") \
        .groupby("p_brand").aggregate(
            Sum("n_items", alias_name="n_items"),
            Sum("sum_sq", alias_name="sum_sq")) \
        .map_batches(lambda b: pa.table({
            "p_brand": b["p_brand"],
            "n_items": pc.cast(b["n_items"], pa.int64()),
            "sum_sq": pc.cast(b["sum_sq"], pa.int64())}),
            batch_format="pyarrow")


# ------------------------------------ sampling pushdown through a join


SAMPLE_JOIN_K = 100


def q_sample_join(sf_dir: str):
    """Uniform k-sample of the lineitem⋈orders JOIN RESULT computed
    WITHOUT materializing the join: the join is key-preserving (every
    lineitem matches exactly one order), so sampling the join output
    uniformly ≡ sampling lineitem rows uniformly and joining only the
    k survivors — the sampling-over-joins pushdown. Deterministic
    smallest-Knuth-hash sampling on the fused (orderkey, linenumber)
    row id; per-block partial top-k before one tiny sort+limit."""
    from ..stages import relational

    K = SAMPLE_JOIN_K
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber",
                                  "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        ok = _np(b["l_orderkey"]).astype(np.int64)
        ln = _np(b["l_linenumber"]).astype(np.int64)
        fused = (ok * 8 + ln).astype(np.uint64)
        h = ((fused * np.uint64(2654435761))
             % np.uint64(4294967296)).astype(np.int64)
        cents = _cents(_np(b["l_extendedprice"]))
        order = np.lexsort((ln, ok, h))[:K]
        return pa.table({
            "okey": pa.array(ok[order], pa.int64()),
            "l_linenumber": pa.array(ln[order], pa.int64()),
            "h": pa.array(h[order], pa.int64()),
            "cents": pa.array(cents[order], pa.int64()),
        })

    sample = li.map_batches(partial, batch_format="pyarrow") \
        .sort(["h", "okey", "l_linenumber"]).limit(K)

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])

    def ord_slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "okey": pc.cast(b["o_orderkey"], pa.int64()),
            "o_orderpriority": b["o_orderpriority"],
        })

    joined = relational.hash_join_i64(
        sample, orders.map_batches(ord_slim, batch_format="pyarrow"),
        key="okey",
        left_carry={"l_linenumber": pa.int64(), "h": pa.int64(),
                    "cents": pa.int64()},
        right_carry={"o_orderpriority": pa.string()},
        P=relational.adaptive_parts(sf_dir))

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": pc.cast(b["okey"], pa.int64()),
            "l_linenumber": pc.cast(b["l_linenumber"], pa.int64()),
            "h": pc.cast(b["h"], pa.int64()),
            "cents": pc.cast(b["cents"], pa.int64()),
            "o_orderpriority": b["o_orderpriority"],
        })

    return joined.map_batches(rename, batch_format="pyarrow")


# ----------------------------------------------------------- registry


QUERIES_REL = {
    "top_unshipped": q_top_unshipped,
    "returned_items": q_returned_items,
    "big_orders": q_big_orders,
    "brand_suppliers": q_brand_suppliers,
    "above_avg_balance": q_above_avg_balance,
    "orders_cohort": q_orders_cohort,
    "order_gaps": q_order_gaps,
    "sample_join": q_sample_join,
    "brand_concentration": q_brand_concentration,
    "nation_trade": q_nation_trade,
    "forecast_revenue": q_forecast_revenue,
}


ORACLE_SQL_REL = {
    "top_unshipped": """
WITH rev AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100
                             + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM lineitem
  WHERE l_shipdate > TIMESTAMP '1998-03-15'
  GROUP BY l_orderkey)
SELECT o_orderkey, revenue_cents,
       CAST(epoch_us(o_orderdate) AS BIGINT) AS od_us, o_orderpriority
FROM rev JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderdate < TIMESTAMP '1998-03-15'
  AND o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_mktsegment = 'BUILDING')
ORDER BY revenue_cents DESC, o_orderkey LIMIT 10""",
    "returned_items": """
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100
                             + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1996-07-01'
  GROUP BY o_custkey)
SELECT c_custkey, c_name, n_name, revenue_cents
FROM rev
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
ORDER BY revenue_cents DESC, c_custkey LIMIT 20""",
    "big_orders": """
WITH q AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) > 250)
SELECT c_name, c_custkey, o_orderkey,
       CAST(epoch_us(o_orderdate) AS BIGINT) AS od_us,
       CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents,
       sum_qty
FROM q
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY sum_qty DESC, o_orderkey""",
    "brand_suppliers": """
SELECT p_brand, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand""",
    "above_avg_balance": """
WITH c AS (SELECT c_nationkey,
                  CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
           FROM customer),
a AS (SELECT c_nationkey AS nk, CAST(SUM(cents) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM c GROUP BY c_nationkey)
SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_above,
       CAST(SUM(cents) AS BIGINT) AS above_cents
FROM c JOIN a ON c_nationkey = nk
WHERE cents * n > s
GROUP BY c_nationkey""",
    "orders_cohort": """
WITH f AS (SELECT o_custkey, MIN(o_orderdate) AS fd
           FROM orders GROUP BY o_custkey)
SELECT CAST(year(fd) * 100 + month(fd) AS BIGINT) AS cohort_ym,
       CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders JOIN f USING (o_custkey)
GROUP BY cohort_ym, ym""",
    "order_gaps": """
WITH g AS (SELECT o_custkey AS ck, epoch_us(o_orderdate) AS od,
                  LAG(epoch_us(o_orderdate)) OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS prev
           FROM orders),
d AS (SELECT ck, (od - prev) // 86400000000 AS gap
      FROM g WHERE prev IS NOT NULL)
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(SUM(gap) AS BIGINT) AS sum_gap_days,
       CAST(MAX(gap) AS BIGINT) AS max_gap_days
FROM d JOIN customer ON ck = c_custkey
GROUP BY c_mktsegment""",
    "sample_join": """
WITH s AS (
  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         CAST(((l_orderkey * 8 + l_linenumber) * 2654435761)
              % 4294967296 AS BIGINT) AS h,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem
  ORDER BY h, l_orderkey, l_linenumber LIMIT 100)
SELECT l_orderkey, l_linenumber, h, cents, o_orderpriority
FROM s JOIN orders ON l_orderkey = o_orderkey""",
    "nation_trade": """
SELECT CAST(c_nationkey AS BIGINT) AS cust_nation,
       CAST(s_nationkey AS BIGINT) AS supp_nation,
       CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100
                           + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE c_nationkey <> s_nationkey
GROUP BY c_nationkey, s_nationkey, ship_year""",
    "forecast_revenue": """
SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 100 + 0.5)
                AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_quantity < 24
  AND CAST(FLOOR(l_discount * 1000 + 0.5) AS BIGINT) BETWEEN 50 AND 70""",
    "brand_concentration": """
WITH c AS (SELECT p_brand, l_suppkey, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM lineitem JOIN part ON l_partkey = p_partkey
           GROUP BY p_brand, l_suppkey)
SELECT p_brand, CAST(SUM(cnt) AS BIGINT) AS n_items,
       CAST(SUM(cnt * cnt) AS BIGINT) AS sum_sq
FROM c GROUP BY p_brand""",
}
