"""Round-4 relational widening: the remaining TPC-H query shapes the
r3 family (queries_rel.py: Q1/Q3/Q4/Q10/Q14/Q18 + star/cohort/gap) did
not cover — multi-hop region joins (Q5), market share (Q8), product
profit (Q9), left-join distribution (Q13), argmax-with-ties (Q15),
correlated per-group average threshold (Q17), OR-of-ANDs predicate
pushdown (Q19), only-late-supplier exists/not-exists (Q21), min-cost
argmin with fused tie-breaks (Q2), and anti-join prospect screening
(Q22) — each adapted to the synthetic schema's available columns (no
partsupp / comment / receiptdate tables here; the adaptation is noted
per query).

Shared scale contract (same as queries_rel.py): per-block partial
aggregation (_group_sums) before every shuffle; every join through
stages/relational.hash_join_i64 (union + part-groupby + searchsorted)
with adaptive partition counts; money/quantity integer-ized per ROW with
floor(x*100 + 0.5) on BOTH engines and aggregated with integer sums
(repo float-parity rule); correlated-average comparisons done by integer
cross-multiplication, never division; tiny dimensions (nation 25 rows,
region 5 rows, supplier SF*100 rows — the canonical broadcastable dims)
read on the driver and shipped in task closures.

Reference scope note: the reference engine (thomersch/grandine) has no
relational layer; these extend the training-data-pipeline surface
(SURVEY.md §2.7b) with DuckDB as the parity oracle.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from .queries_ext import _fuse20, _group_sums, _np, _ts_us
from .queries_rel import _widen_i64


def _nation_region(sf_dir: str):
    """Driver-side read of the two tiny dims: returns (nationkey →
    n_name dict, nationkey → regionname dict)."""
    nt = pq.read_table(f"{sf_dir}/nation.parquet")
    rt = pq.read_table(f"{sf_dir}/region.parquet")
    rname = dict(zip(_np(rt["r_regionkey"]).astype(int),
                     rt["r_name"].to_pylist()))
    nk = _np(nt["n_nationkey"]).astype(int)
    names = dict(zip(nk, nt["n_name"].to_pylist()))
    regions = {k: rname[r] for k, r in
               zip(nk, _np(nt["n_regionkey"]).astype(int))}
    return names, regions


def _supplier_lookup(sf_dir: str, *cols):
    """Dense suppkey-indexed numpy lookup arrays for the supplier dim
    (SF*100 rows — broadcastable at any realistic SF; shipped once per
    task closure, never per batch)."""
    st = pq.read_table(f"{sf_dir}/supplier.parquet",
                       columns=["s_suppkey", *cols])
    sk = _np(st["s_suppkey"]).astype(np.int64)
    hi = int(sk.max()) + 1 if len(sk) else 1
    outs = []
    for c in cols:
        if c == "s_name":
            arr = np.empty(hi, object)
            arr[sk] = st[c].to_pylist()
        elif c == "s_acctbal":
            arr = np.zeros(hi, np.int64)
            arr[sk] = np.floor(_np(st[c]) * 100.0 + 0.5).astype(np.int64)
        else:
            arr = np.zeros(hi, np.int64)
            arr[sk] = _np(st[c]).astype(np.int64)
        outs.append(arr)
    return outs if len(outs) > 1 else outs[0]


def _rev_cents(t: pa.Table) -> np.ndarray:
    ep = _np(t["l_extendedprice"])
    dc = _np(t["l_discount"])
    return np.floor(ep * (1.0 - dc) * 100.0 + 0.5).astype(np.int64)


# ------------------------------------- TPC-H Q5: local supplier volume


Q5_REGION = "ASIA"
Q5_FROM = np.datetime64("1996-01-01", "us").astype(np.int64)
Q5_TO = np.datetime64("1997-01-01", "us").astype(np.int64)


def q_local_supplier_volume(sf_dir: str):
    """Revenue by nation where the customer and the lineitem's supplier
    share an ASIA nation, over a one-year order window (TPC-H Q5). Two
    hash exchanges: orders (date-windowed) semi-join the region's
    customers carrying the customer nation; lineitem collapses per block
    to (okey, supp_nation, cents) partials keyed on a fused id before
    joining the per-order customer nation; the equality filter and the
    per-nation reduce see only collapsed rows."""
    from ray.data.aggregate import Sum
    from ..stages import relational

    P = relational.adaptive_parts(sf_dir)
    names, regions = _nation_region(sf_dir)
    asia = np.array(sorted(k for k, r in regions.items() if r == Q5_REGION),
                    np.int64)
    snat = _supplier_lookup(sf_dir, "s_nationkey")

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])

    def cust_slim(b: pa.Table) -> pa.Table:
        nk = _np(b["c_nationkey"]).astype(np.int64)
        keep = np.isin(nk, asia)
        return pa.table({
            "custkey": pa.array(_np(b["c_custkey"]).astype(np.int64)[keep]),
            "cust_nation": pa.array(nk[keep]),
        })

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def ord_slim(b: pa.Table) -> pa.Table:
        od = _ts_us(b["o_orderdate"])
        keep = (od >= Q5_FROM) & (od < Q5_TO)
        return pa.table({
            "custkey": pa.array(
                _np(b["o_custkey"]).astype(np.int64)[keep]),
            "okey": pa.array(_np(b["o_orderkey"]).astype(np.int64)[keep]),
        })

    seg = relational.hash_join_i64(
        orders.map_batches(ord_slim, batch_format="pyarrow"),
        cust.map_batches(cust_slim, batch_format="pyarrow"),
        key="custkey", left_carry={"okey": pa.int64()},
        right_carry={"cust_nation": pa.int64()}, P=P)

    def seg_r(b: pa.Table) -> pa.Table:
        return pa.table({"okey": pc.cast(b["okey"], pa.int64()),
                         "cust_nation": pc.cast(b["cust_nation"],
                                                pa.int64())})

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])

    def li_partial(b: pa.Table) -> pa.Table:
        ok = _np(b["l_orderkey"]).astype(np.int64)
        sn = snat[_np(b["l_suppkey"]).astype(np.int64)]
        cents = _rev_cents(b)
        keep = np.isin(sn, asia)
        fused = _fuse20(ok[keep], sn[keep], "q5 (okey, nation)")
        keys, (c,) = _group_sums(fused, cents[keep])
        return pa.table({
            "okey": pa.array(keys >> np.int64(20), pa.int64()),
            "supp_nation": pa.array(keys & np.int64((1 << 20) - 1),
                                    pa.int64()),
            "cents": pa.array(c, pa.int64()),
        })

    j = relational.hash_join_i64(
        li.map_batches(li_partial, batch_format="pyarrow"),
        seg.map_batches(seg_r, batch_format="pyarrow"),
        key="okey",
        left_carry={"supp_nation": pa.int64(), "cents": pa.int64()},
        right_carry={"cust_nation": pa.int64()}, P=P)

    def final_partial(b: pa.Table) -> pa.Table:
        sn = _np(b["supp_nation"])
        keep = sn == _np(b["cust_nation"])
        keys, (c,) = _group_sums(sn[keep], _np(b["cents"])[keep])
        return pa.table({"nation": pa.array(keys, pa.int64()),
                         "revenue_cents": pa.array(c, pa.int64())})

    agg = j.map_batches(final_partial, batch_format="pyarrow") \
        .groupby("nation") \
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))

    def name(b: pa.Table) -> pa.Table:
        nk = _np(b["nation"]).astype(int)
        return pa.table({
            "n_name": pa.array([names[k] for k in nk], pa.string()),
            "revenue_cents": pc.cast(b["revenue_cents"], pa.int64()),
        })

    return agg.map_batches(name, batch_format="pyarrow")


# ------------------------------------------- TPC-H Q8: market share


Q8_REGION = "ASIA"
Q8_NATION = 7              # NATION_7 sits in ASIA (regionkey 2)
Q8_TYPE = "ECONOMY"
Q8_FROM = np.datetime64("1996-01-01", "us").astype(np.int64)
Q8_TO = np.datetime64("1998-01-01", "us").astype(np.int64)


def q_market_share(sf_dir: str):
    """NATION_7's share of the ASIA ECONOMY-part market by order year
    (TPC-H Q8), emitted as the integer numerator/denominator cents pair
    (share = nation_cents / total_cents) instead of a cross-library
    float division. lineitem semi-joins the type-filtered part keys,
    tags each row's supplier nation from the broadcast supplier dim,
    and collapses to (okey, cents, nation_cents) before the per-order
    (customer-region × order-year) join."""
    from ray.data.aggregate import Sum
    from ..stages import relational

    P = relational.adaptive_parts(sf_dir)
    _, regions = _nation_region(sf_dir)
    asia = np.array(sorted(k for k, r in regions.items() if r == Q8_REGION),
                    np.int64)
    snat = _supplier_lookup(sf_dir, "s_nationkey")

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_type"])

    def part_keys(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["p_type"], Q8_TYPE))
        return pa.table({"partkey": pc.cast(t["p_partkey"], pa.int64())})

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])

    def li_slim(b: pa.Table) -> pa.Table:
        sn = snat[_np(b["l_suppkey"]).astype(np.int64)]
        cents = _rev_cents(b)
        return pa.table({
            "partkey": pc.cast(b["l_partkey"], pa.int64()),
            "okey": pc.cast(b["l_orderkey"], pa.int64()),
            "cents": pa.array(cents, pa.int64()),
            "ncents": pa.array(np.where(sn == Q8_NATION, cents, 0),
                               pa.int64()),
        })

    typed = relational.hash_join_i64(
        li.map_batches(li_slim, batch_format="pyarrow"),
        part.map_batches(part_keys, batch_format="pyarrow"),
        key="partkey",
        left_carry={"okey": pa.int64(), "cents": pa.int64(),
                    "ncents": pa.int64()},
        right_carry={}, how="semi", P=P)

    def li_partial(b: pa.Table) -> pa.Table:
        keys, (c, nc) = _group_sums(_np(b["okey"]), _np(b["cents"]),
                                    _np(b["ncents"]))
        return pa.table({"okey": pa.array(keys, pa.int64()),
                         "cents": pa.array(c, pa.int64()),
                         "ncents": pa.array(nc, pa.int64())})

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])

    def cust_keys(b: pa.Table) -> pa.Table:
        nk = _np(b["c_nationkey"]).astype(np.int64)
        keep = np.isin(nk, asia)
        return pa.table({"custkey": pa.array(
            _np(b["c_custkey"]).astype(np.int64)[keep])})

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def ord_slim(b: pa.Table) -> pa.Table:
        od = _ts_us(b["o_orderdate"])
        keep = (od >= Q8_FROM) & (od < Q8_TO)
        year = _np(pc.year(b["o_orderdate"])).astype(np.int64)[keep]
        return pa.table({
            "custkey": pa.array(_np(b["o_custkey"]).astype(np.int64)[keep]),
            "okey": pa.array(_np(b["o_orderkey"]).astype(np.int64)[keep]),
            "year": pa.array(year, pa.int64()),
        })

    seg = relational.hash_join_i64(
        orders.map_batches(ord_slim, batch_format="pyarrow"),
        cust.map_batches(cust_keys, batch_format="pyarrow"),
        key="custkey",
        left_carry={"okey": pa.int64(), "year": pa.int64()},
        right_carry={}, how="semi", P=P)

    def seg_r(b: pa.Table) -> pa.Table:
        return pa.table({"okey": pc.cast(b["okey"], pa.int64()),
                         "year": pc.cast(b["year"], pa.int64())})

    j = relational.hash_join_i64(
        typed.map_batches(li_partial, batch_format="pyarrow"),
        seg.map_batches(seg_r, batch_format="pyarrow"),
        key="okey",
        left_carry={"cents": pa.int64(), "ncents": pa.int64()},
        right_carry={"year": pa.int64()}, P=P)

    def final_partial(b: pa.Table) -> pa.Table:
        keys, (c, nc) = _group_sums(_np(b["year"]), _np(b["cents"]),
                                    _np(b["ncents"]))
        return pa.table({"year": pa.array(keys, pa.int64()),
                         "total_cents": pa.array(c, pa.int64()),
                         "nation_cents": pa.array(nc, pa.int64())})

    return j.map_batches(final_partial, batch_format="pyarrow") \
        .groupby("year") \
        .aggregate(Sum("total_cents", alias_name="total_cents"),
                   Sum("nation_cents", alias_name="nation_cents")) \
        .map_batches(_widen_i64("year", "total_cents", "nation_cents"),
                     batch_format="pyarrow")


# -------------------------------- TPC-H Q13: customer order distribution


Q13_EXCLUDE = "4-NOT SPECIFIED"


def q_cust_order_counts(sf_dir: str):
    """Distribution of customers by how many qualifying orders they
    placed, INCLUDING zero-order customers (TPC-H Q13's left join —
    the priority filter stands in for the reference query's comment
    filter; this schema carries no o_comment). Orders collapse per block
    to per-customer counts, one groupby merges them, and the customer
    table left-joins the counts so unmatched customers surface as
    count 0; the final histogram reduce is over counts, not rows."""
    from ray.data.aggregate import Sum
    from ..stages import relational

    P = relational.adaptive_parts(sf_dir)
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderpriority"])

    def ord_partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.not_equal(b["o_orderpriority"], Q13_EXCLUDE))
        keys, (c,) = _group_sums(_np(t["o_custkey"]).astype(np.int64),
                                 np.ones(len(t), np.int64))
        return pa.table({"custkey": pa.array(keys, pa.int64()),
                         "cnt": pa.array(c, pa.int64())})

    counts = orders.map_batches(ord_partial, batch_format="pyarrow") \
        .groupby("custkey").aggregate(Sum("cnt", alias_name="cnt")) \
        .map_batches(_widen_i64("custkey", "cnt"), batch_format="pyarrow")

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])

    def cust_keys(b: pa.Table) -> pa.Table:
        return pa.table({"custkey": pc.cast(b["c_custkey"], pa.int64())})

    j = relational.hash_join_i64(
        cust.map_batches(cust_keys, batch_format="pyarrow"),
        counts, key="custkey", left_carry={},
        right_carry={"cnt": pa.int64()}, how="left", P=P)

    def hist_partial(b: pa.Table) -> pa.Table:
        cnt = _np(pc.fill_null(b["cnt"], 0)).astype(np.int64)
        keys, (c,) = _group_sums(cnt, np.ones(len(cnt), np.int64))
        return pa.table({"n_orders": pa.array(keys, pa.int64()),
                         "n_custs": pa.array(c, pa.int64())})

    return j.map_batches(hist_partial, batch_format="pyarrow") \
        .groupby("n_orders").aggregate(Sum("n_custs",
                                           alias_name="n_custs")) \
        .map_batches(_widen_i64("n_orders", "n_custs"),
                     batch_format="pyarrow") \
        .sort(["n_custs", "n_orders"], descending=[True, True])


# ------------------------------------------ TPC-H Q15: top supplier(s)


Q15_FROM = np.datetime64("1996-04-01", "us").astype(np.int64)
Q15_TO = np.datetime64("1996-07-01", "us").astype(np.int64)


def q_top_supplier(sf_dir: str):
    """Supplier(s) with the maximum revenue in a quarter, ties kept
    (TPC-H Q15's view + MAX subquery). One exchange builds the tiny
    per-supplier revenue aggregate; Dataset.max pulls the single scalar
    to the driver (the only driver-side state) and a filter keeps the
    tied winners."""
    from ray.data.aggregate import Sum
    sname = _supplier_lookup(sf_dir, "s_name")

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_suppkey", "l_shipdate",
                                  "l_extendedprice", "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        ts = _ts_us(b["l_shipdate"])
        keep = (ts >= Q15_FROM) & (ts < Q15_TO)
        t = b.filter(pa.array(keep))
        keys, (c,) = _group_sums(_np(t["l_suppkey"]).astype(np.int64),
                                 _rev_cents(t))
        return pa.table({"suppkey": pa.array(keys, pa.int64()),
                         "revenue_cents": pa.array(c, pa.int64())})

    rev = li.map_batches(partial, batch_format="pyarrow") \
        .groupby("suppkey") \
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents")) \
        .map_batches(_widen_i64("suppkey", "revenue_cents"),
                     batch_format="pyarrow") \
        .materialize()           # tiny (one row per supplier); read twice
    mx = rev.max("revenue_cents")

    def winners(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["revenue_cents"], mx))
        sk = _np(t["suppkey"]).astype(np.int64)
        return pa.table({
            "suppkey": pa.array(sk, pa.int64()),
            "s_name": pa.array(list(sname[sk]), pa.string()),
            "revenue_cents": pc.cast(t["revenue_cents"], pa.int64()),
        })

    return rev.map_batches(winners, batch_format="pyarrow").sort("suppkey")


# ------------------------- TPC-H Q17: small-quantity revenue (correlated)


Q17_BRAND = "Brand#3"


def q_small_qty_revenue(sf_dir: str):
    """Total extended-price cents of Brand#3 lineitems whose quantity is
    below 20% of that part's average quantity (TPC-H Q17's correlated
    per-part average — the container filter is dropped; this schema has
    no p_container). The threshold compare is the integer
    cross-multiplication 5*q*cnt < sum_q (quantities are integral), so
    no float division ever crosses engines. Pass 1 builds per-part
    (sum_q, cnt); pass 2 re-reads the pruned lineitem columns and joins
    the tiny stats — two cheap scans instead of a pinned intermediate."""
    from ray.data.aggregate import Sum
    from ..stages import relational

    P = relational.adaptive_parts(sf_dir)
    pt = pq.read_table(f"{sf_dir}/part.parquet",
                       columns=["p_partkey", "p_brand"])
    bkeys = np.sort(_np(pt["p_partkey"]).astype(np.int64)[
        _np(pc.equal(pt["p_brand"], Q17_BRAND))])

    def li_slim(b: pa.Table) -> pa.Table:
        pk = _np(b["l_partkey"]).astype(np.int64)
        keep = np.isin(pk, bkeys)
        t = b.filter(pa.array(keep))
        return pa.table({
            "partkey": pa.array(pk[keep], pa.int64()),
            "q": pa.array(_np(t["l_quantity"]).astype(np.int64),
                          pa.int64()),
            "cents": pa.array(np.floor(_np(t["l_extendedprice"]) * 100.0
                                       + 0.5).astype(np.int64), pa.int64()),
        })

    def rows(): return rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"]) \
        .map_batches(li_slim, batch_format="pyarrow")

    def stat_partial(b: pa.Table) -> pa.Table:
        keys, (sq, n) = _group_sums(_np(b["partkey"]), _np(b["q"]),
                                    np.ones(len(b), np.int64))
        return pa.table({"partkey": pa.array(keys, pa.int64()),
                         "sum_q": pa.array(sq, pa.int64()),
                         "cnt": pa.array(n, pa.int64())})

    stats = rows().map_batches(stat_partial, batch_format="pyarrow") \
        .groupby("partkey") \
        .aggregate(Sum("sum_q", alias_name="sum_q"),
                   Sum("cnt", alias_name="cnt")) \
        .map_batches(_widen_i64("partkey", "sum_q", "cnt"),
                     batch_format="pyarrow")

    j = relational.hash_join_i64(
        rows(), stats, key="partkey",
        left_carry={"q": pa.int64(), "cents": pa.int64()},
        right_carry={"sum_q": pa.int64(), "cnt": pa.int64()}, P=P)

    def total(b: pa.Table) -> pa.Table:
        keep = 5 * _np(b["q"]) * _np(b["cnt"]) < _np(b["sum_q"])
        return pa.table({
            "g": pa.array([0], pa.int64()),
            "revenue_cents": pa.array([int(_np(b["cents"])[keep].sum())],
                                      pa.int64()),
            "n": pa.array([int(keep.sum())], pa.int64()),
        })

    return j.map_batches(total, batch_format="pyarrow") \
        .groupby("g") \
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"),
                   Sum("n", alias_name="n")) \
        .map_batches(lambda b: pa.table({
            "revenue_cents": pc.cast(b["revenue_cents"], pa.int64()),
            "n": pc.cast(b["n"], pa.int64())}), batch_format="pyarrow")


# ---------------------------- TPC-H Q19: OR-of-ANDs predicate revenue


Q19_PREDS = (          # (brand, max size, qty lo, qty hi)
    ("Brand#1", 5, 1, 11),
    ("Brand#2", 10, 10, 20),
    ("Brand#3", 15, 20, 30),
)


def q_or_predicates_revenue(sf_dir: str):
    """Revenue matching any of three (brand, size-range, quantity-range)
    conjunctions (TPC-H Q19's OR-of-ANDs — shipmode/shipinstruct legs
    dropped; not in this schema). The part side ships only the three
    brands' (partkey, pred-id, size) rows into the hash join; the OR
    evaluation is one vectorized pass over the joined block and the
    result is a single global (revenue_cents, n) row."""
    from ray.data.aggregate import Sum
    from ..stages import relational

    P = relational.adaptive_parts(sf_dir)
    brands = [p[0] for p in Q19_PREDS]
    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand", "p_size"])

    def part_slim(b: pa.Table) -> pa.Table:
        pid = np.full(len(b), -1, np.int64)
        for i, brand in enumerate(brands):       # 3 vectorized passes
            pid[_np(pc.equal(b["p_brand"], brand))] = i
        keep = pid >= 0
        return pa.table({
            "partkey": pa.array(
                _np(b["p_partkey"]).astype(np.int64)[keep]),
            "pred": pa.array(pid[keep], pa.int64()),
            "size": pa.array(_np(b["p_size"]).astype(np.int64)[keep]),
        })

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice", "l_discount"])

    def li_slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "partkey": pc.cast(b["l_partkey"], pa.int64()),
            "q": pa.array(_np(b["l_quantity"]).astype(np.int64),
                          pa.int64()),
            "cents": pa.array(_rev_cents(b), pa.int64()),
        })

    j = relational.hash_join_i64(
        li.map_batches(li_slim, batch_format="pyarrow"),
        part.map_batches(part_slim, batch_format="pyarrow"),
        key="partkey",
        left_carry={"q": pa.int64(), "cents": pa.int64()},
        right_carry={"pred": pa.int64(), "size": pa.int64()}, P=P)

    def total(b: pa.Table) -> pa.Table:
        q, pid, size = _np(b["q"]), _np(b["pred"]), _np(b["size"])
        keep = np.zeros(len(q), bool)
        for i, (_, smax, qlo, qhi) in enumerate(Q19_PREDS):
            keep |= (pid == i) & (size >= 1) & (size <= smax) \
                & (q >= qlo) & (q <= qhi)
        return pa.table({
            "g": pa.array([0], pa.int64()),
            "revenue_cents": pa.array([int(_np(b["cents"])[keep].sum())],
                                      pa.int64()),
            "n": pa.array([int(keep.sum())], pa.int64()),
        })

    return j.map_batches(total, batch_format="pyarrow") \
        .groupby("g") \
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"),
                   Sum("n", alias_name="n")) \
        .map_batches(lambda b: pa.table({
            "revenue_cents": pc.cast(b["revenue_cents"], pa.int64()),
            "n": pc.cast(b["n"], pa.int64())}), batch_format="pyarrow")


# --------------------- TPC-H Q21: the only-late supplier per F-order


Q21_LATE_US = np.int64(60) * 86_400_000_000    # ship > orderdate + 60d


def q_waiting_suppliers(sf_dir: str):
    """Suppliers who were the ONLY late supplier on a multi-supplier
    finished order, ranked by how often (TPC-H Q21's exists/not-exists
    pair — 'late' here is shipdate > orderdate + 60 days; this schema
    has no receipt/commit dates). The exists-pair collapses to integer
    aggregates: per (order, supplier) a late flag, then per order
    (n_suppliers, n_late, Σ late*suppkey) — when exactly one supplier
    is late, that sum IS its key. Three bounded exchanges, no
    per-order group iteration anywhere."""
    from ray.data.aggregate import Sum
    from ..stages import relational

    P = relational.adaptive_parts(sf_dir)
    sname = _supplier_lookup(sf_dir, "s_name")

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderstatus",
                                      "o_orderdate"])

    def ord_slim(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["o_orderstatus"], "F"))
        return pa.table({
            "okey": pc.cast(t["o_orderkey"], pa.int64()),
            "od_us": pa.array(_ts_us(t["o_orderdate"]), pa.int64()),
        })

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_shipdate"])

    def li_slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "okey": pc.cast(b["l_orderkey"], pa.int64()),
            "suppkey": pc.cast(b["l_suppkey"], pa.int64()),
            "ship_us": pa.array(_ts_us(b["l_shipdate"]), pa.int64()),
        })

    j = relational.hash_join_i64(
        li.map_batches(li_slim, batch_format="pyarrow"),
        orders.map_batches(ord_slim, batch_format="pyarrow"),
        key="okey",
        left_carry={"suppkey": pa.int64(), "ship_us": pa.int64()},
        right_carry={"od_us": pa.int64()}, P=P)

    def pair_partial(b: pa.Table) -> pa.Table:
        ok = _np(b["okey"])
        sk = _np(b["suppkey"])
        late = (_np(b["ship_us"]) > _np(b["od_us"]) + Q21_LATE_US) \
            .astype(np.int64)
        fused = _fuse20(ok, sk, "q21 (okey, suppkey)")
        keys, (lt,) = _group_sums(fused, late)
        return pa.table({"pair": pa.array(keys, pa.int64()),
                         "late": pa.array(lt, pa.int64())})

    pairs = j.map_batches(pair_partial, batch_format="pyarrow") \
        .groupby("pair").aggregate(Sum("late", alias_name="late")) \
        .map_batches(_widen_i64("pair", "late"), batch_format="pyarrow")

    def order_partial(b: pa.Table) -> pa.Table:
        fused = _np(b["pair"])
        ok = fused >> np.int64(20)
        sk = fused & np.int64((1 << 20) - 1)
        late = (_np(b["late"]) > 0).astype(np.int64)
        keys, (n, nl, lsk) = _group_sums(
            ok, np.ones(len(ok), np.int64), late, late * sk)
        return pa.table({"okey": pa.array(keys, pa.int64()),
                         "n": pa.array(n, pa.int64()),
                         "nlate": pa.array(nl, pa.int64()),
                         "lsk": pa.array(lsk, pa.int64())})

    per_order = pairs.map_batches(order_partial, batch_format="pyarrow") \
        .groupby("okey") \
        .aggregate(Sum("n", alias_name="n"),
                   Sum("nlate", alias_name="nlate"),
                   Sum("lsk", alias_name="lsk"))

    def wait_partial(b: pa.Table) -> pa.Table:
        n = _np(pc.cast(b["n"], pa.int64()))
        nl = _np(pc.cast(b["nlate"], pa.int64()))
        sk = _np(pc.cast(b["lsk"], pa.int64()))
        keep = (n >= 2) & (nl == 1)
        keys, (c,) = _group_sums(sk[keep], np.ones(int(keep.sum()),
                                                   np.int64))
        return pa.table({"suppkey": pa.array(keys, pa.int64()),
                         "waits": pa.array(c, pa.int64())})

    agg = per_order.map_batches(wait_partial, batch_format="pyarrow") \
        .groupby("suppkey").aggregate(Sum("waits", alias_name="waits")) \
        .map_batches(_widen_i64("suppkey", "waits"),
                     batch_format="pyarrow")

    def name(b: pa.Table) -> pa.Table:
        sk = _np(b["suppkey"]).astype(np.int64)
        return pa.table({
            "suppkey": pa.array(sk, pa.int64()),
            "s_name": pa.array(list(sname[sk]), pa.string()),
            "waits": pc.cast(b["waits"], pa.int64()),
        })

    return agg.map_batches(name, batch_format="pyarrow") \
        .sort(["waits", "s_name"], descending=[True, False]).limit(20)


# ----------------------- TPC-H Q22: anti-join prospect screening


Q22_CODES = (1, 3, 5)          # c_custkey % 7 stands in for phone prefix
Q22_CUTOFF = np.datetime64("2000-01-01", "us").astype(np.int64)


def q_sales_opportunity(sf_dir: str):
    """Per country-code counts and balance sums of above-average-balance
    customers with no order since the cutoff (TPC-H Q22 — the custkey%7
    code stands in for the phone country prefix, and 'no recent order'
    replaces 'no order ever': every synthetic customer has at least one
    lifetime order, which would make the pure anti join vacuously
    empty). The global positive-balance average is the integer pair
    (Σcents, n) pulled once to the driver; the membership test is the
    anti join against recent-order custkeys and the threshold is the
    cross-multiply cents*n > Σcents."""
    from ray.data.aggregate import Sum
    from ..stages import relational

    P = relational.adaptive_parts(sf_dir)
    codes = np.array(Q22_CODES, np.int64)
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_acctbal"])

    def cust_slim(b: pa.Table) -> pa.Table:
        ck = _np(b["c_custkey"]).astype(np.int64)
        keep = np.isin(ck % np.int64(7), codes)
        cents = np.floor(_np(b["c_acctbal"])[keep] * 100.0 + 0.5) \
            .astype(np.int64)
        return pa.table({"custkey": pa.array(ck[keep], pa.int64()),
                         "cents": pa.array(cents, pa.int64())})

    slim = cust.map_batches(cust_slim, batch_format="pyarrow")

    def avg_partial(b: pa.Table) -> pa.Table:
        c = _np(b["cents"])
        pos = c[c > 0]
        return pa.table({"g": pa.array([0], pa.int64()),
                         "s": pa.array([int(pos.sum())], pa.int64()),
                         "n": pa.array([len(pos)], pa.int64())})

    row = slim.map_batches(avg_partial, batch_format="pyarrow") \
        .groupby("g").aggregate(Sum("s", alias_name="s"),
                                Sum("n", alias_name="n")).take(1)[0]
    s_tot, n_tot = int(row["s"]), int(row["n"])

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate"])

    def ord_keys(b: pa.Table) -> pa.Table:
        keep = _ts_us(b["o_orderdate"]) >= Q22_CUTOFF
        return pa.table({"custkey": pa.array(
            _np(b["o_custkey"]).astype(np.int64)[keep], pa.int64())})

    rich = slim.map_batches(
        lambda b: b.filter(pa.array(
            _np(b["cents"]) * n_tot > s_tot)), batch_format="pyarrow")

    no_orders = relational.hash_join_i64(
        rich, orders.map_batches(ord_keys, batch_format="pyarrow"),
        key="custkey", left_carry={"cents": pa.int64()},
        right_carry={}, how="anti", P=P)

    def code_partial(b: pa.Table) -> pa.Table:
        code = _np(b["custkey"]) % np.int64(7)
        keys, (n, c) = _group_sums(code, np.ones(len(code), np.int64),
                                   _np(b["cents"]))
        return pa.table({"code": pa.array(keys, pa.int64()),
                         "n_custs": pa.array(n, pa.int64()),
                         "sum_cents": pa.array(c, pa.int64())})

    return no_orders.map_batches(code_partial, batch_format="pyarrow") \
        .groupby("code") \
        .aggregate(Sum("n_custs", alias_name="n_custs"),
                   Sum("sum_cents", alias_name="sum_cents")) \
        .map_batches(_widen_i64("code", "n_custs", "sum_cents"),
                     batch_format="pyarrow")


# ---------------------- TPC-H Q2: min-"cost" supplier per part (argmin)


Q2_REGION = "EUROPE"
Q2_TYPE = "LARGE"
Q2_MAX_SIZE = 10
_Q2_OFF = np.int64(1 << 21)      # acctbal cents fit ±2^21 (≤ ±$20,971)


def q_min_cost_supplier(sf_dir: str):
    """For each LARGE small-size part, the EUROPE supplier that shipped
    it with the lowest account balance, suppkey tie-break (TPC-H Q2's
    correlated MIN — s_acctbal stands in for ps_supplycost; no partsupp
    table in this schema). Distinct (part, supplier) pairs come from a
    fused-key dedup of lineitem; the per-part argmin rides one Min
    aggregate over the fused (cents+offset, suppkey) order — min by
    balance then key, no group iteration. Top-100 by balance desc."""
    from ray.data.aggregate import Min
    from ..stages import relational

    P = relational.adaptive_parts(sf_dir)
    sname = _supplier_lookup(sf_dir, "s_name")
    sbal, snat = _supplier_lookup(sf_dir, "s_acctbal", "s_nationkey")
    _, regions = _nation_region(sf_dir)
    eur = np.array(sorted(k for k, r in regions.items()
                          if r == Q2_REGION), np.int64)
    if len(sbal) and (np.abs(sbal).max() >= _Q2_OFF):
        raise ValueError("q2: acctbal cents exceed the 21-bit fuse width")

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_type", "p_size"])

    def part_keys(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(b["p_type"], Q2_TYPE),
                       pc.less_equal(b["p_size"], Q2_MAX_SIZE))
        t = b.filter(keep)
        return pa.table({"partkey": pc.cast(t["p_partkey"], pa.int64())})

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])

    def pair_partial(b: pa.Table) -> pa.Table:
        pk = _np(b["l_partkey"]).astype(np.int64)
        sk = _np(b["l_suppkey"]).astype(np.int64)
        keep = np.isin(snat[sk], eur)
        fused = np.unique(_fuse20(pk[keep], sk[keep], "q2 (part, supp)"))
        return pa.table({"partkey": pa.array(fused >> np.int64(20),
                                             pa.int64()),
                         "fsk": pa.array(fused & np.int64((1 << 20) - 1),
                                         pa.int64())})

    pairs = relational.hash_join_i64(
        li.map_batches(pair_partial, batch_format="pyarrow"),
        part.map_batches(part_keys, batch_format="pyarrow"),
        key="partkey", left_carry={"fsk": pa.int64()},
        right_carry={}, how="semi", P=P)

    def min_partial(b: pa.Table) -> pa.Table:
        pk = _np(b["partkey"])
        sk = _np(b["fsk"])
        fused = ((sbal[sk] + _Q2_OFF) << np.int64(20)) | sk
        order = np.argsort(pk, kind="stable")
        pk_s, f_s = pk[order], fused[order]
        starts = np.ones(len(pk_s), bool)
        if len(pk_s):
            starts[1:] = pk_s[1:] != pk_s[:-1]
        idx = np.nonzero(starts)[0]
        mins = np.minimum.reduceat(f_s, idx) if len(pk_s) \
            else np.empty(0, np.int64)
        return pa.table({"partkey": pa.array(pk_s[idx] if len(pk_s)
                                             else pk_s, pa.int64()),
                         "f": pa.array(mins, pa.int64())})

    agg = pairs.map_batches(min_partial, batch_format="pyarrow") \
        .groupby("partkey").aggregate(Min("f", alias_name="f")) \
        .map_batches(_widen_i64("partkey", "f"), batch_format="pyarrow")

    def unfuse(b: pa.Table) -> pa.Table:
        f = _np(b["f"])
        sk = f & np.int64((1 << 20) - 1)
        return pa.table({
            "partkey": pc.cast(b["partkey"], pa.int64()),
            "suppkey": pa.array(sk, pa.int64()),
            "acctbal_cents": pa.array((f >> np.int64(20)) - _Q2_OFF,
                                      pa.int64()),
            "s_name": pa.array(list(sname[sk]), pa.string()),
        })

    return agg.map_batches(unfuse, batch_format="pyarrow") \
        .sort(["acctbal_cents", "partkey"],
              descending=[True, False]).limit(100)


# -------------------------- TPC-H Q9: product profit by nation × year


Q9_MATCH = "red"
_Q9_COST_DIV = np.int64(10)    # cost surrogate: qty*retail_cents // 10


def q_product_profit(sf_dir: str):
    """Profit on 'red'-named parts per supplier nation and order year
    (TPC-H Q9 — profit = revenue cents minus qty*retail_cents//10, a
    deterministic integer cost surrogate; no partsupp.ps_supplycost in
    this schema). lineitem joins the name-filtered part slice, collapses
    per (okey, suppkey) fused key, attaches the order year through the
    second hash join, and reduces on fused (nation, year). Floor
    division on non-negative integers matches DuckDB's // exactly."""
    from ray.data.aggregate import Sum
    from ..stages import relational

    P = relational.adaptive_parts(sf_dir)
    names, _ = _nation_region(sf_dir)
    snat = _supplier_lookup(sf_dir, "s_nationkey")

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_name",
                                    "p_retailprice"])

    def part_slim(b: pa.Table) -> pa.Table:
        keep = pc.match_substring(b["p_name"], Q9_MATCH)
        t = b.filter(keep)
        rc = np.floor(_np(t["p_retailprice"]) * 100.0 + 0.5) \
            .astype(np.int64)
        return pa.table({"partkey": pc.cast(t["p_partkey"], pa.int64()),
                         "retail_cents": pa.array(rc, pa.int64())})

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey", "l_suppkey",
                                  "l_quantity", "l_extendedprice",
                                  "l_discount"])

    def li_slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "partkey": pc.cast(b["l_partkey"], pa.int64()),
            "okey": pc.cast(b["l_orderkey"], pa.int64()),
            "suppkey": pc.cast(b["l_suppkey"], pa.int64()),
            "q": pa.array(_np(b["l_quantity"]).astype(np.int64),
                          pa.int64()),
            "cents": pa.array(_rev_cents(b), pa.int64()),
        })

    j1 = relational.hash_join_i64(
        li.map_batches(li_slim, batch_format="pyarrow"),
        part.map_batches(part_slim, batch_format="pyarrow"),
        key="partkey",
        left_carry={"okey": pa.int64(), "suppkey": pa.int64(),
                    "q": pa.int64(), "cents": pa.int64()},
        right_carry={"retail_cents": pa.int64()}, P=P)

    def profit_partial(b: pa.Table) -> pa.Table:
        profit = _np(b["cents"]) \
            - (_np(b["q"]) * _np(b["retail_cents"])) // _Q9_COST_DIV
        fused = _fuse20(_np(b["okey"]), _np(b["suppkey"]),
                        "q9 (okey, suppkey)")
        keys, (p,) = _group_sums(fused, profit)
        return pa.table({
            "okey": pa.array(keys >> np.int64(20), pa.int64()),
            "suppkey": pa.array(keys & np.int64((1 << 20) - 1),
                                pa.int64()),
            "profit_cents": pa.array(p, pa.int64()),
        })

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"])

    def ord_slim(b: pa.Table) -> pa.Table:
        year = _np(pc.year(b["o_orderdate"])).astype(np.int64)
        return pa.table({"okey": pc.cast(b["o_orderkey"], pa.int64()),
                         "year": pa.array(year, pa.int64())})

    j2 = relational.hash_join_i64(
        j1.map_batches(profit_partial, batch_format="pyarrow"),
        orders.map_batches(ord_slim, batch_format="pyarrow"),
        key="okey",
        left_carry={"suppkey": pa.int64(), "profit_cents": pa.int64()},
        right_carry={"year": pa.int64()}, P=P)

    def final_partial(b: pa.Table) -> pa.Table:
        nat = snat[_np(b["suppkey"])]
        fused = _fuse20(nat, _np(b["year"]), "q9 (nation, year)")
        keys, (p,) = _group_sums(fused, _np(b["profit_cents"]))
        return pa.table({"nkey": pa.array(keys, pa.int64()),
                         "profit_cents": pa.array(p, pa.int64())})

    agg = j2.map_batches(final_partial, batch_format="pyarrow") \
        .groupby("nkey") \
        .aggregate(Sum("profit_cents", alias_name="profit_cents"))

    def unfuse(b: pa.Table) -> pa.Table:
        nk = _np(pc.cast(b["nkey"], pa.int64()))
        nat = (nk >> np.int64(20)).astype(int)
        return pa.table({
            "n_name": pa.array([names[k] for k in nat], pa.string()),
            "year": pa.array(nk & np.int64((1 << 20) - 1), pa.int64()),
            "profit_cents": pc.cast(b["profit_cents"], pa.int64()),
        })

    return agg.map_batches(unfuse, batch_format="pyarrow")


# ------------------------------------------------------------ registry


QUERIES_REL2 = {
    "local_supplier_volume": q_local_supplier_volume,
    "market_share": q_market_share,
    "cust_order_counts": q_cust_order_counts,
    "top_supplier": q_top_supplier,
    "small_qty_revenue": q_small_qty_revenue,
    "or_predicates_revenue": q_or_predicates_revenue,
    "waiting_suppliers": q_waiting_suppliers,
    "sales_opportunity": q_sales_opportunity,
    "min_cost_supplier": q_min_cost_supplier,
    "product_profit": q_product_profit,
}

_CENTS = "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) " \
    "AS BIGINT)"

ORACLE_SQL_REL2 = {
    "local_supplier_volume": f"""
SELECT n_name, CAST(SUM({_CENTS}) AS BIGINT) AS revenue_cents
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name""",
    "market_share": f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
       CAST(SUM({_CENTS}) AS BIGINT) AS total_cents,
       CAST(SUM(CASE WHEN s_nationkey = 7 THEN {_CENTS} ELSE 0 END)
            AS BIGINT) AS nation_cents
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY year""",
    "cust_order_counts": """
WITH oc AS (SELECT o_custkey, COUNT(*) AS cnt FROM orders
            WHERE o_orderpriority <> '4-NOT SPECIFIED'
            GROUP BY o_custkey)
SELECT CAST(COALESCE(cnt, 0) AS BIGINT) AS n_orders,
       CAST(COUNT(*) AS BIGINT) AS n_custs
FROM customer LEFT JOIN oc ON c_custkey = o_custkey
GROUP BY n_orders""",
    "top_supplier": f"""
WITH r AS (SELECT l_suppkey AS suppkey,
                  SUM({_CENTS}) AS revenue_cents
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-04-01'
             AND l_shipdate < TIMESTAMP '1996-07-01'
           GROUP BY l_suppkey)
SELECT CAST(suppkey AS BIGINT) AS suppkey, s_name,
       CAST(revenue_cents AS BIGINT) AS revenue_cents
FROM r JOIN supplier ON suppkey = s_suppkey
WHERE revenue_cents = (SELECT MAX(revenue_cents) FROM r)""",
    "small_qty_revenue": """
WITH li AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
                   CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                     AS cents
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#3'),
st AS (SELECT l_partkey, SUM(q) AS sum_q, COUNT(*) AS cnt
       FROM li GROUP BY l_partkey)
SELECT CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n
FROM li JOIN st USING (l_partkey)
WHERE 5 * q * cnt < sum_q""",
    "or_predicates_revenue": f"""
SELECT CAST(COALESCE(SUM({_CENTS}), 0) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)""",
    "waiting_suppliers": """
WITH lo AS (SELECT l_orderkey AS ok, l_suppkey AS sk,
                   MAX(CASE WHEN l_shipdate > o_orderdate
                                 + INTERVAL 60 DAY THEN 1 ELSE 0 END)
                     AS late
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F' GROUP BY ok, sk),
pero AS (SELECT ok, COUNT(*) AS n, SUM(late) AS nlate,
                SUM(late * sk) AS lsk
         FROM lo GROUP BY ok)
SELECT CAST(lsk AS BIGINT) AS suppkey, s_name,
       CAST(COUNT(*) AS BIGINT) AS waits
FROM pero JOIN supplier ON lsk = s_suppkey
WHERE n >= 2 AND nlate = 1
GROUP BY suppkey, s_name
ORDER BY waits DESC, s_name LIMIT 20""",
    "sales_opportunity": """
WITH c AS (SELECT c_custkey, c_custkey % 7 AS code,
                  CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
           FROM customer WHERE c_custkey % 7 IN (1, 3, 5)),
g AS (SELECT SUM(cents) AS s, COUNT(*) AS n FROM c WHERE cents > 0)
SELECT CAST(code AS BIGINT) AS code,
       CAST(COUNT(*) AS BIGINT) AS n_custs,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM c, g
WHERE cents * n > s
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY code""",
    "min_cost_supplier": """
WITH ps AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
            FROM lineitem),
e AS (SELECT pk, sk,
             CAST(FLOOR(s_acctbal * 100 + 0.5) AS BIGINT) AS cents
      FROM ps
      JOIN supplier ON sk = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      JOIN part ON pk = p_partkey
      WHERE r_name = 'EUROPE' AND p_type = 'LARGE' AND p_size <= 10),
m AS (SELECT pk, MIN((cents + 2097152) * 1048576 + sk) AS f
      FROM e GROUP BY pk)
SELECT CAST(pk AS BIGINT) AS partkey,
       CAST(f % 1048576 AS BIGINT) AS suppkey,
       CAST(f // 1048576 - 2097152 AS BIGINT) AS acctbal_cents, s_name
FROM m JOIN supplier ON (f % 1048576) = s_suppkey
ORDER BY acctbal_cents DESC, partkey LIMIT 100""",
    "product_profit": f"""
SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS year,
       CAST(SUM({_CENTS}
            - (CAST(l_quantity AS BIGINT)
               * CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT)) // 10)
            AS BIGINT) AS profit_cents
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE contains(p_name, 'red')
GROUP BY n_name, year""",
}
