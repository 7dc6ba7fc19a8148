"""Round-4 relational completion: the last three TPC-H query shapes the
r3/r4 families had not covered — global-scalar HAVING over a grouped
value (Q11), join-then-conditional-count by a low-cardinality dimension
(Q12), and history-vs-window excess screening over a fused composite key
(Q20). With these, all 22 TPC-H query shapes have an adaptation in the
repo (Q16's grouped COUNT DISTINCT shape is covered by
queries_ext.q_brand_suppliers).

Adaptation notes (this schema has no partsupp / shipmode / receiptdate /
comment columns):

* Q11 "important stock": stock value per part is the total shipped
  quantity by NATION_19 suppliers priced at the part's retail cents —
  lineitem stands in for partsupp, retailprice for supplycost.
* Q12 "shipping modes": o_orderpriority is both the group key and the
  priority split; "received late" becomes "shipped more than 90 days
  after the order date".
* Q20 "excess supply": a (part, supplier) pair has excess supply when
  its all-history shipped quantity exceeds twice its 1996 shipments —
  the availqty > 0.5 * recent-demand test re-expressed with the
  history total standing in for availqty.

Shared scale contract (same as queries_rel.py / queries_rel2.py):
per-block partial aggregation (_group_sums) before every shuffle, joins
through stages/relational.hash_join_i64 with adaptive partition counts,
money/quantity integer-ized per ROW with floor(x*100 + 0.5) (quantity
with floor(x + 0.5)) on BOTH engines, correlated/threshold comparisons
by integer cross-multiplication with loud overflow guards, tiny
dimensions shipped once per task closure.

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
from .queries_rel2 import _nation_region, _supplier_lookup

_DAY_US = 86_400_000_000


def _qty_int(col) -> np.ndarray:
    """Quantity integer-ized half-away (TPC-H quantities are integral;
    the floor(+0.5) keeps both engines bit-identical if they ever
    aren't)."""
    return np.floor(_np(col) + 0.5).astype(np.int64)


# --------------------------------------- TPC-H Q11: important stock


Q11_NATION = 19         # NATION_19 — has suppliers at every test scale
Q11_FRAC_DEN = 1000     # keep parts holding > 1/1000 of total value


def q_important_stock(sf_dir: str):
    """Parts whose NATION_19-supplied stock value exceeds 1/1000 of the
    nation's total stock value (TPC-H Q11). One exchange builds the
    per-part quantity aggregate; the part dimension attaches retail
    cents through a hash join; the per-part value table is
    dimension-bounded (≤ |part| rows) so it is pinned once and read
    twice — once for the global-total scalar, once for the HAVING
    filter. The threshold test is the integer cross-multiply
    value * 1000 > total (never a float fraction)."""
    from ray.data.aggregate import Sum
    from ..stages import relational

    P = relational.adaptive_parts(sf_dir)
    snat = _supplier_lookup(sf_dir, "s_nationkey")

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey", "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        sk = _np(b["l_suppkey"]).astype(np.int64)
        keep = snat[sk] == Q11_NATION
        keys, (q,) = _group_sums(
            _np(b["l_partkey"]).astype(np.int64)[keep],
            _qty_int(b["l_quantity"])[keep])
        return pa.table({"partkey": pa.array(keys, pa.int64()),
                         "qty": pa.array(q, pa.int64())})

    qty = li.map_batches(partial, batch_format="pyarrow") \
        .groupby("partkey").aggregate(Sum("qty", alias_name="qty")) \
        .map_batches(_widen_i64("partkey", "qty"), batch_format="pyarrow")

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_retailprice"])

    def part_slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "partkey": pc.cast(b["p_partkey"], pa.int64()),
            "retail_cents": pa.array(
                np.floor(_np(b["p_retailprice"]) * 100.0 + 0.5)
                .astype(np.int64)),
        })

    j = relational.hash_join_i64(
        qty, part.map_batches(part_slim, batch_format="pyarrow"),
        key="partkey", left_carry={"qty": pa.int64()},
        right_carry={"retail_cents": pa.int64()}, P=P)

    def value(b: pa.Table) -> pa.Table:
        v = _np(b["qty"]) * _np(b["retail_cents"])
        return pa.table({"partkey": pc.cast(b["partkey"], pa.int64()),
                         "value_cents": pa.array(v, pa.int64())})

    vals = j.map_batches(value, batch_format="pyarrow") \
        .materialize()      # dimension-bounded (≤ |part| rows); read twice
    total = vals.sum("value_cents") or 0
    if total >= (1 << 63) // Q11_FRAC_DEN:
        raise OverflowError(
            "q11 threshold cross-multiply would overflow int64")

    def keep_big(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(
            pc.multiply(b["value_cents"], pa.scalar(Q11_FRAC_DEN,
                                                    pa.int64())),
            pa.scalar(total, pa.int64())))

    return vals.map_batches(keep_big, batch_format="pyarrow") \
        .sort(["value_cents", "partkey"], descending=[True, False])


# ----------------------------------- TPC-H Q12: late lines by priority


Q12_FROM = np.datetime64("1996-01-01", "us").astype(np.int64)
Q12_TO = np.datetime64("1997-01-01", "us").astype(np.int64)
Q12_LATE_DAYS = 90


def q_late_by_priority(sf_dir: str):
    """Per order priority: how many 1996-shipped lineitems went out more
    than 90 days after their order date, and how many shipped at all
    (TPC-H Q12 with o_orderpriority standing in for shipmode and the
    ship-lag test for the receipt-lag test). Lineitems collapse per
    block to fused (orderkey, ship-day) counts — day granularity is
    asserted exact, the synthetic dates are midnight timestamps — then
    one hash join attaches the order's date and priority and a
    five-row groupby splits late vs total."""
    from ray.data.aggregate import Sum
    from ..stages import relational

    P = relational.adaptive_parts(sf_dir)
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate",
                                      "o_orderpriority"])

    def ord_slim(b: pa.Table) -> pa.Table:
        od = _ts_us(b["o_orderdate"])
        if len(od) and int((od % _DAY_US).max()) != 0:
            raise ValueError("q12: non-midnight o_orderdate; day "
                             "granularity collapse would be lossy")
        # '1-URGENT' .. '5-LOW' → 1..5
        pr = np.array([int(s[0]) for s in
                       b["o_orderpriority"].to_pylist()], np.int64)
        return pa.table({
            "okey": pc.cast(b["o_orderkey"], pa.int64()),
            "od_day": pa.array(od // _DAY_US, pa.int64()),
            "prio": pa.array(pr, pa.int64()),
        })

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])

    def li_partial(b: pa.Table) -> pa.Table:
        ts = _ts_us(b["l_shipdate"])
        keep = (ts >= Q12_FROM) & (ts < Q12_TO)
        ok = _np(b["l_orderkey"]).astype(np.int64)[keep]
        day = ts[keep]
        if len(day) and int((day % _DAY_US).max()) != 0:
            raise ValueError("q12: non-midnight l_shipdate; day "
                             "granularity collapse would be lossy")
        day //= _DAY_US
        fused = _fuse20(ok, day, "q12 (okey, ship_day)")
        keys, (c,) = _group_sums(fused, np.ones(len(fused), np.int64))
        return pa.table({
            "okey": pa.array(keys >> np.int64(20), pa.int64()),
            "ship_day": pa.array(keys & np.int64((1 << 20) - 1),
                                 pa.int64()),
            "cnt": pa.array(c, pa.int64()),
        })

    j = relational.hash_join_i64(
        li.map_batches(li_partial, batch_format="pyarrow"),
        orders.map_batches(ord_slim, batch_format="pyarrow"),
        key="okey",
        left_carry={"ship_day": pa.int64(), "cnt": pa.int64()},
        right_carry={"od_day": pa.int64(), "prio": pa.int64()}, P=P)

    def split(b: pa.Table) -> pa.Table:
        cnt = _np(b["cnt"])
        late = _np(b["ship_day"]) > _np(b["od_day"]) + Q12_LATE_DAYS
        keys, (l, t) = _group_sums(_np(b["prio"]),
                                   np.where(late, cnt, 0), cnt)
        return pa.table({"prio": pa.array(keys, pa.int64()),
                         "late_lines": pa.array(l, pa.int64()),
                         "total_lines": pa.array(t, pa.int64())})

    names = {1: "1-URGENT", 2: "2-HIGH", 3: "3-MEDIUM",
             4: "4-NOT SPECIFIED", 5: "5-LOW"}

    def label(b: pa.Table) -> pa.Table:
        pr = _np(b["prio"]).astype(int)
        return pa.table({
            "o_orderpriority": pa.array([names[p] for p in pr],
                                        pa.string()),
            "late_lines": pc.cast(b["late_lines"], pa.int64()),
            "total_lines": pc.cast(b["total_lines"], pa.int64()),
        })

    return j.map_batches(split, batch_format="pyarrow") \
        .groupby("prio") \
        .aggregate(Sum("late_lines", alias_name="late_lines"),
                   Sum("total_lines", alias_name="total_lines")) \
        .map_batches(label, batch_format="pyarrow") \
        .sort("o_orderpriority")


# -------------------------------------- TPC-H Q20: excess suppliers


Q20_NAME_SUBSTR = "red"
Q20_REGION = "ASIA"
Q20_FROM = np.datetime64("1996-01-01", "us").astype(np.int64)
Q20_TO = np.datetime64("1997-01-01", "us").astype(np.int64)


def q_excess_suppliers(sf_dir: str):
    """ASIA suppliers holding excess supply of a red part: some
    (part, supplier) pair's all-history shipped quantity exceeds twice
    its 1996 shipments, with at least one 1996 shipment (TPC-H Q20 with
    the history total standing in for ps_availqty). Red partkeys are a
    driver-built filter array (|part|-bounded, pruned to the name
    match); lineitem collapses per block to fused (part, supplier)
    two-sum partials, one groupby merges them, and the screen +
    distinct-supplier collapse run over dimension-bounded rows."""
    from ray.data.aggregate import Sum
    from ..stages import relational

    names, regions = _nation_region(sf_dir)
    snat, sname = _supplier_lookup(sf_dir, "s_nationkey", "s_name")
    asia = np.array(sorted(k for k, r in regions.items()
                           if r == Q20_REGION), np.int64)

    pt = pq.read_table(f"{sf_dir}/part.parquet",
                       columns=["p_partkey", "p_name"])
    is_red = pc.match_substring(pt["p_name"], Q20_NAME_SUBSTR)
    red = np.sort(_np(pt.filter(is_red)["p_partkey"]).astype(np.int64))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey",
                                  "l_quantity", "l_shipdate"])

    def partial(b: pa.Table) -> pa.Table:
        pk = _np(b["l_partkey"]).astype(np.int64)
        keep = red[np.searchsorted(red, pk).clip(0, len(red) - 1)] == pk \
            if len(red) else np.zeros(len(pk), bool)
        t = b.filter(pa.array(keep))
        pk = pk[keep]
        sk = _np(t["l_suppkey"]).astype(np.int64)
        q = _qty_int(t["l_quantity"])
        ts = _ts_us(t["l_shipdate"])
        in96 = ((ts >= Q20_FROM) & (ts < Q20_TO)).astype(np.int64)
        fused = _fuse20(pk, sk, "q20 (partkey, suppkey)")
        keys, (qt, q96) = _group_sums(fused, q, q * in96)
        return pa.table({"ps": pa.array(keys, pa.int64()),
                         "qty_total": pa.array(qt, pa.int64()),
                         "qty_96": pa.array(q96, pa.int64())})

    ps = li.map_batches(partial, batch_format="pyarrow") \
        .groupby("ps") \
        .aggregate(Sum("qty_total", alias_name="qty_total"),
                   Sum("qty_96", alias_name="qty_96")) \
        .map_batches(_widen_i64("ps", "qty_total", "qty_96"),
                     batch_format="pyarrow")

    def screen(b: pa.Table) -> pa.Table:
        qt = _np(b["qty_total"])
        q96 = _np(b["qty_96"])
        sk = _np(b["ps"]) & np.int64((1 << 20) - 1)
        keep = (q96 > 0) & (qt > 2 * q96) & np.isin(snat[sk], asia)
        keys, (n,) = _group_sums(sk[keep], np.ones(int(keep.sum()),
                                                   np.int64))
        return pa.table({"suppkey": pa.array(keys, pa.int64()),
                         "n": pa.array(n, pa.int64())})

    def dedup_name(b: pa.Table) -> pa.Table:
        sk = np.unique(_np(b["suppkey"]).astype(np.int64))
        return pa.table({
            "suppkey": pa.array(sk, pa.int64()),
            "s_name": pa.array(list(sname[sk]), pa.string()),
        })

    return ps.map_batches(screen, batch_format="pyarrow") \
        .groupby("suppkey").aggregate(Sum("n", alias_name="n")) \
        .map_batches(dedup_name, batch_format="pyarrow") \
        .sort("s_name")


QUERIES_REL3 = {
    "important_stock": q_important_stock,
    "late_by_priority": q_late_by_priority,
    "excess_suppliers": q_excess_suppliers,
}

_QTY = "CAST(FLOOR(l_quantity + 0.5) AS BIGINT)"

ORACLE_SQL_REL3 = {
    "important_stock": f"""
WITH vals AS (
  SELECT l_partkey AS partkey,
         CAST(SUM({_QTY}) *
              CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT)
              AS BIGINT) AS value_cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN part ON l_partkey = p_partkey
  WHERE s_nationkey = 19
  GROUP BY l_partkey, p_retailprice
)
SELECT partkey, value_cents FROM vals
WHERE value_cents * 1000 > (SELECT CAST(SUM(value_cents) AS BIGINT)
                            FROM vals)
ORDER BY value_cents DESC, partkey""",
    "late_by_priority": """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS late_lines,
       CAST(COUNT(*) AS BIGINT) AS total_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY o_orderpriority
ORDER BY o_orderpriority""",
    "excess_suppliers": f"""
WITH ps AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         CAST(SUM({_QTY}) AS BIGINT) AS qty_total,
         CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                        AND l_shipdate < TIMESTAMP '1997-01-01'
                       THEN {_QTY} ELSE 0 END) AS BIGINT) AS qty_96
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%red%'
  GROUP BY l_partkey, l_suppkey
)
SELECT s_suppkey AS suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND s_suppkey IN (SELECT sk FROM ps
                    WHERE qty_96 > 0 AND qty_total > 2 * qty_96)
ORDER BY s_name""",
}
