"""Basket pair-expansion skew guard (VERDICT r5 #1).

Within-basket pair expansion (recsys_item_cosine,
itemset_copurchase_pairs) fans out C(items-per-basket, 2) rows per
basket.  That quadratic is bounded by BASKET SIZE, not corpus size — so
the one thing that breaks it at 100 TB is data SHAPE: an ultra-popular
item sitting in a large fraction of all baskets inflates every basket it
touches, multiplies pair volume by the square of its reach, and lands
its pair keys on a handful of hot reducers.  Capping item popularity
before the expansion is the standard collaborative-filtering mitigation
(Linden et al. 2003, "Amazon.com recommendations": sample or drop
ultra-popular items — their co-occurrence carries no preference signal;
everyone buys them with everything).

The guard is a flag, default off, exactly like exact_dedup's
``skew_guard`` (operators/dedup.py): the driver-checked catalog queries
run uncapped and stay oracle-identical; a caller at scale opts in with
``pop_cap=`` and the zipf-skew tests + SKEWBENCH.md prove the capped
plan finishes fast and stays parity-green against a capped oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cap_popular_items(op: DataFrame, item_col: str,
                      pop_cap: int) -> DataFrame:
    """Drop items whose basket support exceeds ``pop_cap`` from a distinct
    (basket, item) table, BEFORE any within-basket pair expansion.

    Plan shape: one partial-agg shuffle counts support per item; the hot
    list is then broadcast anti-joined onto the basket table (map-side,
    no second shuffle of the big side).  The broadcast is safe by
    pigeonhole: a distinct (basket, item) table of N rows holds at most
    N / pop_cap items with support > pop_cap — with any useful cap
    (10^3..10^5 at 100 TB) the hot list is orders of magnitude smaller
    than the item dimension, let alone the fact table.  Every surviving
    basket then expands to at most C(k, 2) pairs where every item's
    reach is <= pop_cap, so pair volume is <= sum_baskets C(k,2) AND no
    (hot, x) reduce key can exceed pop_cap — both failure axes bounded.

    NULL-key contract: a NULL item never matches the equality anti-join,
    so NULL-item rows are KEPT (never capped) — NULL is a malformed item
    id, not a product, and silently dropping every malformed row under a
    popularity guard would be surprising; cap them upstream if a table
    really carries hot NULLs.  The oracle twin uses NOT EXISTS (not
    NOT IN, whose three-valued logic would drop ALL rows once the hot
    list contains NULL) so both engines share this semantics exactly.
    """
    sup = op.groupBy(item_col).agg(F.count(F.lit(1)).alias("__sup"))
    hot = sup.filter(F.col("__sup") > pop_cap).select(item_col)
    return op.join(F.broadcast(hot), item_col, "left_anti")


def sql_cap_popular_items(base_cte: str, item_col: str,
                          pop_cap: int) -> str:
    """The oracle-side twin of cap_popular_items: wraps a distinct
    (basket, item) CTE body so tests can run the capped semantics on
    DuckDB and prove the guarded Spark plan lossless.  NOT EXISTS, not
    NOT IN — equality anti-join semantics on NULL keys must match
    Spark's left_anti (NULL rows kept), while NOT IN would evaluate to
    NULL for every row as soon as the hot list holds a NULL."""
    return f"""(
        SELECT t.* FROM {base_cte} t
        WHERE NOT EXISTS (
            SELECT 1 FROM {base_cte} h
            GROUP BY h.{item_col}
            HAVING COUNT(*) > {pop_cap} AND h.{item_col} = t.{item_col}))"""
