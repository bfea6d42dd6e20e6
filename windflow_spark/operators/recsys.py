"""Neighborhood recommender building blocks: capped customer baskets,
item-item cosine similarity, and temporal-holdout evaluation.

No reference analog — WindFlow stops at streaming operators; this is the
batch rec-sys family a purchase/interaction corpus needs, built with the
same width-cap discipline as functions/dedup's LSH bucket caps: every
customer contributes at most ``basket_cap`` items, so the pair space is
``C(cap, 2)`` per customer — LINEAR in customers at any catalog size, and
every shuffle keys on customer or item.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def capped_baskets(
    lineitem: DataFrame,
    orders: DataFrame,
    basket_cap: int = 10,
) -> DataFrame:
    """(ck, pk): each customer's ``basket_cap`` most recently purchased
    distinct parts (recency by max order date, deterministic pk
    tie-break). One orderkey join + one (ck, pk) agg + one ck window."""
    # r11 optimization (guide §2.4): establish hash(ck) partitioning ONCE,
    # right after the order join. hash(ck) satisfies the groupBy(ck, pk)
    # clustering (subset rule), the recency window's partitionBy(ck), AND
    # every downstream ck-keyed join/agg in the recsys family — one
    # exchange where the old plan paid one per operator. It also fans the
    # partial aggregation out of the single scan task that one-row-group
    # bench parquet produces (at real scale the join output is already
    # wide, and one keyed exchange here replaces several downstream).
    sess = lineitem.sparkSession
    joined = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("ck"),
            F.col("l_partkey").alias("pk"),
            F.col("o_orderdate").alias("od"),
        )
        .repartition(sess.sparkContext.defaultParallelism, "ck")
    )
    return cap_recent(joined, basket_cap)


def cap_recent(joined: DataFrame, basket_cap: int = 10) -> DataFrame:
    """Cap a (ck, pk, od) purchase frame to each customer's ``basket_cap``
    most recent distinct parts. Split out of capped_baskets (r12) so the
    temporal-holdout eval queries can derive train baskets AND test sets
    from ONE persisted hash(ck)-partitioned join frame: both the
    groupBy(ck, pk) and the recency window cluster by subsets/supersets of
    ck, so no new exchange is introduced when ``joined`` is already
    hash(ck)-partitioned (guide §2.4)."""
    b0 = joined.groupBy("ck", "pk").agg(F.max("od").alias("md"))
    wb = W.partitionBy("ck").orderBy(F.col("md").desc(), F.col("pk"))
    return (
        b0.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") <= basket_cap)
        .select("ck", "pk")
    )


def itemitem_topk(
    baskets: DataFrame,
    min_cooc: int = 2,
    topk: int = 3,
    item_est_bytes: int | None = None,
) -> DataFrame:
    """Top-``topk`` most-similar items per item by co-occurrence cosine
    over capped baskets: (item_a, item_b, cooc, cosine_sim, rk).

    Per-item basket counts ride a window; pairs are generated IN-ROW from
    the collected basket array (bounded by the cap), both directions
    emitted at generation so the symmetric frame needs no union that
    would re-derive the upstream chain twice. cosine = cooc/sqrt(n_a*n_b)
    on exact BIGINTs."""
    # r11 optimization (guide §2.4): the per-item basket count used to ride
    # a partitionBy(pk) window, which re-shuffled the whole basket frame to
    # pk and then BACK to ck for the array collection. A groupBy(pk) count
    # + broadcast equi-join attaches the same n without disturbing the
    # ck partitioning established by capped_baskets, so the collection agg
    # needs no exchange at all (item counts are catalog-sized — dimension
    # class). r12: the hint is gated on ``item_est_bytes`` (callers pass
    # |part| x 16B from the parquet footer) so a 100 TB catalog degrades
    # this to a pk-keyed shuffle join instead of forcing the broadcast;
    # None (no bound known) means no hint — the safe direction.
    from windflow_spark.util import maybe_broadcast

    cnt = baskets.groupBy("pk").agg(F.count(F.lit(1)).cast("long").alias("n"))
    bn = baskets.join(maybe_broadcast(cnt, item_est_bytes), "pk")
    arrays = bn.groupBy("ck").agg(
        F.array_sort(F.collect_list(F.struct("pk", "n"))).alias("items")
    )

    def _pair(x, nx, y, ny):
        return F.struct(
            x.alias("pa"), nx.alias("na"), y.alias("pb"), ny.alias("nb")
        )

    pairs = arrays.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("items"),
                    lambda x, i: F.flatten(
                        F.transform(
                            F.slice(
                                F.col("items"), i + 2, F.size(F.col("items"))
                            ),
                            lambda y: F.array(
                                _pair(x["pk"], x["n"], y["pk"], y["n"]),
                                _pair(y["pk"], y["n"], x["pk"], x["n"]),
                            ),
                        )
                    ),
                )
            )
        ).alias("p")
    ).select("p.pa", "p.na", "p.pb", "p.nb")
    sym = (
        pairs.groupBy("pa", "na", "pb", "nb")
        .agg(F.count(F.lit(1)).cast("long").alias("cooc"))
        .filter(F.col("cooc") >= min_cooc)
        .select(
            F.col("pa").alias("item_a"),
            F.col("pb").alias("item_b"),
            "cooc",
            F.round(
                F.col("cooc")
                / F.sqrt((F.col("na") * F.col("nb")).cast("double")),
                6,
            ).alias("cosine_sim"),
        )
    )
    wr = W.partitionBy("item_a").orderBy(
        F.col("cosine_sim").desc(), F.col("item_b")
    )
    return (
        sym.withColumn("rk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rk") <= topk)
        .select("item_a", "item_b", "cooc", "cosine_sim", "rk")
    )
