"""Sketch-based approximate aggregates (the 100 TB substitutes).

Exact count-distinct and exact percentiles need a full shuffle of the
distinct values / a per-group sort; at warehouse scale the standard
substitutes are mergeable sketches — HyperLogLog++ for cardinality,
t-digest (Spark's approx_percentile) for quantiles.  Both are
map-side-combinable: the shuffle carries fixed-size sketch state, not
data.

Two gate tiers (r9 VERDICT item 1):

* The builtin-sketch queries (``approx_count_distinct``,
  ``approx_percentile``) stay rows-only — their register/centroid
  layouts are engine-private by design; tests/test_sketches_multimodal
  bounds their error against the exact operators (the meaningful
  contract for an approximation).
* The EXPLICIT twins below re-express each sketch with pinned,
  engine-neutral internals — md5-derived registers (HLL, Flajolet et
  al. 2007), md5-positioned counters (count-min, Cormode &
  Muthukrishnan 2005), and a distributed nearest-rank percentile —
  so the identical estimate is SQL-expressible in DuckDB and the
  whole family is hash-gated, not just error-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.functions.numeric import (
    SQL_STR_ROUND6,
    str_round6,
)
from bitcoin_datawarehouse_spark.operators.text_stats import (  # noqa: F401 — registers the histogram oracle this module's CMS oracle embeds
    text_token_histogram,
)
from bitcoin_datawarehouse_spark.registry import ORACLES, query
from bitcoin_datawarehouse_spark.tables import load_table

HLL_RSD = 0.02  # 2% relative standard deviation


@query("sketch_hll_distinct_per_group")  # rows-only: HLL internals differ per engine
def sketch_hll_distinct_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers per order-month via HyperLogLog++ (rsd 2%).

    The shuffle carries one ~kilobyte HLL register set per (month)
    group instead of every distinct custkey — the only viable shape
    for count-distinct over billions of keys.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_trunc("month", "o_orderdate").alias("order_month")
        )
        .agg(
            F.approx_count_distinct("o_custkey", rsd=HLL_RSD).alias(
                "approx_customers"
            ),
            F.count("*").alias("n_orders"),
        )
    )


@query("sketch_approx_percentiles")  # rows-only: t-digest internals differ per engine
def sketch_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of extended price per return flag via Spark's
    approx_percentile (accuracy parameter 10000 ≈ 0.01% rank error) —
    the mergeable replacement for the exact sort-based percentile.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # one array-returning sketch call, unpacked to scalar columns —
    # the driver's canonicalizer (pandas row sort) cannot sort arrays
    agg = li.groupBy("l_returnflag").agg(
        F.approx_percentile(
            "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)),
            F.lit(10000),
        ).alias("pcts")
    )
    return agg.select(
        "l_returnflag",
        F.col("pcts")[0].alias("approx_p50"),
        F.col("pcts")[1].alias("approx_p90"),
        F.col("pcts")[2].alias("approx_p99"),
    )


CMS_EPS = 0.001  # over-estimate bound: ≤ ε·N (N = total token stream)
CMS_SEED = 42
#: standard count-min sizing: width = ⌈2/ε⌉ counters per row, depth
#: rows ⇒ Pr[est > exact + ε·N] ≤ 2^-depth-ish (independent rows)
CMS_WIDTH = 2000
CMS_DEPTH = 5

#: DuckDB mirror of the kernel/probe position derivation: the first
#: 15 md5 hex digits of "seed:row:token" as a 60-bit integer, mod
#: width.  ('0x'||hex)::BIGINT == Spark conv(hex,16,10) — probed
#: equal digit-for-digit.
def _sql_cms_pos(token_expr: str) -> str:
    return (
        f"CAST('0x' || substr(md5('{CMS_SEED}:' || CAST(rr.r AS VARCHAR)"
        f" || ':' || {token_expr}), 1, 15) AS BIGINT) % {CMS_WIDTH}"
    )


_SQL_CMS_ROWS = "(SELECT unnest([0, 1, 2, 3, 4]) AS r) rr"


def _cms_oracle() -> str:
    from bitcoin_datawarehouse_spark.operators.text_stats import _SQL_TOKENS

    # the watch-list CTE embeds the registered histogram oracle
    # VERBATIM (the similarity_ivf_recall composite discipline) so the
    # probe side can't drift from what text_token_histogram gates;
    # new CTE names are cms_-prefixed to dodge the embedded chain's.
    watch = ORACLES["text_token_histogram"]
    return f"""
    WITH cms_tok AS (
      SELECT token, COUNT(*) AS cnt
      FROM (SELECT unnest({_SQL_TOKENS}) AS token FROM documents)
      GROUP BY token
    ),
    cms_counters AS (
      SELECT r, c, SUM(cnt) AS cnt FROM (
        SELECT rr.r, {_sql_cms_pos('token')} AS c, cnt
        FROM cms_tok CROSS JOIN {_SQL_CMS_ROWS}
      ) GROUP BY r, c
    ),
    cms_watch AS (
      {watch}
    ),
    cms_probe AS (
      SELECT w.token, w.term_count AS exact_count, rr.r,
             {_sql_cms_pos('w.token')} AS c
      FROM cms_watch w CROSS JOIN {_SQL_CMS_ROWS}
    )
    SELECT p.token, p.exact_count,
           CAST(MIN(COALESCE(cn.cnt, 0)) AS BIGINT) AS cms_count
    FROM cms_probe p
    LEFT JOIN cms_counters cn ON cn.r = p.r AND cn.c = p.c
    GROUP BY p.token, p.exact_count
    """


@query("sketch_count_min_token_counts", oracle=_cms_oracle())
def sketch_count_min_token_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Count-min sketch over the corpus token stream, queried for the
    vocabulary-head watch-list, reported next to the exact counts.

    The 100 TB shape: each partition folds its token stream into ONE
    fixed-size counter table (depth × width int64, here 5 × 2000)
    inside an Arrow kernel, emitting only its non-zero cells; a
    map-side-combining sum merges the partials — the shuffle carries
    ≤ partitions × table-size rows regardless of corpus size, where
    the exact histogram shuffles the vocabulary.  The PROBE side is a
    lazy plan too: each watch-list term's depth positions are the
    same md5-derived indices the kernel used, computed JVM-side
    (md5/conv expressions), equi-joined against the counter table,
    and min-reduced per term — so the whole query is one DataFrame
    with no driver-side collect, no ``spark._jvm`` py4j access, and
    no classic-API dependency (Spark Connect-compatible; the previous
    revision pre-computed the result on the driver via the JVM
    CountMinSketch reader, r4 ADVICE).  The internals are pinned
    (md5 positions, integer counters), so since r10 the estimate is
    HASH-GATED against a DuckDB twin that rebuilds the identical
    counter table in SQL; the error contract (exact ≤ estimate ≤
    exact + ε·N) stays pinned in tests/test_sketches_multimodal.py.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    from bitcoin_datawarehouse_spark.operators.dedup import tokens_col
    from bitcoin_datawarehouse_spark.operators.text_stats import (
        text_token_histogram,
    )

    docs = load_table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    tok = (
        docs.repartition(par)
        .select(F.explode(tokens_col(F.col("text"))).alias("token"))
    )

    depth, width, seed = CMS_DEPTH, CMS_WIDTH, CMS_SEED

    def update(batches):
        # one counter table per partition, merged across its batches;
        # per-token positions match the probe expressions bit-for-bit
        table = np.zeros((depth, width), dtype=np.int64)
        memo: dict[str, list[int]] = {}
        for pdf in batches:
            for token, cnt in pdf["token"].value_counts().items():
                pos = memo.get(token)
                if pos is None:
                    if len(memo) >= 200_000:
                        memo.clear()
                    pos = [
                        int(
                            hashlib.md5(
                                f"{seed}:{r}:{token}".encode()
                            ).hexdigest()[:15],
                            16,
                        )
                        % width
                        for r in range(depth)
                    ]
                    memo[token] = pos
                for r in range(depth):
                    table[r, pos[r]] += int(cnt)
        rs, cs = np.nonzero(table)
        yield pd.DataFrame(
            {"r": rs.astype(np.int32), "c": cs.astype(np.int64),
             "cnt": table[rs, cs]}
        )

    counters = (
        tok.mapInPandas(update, "r int, c long, cnt long")
        .groupBy("r", "c")
        .agg(F.sum("cnt").alias("cnt"))
    )

    # probe: same md5-position derivation, as JVM expressions over the
    # bounded watch-list (the exact top-K histogram — so the error
    # contract is directly testable against exact_count)
    watch = text_token_histogram(spark, sf_dir)
    pos_arr = F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit(f"{seed}:{r}:"), F.col("token"))
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % width
            for r in range(depth)
        ]
    )
    probe = watch.select(
        "token",
        F.col("term_count").alias("exact_count"),
        F.posexplode(pos_arr).alias("r", "c"),
    )
    return (
        probe.join(F.broadcast(counters), ["r", "c"], "left")
        .groupBy("token", "exact_count")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias("cms_count")
        )
    )


# ---------------------------------------------------------------------------
# round 10: explicit-register twins — the whole sketch family hash-gated
# ---------------------------------------------------------------------------

HLL_M = 64  #: registers (error ≈ 1.04/√64 ≈ 13% rsd)
#: h is 60 bits (15 md5 hex digits); low 6 pick the register, the
#: remaining 54 feed rho ∈ [1, 55] (rho = leading zeros + 1; w == 0 →
#: all 54 zero → 55)
HLL_RHO_MAX = 55
HLL_ALPHA = 0.709  # canonical bias constant for m=64 (Flajolet 2007)
#: E_raw = α·m²/Z with Z = Σ 2^-reg; computed as one double division
#: of exact integers: NUM / S where S = Σ 2^(RHO_MAX-reg) ≤ m·2^54 <
#: 2^63 (BIGINT-exact) and NUM = α·m²·2^RHO_MAX (a Python float whose
#: repr both engines parse to the identical double)
HLL_NUM = HLL_ALPHA * HLL_M * HLL_M * float(2**HLL_RHO_MAX)
HLL_LC_THRESHOLD = 2.5 * HLL_M  # below this (and V>0): linear counting


def _hll_estimate_frame(
    df: DataFrame, groups: list[str], keep_diag: bool = False
) -> DataFrame:
    """groups + ``hkey`` (string) → groups + deterministic HLL estimate.

    The classic estimator with every step engine-neutral:

    * register/rho from md5 (cross-engine identical),
    * per-(group, register) MAX — a hash aggregate with map-side
      combine; the shuffle carries ≤ m rows per group, the whole
      point of HLL at 100 TB,
    * the harmonic sum as an exact BIGINT (terms 2^(RHO_MAX-reg)),
      so the only float ops are one division (bit-identical from
      identical operands) and the linear-counting ln (1-ulp libm
      risk, absorbed by the str_round6 exposure).
    """
    hashed = _hll_rho_frame(df, groups)
    regs = hashed.groupBy(*groups, "j").agg(F.max("rho").alias("reg"))
    return _hll_estimate_from_registers(regs, groups, keep_diag=keep_diag)


def _hll_rho_frame(df: DataFrame, groups: list[str]) -> DataFrame:
    """groups + ``hkey`` → groups + (register j, rank-of-first-one
    rho) — the per-key sketch coordinates, engine-neutral md5 bits."""
    return df.selectExpr(
        *groups,
        "CAST(conv(substring(md5(CAST(hkey AS BINARY)), 1, 15), 16, 10)"
        " AS BIGINT) AS h",
    ).selectExpr(
        *groups,
        f"CAST(h % {HLL_M} AS INT) AS j",
        f"h DIV {HLL_M} AS w",
    ).selectExpr(
        *groups,
        "j",
        f"CASE WHEN w = 0 THEN {HLL_RHO_MAX}"
        f" ELSE {HLL_RHO_MAX} - length(bin(w)) END AS rho",
    )


def _hll_estimate_from_registers(
    regs: DataFrame, groups: list[str], keep_diag: bool = False
) -> DataFrame:
    """(groups, j, reg) register sets → the classic estimate (exact
    BIGINT harmonic sum, one double division, LC branch, str_round6
    surface)."""
    per = regs.groupBy(*groups).agg(
        F.count("*").alias("n_present"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_MAX} - reg)")
        ).alias("s_present"),
    )
    return per.selectExpr(
        *groups,
        f"CAST({HLL_M} - n_present AS BIGINT) AS v_zero",
        f"s_present + ({HLL_M} - n_present)"
        f" * shiftleft(CAST(1 AS BIGINT), {HLL_RHO_MAX}) AS s_all",
    ).selectExpr(
        *groups,
        "v_zero",
        f"CAST({HLL_NUM!r} AS DOUBLE) / CAST(s_all AS DOUBLE) AS e_raw",
    ).select(
        *groups,
        *([F.col("v_zero"), F.col("e_raw")] if keep_diag else []),
        str_round6(
            F.expr(
                f"CASE WHEN v_zero > 0"
                f" AND e_raw <= CAST({HLL_LC_THRESHOLD!r} AS DOUBLE)"
                f" THEN CAST({HLL_M} AS DOUBLE)"
                f" * ln(CAST({HLL_M} AS DOUBLE) / CAST(v_zero AS DOUBLE))"
                f" ELSE e_raw END"
            )
        ).alias("hll_estimate"),
    )


def _sql_hll_oracle(
    group_expr: str,
    group_alias: str,
    relation: str = "orders",
    key_expr: str = "CAST(o_custkey AS VARCHAR)",
    exact_alias: str = "exact_customers",
) -> str:
    """DuckDB mirror of :func:`_hll_estimate_frame` over ``relation``
    (hkey = ``key_expr``), joined to the exact distinct count."""
    est = (
        f"CASE WHEN v_zero > 0"
        f" AND e_raw <= CAST({HLL_LC_THRESHOLD!r} AS DOUBLE)"
        f" THEN CAST({HLL_M} AS DOUBLE)"
        f" * ln(CAST({HLL_M} AS DOUBLE) / CAST(v_zero AS DOUBLE))"
        f" ELSE e_raw END"
    )
    return f"""
    WITH hll_h AS (
      SELECT {group_expr} AS {group_alias},
             CAST('0x' || substr(md5({key_expr}), 1, 15)
                  AS BIGINT) AS h
      FROM {relation}
    ),
    hll_rho AS (
      SELECT {group_alias}, CAST(h % {HLL_M} AS INT) AS j,
             CASE WHEN h // {HLL_M} = 0 THEN {HLL_RHO_MAX}
                  ELSE {HLL_RHO_MAX} - length(bin(h // {HLL_M}))
             END AS rho
      FROM hll_h
    ),
    hll_reg AS (
      SELECT {group_alias}, j, MAX(rho) AS reg
      FROM hll_rho GROUP BY {group_alias}, j
    ),
    hll_s AS (
      SELECT {group_alias},
             CAST({HLL_M} - COUNT(*) AS BIGINT) AS v_zero,
             CAST(SUM(CAST(1 AS BIGINT) << ({HLL_RHO_MAX} - reg))
                  + ({HLL_M} - COUNT(*))
                  * (CAST(1 AS BIGINT) << {HLL_RHO_MAX}) AS BIGINT)
               AS s_all
      FROM hll_reg GROUP BY {group_alias}
    ),
    hll_e AS (
      SELECT {group_alias}, v_zero,
             CAST({HLL_NUM!r} AS DOUBLE) / CAST(s_all AS DOUBLE) AS e_raw
      FROM hll_s
    ),
    hll_exact AS (
      SELECT {group_expr} AS {group_alias},
             CAST(COUNT(DISTINCT {key_expr}) AS BIGINT) AS {exact_alias}
      FROM {relation} GROUP BY {group_alias}
    )
    SELECT e.{group_alias}, {SQL_STR_ROUND6(est)} AS hll_estimate,
           x.{exact_alias}
    FROM hll_e e JOIN hll_exact x USING ({group_alias})
    """


def _hll_explicit(
    spark: SparkSession, sf_dir: str, group_expr: str, group_alias: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.selectExpr(
        f"{group_expr} AS {group_alias}",
        "CAST(o_custkey AS STRING) AS hkey",
    )
    est = _hll_estimate_frame(keyed, [group_alias])
    exact = orders.groupBy(F.expr(group_expr).alias(group_alias)).agg(
        F.countDistinct("o_custkey").cast("bigint").alias("exact_customers")
    )
    return est.join(exact, group_alias)


_HLL_MONTH_EXPR = "trunc(CAST(o_orderdate AS DATE), 'MM')"
_SQL_HLL_MONTH_EXPR = "CAST(date_trunc('month', o_orderdate) AS DATE)"


@query(
    "sketch_hll_explicit_month",
    oracle=_sql_hll_oracle(_SQL_HLL_MONTH_EXPR, "order_month"),
)
def sketch_hll_explicit_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers per order-month via the EXPLICIT-register
    HLL twin (m=64), hash-gated against a DuckDB re-derivation and
    reported next to the exact count.

    Fixture months hold ~150-200 distinct customers around the m=64
    linear-counting threshold (2.5m = 160), so this single gate
    exercises BOTH estimator branches across its ~80 groups —
    raw harmonic-mean months and linear-counting months.
    """
    return _hll_explicit(spark, sf_dir, _HLL_MONTH_EXPR, "order_month")


@query(
    "sketch_hll_explicit_priority",
    oracle=_sql_hll_oracle("o_orderpriority", "priority"),
)
def sketch_hll_explicit_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """agg_approx_count_distinct's explicit-register twin: the same
    o_orderpriority grouping, estimated by the pinned md5-register
    HLL instead of the engine-private HLL++ — so the builtin sketch
    query gains a hash-gated sibling on identical group keys (~1300
    distinct per group: deep raw-branch territory)."""
    return _hll_explicit(spark, sf_dir, "o_orderpriority", "priority")


# --- distributed nearest-rank percentile twin --------------------------------

PCT_POINTS = (50, 90, 99)


def _sql_rank_pct(p: int) -> str:
    # smallest value whose cumulative count reaches ceil(p·n/100) —
    # pure integer rank arithmetic, value surfaced verbatim
    return (
        f"MIN(CASE WHEN cum >= ({p} * n + 99) // 100"
        f" THEN l_extendedprice END) AS p{p}"
    )


@query(
    "sketch_percentile_rank_exact",
    oracle=f"""
    WITH pct_counts AS (
      SELECT l_returnflag, l_extendedprice, COUNT(*) AS c
      FROM lineitem GROUP BY 1, 2
    ),
    pct_cum AS (
      SELECT l_returnflag, l_extendedprice,
             SUM(c) OVER (
               PARTITION BY l_returnflag ORDER BY l_extendedprice
             ) AS cum
      FROM pct_counts
    ),
    pct_n AS (
      SELECT l_returnflag, SUM(c) AS n FROM pct_counts GROUP BY 1
    )
    SELECT c.l_returnflag, {_sql_rank_pct(50)}, {_sql_rank_pct(90)},
           {_sql_rank_pct(99)}
    FROM pct_cum c JOIN pct_n USING (l_returnflag)
    GROUP BY c.l_returnflag
    """,
)
def sketch_percentile_rank_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """sketch_approx_percentiles' deterministic twin: exact
    NEAREST-RANK percentiles (value at rank ⌈p·n/100⌉), computed
    distributively and hash-gated.

    Scale shape — no per-group sort of raw rows: a hash aggregate
    first collapses the fact table to (group, value) counts, the
    cumulative window then runs over the DISTINCT-VALUE frame (price
    domain, not row count), and each percentile is a conditional MIN.
    Rank arithmetic is pure integer (⌈p·n/100⌉ = (p·n+99) div 100)
    and the surfaced value is a verbatim parquet double — zero float
    arithmetic, so the twin is exactly comparable cross-engine where
    the interpolated variant (agg_percentiles) needs a 4-dp guard.
    """
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.count("*").alias("c")
    )
    from pyspark.sql import Window as W

    wcum = W.partitionBy("l_returnflag").orderBy("l_extendedprice")
    cum = counts.withColumn("cum", F.sum("c").over(wcum))
    n = counts.groupBy("l_returnflag").agg(F.sum("c").alias("n"))
    j = cum.join(n, "l_returnflag")
    aggs = [
        F.min(
            F.when(
                F.col("cum") >= F.expr(f"({p} * n + 99) DIV 100"),
                F.col("l_extendedprice"),
            )
        ).alias(f"p{p}")
        for p in PCT_POINTS
    ]
    return j.groupBy("l_returnflag").agg(*aggs)


_HLL_QUARTER_EXPR = "trunc(CAST(o_orderdate AS DATE), 'QUARTER')"
_SQL_HLL_QUARTER_EXPR = "CAST(date_trunc('quarter', o_orderdate) AS DATE)"


@query(
    "sketch_hll_merge_quarter",
    oracle=_sql_hll_oracle(_SQL_HLL_QUARTER_EXPR, "order_quarter"),
)
def sketch_hll_merge_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL MERGEABILITY, hash-proven: the Spark side builds MONTH
    register sets and merges them up to quarters (per-register MAX —
    associative, the property that lets partial aggregation carry
    sketch state instead of keys at 100 TB), while the oracle builds
    the quarter registers DIRECTLY from the raw keys.  Identical
    estimates ⇔ merge(month sketches) ≡ sketch(quarter) — the
    distributed-combine contract itself, checked cross-engine."""
    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.selectExpr(
        f"{_HLL_QUARTER_EXPR} AS order_quarter",
        f"{_HLL_MONTH_EXPR} AS order_month",
        "CAST(o_custkey AS STRING) AS hkey",
    )
    month_regs = (
        _hll_rho_frame(keyed, ["order_quarter", "order_month"])
        .groupBy("order_quarter", "order_month", "j")
        .agg(F.max("rho").alias("reg"))
    )
    merged = month_regs.groupBy("order_quarter", "j").agg(
        F.max("reg").alias("reg")
    )
    est = _hll_estimate_from_registers(merged, ["order_quarter"])
    exact = orders.groupBy(
        F.expr(_HLL_QUARTER_EXPR).alias("order_quarter")
    ).agg(
        F.countDistinct("o_custkey").cast("bigint").alias("exact_customers")
    )
    return est.join(exact, "order_quarter")


# ---------------------------------------------------------------------------
# round 10: persisted incremental HLL state (the streaming-sketch table)
# ---------------------------------------------------------------------------

SKETCH_SCHEMA = "models"


class HllSketchTable:
    """Persisted per-group HLL register state — distinct-count
    maintenance WITHOUT rescanning history.

    The 100 TB shape: a warehouse holding billions of keys answers
    "distinct customers per month, updated per crawl batch" either by
    re-aggregating all history (a corpus pass per refresh) or by
    keeping ≤ m register rows per group and folding each arriving
    batch in with a register-MAX merge — this class is the latter,
    the lsh_index/ivf_index persisted-state discipline applied to the
    explicit-register twin.  Per ingest the cost is one pass over the
    BATCH plus a merge against the touched groups' ≤ m-row state;
    estimates come straight off the stored registers.

    MAX is associative AND idempotent, which buys the two streaming
    properties for free (both pytest-pinned):

    * sequential ingest ≡ one-shot build (the merge gate's law);
    * replaying a crashed batch is a no-op (max(x, x) = x) — no
      replay guard needed, unlike count-based state.
    """

    def __init__(
        self, warehouse, group_cols: list[str], name: str = "hll_registers"
    ) -> None:
        self.wh = warehouse
        self.group_cols = list(group_cols)
        self.name = name

    def exists(self) -> bool:
        return self.wh.table_exists(SKETCH_SCHEMA, self.name)

    def ingest(self, batch: DataFrame) -> None:
        """Fold a (group_cols…, hkey) batch into the register table.
        The batch collapses to ≤ groups×m rows BEFORE touching state;
        the merge reads/writes only register-table-sized frames."""
        regs = (
            _hll_rho_frame(batch, self.group_cols)
            .groupBy(*self.group_cols, "j")
            .agg(F.max("rho").alias("reg"))
        )
        if self.exists():
            # state is register-table-sized (groups × ≤m rows): the
            # union+max merge is bounded by it, never by history keys
            old = self.wh.read_with(
                batch.sparkSession, SKETCH_SCHEMA, self.name
            )
            regs = (
                old.unionByName(regs)
                .groupBy(*self.group_cols, "j")
                .agg(F.max("reg").alias("reg"))
            )
        # eager: write_atomic replaces the table regs may be reading
        regs = regs.localCheckpoint()
        self.wh.write_atomic(regs, SKETCH_SCHEMA, self.name, coalesce=1)

    def estimates(self, spark: SparkSession) -> DataFrame:
        """(group_cols…, hll_estimate) straight off the stored
        registers — no history scan, the serving read."""
        regs = self.wh.read_with(spark, SKETCH_SCHEMA, self.name)
        return _hll_estimate_from_registers(regs, self.group_cols)


@query(
    "sketch_hll_stream_month",
    oracle=_sql_hll_oracle(_SQL_HLL_MONTH_EXPR, "order_month"),
)
def sketch_hll_stream_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INCREMENTAL register table, driver-proven: orders arrive as
    two batches (orderkey parity — both batches touch every month),
    fold into a persisted :class:`HllSketchTable`, estimates served
    from the stored state — under the SAME oracle as
    ``sketch_hll_explicit_month`` (max-merge associativity makes
    sequential ingest ≡ the one-shot build; the persisted-twin
    discipline, now for sketch state)."""
    from bitcoin_datawarehouse_spark.pipeline.catalog import (
        Warehouse,
        scratch_root,
    )

    wh = Warehouse(spark, scratch_root("bds_hll", sf_dir))
    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.selectExpr(
        f"{_HLL_MONTH_EXPR} AS order_month",
        "CAST(o_custkey AS STRING) AS hkey",
        "o_orderkey % 2 AS _half",
    )
    tbl = HllSketchTable(wh, ["order_month"])
    # fresh build per gate run: the scratch root is reused across
    # invocations, so a leftover state table must not double-count
    if tbl.exists():
        wh.drop_table(SKETCH_SCHEMA, tbl.name)
    for half in (0, 1):
        tbl.ingest(
            keyed.filter(F.col("_half") == half).drop("_half")
        )
    exact = orders.groupBy(
        F.expr(_HLL_MONTH_EXPR).alias("order_month")
    ).agg(
        F.countDistinct("o_custkey").cast("bigint").alias("exact_customers")
    )
    return tbl.estimates(spark).join(exact, "order_month")


def _sql_tokens() -> str:
    """Single source of truth for the oracle-side tokenizer: the same
    DuckDB expression text_stats' oracles use, so a change to the
    pinned tokenizer can't silently diverge the vocab oracle
    (text_stats does not import sketches — no cycle)."""
    from bitcoin_datawarehouse_spark.operators.text_stats import _SQL_TOKENS

    return _SQL_TOKENS


@query(
    "sketch_hll_vocab_per_lang",
    oracle=_sql_hll_oracle(
        "lang",
        "lang",
        relation=(
            "(SELECT lang, unnest("
            f"{_sql_tokens()}"
            ") AS token FROM documents)"
        ),
        key_expr="token",
        exact_alias="exact_vocab",
    ),
)
def sketch_hll_vocab_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus VOCABULARY cardinality per language via the explicit
    HLL — the tokenizer-sizing / corpus-profiling observable ("how
    many distinct tokens does each language slice hold?") that an
    exact count-distinct answers only by shuffling the whole
    vocabulary.

    The 100 TB shape this pins: the token stream explodes map-side,
    the register aggregate collapses it to ≤ m rows per language
    BEFORE the shuffle (map-side combine on (lang, j) MAX), so the
    exchange carries register sets, never tokens — the same plan at
    any corpus size.  The fixture's exact twin rides along for the
    error-contract pytest, exactly as in the customer gates."""
    from bitcoin_datawarehouse_spark.operators.dedup import tokens_col
    from bitcoin_datawarehouse_spark.functions.cachereg import cache_tracked

    docs = load_table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    # the exploded token frame feeds TWO subtrees of one action (the
    # HLL estimate and the exact twin) — cache it eagerly or the
    # repartition+tokenize+explode runs twice per execution
    tok = cache_tracked(
        docs.repartition(par)
        .select("lang", F.explode(tokens_col(F.col("text"))).alias("hkey"))
    )
    tok.count()
    est = _hll_estimate_frame(tok, ["lang"])
    exact = tok.groupBy("lang").agg(
        F.countDistinct("hkey").cast("bigint").alias("exact_vocab")
    )
    return est.join(exact, "lang")
