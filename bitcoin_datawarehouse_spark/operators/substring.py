"""Exact-substring duplicate-span detection (north-star extension).

The suffix-array ExactSubstr dedup of Lee et al. 2022 ("Deduplicating
Training Data Makes Language Models Better", public arXiv:2107.06499)
removes any substring that occurs twice anywhere in the corpus.  A
literal suffix array is a single-machine construction; the
Spark-shaped equivalent used here is rolling fixed-width token
windows: every W-token window of every document is hashed, a hash
aggregate finds windows occurring ≥2 times corpus-wide (across OR
within documents — same semantics as ExactSubstr), and per-document
span statistics report how much of each document is duplicated text.

Scale design (all three levers are CODE, with tests — not prose):
* the window explode is the big intermediate — (doc, pos, hash),
  ~n_tokens rows per doc.  ``winnow_s`` shrinks it by content-defined
  sampling (winnowing, Schleimer et al. SIGMOD'03, public): per doc,
  only the window holding the MINIMUM hash of each ``s`` consecutive
  windows is emitted.  Selection depends only on window *content*, so
  two copies of a duplicated run select the SAME windows regardless
  of their alignment in their documents — a plain stride-s sampling
  would miss runs whose copies start at different offsets mod s.
  Guarantee (pytest-pinned): any duplicated run of ≥ W + s - 1 tokens
  contains a full in-run group of s windows, whose min is selected
  identically in every copy — with s = W/2 that is every run
  ≥ 1.5·W.  Expected intermediate size is ~2/(s+1) of stride-1.
* duplicate detection is ONE pass over the window hashes.  Default: a
  count window partitioned by the hash (one shuffle; hash groups are
  ~1-2 rows).  Hot windows (boilerplate headers/footers shared by
  millions of docs) make that window-partition skew: ``hot_hash_cap``
  switches to a map-side-combining groupBy whose duplicated-hash set
  is SPLIT — hashes at ≥ cap occurrences (the tiny boilerplate set,
  ≤ total_windows/cap hashes by construction) join the window table
  as a BROADCAST semi-join, the warm remainder as a shuffle
  semi-join.  Output is identical (pytest-pinned on a planted
  100-way duplicate); only the physical skew profile changes.
* no pairwise comparison, no cross join; every shuffle is keyed by
  the window hash or doc_id.

Reference parity: the reference repo has no analytical dedup at all
(its pipeline is ELT scaffolding; see SURVEY.md §2.12) — this module
is part of the north-star training-data surface built on top.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.functions.cachereg import (
    cache_tracked,
)
from bitcoin_datawarehouse_spark.functions.numeric import (
    SQL_STR_ROUND6,
    str_round6,
)
from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table

#: window width in tokens — duplicated runs shorter than this are not
#: flagged (ExactSubstr uses 50 BPE tokens at corpus scale; 8 fits the
#: ~50-token fixture documents)
WINDOW_TOKENS = 8

_W = WINDOW_TOKENS

#: winnowing group size for the sampled variant: s = W/2 detects every
#: duplicated run ≥ 1.5·W (see module docstring)
WINNOW_S = _W // 2


def doc_windows(
    spark: SparkSession, sf_dir: str, winnow_s: int | None = None
) -> DataFrame:
    """(doc_id, pos, h, n_tokens): md5 of each W-token rolling window,
    plus ONE sentinel row per document (pos/h NULL) carrying its token
    count — so consumers get per-doc totals from the same pass instead
    of re-tokenizing the corpus.

    With ``winnow_s`` set, only winnowed windows are emitted: for each
    group of ``s`` consecutive windows starting at positions
    1..n_wins-s+1 (one whole-doc group when n_wins < s), the position
    of the group's minimum hash is selected.  The min compares the
    first 64 bits of the md5; ``np.argmin`` pins FIRST-POSITION on
    ties.  Ties are real, not just ~s·2⁻⁶⁴ hash collisions: identical
    adjacent windows occur whenever text repeats with period < W
    inside one s-group ("ha ha ha …"), so the oracle pins the same
    (h asc, pos asc) order explicitly via a composite arg_min key
    (see ``_wins_sql``).  The only residual divergence is a 64-bit
    *prefix* collision between distinct full hashes (~s·2⁻⁶⁴).

    Arrow-batched kernel for the same reason as ``doc_shingles``
    (dedup.py): higher-order-function lambdas are interpreted, and the
    per-row tokenize+hash CPU work is 3-5× faster in one vectorized
    pass.  Output hashes are byte-identical to the oracle's
    ``md5(array_to_string(tk[i:i+W-1], ' '))``.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    pat = re.compile("[^a-z0-9]+")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("pos", T.IntegerType()),
            T.StructField("h", T.StringType()),
            T.StructField("n_tokens", T.LongType()),
        ]
    )
    s = winnow_s

    def gen(batches):
        for pdf in batches:
            ids: list[int] = []
            poss: list[int | None] = []
            hs: list[str | None] = []
            nts: list[int | None] = []
            md5 = hashlib.md5
            for did, txt in zip(pdf["doc_id"], pdf["text"]):
                tk = [t for t in pat.split(txt.lower()) if t]
                # raw digests only; the hex string (the output/oracle
                # surface) is rendered ONLY for selected windows — the
                # per-window hexdigest + int(hex, 16) parse was the
                # kernel's single largest term (measured ~20% of
                # kernel wall; .hex() of a digest is the same string)
                digs = [
                    md5(" ".join(tk[i : i + _W]).encode()).digest()
                    for i in range(len(tk) - _W + 1)
                ]
                if s and digs:
                    h64 = np.frombuffer(
                        b"".join([d[:8] for d in digs]), dtype=">u8"
                    )
                    if len(h64) < s:
                        sel = {int(h64.argmin())}
                    else:
                        groups = np.lib.stride_tricks.sliding_window_view(
                            h64, s
                        )
                        sel = set(
                            (
                                groups.argmin(axis=1)
                                + np.arange(len(groups))
                            ).tolist()
                        )
                    keep = sorted(sel)
                else:
                    keep = range(len(digs))
                for i in keep:
                    ids.append(did)
                    poss.append(i + 1)
                    hs.append(digs[i].hex())
                    nts.append(None)
                ids.append(did)
                poss.append(None)
                hs.append(None)
                nts.append(len(tk))
            yield pd.DataFrame(
                {"doc_id": ids, "pos": poss, "h": hs, "n_tokens": nts}
            )

    docs = load_table(spark, sf_dir, "documents")
    # one-split fixture parquet: spread the CPU-heavy kernel across
    # cores (no-op-sized shuffle at real scale, see doc_shingles)
    par = spark.sparkContext.defaultParallelism
    return docs.repartition(par).select("doc_id", "text").mapInPandas(
        gen, schema
    )


def _wins_sql(winnow_s: int | None) -> str:
    """Oracle CTE chain ending in ``swins`` — the (possibly winnowed)
    window table — plus ``tok`` for per-doc totals."""
    base = f"""tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents
    ),
    wins AS (
      SELECT t.doc_id, g.i AS pos,
             md5(array_to_string(t.tk[g.i:g.i+{_W - 1}], ' ')) AS h
      FROM tok t,
      LATERAL (SELECT unnest(generate_series(1, len(t.tk)-{_W - 1})) AS i) g
    )"""
    if winnow_s is None:
        return base + ",\n    swins AS (SELECT * FROM wins)"
    s = winnow_s
    # tie-break must be EXPLICIT on both engines: identical adjacent
    # windows are common in repetitive text (period < W inside one
    # s-group, e.g. a token repeated 2W times), and DuckDB's arg_min
    # tie order inside a window frame is not a documented guarantee.
    # The kernel's np.argmin pins first-position; the oracle pins the
    # same (h asc, pos asc) order via a fixed-width composite key —
    # h is always 32 lowercase hex chars, so concatenating a
    # zero-padded pos keeps lexicographic = (h, pos) lexicographic.
    key = "w.h || lpad(CAST(w.pos AS VARCHAR), 10, '0')"
    return base + f""",
    nw AS (SELECT doc_id, COUNT(*) AS n_wins FROM wins GROUP BY doc_id),
    grp AS (
      SELECT w.doc_id, w.pos AS gstart, n.n_wins,
             arg_min(w.pos, {key}) OVER (
               PARTITION BY w.doc_id ORDER BY w.pos
               ROWS BETWEEN CURRENT ROW AND {s - 1} FOLLOWING
             ) AS selpos
      FROM wins w JOIN nw n USING (doc_id)
    ),
    sel AS (
      SELECT DISTINCT doc_id, selpos AS pos FROM grp
      WHERE gstart <= greatest(n_wins - {s} + 1, 1)
    ),
    swins AS (SELECT w.* FROM wins w JOIN sel USING (doc_id, pos))"""


def _spans_oracle(winnow_s: int | None) -> str:
    # dup_ratio is an integer-ratio quotient — exactly the class the
    # CLAUDE.md rule routes through SQL_STR_ROUND6 (power-of-two
    # denominators land on exact 1e-6 ties where native ROUND
    # diverges across engines)
    ratio = SQL_STR_ROUND6(
        "CAST(COALESCE(c.dup_tokens, 0) AS DOUBLE)"
        " / greatest(b.n_tokens, 1)"
    )
    return f"""
    WITH {_wins_sql(winnow_s)},
    freq AS (SELECT h FROM swins GROUP BY h HAVING COUNT(*) >= 2),
    dup AS (SELECT w.doc_id, w.pos FROM swins w JOIN freq f USING (h)),
    cov AS (
      SELECT DISTINCT d.doc_id, d.pos + o.j AS p
      FROM dup d,
      LATERAL (SELECT unnest(generate_series(0, {_W - 1})) AS j) o
    ),
    covc AS (SELECT doc_id, COUNT(*) AS dup_tokens FROM cov GROUP BY doc_id),
    dupc AS (
      SELECT doc_id, COUNT(*) AS n_dup_windows FROM dup GROUP BY doc_id
    ),
    base AS (
      SELECT doc_id, len(tk) AS n_tokens,
             greatest(len(tk) - {_W - 1}, 0) AS n_windows
      FROM tok
    )
    SELECT b.doc_id,
           CAST(b.n_tokens AS BIGINT) AS n_tokens,
           CAST(b.n_windows AS BIGINT) AS n_windows,
           CAST(COALESCE(d.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
           CAST(COALESCE(c.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           {ratio} AS dup_ratio
    FROM base b
    LEFT JOIN dupc d USING (doc_id)
    LEFT JOIN covc c USING (doc_id)
    """


def substring_spans(
    spark: SparkSession,
    sf_dir: str,
    winnow_s: int | None = None,
    hot_hash_cap: int | None = None,
) -> DataFrame:
    """Shared body of the two registered variants; the parameters are
    the corpus-scale levers described in the module docstring.

    Plan: Arrow window kernel (ONE execution) → duplicate detection
    (hash-partitioned count window, or the groupBy + split semi-join
    under ``hot_hash_cap``) → position explode → one per-doc
    aggregate.  No cross join.
    """
    from pyspark.sql import Window

    kern = cache_tracked(doc_windows(spark, sf_dir, winnow_s=winnow_s))
    # eager fill: the duplicate-detection and per-doc-base subtrees
    # both read this cache (CLAUDE.md multi-subtree rule)
    kern.count()
    wins = kern.filter(F.col("h").isNotNull()).select("doc_id", "pos", "h")
    if hot_hash_cap is None:
        # ONE window count partitioned by the hash: cheaper than a
        # groupBy+join-back when no hash is hot (groups are ~1-2 rows)
        dup = (
            wins.withColumn(
                "cnt", F.count(F.lit(1)).over(Window.partitionBy("h"))
            )
            .filter(F.col("cnt") >= 2)
            .select("doc_id", "pos")
        )
    else:
        # skew-proof path: map-side-combining count, then the dup-hash
        # set split at the cap — the boilerplate set (≥ cap copies) is
        # tiny by construction and joins broadcast, so no single
        # reducer ever owns a million-row hash group
        counts = (
            wins.groupBy("h")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") >= 2)
        )
        warm = counts.filter(F.col("cnt") < hot_hash_cap).select("h")
        hot = counts.filter(F.col("cnt") >= hot_hash_cap).select("h")
        dup = (
            wins.join(warm, "h", "left_semi")
            .unionByName(wins.join(F.broadcast(hot), "h", "left_semi"))
            .select("doc_id", "pos")
        )

    # both per-doc statistics in ONE aggregation over the exploded
    # coverage rows (two subtrees over `dup` would recompute the
    # kernel+window): window positions are unique per doc, so
    # n_dup_windows = COUNT(DISTINCT pos) survives the explode
    stats = (
        dup.select(
            "doc_id",
            "pos",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(_W - 1))
            ).alias("p"),
        )
        .groupBy("doc_id")
        .agg(
            F.count_distinct(F.col("pos")).alias("n_dup_windows"),
            F.count_distinct(F.col("p")).alias("dup_tokens"),
        )
    )

    # per-doc totals from the SAME kernel pass (the sentinel rows) —
    # round 2 re-tokenized the whole corpus here just for n_tokens
    base = kern.filter(F.col("h").isNull()).select(
        "doc_id", F.col("n_tokens").cast("long").alias("n_tokens")
    ).withColumn(
        "n_windows",
        F.greatest(F.col("n_tokens") - F.lit(_W - 1), F.lit(0)).cast("long"),
    )

    return (
        base.join(stats, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_windows",
            F.coalesce(F.col("n_dup_windows"), F.lit(0))
            .cast("long")
            .alias("n_dup_windows"),
            F.coalesce(F.col("dup_tokens"), F.lit(0))
            .cast("long")
            .alias("dup_tokens"),
            str_round6(
                F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("double")
                / F.greatest(F.col("n_tokens"), F.lit(1)),
            ).alias("dup_ratio"),
        )
    )


@query("dedup_substring_spans", oracle=_spans_oracle(None))
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span statistics (ExactSubstr-shaped).

    A window is *duplicated* if its W-token text occurs ≥2 times in
    the whole corpus (across or within documents).  ``dup_tokens``
    counts the distinct token positions covered by at least one
    duplicated window — i.e. the length of text that exact-substring
    dedup would cut; ``dup_ratio`` is that as a fraction of the doc.
    Exact mode: every window hashed (stride 1, no cap).
    """
    return substring_spans(spark, sf_dir)


@query(
    "dedup_substring_spans_winnowed",
    oracle=_spans_oracle(WINNOW_S),
)
def dedup_substring_spans_winnowed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The corpus-scale configuration: winnowed window sampling at
    s = W/2 cuts the (doc, pos, hash) intermediate to ~2/(s+1) of
    stride-1 while still flagging every duplicated run ≥ 1.5·W
    (content-defined selection — see module docstring; the guarantee
    is pytest-pinned against planted runs at arbitrary alignments).
    ``n_dup_windows``/``dup_tokens`` become lower-bound estimates over
    the sampled windows; ``n_tokens``/``n_windows`` stay exact."""
    return substring_spans(spark, sf_dir, winnow_s=WINNOW_S)
