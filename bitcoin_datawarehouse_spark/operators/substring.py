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

Scale design:
* the window explode is the big intermediate — (doc, pos, hash),
  ~n_tokens rows per doc, same order of magnitude as the shingle
  tables the other dedup operators already build;
* duplicate detection is ONE hash aggregate on the window hash with
  map-side partial aggregation, then an equi-join of windows against
  the duplicated hashes — no pairwise comparison, no cross join;
* hot windows (boilerplate headers/footers shared by millions of
  docs) are the skew hazard: at corpus scale you cap the frequency
  count (count ≥ 2 is all the join needs, so the aggregate can stop
  counting at 2) and salt the hottest hashes; not applied at fixture
  scale because the oracle computes the identical set either way;
* at 100 TB you'd also stride the windows (stride W/2 finds any
  duplicated run ≥ 1.5·W at half the intermediate size); stride 1 at
  fixture scale keeps the oracle simple and the detection exact for
  runs ≥ W.

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
from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table

#: window width in tokens — duplicated runs shorter than this are not
#: flagged (ExactSubstr uses 50 BPE tokens at corpus scale; 8 fits the
#: ~50-token fixture documents)
WINDOW_TOKENS = 8

_W = WINDOW_TOKENS


def doc_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, h, n_tokens): md5 of each W-token rolling window,
    plus ONE sentinel row per document (pos/h NULL) carrying its token
    count — so consumers get per-doc totals from the same pass instead
    of re-tokenizing the corpus.

    Arrow-batched kernel for the same reason as ``doc_shingles``
    (dedup.py): higher-order-function lambdas are interpreted, and the
    per-row tokenize+hash CPU work is 3-5× faster in one vectorized
    pass.  Output hashes are byte-identical to the oracle's
    ``md5(array_to_string(tk[i:i+W-1], ' '))``.
    """
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

    def gen(batches):
        for pdf in batches:
            ids: list[int] = []
            poss: list[int | None] = []
            hs: list[str | None] = []
            nts: list[int | None] = []
            for did, txt in zip(pdf["doc_id"], pdf["text"]):
                tk = [t for t in pat.split(txt.lower()) if t]
                for i in range(len(tk) - _W + 1):
                    ids.append(did)
                    poss.append(i + 1)
                    hs.append(
                        hashlib.md5(
                            " ".join(tk[i : i + _W]).encode()
                        ).hexdigest()
                    )
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


@query(
    "dedup_substring_spans",
    oracle=f"""
    WITH tok AS (
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
    ),
    freq AS (SELECT h FROM wins GROUP BY h HAVING COUNT(*) >= 2),
    dup AS (SELECT w.doc_id, w.pos FROM wins w JOIN freq f USING (h)),
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
           ROUND(CAST(COALESCE(c.dup_tokens, 0) AS DOUBLE)
                 / greatest(b.n_tokens, 1), 6) AS dup_ratio
    FROM base b
    LEFT JOIN dupc d USING (doc_id)
    LEFT JOIN covc c USING (doc_id)
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span statistics (ExactSubstr-shaped).

    A window is *duplicated* if its W-token text occurs ≥2 times in
    the whole corpus (across or within documents).  ``dup_tokens``
    counts the distinct token positions covered by at least one
    duplicated window — i.e. the length of text that exact-substring
    dedup would cut; ``dup_ratio`` is that as a fraction of the doc.

    Plan: Arrow window kernel (ONE execution) → window count
    partitioned by hash → filter count≥2 → position explode → one
    per-doc aggregate.  No cross join; every shuffle is keyed by the
    window hash or doc_id.
    """
    from pyspark.sql import Window

    kern = cache_tracked(doc_windows(spark, sf_dir))
    # eager fill: the duplicate-detection and per-doc-base subtrees
    # both read this cache (CLAUDE.md multi-subtree rule)
    kern.count()
    wins = kern.filter(F.col("h").isNotNull()).select("doc_id", "pos", "h")
    # duplicate detection as ONE window count partitioned by the hash:
    # cheaper than a groupBy+join-back (one shuffle, hash groups are
    # ~1-2 rows)
    dup = (
        wins.withColumn(
            "cnt", F.count(F.lit(1)).over(Window.partitionBy("h"))
        )
        .filter(F.col("cnt") >= 2)
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
            F.round(
                F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("double")
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                6,
            ).alias("dup_ratio"),
        )
    )
