"""Deterministic fixture scale-up for bench-only runs.

Replicates a driver-generated fixture directory ``factor``× with
referential integrity preserved: every table's keys are offset by a
power-of-10 stride per copy (so ``key % k`` routing splits like
``doc_id % 4`` keep their meaning), dimension tables (region/nation)
stay fixed as in TPC-H, and the time range stays fixed (a larger
scale factor means MORE rows per time bucket, not a longer history —
the TPC-H convention).

Two columns get per-copy decorrelation so the dedup/ANN workloads
keep their candidate-density SHAPE instead of exploding
quadratically in exact clones:

* ``documents.text``: every token in copy ``i>0`` gets a ``c{i}``
  suffix — all shingles/bands differ across copies (zero cross-copy
  near-dups) while the INTRA-copy duplicate structure the queries
  hunt is replicated exactly.  The suffix is fused to the token
  WITHOUT a separator on purpose: an earlier ``_c{i}`` variant split
  at the ``_`` under the engines' ``[^a-z0-9]+`` tokenizer,
  injecting a shared ``c{i}`` token between every token pair of copy
  ``i`` — which dragged every doc in a copy into the same LSH
  buckets (measured: a 1 798-doc bucket → 6.3M candidate pairs at
  factor 10, a quadratic fixture artifact no real corpus has);
* ``embeddings.embedding``: copies are grouped into CLIQUES of
  ``EMB_CLUSTER`` (5): group 0 jitters the ORIGINAL vector by up to
  ±0.5% per dim (near- but not exact-duplicates), every later group
  starts from a FRESH deterministic pseudo-random vector keyed by
  (vec, group) and jitters within the group.  True near-dup clique
  size is therefore ~EMB_CLUSTER regardless of the factor — the
  round-4 scheme jittered every copy from the one base, so a
  factor-100 scale-up gave every vector 99 true near-dups and the
  dedup-family bench rows measured a quadratic pair volume no real
  corpus has (r4 VERDICT).  Caveat: CASCADED runs compound cliques
  (5 per stage) — generate density-sensitive fixtures in ONE stage
  (sf0.1 → sf10 at factor 100), which also keeps group-0 membership
  anchored to the original vectors.

Output goes to a NEW directory (never the read-only testdata).
Usage: python tools/gen_sf.py SRC_DIR DST_DIR FACTOR [--tables a,b,c]
                                                    [--shared-head K]
(``--tables`` restricts generation — e.g. only documents,embeddings
for a kernel-family probe at a factor where the full fact tables
would dominate generation time and disk.)

``--shared-head K`` makes the document decoration Zipf-respecting:
the K most frequent tokens of the SOURCE corpus stay undecorated in
every copy (like real corpora, whose head vocabulary saturates) and
only tail tokens get the per-copy suffix.  Default (K=0) decorates
every token, which multiplies the corpus vocabulary by the factor —
fine for dedup semantics (cross-copy shingles still differ wherever
a tail token appears), but it makes vocabulary-keyed aggregates
(bigram LMs, window-hash tables) grow linearly with the factor where
a real corpus' head would saturate (measured: the sf100 decade's two
super-linear rows, SCALING.md).  Cross-copy near-dup safety holds
because any 3-token shingle containing ≥1 tail token still differs
across copies; head-only shingles are shared — exactly as they are
between unrelated documents of the base corpus.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

#: near-dup clique size for replicated embeddings (see module docstring)
EMB_CLUSTER = 5


def stride_for(con: duckdb.DuckDBPyConnection, path: str, key: str) -> int:
    mx = con.execute(f"SELECT MAX({key}) FROM '{path}'").fetchone()[0]
    return 10 ** int(math.ceil(math.log10(int(mx) + 2)))


def main() -> int:
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    only = None
    if "--tables" in sys.argv:
        only = set(
            sys.argv[sys.argv.index("--tables") + 1].split(",")
        )
    shared_head = 0
    if "--shared-head" in sys.argv:
        shared_head = int(sys.argv[sys.argv.index("--shared-head") + 1])
    Path(dst).mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    def p(t: str) -> str:
        return f"{src}/{t}.parquet"

    s_cust = stride_for(con, p("customer"), "c_custkey")
    s_ord = stride_for(con, p("orders"), "o_orderkey")
    s_part = stride_for(con, p("part"), "p_partkey")
    s_supp = stride_for(con, p("supplier"), "s_suppkey")
    s_ev = stride_for(con, p("events"), "event_id")
    s_user = stride_for(con, p("events"), "user_id")
    s_doc = stride_for(con, p("documents"), "doc_id")
    s_vec = stride_for(con, p("embeddings"), "vec_id")

    copies = f"(SELECT unnest(generate_series(0, {factor - 1})) AS i)"

    # per-copy token decoration for documents: full (default) or
    # Zipf-respecting (--shared-head K keeps the source corpus' K most
    # frequent tokens undecorated — head vocabulary saturates as in a
    # real corpus; see module docstring)
    if shared_head:
        head = [
            r[0]
            for r in con.execute(
                f"""
                SELECT t FROM (
                  SELECT unnest(list_filter(
                    string_split_regex(lower(text), '[^a-z0-9]+'),
                    x -> x <> '')) AS t
                  FROM '{p("documents")}')
                GROUP BY t ORDER BY COUNT(*) DESC, t
                LIMIT {shared_head}"""
            ).fetchall()
        ]
        n_vocab = con.execute(
            f"""SELECT COUNT(DISTINCT t) FROM (
                  SELECT unnest(list_filter(
                    string_split_regex(lower(text), '[^a-z0-9]+'),
                    x -> x <> '')) AS t
                  FROM '{p("documents")}')"""
        ).fetchone()[0]
        if shared_head >= n_vocab:
            raise SystemExit(
                f"--shared-head {shared_head} >= source vocabulary "
                f"({n_vocab}): every token would stay undecorated and "
                "copies would be EXACT duplicates — pick K well below "
                "the vocabulary (the synthetic fixture's is tiny; "
                "K≈10 shares only its stopword-like head)"
            )
        head_sql = ",".join(
            "'" + t.replace("'", "''") + "'" for t in head
        )
        # head membership tests the token's ALNUM form (the same
        # [^a-z0-9]+ tokenizer that mined the head), so 'The,' still
        # counts as head 'the'; empty splits (repeated spaces) pass
        # through undecorated — appending would fabricate bare 'cN'
        # tokens.  Whitespace tokens containing several alnum runs
        # ('foo-bar') are compared as one concatenated form and
        # decorated whole when not head — acceptable for the
        # space-separated alnum fixture this targets.
        decorate = f"""array_to_string(
            list_transform(string_split(text, ' '),
              t -> CASE WHEN t = '' THEN t
                        WHEN regexp_replace(lower(t),
                                            '[^a-z0-9]+', '', 'g')
                             IN ({head_sql}) THEN t
                        ELSE t || 'c' || i END), ' ')"""
    else:
        decorate = "regexp_replace(text, '(\\S+)', '\\1c' || i, 'g')"

    jobs = {
        "region": f"SELECT * FROM '{p('region')}'",
        "nation": f"SELECT * FROM '{p('nation')}'",
        "customer": f"""
            SELECT c_custkey + i * {s_cust} AS c_custkey, c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM '{p('customer')}' CROSS JOIN {copies}""",
        "supplier": f"""
            SELECT s_suppkey + i * {s_supp} AS s_suppkey, s_name,
                   s_nationkey, s_acctbal
            FROM '{p('supplier')}' CROSS JOIN {copies}""",
        "part": f"""
            SELECT p_partkey + i * {s_part} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice
            FROM '{p('part')}' CROSS JOIN {copies}""",
        "orders": f"""
            SELECT o_orderkey + i * {s_ord} AS o_orderkey,
                   o_custkey + i * {s_cust} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM '{p('orders')}' CROSS JOIN {copies}""",
        "lineitem": f"""
            SELECT l_orderkey + i * {s_ord} AS l_orderkey,
                   l_partkey + i * {s_part} AS l_partkey,
                   l_suppkey + i * {s_supp} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM '{p('lineitem')}' CROSS JOIN {copies}""",
        "events": f"""
            SELECT event_id + i * {s_ev} AS event_id, ts,
                   user_id + i * {s_user} AS user_id,
                   event_type, value, props
            FROM '{p('events')}' CROSS JOIN {copies}""",
        "documents": f"""
            SELECT doc_id + i * {s_doc} AS doc_id,
                   CASE WHEN i = 0 THEN text
                        ELSE {decorate}
                   END AS text,
                   lang, source,
                   CAST(length(CASE WHEN i = 0 THEN text
                        ELSE {decorate}
                   END) AS BIGINT) AS n_chars
            FROM '{p('documents')}' CROSS JOIN {copies}""",
        "embeddings": f"""
            SELECT vec_id + i * {s_vec} AS vec_id,
                   CASE WHEN i = 0 THEN embedding
                        ELSE list_transform(
                          list_zip(embedding,
                                   range(1, len(embedding) + 1)),
                          z -> CAST(
                            (CASE WHEN i // {EMB_CLUSTER} = 0 THEN z[1]
                                  ELSE (CAST(hash(
                                    vec_id * 7919
                                    + CAST(z[2] AS BIGINT) * 104729
                                    + (i // {EMB_CLUSTER}) * 13)
                                    % 2001 AS BIGINT) - 1000) / 1000.0
                             END)
                            * (1.0 + (CAST(hash(
                                 vec_id * 1000 + CAST(z[2] AS BIGINT) * 7
                                 + i) % 101 AS BIGINT) - 50) * 1e-4)
                               AS FLOAT))
                   END AS embedding,
                   label
            FROM '{p('embeddings')}' CROSS JOIN {copies}""",
    }
    for table, sql in jobs.items():
        if only is not None and table not in only:
            continue
        con.execute(
            f"COPY ({sql}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM '{dst}/{table}.parquet'")
        print(table, n.fetchone()[0])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
