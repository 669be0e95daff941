"""BPE production-shape scale probe (r8 VERDICT item 1).

Three claims to measure, each at a merge count an order beyond the
8-round gate:

1. **Delta trainer vs full recount at 256 rounds** — the
   ``get_stats``-delta rule re-counts only words CONTAINING the
   merged pair; the full recount re-explodes every symbol of every
   word every round.  Claim: delta's per-round wall stays roughly
   flat while recount's stays proportional to total vocabulary
   symbol mass; at 256 rounds delta total < recount total, and the
   gap widens with rounds (recount is also measured at 64 rounds for
   the slope).
2. **Touched-slice decay** — the fraction of vocabulary words the
   delta re-counts per round, sampled every 32 rounds.  Claim:
   geometric-ish decay (later merges are rarer pairs), the quantity
   that makes 10⁴–10⁵ rounds plausible.
3. **Kernel apply vs chained-replace apply at 256 merges** — the
   Arrow kernel carries merges as a rank dict (cost per merge: one
   dict entry); the chained plan builds one codegen ``replace`` node
   per merge (cost: expression-tree depth — the r8 blow-up flag).
   Claim: kernel wall roughly flat in merge count, chained wall
   superlinear (analysis + codegen + 256 stacked string passes).

Corpus: documents at --factor× sf0.1 via gen_sf (--shared-head so
the grown vocabulary stays Zipf-shaped rather than exploding with
distinct stride-copied words).  CAVEAT (measured): the synthetic
fixture's source vocabulary is ~31 tokens — even at factor 10 the
word table is ~220 rows, so BOTH trainers run at the per-round
scheduling floor and the delta's smaller shuffle cannot show.  The
``--synth-vocab N`` mode probes the claim at a REALISTIC vocabulary:
N distinct words composed from a 64-syllable inventory (shared
substructure so merges cascade as in natural text) with Zipf counts —
the trainer's input is a (s, cnt) word table either way, so the
synthetic table probes exactly the surface the fixture cannot.

Output: one JSON line per measurement, for SCALING.md.

Usage: python tools/probe_bpe_scale.py [--factor N] [--rounds R]
                                       [--synth-vocab N]
       (defaults: factor 10 = sf1, rounds 256)
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SCRATCH = Path("/tmp/bpe_scale_probe")


def emit(**kv) -> None:
    print(json.dumps(kv), flush=True)


def main() -> int:
    factor = 10
    rounds = 256
    synth_vocab = 0
    if "--factor" in sys.argv:
        factor = int(sys.argv[sys.argv.index("--factor") + 1])
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])
    if "--synth-vocab" in sys.argv:
        synth_vocab = int(sys.argv[sys.argv.index("--synth-vocab") + 1])

    from pyspark.sql import functions as F

    from bitcoin_datawarehouse_spark.operators.bpe import (
        bpe_apply_kernel,
        bpe_encode_chained,
        bpe_train,
        bpe_train_full_recount,
        bpe_word_table,
    )
    from bitcoin_datawarehouse_spark.session import get_spark

    spark = get_spark()

    gen_dir = None
    if synth_vocab:
        # N distinct words from a 64-syllable inventory (1-4
        # syllables each, md5-chosen → deterministic), Zipf counts —
        # shared substructure makes merges cascade like natural text
        sylls = [
            f"{a}{b}" for a in "bcdfghjklmnpqrst" for b in "aeiou"
        ][:64]
        syl_arr = F.array(*[F.lit(s) for s in sylls])
        base = spark.range(synth_vocab)
        h = F.md5(F.col("id").cast("string").cast("binary"))
        parts = []
        for k in range(4):
            nib = F.conv(F.substring(h, 2 * k + 1, 2), 16, 10).cast("int")
            pick = F.element_at(syl_arr, nib % 64 + 1)
            parts.append(
                F.when(F.col("id") % 4 >= F.lit(k), pick).otherwise(
                    F.lit("")
                )
            )
        words = base.select(
            F.concat(*parts).alias("word"),
            (
                F.lit(synth_vocab) / (F.col("id") + 1)
            ).cast("bigint").alias("cnt"),
        ).groupBy(F.regexp_replace("word", "(.)", "[$1]").alias("s")).agg(
            F.sum(F.greatest(F.col("cnt"), F.lit(1))).alias("cnt")
        )
        emit(step="synth", requested=synth_vocab)
    else:
        if SCRATCH.exists():
            shutil.rmtree(SCRATCH)
        SCRATCH.mkdir(parents=True)
        gen_dir = SCRATCH / "gen"
        t0 = time.perf_counter()
        subprocess.run(
            [
                sys.executable,
                str(REPO / "tools" / "gen_sf.py"),
                "/root/testdata/sf0.1",
                str(gen_dir),
                str(factor),
                "--tables",
                "documents",
                "--shared-head",
                "10",  # the synthetic fixture's vocabulary: ~31 tokens
            ],
            check=True,
        )
        emit(step="generate", factor=factor,
             sec=round(time.perf_counter() - t0, 1))
        words = bpe_word_table(spark, str(gen_dir))

    words = words.localCheckpoint()
    n_vocab = words.count()
    symbol_mass = words.select(
        F.sum(F.length("s") / 3).cast("bigint").alias("m")
    ).collect()[0]["m"]
    emit(step="vocab", words=n_vocab, symbol_mass=int(symbol_mass))

    # warm the session (codegen/JIT) on a tiny run before timing
    bpe_train(words.limit(1000), 2)

    # ---- claim 1+2: delta trainer, with touched-slice sampling --------
    t0 = time.perf_counter()
    merges = bpe_train(words, rounds)
    delta_sec = round(time.perf_counter() - t0, 1)
    emit(step="train_delta", rounds=len(merges), sec=delta_sec,
         sec_per_round=round(delta_sec / max(len(merges), 1), 3))

    # touched fraction every 32 rounds: replay merges over the words
    # frame and count containing words (probe-only pass, not training)
    w = words
    for i, (_r, a, b, _m, _c) in enumerate(merges):
        pat = f"[{a}][{b}]"
        if i % 32 == 0:
            frac = (
                w.filter(F.col("s").contains(pat)).count() / n_vocab
            )
            emit(step="touched_frac", round=i, frac=round(frac, 5),
                 pair=a + "+" + b)
        w = w.select(
            F.replace(F.col("s"), F.lit(pat), F.lit(f"[{a}{b}]")).alias("s"),
            "cnt",
        )
        if (i + 1) % 16 == 0:
            w = w.localCheckpoint()

    # ---- claim 1: full recount at 64 and (if bearable) 256 ------------
    t0 = time.perf_counter()
    m64 = bpe_train_full_recount(words, 64)
    emit(step="train_recount", rounds=len(m64),
         sec=round(time.perf_counter() - t0, 1))
    t0 = time.perf_counter()
    m_all = bpe_train_full_recount(words, rounds)
    rec_sec = round(time.perf_counter() - t0, 1)
    emit(step="train_recount", rounds=len(m_all), sec=rec_sec,
         equal_to_delta=m_all == merges)

    # ---- claim 3: apply paths at the full merge count ------------------
    if gen_dir is None:  # synth-vocab mode has no document corpus
        return 0
    docs = spark.read.parquet(str(gen_dir / "documents.parquet"))
    n_docs = docs.count()
    for label, fn in (
        ("apply_kernel", lambda: bpe_apply_kernel(docs, merges)),
        ("apply_chained", lambda: bpe_encode_chained(docs, merges)),
    ):
        fn().count()  # warm (codegen for chained, Arrow init for kernel)
        t0 = time.perf_counter()
        out = fn().count()
        emit(step=label, merges=len(merges), docs=n_docs, rows=out,
             sec=round(time.perf_counter() - t0, 1))

    # cross-path equality at the probe's merge count (not just the
    # gate's 8): the bit-equality claim at production scale
    k = {tuple(r) for r in bpe_apply_kernel(docs, merges).collect()}
    c = {tuple(r) for r in bpe_encode_chained(docs, merges).collect()}
    emit(step="apply_equal", equal=k == c, rows=len(k))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
