"""Metric-history anomaly detection (pipeline/quality.py MetricHistory).

The driver gate ``pipeline_quality_metric_anomaly`` proves the
median ± k·MAD rule cross-engine; these tests pin the stateful ledger:
recording, windowing, the robustness property that motivates MAD over
stddev, and the zero-MAD floor.
"""

from __future__ import annotations

from bitcoin_datawarehouse_spark.pipeline import Warehouse
from bitcoin_datawarehouse_spark.pipeline.quality import MetricHistory


def _seed(wh, job, values):
    h = MetricHistory(wh, job)
    for v in values:
        h.record({"rows": v, "null_ratio": 0.01})
    return h


def test_short_batch_flags_healthy_does_not(spark, tmp_warehouse):
    wh = Warehouse(spark, tmp_warehouse)
    h = _seed(wh, "blocks", [100, 102, 98, 101, 99, 100])
    bad = h.check({"rows": 50}, k=4.0)
    assert [a.metric for a in bad] == ["rows"]
    assert bad[0].median == 100.0
    assert h.check({"rows": 103}, k=4.0) == []


def test_min_history_suppresses_early_flags(spark, tmp_warehouse):
    wh = Warehouse(spark, tmp_warehouse)
    h = MetricHistory(wh, "blocks")
    assert h.check({"rows": 9999}) == []  # no ledger at all
    h.record({"rows": 100})
    h.record({"rows": 101})
    # two batches are not a distribution — no flag even at 100×
    assert h.check({"rows": 9999}, min_history=4) == []


def test_mad_is_robust_to_a_prior_bad_batch(spark, tmp_warehouse):
    """The reason for median±MAD: one historical outlier inflates a
    stddev enough to mask the next bad batch, but barely moves the
    MAD — the next short load must still flag."""
    import statistics

    vals = [100, 102, 98, 101, 99, 100, 400]  # 400 = prior bad batch
    wh = Warehouse(spark, tmp_warehouse)
    h = _seed(wh, "blocks", vals)
    nxt = 50.0
    # mean ± 3σ would MISS it (the 400 inflated σ):
    assert abs(nxt - statistics.mean(vals)) < 3 * statistics.stdev(vals)
    # median ± 4·MAD catches it:
    bad = h.check({"rows": nxt}, k=4.0)
    assert [a.metric for a in bad] == ["rows"]


def test_zero_mad_floor(spark, tmp_warehouse):
    wh = Warehouse(spark, tmp_warehouse)
    h = _seed(wh, "blocks", [100, 100, 100, 100])  # MAD = 0
    # without a floor, ANY jitter flags (threshold 0)
    assert h.check({"rows": 101}, k=3.0) != []
    # the floor absorbs benign jitter, still catches a real drop
    assert h.check({"rows": 101}, k=3.0, floor=5.0) == []
    assert h.check({"rows": 50}, k=3.0, floor=5.0) != []


def test_window_limits_history(spark, tmp_warehouse):
    """Only the trailing `window` batches form the baseline: after the
    metric LEGITIMATELY shifts regime (100 → 1000), a window-sized
    history accepts the new level while the all-time history would
    still flag it."""
    wh = Warehouse(spark, tmp_warehouse)
    h = _seed(wh, "blocks", [100] * 8 + [1000, 1001, 999, 1000])
    assert h.check({"rows": 1000}, k=4.0, window=4, floor=5.0) == []
    # the all-time baseline is still dominated by the old regime
    # (median 100, MAD 0 → the floor is the threshold) and flags it
    assert h.check({"rows": 1000}, k=4.0, window=100, floor=5.0) != []


def test_sparse_seq_window_is_by_rank_not_value(spark, tmp_warehouse):
    """r11 ADVICE: batch_seq is caller-supplied and may be sparse
    (epoch-derived ids); the trailing window must cover the last N
    DISTINCT seqs by RANK.  Under value-windowing, window=3 over seqs
    100/200/300/400 kept only seq 400 (n=1 < min_history) and the
    check silently skipped every metric."""
    wh = Warehouse(spark, tmp_warehouse)
    h = MetricHistory(wh, "blocks")
    for seq, v in [(100, 1.0), (200, 1.0), (300, 9.0), (400, 9.0)]:
        h.record({"rows": v}, batch_seq=seq)
    bad = h.check({"rows": 1.0}, k=3.0, window=3, min_history=3)
    assert [a.metric for a in bad] == ["rows"]
    # median over the last-3-by-rank slice [1, 9, 9] — a full-history
    # median would be 5.0, a value-window slice would never get here
    assert bad[0].median == 9.0
    assert h.check({"rows": 9.0}, k=3.0, window=3, min_history=3) == []


def test_derived_seq_record_takes_warehouse_lock(
    spark, tmp_warehouse, monkeypatch
):
    """r11 ADVICE: last_seq()+append is a read-modify-write over the
    shared ledger — the derived-seq path runs under the warehouse
    lock so two concurrent recorders cannot assign the same seq and
    double-weight the baseline.  Caller-supplied seqs skip the lock
    (uniqueness is then the caller's contract)."""
    wh = Warehouse(spark, tmp_warehouse)
    calls: list[str] = []
    real_lock = wh.lock

    def spy(name="pipeline", timeout_s=60.0):
        calls.append(name)
        return real_lock(name, timeout_s)

    monkeypatch.setattr(wh, "lock", spy)
    h = MetricHistory(wh, "blocks")
    assert h.record({"rows": 1.0}) == 1
    assert calls and calls[-1].startswith("metric_history")
    n = len(calls)
    assert h.record({"rows": 2.0}, batch_seq=50) == 50
    assert len(calls) == n
