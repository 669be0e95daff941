"""End-to-end Bitcoin warehouse demo — the reference's workflow on Spark.

Recreates the reference's full loop (SURVEY.md §3) against recorded
responses, with the reference's own job registry shape and transform
spec layout:

1. record synthetic remote responses for the five jobs
   (``etl_system/etl_job.csv:2-6``: bitcoin_inputs/2177353,
   bitcoin_output/2177447, prices_usd/5816212,
   bitcoin_transactions/2177280, bitcoin_block/2177266);
2. seed the job registry, apply the ``column_transform.yaml``-shaped
   spec (renames + ``UPPER([entity])``), run first sync (full
   refresh) then an incremental sync with watermark pushdown;
3. answer the analytical questions the reference's star schema exists
   for (SURVEY.md §2.11) — in-process, via SQL over the warehouse:
   block-chain self-join, transaction-value-in-USD as-of join, daily
   fee revenue.

Run: ``python examples/bitcoin_warehouse_demo.py [workdir]``
"""

from __future__ import annotations

import datetime as dt
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bitcoin_datawarehouse_spark.pipeline import (  # noqa: E402
    FileReplaySource,
    LoadStrategy,
    Pipeline,
    Warehouse,
    parse_spec,
    register_warehouse_views,
    run_sql,
)
from bitcoin_datawarehouse_spark.session import get_spark

#: the reference's five jobs (etl_job.csv:2-6) — job name, query id,
#: target table, merge key
REFERENCE_JOBS = [
    ("bitcoin_inputs", 2177353, "input", "transaction_id"),
    ("bitcoin_output", 2177447, "output", "transaction_id"),
    ("prices_usd", 5816212, "price_usd", "date"),
    ("bitcoin_transactions", 2177280, "transactions", "transaction_id"),
    ("bitcoin_block", 2177266, "block", "hash"),
]

#: reference column_transform.yaml, same layout (renames + DSL)
TRANSFORM_SPEC = """
tables:
  - name: bitcoin_inputs
    columns:
      - address:
        tx_id: transaction_id
        value: bitcoin_amount
        date:
    transform:
      - dimension_attribute_name: UPPER([entity])
  - name: bitcoin_output
    columns:
      - address:
        tx_id: transaction_id
        value: bitcoin_amount
        date:
    transform:
      - dimension_attribute_name: UPPER([entity])
  - name: prices_usd
    columns:
      - date:
        price: price_in_dollar
  - name: bitcoin_transactions
    columns:
      - block_time:
        fee:
        id: transaction_id
        input_value:
        output_value:
        block_hash:
        date:
  - name: bitcoin_block
    columns:
      - hash:
        height:
        previous_block_hash:
        total_fees:
        transaction_count:
        date:
"""

N_BLOCKS = 40
TX_PER_BLOCK = 5
START = dt.date(2025, 1, 1)


def synth_rows(n_blocks: int = N_BLOCKS) -> dict[int, list[dict]]:
    """Deterministic synthetic bitcoin rows in the remote JSON shape."""
    blocks, txs, inputs, outputs, prices = [], [], [], [], []
    for b in range(n_blocks):
        day = START + dt.timedelta(days=b // 4)
        bh = f"blk{b:06d}"
        blocks.append(
            {
                "hash": bh,
                "height": b,
                "previous_block_hash": f"blk{b - 1:06d}" if b else None,
                "total_fees": round(0.01 * (b % 7), 8),
                "transaction_count": TX_PER_BLOCK,
                "date": str(day),
            }
        )
        for t in range(TX_PER_BLOCK):
            txid = f"tx{b:06d}_{t}"
            fee = round(0.0001 * ((b + t) % 11), 8)
            txs.append(
                {
                    "id": txid,
                    "block_time": f"{day}T{(b * 7 + t) % 24:02d}:00:00",
                    "block_hash": bh,
                    "fee": fee,
                    "input_value": round(1.0 + 0.1 * t, 8),
                    "output_value": round(1.0 + 0.1 * t - fee, 8),
                    "date": str(day),
                }
            )
            inputs.append(
                {
                    "tx_id": txid,
                    "address": f"addr{(b * 3 + t) % 17}",
                    "value": round(1.0 + 0.1 * t, 8),
                    "entity": ["miner", "exchange", "user"][t % 3],
                    "date": str(day),
                }
            )
            outputs.append(
                {
                    "tx_id": txid,
                    "address": f"addr{(b * 5 + t) % 17}",
                    "value": round(1.0 + 0.1 * t - fee, 8),
                    "entity": ["miner", "exchange", "user"][(t + 1) % 3],
                    "date": str(day),
                }
            )
    n_days = (n_blocks - 1) // 4 + 1
    for d in range(n_days):
        day = START + dt.timedelta(days=d)
        prices.append(
            {"date": str(day), "price": round(40000 + 250.0 * d, 2)}
        )
    return {
        2177353: inputs,
        2177447: outputs,
        5816212: prices,
        2177280: txs,
        2177266: blocks,
    }


def record_responses(dirpath: Path, data: dict[int, list[dict]]) -> None:
    dirpath.mkdir(parents=True, exist_ok=True)
    for qid, rows in data.items():
        (dirpath / f"{qid}.json").write_text(
            json.dumps({"result": {"rows": rows}})
        )


ANALYTICAL_SQL = {
    # block-chain self-join (§2.11: hash ↔ previous_block_hash)
    "chain_check": """
        SELECT COUNT(*) AS linked_blocks
        FROM bitcoin_block b
        JOIN bitcoin_block p ON b.previous_block_hash = p.hash
        WHERE b.height = p.height + 1
    """,
    # transaction value in USD — the as-of/date join
    "tx_value_usd": """
        SELECT t.transaction_id,
               ROUND(t.output_value * p.price_in_dollar, 2) AS usd_value
        FROM bitcoin_transactions t
        JOIN bitcoin_price_usd p ON t.date = p.date
        ORDER BY usd_value DESC LIMIT 5
    """,
    # daily fee revenue (GROUP BY aggregate over the fact table)
    "daily_fees": """
        SELECT t.date, SUM(t.fee) AS total_fees, COUNT(*) AS n_tx
        FROM bitcoin_transactions t
        GROUP BY t.date ORDER BY t.date
    """,
    # flow by entity over inputs+outputs (set-op + groupBy + P2 UPPER)
    "entity_flow": """
        SELECT dimension_attribute_name AS entity, SUM(bitcoin_amount) AS btc
        FROM (
          SELECT dimension_attribute_name, bitcoin_amount FROM bitcoin_input
          UNION ALL
          SELECT dimension_attribute_name, bitcoin_amount FROM bitcoin_output
        ) GROUP BY 1 ORDER BY 2 DESC
    """,
}


def run_demo(workdir: str | None = None, spark=None) -> dict:
    work = Path(workdir or tempfile.mkdtemp(prefix="btc_demo_"))
    spark = spark or get_spark("bitcoin-demo")
    responses = work / "responses"
    record_responses(responses, synth_rows())

    wh = Warehouse(spark, str(work / "warehouse"))
    pipe = Pipeline(
        spark,
        wh,
        FileReplaySource(str(responses), param_column="date"),
        specs=parse_spec(TRANSFORM_SPEC),
    )
    pipe.control.seed(
        [
            {
                "job_name": name,
                "query_id": qid,
                "target_table": tgt,
                "p_key": key,
                "status": 0,
                "active": 1,
                "incremental_column": "date",
            }
            for name, qid, tgt, key in REFERENCE_JOBS
        ]
    )

    first = pipe.run()  # first sync → full refresh per job
    # new data arrives: extend the chain, re-record
    record_responses(responses, synth_rows(N_BLOCKS + 12))
    second = pipe.run()  # incremental: watermark pushdown + merge

    register_warehouse_views(spark, wh)
    answers = {
        name: [r.asDict() for r in run_sql(spark, sql).collect()]
        for name, sql in ANALYTICAL_SQL.items()
    }
    return {
        "first_sync": {r.job_name: r.rows_loaded for r in first},
        "second_sync": {r.job_name: r.rows_loaded for r in second},
        "all_ok": all(r.ok for r in first + second),
        "answers": answers,
    }


if __name__ == "__main__":
    out = run_demo(sys.argv[1] if len(sys.argv) > 1 else None)
    print(json.dumps(out, indent=2, default=str))
