"""CLI subcommands: bronze -> silver -> gold end-to-end in one process
(the reference's spark-submit scripts as `python -m` entry points)."""

from __future__ import annotations

import datetime as dt

from w_userflow_featurestore_spark.__main__ import main

EVENTS_DDL = ("event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string")


def test_cli_bronze_silver_gold_pipeline(spark, tmp_path, capsys):
    src = str(tmp_path / "src")
    spark.createDataFrame([
        (1, dt.datetime(2024, 1, 1, 10, 0), 1, "view", 1.0, '{"k": 1}'),
        (2, dt.datetime(2024, 1, 1, 10, 5), 1, "purchase", 60.0, '{"k": 1}'),
        (3, dt.datetime(2024, 1, 1, 11, 0), 2, "error", 5.0, '{"k": 2}'),
    ], EVENTS_DDL).coalesce(1).write.parquet(src)

    bronze, ckpt = str(tmp_path / "bronze"), str(tmp_path / "ckpt")
    assert main(["bronze", "--source", src, "--out", bronze,
                 "--checkpoint", ckpt]) == 0

    silver, ledger = str(tmp_path / "silver"), str(tmp_path / "ledger.json")
    assert main(["silver", "--events", bronze, "--silver", silver,
                 "--ledger", ledger, "--now", "2024-02-01 00:00:00"]) == 0
    assert "sessions_upserted=2" in capsys.readouterr().out

    gold = str(tmp_path / "gold")
    assert main(["gold", "--silver", silver, "--events", bronze,
                 "--out", gold]) == 0
    assert spark.read.parquet(f"{gold}/user_daily").count() == 2
