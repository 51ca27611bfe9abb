"""Hand-computed FIFO lot-matching pin for the cumulative-interval
alignment in plans/relational_queries.py:fifo_lot_allocation (the
parity test covers the DuckDB mirror; this pins the SEMANTICS on a
constructed ledger where the expected allocation is worked out by
hand below)."""

from __future__ import annotations

import datetime as dt

from fred_economic_data_pipeline_local_spark.plans import all_queries


def _li(spark, rows):
    # (partkey, qty, price, returnflag, shipdate, orderkey, linenumber)
    # l_shipdate is TIMESTAMP in the pinned fixture schema
    return spark.createDataFrame(
        [
            (
                pk,
                float(q),
                float(p),
                rf,
                dt.datetime.fromisoformat(sd + " 00:00:00"),
                ok,
                ln,
            )
            for pk, q, p, rf, sd, ok, ln in rows
        ],
        "l_partkey long, l_quantity double, l_extendedprice double, "
        "l_returnflag string, l_shipdate timestamp, l_orderkey long, "
        "l_linenumber int",
    )


def test_fifo_allocation_splits_an_issue_across_two_lots(spark, tmp_path):
    # part 1 ledger:
    #   lot A: qty 10 @ total 100.00 (unit 10.00) shipped 01-01
    #   lot B: qty  5 @ total 100.00 (unit 20.00) shipped 01-02
    #   issue X: qty 12 returned 01-03
    # FIFO: X takes all 10 of A (cost 100.00) + 2 of B (cost 40.00)
    #   -> matched 12, unfilled 0, fifo_cost 140.00, 2 lot matches
    # part 2: issue with NO lots -> matched 0, unfilled 7, cost 0
    li = _li(
        spark,
        [
            (1, 10, 100.00, "N", "2024-01-01", 1, 1),
            (1, 5, 100.00, "N", "2024-01-02", 2, 1),
            (1, 12, 999.99, "R", "2024-01-03", 3, 1),
            (2, 7, 70.00, "R", "2024-01-01", 4, 1),
        ],
    )
    sf_dir = str(tmp_path)
    li.write.parquet(f"{sf_dir}/lineitem.parquet")
    out = all_queries()["fifo_lot_allocation"](spark, sf_dir)
    got = {r["l_partkey"]: r.asDict() for r in out.collect()}
    assert got[1]["n_lot_matches"] == 2
    assert got[1]["matched_qty"] == 12
    assert got[1]["unfilled_qty"] == 0
    assert got[1]["fifo_cost"] == 140.00
    assert got[2] == {
        "l_partkey": 2,
        "issued_qty": 7,
        "n_lot_matches": 0,
        "matched_qty": 0,
        "unfilled_qty": 7,
        "fifo_cost": 0.0,
    }


def test_fifo_allocation_excess_supply_leaves_later_lots_unmatched(
    spark, tmp_path
):
    # lots 6+6, single issue of 5: only the FIRST lot is touched
    li = _li(
        spark,
        [
            (1, 6, 60.00, "N", "2024-01-01", 1, 1),
            (1, 6, 120.00, "N", "2024-01-02", 2, 1),
            (1, 5, 999.99, "R", "2024-01-03", 3, 1),
        ],
    )
    sf_dir = str(tmp_path)
    li.write.parquet(f"{sf_dir}/lineitem.parquet")
    out = all_queries()["fifo_lot_allocation"](spark, sf_dir)
    row = out.collect()[0].asDict()
    assert row["n_lot_matches"] == 1
    assert row["matched_qty"] == 5
    assert row["fifo_cost"] == 50.00  # 5 units at 10.00 from lot 1
