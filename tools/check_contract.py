#!/usr/bin/env python
"""Driver-contract simulator: run every catalog query on Spark AND its
DuckDB oracle side by side, compare rows / schema / values, and report —
the local stand-in for the driver's CORRECTNESS gate, plus a dtype-strict
mode that is STRICTER than the driver (the driver tolerates int32-vs-int64
and ns-vs-us, but not value-changing mismatches like int-vs-float; strict
mode flags all of them so genuinely dangerous ones can't hide).

Usage: python tools/check_contract.py [--sf /root/testdata/sf0.01]
                                      [--strict] [--driver-parity]
                                      [--only name ...]

--driver-parity reproduces the EXTERNAL driver's environment instead of
the engine's tuned one: Arrow-for-createDataFrame/toPandas DISABLED
(Spark's default — the engine session enables it, which hid the round-3
kmeans_centroids numpy-typing crash), and rows-only entries materialized
through toPandas() rather than graded with a bare .count().  Run it
before every round hand-off; the local gate must be a superset of the
driver's.
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--strict", action="store_true",
                    help="also fail on dtype-level differences")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--driver-parity", action="store_true",
                    help="Arrow-off session + materialize rows-only "
                         "entries, mirroring the external driver")
    args = ap.parse_args()

    from pdf_extractor_spark.queries import QUERY_REGISTRY
    from pdf_extractor_spark.session import build_session

    extra = (
        {"spark.sql.execution.arrow.pyspark.enabled": "false"}
        if args.driver_parity
        else None
    )
    spark = build_session("check-contract", cores=args.cores, extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    names = args.only or list(QUERY_REGISTRY)
    failures = []
    for n in names:
        fn, sql = QUERY_REGISTRY[n]
        try:
            if sql is None:
                # rows-only entry (iterative / non-SQL-expressible): the
                # driver records a weaker rows>=0 check — mirror that.
                # Under --driver-parity, MATERIALIZE the rows (toPandas)
                # the way the driver does: a bare .count() never runs the
                # local-data createDataFrame/collect path and let the
                # round-3 kmeans numpy-typing crash hide.
                out = fn(spark, args.sf)
                n_rows = len(out.toPandas()) if args.driver_parity else out.count()
                print(f"OK  {n}: rows={n_rows} [rows-only, no oracle]")
                continue
            sp = fn(spark, args.sf).toPandas()
            du = con.sql(sql).df()
            cols = sorted(sp.columns)
            if cols != sorted(du.columns):
                raise AssertionError(f"columns {cols} != {sorted(du.columns)}")
            sp = sp[cols].sort_values(cols).reset_index(drop=True)
            du = du[cols].sort_values(cols).reset_index(drop=True)
            dt_ok = list(sp.dtypes.astype(str)) == list(du.dtypes.astype(str))
            val_ok = bool(sp.shape == du.shape)
            if val_ok:
                try:
                    val_ok = bool(sp.equals(du))
                except Exception:
                    val_ok = False
                if not val_ok and not dt_ok:
                    # value check after harmonizing dtypes (driver-like)
                    try:
                        val_ok = bool(
                            sp.astype(du.dtypes.to_dict(), errors="ignore").equals(du)
                            or du.astype(sp.dtypes.to_dict(), errors="ignore").equals(sp)
                        )
                    except Exception:
                        pass
            ok = val_ok and (dt_ok or not args.strict)
            mark = "OK " if ok else "FAIL"
            extra = "" if dt_ok else " [dtype-diff]"
            print(f"{mark} {n}: rows={len(sp)}{extra}")
            if not ok:
                failures.append(n)
                if not dt_ok:
                    print(f"     spark: {dict(sp.dtypes.astype(str))}")
                    print(f"     duck : {dict(du.dtypes.astype(str))}")
        except Exception as e:  # noqa: BLE001 — report, keep checking
            failures.append(n)
            print(f"ERR  {n}: {type(e).__name__}: {e}")

    print(f"\n{len(names) - len(failures)}/{len(names)} green"
          + (f"; failing: {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
