#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: check_correctness.py OUTDIR SFDIR
  OUTDIR = dir written by `graft.Verify` (one parquet dir per query +
           oracle_sql.json)
  SFDIR  = testdata dir the queries ran against

For each query: run the oracle SQL in DuckDB over the same parquet
tables, sort columns by name, sort rows, and compare cell-for-cell.

Each line carries the oracle's wall seconds, and results append
incrementally to OUTDIR/compare_progress.json — a timed-out run still
leaves the completed prefix on record (round 9's gate recorded `{}`
when the un-materialized iterative oracles blew its window).
Full-suite cost at sf0.01 is ~6-7 min on 32 cores with the
AS MATERIALIZED oracle rewrite (SparkEntry.materializeCtes); it was
~23 min before it — if this creeps back up, check the slowest lines.
"""
import json
import sys
import time

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(outdir: str, sfdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    progress = {}

    def record(name, ok, secs):
        progress[name] = {"pass": ok, "oracle_sec": round(secs, 2)}
        json.dump(progress, open(f"{outdir}/compare_progress.json", "w"))

    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            got = canon(pd.read_parquet(f"{outdir}/{name}"))
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: load/run error: {e}")
            n_fail += 1
            record(name, False, time.time() - t0)
            continue
        status = []
        if list(got.columns) != list(exp.columns):
            status.append(f"columns {list(got.columns)} != {list(exp.columns)}")
        elif len(got) != len(exp):
            status.append(f"rows {len(got)} != {len(exp)}")
        else:
            # exact compare; report first few diffs
            try:
                pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                              check_exact=True)
            except AssertionError as e:
                status.append(str(e).split("\n")[0])
                for c in got.columns:
                    neq = (got[c] != exp[c]) & ~(got[c].isna() & exp[c].isna())
                    if neq.any():
                        i = neq.idxmax()
                        status.append(
                            f"  col {c} row {i}: got={got[c][i]!r} exp={exp[c][i]!r}"
                            f" ({int(neq.sum())} diffs)")
        secs = time.time() - t0
        if status:
            print(f"FAIL {name}: " + "; ".join(status))
            n_fail += 1
            record(name, False, secs)
        else:
            print(f"PASS {name} ({len(got)} rows, {secs:.2f}s)")
            n_pass += 1
            record(name, True, secs)
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
