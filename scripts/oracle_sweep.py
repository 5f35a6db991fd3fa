"""Full-catalog Spark-vs-DuckDB parity sweep at an arbitrary scale factor
(VERDICT r3 #1: the sf1 evidence run).

The pytest parity suite (tests/test_oracle_parity.py) compares via Python
tuples — exact and fine at sf0.01, but collect()-bound at sf1 where some
queries return millions of rows.  This sweep keeps the comparison ENGINE-
side: the Spark result is written to parquet, DuckDB reads it next to the
oracle result, both are normalized in SQL (the same rules as
tests/oracle_harness.py: 12-significant-digit floats, -0.0→0.0, NaN/NULL
unified to a sentinel, timestamps→epoch µs) and diffed with two
EXCEPT ALLs.  6M-row results compare in seconds with zero Python loops.

Usage:
    python scripts/oracle_sweep.py --sf-dir /root/repo/testdata_sf1 \
        --md CORRECTNESS_SF1.md --json CORRECTNESS_SF1.json
    python scripts/oracle_sweep.py --sf-dir /root/testdata/sf0.01 \
        --names q1_pricing_summary,dedup_exact      # harness self-check
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flinkapps_spark.plans import catalog
from flinkapps_spark.schemas import TESTDATA_TABLES
from flinkapps_spark.session import get_spark


def norm_expr(col: str, dtype: str) -> str:
    """Normalization projection for one column, mirroring
    tests/oracle_harness._norm_cell in SQL (engine-side, vectorized)."""
    t = dtype.upper()
    q = f'"{col}"'
    if "HUGEINT" in t:
        raise AssertionError(
            f"column {col} is {t} — CAST the oracle sum to BIGINT "
            f"(same guard as tests/oracle_harness.assert_fetch_dtypes)")
    if t in ("DOUBLE", "FLOAT", "REAL") or t.startswith("DECIMAL"):
        # DECIMAL: oracle VALUES literals — harness folds Decimal→float
        d = f"CAST({q} AS DOUBLE)"
        return (f"CASE WHEN {q} IS NULL OR isnan({d}) THEN '∅' "
                f"ELSE printf('%.12g', CASE WHEN {d} = 0 THEN 0.0 "
                f"ELSE {d} END) END AS {q}")
    if "TIMESTAMP" in t:
        return f"CAST(epoch_us({q}) AS VARCHAR) AS {q}"
    if t == "DATE":
        return f"CAST({q} AS VARCHAR) AS {q}"
    if t.startswith(("DOUBLE[", "FLOAT[", "REAL[")) or (
            "[]" in t and any(f in t for f in ("DOUBLE", "FLOAT", "REAL"))):
        return (f"CAST(list_transform({q}, x -> CASE WHEN x IS NULL OR "
                f"isnan(x) THEN '∅' ELSE printf('%.12g', CASE WHEN x = 0 "
                f"THEN 0.0 ELSE CAST(x AS DOUBLE) END) END) AS VARCHAR) "
                f"AS {q}")
    if t == "BLOB":
        return f"hex({q}) AS {q}"
    return f"CAST({q} AS VARCHAR) AS {q}"


def compare_engine_side(con: duckdb.DuckDBPyConnection, spark_parquet: str,
                        oracle_sql: str) -> dict:
    # the oracle runs ONCE into a temp table (a VIEW would re-execute the
    # oracle SQL for the count and again per EXCEPT — 3x a csv-parse-heavy
    # oracle at sf1); normalized projections are materialized too so each
    # EXCEPT is a plain scan.
    con.execute("CREATE OR REPLACE TEMP TABLE __s_raw AS "
                f"SELECT * FROM read_parquet('{spark_parquet}/*.parquet')")
    con.execute(f"CREATE OR REPLACE TEMP TABLE __o_raw AS {oracle_sql}")
    s_desc = con.execute("DESCRIBE SELECT * FROM __s_raw").fetchall()
    o_desc = con.execute("DESCRIBE SELECT * FROM __o_raw").fetchall()
    s_types = {r[0]: r[1] for r in s_desc}
    o_types = {r[0]: r[1] for r in o_desc}
    out = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None}
    out["spark_rows"] = con.execute(
        "SELECT count(*) FROM __s_raw").fetchone()[0]
    out["oracle_rows"] = con.execute(
        "SELECT count(*) FROM __o_raw").fetchone()[0]
    out["rows_match"] = out["spark_rows"] == out["oracle_rows"]
    out["schema_match"] = sorted(s_types) == sorted(o_types)
    if not out["schema_match"]:
        out["err"] = (f"columns spark={sorted(s_types)} "
                      f"oracle={sorted(o_types)}")
        return out
    cols = sorted(s_types)
    s_sel = ", ".join(norm_expr(c, s_types[c]) for c in cols)
    o_sel = ", ".join(norm_expr(c, o_types[c]) for c in cols)
    con.execute(f"CREATE OR REPLACE TEMP TABLE __sn AS "
                f"SELECT {s_sel} FROM __s_raw")
    con.execute(f"CREATE OR REPLACE TEMP TABLE __on AS "
                f"SELECT {o_sel} FROM __o_raw")
    n_diff = con.execute("""
        SELECT (SELECT count(*) FROM (SELECT * FROM __sn EXCEPT ALL
                                      SELECT * FROM __on))
             + (SELECT count(*) FROM (SELECT * FROM __on EXCEPT ALL
                                      SELECT * FROM __sn))
    """).fetchone()[0]
    for t in ("__s_raw", "__o_raw", "__sn", "__on"):
        con.execute(f"DROP TABLE IF EXISTS {t}")
    out["hash_match"] = out["rows_match"] and n_diff == 0
    if n_diff:
        out["err"] = f"{n_diff} rows differ after normalization"
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", required=True)
    p.add_argument("--md", default=None, help="markdown report path")
    p.add_argument("--json", dest="json_out", default=None)
    p.add_argument("--names", default=None,
                   help="comma-separated subset (default: full catalog)")
    p.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    p.add_argument("--resume", action="store_true",
                   help="skip queries already recorded pass/rows-only in "
                        "--json (which is now written incrementally, so a "
                        "killed sweep resumes where it stopped)")
    p.add_argument("--oracle-timeout", type=float, default=None,
                   help="seconds before a DuckDB oracle is interrupted; "
                        "the query is then recorded as status "
                        "'oracle-timeout' with the Spark rows/seconds "
                        "kept (the sf10 rung: some sf1-heavy oracles — "
                        "pair closures, recursive reachability — are "
                        "DuckDB-bound long before Spark is)")
    p.add_argument("--duck-mem", default="40GB",
                   help="DuckDB memory_limit — heavy oracles (recursive-CTE "
                        "reachability at sf1) spill to disk instead of "
                        "OOM-killing the whole sweep")
    ns = p.parse_args()

    reg = catalog.registry()
    names = (ns.names.split(",") if ns.names else sorted(reg))
    done: dict[str, dict] = {}
    if ns.resume and ns.json_out and os.path.exists(ns.json_out):
        with open(ns.json_out) as f:
            prior = json.load(f).get("results", {})
        done = {n: r for n, r in prior.items()
                if r.get("status") in ("pass", "rows-only")}
        names = [n for n in names if n not in done]
        print(f"resume: {len(done)} prior results kept, "
              f"{len(names)} to run")
    spark = get_spark("oracle-sweep", master=f"local[{ns.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.parquet.outputTimestampType",
                   "TIMESTAMP_MICROS")

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(f"SET memory_limit='{ns.duck_mem}'")
    con.execute("SET temp_directory='/tmp/duck_sweep_spill'")
    for t in TESTDATA_TABLES:
        path = os.path.join(ns.sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            if os.path.isdir(path):  # multi-file fixture (gen_sf.py)
                path = os.path.join(path, "*.parquet")
            con.execute(f"CREATE VIEW {t} AS "
                        f"SELECT * FROM read_parquet('{path}')")

    tmp = tempfile.mkdtemp(prefix="oracle_sweep_")
    results: dict[str, dict] = dict(done)
    n_pass = sum(r.get("status") == "pass" for r in done.values())
    n_rows_only = sum(r.get("status") == "rows-only" for r in done.values())
    n_fail = 0

    def _flush() -> None:
        # temp + atomic rename: a kill mid-write must never corrupt the
        # incremental file --resume depends on (truncate-then-write also
        # made concurrent readers see an empty file)
        if ns.json_out:
            tmp_json = ns.json_out + ".tmp"
            with open(tmp_json, "w") as f:
                json.dump({"summary": {
                    "sf_dir": ns.sf_dir, "n_queries": len(results),
                    "pass": n_pass, "fail": n_fail,
                    "rows_only": n_rows_only},
                    "results": results}, f, indent=1)
            os.replace(tmp_json, ns.json_out)

    for i, name in enumerate(names):
        q = reg[name]
        r: dict = {"oracled": q.oracle is not None}
        t0 = time.perf_counter()
        try:
            df = q.build(spark, ns.sf_dir)
            if q.oracle is None:
                r["spark_rows"] = df.count()
                r["spark_sec"] = round(time.perf_counter() - t0, 2)
                r["status"] = "rows-only"
                n_rows_only += 1
            else:
                dest = os.path.join(tmp, name)
                df.write.mode("overwrite").parquet(dest)
                r["spark_sec"] = round(time.perf_counter() - t0, 2)
                # drain any interrupt left pending by a PREVIOUS query's
                # watchdog firing in its cancel window — otherwise it
                # surfaces on this query's first call and a healthy query
                # is recorded as ERROR (ADVICE r7)
                try:
                    con.execute("SELECT 1")
                except duckdb.InterruptException:
                    pass
                t1 = time.perf_counter()
                watchdog = None
                timed_out = False
                fired = None
                if ns.oracle_timeout:
                    import threading
                    fired = threading.Event()
                    watchdog = threading.Timer(
                        ns.oracle_timeout,
                        lambda: (fired.set(), con.interrupt()))
                    watchdog.start()
                try:
                    r.update(compare_engine_side(con, dest, q.oracle))
                except duckdb.InterruptException:
                    # trust the interrupt only if OUR timer actually
                    # fired (explicit flag — no elapsed-time guessing)
                    if fired is None or not fired.is_set():
                        raise
                    timed_out = True
                finally:
                    if watchdog is not None:
                        watchdog.cancel()
                r["oracle_sec"] = round(time.perf_counter() - t1, 2)
                if timed_out:
                    r["spark_rows"] = spark.read.parquet(dest).count()
                    r["status"] = "oracle-timeout"
                    r["err"] = (f"oracle interrupted after "
                                f"{ns.oracle_timeout:.0f}s (DuckDB-bound; "
                                f"spark side completed)")
                    n_rows_only += 1
                else:
                    ok = r["rows_match"] and r["schema_match"] and \
                        r["hash_match"]
                    r["status"] = "pass" if ok else "FAIL"
                    n_pass += ok
                    n_fail += not ok
                shutil.rmtree(dest, ignore_errors=True)
        except Exception as e:  # noqa: BLE001 — sweep must finish the list
            r["status"] = "ERROR"
            r["err"] = f"{type(e).__name__}: {e}"[:400]
            r["spark_sec"] = round(time.perf_counter() - t0, 2)
            n_fail += 1
        results[name] = r
        # queries are self-contained; drop any persist a query left behind
        # so later queries don't evict/recompute under storage pressure
        # (222 s dedup_keep_set at sf1 was cache thrash, not plan cost)
        try:
            spark.catalog.clearCache()
        except Exception:  # noqa: BLE001 — cleanup must not kill the sweep
            pass
        _flush()
        flag = ("" if r["status"] in ("pass", "rows-only",
                                      "oracle-timeout") else "   <<<<")
        print(f"[{i + 1}/{len(names)}] {name}: {r['status']} "
              f"({r.get('spark_sec')}s spark"
              f"{', ' + str(r.get('oracle_sec')) + 's oracle' if 'oracle_sec' in r else ''})"
              f"{flag}", flush=True)

    shutil.rmtree(tmp, ignore_errors=True)
    summary = {"sf_dir": ns.sf_dir, "n_queries": len(results),
               "pass": n_pass, "fail": n_fail, "rows_only": n_rows_only}
    print(json.dumps(summary))
    _flush()
    if ns.md:
        results = dict(sorted(results.items()))
        lines = [
            f"# Oracle-parity sweep — `{ns.sf_dir}`", "",
            f"{n_pass} pass / {n_fail} fail / {n_rows_only} rows-only "
            f"of {len(results)} queries.  Comparison is engine-side "
            "(Spark result parquet vs DuckDB oracle, normalized EXCEPT "
            "ALL both directions — see scripts/oracle_sweep.py).", "",
            "| query | status | spark rows | spark s | oracle s | err |",
            "|---|---|---|---|---|---|",
        ]
        for name, r in results.items():
            lines.append(
                f"| {name} | {r['status']} | {r.get('spark_rows', '')} | "
                f"{r.get('spark_sec', '')} | {r.get('oracle_sec', '')} | "
                f"{(r.get('err') or '')[:80]} |")
        with open(ns.md, "w") as f:
            f.write("\n".join(lines) + "\n")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
