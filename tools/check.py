#!/usr/bin/env python3
"""Local dev-only correctness pre-check mirroring the driver's gate:
runs graft.Verify output parquet vs DuckDB executing oracle_sql.json
on the same testdata tables. Not part of the shipped library.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Also records per-query DuckDB oracle wall times to
<verifyOutDir>/oracle_times.json so the bench-vs-baseline ratio is
computable from artifacts alone (no judge-side re-timing).

Each oracle query runs under a wall-clock cap (GRAFT_ORACLE_CAP
seconds, default 60 — the quadratic graph oracles run 20+ min at
sf0.1) enforced via duckdb's interrupt() from a watchdog thread.
Capped queries are reported as "CAP" (not failures — the Spark result
exists; the oracle just couldn't produce a comparison in budget) and
recorded in oracle_times.json as ">CAP" so a bench-vs-baseline ratio
can floor them at the cap.
"""
import os, sys, json, glob, math, time, threading
import duckdb

CAP = float(os.environ.get("GRAFT_ORACLE_CAP", "60"))

def run_capped(con, sql):
    """Run sql; return (df, seconds) or (None, None) if the cap hit.

    The watchdog can fire in the window AFTER fetchdf() returns but
    before cancel() — the interrupt then has no running query to land
    on and would abort the NEXT statement on this connection instead.
    When the timer fired but the query still completed, a sacrificial
    SELECT drains any pending interrupt before the caller reuses the
    connection."""
    fired = threading.Event()

    def _interrupt():
        fired.set()
        con.interrupt()

    timer = threading.Timer(CAP, _interrupt)
    timer.start()
    t0 = time.monotonic()
    try:
        df = con.execute(sql).fetchdf()
        return df, round(time.monotonic() - t0, 3)
    except duckdb.InterruptException:
        return None, None
    finally:
        timer.cancel()
        if fired.is_set():
            try:
                con.execute("select 1").fetchall()
            except duckdb.InterruptException:
                pass

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = p.split("/")[-1].replace(".parquet", "")
        con.execute(f"create view {name} as select * from read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    capped = []
    oracle_times = {}
    for name, sql in sorted(oracle.items()):
        res_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not res_glob:
            print(f"FAIL {name}: no spark result written")
            failed.append(name)
            continue
        try:
            want, secs = run_capped(con, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            failed.append(name)
            continue
        if want is None:
            print(f"CAP  {name}: oracle exceeded {CAP:.0f}s cap "
                  "(spark result exists; comparison skipped)")
            capped.append(name)
            oracle_times[name] = f">{CAP:.0f}"
            continue
        oracle_times[name] = secs
        got = con.execute(
            f"select * from read_parquet({res_glob!r})").fetchdf()
        # driver semantics: sort columns by name, then compare values
        want = want.reindex(sorted(want.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: cols want={list(want.columns)} got={list(got.columns)}")
            failed.append(name)
            continue
        # sort rows for order-insensitive compare
        wrows = sorted(tuple(norm(v) for v in r) for r in want.itertuples(index=False))
        grows = sorted(tuple(norm(v) for v in r) for r in got.itertuples(index=False))
        if len(wrows) != len(grows):
            print(f"FAIL {name}: rows want={len(wrows)} got={len(grows)}")
            failed.append(name)
        elif wrows != grows:
            bad = next(i for i, (a, b) in enumerate(zip(wrows, grows)) if a != b)
            print(f"FAIL {name}: first diff at sorted-row {bad}:")
            print(f"  want {wrows[bad]}")
            print(f"  got  {grows[bad]}")
            failed.append(name)
        else:
            print(f"OK   {name} ({len(wrows)} rows)")
    # README count drift guard: only on a FULL dump — detected by the
    # registry_size.txt marker Verify writes (the oracle set size
    # equals the registry size only when no SPARK_GRAFT_ONLY subset
    # narrowed the dump; checking our own env would be wrong, since
    # the subset is applied to the sbt command, not to this process).
    import os, re
    readme = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "README.md")
    size_file = f"{out_dir}/registry_size.txt"
    full_run = (os.path.exists(size_file) and
                int(open(size_file).read().strip()) == len(oracle))
    if full_run and os.path.exists(readme):
        text = open(readme).read()
        n = len(oracle)
        drift = sorted({int(v)
                        for m in re.findall(r"(\d+) queries|expect (\d+)/", text)
                        for v in m if v and int(v) != n})
        if drift:
            print(f"FAIL README: query-count drift — registry has {n}, "
                  f"README says {drift}")
            failed.append("README.count")
    timed = [v for v in oracle_times.values() if not isinstance(v, str)]
    with open(f"{out_dir}/oracle_times.json", "w") as f:
        json.dump({"sf_dir": sf_dir, "unit": "sec", "cap_sec": CAP,
                   "total_timed": round(sum(timed), 3),
                   "total_floor": round(sum(timed) + CAP * len(capped), 3),
                   "capped": sorted(capped),
                   "queries": oracle_times}, f, indent=1, sort_keys=True)
    print(f"[check] oracle wall times -> {out_dir}/oracle_times.json "
          f"(timed {sum(timed):.1f}s + {len(capped)} capped at {CAP:.0f}s "
          f"-> floor {sum(timed) + CAP * len(capped):.1f}s)")
    print(f"\n{len(oracle) - len(failed) - len(capped)}/{len(oracle)} match"
          + (f" ({len(capped)} oracle-capped, not counted as failures)"
             if capped else ""))
    return 1 if failed else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
