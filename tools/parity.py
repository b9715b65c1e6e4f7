#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify, then
execute each oracle SQL in DuckDB over the same parquet tables and compare.

Usage: python3 tools/parity.py [sfdir] [outdir] [--skip-verify]
                               [--subset=name1,name2,...]

--subset restricts BOTH the Verify dump (via SPARK_GRAFT_ONLY) and the
DuckDB compare to the named queries — the fast loop for re-verifying one
family after a refactor (full 133 still gates at the end of a round).
Unknown names abort (the graft.Bench fail-fast discipline: a typo must
not silently verify nothing).
"""
import json
import math
import os
import subprocess
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    subset = None
    argv = list(sys.argv[1:])
    for a in list(argv):
        if a.startswith("--subset="):
            subset = [s for s in a.split("=", 1)[1].split(",") if s]
            argv.remove(a)
    pos = [a for a in argv if not a.startswith("--")]
    sfdir = pos[0] if len(pos) > 0 else "/root/testdata/sf0.01"
    outdir = pos[1] if len(pos) > 1 else "/tmp/verify_out"
    if subset:
        # Fail fast BEFORE the multi-minute sbt Verify run: tools/registry.txt
        # is the checked-in query-name registry, pinned to SparkEntry.queries
        # by RegistrySpec (so it cannot drift silently); graft.Verify itself
        # also aborts on unknown SPARK_GRAFT_ONLY names as a second belt.
        reg_file = Path(__file__).parent / "registry.txt"
        if reg_file.exists():
            registry = set(reg_file.read_text().split())
            unknown = sorted(set(subset) - registry)
            if unknown:
                print(f"[parity] unknown subset queries {unknown} — aborting"
                      " (see tools/registry.txt)", file=sys.stderr)
                sys.exit(2)
        else:
            # Degrade loudly: without the registry the typo check falls back
            # to the slow Verify-side abort — say so instead of silence.
            print(f"[parity] WARNING: {reg_file} missing — subset fast-fail "
                  "skipped; unknown names will only abort inside Verify",
                  file=sys.stderr)
    if "--skip-verify" not in argv:
        env = dict(os.environ)
        if subset:
            env["SPARK_GRAFT_ONLY"] = ",".join(subset)
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sfdir} {outdir}'],
            cwd="/root/repo", capture_output=True, text=True, env=env)
        if r.returncode != 0:
            print(r.stdout[-4000:])
            print(r.stderr[-4000:])
            sys.exit(1)
        tail = "\n".join(l for l in r.stdout.splitlines() if "[verify]" in l)
        if tail:
            print("verify stderr flags:\n" + tail)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

    oracle = json.loads(Path(f"{outdir}/oracle_sql.json").read_text())
    if subset:
        unknown = sorted(set(subset) - set(oracle))
        if unknown:
            print(f"[parity] unknown subset queries {unknown} — aborting",
                  file=sys.stderr)
            sys.exit(2)
    results = {}
    for name, sql in sorted(oracle.items()):
        if subset and name not in subset:
            continue
        spark_dir = Path(outdir) / name
        if not spark_dir.exists():
            results[name] = "SPARK-MISSING"
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{spark_dir}/*.parquet'").df()
            want = con.execute(sql).df()
        except Exception as e:
            results[name] = f"ERROR: {e}"
            continue
        results[name] = compare(got, want)

    # With a subset, out-of-subset dirs in a reused outdir are expected —
    # the stale-dir warning only makes sense for a full run.
    no_oracle = [] if subset else [
        p.name for p in Path(outdir).iterdir()
        if p.is_dir() and p.name not in oracle]
    fails = 0
    for name, res in sorted(results.items()):
        ok = res == "OK"
        fails += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL':4} {name}: {res}")
    if no_oracle:
        print(f"rows-only (no oracle): {sorted(no_oracle)}")
    print(f"\n{len(results) - fails}/{len(results)} oracle queries match")
    sys.exit(1 if fails else 0)


def compare(got, want):
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        return f"SCHEMA got={gc} want={wc}"
    if len(got) != len(want):
        return f"ROWS got={len(got)} want={len(want)}"
    g = got[gc].sort_values(by=gc, kind="mergesort").reset_index(drop=True)
    w = want[wc].sort_values(by=wc, kind="mergesort").reset_index(drop=True)
    bad = []
    for c in gc:
        a, b = g[c], w[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            eq = (a == b) | (a.isna() & b.isna())
        else:
            eq = (a.astype(object) == b.astype(object)) | (a.isna() & b.isna())
        if not eq.all():
            i = int((~eq).idxmax())
            bad.append(f"{c}[{i}]: {a[i]!r} != {b[i]!r} ({int((~eq).sum())} diffs)")
    return "OK" if not bad else "VALUES " + "; ".join(bad[:4])


if __name__ == "__main__":
    main()
