#!/usr/bin/env python3
"""Single-query dev loop: run graft.One for ONE registry query, then
hash-compare against its DuckDB oracle — same compare as parity.py.

Usage: python3 tools/one.py <query_name> [sfdir] [outdir] [--skip-run]
"""
import subprocess
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).parent))
from parity import TABLES, compare  # noqa: E402


def main():
    name = sys.argv[1]
    sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    outdir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/one_out"
    if "--skip-run" not in sys.argv:
        r = subprocess.run(
            ["sbt", "-batch", f"runMain graft.One {name} {sfdir} {outdir}"],
            cwd="/root/repo", capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stdout[-6000:])
            print(r.stderr[-3000:])
            sys.exit(1)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    sql_file = Path(outdir) / f"{name}.sql"
    if not sql_file.exists():
        n = con.execute(f"SELECT count(*) FROM '{outdir}/{name}/*.parquet'"
                        ).fetchone()[0]
        print(f"{name}: no oracle; spark rows = {n}")
        return
    got = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
    want = con.execute(sql_file.read_text()).df()
    res = compare(got, want)
    print(f"{'PASS' if res == 'OK' else 'FAIL'} {name}: {res}")
    sys.exit(0 if res == "OK" else 1)


if __name__ == "__main__":
    main()
