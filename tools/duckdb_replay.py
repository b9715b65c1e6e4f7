#!/usr/bin/env python3
"""Reproducible DuckDB side of the PERF.md comparison: replay every oracle
SQL from a `graft.Verify` outdir on one warm connection and print a
Bench-shaped JSON line ({"metric":..,"queries":{..}}).

The oracle SQLs reference (a) the base parquet tables under the sf dir and
(b) Spark-staged intermediates under /tmp/graft_stage/<sf> — so run
`tools/parity.py <sfdir> <outdir>` (or at minimum `graft.Verify`) first at
the SAME sf to materialize both, then:

    python3 tools/duckdb_replay.py <sfdir> <outdir> [threads] [subset]

`subset` may be `fullcomp`: the full-computation cut (t*/q*/dash_*/e1-e4)
mirroring `runMain graft.Bench fullcomp` — excludes staged-intermediate
oracles and streaming queries so the two totals compare like for like.

Methodology matches graft.Bench: one untimed warm pass per query (catalog /
buffer warm-up), then one timed pass. A failing query reports -1.
"""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    subset = sys.argv[4] if len(sys.argv) > 4 else None
    if subset not in (None, "fullcomp"):
        # Fail fast (mirroring graft.Bench): a typo'd subset must not
        # silently become a full-registry total pasted into a fullcomp
        # comparison.
        print(f"[replay] unknown subset '{subset}' — aborting",
              file=sys.stderr)
        sys.exit(2)

    def in_subset(name):
        if subset != "fullcomp":
            return True
        return (name.startswith("t") or name.startswith("q")
                or name.startswith("dash_")
                or name in ("e1_knn_brute", "e2_label_centroids",
                            "e3_vector_norms", "e4_embedding_neardup"))

    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

    oracle = json.loads(Path(f"{outdir}/oracle_sql.json").read_text())
    times = {}
    for name, sql in sorted(oracle.items()):
        if not in_subset(name):
            continue
        try:
            con.execute(sql).fetchall()  # warm pass
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            times[name] = time.perf_counter() - t0
        except Exception as e:
            print(f"[replay] {name} FAILED: {e}", file=sys.stderr)
            times[name] = -1.0
    total = sum(v for v in times.values() if v >= 0)
    qs = ",".join(f'"{k}":{v}' for k, v in times.items())
    print(f'{{"metric":"duckdb_total","value":{total},"unit":"sec",'
          f'"queries":{{{qs}}},"sf":"{sfdir}","threads":{threads}}}')


if __name__ == "__main__":
    main()
