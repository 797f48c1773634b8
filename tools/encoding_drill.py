"""Encoding-drift drill: prove the whole contract survives the
driver's events.ts re-materializations BEFORE a round flips one.

The driver has shipped events.ts as parquet TIMESTAMP, TIMESTAMP_NTZ,
and nanos-INT64 in different rounds. This tool stages a copy of a
testdata dir with events.ts rewritten to a chosen encoding (and, on
request, the COLUMNS REORDERED — the staging trick that exposed the
positional flush-row bug in streaming.run_session_stream), then runs
tools/selfcheck.py against the staged dir.

Usage:
  python tools/encoding_drill.py [sf_dir] [--enc nanos|ntz|ts]
                                 [--reorder] [query ...]
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def stage(sf_dir: str, enc: str, reorder: bool) -> str:
    import duckdb

    dst = tempfile.mkdtemp(prefix=f"gp_drill_{enc}_")
    for f in os.listdir(sf_dir):
        if f != "events.parquet":
            shutil.copy(os.path.join(sf_dir, f), os.path.join(dst, f))
    con = duckdb.connect()
    cols = [
        r[0]
        for r in con.sql(
            f"DESCRIBE SELECT * FROM '{sf_dir}/events.parquet'"
        ).fetchall()
    ]
    ts_expr = {
        "nanos": "CAST(epoch_ns(ts) AS BIGINT) AS ts",
        "ntz": "CAST(ts AS TIMESTAMP) AS ts",
        "ts": "ts",
    }[enc]
    others = [c for c in cols if c != "ts"]
    # --reorder puts ts FIRST (any order different from the source
    # exercises name-keyed row construction downstream)
    select = (
        [ts_expr] + others if reorder
        else [ts_expr if c == "ts" else c for c in cols]
    )
    con.sql(
        f"COPY (SELECT {', '.join(select)} FROM "
        f"'{sf_dir}/events.parquet') TO '{dst}/events.parquet' "
        "(FORMAT PARQUET)"
    )
    return dst


def main() -> int:
    args = [a for a in sys.argv[1:]]
    enc = "nanos"
    reorder = False
    if "--enc" in args:
        i = args.index("--enc")
        enc = args[i + 1]
        del args[i:i + 2]
    if "--reorder" in args:
        reorder = True
        args.remove("--reorder")
    sf_dir = args[0] if args and os.path.isdir(args[0]) else (
        "/root/testdata/sf0.001"
    )
    queries = args[1:] if args and os.path.isdir(args[0]) else args
    dst = stage(sf_dir, enc, reorder)
    print(f"staged {enc}{' reordered' if reorder else ''} -> {dst}")
    cmd = [sys.executable, "tools/selfcheck.py", dst, *queries]
    return subprocess.run(cmd, cwd=_HERE).returncode


if __name__ == "__main__":
    sys.exit(main())
