"""Query battery: run every ``queries()`` entry against its ``oracle_sql()``
DuckDB equivalent on the same parquet tables, driver-style.

Mirrors the correctness driver's compare: row count, schema (column-name
set), and a value hash computed over columns sorted by name with rows sorted
by all columns.  Queries with no oracle get a rows-only check (ran, >=0 rows).

Usage:
    python scripts/battery.py [--sf /root/testdata/sf0.01] [--only q1,q2]
                              [--first N]
"""

from __future__ import annotations

import argparse
import hashlib
import importlib.util
import json
import os
import sys
import time
import traceback

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _to_pandas(res):
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    # ray Dataset
    return res.to_pandas(limit=None)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            df[c] = col.map(
                lambda v: v.tolist() if hasattr(v, "tolist") else v
            ).astype(str)
        elif str(col.dtype).startswith("float"):
            df[c] = col.round(6)
        elif str(col.dtype).startswith("datetime"):
            df[c] = col.astype("datetime64[ns]").astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _hash(df: pd.DataFrame) -> str:
    c = _canon(df)
    return hashlib.sha256(
        c.to_csv(index=False, float_format="%.6f").encode()
    ).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--first", type=int, default=0)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__ray_entry__.py"),
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            logging_level="ERROR",
        )

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    q = entry.queries()
    o = entry.oracle_sql()
    names = list(q)
    if args.first:
        names = names[: args.first]
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]

    results = {}
    fails = []
    for name in names:
        t0 = time.time()
        row = {"rows_match": None, "schema_match": None, "hash_match": None,
               "rows": None, "oracle_rows": None, "err": None}
        try:
            got = _to_pandas(q[name](args.sf))
            row["rows"] = len(got)
            if name in o:
                want = con.execute(o[name]).df()
                row["oracle_rows"] = len(want)
                row["rows_match"] = len(got) == len(want)
                row["schema_match"] = sorted(got.columns) == sorted(want.columns)
                row["hash_match"] = (
                    row["rows_match"] and row["schema_match"]
                    and _hash(got) == _hash(want)
                )
                ok = bool(row["hash_match"])
            else:
                ok = row["rows"] is not None and row["rows"] >= 0
        except Exception:
            row["err"] = traceback.format_exc(limit=4)
            ok = False
        row["sec"] = round(time.time() - t0, 2)
        results[name] = row
        status = "PASS" if ok else ("rows-only" if name not in o and not row["err"] else "FAIL")
        if status == "FAIL":
            fails.append(name)
        print(f"{status:9s} {name:38s} {row['sec']:7.2f}s rows={row['rows']}")
        if row["err"]:
            print(row["err"])

    print(f"\n{len(names)} queries, {len(fails)} failures: {fails}")
    with open("/tmp/battery_results.json", "w") as f:
        json.dump(results, f, indent=1, default=str)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
