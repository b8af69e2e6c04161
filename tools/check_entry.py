"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin side-by-side
(DuckDB over the same parquet dir), comparing row count + sorted-column
value hash (order-insensitive, like the driver). Usage:

    python tools/check_entry.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    return str(v)


def result_hash(cols: list[str], rows: list[tuple]) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from fluxdb_spark import get_spark

    spark = get_spark(app_name="check_entry", shuffle_partitions=8)
    con = duckdb.connect(":memory:")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failures.append(name)
            continue
        n_s, h_s = result_hash(cols, rows)
        if name not in oracles:
            print(f"ok*   {name}: rows-only, {n_s} rows ({time.time()-t0:.1f}s)")
            if n_s == 0:
                print(f"      WARNING: {name} returned 0 rows")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures.append(name)
            continue
        n_d, h_d = result_hash(d_cols, d_rows)
        if sorted(cols) != sorted(d_cols):
            print(f"FAIL  {name}: schema {sorted(cols)} != {sorted(d_cols)}")
            failures.append(name)
        elif (n_s, h_s) != (n_d, h_d):
            print(
                f"FAIL  {name}: spark {n_s} rows/{h_s} != duckdb {n_d} rows/{h_d}"
            )
            srt = lambda rs, cs: sorted(  # noqa: E731
                tuple(norm_cell(r[i]) for i in sorted(range(len(cs)), key=lambda j: cs[j]))
                for r in rs
            )
            a, b = srt(rows, cols), srt(d_rows, d_cols)
            diff_a = [x for x in a if x not in set(b)][:3]
            diff_b = [x for x in b if x not in set(a)][:3]
            print(f"      spark-only: {diff_a}")
            print(f"      duck-only:  {diff_b}")
            failures.append(name)
        else:
            print(f"ok    {name}: {n_s} rows match ({time.time()-t0:.1f}s)")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print("all queries match the oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
