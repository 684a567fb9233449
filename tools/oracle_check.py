"""Driver-style oracle comparison for selected contract queries.

Runs __spark_entry__.queries()[name] on Spark and oracle_sql()[name] on
DuckDB over the same sf dir, compares row count, sorted-column schema and
a value hash (rows sorted, columns sorted by name, values stringified) —
the same shape the per-round CORRECTNESS harness records.

Usage: python tools/oracle_check.py [names ...]   (default: all oracled)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return str(v)


def table_hash(cols, rows):
    import hashlib

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main(names):
    import __spark_entry__ as E
    from hsip.session import get_spark

    qs, oracles = E.queries(), E.oracle_sql()
    names = names or [n for n in qs if n in oracles]
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")

    con = duckdb.connect()
    from hsip.catalog import FIXTURE_TABLES

    for t in FIXTURE_TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    failed = []
    for name in names:
        if name not in oracles:
            print(f"{name}: NO ORACLE (rows-only)")
            continue
        sdf = qs[name](spark, SF_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        ok_rows = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        sh, oh = table_hash(scols, srows), table_hash(ocols, orows)
        ok_hash = sh == oh
        status = "PASS" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        print(
            f"{name}: {status} rows {len(srows)}/{len(orows)} "
            f"schema {ok_schema} hash {sh}/{oh}"
        )
        if status == "FAIL":
            failed.append(name)
    if failed:
        print("FAILED:", failed)
        sys.exit(1)


if __name__ == "__main__":
    main(sys.argv[1:])
