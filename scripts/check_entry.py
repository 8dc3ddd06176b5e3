"""Driver-contract checker: runs entry() + every queries() entry against its
oracle_sql() via DuckDB at sf0.01 and reports row-count / column-name /
order-insensitive value-hash matches — a local stand-in for the driver's
CORRECTNESS_r{N}.json gate."""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
SF_DIR = "/root/testdata/sf0.01"


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main(only: list[str] | None = None):
    from cdrc_semantic_search_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(parallelism=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    print("== entry() smoke ==")
    t0 = time.time()
    edf = entrymod.entry(spark)
    rows = edf.collect()
    print(f"entry rows={len(rows)} cols={edf.columns} {time.time()-t0:.1f}s")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sorted(sdf.columns)
            srows = sdf.collect()
            sh = value_hash([tuple(r) for r in srows], sdf.columns)
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            fails.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(srows)} (rows-only, no oracle) {time.time()-t0:.1f}s")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
            dh = value_hash(drows, dcols)
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            fails.append(name)
            continue
        ok_rows = len(srows) == len(drows)
        ok_cols = scols == sorted(dcols)
        ok_hash = sh == dh
        status = "ok  " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(
            f"{status} {name}: rows {len(srows)}/{len(drows)} cols={'=' if ok_cols else f'{scols} vs {sorted(dcols)}'} "
            f"hash={'=' if ok_hash else f'{sh} vs {dh}'} {time.time()-t0:.1f}s"
        )
        if status == "FAIL":
            fails.append(name)
            if ok_cols and not ok_hash and len(srows) < 50:
                for r in sorted(map(tuple, srows))[:5]:
                    print("   spark:", r)
                for r in sorted(drows)[:5]:
                    print("   duck :", r)
    print(f"\n{len(qs) - len(fails)}/{len(qs)} ok; fails: {fails}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
