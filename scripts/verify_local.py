"""Local emulation of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over the
same sf dir, then compares: row count, column names, exact cell values
(order-insensitive: rows sorted by all columns, columns sorted by name) AND
result types.

The type check exists because value normalization alone hid two real
driver divergences (r1: collect_set ndarray; r4: DuckDB HUGEINT from un-cast
integer SUMs hashing differently from Spark BIGINT). The driver hashes typed
representations, so this script must fail whenever the DuckDB output type is
not the exact counterpart of the Spark column type — even if the normalized
values are equal.

Run:  python scripts/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry_mod  # noqa: E402
from chess_lakehouse_spark.catalog import TESTDATA_TABLES  # noqa: E402
from chess_lakehouse_spark.session import get_spark  # noqa: E402


# Spark dtype -> the ONE DuckDB type the driver hashes identically.
# Anything outside this table (HUGEINT, DECIMAL, TIMESTAMP, lists, ...)
# is a divergence the oracle SQL must fix with an explicit CAST.
_TYPE_MAP = {
    "bigint": "BIGINT",
    "int": "INTEGER",
    "double": "DOUBLE",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
}


def _type_mismatches(s_dtypes, d_cols, d_types):
    """Pair Spark and DuckDB columns by name; return incompatible pairs."""
    duck = {c: str(t) for c, t in zip(d_cols, d_types)}
    bad = []
    for col, sdt in s_dtypes:
        expected = _TYPE_MAP.get(sdt)
        actual = duck.get(col)
        if actual is None:
            continue  # column-name mismatch is reported separately
        if expected is None or actual != expected:
            bad.append((col, sdt, actual))
    return bad


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, int):
        return int(v)
    try:  # Decimal → float-ish string
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return sorted(c for c in cols), out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(app_name="verify_local")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"  ok {name}: rows-only ({len(s_rows)} rows, {spark_s:.1f}s spark) [no oracle]")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = list(rel.columns)
            d_types = list(rel.types)
            d_rows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue

        type_bad = _type_mismatches(sdf.dtypes, d_cols, d_types)
        if type_bad:
            failures.append(name)
            detail = ", ".join(f"{c}: spark={s} duckdb={d}" for c, s, d in type_bad)
            print(f"FAIL {name}: type mismatch ({detail})")
            continue

        sc, sr = _normalize(s_rows, s_cols)
        dc, dr = _normalize(d_rows, d_cols)
        if len(sr) != len(dr):
            failures.append(name)
            print(f"FAIL {name}: row count spark={len(sr)} duckdb={len(dr)}")
            continue
        if sc != dc:
            failures.append(name)
            print(f"FAIL {name}: columns spark={sc} duckdb={dc}")
            continue
        bad = None
        for i, (a, b) in enumerate(zip(sr, dr)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            failures.append(name)
            print(f"FAIL {name}: first diff at sorted row {bad[0]}:\n  spark : {bad[1]}\n  duckdb: {bad[2]}")
        else:
            print(f"  ok {name}: {len(sr)} rows match ({spark_s:.1f}s spark)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
