"""Local mimic of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB at the same sf, compare
row-count + column names + COLUMN TYPES + order-insensitive values
(columns sorted by name, exact equality — the hash analogue).

The type check goes through Arrow on BOTH engines (`DataFrame.toArrow()`
vs `fetch_arrow_table()`): Python-value equality alone cannot see a
DuckDB HUGEINT (arrow decimal128(38,0)) masquerading as a Spark BIGINT
(arrow int64) — exactly how the r3 `corpus_pack_manifest` red row
shipped while this gate was green (VERDICT r3 "Next round" #2).

Usage: python tools/check_contract.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def arrow_type(t) -> str:
    """Normalized type tag for an Arrow type: insensitive to large_
    variants, nullability, and timestamp unit/zone; every width-bearing
    distinction (int32 vs int64 vs decimal) survives — those are the
    distinctions the driver's typed value hash sees."""
    import pyarrow as pa

    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{arrow_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{arrow_type(f.type)}" for f in t)
        return f"struct<{inner}>"
    return str(t)


def type_map(table) -> dict[str, str]:
    return {f.name: arrow_type(f.type) for f in table.schema}


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def rowset(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(norm(r[i]) for i in order) for r in rows), key=repr
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from ocr_spark.session import get_spark

    spark = get_spark("contract-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            s_types = type_map(sdf.limit(0).toArrow())
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(
                f"rows-only  {name}: {len(s_rows)} rows "
                f"({time.time() - t0:.1f}s)"
            )
            continue
        try:
            d_tab = con.execute(oracles[name]).fetch_arrow_table()
            d_cols = d_tab.column_names
            d_rows = [
                tuple(d[c] for c in d_cols) for d in d_tab.to_pylist()
            ]
            d_types = type_map(d_tab)
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ok = True
        if sorted(s_cols) != sorted(d_cols):
            ok = False
            print(f"FAIL  {name}: cols spark={sorted(s_cols)} "
                  f"duck={sorted(d_cols)}")
        elif s_types != d_types:
            ok = False
            bad = {
                c: (s_types.get(c), d_types.get(c))
                for c in s_types
                if s_types.get(c) != d_types.get(c)
            }
            print(f"FAIL  {name}: type mismatch (spark, duck): {bad}")
        elif len(s_rows) != len(d_rows):
            ok = False
            print(f"FAIL  {name}: rows spark={len(s_rows)} "
                  f"duck={len(d_rows)}")
        else:
            a = rowset(s_cols, s_rows)
            b = rowset(d_cols, d_rows)
            if a != b:
                ok = False
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"FAIL  {name}: value mismatch; first diffs:")
                for x, y in diffs:
                    print(f"    spark={x}\n    duck ={y}")
        if ok:
            print(
                f"OK    {name}: {len(s_rows)} rows "
                f"({time.time() - t0:.1f}s)"
            )
        else:
            failures.append(name)
    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + str(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
