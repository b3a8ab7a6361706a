"""Local stand-in for the driver's correctness gate: run every queries()
entry and its oracle_sql() twin at a given sf dir, compare row count, column
names, and an order-insensitive value hash. Usage:

    python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(df) -> str:
    """Order-insensitive hash: sort columns by name, canonicalize values,
    sort row strings, sha256."""
    import math

    cols = sorted(df.columns)
    rows = []
    for t in df[cols].itertuples(index=False):
        parts = []
        for v in t:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                parts.append("∅")
            elif isinstance(v, float):
                parts.append(f"{v:.9g}")
            elif hasattr(v, "isoformat"):
                parts.append(v.isoformat()[:26])
            else:
                parts.append(str(v))
        rows.append("|".join(parts))
    rows.sort()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from seatunnel_spark.session import get_spark

    spark = get_spark("oracle_check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = entry.queries(), entry.oracle_sql()
    failed, passed, rows_only = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failed.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            continue
        if name not in os_:
            rows_only.append((name, len(sdf)))
            print(f"ROWS-ONLY {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.execute(os_[name]).fetchdf()
        except Exception as e:
            failed.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            continue
        if len(sdf) != len(odf):
            failed.append((name, f"rowcount {len(sdf)} vs {len(odf)}"))
            print(f"FAIL {name}: rowcount {len(sdf)} vs {len(odf)}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failed.append((name, f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}"))
            print(f"FAIL {name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            continue
        hs, ho = value_hash(sdf), value_hash(odf)
        if hs != ho:
            failed.append((name, f"value hash {hs} vs {ho}"))
            print(f"FAIL {name}: value hash mismatch ({len(sdf)} rows)")
            # show a diff sample
            cols = sorted(sdf.columns)
            a = sdf[cols].astype(str).apply("|".join, axis=1).sort_values().tolist()
            b = odf[cols].astype(str).apply("|".join, axis=1).sort_values().tolist()
            for x, y in zip(a, b):
                if x != y:
                    print(f"  spark: {x[:200]}\n  duck : {y[:200]}")
                    break
        else:
            passed.append(name)
            print(f"OK   {name} ({len(sdf)} rows)")

    print(f"\n{len(passed)} ok, {len(rows_only)} rows-only, {len(failed)} failed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
