#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over the same sfDir parquet
tables, and compares: schema (column names), ARROW-LEVEL COLUMN TYPES, row
count, and values (columns sorted by name, rows in emitted order, doubles
rounded to 6 places, timestamps normalized to epoch microseconds).

The type gate exists because the driver's hash is type-sensitive while the
old pandas normalization here was not: DuckDB types an uncast integer sum()
as HUGEINT -> arrow decimal128(38,0) where Spark emits int64, and round 8
shipped four oracles that passed locally and hash-failed on the driver.
Any oracle column whose arrow type disagrees with Spark's (after width/name
canonicalization that mirrors value identity, NOT lossy pandas coercion) is
now a local FAIL, with a loud hint when the culprit is an uncast aggregate.

Dev tool only — the Scala library does not depend on this.
"""
import calendar
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def canon_type(t):
    """Canonical form for an arrow type: collapses representation-only
    differences (string vs large_string, timestamp tz spelling) but keeps
    everything that changes the hashed value domain (decimal vs int,
    int width, float width)."""
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_integer(t):
        return f"int{t.bit_width}"
    if pa.types.is_floating(t):
        return f"float{t.bit_width}"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_type(t.value_type)}>"
    return str(t)


def type_gate(name, spark_schema, duck_schema):
    """Returns a list of human-readable type mismatches (empty = pass)."""
    sp = {f.name: f.type for f in spark_schema}
    du = {f.name: f.type for f in duck_schema}
    errs = []
    for col in sorted(set(sp) & set(du)):
        cs, cd = canon_type(sp[col]), canon_type(du[col])
        if cs != cd:
            hint = ""
            if pa.types.is_decimal(du[col]) and not pa.types.is_decimal(sp[col]):
                hint = "  <-- uncast integer aggregate in oracle SQL? add CAST(... AS BIGINT)"
            errs.append(f"column {col}: spark={sp[col]} duck={du[col]}{hint}")
    return errs

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 6)
    if isinstance(v, pd.Timestamp):
        return v.value // 1000  # epoch micros
    if hasattr(v, "timestamp") and not isinstance(v, (int, str)):
        try:
            if getattr(v, "tzinfo", None) is not None:
                # aware: timestamp() honors the UTC offset
                return int(v.timestamp() * 1_000_000)
            # naive: treat wall-clock fields as UTC regardless of host TZ
            micros = getattr(v, "microsecond", 0)
            return calendar.timegm(v.timetuple()) * 1_000_000 + micros
        except Exception:
            pass
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(norm_cell(x) for x in v)
    return v


def norm_df(df):
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        rows.append(tuple(norm_cell(v) for v in row))
    return list(df.columns), rows


def describe_mode(sf_dir, oracle_json):
    """--describe <sfDir> <oracle_sql.json>: print {name: {col: duckdb_type}}
    from DESCRIBE (plan-only, nothing executes). Lets the Scala test suite
    sweep every oracle's output types against the Spark query's analyzed
    schema without running a single query."""
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads(Path(oracle_json).read_text())
    out = {}
    for name, sql in sorted(oracle.items()):
        try:
            rows = con.execute(f"DESCRIBE ({sql})").fetchall()
            out[name] = {r[0]: r[1] for r in rows}
        except Exception as e:
            out[name] = {"__error__": str(e)}
    print(json.dumps(out))


def main():
    if sys.argv[1] == "--describe":
        describe_mode(sys.argv[2], sys.argv[3])
        return
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        qdir = Path(out_dir) / name
        if not qdir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            parts = sorted(qdir.glob("*.parquet"))
            # row order relies on Verify's coalesce(1); a multi-file output
            # would silently break the ordered compare — fail loudly instead
            assert len(parts) == 1, f"{name}: expected 1 part file, got {len(parts)}"
            spark_schema = pq.read_schema(parts[0])
            duck_tbl = con.execute(sql).fetch_arrow_table()
            spark_df = pd.concat(
                [pd.read_parquet(f) for f in parts], ignore_index=True)
            duck_df = duck_tbl.to_pandas()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        sc, sr = norm_df(spark_df)
        dc, dr = norm_df(duck_df)
        type_errs = type_gate(name, spark_schema, duck_tbl.schema)
        if type_errs:
            print(f"FAIL {name}: arrow type mismatch:\n  " + "\n  ".join(type_errs))
            n_fail += 1
        elif sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            n_fail += 1
        elif len(sr) != len(dr):
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
            n_fail += 1
        elif sr != dr:
            bad = next(i for i, (a, b) in enumerate(zip(sr, dr)) if a != b)
            print(f"FAIL {name}: first diff row {bad}:\n  spark={sr[bad]}\n  duck ={dr[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
