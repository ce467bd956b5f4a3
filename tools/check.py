#!/usr/bin/env python3
"""Dev-loop stand-in for the driver's correctness gate: run DuckDB on
oracle_sql.json against the sf parquet tables and compare to the Spark
dumps produced by `graft.Verify`. Mimics the driver: sort columns by name,
compare values. Dev tooling only — the shipped library is pure Scala."""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # Verify writes _errors.json (query -> exception) for every query that
    # threw instead of dumping — score those as explicit FAILs so a
    # throwing query can never vanish from the tally (round-7 lesson).
    # The manifest is written LAST, unconditionally ({} when clean): its
    # absence means Verify itself died mid-run (OOM/kill), so a partial
    # dump must not score as a smaller-but-green run.
    err_path = os.path.join(out_dir, "_errors.json")
    if not os.path.exists(err_path):
        print("FAIL _errors.json missing: Verify did not run to completion — "
              "partial dump, rerun graft.Verify")
        n_fail += 1
        errors = {}
    else:
        errors = json.load(open(err_path))
    for name, msg in sorted(errors.items()):
        print(f"FAIL {name}: threw at Verify time: {msg}")
        n_fail += 1
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        try:
            spark_df = con.execute(f"SELECT * FROM '{d}/*.parquet'").df()
        except Exception as e:
            # an unreadable dump dir must fail THAT query, not kill the
            # whole scoring run
            print(f"FAIL {name}: unreadable dump: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            status = f"rows-only ({len(spark_df)} rows)"
            ok = len(spark_df) > 0
        else:
            try:
                duck_df = con.execute(oracle[name]).df()
            except Exception as e:
                print(f"FAIL {name}: oracle SQL error: {e}")
                n_fail += 1
                continue
            s = spark_df.reindex(sorted(spark_df.columns), axis=1)
            o = duck_df.reindex(sorted(duck_df.columns), axis=1)
            ok, status = compare(s, o)
        if ok:
            n_pass += 1
            print(f"PASS {name}: {status}")
        else:
            n_fail += 1
            print(f"FAIL {name}: {status}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

def compare(s, o):
    if list(s.columns) != list(o.columns):
        return False, f"columns differ: spark={list(s.columns)} oracle={list(o.columns)}"
    if len(s) != len(o):
        return False, f"row count differs: spark={len(s)} oracle={len(o)}"
    for c in s.columns:
        a, b = s[c], o[c]
        # The driver hashes canonicalized VALUES, so an int column on one
        # side and a float column on the other (e.g. a DuckDB HUGEINT sum
        # that pandas renders as float64: 4133 vs 4133.0) is a driver-level
        # hash mismatch even though pandas `==` coerces them equal. Mirror
        # that strictness here (round-18 lesson: the local gate said
        # 192/192 while the driver measured a hash mismatch).
        a_int = pd.api.types.is_integer_dtype(a)
        b_int = pd.api.types.is_integer_dtype(b)
        a_flt = pd.api.types.is_float_dtype(a)
        b_flt = pd.api.types.is_float_dtype(b)
        if (a_int and b_flt) or (a_flt and b_int):
            return False, (f"column {c} dtype class differs: spark={a.dtype} "
                           f"oracle={b.dtype} (int-vs-float renders different "
                           f"canonical values under the driver's hash)")
        try:
            a = a.map(lambda v: tuple(v) if hasattr(v, "__len__") and not isinstance(v, str) else v)
            b = b.map(lambda v: tuple(v) if hasattr(v, "__len__") and not isinstance(v, str) else v)
            both_na = a.isna() & b.isna()
            eq = (both_na | (a == b)).all()
        except Exception as e:
            return False, f"column {c} compare error: {e}"
        if not eq:
            bad = ~(both_na | (a == b))
            i = bad[bad].index[0]
            return False, f"column {c} differs at row {i}: spark={s[c][i]!r} oracle={o[c][i]!r}"
    return True, f"{len(s)} rows x {len(s.columns)} cols match"

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
