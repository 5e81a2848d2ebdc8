#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate: run Verify output
vs DuckDB oracles, compare values exactly (columns sorted by name)."""
import sys, json, glob, os
import duckdb, pandas as pd, numpy as np

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes, rows_only = [], [], []
for qdir in sorted(glob.glob(f"{out_dir}/q*")):
    name = os.path.basename(qdir)
    try:
        got = con.execute(f"SELECT * FROM '{qdir}/*.parquet'").fetchdf()
    except Exception as e:
        fails.append((name, f"spark output unreadable: {e}")); continue
    if name not in oracle:
        rows_only.append((name, len(got))); continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}")); continue
    got = got[sorted(got.columns)]; exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"columns differ: {list(got.columns)} vs {list(exp.columns)}")); continue
    # the driver lexsorts all columns before hashing — replicate, because
    # it CRASHES on list-typed columns (round-1 q22) and we must catch
    # that locally
    try:
        got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    except Exception as e:
        fails.append((name, f"driver-style sort_values failed: {e}")); continue
    if len(got) != len(exp):
        fails.append((name, f"row count: {len(got)} vs {len(exp)}")); continue
    ok = True
    for c in got.columns:
        a, b = got[c].values, exp[c].values
        # driver-strict: the driver hashes STRINGIFIED values, so an
        # int64 125646 vs a float64 125646.0 (DuckDB HUGEINT sums come
        # back as float64 through pandas) is a FAIL, not a match. Gate
        # on dtype kind first so the mismatch is named, then compare
        # the stringified values exactly like the driver does.
        ka = a.dtype.kind if hasattr(a.dtype, "kind") else "O"
        kb = b.dtype.kind if hasattr(b.dtype, "kind") else "O"
        num = {"i", "u", "f"}
        # signed vs unsigned ints ('i' vs 'u') stringify identically, so
        # the driver passes them — only flag int-vs-float class changes
        int_kinds = {"i", "u"}
        same_class = ka == kb or (ka in int_kinds and kb in int_kinds)
        if not same_class and (ka in num or kb in num) and not (ka == "O" or kb == "O"):
            fails.append((name, f"col {c} dtype kind mismatch: spark {a.dtype} vs oracle {b.dtype} "
                                f"(driver stringifies: int 1 != float 1.0)"))
            ok = False; break
        try:
            eq = all(str(x) == str(y) for x, y in zip(a, b))
        except Exception:
            eq = False
        if not eq:
            mism = [(i, a[i], b[i]) for i in range(len(a)) if str(a[i]) != str(b[i])][:3]
            fails.append((name, f"col {c} differs ({a.dtype} vs {b.dtype}), e.g. {mism}")); ok = False; break
    if ok: passes.append(name)

print(f"PASS {len(passes)}: {' '.join(passes)}")
print(f"ROWS-ONLY {len(rows_only)}: {rows_only}")
print(f"FAIL {len(fails)}:")
for n, msg in fails: print(f"  {n}: {msg}")
sys.exit(1 if fails else 0)
