#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracles and compare row count, sorted column names, and a
value hash. Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, hashlib, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def norm(v):
    if v is None: return "NULL"
    if isinstance(v, float): return repr(v)
    if isinstance(v, bool): return str(int(v))
    return str(v)

def frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for r in sorted(tuple(norm(r[i]) for i in order) for r in rows):
        h.update("\x01".join(r).encode()); h.update(b"\x02")
    return h.hexdigest()

ok = fail = 0
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d): continue
    got = con.execute(f"SELECT * FROM '{d}/*.parquet'")
    gcols = [c[0] for c in got.description]; grows = got.fetchall()
    if name not in oracle:
        print(f"  [rows-only] {name}: {len(grows)} rows "
              f"{'OK' if len(grows) > 0 else 'EMPTY!'}")
        continue
    exp = con.execute(oracle[name])
    ecols = [c[0] for c in exp.description]; erows = exp.fetchall()
    problems = []
    if sorted(gcols) != sorted(ecols):
        problems.append(f"cols {sorted(gcols)} != {sorted(ecols)}")
    if len(grows) != len(erows):
        problems.append(f"rows {len(grows)} != {len(erows)}")
    if not problems and frame_hash(gcols, grows) != frame_hash(ecols, erows):
        problems.append("HASH MISMATCH")
        order_g = sorted(range(len(gcols)), key=lambda i: gcols[i])
        order_e = sorted(range(len(ecols)), key=lambda i: ecols[i])
        sg = sorted(tuple(norm(r[i]) for i in order_g) for r in grows)
        se = sorted(tuple(norm(r[i]) for i in order_e) for r in erows)
        for a, b in zip(sg, se):
            if a != b:
                problems.append(f"first diff: got={a} exp={b}")
                break
    if problems:
        fail += 1; print(f"  [FAIL] {name}: {'; '.join(problems)}")
    else:
        ok += 1; print(f"  [ok]   {name}: {len(grows)} rows")
print(f"{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
