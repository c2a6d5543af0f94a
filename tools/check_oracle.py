#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read Verify's parquet dumps,
run each oracle SQL in DuckDB over the same tables, compare after sorting
columns by name. Usage: check_oracle.py <sfDir> <verifyOutDir>"""
import json, math, sys
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
if only is not None:
    unknown = only - set(oracle)
    if unknown:
        print(f"ERROR: filter names not in oracle_sql.json: {sorted(unknown)}")
        sys.exit(2)
fails = []
for name, sql in sorted(oracle.items()):
    if only is not None and name not in only:
        continue
    try:
        spark_rel = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        scols = [d[0] for d in spark_rel.description]
        srows = spark_rel.fetchall()
        orel = con.execute(sql)
        ocols = [d[0] for d in orel.description]
        orows = orel.fetchall()
    except Exception as e:
        fails.append(name)
        print(f"FAIL {name}: exception {e}")
        continue
    if sorted(scols) != sorted(ocols):
        fails.append(name)
        print(f"FAIL {name}: cols spark={scols} oracle={ocols}")
        continue
    sidx = [scols.index(c) for c in sorted(scols)]
    oidx = [ocols.index(c) for c in sorted(ocols)]
    sr = [tuple(r[i] for i in sidx) for r in srows]
    orr = [tuple(r[i] for i in oidx) for r in orows]
    def canon(rows):
        out = []
        for r in rows:
            rr = []
            for v in r:
                if isinstance(v, float):
                    rr.append(round(v, 6) if not math.isnan(v) else "nan")
                else:
                    rr.append(v)
            out.append(tuple(rr))
        return out
    sr, orr = canon(sr), canon(orr)
    if len(sr) != len(orr):
        fails.append(name)
        print(f"FAIL {name}: rowcount spark={len(sr)} oracle={len(orr)}")
        continue
    if sr != orr:
        if sorted(map(repr, sr)) == sorted(map(repr, orr)):
            print(f"WARN {name}: rows match but ORDER differs")
            for a, b in list(zip(sr, orr))[:3]:
                if a != b: print(f"  spark={a} oracle={b}")
        else:
            fails.append(name)
            print(f"FAIL {name}: values differ")
            shown = 0
            for a, b in zip(sr, orr):
                if a != b and shown < 3:
                    print(f"  spark={a}\n  oracle={b}")
                    shown += 1
        continue
    print(f"ok   {name} ({len(sr)} rows)")
checked = len(oracle) if only is None else len([n for n in oracle if n in only])
print(f"\n{checked - len(fails)}/{checked} pass; fails: {fails}")
sys.exit(1 if fails else 0)
