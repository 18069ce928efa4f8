#!/usr/bin/env python3
"""Full oracle cross-check: run every oracle_sql.json entry in DuckDB
over the testdata views and compare to the Spark parquet dumps.
Usage: check.py SFDIR OUTDIR [name1,name2,...]"""
import duckdb, json, sys, math, os

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(',')) if len(sys.argv) > 3 else None
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f'{out}/oracle_sql.json'))

def norm(v):
    if v is None: return 'NULL'
    if isinstance(v, float):
        if math.isnan(v): return 'NULL'
        r = round(v, 9)
        if r == int(r) and abs(r) < 1e15: return str(int(r))
        return f'{r:.9f}'.rstrip('0')
    if isinstance(v, bool): return str(v).lower()
    return str(v)

ok = bad = 0
names = sorted(n for n in oracle if (only is None or n in only))
for n in names:
    try:
        if not os.path.isdir(f'{out}/{n}'):
            print(f'MISS {n}: no spark dump'); bad += 1; continue
        sq = con.sql(f"SELECT * FROM '{out}/{n}/*.parquet'")
        od = con.sql(oracle[n])
        scols, ocols = sorted(sq.columns), sorted(od.columns)
        sidx = [sq.columns.index(c) for c in scols]
        oidx = [od.columns.index(c) for c in ocols]
        srows = sorted(tuple(norm(r[i]) for i in sidx) for r in sq.fetchall())
        orows = sorted(tuple(norm(r[i]) for i in oidx) for r in od.fetchall())
        if scols != ocols:
            print(f'FAIL {n}: cols spark={scols} oracle={ocols}'); bad += 1
        elif srows != orows:
            print(f'FAIL {n}: rows spark={len(srows)} oracle={len(orows)}')
            for a, b in [(a, b) for a, b in zip(srows, orows) if a != b][:3]:
                print('  spark:', a, '\n  oracl:', b)
            bad += 1
        else:
            ok += 1
    except Exception as e:
        print(f'ERR  {n}: {e}'); bad += 1
print(f'{ok}/{ok+bad} OK')
sys.exit(1 if bad else 0)
