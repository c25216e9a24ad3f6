# Local feedback loop: replicate the driver's t2 DuckDB-oracle compare.
# Usage: python3 compare_oracle.py [verify_out_dir] [sf_dir]
import duckdb, json, sys, pandas as pd

out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_out'
sf = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'
con = duckdb.connect()
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
fails = 0
for name, sql in sorted(json.load(open(f'{out}/oracle_sql.json')).items()):
    try:
        s = pd.read_parquet(f'{out}/{name}')
        d = con.execute(sql).df()
        s, d = s[sorted(s.columns)], d[sorted(d.columns)]
        # normalize dtypes the way a hash compare would see values
        ok_schema = list(s.columns) == list(d.columns)
        eq = s.equals(d)
        if not eq:
            # tolerate dtype-width differences only if values match exactly
            try:
                eq = (len(s) == len(d)) and all(
                    (s[c].astype(object).tolist() == d[c].astype(object).tolist())
                    for c in s.columns)
                tag = 'VALUES-EQ(dtype-diff)' if eq else 'MISMATCH'
            except Exception:
                tag = 'MISMATCH'
        else:
            tag = 'EXACT'
        print(f"{name}: rows={len(s)}/{len(d)} schema={ok_schema} {tag}")
        if tag == 'MISMATCH':
            fails += 1
            merged = s.compare(d) if len(s) == len(d) and list(s.columns) == list(d.columns) else None
            if merged is not None and not merged.empty:
                print(merged.head(5))
            else:
                print('spark:\n', s.head(3), '\nduck:\n', d.head(3))
            print('spark dtypes:', dict(s.dtypes.astype(str)))
            print('duck  dtypes:', dict(d.dtypes.astype(str)))
    except Exception as e:
        fails += 1
        print(f"{name}: ERROR {type(e).__name__}: {e}")
print('FAILS:', fails)
