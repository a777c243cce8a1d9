import duckdb, json, glob, os, sys
import pandas as pd
sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/vout'
# optional 3rd arg: comma-separated query-name filter (parallel sharding
# for big-SF sweeps — some recursive-CTE oracles run minutes at sf1)
only = set(sys.argv[3].split(',')) if len(sys.argv) > 3 else None
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f'{out}/oracle_sql.json'))
ok = fail = 0
for name in sorted(os.listdir(out)):
    if only is not None and name not in only: continue
    d = os.path.join(out, name)
    if not os.path.isdir(d): continue
    spark_df = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
    if name not in oracle:
        print(f"{name:22s} rows-only: {len(spark_df)} rows")
        continue
    odf = con.sql(oracle[name]).df()
    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        return df
    s, o = canon(spark_df), canon(odf)
    if list(s.columns) != list(o.columns):
        print(f"{name:22s} COLUMN MISMATCH {list(s.columns)} vs {list(o.columns)}"); fail += 1; continue
    if len(s) != len(o):
        print(f"{name:22s} ROWCOUNT {len(s)} vs {len(o)}"); fail += 1; continue
    if not s.equals(o):
        neq = (s != o) & ~(s.isna() & o.isna())
        cols = [c for c in s.columns if neq[c].any()]
        print(f"{name:22s} VALUE MISMATCH in {cols}, first rows:")
        idx = neq.any(axis=1)
        print(pd.concat([s[idx].head(3).add_suffix('_spark'), o[idx].head(3).add_suffix('_oracle')], axis=1))
        fail += 1; continue
    print(f"{name:22s} OK ({len(s)} rows)"); ok += 1
print(f"== {ok} ok, {fail} fail")
