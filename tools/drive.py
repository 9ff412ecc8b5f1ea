"""Driver-protocol simulation: vanilla session (driver builds its own,
without our session factory), entry smoke at sf0.001, oracle compare at sf0.01."""
import sys, math, time, os
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master(os.environ.get("DRIVE_MASTER", "local[8]"))
         .config("spark.sql.shuffle.partitions", os.environ.get("DRIVE_SHUFFLE", "8"))
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E
df = E.entry(spark)
rows = df.collect()
print(f"ENTRY: {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
assert len(rows) > 0

import duckdb
SF = os.environ.get("SF", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = "nan" if math.isnan(v) else round(v, 6)
            if isinstance(v, int) and not isinstance(v, bool):
                v = float(v)
            vals.append(repr(v))
        out.append("|".join(vals))
    return sorted(out)

qs, os_ = E.queries(), E.oracle_sql()
fails = []
for name in sorted(qs):
    t0 = time.time()
    sdf = qs[name](spark, SF)
    srows = sdf.collect(); scols = sdf.columns
    status = "rows-only"
    if name in os_:
        res = con.execute(os_[name]); dcols = [d[0] for d in res.description]; drows = res.fetchall()
        ok = (sorted(scols) == sorted(dcols) and len(srows) == len(drows)
              and norm([[r[c] for c in scols] for r in srows], scols) == norm(drows, dcols))
        status = "MATCH" if ok else "MISMATCH"
        if not ok: fails.append(name)
    print(f"{name:28s} {status:9s} {len(srows):6d} rows {time.time()-t0:5.1f}s")
print("FAILS:", fails or "none")
sys.exit(1 if fails else 0)
