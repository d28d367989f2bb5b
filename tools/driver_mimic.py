"""Mimic the driver's verify: smoke entry(), then run every queries()[name]
at sf0.01 vs oracle_sql()[name] through DuckDB (row count + sorted-column
value hash)."""
import hashlib
import json
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

import __spark_entry__ as E
from opensnowcat_collector_spark.session import get_spark

SF_DIR = __import__("os").environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spark = get_spark(app_name="driver-mimic")
spark.sparkContext.setLogLevel("ERROR")

# 1. smoke entry()
df = E.entry(spark)
rows = df.collect()
print(f"entry(): OK, {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

def value_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            # The real driver sort_values-canonicalizes and dies on
            # unhashable container cells (r7: embed_quantize_int8).
            # Stay at least as strict: reject them instead of
            # stringifying them away.
            import numpy as np

            bad = pdf[c].map(lambda v: isinstance(v, (list, tuple, dict, set, np.ndarray)))
            if bad.any():
                raise TypeError(
                    f"non-scalar cells in column {c!r} (e.g. "
                    f"{pdf[c][bad].iloc[0]!r}) — driver canonicalizer would fail"
                )
            pdf[c] = pdf[c].astype(str)
        elif pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(4)
    if len(pdf) == 0:
        return "EMPTY"
    lines = sorted(pdf.astype(str).apply(lambda r: "|".join(r), axis=1).tolist())
    return hashlib.md5("\n".join(lines).encode()).hexdigest()

queries = E.queries()
oracles = E.oracle_sql()
results = {}
for name, fn in queries.items():
    try:
        sdf = fn(spark, SF_DIR)
        spdf = sdf.toPandas()
        if name not in oracles:
            results[name] = f"ROWS_ONLY rows={len(spdf)}"
            continue
        opdf = con.execute(oracles[name]).fetchdf()
        sc, oc = sorted(spdf.columns), sorted(opdf.columns)
        if sc != oc:
            results[name] = f"SCHEMA_MISMATCH spark={sc} oracle={oc}"
        elif len(spdf) != len(opdf):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(spdf)} oracle={len(opdf)}"
        elif value_hash(spdf) != value_hash(opdf):
            results[name] = f"HASH_MISMATCH rows={len(spdf)}"
        else:
            results[name] = f"MATCH rows={len(spdf)}"
    except Exception as e:
        results[name] = f"ERROR {type(e).__name__}: {str(e)[:200]}"

ok = sum(1 for v in results.values() if v.startswith(("MATCH", "ROWS_ONLY")))
for k, v in sorted(results.items()):
    print(f"{'PASS' if v.startswith(('MATCH','ROWS_ONLY')) else 'FAIL'} {k}: {v}")
print(json.dumps({"total": len(results), "ok": ok}))
