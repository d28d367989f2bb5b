"""Quick per-query oracle check for a subset: python tools/check_subset.py name1 name2 ...

Same compare as tools/driver_mimic.py (row count + sorted-column value
hash) but only for the named queries, for fast iteration.
"""
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from opensnowcat_collector_spark.engine import registry
from opensnowcat_collector_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(pdf: pd.DataFrame) -> str:
    # Deliberately byte-identical to tools/driver_mimic.py::value_hash —
    # that script mirrors the GRADING DRIVER and runs its sweep at import
    # time (so it cannot be imported from here).  If the driver's compare
    # semantics change, update BOTH copies.
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(4)
    if len(pdf) == 0:
        return "EMPTY"
    lines = sorted(pdf.astype(str).apply(lambda r: "|".join(r), axis=1).tolist())
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> int:
    names = sys.argv[1:]
    queries = registry.all_queries()
    oracles = registry.all_oracle_sql()
    if not names:
        names = list(queries)
    spark = get_spark(app_name="check-subset")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    bad = 0
    for name in names:
        try:
            spdf = queries[name](spark, SF_DIR).toPandas()
            if name not in oracles:
                print(f"{name}: ROWS_ONLY rows={len(spdf)}")
                continue
            opdf = con.execute(oracles[name]).fetchdf()
            sc, oc = sorted(spdf.columns), sorted(opdf.columns)
            if sc != oc:
                print(f"{name}: SCHEMA_MISMATCH spark={sc} oracle={oc}")
                bad += 1
            elif len(spdf) != len(opdf):
                print(f"{name}: ROWCOUNT_MISMATCH spark={len(spdf)} oracle={len(opdf)}")
                bad += 1
            elif value_hash(spdf) != value_hash(opdf):
                print(f"{name}: HASH_MISMATCH rows={len(spdf)}")
                bad += 1
            else:
                print(f"{name}: MATCH rows={len(spdf)}")
        except Exception as e:  # noqa: BLE001 — diagnostic tool
            print(f"{name}: ERR {type(e).__name__}: {e}")
            bad += 1
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
