"""Full oracle sweep at sf0.1 (VERDICT r5 'Next round' #4).

The driver's correctness gate runs at one driver-chosen scale factor; the
degenerate-bucket / boilerplate-shingle caps in the dedup operators
(max_bucket_size, max_shingle_docs) and the fan-out/pruning branches only
bite at larger row counts. This (slow) test iterates EVERY queries() entry
against its DuckDB oracle at sf0.1 (5k docs), guarding the cap paths the
small scale factors never exercise — and pinning that this round's plan
restructurings (streaming block encoder, closure scorer, window bucket
caps, literal relations) stay value-identical at the bench scale factor.
"""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _normalize(df: pd.DataFrame) -> list:
    df = df[sorted(df.columns)]
    return sorted(
        tuple(None if pd.isna(v) else v for v in row)
        for row in df.itertuples(index=False, name=None)
    )


@pytest.mark.slow
@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="sf0.1 test data not present"
)
def test_all_entries_match_oracle_at_sf01(spark):
    duckdb = pytest.importorskip("duckdb")
    # media oracles embed a driver-side fixture path per sf — pin it
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR
    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    oracles = E.oracle_sql()
    failures = []
    for name, fn in E.queries().items():
        sdf = fn(spark, SF_DIR).toPandas()
        if name not in oracles:
            continue
        odf = con.sql(oracles[name]).df()
        if len(sdf) != len(odf):
            failures.append(f"{name}: rows {len(sdf)} != {len(odf)}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append(f"{name}: columns {sorted(sdf.columns)} != {sorted(odf.columns)}")
            continue
        if _normalize(sdf) != _normalize(odf):
            failures.append(f"{name}: values differ")
    assert not failures, "; ".join(failures)
