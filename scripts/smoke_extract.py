"""Dev smoke: Spark extract vs DuckDB oracle at sf0.001."""
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

from citykg.session import get_spark
from citykg.fixtures import synth_docs, triples_oracle_sql
from citykg.extract import extract_triples

spark = get_spark("smoke", master="local[8]")
sf = "/root/testdata/sf0.001"

docs = synth_docs(spark, sf)
docs.show(2, truncate=80)

t = extract_triples(spark, docs)
spark_pdf = t.toPandas()
print("spark rows:", len(spark_pdf))

con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
sql = triples_oracle_sql()
duck_pdf = con.execute(sql).df()
print("duck rows:", len(duck_pdf))

cols = ["subj", "pred", "obj", "obj_type", "datatype", "graph", "doc_id", "span_idx", "pos"]
a = spark_pdf[cols].fillna("<N>").sort_values(cols).reset_index(drop=True)
b = duck_pdf[cols].fillna("<N>").sort_values(cols).reset_index(drop=True)
b["span_idx"] = b["span_idx"].astype(a["span_idx"].dtype)
b["pos"] = b["pos"].astype(a["pos"].dtype)
eq = a.equals(b)
print("EQUAL:", eq)
if not eq:
    merged = a.merge(b, how="outer", indicator=True, on=cols)
    diff = merged[merged["_merge"] != "both"]
    print(diff.groupby(["_merge", "graph", "pred"], observed=True).size().head(40))
    print(diff.head(20).to_string())
spark.stop()
