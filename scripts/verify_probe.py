"""Verification probes: drive citykg.extract through the public package
boundary with hostile inputs, and inspect the physical plan."""
import sys

sys.path.insert(0, "/root/repo")

from citykg.session import get_spark
from citykg.extract import extract_triples
from citykg.schema import DOC_SCHEMA

spark = get_spark("probe", master="local[4]")

hostile = [
    ("doc_ok", [{"kind": "building", "text": "gmlId=B1;class=3", "media_ref": "", "offset": 0}]),
    ("doc_garbage", [{"kind": "building", "text": "no delimiters at all ###", "media_ref": "", "offset": 0}]),
    ("doc_empty_spans", []),
    ("doc_unknown_kind", [{"kind": "zeppelin_port", "text": "gmlId=Z1", "media_ref": "", "offset": 0}]),
    ("doc_dup_keys", [{"kind": "building", "text": "gmlId=B2;class=1;class=9", "media_ref": "", "offset": 0}]),
    ("doc_null_text", [{"kind": "building", "text": None, "media_ref": None, "offset": 0}]),
    ("doc_empty_eq", [{"kind": "address", "text": "street=;city=Metropolis", "media_ref": "", "offset": 0}]),
]
docs = spark.createDataFrame(
    [(d, [tuple(s.values()) for s in spans]) for d, spans in hostile], DOC_SCHEMA
)
t = extract_triples(spark, docs)
rows = t.orderBy("doc_id", "span_idx", "pos").collect()
for r in rows:
    print(f"{r.doc_id:18s} {r.graph:12s} {r.pred:24s} -> {r.obj!r}")
print("total:", len(rows))

print("\n=== physical plan (truncated) ===")
plan = t._jdf.queryExecution().executedPlan().toString()
for line in plan.splitlines():
    if any(k in line for k in ("Broadcast", "Exchange", "Scan", "WholeStageCodegen", "Project")):
        print(line[:160])
spark.stop()
