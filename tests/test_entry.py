"""Driver-contract checks: entry() smoke + oracle parity for a sample of
queries at sf0.001 (full sweep runs via scripts/check_entry.py at sf0.01)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod
from conftest import SF_SMOKE

SAMPLE = [
    "kg_extract_full",
    "kg_counts",
    "kg_link_exact",
    "lineitem_pricing",
    "dedup_minhash_lsh",
    "text_fingerprint",
    "ann_brute_topk",
]


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    n = df.count()
    assert n > 20000
    assert set(df.columns) >= {"subj", "pred", "obj", "graph"}
    # flagship output is rehomed
    assert df.limit(1).collect()[0].subj.startswith(entrymod.REHOME_BASE)


def test_every_query_has_runnable_callable(spark):
    qs = entrymod.queries()
    assert len(qs) >= 30
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)


@pytest.mark.parametrize("name", SAMPLE)
def test_oracle_parity_sample(spark, duck, name):
    qs = entrymod.queries()
    pdf = qs[name](spark, SF_SMOKE).toPandas()
    odf = duck.execute(entrymod.oracle_sql()[name]).df()
    cols = sorted(pdf.columns)
    assert sorted(odf.columns) == cols
    a = pdf[cols].copy()
    b = odf[cols].copy()
    for c in cols:
        if a[c].dtype != b[c].dtype:
            b[c] = b[c].astype(a[c].dtype)
    a = a.fillna("<N>").sort_values(cols).reset_index(drop=True)
    b = b.fillna("<N>").sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) and a.equals(b), name
