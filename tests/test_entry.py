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


def test_kg_ask_both_branches(spark):
    """ASK must answer false when NO witness exists anywhere (the sweep
    only ever sees the true branch on the synth corpus) and true when
    every height qualifies — both through the real query path via the
    threshold override."""
    row_false = entrymod.q_kg_ask(spark, SF_SMOKE, threshold=1e12).collect()
    row_true = entrymod.q_kg_ask(spark, SF_SMOKE, threshold=-1e12).collect()
    assert len(row_false) == 1 and row_false[0]["ask"] is False
    assert len(row_true) == 1 and row_true[0]["ask"] is True
