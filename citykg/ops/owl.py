"""G5 — OWL consistency checks as anti-joins against a broadcast TBox.

The reference runs these as JUNG/SPARQL tasks dispatched by
InferenceAgent (/root/reference/agents/src/main/java/uk/ac/cam/cares/twa/
cities/agents/InferenceAgent.java:62-92) with one task class per check
(tasks/*CheckingTask.java): class membership/disjointness, property
domain, and value/cardinality restrictions.

Spark-first shape: the TBox (a few hundred axioms at most) is a broadcast
DataFrame; every check is a broadcast join or anti-join against the triple
table — a single scan-side pass per check, no shuffle on the big side, so
the pattern holds unchanged at 10^12 triples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import broadcast

CLASS_PRED = "ocgml:objectClassId"


def cardinality_violations(
    spark: SparkSession, triples: DataFrame, required: list[tuple[str, str]]
) -> DataFrame:
    """Min-cardinality-1 check (ValueRestrictionCheckingTask analog):
    for each (graph, required_pred) axiom, report subjects of that graph
    that carry NO triple with the required predicate.

    Plan: distinct subjects per graph (partial-agg shuffle), broadcast the
    axioms onto them, then LEFT ANTI join against the observed
    (graph, subj, pred) set — the anti-join shuffles on (graph, subj,
    pred), which is near-unique, so no skew.
    """
    axioms = spark.createDataFrame(required, "graph string, required_pred string")
    subjects = triples.select("graph", "subj").distinct()
    expected = subjects.join(broadcast(axioms), "graph")
    observed = triples.select(
        "graph", "subj", F.col("pred").alias("required_pred")
    ).distinct()
    return expected.join(
        observed, ["graph", "subj", "required_pred"], "left_anti"
    ).withColumnRenamed("required_pred", "missing_pred")


def disjoint_class_violations(
    spark: SparkSession, triples: DataFrame, disjoint_pairs: list[tuple[str, str]]
) -> DataFrame:
    """owl:disjointWith check (ClassDisjointnessCheckingTask analog):
    subjects asserted to belong to two disjoint classes. Self-join of the
    (subj, class) projection on subj — class triples are one per subject,
    so the join key is near-unique (no skew); the disjoint axiom table is
    broadcast."""
    axioms = spark.createDataFrame(disjoint_pairs, "class_a string, class_b string")
    cls = triples.where(F.col("pred") == CLASS_PRED).select("subj", F.col("obj").alias("cls"))
    a = cls.withColumnRenamed("cls", "class_a")
    b = cls.withColumnRenamed("cls", "class_b")
    return (
        a.join(b, "subj")
        .join(broadcast(axioms), ["class_a", "class_b"])
        .select("subj", "class_a", "class_b")
    )


def domain_violations(
    spark: SparkSession, triples: DataFrame, domains: list[tuple[str, str]]
) -> DataFrame:
    """rdfs:domain check (PropertyCheckingTask analog): triples whose
    predicate is declared for a different graph/class than the one the
    subject sits in. Broadcast join on pred, filter graph mismatch."""
    axioms = spark.createDataFrame(domains, "pred string, expected_graph string")
    return (
        triples.join(broadcast(axioms), "pred")
        .where(F.col("graph") != F.col("expected_graph"))
        .select("subj", "pred", "graph", "expected_graph")
    )
