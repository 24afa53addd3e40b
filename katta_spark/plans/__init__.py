"""Physical-plan auditing helpers.

The engine adds no custom Catalyst rules (SURVEY.md §4: everything novel
lives in kernels and orchestration) — this package asserts that the plans
Catalyst DOES produce have the shapes we designed for: pushed predicates on
the postings scan, TakeOrderedAndProject for the global top-k merge, no
corpus-sized shuffles on the query path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """Full explain output (the default toString truncates long scan
    nodes, hiding PushedFilters)."""
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def audit_search_plan(hits: DataFrame) -> dict:
    """Inspect a search() result plan for the designed physical shape:

    - the term predicate reaches the parquet scan (int64 th pushdown:
      ``In(th, ...)`` for multi-term or ``EqualTo(th, ...)``/``IsNotNull``
      plus equality for single-term);
    - the global top-k merge is TakeOrderedAndProject (no full sort);
    - at most 2 exchanges (one groups postings by shard; AQE may add a
      coalesce wrapper).
    """
    plan = physical_plan(hits)
    pushed = False
    for line in plan.splitlines():
        if "PushedFilters" in line and "th" in line and "[]" not in line:
            pushed = True
    return {
        "pushed_term_filter": pushed,
        "take_ordered": "TakeOrderedAndProject" in plan,
        "n_exchanges": plan.count("(Exchange") + plan.count("+- Exchange"),
        "plan": plan,
    }
