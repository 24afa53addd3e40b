"""Physical-plan auditing helpers.

The engine adds no custom Catalyst rules (SURVEY.md §4: everything novel
lives in kernels and orchestration) — this package asserts that the plans
Catalyst DOES produce have the shapes we designed for: pushed predicates on
the postings scan, TakeOrderedAndProject for the global top-k merge, no
corpus-sized shuffles on the query path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def audit_search_plan(hits: DataFrame) -> dict:
    """Inspect a search() result plan for the designed physical shape."""
    qe = hits._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    return {
        "pushed_term_filter": "PushedFilters: [" in plan and "In(th" in plan,
        "take_ordered": "TakeOrderedAndProject" in plan,
        "n_exchanges": plan.count("Exchange"),
        "plan": plan,
    }
