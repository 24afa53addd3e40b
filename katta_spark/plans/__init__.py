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


def _subtree_lines(plan: str, anchor: str) -> list[str]:
    """Lines of the plan subtree rooted at the first line containing
    ``anchor`` (simple-mode tree: children are more-indented lines)."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if anchor in line:
            depth = len(line) - len(line.lstrip(" :+-"))
            out = [line]
            for nxt in lines[i + 1 :]:
                if not nxt.strip():
                    break
                nd = len(nxt) - len(nxt.lstrip(" :+-"))
                if nd <= depth:
                    break
                out.append(nxt)
            return out
    return []


def audit_details_plan(details) -> dict:
    """get_details must broadcast the TOP-K, not the corpus: the plan is a
    BroadcastHashJoin whose BroadcastExchange subtree contains the search
    kernel (FlatMapGroupsInPandas), and no sort-merge join of the corpus."""
    plan = physical_plan(details, mode="simple")
    bcast_sub = "\n".join(_subtree_lines(plan, "BroadcastExchange"))
    return {
        "broadcast_join": "BroadcastHashJoin" in plan,
        "no_smj": "SortMergeJoin" not in plan,
        "topk_is_build_side": "FlatMapGroupsInPandas" in bcast_sub,
        "plan": plan,
    }


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan in the plan — the column-pruning
    audit: a 2-column projection must not read 14 columns, and the
    positions blobs must only be fetched by phrase queries."""
    plan = physical_plan(df)
    out = []
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            out.append(line.split("ReadSchema:", 1)[1].strip())
    return out


def audit_sorted_search_plan(out) -> dict:
    """Field-sorted search must not run a global score sort: the only
    global ordering is the TakeOrderedAndProject on the sort fields, and
    nothing is funneled through a single partition."""
    plan = physical_plan(out, mode="simple")
    return {
        "take_ordered": "TakeOrderedAndProject" in plan,
        "no_single_partition": "Exchange SinglePartition" not in plan,
        "no_global_limit": "GlobalLimit 2147483647" not in plan,
        "plan": plan,
    }
