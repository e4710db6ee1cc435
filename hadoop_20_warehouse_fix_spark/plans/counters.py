"""Counters (SURVEY.md §2.4): the reference aggregated framework + user
counters at the JobTracker (``M/Counters.java``, MAP_INPUT_RECORDS /
SPILLED_RECORDS / CPU_MS — ``M/Task_Counter.properties:1-25``). Spark's
analog for user metrics is ``df.observe``: named aggregate expressions
evaluated as the data flows, no extra pass, collected on the driver
after the action — exactly a counter's cost model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation


def observed(df: DataFrame, name: str = "counters", **metrics) -> tuple[DataFrame, Observation]:
    """Attach named counter expressions to a plan.

    >>> df, obs = observed(df, rows=F.count(F.lit(1)), bad=F.sum(bad_flag))
    >>> df.write...   # run an action
    >>> obs.get       # {'rows': ..., 'bad': ...}

    Default metric (no kwargs): input record count — MAP_INPUT_RECORDS.
    """
    if not metrics:
        metrics = {"input_records": F.count(F.lit(1))}
    obs = Observation(name)
    exprs = [expr.alias(alias) for alias, expr in metrics.items()]
    return df.observe(obs, *exprs), obs
