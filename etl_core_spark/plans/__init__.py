"""Job-config → DataFrame-plan compilation.

The reference interprets its component DAG at runtime with one
asyncio worker per component; here the DAG compiles into a single
lazy Catalyst plan per sink, so the optimizer sees the whole job.
"""

from etl_core_spark.plans.config import ComponentConfig, EdgeRef, JobConfig
from etl_core_spark.plans.builder import PlanBuilder, build_job
from etl_core_spark.plans.runner import JobRunner, RunResult

__all__ = [
    "ComponentConfig",
    "EdgeRef",
    "JobConfig",
    "PlanBuilder",
    "build_job",
    "JobRunner",
    "RunResult",
]
