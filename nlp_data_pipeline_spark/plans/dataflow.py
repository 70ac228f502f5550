"""Declarative dataflow-graph runner — library-side Declarative
Pipelines.

Spark 4.1 ships `pyspark.pipelines` (materialized_view/flow
decorators), but its execution path is Spark-Connect-only (the
graph-element registry activates inside a connect session and the CLI
needs grpcio — see COVERAGE.md probe notes). This module packages the
same PATTERN with zero extra dependencies: datasets are declared as
named stages with explicit dependencies, the RUNNER owns ordering, and
each stage is an ordinary lazy DataFrame transform — so the whole
graph still collapses into Catalyst plans exactly as if it had been
written as one chained expression. Nothing is materialized by the
runner itself; callers decide what to write or collect.

At 100 TB the value is the same as SDP's: the graph is data, so a
pipeline can be validated (cycles, unknown inputs, dead stages) before
a single task runs, stages are unit-testable in isolation, and shared
upstream stages are REUSED as one DataFrame object (one localCheckpoint
there de-duplicates work for every consumer, the round-6 fan-out
lesson).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, Mapping, Sequence

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Stage:
    """One named dataset: `fn(inputs)` gets a dict of the declared
    dependencies' DataFrames and returns this stage's DataFrame."""

    name: str
    fn: Callable[[Mapping[str, DataFrame]], DataFrame]
    deps: Sequence[str] = field(default_factory=tuple)


class DataflowError(ValueError):
    pass


def run_graph(
    stages: Sequence[Stage], sources: Mapping[str, DataFrame]
) -> Dict[str, DataFrame]:
    """Resolve every stage in dependency order; returns name → DataFrame
    (sources included). Raises DataflowError on duplicate names, unknown
    dependencies, or cycles — all BEFORE any Spark work is planned."""
    by_name = {}
    for s in stages:
        if s.name in by_name or s.name in sources:
            raise DataflowError(f"duplicate stage name: {s.name!r}")
        by_name[s.name] = s
    for s in stages:
        for d in s.deps:
            if d not in by_name and d not in sources:
                raise DataflowError(f"stage {s.name!r} depends on unknown {d!r}")

    resolved: Dict[str, DataFrame] = dict(sources)
    visiting: set[str] = set()

    def resolve(name: str) -> DataFrame:
        if name in resolved:
            return resolved[name]
        if name in visiting:
            raise DataflowError(f"dependency cycle through {name!r}")
        visiting.add(name)
        stage = by_name[name]
        out = stage.fn({d: resolve(d) for d in stage.deps})
        if not isinstance(out, DataFrame):
            raise DataflowError(f"stage {name!r} returned {type(out).__name__}")
        visiting.discard(name)
        resolved[name] = out
        return out

    for s in stages:
        resolve(s.name)
    return resolved
