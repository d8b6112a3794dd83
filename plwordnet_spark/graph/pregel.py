"""Pregel-style driver loop for iterative DataFrame jobs.

Catalyst cannot express iteration (SURVEY.md §4.2); every iterative graph
algorithm here is a Python ``for`` loop where each step is a declarative
DataFrame transformation (join + groupBy gather-scatter), and the runner
owns the three things the loop must get right at scale:

* **lineage truncation** — without it the logical plan doubles per
  iteration and planning time explodes; the runner either
  ``localCheckpoint``s (fast, in-memory) or writes a durable snapshot
  through :class:`~plwordnet_spark.storage.snapshots.SnapshotStore`
  every ``checkpoint_interval`` iterations,
* **convergence** — a caller-provided scalar delta, compared to ``tol``
  (the only driver-side values collected per iteration; everything else
  stays distributed),
* **metrics + resume** — per-iteration metrics land in the snapshot
  manifest; ``resume()`` restarts from the latest committed snapshot
  (north rule: "resumable from checkpoint with per-partition lineage +
  metrics").

The reference's analog is the resumable skip-already-done batch pattern
(plwordnet_ml/.../wrappers.py:292-304); generalized here to synchronous
iteration.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from plwordnet_spark.storage.snapshots import SnapshotStore

__all__ = ["PregelRunner", "PregelResult"]


@dataclass
class PregelResult:
    state: DataFrame
    iterations: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


class PregelRunner:
    """Run ``state = step(state)`` to convergence with checkpointing.

    ``step``: DataFrame -> DataFrame (pure transformation, no actions).
    ``delta``: (old, new) -> float; convergence when ``delta < tol``.
    When ``checkpoint_dir`` is set, durable snapshots enable resume;
    otherwise ``localCheckpoint`` truncates lineage in memory.
    """

    def __init__(
        self,
        spark: SparkSession,
        max_iterations: int = 100,
        tol: float | None = None,
        checkpoint_dir: str | None = None,
        checkpoint_interval: int = 5,
        check_interval: int = 1,
    ):
        self.spark = spark
        self.max_iterations = max_iterations
        self.tol = tol
        self.checkpoint_interval = checkpoint_interval
        # convergence-check cadence: >1 skips the delta action on
        # intermediate iterations (the job may overshoot convergence by
        # up to check_interval-1 iterations — monotone algorithms only)
        self.check_interval = check_interval
        self.store = (
            SnapshotStore(spark, checkpoint_dir) if checkpoint_dir else None
        )

    def _truncate(self, df: DataFrame, iteration: int, metrics: dict) -> DataFrame:
        if self.store and (
            iteration % self.checkpoint_interval == 0
            or iteration == self.max_iterations
        ):
            return self.store.write(df, iteration, metrics)
        # eager localCheckpoint: cuts lineage and materializes without disk
        return df.localCheckpoint(eager=True)

    def run(
        self,
        initial: DataFrame,
        step: Callable[[DataFrame], DataFrame],
        delta: Callable[[DataFrame, DataFrame], float] | None = None,
        start_iteration: int = 0,
    ) -> PregelResult:
        state = initial.localCheckpoint(eager=True)
        metrics: list[dict] = []
        converged = False
        iteration = start_iteration
        for iteration in range(start_iteration + 1, self.max_iterations + 1):
            started = time.time()
            # truncate BEFORE measuring delta: the delta action then reads
            # the materialized state instead of re-executing the step plan
            new_state = self._truncate(step(state), iteration, {})
            check_now = delta is not None and (
                iteration % self.check_interval == 0
                or iteration == self.max_iterations
            )
            step_delta = delta(state, new_state) if check_now else None
            entry = {
                "iteration": iteration,
                "delta": step_delta,
                "seconds": time.time() - started,
            }
            if self.store:
                self.store.update_metrics(iteration, entry)
            state.unpersist()
            state = new_state
            metrics.append(entry)
            if self.tol is not None and step_delta is not None and step_delta < self.tol:
                converged = True
                break
        if self.store:
            # final durable snapshot so resume() always sees the end state
            last = self.store.manifest()[-1] if self.store.manifest() else None
            if last is None or last["iteration"] != iteration:
                state = self.store.write(state, iteration, metrics[-1] if metrics else {})
        return PregelResult(state=state, iterations=iteration, converged=converged, metrics=metrics)

    def resume(
        self,
        step: Callable[[DataFrame], DataFrame],
        delta: Callable[[DataFrame, DataFrame], float] | None = None,
    ) -> PregelResult | None:
        """Continue from the latest committed snapshot (None if empty)."""
        if not self.store:
            raise ValueError("resume requires a checkpoint_dir")
        latest = self.store.latest()
        if latest is None:
            return None
        state, entry = latest
        return self.run(state, step, delta, start_iteration=entry["iteration"])
