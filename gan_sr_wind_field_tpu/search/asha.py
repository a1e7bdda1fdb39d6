"""Asynchronous Successive Halving (ASHA) early stopping.

Replacement for Ray Tune's ASHAScheduler as configured by the reference
(param_search.py:298-303: time_attr='it', grace_period=1200,
reduction_factor=3, metric=PSNR max). Pure-python bookkeeping: trials report
(it, metric) at rung boundaries; a trial continues past rung k only if its
metric is in the top 1/reduction_factor of everything seen at that rung —
the asynchronous variant, so the first trials through a rung always continue.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List


@dataclass
class ASHAScheduler:
    max_t: int
    grace_period: int = 1200
    reduction_factor: int = 3
    mode_max: bool = True
    # rung iteration -> list of metrics observed at that rung
    rungs: Dict[int, List[float]] = field(default_factory=dict)

    def rung_iterations(self) -> List[int]:
        rungs, r = [], self.grace_period
        while r < self.max_t:
            rungs.append(r)
            r *= self.reduction_factor
        return rungs

    def report(self, it: int, metric: float) -> bool:
        """Record a rung result. Returns True to continue, False to stop."""
        if it >= self.max_t:
            return False
        vals = self.rungs.setdefault(it, [])
        vals.append(metric)
        if len(vals) < self.reduction_factor:
            return True  # async: early trials promote optimistically
        ranked = sorted(vals, reverse=self.mode_max)
        cutoff_idx = max(len(ranked) // self.reduction_factor, 1) - 1
        cutoff = ranked[cutoff_idx]
        return (metric >= cutoff) if self.mode_max else (metric <= cutoff)
