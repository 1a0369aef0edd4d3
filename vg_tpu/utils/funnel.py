"""Funnel: per-stage provenance instrumentation for the mapping pipeline.

Reference: vg's Funnel (src/funnel.hpp:27-70) records items introduced/
filtered per named stage per read plus wall time, surfaced as GAM
annotations (stage_*, time_used) under --track-provenance and analyzed by
scripts/giraffe-facts.py. vg_tpu maps batches, so the funnel records
per-batch stage timings and item counts, and each emitted alignment gets
the per-read provenance annotations the reference's tests look for
(test/t/50_vg_giraffe.t:47 asserts time_used exists).
"""
from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class StageStats:
    seconds: float = 0.0
    items_in: int = 0
    items_out: int = 0
    calls: int = 0


class Funnel:
    def __init__(self):
        self.stages: Dict[str, StageStats] = {}
        self.order: List[str] = []
        self._t0 = time.time()

    @contextmanager
    def stage(self, name: str, items_in: int = 0, items_out: int = 0):
        st = self.stages.get(name)
        if st is None:
            st = self.stages[name] = StageStats()
            self.order.append(name)
        t0 = time.time()
        try:
            yield st
        finally:
            st.seconds += time.time() - t0
            st.items_in += items_in
            st.items_out += items_out
            st.calls += 1

    def record(self, name: str, seconds: float, items_in: int = 0,
               items_out: int = 0) -> None:
        st = self.stages.get(name)
        if st is None:
            st = self.stages[name] = StageStats()
            self.order.append(name)
        st.seconds += seconds
        st.items_in += items_in
        st.items_out += items_out
        st.calls += 1

    def total_seconds(self) -> float:
        return time.time() - self._t0

    def report(self) -> str:
        lines = ["stage\tseconds\titems_in\titems_out\tcalls"]
        for name in self.order:
            st = self.stages[name]
            lines.append(f"{name}\t{st.seconds:.4f}\t{st.items_in}"
                         f"\t{st.items_out}\t{st.calls}")
        return "\n".join(lines)

    def annotate(self, aln, per_read_seconds: float) -> None:
        """Attach the per-read provenance annotations vg emits."""
        aln.time_used = per_read_seconds
        for name in self.order:
            st = self.stages[name]
            aln.annotation[f"stage_{name}_time"] = round(st.seconds, 6)
