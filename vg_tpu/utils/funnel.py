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

import threading
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


@dataclass
class FilterStats:
    """Pass/fail counts for one named filter (reference funnel.pass/fail,
    src/funnel.hpp:27-70; analyzed like giraffe-facts filter-loss
    tables)."""
    stage: str = ""
    n_in: int = 0
    n_passed: int = 0

    @property
    def n_failed(self) -> int:
        return self.n_in - self.n_passed


class Funnel:
    def __init__(self):
        self.stages: Dict[str, StageStats] = {}
        self.order: List[str] = []
        self.filters: Dict[str, FilterStats] = {}
        self.filter_order: List[str] = []
        self._t0 = time.time()
        # stats may arrive from concurrent pipeline threads (multi-seeder
        # prepare_batch); += on shared counters is a read-modify-write
        self._lock = threading.Lock()

    def filter(self, stage: str, name: str, n_in: int, n_passed: int
               ) -> None:
        """Record a filter application: n_in items considered, n_passed
        survived (the funnel's pass/fail provenance — which filter kills
        each lost item)."""
        with self._lock:
            fs = self.filters.get(name)
            if fs is None:
                fs = self.filters[name] = FilterStats(stage=stage)
                self.filter_order.append(name)
            fs.n_in += int(n_in)
            fs.n_passed += int(n_passed)

    def filter_report(self) -> str:
        """giraffe-facts-style filter-loss table."""
        lines = ["filter\tstage\titems_in\tpassed\tfailed\tloss%"]
        for name in self.filter_order:
            fs = self.filters[name]
            loss = 100.0 * fs.n_failed / fs.n_in if fs.n_in else 0.0
            lines.append(f"{name}\t{fs.stage}\t{fs.n_in}\t{fs.n_passed}"
                         f"\t{fs.n_failed}\t{loss:.2f}")
        return "\n".join(lines)

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
        with self._lock:
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
        if self.filters:
            lines.append("")
            lines.append(self.filter_report())
        return "\n".join(lines)

    def annotate(self, aln, per_read_seconds: float) -> None:
        """Attach the per-read provenance annotations vg emits."""
        aln.time_used = per_read_seconds
        for name in self.order:
            st = self.stages[name]
            aln.annotation[f"stage_{name}_time"] = round(st.seconds, 6)
