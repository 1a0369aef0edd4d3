"""Partial-order alignment against the graph itself (the gssw role).

Reference: GSSWAligner/Aligner (src/aligner.hpp:32-253) run
Farrar-striped Smith-Waterman generalized to DAGs: per-node score
matrices with inter-node dependencies along edges, then traceback to a
graph CIGAR (create_gssw_graph src/aligner.cpp:30, conversion
:120-300). vg_tpu normally avoids graph DP by aligning against haplotype
text windows; `vg align` parity and reads spelling novel allele
combinations need the real thing.

Design: the graph region is flattened to a base-level DAG — one DP
column per graph base, predecessor columns via node adjacency — and
filled in topological order with affine gaps and full per-cell
backpointers, so traceback is a mechanical walk (no score re-derivation).
Cyclic graphs must be dagified first (reference: src/dagified_graph.*).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..graph.arraygraph import ArrayGraph
from ..io.gam import Alignment, Edit, Mapping, Path, Position
from ..utils import dna
from .align import DEFAULT_SCORING, Scoring

NEG = -(10 ** 8)


def topological_handles(g: ArrayGraph) -> Optional[List[int]]:
    """Kahn's algorithm over handle space; None if cyclic."""
    n = 2 * g.node_count
    indeg = np.zeros(n, dtype=np.int64)
    for h in range(n):
        for c in g.follow(h):
            indeg[int(c)] += 1
    from collections import deque

    q = deque([h for h in range(n) if indeg[h] == 0])
    out = []
    while q:
        h = q.popleft()
        out.append(h)
        for c in g.follow(h):
            indeg[int(c)] -= 1
            if indeg[int(c)] == 0:
                q.append(int(c))
    return out if len(out) == n else None


@dataclass
class _BaseDag:
    codes: np.ndarray          # (V,) uint8 base per vertex
    handle: np.ndarray         # (V,) handle owning the vertex (original
                               #      handle — copies collapse back)
    offset: np.ndarray         # (V,) offset of the base within the handle
    preds: List[List[int]]     # predecessor vertex ids (empty = source)
    is_sink: np.ndarray        # (V,) bool — no successors


def _flatten(g: ArrayGraph) -> _BaseDag:
    order = topological_handles(g)
    if order is None:
        raise ValueError("cyclic graph: dagify before aligning")
    first: Dict[int, int] = {}
    last: Dict[int, int] = {}
    codes: List[int] = []
    handle: List[int] = []
    offset: List[int] = []
    preds: List[List[int]] = []
    for h in order:
        seq = g.handle_seq_codes(h)
        if len(seq) == 0:
            continue
        first[h] = len(codes)
        for o, c in enumerate(seq):
            vid = len(codes)
            codes.append(int(c))
            handle.append(h)
            offset.append(o)
            if o == 0:
                preds.append([last[int(p)] for p in g.predecessors(h)
                              if int(p) in last])
            else:
                preds.append([vid - 1])
        last[h] = len(codes) - 1
    V = len(codes)
    is_sink = np.ones(V, dtype=bool)
    for ps in preds:
        pass
    has_succ = np.zeros(V, dtype=bool)
    for vid, ps in enumerate(preds):
        for p in ps:
            has_succ[p] = True
    return _BaseDag(codes=np.array(codes, np.uint8),
                    handle=np.array(handle, np.int64),
                    offset=np.array(offset, np.int64),
                    preds=preds, is_sink=~has_succ)


def _sccs(n: int, succ) -> List[List[int]]:
    """Tarjan SCCs (iterative) over vertices 0..n-1 with successor fn."""
    index = [-1] * n
    low = [0] * n
    on = [False] * n
    st: List[int] = []
    out: List[List[int]] = []
    counter = [0]
    for root in range(n):
        if index[root] != -1:
            continue
        work = [(root, iter(succ(root)))]
        index[root] = low[root] = counter[0]
        counter[0] += 1
        st.append(root)
        on[root] = True
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                w = int(w)
                if index[w] == -1:
                    index[w] = low[w] = counter[0]
                    counter[0] += 1
                    st.append(w)
                    on[w] = True
                    work.append((w, iter(succ(w))))
                    advanced = True
                    break
                elif on[w]:
                    low[v] = min(low[v], index[w])
            if not advanced:
                work.pop()
                if work:
                    u = work[-1][0]
                    low[u] = min(low[u], low[v])
                if low[v] == index[v]:
                    comp = []
                    while True:
                        x = st.pop()
                        on[x] = False
                        comp.append(x)
                        if x == v:
                            break
                    out.append(comp)
    return out


def _flatten_dagified(g: ArrayGraph, max_walk: int,
                      max_copies: int = 8) -> _BaseDag:
    """Flatten to a base-level DAG, unrolling cyclic strongly-connected
    components with enough copies that any walk of up to ``max_walk``
    bases survives (the dagify overlay role, reference
    src/dagified_graph.*). Copies collapse back to their original handle
    for traceback."""
    n = 2 * g.node_count
    sccs = _sccs(n, lambda h: (int(c) for c in g.follow(h)))
    scc_of = [0] * n
    for si, comp in enumerate(sccs):
        for h in comp:
            scc_of[h] = si
    nontrivial = set()
    for si, comp in enumerate(sccs):
        if len(comp) > 1:
            nontrivial.add(si)
        else:
            h = comp[0]
            if any(int(c) == h for c in g.follow(h)):
                nontrivial.add(si)
    # Tarjan emits SCCs in reverse topological order
    order = list(reversed(range(len(sccs))))

    codes: List[int] = []
    handle: List[int] = []
    offset: List[int] = []
    preds: List[List[int]] = []
    # (handle, copy) -> (first vid, last vid)
    span: Dict[Tuple[int, int], Tuple[int, int]] = {}

    def emit_handle(h: int, copy: int, pred_ends: List[int]) -> None:
        seq = g.handle_seq_codes(h)
        if len(seq) == 0:
            return
        first = len(codes)
        for o, c in enumerate(seq):
            vid = len(codes)
            codes.append(int(c))
            handle.append(h)
            offset.append(o)
            preds.append(pred_ends if o == 0 else [vid - 1])
        span[(h, copy)] = (first, len(codes) - 1)

    for si in order:
        comp = sccs[si]
        if si not in nontrivial:
            h = comp[0]
            pred_ends = []
            for p in g.predecessors(h):
                p = int(p)
                psi = scc_of[p]
                if psi == si:
                    continue
                for k in range(max_copies):
                    if (p, k) in span:
                        pred_ends.append(span[(p, k)][1])
            emit_handle(h, 0, pred_ends)
            continue
        # cyclic SCC: unroll K copies; edges within one copy follow a
        # fixed internal order, edges that go "backward" in that order
        # jump to the next copy
        min_len = max(1, min(len(g.handle_seq_codes(h)) for h in comp))
        K = min(max_copies, max(2, max_walk // min_len + 2))
        pos_in = {h: i for i, h in enumerate(comp)}
        for k in range(K):
            for h in comp:
                pred_ends = []
                for p in g.predecessors(h):
                    p = int(p)
                    if scc_of[p] != si:
                        if k == 0:
                            for kk in range(max_copies):
                                if (p, kk) in span:
                                    pred_ends.append(span[(p, kk)][1])
                    else:
                        if pos_in[p] < pos_in[h]:
                            if (p, k) in span:
                                pred_ends.append(span[(p, k)][1])
                        elif k > 0 and (p, k - 1) in span:
                            pred_ends.append(span[(p, k - 1)][1])
                emit_handle(h, k, pred_ends)
    V = len(codes)
    has_succ = np.zeros(V, dtype=bool)
    for vid, ps in enumerate(preds):
        for p in ps:
            has_succ[p] = True
    return _BaseDag(codes=np.array(codes, np.uint8),
                    handle=np.array(handle, np.int64),
                    offset=np.array(offset, np.int64),
                    preds=preds, is_sink=~has_succ)


def align_to_graph_dagified(g: ArrayGraph, read: np.ndarray,
                            scoring: Scoring = DEFAULT_SCORING,
                            mode: str = "local",
                            max_copies: int = 8) -> Optional[Alignment]:
    """align_to_graph for arbitrary (possibly cyclic) graphs: unrolls
    cycles first (dozeu/gssw over a DagifiedGraph in the reference,
    src/minimizer_mapper.cpp:3319-3424)."""
    dag = _flatten_dagified(g, max_walk=len(read) + 32,
                            max_copies=max_copies)
    return _align_dag(dag, g, read, scoring, mode)


def align_to_graph(g: ArrayGraph, read: np.ndarray,
                   scoring: Scoring = DEFAULT_SCORING,
                   mode: str = "local") -> Optional[Alignment]:
    """POA of read codes against the whole graph.

    mode='local': Smith-Waterman with full-length bonuses and free soft
    clips (vg align semantics). mode='global': read and a full
    source->sink graph walk both consumed (banded_global_aligner role).
    """
    dag = _flatten(g)
    return _align_dag(dag, g, read, scoring, mode)


def _align_dag(dag: _BaseDag, g: ArrayGraph, read: np.ndarray,
               scoring: Scoring = DEFAULT_SCORING,
               mode: str = "local") -> Optional[Alignment]:
    res = _align_dag_native(dag, g, read, scoring, mode)
    if res is not NotImplemented:
        return res
    return _align_dag_numpy(dag, g, read, scoring, mode)


def _align_dag_native(dag: _BaseDag, g: ArrayGraph, read: np.ndarray,
                      scoring: Scoring, mode: str):
    """C++ fill+traceback (native dag_align); NotImplemented when the
    native lib is absent so callers use the numpy twin. ~200x the numpy
    per-vertex loop — this is the giraffe emit path's graph-fallback
    cost, so it is perf-critical (profiled at 40 ms/read in numpy)."""
    from ..native import native_dag_align

    V = len(dag.codes)
    L = len(read)
    if V == 0 or L == 0:
        return None
    out = native_dag_align(dag, read, scoring, mode)
    if out is NotImplemented:
        return NotImplemented
    if out is None:
        return None
    score, matches, sv, sf, st, slo, shi = out
    steps = []
    for k in range(len(sv)):
        seq = dna.decode(read[slo[k] : shi[k]]) if shi[k] > slo[k] else ""
        steps.append((int(sv[k]), Edit(from_length=int(sf[k]),
                                       to_length=int(st[k]),
                                       sequence=seq)))
    path = _group_steps(dag, g, steps)
    aln = Alignment(sequence=dna.decode(read), score=int(score))
    aln.path = path
    aln.identity = matches / L if L else 0.0
    return aln


def _align_dag_numpy(dag: _BaseDag, g: ArrayGraph, read: np.ndarray,
                     scoring: Scoring = DEFAULT_SCORING,
                     mode: str = "local") -> Optional[Alignment]:
    V = len(dag.codes)
    L = len(read)
    if V == 0 or L == 0:
        return None
    m, x = scoring.match, scoring.mismatch
    go, ge = scoring.gap_open, scoring.gap_extend
    fb = scoring.full_length_bonus if mode == "local" else 0
    local = mode == "local"
    rows = np.arange(L + 1)

    H = np.full((V, L + 1), NEG, dtype=np.int64)
    E = np.full((V, L + 1), NEG, dtype=np.int64)
    # backpointers
    hmove = np.zeros((V, L + 1), dtype=np.uint8)   # 0 diag 1 E 2 F 3 stop
    hpred = np.zeros((V, L + 1), dtype=np.int32)   # pred vertex for diag
    eopen = np.zeros((V, L + 1), dtype=bool)
    epred = np.zeros((V, L + 1), dtype=np.int32)
    fopen = np.zeros((V, L + 1), dtype=bool)

    if local:
        Hb = np.full(L + 1, NEG, dtype=np.int64)
        Hb[0] = fb
    else:
        Hb = np.concatenate([[0], -(go + ge * (rows[1:] - 1))])
    Eb = np.full(L + 1, NEG, dtype=np.int64)

    best = (0, -1, 0) if local else (NEG, -1, 0)   # (score, vertex, row)
    sub_m = np.int64(m)
    for v in range(V):
        ps = dag.preds[v]
        if ps:
            Hp = H[ps[0]].copy()
            HpSrc = np.full(L + 1, ps[0], np.int32)
            Ep = E[ps[0]].copy()
            EpSrc = np.full(L + 1, ps[0], np.int32)
            for p in ps[1:]:
                upd = H[p] > Hp
                Hp[upd] = H[p][upd]
                HpSrc[upd] = p
                upd = E[p] > Ep
                Ep[upd] = E[p][upd]
                EpSrc[upd] = p
        else:
            Hp, Ep = Hb, Eb
            HpSrc = np.full(L + 1, -1, np.int32)
            EpSrc = np.full(L + 1, -1, np.int32)

        cb = dag.codes[v]
        sub = np.where((read == cb) & (read < 4), sub_m, np.int64(-x))
        diag = np.full(L + 1, NEG, dtype=np.int64)
        diag[1:] = Hp[:-1] + sub
        Ev = np.maximum(Hp - go, Ep - ge)
        eopen[v] = Hp - go >= Ep - ge
        epred[v] = np.where(eopen[v], HpSrc, EpSrc)
        E[v] = Ev

        Hn = np.maximum(diag, Ev)
        mv = np.where(diag >= Ev, 0, 1).astype(np.uint8)
        if local:
            # fresh starts: clip costs nothing (floor 0); starting at the
            # read's first base earns the left full-length bonus anywhere
            # in the graph (the bonus tracks read ends, not graph ends)
            floor = np.zeros(L + 1, dtype=np.int64)
            floor[0] = scoring.full_length_bonus
            clip = Hn < floor
            Hn = np.maximum(Hn, floor)
            mv = np.where(clip, 3, mv)
        # F within column: prefix-max trick (exact for affine)
        Gk = Hn + ge * rows
        Gmax = np.maximum.accumulate(Gk)
        Fv = np.concatenate([[NEG], Gmax[:-1]]) - go - ge * (rows - 1)
        # fopen[i]: F came from opening at the immediately previous row
        fopen[v] = np.concatenate([[True], (Hn[:-1] - go) >= (Fv[:-1] - ge)])
        Hv = np.maximum(Hn, Fv)
        mv = np.where(Fv > Hn, 2, mv)
        H[v] = Hv
        hmove[v] = mv
        hpred[v] = HpSrc

        if local:
            cell = int(np.argmax(Hv))
            if int(Hv[cell]) > best[0]:
                best = (int(Hv[cell]), v, cell)
            endsc = int(Hv[L]) + fb
            if endsc > best[0]:
                best = (endsc, v, L)
        elif dag.is_sink[v] and int(Hv[L]) > best[0]:
            best = (int(Hv[L]), v, L)

    score, v, i = best
    if v < 0 or (local and score <= 0):
        return None
    path, matches = _traceback(dag, g, read, H, E, hmove, hpred, eopen,
                               epred, fopen, v, i, local)
    aln = Alignment(sequence=dna.decode(read), score=int(score))
    aln.path = path
    aln.identity = matches / L if L else 0.0
    return aln


def _traceback(dag, g, read, H, E, hmove, hpred, eopen, epred, fopen,
               v, i, local) -> Tuple[Path, int]:
    L = len(read)
    steps: List[Tuple[int, Edit]] = []   # (vertex, edit) in reverse order
    matches = 0
    if i < L:
        steps.append((v, Edit(from_length=0, to_length=L - i,
                              sequence=dna.decode(read[i:]))))
    state = "H"
    while v >= 0:
        if state == "H":
            mv = int(hmove[v, i])
            if mv == 3 or (i == 0 and local):
                break
            if mv == 0:
                cb = dag.codes[v]
                if read[i - 1] == cb and read[i - 1] < 4:
                    steps.append((v, Edit(from_length=1, to_length=1)))
                    matches += 1
                else:
                    steps.append((v, Edit(
                        from_length=1, to_length=1,
                        sequence=dna.decode(read[i - 1 : i]))))
                nv = int(hpred[v, i - 1])
                i -= 1
                v = nv
                if v < 0:
                    break
            elif mv == 1:
                state = "E"
            else:
                state = "F"
        elif state == "E":
            steps.append((v, Edit(from_length=1, to_length=0)))
            opn = bool(eopen[v, i])
            nv = int(epred[v, i])
            v = nv
            state = "H" if opn else "E"
            if v < 0:
                break
        else:  # F: consume read base, stay on vertex v
            steps.append((v, Edit(from_length=0, to_length=1,
                                  sequence=dna.decode(read[i - 1 : i]))))
            opn = bool(fopen[v, i])
            i -= 1
            state = "H" if opn else "F"
        if state == "H" and i == 0 and not local:
            # leading read gap already encoded in boundary; stop at source
            if v >= 0 and int(hmove[v, 0]) == 3:
                break
            if v >= 0 and not dag.preds[v]:
                break
    if i > 0:
        steps.append((v if v >= 0 else 0,
                      Edit(from_length=0, to_length=i,
                           sequence=dna.decode(read[:i]))))
    return _group_steps(dag, g, steps), matches


def _group_steps(dag, g, steps) -> Path:
    # group reversed steps into mappings per handle run; a run breaks on
    # handle change OR on a graph-offset discontinuity (dagified copies of
    # one handle collapse back to the same original handle, so a loop
    # traversal revisits it — that must start a fresh mapping)
    path = Path()
    cur_h = None
    cur_edits: List[Edit] = []
    cur_start = 0
    last_off: Optional[int] = None
    for vv, e in reversed(steps):
        h = int(dag.handle[vv])
        off = int(dag.offset[vv])
        brk = (cur_h is None or h != cur_h
               or (e.from_length > 0 and last_off is not None
                   and off != last_off + 1))
        if brk:
            if cur_h is not None:
                path.mappings.append(_mk_mapping(g, cur_h, cur_start, cur_edits))
            cur_h = h
            cur_edits = []
            cur_start = off
            last_off = None
        cur_edits.append(e)
        if e.from_length > 0:
            last_off = off
    if cur_h is not None:
        path.mappings.append(_mk_mapping(g, cur_h, cur_start, cur_edits))
    for rank, mp in enumerate(path.mappings, 1):
        mp.rank = rank
    return path


def _mk_mapping(g, h, start, edits) -> Mapping:
    merged: List[Edit] = []
    for e in edits:
        if merged and _ekind(merged[-1]) == _ekind(e) and _ekind(e) in ("M",):
            merged[-1].from_length += e.from_length
            merged[-1].to_length += e.to_length
        elif merged and _ekind(merged[-1]) == _ekind(e) and e.sequence:
            merged[-1].from_length += e.from_length
            merged[-1].to_length += e.to_length
            merged[-1].sequence += e.sequence
        elif merged and _ekind(merged[-1]) == _ekind(e) == "D":
            merged[-1].from_length += e.from_length
        else:
            merged.append(Edit(from_length=e.from_length,
                               to_length=e.to_length, sequence=e.sequence))
    return Mapping(position=Position(
        node_id=int(g.node_id[h >> 1]), offset=int(start),
        is_reverse=bool(h & 1)), edits=merged)


def _ekind(e: Edit) -> str:
    if e.from_length == e.to_length:
        return "X" if e.sequence else "M"
    return "I" if e.from_length == 0 else "D"
