"""Project text-space alignments onto the graph and reference paths.

The mapper aligns reads against the flat haplotype text; GAM output needs
graph coordinates (Path of Mappings over node visits) and, like giraffe,
reference-path position annotations (refpos) for downstream surjection and
gamcompare (reference: MinimizerMapper refpos annotation,
src/minimizer_mapper.cpp:1215; Path/Mapping/Edit algebra, src/path.cpp).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ..graph.arraygraph import ArrayGraph
from ..index.haplotypes import HaplotypeSet
from ..io.gam import Alignment, Edit, Mapping, Path, Position
from ..ops.traceback import TextAlignment
from ..utils import dna


def text_alignment_to_path(
    haps: HaplotypeSet,
    ta: TextAlignment,
    window_text_start: int,
    read: np.ndarray,
    is_reverse: bool,
) -> Path:
    """Build a graph Path for a text alignment.

    ``ta`` is relative to a window starting at ``window_text_start`` in the
    haplotype text; ``read`` is the oriented read (reverse-complemented
    already when is_reverse). The returned Path is flipped back to the
    original read's strand when is_reverse, following vg's
    reverse_complement_path semantics.
    """
    t0 = window_text_start + ta.text_start
    t1 = window_text_start + ta.text_end
    pieces = haps.walk_interval(t0, t1) if t1 > t0 else []

    graph = haps.graph
    mappings: List[Mapping] = []

    def new_mapping(handle: int, offset: int) -> Mapping:
        m = Mapping(position=Position(
            node_id=int(graph.node_id[handle >> 1]),
            offset=int(offset),
            is_reverse=bool(handle & 1)))
        mappings.append(m)
        return m

    # expand edits into per-piece mappings
    piece_i = 0
    piece_left = pieces[0][2] if pieces else 0
    cur: Optional[Mapping] = None
    if pieces:
        cur = new_mapping(pieces[0][0], pieces[0][1])

    def advance_graph(n: int):
        """Consume n graph bases, splitting mappings at node boundaries.
        Returns list of (mapping, take) chunks."""
        nonlocal piece_i, piece_left, cur
        out = []
        while n > 0:
            if piece_left == 0:
                piece_i += 1
                h, off, ln = pieces[piece_i]
                piece_left = ln
                cur = new_mapping(h, off)
            take = min(n, piece_left)
            out.append((cur, take))
            piece_left -= take
            n -= take
        return out

    # leading soft clip
    edits = list(ta.edits)
    if ta.read_start > 0:
        edits.insert(0, ("I", ta.read_start, read[: ta.read_start]))
    if ta.read_end < len(read):
        edits.append(("I", len(read) - ta.read_end, read[ta.read_end :]))

    if cur is None:
        # fully unaligned: single empty-position softclip path would be
        # invalid; caller treats as unmapped
        return Path()

    for e in edits:
        kind, n = e[0], e[1]
        if kind == "M":
            for mp, take in advance_graph(n):
                mp.edits.append(Edit(from_length=take, to_length=take))
        elif kind == "X":
            seq = e[2]
            done = 0
            for mp, take in advance_graph(n):
                mp.edits.append(Edit(
                    from_length=take, to_length=take,
                    sequence=dna.decode(seq[done : done + take])))
                done += take
        elif kind == "D":
            for mp, take in advance_graph(n):
                mp.edits.append(Edit(from_length=take, to_length=0))
        elif kind == "I":
            seq = e[2]
            if cur is None or not mappings:
                cur = new_mapping(pieces[0][0], pieces[0][1])
            mappings[-1].edits.append(
                Edit(from_length=0, to_length=n, sequence=dna.decode(seq)))

    # merge adjacent edits of same type within each mapping
    for mp in mappings:
        merged: List[Edit] = []
        for ed in mp.edits:
            if (merged and _same_kind(merged[-1], ed)):
                merged[-1].from_length += ed.from_length
                merged[-1].to_length += ed.to_length
                merged[-1].sequence += ed.sequence
            else:
                merged.append(ed)
        mp.edits = merged

    path = Path(mappings=mappings)
    if is_reverse:
        path = reverse_complement_path(graph, path)
    for rank, mp in enumerate(path.mappings, 1):
        mp.rank = rank
    return path


def gapless_path(haps: HaplotypeSet, t0: int, t1: int,
                 mism: np.ndarray, read_str: str, is_rev: bool) -> Path:
    """Fast path builder for full-length gapless alignments (the common
    short-read case): text interval [t0, t1), per-oriented-base mismatch
    mask. For reverse alignments the flipped path is built directly
    (mapping order reversed, handles flipped, offsets mirrored) rather
    than flipping afterwards."""
    graph = haps.graph
    L = t1 - t0
    pieces = haps.walk_interval(t0, t1)
    path = Path()
    if is_rev:
        fm = mism[::-1]
        covered = 0
        spans = []
        for h, off, ln in pieces:
            spans.append((h, off, ln, covered, covered + ln))
            covered += ln
        it = [(h ^ 1,
               graph.node_len_idx(h >> 1) - (off + ln),
               L - e, L - s)
              for h, off, ln, s, e in reversed(spans)]
    else:
        fm = mism
        covered = 0
        it = []
        for h, off, ln in pieces:
            it.append((h, off, covered, covered + ln))
            covered += ln
    # mismatch positions once per read (usually 0-3 of them)
    bad = [int(x) for x in np.flatnonzero(fm)]
    bi = 0
    rank = 0
    for h, off, fs, fe in it:
        rank += 1
        mp = Mapping(position=Position(
            node_id=int(graph.node_id[h >> 1]), offset=int(off),
            is_reverse=bool(h & 1)), rank=rank)
        while bi < len(bad) and bad[bi] < fs:
            bi += 1
        cur = fs
        j = bi
        while j < len(bad) and bad[j] < fe:
            b = bad[j]
            if b > cur:
                mp.edits.append(Edit(from_length=b - cur, to_length=b - cur))
            # merge the run of adjacent mismatches
            e = b + 1
            j += 1
            while j < len(bad) and bad[j] == e and e < fe:
                e += 1
                j += 1
            mp.edits.append(Edit(from_length=e - b, to_length=e - b,
                                 sequence=read_str[b:e]))
            cur = e
        if fe > cur:
            mp.edits.append(Edit(from_length=fe - cur, to_length=fe - cur))
        path.mappings.append(mp)
    return path


def _same_kind(a: Edit, b: Edit) -> bool:
    def kind(e: Edit):
        if e.from_length == e.to_length:
            return "X" if e.sequence else "M"
        return "I" if e.from_length == 0 else "D"
    ka, kb = kind(a), kind(b)
    return ka == kb and ka in ("M",)


def reverse_complement_path(graph: ArrayGraph, path: Path) -> Path:
    """Flip a Path to the other strand (vg: reverse_complement_path,
    src/path.cpp). Mapping order reverses, handles flip, offsets mirror,
    edit order within a mapping reverses, edit sequences reverse-complement."""
    out = Path()
    for mp in reversed(path.mappings):
        node_id = mp.position.node_id
        nlen = graph.node_len(node_id)
        from_len = sum(e.from_length for e in mp.edits)
        new_off = nlen - mp.position.offset - from_len
        nm = Mapping(position=Position(
            node_id=node_id, offset=new_off,
            is_reverse=not mp.position.is_reverse))
        for e in reversed(mp.edits):
            nm.edits.append(Edit(
                from_length=e.from_length, to_length=e.to_length,
                sequence=dna.revcomp_str(e.sequence) if e.sequence else ""))
        out.mappings.append(nm)
    return out


def refpos_walk(haps: HaplotypeSet, graph: ArrayGraph,
                path_pos: "PathPositionIndex", t0: int, t1: int,
                rev: bool) -> List[Position]:
    """annotate_refpos computed in text space: walk the step range covering
    text [t0, t1) in path order (descending when rev, matching the flipped
    Path) and return the first on-path node's reference positions, offsets
    reduced by the graph bases walked. Byte-equivalent to building the Path
    and calling PathPositionIndex.annotate_refpos, without the objects
    (vg: alignment_path_offsets, src/algorithms/alignment_path_offsets.cpp)."""
    stp = haps.step_text_pos
    steps = haps.steps
    si0 = int(np.searchsorted(stp[1:], t0, side="right"))
    si1 = int(np.searchsorted(stp[1:], max(t1 - 1, t0), side="right"))
    order = range(si1, si0 - 1, -1) if rev else range(si0, si1 + 1)
    walked = 0
    for si in order:
        h = int(steps[si])
        seg_lo = max(int(stp[si]), t0)
        seg_hi = min(int(stp[si + 1]), t1)
        flen = seg_hi - seg_lo
        nid = int(graph.node_id[h >> 1])
        nlen = int(graph.seq_start[(h >> 1) + 1] - graph.seq_start[h >> 1])
        off = seg_lo - int(stp[si])
        mrev = bool(h & 1)
        if rev:
            mrev = not mrev
            off = nlen - off - flen
        hits = path_pos.positions_of(nid, off, mrev)
        if hits:
            for hh in hits:
                hh.offset = max(0, hh.offset - walked)
            return hits
        walked += flen
    return []


class PathPositionIndex:
    """Node -> (path, offset, orientation) lookup over reference-sense paths
    (the XG path-position role, reference: deps/xg; used for refpos
    annotation and surjection)."""

    def __init__(self, graph: ArrayGraph, path_names: Optional[List[str]] = None):
        self.graph = graph
        names = path_names if path_names is not None else [
            m.name for m in graph.path_meta]
        # node idx -> list of (path_idx, step_offset_bp, step_is_reverse)
        self.occ: dict[int, List[Tuple[int, int, bool]]] = {}
        self.path_names = []
        for name in names:
            pi = graph.path_index(name)
            self.path_names.append(name)
            hs = graph.path_handles(pi)
            offs = graph.path_step_offsets(pi)
            for s, h in enumerate(hs):
                self.occ.setdefault(int(h) >> 1, []).append(
                    (pi, int(offs[s]), bool(int(h) & 1)))

    def positions_of(self, node_id: int, offset_in_node: int,
                     node_is_reverse: bool) -> List[Position]:
        """All reference-path positions of a graph position (vg's
        nearest_offsets_in_paths for an exact on-node position)."""
        g = self.graph
        idx = g.idx(node_id)
        nlen = g.node_len(node_id)
        out = []
        for pi, step_off, step_rev in self.occ.get(idx, []):
            if node_is_reverse == step_rev:
                off = step_off + offset_in_node
                rev = False
            else:
                off = step_off + (nlen - offset_in_node)
                rev = True
            out.append(Position(
                name=g.path_meta[pi].name, offset=int(off), is_reverse=rev))
        return out

    def annotate_refpos(self, aln: Alignment) -> None:
        """Reference position of the alignment start (vg: alignment_path_
        offsets / nearest_offsets_in_paths, src/algorithms/
        alignment_path_offsets.cpp). If the first mapping's node is off every
        reference path (e.g. an alt-allele node), walk forward through the
        alignment to the first on-path node and subtract the graph bases
        walked."""
        if aln.path is None or not aln.path.mappings:
            return
        walked = 0
        for mp in aln.path.mappings:
            p = mp.position
            hits = self.positions_of(p.node_id, p.offset, p.is_reverse)
            if hits:
                for h in hits:
                    h.offset = max(0, h.offset - walked)
                aln.refpos = hits
                return
            walked += sum(e.from_length for e in mp.edits)
        aln.refpos = []
