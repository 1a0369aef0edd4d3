"""Graph editing toolbox (vg mod / ids / chunk / combine / mask /
circularize / prune equivalents — reference: src/subcommand/{mod,ids,
chunk,combine,mask,circularize,prune}_main.cpp, SURVEY.md §2.1 "Graph ops
toolbox").

All operations rebuild through GraphBuilder: mutation is a host-side
affair that freezes back into the immutable ArrayGraph (SURVEY.md §7
design stance)."""
from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Set, Tuple

import numpy as np

from ..utils import dna
from .arraygraph import ArrayGraph, GraphBuilder, PathMeta


def _builder_from(g: ArrayGraph, node_filter=None, id_map=None,
                  trim_paths: bool = False) -> GraphBuilder:
    """Copy a graph into a builder, optionally filtering/renaming nodes.
    With trim_paths, paths crossing removed nodes keep their longest
    contained fragments (named `name[offset]` like vg chunk's subpaths)."""
    b = GraphBuilder()
    keep = set()
    for i, nid in enumerate(g.node_id):
        nid = int(nid)
        if node_filter is not None and not node_filter(nid):
            continue
        new_id = id_map[nid] if id_map else nid
        b.add_node(g.seq[g.seq_start[i] : g.seq_start[i + 1]], node_id=new_id)
        keep.add(nid)
    for f_id, f_rev, t_id, t_rev in g.iter_edges():
        if f_id in keep and t_id in keep:
            b.add_edge(id_map[f_id] if id_map else f_id,
                       id_map[t_id] if id_map else t_id, f_rev, t_rev)
    for pi, meta in enumerate(g.path_meta):
        hs = g.path_handles(pi)
        offs = g.path_step_offsets(pi)
        runs: List[Tuple[int, List[Tuple[int, bool]]]] = []
        cur: List[Tuple[int, bool]] = []
        cur_off = 0
        for si, h in enumerate(hs):
            nid = int(g.node_id[int(h) >> 1])
            if nid in keep:
                if not cur:
                    cur_off = int(offs[si])
                cur.append((id_map[nid] if id_map else nid, bool(int(h) & 1)))
            elif cur:
                runs.append((cur_off, cur))
                cur = []
        if cur:
            runs.append((cur_off, cur))
        if len(runs) == 1 and len(runs[0][1]) == len(hs):
            b.add_path(meta.name, runs[0][1], meta.sense, meta.sample,
                       meta.locus, meta.haplotype, meta.is_circular)
        elif trim_paths:
            for off, steps in runs:
                name = meta.name if off == 0 and len(runs) == 1 \
                    else f"{meta.name}[{off}]"
                b.add_path(name, steps, meta.sense, meta.sample,
                           meta.locus, meta.haplotype, False)
    return b


def compact_ids(g: ArrayGraph, start: int = 1) -> Tuple[ArrayGraph, Dict[int, int]]:
    """Renumber nodes to a dense range (vg ids -c)."""
    id_map = {int(nid): start + i for i, nid in enumerate(g.node_id)}
    return _builder_from(g, id_map=id_map).freeze(), id_map


def increment_ids(g: ArrayGraph, increment: int) -> ArrayGraph:
    """Shift all node ids (vg ids -i)."""
    id_map = {int(nid): int(nid) + increment for nid in g.node_id}
    return _builder_from(g, id_map=id_map).freeze()


def combine(graphs: Sequence[ArrayGraph]) -> ArrayGraph:
    """Union of graphs with id-space joining (vg combine)."""
    b = GraphBuilder()
    offset = 0
    for g in graphs:
        id_map = {int(nid): int(nid) + offset for nid in g.node_id}
        for i, nid in enumerate(g.node_id):
            b.add_node(g.seq[g.seq_start[i] : g.seq_start[i + 1]],
                       node_id=id_map[int(nid)])
        for f_id, f_rev, t_id, t_rev in g.iter_edges():
            b.add_edge(id_map[f_id], id_map[t_id], f_rev, t_rev)
        for pi, meta in enumerate(g.path_meta):
            steps = [(id_map[int(g.node_id[int(h) >> 1])], bool(int(h) & 1))
                     for h in g.path_handles(pi)]
            b.add_path(meta.name, steps, meta.sense, meta.sample,
                       meta.locus, meta.haplotype, meta.is_circular)
        offset = max(id_map.values()) if id_map else offset
    return b.freeze()


def local_subgraph(g: ArrayGraph, node_ids: Iterable[int]) -> ArrayGraph:
    """Node-induced subgraph WITHOUT paths, touching only the selected
    nodes' adjacency rows — O(|sub|) where subgraph() is O(|graph|).
    The mapper's per-read graph-fallback extraction needs exactly this
    (the reference extracts via extract_containing_graph,
    src/algorithms/extract_containing_graph.cpp, which is likewise
    local)."""
    seed = {int(n) for n in node_ids}
    b = GraphBuilder()
    for nid in sorted(seed):
        i = g.idx(nid)
        b.add_node(g.seq[g.seq_start[i] : g.seq_start[i + 1]], node_id=nid)
    for nid in seed:
        h = g.idx(nid) * 2
        for hh in (h, h + 1):
            for nxt in g.follow(hh):
                nxt = int(nxt)
                t_id = int(g.node_id[nxt >> 1])
                if t_id in seed:
                    b.add_edge(nid, t_id, bool(hh & 1), bool(nxt & 1))
    return b.freeze()


def subgraph(g: ArrayGraph, node_ids: Iterable[int],
             context_steps: int = 0) -> ArrayGraph:
    """Node-induced subgraph with optional context expansion
    (vg find -n/-c, vg chunk core)."""
    seed = {int(n) for n in node_ids}
    frontier = set(seed)
    for _ in range(context_steps):
        nxt = set()
        for nid in frontier:
            h = g.handle(nid)
            for c in g.follow(h):
                nxt.add(int(g.node_id[int(c) >> 1]))
            for c in g.follow(h ^ 1):
                nxt.add(int(g.node_id[int(c) >> 1]))
        nxt -= seed
        seed |= nxt
        frontier = nxt
    return _builder_from(g, node_filter=lambda n: n in seed,
                         trim_paths=True).freeze()


def chunk_path(g: ArrayGraph, path_name: str, start: int, end: int,
               context_steps: int = 1) -> ArrayGraph:
    """Subgraph covering a path interval [start, end) in bp (vg chunk -p)."""
    pi = g.path_index(path_name)
    hs = g.path_handles(pi)
    offs = g.path_step_offsets(pi)
    sel = []
    for i, h in enumerate(hs):
        if offs[i + 1] > start and offs[i] < end:
            sel.append(int(g.node_id[int(h) >> 1]))
    return subgraph(g, sel, context_steps)


def mask_path_interval(g: ArrayGraph, path_name: str, start: int,
                       end: int) -> ArrayGraph:
    """Replace the bases of a path interval with N (vg mask with a BED)."""
    pi = g.path_index(path_name)
    hs = g.path_handles(pi)
    offs = g.path_step_offsets(pi)
    b = _builder_from(g)
    for i, h in enumerate(hs):
        h = int(h)
        s, e = int(offs[i]), int(offs[i + 1])
        if e <= start or s >= end:
            continue
        nid = int(g.node_id[h >> 1])
        codes = b.nodes[nid].copy()
        a = max(start - s, 0)
        z = min(end - s, e - s)
        if h & 1:   # interval given in path orientation
            ln = len(codes)
            a, z = ln - z, ln - a
        codes[a:z] = dna.CODE_N
        b.nodes[nid] = codes
    return b.freeze()


def circularize(g: ArrayGraph, path_name: str) -> ArrayGraph:
    """Add the wrap-around edge and mark the path circular (vg circularize)."""
    pi = g.path_index(path_name)
    hs = g.path_handles(pi)
    b = _builder_from(g)
    if len(hs):
        h1, h0 = int(hs[-1]), int(hs[0])
        b.add_edge(int(g.node_id[h1 >> 1]), int(g.node_id[h0 >> 1]),
                   bool(h1 & 1), bool(h0 & 1))
    for meta, steps in b.paths:
        if meta.name == path_name:
            meta.is_circular = True
    return b.freeze()


def keep_paths(g: ArrayGraph, names: Sequence[str]) -> ArrayGraph:
    """Drop all paths except `names` (vg mod -r / paths --retain)."""
    want = set(names)
    b = _builder_from(g)
    b.paths = [(m, s) for m, s in b.paths if m.name in want]
    return b.freeze()


def drop_paths(g: ArrayGraph, names: Sequence[str]) -> ArrayGraph:
    """Remove the named paths (vg paths -d)."""
    drop = set(names)
    b = _builder_from(g)
    b.paths = [(m, s) for m, s in b.paths if m.name not in drop]
    return b.freeze()


def prune_complex(g: ArrayGraph, max_degree: int = 8) -> ArrayGraph:
    """Remove edges at nodes whose degree exceeds the limit, then drop
    isolated non-path nodes (vg prune -M flavor: cuts hairballs before
    kmer indexing)."""
    deg = np.zeros(g.node_count, dtype=np.int64)
    for i in range(g.node_count):
        deg[i] = g.degree_out(2 * i) + g.degree_out(2 * i + 1)
    bad = {int(g.node_id[i]) for i in np.nonzero(deg > max_degree)[0]}
    on_path = {int(g.node_id[int(h) >> 1])
               for pi in range(g.path_count)
               for h in g.path_handles(pi)}
    b = GraphBuilder()
    for i, nid in enumerate(g.node_id):
        b.add_node(g.seq[g.seq_start[i] : g.seq_start[i + 1]], node_id=int(nid))
    for f_id, f_rev, t_id, t_rev in g.iter_edges():
        if (f_id in bad or t_id in bad) and not (f_id in on_path and t_id in on_path):
            continue
        b.add_edge(f_id, t_id, f_rev, t_rev)
    for pi, meta in enumerate(g.path_meta):
        steps = [(int(g.node_id[int(h) >> 1]), bool(int(h) & 1))
                 for h in g.path_handles(pi)]
        b.add_path(meta.name, steps, meta.sense, meta.sample, meta.locus,
                   meta.haplotype, meta.is_circular)
    return b.freeze()


def split_nodes(g: ArrayGraph, cuts: Dict[int, Sequence[int]]
                ) -> Tuple[ArrayGraph, Dict[int, List[Tuple[int, int]]]]:
    """Split nodes at the given forward-strand offsets (vg mod -X /
    augment's breakpoint phase). Returns (new graph, translation:
    old id -> [(new id, offset)] ascending)."""
    b = GraphBuilder()
    next_id = int(g.node_id[-1]) + 1 if g.node_count else 1
    pieces: Dict[int, List[Tuple[int, int]]] = {}
    for i, nid in enumerate(g.node_id):
        nid = int(nid)
        codes = g.seq[g.seq_start[i] : g.seq_start[i + 1]]
        offs = sorted({c for c in cuts.get(nid, ()) if 0 < c < len(codes)})
        if not offs:
            b.add_node(codes, node_id=nid)
            pieces[nid] = [(nid, 0)]
            continue
        bounds = [0] + offs + [len(codes)]
        parts = []
        for a, z in zip(bounds[:-1], bounds[1:]):
            pid = nid if a == 0 else next_id
            if a != 0:
                next_id += 1
            b.add_node(codes[a:z], node_id=pid)
            parts.append((pid, a))
        pieces[nid] = parts
        for (p1, _), (p2, _) in zip(parts[:-1], parts[1:]):
            b.add_edge(p1, p2)
    for f_id, f_rev, t_id, t_rev in g.iter_edges():
        fp, tp = pieces[f_id], pieces[t_id]
        f_new = fp[0][0] if f_rev else fp[-1][0]
        t_new = tp[-1][0] if t_rev else tp[0][0]
        b.add_edge(f_new, t_new, f_rev, t_rev)
    for pi, meta in enumerate(g.path_meta):
        steps = []
        for h in g.path_handles(pi):
            nid = int(g.node_id[int(h) >> 1])
            rev = bool(int(h) & 1)
            parts = pieces[nid] if not rev else list(reversed(pieces[nid]))
            steps.extend((p, rev) for p, _ in parts)
        b.add_path(meta.name, steps, meta.sense, meta.sample, meta.locus,
                   meta.haplotype, meta.is_circular)
    return b.freeze(), pieces


def clip_regions(g: ArrayGraph, ref_path: str,
                 bed_intervals=None, pack=None, min_depth: float = 0.0,
                 ) -> ArrayGraph:
    """vg clip role (reference src/clip.cpp): remove non-reference
    variation. With ``bed_intervals`` ([(start, end) on ref_path)),
    off-path nodes whose snarl projection falls inside an interval are
    deleted; with ``pack`` + ``min_depth``, off-path nodes with average
    coverage below min_depth are deleted. The reference path itself is
    never clipped."""
    pi = g.path_index(ref_path)
    on_ref = set(int(h) >> 1 for h in g.path_handles(pi))
    offs = g.path_step_offsets(pi)
    handles = g.path_handles(pi)

    # approximate ref projection per node via BFS from ref-path nodes
    proj = {}
    frontier = []
    for i, h in enumerate(handles):
        nid = int(h) >> 1
        if nid not in proj:
            proj[nid] = int(offs[i])
            frontier.append(nid)
    qi = 0
    while qi < len(frontier):
        nid = frontier[qi]
        qi += 1
        for orient in (0, 1):
            h = nid * 2 + orient
            for nxt in g.follow(h):
                nn = int(nxt) >> 1
                if nn not in proj:
                    proj[nn] = proj[nid]
                    frontier.append(nn)

    doomed = set()
    node_ids = [int(v) for v in g.node_id]
    if bed_intervals:
        for idx, nid in enumerate(node_ids):
            if idx in on_ref or idx not in proj:
                continue
            p = proj[idx]
            if any(a <= p < b for (a, b) in bed_intervals):
                doomed.add(nid)
    if pack is not None and min_depth > 0:
        navg = pack.node_avg_all()
        for idx, nid in enumerate(node_ids):
            if idx in on_ref:
                continue
            if float(navg[idx]) < min_depth:
                doomed.add(nid)
    keep = [nid for idx, nid in enumerate(node_ids) if nid not in doomed]
    return subgraph(g, keep)


def concat(graphs: Sequence[ArrayGraph]) -> ArrayGraph:
    """Serial concatenation (vg concat role): graphs joined head-to-tail
    — every forward tail (no forward out-edge) of graph i gets an edge to
    every forward head (no forward in-edge) of graph i+1. Node ids are
    offset to stay unique; same-name paths are concatenated in order."""
    b = GraphBuilder()
    offset = 0
    prev_tails: List[int] = []
    path_steps: dict = {}
    path_meta: dict = {}
    for g in graphs:
        id_map = {}
        for i in range(g.node_count):
            nid = int(g.node_id[i])
            new_id = nid + offset
            id_map[nid] = new_id
            b.add_node(g.seq[g.seq_start[i] : g.seq_start[i + 1]],
                       node_id=new_id)
        for f_id, f_rev, t_id, t_rev in g.iter_edges():
            b.add_edge(id_map[f_id], id_map[t_id], bool(f_rev), bool(t_rev))
        # heads: no forward in-edge; tails: no forward out-edge
        heads, tails = [], []
        for i in range(g.node_count):
            if len(g.follow(i * 2 + 1)) == 0:     # nothing precedes fwd
                heads.append(id_map[int(g.node_id[i])])
            if len(g.follow(i * 2)) == 0:         # nothing follows fwd
                tails.append(id_map[int(g.node_id[i])])
        for t in prev_tails:
            for h in heads:
                b.add_edge(t, h)
        prev_tails = tails
        for pi, meta in enumerate(g.path_meta):
            steps = [(id_map[int(g.node_id[int(h) >> 1])], bool(int(h) & 1))
                     for h in g.path_handles(pi)]
            path_steps.setdefault(meta.name, []).extend(steps)
            path_meta.setdefault(meta.name, meta)
        offset += int(g.node_id[-1]) if g.node_count else 0
    for name, steps in path_steps.items():
        m = path_meta[name]
        b.add_path(name, steps, m.sense, m.sample, m.locus, m.haplotype,
                   m.is_circular)
    return b.freeze()
