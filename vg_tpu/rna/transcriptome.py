"""Transcriptome projection (vg rna).

Reference: Transcriptome (src/transcriptome.cpp, SURVEY.md §2.1) projects
GTF/GFF transcripts onto the graph as paths — chopping nodes at exon
boundaries — and can emit haplotype-specific transcripts and a
pantranscriptome for rpvg. This implementation covers reference
transcripts: node chopping via graph.ops.split_nodes, one embedded path
per transcript (reverse-strand transcripts walk flipped handles), plus
transcript FASTA and the info table (vg rna -n equivalent).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

from ..graph.arraygraph import SENSE_GENERIC, ArrayGraph, GraphBuilder
from ..graph.ops import split_nodes
from ..io.gtf import Transcript
from ..utils import dna


@dataclass
class ProjectedTranscript:
    transcript_id: str
    path_name: str
    length: int
    n_exons: int
    strand: str


class Transcriptome:
    def __init__(self, graph: ArrayGraph):
        self.graph = graph

    def project(self, transcripts: Sequence[Transcript]
                ) -> Tuple[ArrayGraph, List[ProjectedTranscript]]:
        g = self.graph
        # 1. collect exon-boundary cuts per node along each chromosome path
        cuts: Dict[int, set] = {}
        per_chrom: Dict[str, List[Transcript]] = {}
        for t in transcripts:
            if not g.has_path(t.chrom):
                continue
            per_chrom.setdefault(t.chrom, []).append(t)
        step_cache = {}
        for chrom, ts in per_chrom.items():
            pi = g.path_index(chrom)
            hs = g.path_handles(pi)
            offs = g.path_step_offsets(pi)
            step_cache[chrom] = (hs, offs)
            import numpy as np

            for t in ts:
                for s, e in t.exons:
                    for bp in (s, e):
                        si = int(np.searchsorted(offs[1:], bp, side="right"))
                        if si >= len(hs):
                            continue
                        h = int(hs[si])
                        within = bp - int(offs[si])
                        nlen = int(offs[si + 1] - offs[si])
                        if 0 < within < nlen:
                            fwd_off = within if not (h & 1) else nlen - within
                            cuts.setdefault(int(g.node_id[h >> 1]),
                                            set()).add(fwd_off)
        g2, pieces = split_nodes(g, {k: sorted(v) for k, v in cuts.items()})

        # 2. walk each transcript's exons along the chopped path
        b_paths: List[ProjectedTranscript] = []
        builder_steps: Dict[str, List[Tuple[int, bool]]] = {}
        for chrom, ts in per_chrom.items():
            pi2 = g2.path_index(chrom)
            hs2 = g2.path_handles(pi2)
            offs2 = g2.path_step_offsets(pi2)
            import numpy as np

            for t in ts:
                steps: List[Tuple[int, bool]] = []
                ok = True
                length = 0
                for s, e in t.exons:
                    i0 = int(np.searchsorted(offs2[1:], s, side="right"))
                    cur = s
                    while cur < e and i0 < len(hs2):
                        if int(offs2[i0]) != cur:
                            ok = False
                            break
                        h = int(hs2[i0])
                        steps.append((int(g2.node_id[h >> 1]), bool(h & 1)))
                        cur = int(offs2[i0 + 1])
                        i0 += 1
                    length += e - s
                    if not ok:
                        break
                if not ok or not steps:
                    continue
                if t.strand == "-":
                    steps = [(nid, not rev) for nid, rev in reversed(steps)]
                builder_steps[t.transcript_id] = steps
                b_paths.append(ProjectedTranscript(
                    transcript_id=t.transcript_id,
                    path_name=t.transcript_id, length=length,
                    n_exons=len(t.exons), strand=t.strand))

        # 3. rebuild with transcript paths embedded
        b = GraphBuilder()
        for i, nid in enumerate(g2.node_id):
            b.add_node(g2.seq[g2.seq_start[i] : g2.seq_start[i + 1]],
                       node_id=int(nid))
        for f_id, f_rev, t_id, t_rev in g2.iter_edges():
            b.add_edge(f_id, t_id, f_rev, t_rev)
        for pi3, meta in enumerate(g2.path_meta):
            steps = [(int(g2.node_id[int(h) >> 1]), bool(int(h) & 1))
                     for h in g2.path_handles(pi3)]
            b.add_path(meta.name, steps, meta.sense, meta.sample,
                       meta.locus, meta.haplotype, meta.is_circular)
        for pt in b_paths:
            steps = builder_steps[pt.transcript_id]
            # splice-junction edges between consecutive exons (vg rna adds
            # novel splice edges to the graph, src/transcriptome.cpp)
            for (n1, r1), (n2, r2) in zip(steps[:-1], steps[1:]):
                b.add_edge(n1, n2, r1, r2)
            b.add_path(pt.path_name, steps, SENSE_GENERIC,
                       locus=pt.transcript_id)
        g3 = b.freeze()
        return g3, b_paths

    @staticmethod
    def transcript_fasta(g: ArrayGraph,
                         projected: Sequence[ProjectedTranscript]) -> str:
        out = []
        for pt in projected:
            seq = g.path_seq(pt.path_name)
            out.append(f">{pt.transcript_id}")
            for i in range(0, len(seq), 80):
                out.append(seq[i : i + 80])
        return "\n".join(out) + "\n"
