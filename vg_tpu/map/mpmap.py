"""Multipath mapping (vg mpmap role, simplified).

Reference: MultipathMapper (src/multipath_mapper.cpp) emits alignment
DAGs (GAMP) that preserve ambiguity — alternative local alignments as
alternative subpaths. This implementation builds the multipath record
from the giraffe engine's scored candidate set: the winner plus each
distinct runner-up placement becomes an alternative entry subpath, so
downstream tools (rpvg-style quantifiers) see the ambiguity structure.
Within-alignment branch points (the reference's spliced/RNA machinery)
are future work — mpmap -n DNA mode semantics are what this covers.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..io.fastq import Read
from ..io.gamp import MultipathAlignment, Subpath
from .giraffe import GiraffeMapper
from .mapq import mapq_exact


class MultipathMapper:
    def __init__(self, mapper: GiraffeMapper, max_alternates: int = 4):
        self.mapper = mapper
        self.max_alternates = max_alternates

    def map_batch(self, reads: Sequence[Read]) -> List[MultipathAlignment]:
        m = self.mapper
        sb = m.score_reads(reads)
        out: List[MultipathAlignment] = []
        for i, r in enumerate(reads):
            scores = sb.scores[i]
            valid = sb.cand_valid[i] & (scores > 0)
            mp = MultipathAlignment(name=r.name, sequence=r.sequence)
            if not valid.any():
                out.append(mp)
                continue
            order = np.argsort(-np.where(valid, scores, -1))
            js = [int(j) for j in order if valid[j]][: self.max_alternates]
            vs = scores[valid].astype(np.float64)
            which = int(np.nonzero(np.nonzero(valid)[0] == js[0])[0][0])
            mp.mapping_quality = mapq_exact(vs, which=which)
            for j in js:
                aln = m.emit(sb, i, j, 0)
                if aln.path is None:
                    continue
                mp.subpaths.append(Subpath(path=aln.path, score=aln.score))
            mp.start = list(range(len(mp.subpaths)))
            out.append(mp)
        return out
