"""HaplotypeSet — the TPU-native answer to GBWT/GBWTGraph.

The reference stores haplotypes as a run-length-compressed FM-index (gbwt)
and walks them with rank/select pointer chases (reference:
src/gbwt_extender.cpp bidirectional search; deps/gbwt). That access pattern
is hostile to TPU. Instead we materialize every indexed haplotype into one
concatenated *haplotype text*:

- ``text``: uint8 base codes of every haplotype, back to back
- ``steps`` / ``step_text_pos``: the handle walk of each haplotype and the
  text offset where each step's sequence begins

Haplotype-consistent gapless extension then becomes "compare read bases
against text[pos : pos+len]" — a dense gather the VPU eats — and
same-haplotype seed distance is plain position arithmetic (replacing the
distance index / zipcodes for mapping purposes). Graph coordinates for
output are recovered by binary search over step offsets.

Trade-off vs GBWT: memory is O(total haplotype length) uncompressed. For
large cohort pangenomes a later round adds window dedup / haplotype
sampling (the reference has the same scaling answer: vg haplotypes).

Construction sources mirror vg gbwt (src/haplotype_indexer.cpp):
- graph paths (``--index-paths``)
- VCF phased genotypes threaded through the constructor's VariantSite table
  (vg gbwt -v: per sample, per phase, per contig)
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..construct.constructor import ContigResult
from ..graph.arraygraph import ArrayGraph
from ..io.vcf import VcfFile


@dataclass
class HaplotypeMeta:
    name: str
    sample: str = ""
    phase: int = 0
    contig: str = ""
    is_ref: bool = False


class HaplotypeSet:
    def __init__(self, graph: ArrayGraph, metas: List[HaplotypeMeta],
                 walks: List[np.ndarray]):
        self.graph = graph
        self.metas = metas
        n_steps = [len(w) for w in walks]
        self.steps_start = np.zeros(len(walks) + 1, dtype=np.int64)
        np.cumsum(n_steps, out=self.steps_start[1:])
        self.steps = (np.concatenate(walks) if walks else
                      np.zeros(0, dtype=np.int64)).astype(np.int64)

        # per-step sequence lengths -> text offsets
        node_len = (graph.seq_start[1:] - graph.seq_start[:-1])
        step_lens = node_len[self.steps >> 1] if len(self.steps) else \
            np.zeros(0, dtype=np.int64)
        self.step_text_pos = np.zeros(len(self.steps) + 1, dtype=np.int64)
        np.cumsum(step_lens, out=self.step_text_pos[1:])
        self.text_start = self.step_text_pos[self.steps_start]

        # materialize the text
        total = int(self.step_text_pos[-1])
        self.text = np.empty(total, dtype=np.uint8)
        from ..utils import dna
        for i in range(len(self.steps)):
            h = int(self.steps[i])
            s = graph.seq[graph.seq_start[h >> 1] : graph.seq_start[(h >> 1) + 1]]
            if h & 1:
                s = dna.revcomp_codes(s)
            self.text[self.step_text_pos[i] : self.step_text_pos[i + 1]] = s

    # -- queries ---------------------------------------------------------------

    @property
    def count(self) -> int:
        return len(self.metas)

    @property
    def total_len(self) -> int:
        return int(self.text_start[-1]) if len(self.text_start) else 0

    def hap_of_text_pos(self, pos) -> np.ndarray:
        """Haplotype index containing each text position."""
        return np.searchsorted(self.text_start[1:], pos, side="right")

    def step_of_text_pos(self, pos) -> np.ndarray:
        """Global step index containing each text position."""
        return np.searchsorted(self.step_text_pos[1:], pos, side="right")

    def text_pos_to_graph(self, pos: int) -> Tuple[int, int, bool]:
        """Text position -> (node_id, offset_in_handle_orientation, is_reverse)."""
        si = int(self.step_of_text_pos(pos))
        h = int(self.steps[si])
        off = int(pos - self.step_text_pos[si])
        return int(self.graph.node_id[h >> 1]), off, bool(h & 1)

    def walk_interval(self, start: int, end: int) -> List[Tuple[int, int, int]]:
        """Text interval [start, end) -> list of (handle, offset, length)
        pieces along the haplotype walk."""
        out: List[Tuple[int, int, int]] = []
        pos = start
        si = int(self.step_of_text_pos(pos))
        while pos < end:
            step_start = int(self.step_text_pos[si])
            step_end = int(self.step_text_pos[si + 1])
            take = min(end, step_end) - pos
            out.append((int(self.steps[si]), pos - step_start, take))
            pos += take
            si += 1
        return out

    def hap_text_range(self, hap_idx: int) -> Tuple[int, int]:
        return int(self.text_start[hap_idx]), int(self.text_start[hap_idx + 1])

    def device_arrays(self):
        import jax.numpy as jnp

        return {
            "text": jnp.asarray(self.text),
            "text_start": jnp.asarray(self.text_start),
        }


def haplotypes_from_paths(graph: ArrayGraph) -> HaplotypeSet:
    """Index the graph's embedded paths as haplotypes (vg gbwt --index-paths)."""
    metas, walks = [], []
    for pi, meta in enumerate(graph.path_meta):
        if meta.name.startswith("_alt_"):
            continue           # embedded allele paths are not haplotypes
        hs = graph.path_handles(pi)
        if len(hs) == 0:
            continue
        metas.append(HaplotypeMeta(meta.name, meta.sample, meta.haplotype,
                                   meta.locus or meta.name, is_ref=True))
        walks.append(np.asarray(hs, dtype=np.int64))
    return HaplotypeSet(graph, metas, walks)


def thread_haplotypes(
    graph: ArrayGraph,
    contig_results: Sequence[ContigResult],
    vcf: VcfFile,
    include_ref_paths: bool = True,
    sample_names: Optional[Sequence[str]] = None,
) -> HaplotypeSet:
    """Thread phased VCF samples through the graph (vg gbwt -v equivalent).

    For each contig, sample, and phase: walk the reference node run,
    substituting each variant site's chosen allele walk. Overlapping sites
    on the same haplotype take the first (by position); unphased or missing
    genotypes fall back to the reference allele for that site.
    """
    metas: List[HaplotypeMeta] = []
    walks: List[np.ndarray] = []

    for cres in contig_results:
        ref_nodes = cres.ref_path_nodes
        if not ref_nodes:
            continue
        # node id -> index in ref walk, and start offset of each ref node
        ref_index = {nid: i for i, nid in enumerate(ref_nodes)}
        node_len = {int(graph.node_id[i]): int(graph.seq_start[i + 1] - graph.seq_start[i])
                    for i in (graph.idx(n) for n in ref_nodes)}
        starts = np.zeros(len(ref_nodes) + 1, dtype=np.int64)
        np.cumsum([node_len[n] for n in ref_nodes], out=starts[1:])
        node_start = {nid: int(starts[i]) for i, nid in enumerate(ref_nodes)}

        if include_ref_paths:
            metas.append(HaplotypeMeta(cres.name, contig=cres.name, is_ref=True))
            walks.append(np.array([graph.handle(n) for n in ref_nodes],
                                  dtype=np.int64))

        samples = sample_names or vcf.samples
        for s_i, sample in enumerate(vcf.samples):
            if samples and sample not in samples:
                continue
            # figure out ploidy from the first genotyped record
            ploidy = 0
            for site in cres.sites:
                if s_i < len(site.rec.genotypes):
                    ploidy = max(ploidy, len(site.rec.genotypes[s_i][0]))
            for phase in range(ploidy):
                walk: List[int] = []
                cursor = 0  # position on the contig (ref coords)
                step_i = 0  # index into ref_nodes
                ok = True
                for site in cres.sites:
                    gt = site.rec.genotypes[s_i] if s_i < len(site.rec.genotypes) else ((), False)
                    alleles, _phased = gt
                    allele = alleles[phase] if phase < len(alleles) else None
                    if allele is None or allele == 0:
                        continue
                    if allele >= len(site.allele_walks):
                        continue
                    if site.start < cursor:
                        # overlaps something already applied on this haplotype
                        continue
                    # emit ref nodes up to the site start
                    while step_i < len(ref_nodes) and node_start[ref_nodes[step_i]] < site.start:
                        walk.append(graph.handle(ref_nodes[step_i]))
                        step_i += 1
                    # splice the allele walk
                    for nid in site.allele_walks[allele]:
                        walk.append(graph.handle(nid))
                    # skip ref nodes covered by the site ([start, end])
                    target = site.end + 1 if site.end >= site.start else site.start
                    while step_i < len(ref_nodes) and node_start[ref_nodes[step_i]] < target:
                        step_i += 1
                    cursor = target
                while step_i < len(ref_nodes):
                    walk.append(graph.handle(ref_nodes[step_i]))
                    step_i += 1
                if ok and walk:
                    metas.append(HaplotypeMeta(
                        f"{sample}#{phase}#{cres.name}", sample=sample,
                        phase=phase, contig=cres.name))
                    walks.append(np.array(walk, dtype=np.int64))
    return HaplotypeSet(graph, metas, walks)
