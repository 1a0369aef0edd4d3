"""Graph construction from FASTA + VCF.

Reference behavior: vg's Constructor (src/constructor.cpp: construct_chunk
at :320, clump loop at :567, edge wiring at :1509; node-count oracles in
test/t/02_vg_construct.t — small x graph: 210 nodes / 291 edges with
-m 1000). The algorithm:

- variants are grouped into *clumps* of overlapping records
- each alt allele is decomposed into primitive edits (allele_align)
- per clump, alt nodes are created first (variants processed in
  SHA1-name order), then the reference is filled in, broken at every
  position where an alt node or deletion arc needs to attach
- reference runs between clumps are chopped at max_node_size
- edges connect every node ending at p-1 to every node starting at p,
  plus (daisy-chained) deletion arcs, minus insert-to-insert links

The constructor also emits a VariantTable mapping every VCF record to its
per-allele node walks — the substrate for haplotype threading (GBWT
construction) and VCF-guided genotyping.
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Set, Tuple

from ..graph.arraygraph import ArrayGraph, GraphBuilder, SENSE_REFERENCE
from ..io.vcf import VcfFile, VcfRecord
from .allele_align import (
    AlleleEdit,
    condense_matches,
    decompose_allele,
    trim_to_variable,
)


def sanitize_sequence(seq: str) -> str:
    """Uppercase; any non-ACGT character becomes N (reference:
    sanitize_sequence_in_place, constructor.cpp)."""
    seq = seq.upper()
    if all(c in "ACGT" for c in seq):
        return seq
    return "".join(c if c in "ACGT" else "N" for c in seq)


def make_variant_id(rec: VcfRecord) -> str:
    """SHA1 hex name for a variant (reference: make_variant_id,
    src/utility.cpp:574: chrom\\npos\\nREF\\nALT...\\n each newline-terminated,
    uppercase alleles)."""
    h = hashlib.sha1()
    parts = [rec.chrom, str(rec.pos), rec.ref.upper()]
    parts += [a.upper() for a in rec.alts]
    h.update(("\n".join(parts) + "\n").encode())
    return h.hexdigest()


@dataclass
class ConstructorParams:
    max_node_size: int = 32
    greedy_pieces: bool = False
    alt_paths: bool = False
    flat: bool = False
    max_parsed_variant_size: int = 100
    chain_deletions: bool = True
    mnp_per_base: bool = True
    do_svs: bool = False
    trim_indels: bool = True  # only applies to flat alts


@dataclass
class VariantSite:
    """Per-VCF-record construction record for haplotype threading / alt paths."""
    rec: VcfRecord
    name: str
    # 0-based inclusive bounds of the variable region on the contig
    # (start > end for pure insertions)
    start: int
    end: int
    # allele_walks[i] = node id walk for allele i (0 = ref)
    allele_walks: List[List[int]] = field(default_factory=list)


@dataclass
class ContigResult:
    name: str
    sites: List[VariantSite]
    ref_path_nodes: List[int]


class Constructor:
    def __init__(self, params: Optional[ConstructorParams] = None):
        self.params = params or ConstructorParams()
        self.warnings: List[str] = []

    # -- helpers -------------------------------------------------------------

    def _piece_size(self, length: int) -> int:
        p = self.params
        if p.greedy_pieces:
            return p.max_node_size
        piece_count = length // p.max_node_size
        if piece_count > 1:
            return min(p.max_node_size, max(length // piece_count, 1))
        return p.max_node_size

    def construct_graph(self, ref_seqs: Dict[str, str],
                        vcf: Optional[VcfFile] = None,
                        contigs: Optional[Sequence[str]] = None,
                        ) -> Tuple[ArrayGraph, List[ContigResult]]:
        b = GraphBuilder()
        results: List[ContigResult] = []
        next_id = 1
        for contig in (contigs or list(ref_seqs)):
            seq = sanitize_sequence(ref_seqs[contig])
            variants = vcf.records_for(contig) if vcf is not None else []
            res, next_id = self._construct_contig(b, contig, seq, variants, next_id)
            results.append(res)
        return b.freeze(), results

    # -- per-contig construction ----------------------------------------------

    def _construct_contig(self, b: GraphBuilder, contig: str, ref: str,
                          variants: List[VcfRecord], first_id: int
                          ) -> Tuple[ContigResult, int]:
        p = self.params
        next_id = first_id
        L = len(ref)

        nodes_starting_at: Dict[int, Set[int]] = {}
        nodes_ending_at: Dict[int, Set[int]] = {}
        inserts: Set[int] = set()
        deletions_ending_at: Dict[int, Set[int]] = {}
        deletion_starts: Set[int] = set()
        created_nodes: Dict[Tuple[int, str, str], List[int]] = {}
        node_len: Dict[int, int] = {}
        ref_path: List[int] = []
        sites: List[VariantSite] = []
        reference_cursor = 0

        def create_nodes(sequence: str) -> List[int]:
            nonlocal next_id
            piece = self._piece_size(len(sequence))
            ids: List[int] = []
            cursor = 0
            while cursor < len(sequence):
                n = min(piece, len(sequence) - cursor)
                nid = b.add_node(sequence[cursor : cursor + n], node_id=next_id)
                node_len[nid] = n
                next_id += 1
                if ids:
                    b.add_edge(ids[-1], nid)
                ids.append(nid)
                cursor += n
            return ids

        def add_reference_nodes_until(target: int) -> None:
            nonlocal reference_cursor
            if target < reference_cursor:
                return
            run = create_nodes(ref[reference_cursor:target])
            if run:
                nodes_starting_at.setdefault(reference_cursor, set()).add(run[0])
                seen = sum(node_len[n] for n in run)
                nodes_ending_at.setdefault(reference_cursor + seen - 1, set()).add(run[-1])
                ref_path.extend(run)
            reference_cursor = target

        # ---- clump loop ------------------------------------------------------
        vi = 0
        clump: List[VcfRecord] = []
        clump_end = 0
        while vi < len(variants) or clump:
            if not clump or (vi < len(variants)
                             and clump_end > variants[vi].pos - 1):
                rec = variants[vi]
                clump.append(rec)
                clump_end = max(clump_end, rec.pos - 1 + len(rec.ref))
                vi += 1
                continue

            self._handle_clump(
                b, contig, ref, clump, sites, created_nodes, node_len,
                nodes_starting_at, nodes_ending_at, inserts,
                deletions_ending_at, deletion_starts,
                create_nodes, add_reference_nodes_until,
                lambda: reference_cursor,
                ref_path,
            )
            # _handle_clump advances reference_cursor via closure on this frame:
            reference_cursor = self._cursor_after_clump
            clump = []
            clump_end = 0

        add_reference_nodes_until(L)

        # ---- edge wiring (reference: constructor.cpp:1509-1650) --------------
        for pos in sorted(nodes_starting_at):
            if pos == 0:
                continue
            ending_prev = nodes_ending_at.get(pos - 1, set())
            for right in nodes_starting_at[pos]:
                for left in ending_prev:
                    if left in inserts and right in inserts:
                        continue
                    b.add_edge(left, right)
                # deletion arcs with daisy chaining
                possible_starts: Set[int] = set()
                possible_ends = [pos - 1]
                explored: Set[int] = set()
                while possible_ends:
                    de = possible_ends.pop(0)
                    for ds in deletions_ending_at.get(de, ()):
                        possible_starts.add(ds)
                        if p.chain_deletions and ds > 0 and ds not in explored:
                            possible_ends.append(ds)
                            explored.add(ds)
                for ds in possible_starts:
                    if ds < 0:
                        continue  # deletion to the contig start: exposed end
                    for left in nodes_ending_at.get(ds, ()):
                        if left in inserts:
                            continue
                        b.add_edge(left, right)

        b.add_path(contig, [(nid, False) for nid in ref_path],
                   sense=SENSE_REFERENCE, locus=contig)
        if self.params.alt_paths:
            # embed per-allele alt paths "_alt_<hash>_<i>" (reference
            # construct -a, src/constructor.cpp alt path naming) — the
            # substrate for genotype-given-VCF calling (VCFGenotyper)
            for site in sites:
                for ai, walk in enumerate(site.allele_walks):
                    if not walk:
                        continue
                    b.add_path(f"_alt_{site.name}_{ai}",
                               [(nid, False) for nid in walk])
        return ContigResult(contig, sites, ref_path), next_id

    # -- clump handling --------------------------------------------------------

    def _canonicalize_symbolic(self, rec: VcfRecord, ref: str,
                               contig: str) -> Optional[VcfRecord]:
        """Rewrite symbolic SV alleles (<DEL>/<INS>/<INV>/<DUP> with
        END/SEQ info) into explicit sequences (reference: the Constructor's
        symbolic SV handling, src/constructor.cpp:985-1066 — same
        semantics, applied as record canonicalization)."""
        from copy import copy

        from ..utils import dna as _dna

        pos0 = rec.pos - 1
        try:
            end = rec.end            # 1-based inclusive, honors INFO END
        except Exception:
            end = rec.pos
        span = ref[pos0:end]
        alts = []
        for alt in rec.alts:
            a = alt.upper()
            if not a.startswith("<"):
                alts.append(alt)
            elif a.startswith("<DEL"):
                alts.append(span[:1])
            elif a.startswith("<INV"):
                alts.append(span[:1] + _dna.revcomp_str(span[1:]))
            elif a.startswith("<DUP"):
                alts.append(span + span[1:])
            elif a.startswith("<INS"):
                seq = rec.info.get("SEQ")
                if not seq:
                    self.warnings.append(
                        f"skip <INS> without SEQ at {contig}:{rec.pos}")
                    return None
                alts.append(span[:1] + seq.upper())
            else:
                self.warnings.append(
                    f"skip unsupported symbolic allele {alt} at "
                    f"{contig}:{rec.pos}")
                return None
        out = copy(rec)
        out.ref = span
        out.alts = alts
        out.info = dict(rec.info)
        out.info.pop("END", None)    # explicit ref now carries the span
        return out

    def _handle_clump(self, b, contig, ref, clump, sites, created_nodes,
                      node_len, nodes_starting_at, nodes_ending_at, inserts,
                      deletions_ending_at, deletion_starts,
                      create_nodes, add_reference_nodes_until, get_cursor,
                      ref_path) -> None:
        p = self.params
        parsed: Dict[str, Tuple[VcfRecord, List[List[AlleleEdit]]]] = {}
        first_edit_start = None
        last_edit_end = None
        site_bounds: Dict[str, Tuple[int, int]] = {}

        for rec in clump:
            if not rec.alts or any(a == "." or a == "" for a in rec.alts):
                self.warnings.append(f"skip no-alt variant at {contig}:{rec.pos}")
                continue
            if any(a == "*" for a in rec.alts):
                self.warnings.append(f"skip * allele variant at {contig}:{rec.pos}")
                continue
            if rec.is_symbolic():
                if not p.do_svs:
                    self.warnings.append(
                        f"skip symbolic variant at {contig}:{rec.pos}")
                    continue
                rec = self._canonicalize_symbolic(rec, ref, contig)
                if rec is None:
                    continue
            rec.ref = sanitize_sequence(rec.ref)
            rec.alts = [sanitize_sequence(a) for a in rec.alts]
            pos0 = rec.pos - 1
            expected = ref[pos0 : pos0 + len(rec.ref)]
            if rec.ref != expected:
                raise ValueError(
                    f"variant/reference mismatch at {contig}:{rec.pos}: "
                    f"{rec.ref} vs {expected}")
            name = make_variant_id(rec)
            if name in parsed:
                self.warnings.append(
                    f"skip duplicate variant {name} at {contig}:{rec.pos}")
                continue

            can_parse = not p.flat and len(rec.ref) <= p.max_parsed_variant_size \
                and all(len(a) <= p.max_parsed_variant_size for a in rec.alts)
            alleles: List[List[AlleleEdit]] = []
            for alt in rec.alts:
                if alt == rec.ref:
                    alleles.append([])
                    continue
                if can_parse:
                    edits = decompose_allele(rec.ref, alt, pos0, p.mnp_per_base)
                else:
                    # flat: one edit covering the whole allele, minus the
                    # shared leading base of standard indel representation
                    r, a, q = rec.ref, alt, pos0
                    if p.trim_indels and r and a and r[0] == a[0]:
                        r, a, q = r[1:], a[1:], q + 1
                    edits = [AlleleEdit(q, r, a)] if (r or a) else []
                alleles.append(condense_matches(edits))
            trim_to_variable(alleles)
            # bounds over non-empty alt edit lists
            v_start, v_end = None, None
            for allele in alleles:
                if allele:
                    s = allele[0].position
                    e = allele[-1].position + len(allele[-1].ref) - 1
                    v_start = s if v_start is None else min(v_start, s)
                    v_end = e if v_end is None else max(v_end, e)
            if v_start is None:
                self.warnings.append(
                    f"skip no-change variant at {contig}:{rec.pos}")
                continue
            parsed[name] = (rec, alleles)
            site_bounds[name] = (v_start, v_end)
            first_edit_start = v_start if first_edit_start is None \
                else min(first_edit_start, v_start)
            last_edit_end = v_end if last_edit_end is None \
                else max(last_edit_end, v_end)

        if not parsed:
            self._cursor_after_clump = get_cursor()
            return

        add_reference_nodes_until(first_edit_start)
        reference_cursor = get_cursor()

        # clump-local breakpoint registries (positions from earlier clumps are
        # all behind the cursor, so only this clump's registrations matter)
        local_starts: Set[int] = set()
        local_ends: Set[int] = set()
        local_del_ends: Set[int] = set()
        local_del_starts: Set[int] = set()

        # alt node creation, variants in name order
        alt_walks: Dict[str, List[List[int]]] = {}
        for name in sorted(parsed):
            rec, alleles = parsed[name]
            walks: List[List[int]] = []
            for allele in alleles:
                walk: List[int] = []
                for e in allele:
                    if e.alt != "":
                        key = (e.position, e.ref, e.alt)
                        if key not in created_nodes:
                            run = create_nodes(e.alt)
                            e_start = e.position
                            e_end = e.position + len(e.ref) - 1
                            nodes_starting_at.setdefault(e_start, set()).add(run[0])
                            nodes_ending_at.setdefault(e_end, set()).add(run[-1])
                            local_starts.add(e_start)
                            local_ends.add(e_end)
                            created_nodes[key] = run
                            if e.ref == "":
                                inserts.add(run[0])
                                inserts.add(run[-1])
                        walk.extend(created_nodes[key])
                    elif e.ref != "":
                        arc_end = e.position + len(e.ref) - 1
                        arc_start = e.position - 1
                        deletions_ending_at.setdefault(arc_end, set()).add(arc_start)
                        deletion_starts.add(arc_start)
                        local_del_ends.add(arc_end)
                        local_del_starts.add(arc_start)
                walks.append(walk)
            alt_walks[name] = walks

        # reference fill, breaking at attachment points
        def next_breakpoint_after(position: int) -> int:
            ret = last_edit_end
            starts_after = [q for q in local_starts if q > position]
            if starts_after:
                ret = min(ret, min(starts_after) - 1)
            ends_at_or_after = [q for q in local_ends if q >= position]
            if ends_at_or_after:
                ret = min(ret, min(ends_at_or_after))
            dels_end = [q for q in local_del_ends if q >= position]
            if dels_end:
                ret = min(ret, min(dels_end))
            dels_start = [q for q in local_del_starts if q >= position]
            if dels_start:
                ret = min(ret, min(dels_start))
            return ret

        ref_runs: List[Tuple[int, List[int]]] = []  # (start_pos, node ids)
        while reference_cursor < last_edit_end + 1:
            next_end = next_breakpoint_after(reference_cursor)
            run_seq = ref[reference_cursor : next_end + 1]
            key = (reference_cursor, run_seq, run_seq)
            if key not in created_nodes:
                run = create_nodes(run_seq)
                nodes_starting_at.setdefault(reference_cursor, set()).add(run[0])
                nodes_ending_at.setdefault(next_end, set()).add(run[-1])
                created_nodes[key] = run
            run = created_nodes[key]
            ref_path.extend(run)
            ref_runs.append((reference_cursor, run))
            reference_cursor = next_end + 1
        self._cursor_after_clump = reference_cursor

        # record sites with ref-allele walks
        for name in sorted(parsed):
            rec, _ = parsed[name]
            v_start, v_end = site_bounds[name]
            ref_walk = [nid for (start, run) in ref_runs
                        if v_start <= start <= v_end for nid in run]
            site = VariantSite(rec=rec, name=name, start=v_start, end=v_end,
                               allele_walks=[ref_walk] + alt_walks[name])
            sites.append(site)
