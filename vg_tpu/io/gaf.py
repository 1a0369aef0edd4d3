"""GAF (Graph Alignment Format) text output.

Reference: vg emits GAF via gbwtgraph's support plus vg-side conversion
(src/alignment.cpp gaf functions, io::GafAlignmentEmitter,
src/subcommand/giraffe_main.cpp:2217-2221). Columns follow the GAF spec:
name, qlen, qstart, qend, strand, path(<> runs), plen, pstart, pend,
matches, block length, mapq, then cs-style tags.
"""
from __future__ import annotations

from typing import List, TextIO

from .gam import Alignment


def alignment_to_gaf(aln: Alignment) -> str:
    qlen = len(aln.sequence)
    if aln.path is None or not aln.path.mappings:
        return "\t".join([
            aln.name or "*", str(qlen), "0", "0", "*", "*",
            "0", "0", "0", "0", "0", "0"])
    mappings = aln.path.mappings
    # query interval: soft clips are 0-from_length edits at the ends
    qstart = 0
    first = mappings[0].edits
    if first and first[0].from_length == 0:
        qstart = first[0].to_length
    qend = qlen
    last = mappings[-1].edits
    if last and last[-1].from_length == 0:
        qend = qlen - last[-1].to_length

    path_parts: List[str] = []
    plen = 0
    matches = 0
    block = 0
    for mp in mappings:
        p = mp.position
        path_parts.append(("<" if p.is_reverse else ">") + str(p.node_id))
        for e in mp.edits:
            block += max(e.from_length, e.to_length)
            if e.from_length == e.to_length and not e.sequence:
                matches += e.from_length
        plen += sum(e.from_length for e in mp.edits)
    pstart = mappings[0].position.offset
    return "\t".join([
        aln.name or "*", str(qlen), str(qstart), str(qend), "+",
        "".join(path_parts), str(plen + pstart), str(pstart),
        str(pstart + plen), str(matches), str(block),
        str(aln.mapping_quality),
        f"AS:i:{aln.score}", f"id:f:{aln.identity:.6g}"])


def write_gaf(fileobj: TextIO, alns) -> None:
    for a in alns:
        fileobj.write(alignment_to_gaf(a) + "\n")
