"""Minimal VCF parser — enough for graph construction and GBWT-style
haplotype threading (phased GT), mirroring what vg's Constructor consumes
(reference: src/constructor.hpp:203 consumes vcflib records; we parse the
text format directly).
"""
from __future__ import annotations

import gzip
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Tuple


@dataclass(slots=True)
class VcfRecord:
    chrom: str
    pos: int              # 1-based
    id: str
    ref: str
    alts: List[str]
    qual: str
    filter: str
    info: Dict[str, str]
    genotypes: List[Tuple[Tuple[Optional[int], ...], bool]] = field(default_factory=list)
    # genotypes: per sample, (allele indices, phased flag); None = missing '.'

    @property
    def end(self) -> int:
        """1-based inclusive end of the reference allele span."""
        if "END" in self.info:
            return int(self.info["END"])
        return self.pos + len(self.ref) - 1

    def is_symbolic(self) -> bool:
        return any(a.startswith("<") for a in self.alts)


@dataclass
class VcfFile:
    samples: List[str]
    records: List[VcfRecord]

    def records_for(self, chrom: str) -> List[VcfRecord]:
        return [r for r in self.records if r.chrom == chrom]


def _open(path: str):
    if str(path).endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "rt")


def _parse_info(s: str) -> Dict[str, str]:
    d: Dict[str, str] = {}
    if s == ".":
        return d
    for item in s.split(";"):
        if "=" in item:
            k, v = item.split("=", 1)
            d[k] = v
        else:
            d[item] = ""
    return d


def _parse_gt(gt: str) -> Tuple[Tuple[Optional[int], ...], bool]:
    phased = "|" in gt and "/" not in gt
    sep = "|" if "|" in gt else "/"
    alleles = tuple(None if a in (".", "") else int(a) for a in gt.split(sep))
    return alleles, phased


def iter_vcf(path: str) -> Iterator[VcfRecord]:
    vf = read_vcf(path)
    yield from vf.records


def read_vcf(path: str) -> VcfFile:
    samples: List[str] = []
    records: List[VcfRecord] = []
    with _open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            if line.startswith("##"):
                continue
            if line.startswith("#CHROM"):
                cols = line.split("\t")
                samples = cols[9:] if len(cols) > 9 else []
                continue
            cols = line.split("\t")
            chrom, pos, vid, ref, alt, qual, filt = cols[:7]
            info = _parse_info(cols[7]) if len(cols) > 7 else {}
            alts = [] if alt == "." else alt.split(",")
            rec = VcfRecord(chrom, int(pos), vid, ref.upper(), [a.upper() for a in alts],
                            qual, filt, info)
            if len(cols) > 9 and samples:
                fmt = cols[8].split(":")
                try:
                    gt_idx = fmt.index("GT")
                except ValueError:
                    gt_idx = -1
                if gt_idx >= 0:
                    for s in cols[9:]:
                        fields = s.split(":")
                        gt = fields[gt_idx] if gt_idx < len(fields) else "."
                        rec.genotypes.append(_parse_gt(gt))
            records.append(rec)
    return VcfFile(samples, records)
