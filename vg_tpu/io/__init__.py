from .fasta import read_fasta, iter_fasta  # noqa: F401
from .fastq import Read, iter_fastq, iter_fastq_paired, iter_fastq_interleaved  # noqa: F401
from .vcf import VcfFile, VcfRecord, read_vcf, iter_vcf  # noqa: F401
from .gam import (  # noqa: F401
    Alignment,
    Edit,
    Mapping,
    Path,
    Position,
    read_gam,
    write_gam,
)
