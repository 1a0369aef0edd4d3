from .dna import (  # noqa: F401
    encode,
    decode,
    revcomp_codes,
    revcomp_str,
    CODE_A,
    CODE_C,
    CODE_G,
    CODE_T,
    CODE_N,
)
