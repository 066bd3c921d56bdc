from bella_tpu.seq.encode import (
    encode_bases,
    decode_bases,
    pack_kmers,
    revcomp_kmer,
    canonical_kmers,
    hopc_kmers,
    revcomp_codes,
    kmer_to_string,
    string_to_kmer,
    hash64,
)

__all__ = [
    "encode_bases",
    "decode_bases",
    "pack_kmers",
    "revcomp_kmer",
    "canonical_kmers",
    "hopc_kmers",
    "revcomp_codes",
    "kmer_to_string",
    "string_to_kmer",
    "hash64",
]
