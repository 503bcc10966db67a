from .hashing import (  # noqa: F401
    splitmix64,
    hash64_ints,
    hash_strings,
    kgram_hashes,
    kgram_hashes_flat,
    partition_of,
)
