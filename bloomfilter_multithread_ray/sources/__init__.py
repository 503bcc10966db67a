from .sequences import (  # noqa: F401
    SEQUENCES_SCHEMA,
    generate_sequences_table,
    generate_query_table,
    write_sequences_parquet,
    read_sequences,
)
from .fasta import read_fasta_tokens, fasta_to_table  # noqa: F401
