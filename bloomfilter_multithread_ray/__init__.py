"""Ray-Data-native distributed sketch / approximate-aggregation library.

A from-scratch rebuild of the capabilities of
``dylan-keller/bloomfilter-multithread`` (partitioned Bloom-filter
membership build + probe over streamed sequences; reference entry point
``src/main.cpp:58``) as an idiomatic Ray Data engine, widened per the
north rule to the full mergeable-sketch family (Bloom, HyperLogLog,
count-min, t-digest, KLL, MinHash, SimHash, bottom-k/KMV,
Misra-Gries) plus the relational, graph (connected components),
join, and training-data operators a 100 TB pipeline needs.

Layout
------
- ``functions/``  vectorized hashing / tokenization kernels (numpy, no Ray)
- ``state/``      sketch kernels with the uniform mergeable-UDAF contract
                  ``update / merge / estimate / serialize / deserialize``
- ``sources/``    dataset sources (synthetic sequences corpus, FASTA parity)
- ``stages/``     ``map_batches`` / ``AggregateFnV2`` building blocks
- ``pipelines/``  end-to-end Ray Data pipelines (build, probe, analytics,
                  dedup, ANN, text analysis)
"""

__version__ = "0.1.0"
