"""kgrecrun — Ray-Data-native knowledge-graph construction engine.

A from-scratch engine (NOT a port) whose first stage re-implements the
extraction semantics of dstein64/recrun (readability-style boilerplate
removal, see /root/reference/src/lib/readabilitySAX/readabilitySAX.js)
as a ``map_batches`` UDF over zero-copy Arrow batches, byte-identical
per url to the reference output; downstream stages build a knowledge
graph (NER, OpenIE triples, entity linking, minhash-LSH + union-find
canonicalization, partitioned Parquet materialization).
"""

__version__ = "0.1.0"
