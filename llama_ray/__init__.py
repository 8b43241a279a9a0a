"""llama_ray — a Ray-Data-native link-graph analytics engine.

A from-scratch reimplementation of the query/data-processing
capabilities of the reference engine LLAMA (`/root/reference`,
"Large Multiversioned Arrays", ICDE '15) on top of
``ray.data.Dataset`` pipelines over zero-copy Arrow batches:

- edge tables are Datasets, not in-memory CSR pointer arrays
  (reference: ``llama/include/llama/ll_mlcsr_sp.h``);
- graph construction (canonicalize / dedup / degree / reverse-CSR)
  is ``map_batches`` + hash-shuffle ``groupby`` (reference 3-pass
  loader: ``llama/include/llama/ll_load_utils.h:289-879``);
- vertex-centric analytics (PageRank, components, label
  propagation, triangle counting, BFS/SSSP — reference
  ``benchmark/benchmarks/*.h``) are gather-scatter supersteps:
  ``map_batches`` scatter emitting (dst, contribution) partials,
  a hash-shuffle ``groupby('dst').aggregate``, and a vertex-state
  update, checkpointed per superstep;
- multiversioned snapshots / streaming micro-batches (reference
  ``ll_writable_graph.h`` checkpoints) are versioned Parquet
  snapshot directories with tombstone columns.

Nothing in here is a port: no code is copied from the reference;
all execution is Ray Data / Arrow / numpy.
"""

__version__ = "0.1.0"
