"""pregel_spark — a PySpark-native link-graph analytics engine.

A from-scratch re-expression of the capabilities of the reference BSP
graph engine (tarantool/pregel, see /root/reference) on Apache Spark:

- vertex-centric BSP supersteps become DataFrame jobs driven by a
  driver-side loop (``pregel_spark.graph.engine.Pregel``), matching the
  reference's master/worker split (``pregel/master.lua:54-88``,
  ``pregel/worker.lua:140-180``) with Catalyst doing the physical work;
- the reference's embedded adjacency (``pregel/vertex.lua:5-11``) is
  normalized into a first-class ``edges(src, dst, weight)`` table;
- message combine (``pregel/queue.lua:39-52``) is ``groupBy.agg``;
- global aggregators (``pregel/aggregator.lua``) are driver-collected
  scalar aggregates re-injected as literals;
- checkpoint/resume replaces Tarantool snapshots
  (``pregel/master.lua:101-103``).

Also ships a web-corpus layer (synthetic Common-Crawl-style pages,
vectorized link/text extraction) and large-scale training-data pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing).
"""

__version__ = "0.1.0"
