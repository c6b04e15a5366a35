"""chronographer_ray — a Ray-Data-native event-centric KG construction engine.

Brand-new implementation of the query/data-processing capabilities of
muhai-project/chronographer (reference read at /root/reference), re-expressed
as Ray Data pipelines: zero-copy Arrow ``map_batches`` kernels, actor pools
for stateful stages, groupby/aggregate shuffles with hub-entity salting, and
partitioned-Parquet materialization with per-partition lineage manifests.

Layout
------
- ``config``      — search / dataset configuration dataclasses
- ``stages``      — pure Arrow batch kernels (filters, dates, text, dedup, ANN,
                    entity linking, multimodal plumbing)
- ``sources``     — triple stores (in-memory Arrow + role-partitioned Parquet/Ray)
- ``search``      — stage 1: semantically-informed frontier search
                    (expansion, ordering, ranking, narrative filters, metrics)
- ``build_ng``    — stage 2: event-centric KG population (SEM roles) + eval
- ``data``        — deterministic synthetic corpora and TPC-H-derived triples
- ``pipelines``   — end-to-end flagship document pipeline
- ``state``       — checkpoint / lineage manifests
"""

__version__ = "0.1.0"
