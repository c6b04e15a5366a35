"""Sources — triple stores and external-data readers.

Store implementations satisfy the :class:`~.triple_store.TripleStore`
protocol (``triples_for(role, ids)``); the search stack depends only on the
protocol, mirroring the reference's abstract ``Interface`` plugin surface
(``src/interface.py:26-41``).

Provided:
- :class:`~.triple_store.ArrowTripleStore` — in-memory (tests, small graphs)
- :class:`~.triple_store.ParquetTripleStore` — role-partitioned on-disk
  store with partition-pruned point lookups and a lazy Ray Dataset
  ``expand_dataset`` scale path (the HDT SPO/OPS stand-in)
- :mod:`~.concept_net` — local ConceptNet assertions (S11, J12, T6)

Connector slot (S2/S3): the reference's TPF (``src/triply_interface.py``)
and SPARQL (``src/sparql_interface.py``) readers are obsolete in its own
code path (``src/expansion.py:42-44``) and are NOT rebuilt; a remote
endpoint would plug in as another ``TripleStore`` whose ``triples_for``
issues the remote request — or, at scale, as a ``ray.data.read_api`` custom
Datasource feeding the same role-partitioned layout.
"""

from .triple_store import ArrowTripleStore, ParquetTripleStore, TripleStore  # noqa: F401
