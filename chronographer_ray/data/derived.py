"""TPC-H-derived triples view — the shared substrate for the DuckDB
correctness oracles.

The driver's correctness gate compares each Ray pipeline against ANSI SQL
over the same testdata parquet tables. KG operators need a triples table, so
we DERIVE one — identically — on both sides: here as Ray Dataset projections
(``map_batches`` over pruned parquet reads), and in SQL as the ``TRIPLES_CTE``
string prepended to every KG oracle. Same rows, same strings, bit-identical.

Entity IRI scheme: ``ex:order/<k>``, ``ex:customer/<k>``, … ; predicates
``ex:placedBy``, ``ex:inNation``, ``ex:includes``, ``ex:suppliedBy``,
``ex:inRegion``, ``ex:orderDate``, ``ex:shipDate``, ``rdf:type``,
``rdfs:label``. Date objects are typed literals
``"YYYY-MM-DD"^^<http://www.w3.org/2001/XMLSchema#date>`` so the date
normalizer (M4) has real work to do.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

XSD_DATE_SUFFIX = '"^^<http://www.w3.org/2001/XMLSchema#date>'


def _iri(prefix: str, keys) -> pa.ChunkedArray:
    return pc.binary_join_element_wise(prefix, pc.cast(keys, pa.string()), "")


def _date_lit(ts_col) -> pa.ChunkedArray:
    d = pc.strftime(ts_col, format="%Y-%m-%d")
    return pc.binary_join_element_wise('"', d, XSD_DATE_SUFFIX, "")


def _t(subject, predicate, object_) -> pa.Table:
    n = len(subject)
    if isinstance(predicate, str):
        predicate = pa.chunked_array([pa.array([predicate] * n, pa.string())])
    return pa.table({"subject": subject, "predicate": predicate, "object": object_})


def _const(n: int, value: str) -> pa.ChunkedArray:
    return pa.chunked_array([pa.array([value] * n, pa.string())])


def orders_to_triples(b: pa.Table) -> pa.Table:
    s = _iri("ex:order/", b["o_orderkey"])
    n = b.num_rows
    return pa.concat_tables(
        [
            _t(s, "ex:placedBy", _iri("ex:customer/", b["o_custkey"])),
            _t(s, "ex:orderDate", _date_lit(b["o_orderdate"])),
            _t(s, "rdf:type", _const(n, "ex:Order")),
        ]
    )


def lineitem_to_triples(b: pa.Table) -> pa.Table:
    order = _iri("ex:order/", b["l_orderkey"])
    part = _iri("ex:part/", b["l_partkey"])
    return pa.concat_tables(
        [
            _t(order, "ex:includes", part),
            _t(part, "ex:suppliedBy", _iri("ex:supplier/", b["l_suppkey"])),
            _t(order, "ex:shipDate", _date_lit(b["l_shipdate"])),
        ]
    )


def customer_to_triples(b: pa.Table) -> pa.Table:
    s = _iri("ex:customer/", b["c_custkey"])
    n = b.num_rows
    return pa.concat_tables(
        [
            _t(s, "ex:inNation", _iri("ex:nation/", b["c_nationkey"])),
            _t(s, "rdf:type", _const(n, "ex:Customer")),
            _t(s, "rdfs:label", b["c_name"]),
        ]
    )


def supplier_to_triples(b: pa.Table) -> pa.Table:
    s = _iri("ex:supplier/", b["s_suppkey"])
    n = b.num_rows
    return pa.concat_tables(
        [
            _t(s, "ex:inNation", _iri("ex:nation/", b["s_nationkey"])),
            _t(s, "rdf:type", _const(n, "ex:Supplier")),
            _t(s, "rdfs:label", b["s_name"]),
        ]
    )


def nation_to_triples(b: pa.Table) -> pa.Table:
    s = _iri("ex:nation/", b["n_nationkey"])
    n = b.num_rows
    return pa.concat_tables(
        [
            _t(s, "ex:inRegion", _iri("ex:region/", b["n_regionkey"])),
            _t(s, "rdf:type", _const(n, "ex:Nation")),
            _t(s, "rdfs:label", b["n_name"]),
        ]
    )


def part_to_triples(b: pa.Table) -> pa.Table:
    s = _iri("ex:part/", b["p_partkey"])
    n = b.num_rows
    return pa.concat_tables(
        [_t(s, "rdf:type", _const(n, "ex:Part")), _t(s, "rdfs:label", b["p_name"])]
    )


def region_to_triples(b: pa.Table) -> pa.Table:
    s = _iri("ex:region/", b["r_regionkey"])
    n = b.num_rows
    return pa.concat_tables(
        [_t(s, "rdf:type", _const(n, "ex:Region")), _t(s, "rdfs:label", b["r_name"])]
    )


_TABLE_KERNELS = {
    "orders": (orders_to_triples, ["o_orderkey", "o_custkey", "o_orderdate"]),
    "lineitem": (lineitem_to_triples, ["l_orderkey", "l_partkey", "l_suppkey", "l_shipdate"]),
    "customer": (customer_to_triples, ["c_custkey", "c_nationkey", "c_name"]),
    "supplier": (supplier_to_triples, ["s_suppkey", "s_nationkey", "s_name"]),
    "nation": (nation_to_triples, ["n_nationkey", "n_regionkey", "n_name"]),
    "part": (part_to_triples, ["p_partkey", "p_name"]),
    "region": (region_to_triples, ["r_regionkey", "r_name"]),
}


def _blocks_for(path: str, target_bytes: int = 1 << 20, cap: int = 32) -> int:
    """Size the read from the file size: ~1 MB of parquet per block, capped.
    The small dimension tables read as ONE block instead of Ray's default
    64-way split (a union of 7 tables × 64 splits made ~450 sub-100-row
    blocks and task overhead dominated the scan); lineitem still fans out
    wide enough to keep every core busy. At real (multi-GB-file) scale the
    default target_max_block_size takes over and this override is a no-op
    economically — blocks land at ~128 MB either way."""
    import os

    return min(cap, max(1, os.path.getsize(path) // target_bytes))


def _derived_dataset(sf_dir: str):
    import ray.data as rd

    parts = []
    for table, (kernel, cols) in _TABLE_KERNELS.items():
        path = f"{sf_dir}/{table}.parquet"
        parts.append(
            rd.read_parquet(
                path, columns=cols, override_num_blocks=_blocks_for(path)
            ).map_batches(kernel, batch_format="pyarrow")
        )
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def _cache_dir(sf_dir: str) -> str:
    import hashlib
    import os

    # key on path + source file identity (size, mtime): a regenerated
    # testdata dir must never serve a stale materialized view
    h = hashlib.md5(os.path.abspath(sf_dir).encode("utf-8"))
    for table in sorted(_TABLE_KERNELS):
        p = f"{sf_dir}/{table}.parquet"
        try:
            st = os.stat(p)
            h.update(f"{table}:{st.st_size}:{int(st.st_mtime)}".encode("utf-8"))
        except OSError:
            h.update(f"{table}:absent".encode("utf-8"))
    return os.path.join("/tmp", "chronographer_cache", h.hexdigest()[:16])


def triples_dataset(sf_dir: str, cache: bool = True):
    """Lazy Ray Dataset of the derived triples (columns pruned at the read).

    With ``cache=True`` the derived view is materialized ONCE per sf dir to
    a partitioned parquet under /tmp (a materialized view — identical rows)
    and subsequent calls read it directly: every KG query otherwise re-runs
    the 7-table derivation (~2-3 s at sf0.1) before doing its own work.
    The write is atomic: each first-caller writes to its OWN
    ``mkdtemp``-unique staging dir, then ``os.replace``s it into place —
    a losing racer's replace fails (target exists) and it simply reads
    the winner's cache. Any other failure → underived pipeline."""
    import os
    import shutil
    import tempfile

    import ray.data as rd

    if not cache:
        return _derived_dataset(sf_dir)
    cdir = _cache_dir(sf_dir)
    done = os.path.join(cdir, "_SUCCESS")
    if os.path.exists(done):
        return rd.read_parquet(os.path.join(cdir, "data"))
    parent = os.path.dirname(cdir)
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=os.path.basename(cdir) + ".tmp.", dir=parent)
    try:
        os.makedirs(os.path.join(tmp, "data"), exist_ok=True)
        _derived_dataset(sf_dir).write_parquet(os.path.join(tmp, "data"))
        open(os.path.join(tmp, "_SUCCESS"), "w", encoding="utf-8").close()
        try:
            os.replace(tmp, cdir)
        except OSError:  # another writer promoted first — use theirs
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.exists(done):  # existing cdir is NOT a valid cache
                return _derived_dataset(sf_dir)
        return rd.read_parquet(os.path.join(cdir, "data"))
    except Exception:  # noqa: BLE001 — any failure → underived path
        shutil.rmtree(tmp, ignore_errors=True)
        if os.path.exists(done):
            return rd.read_parquet(os.path.join(cdir, "data"))
        return _derived_dataset(sf_dir)


def triples_table(sf_dir: str) -> pa.Table:
    """Eager single-process variant (tests / driver-side oracles)."""
    import pyarrow.parquet as pq

    parts = []
    for table, (kernel, cols) in _TABLE_KERNELS.items():
        parts.append(kernel(pq.read_table(f"{sf_dir}/{table}.parquet", columns=cols)))
    return pa.concat_tables(parts)


# --- the EXACT same view in DuckDB SQL (prepended to every KG oracle) ------
_D = '"YYYY-MM-DD"'  # doc aid only
TRIPLES_CTE = """
WITH triples AS (
  SELECT 'ex:order/' || o_orderkey AS subject, 'ex:placedBy' AS predicate,
         'ex:customer/' || o_custkey AS object FROM orders
  UNION ALL
  SELECT 'ex:order/' || o_orderkey, 'ex:orderDate',
         '"' || strftime(o_orderdate, '%Y-%m-%d') || '"^^<http://www.w3.org/2001/XMLSchema#date>' FROM orders
  UNION ALL
  SELECT 'ex:order/' || o_orderkey, 'rdf:type', 'ex:Order' FROM orders
  UNION ALL
  SELECT 'ex:order/' || l_orderkey, 'ex:includes', 'ex:part/' || l_partkey FROM lineitem
  UNION ALL
  SELECT 'ex:part/' || l_partkey, 'ex:suppliedBy', 'ex:supplier/' || l_suppkey FROM lineitem
  UNION ALL
  SELECT 'ex:order/' || l_orderkey, 'ex:shipDate',
         '"' || strftime(l_shipdate, '%Y-%m-%d') || '"^^<http://www.w3.org/2001/XMLSchema#date>' FROM lineitem
  UNION ALL
  SELECT 'ex:customer/' || c_custkey, 'ex:inNation', 'ex:nation/' || c_nationkey FROM customer
  UNION ALL
  SELECT 'ex:customer/' || c_custkey, 'rdf:type', 'ex:Customer' FROM customer
  UNION ALL
  SELECT 'ex:customer/' || c_custkey, 'rdfs:label', c_name FROM customer
  UNION ALL
  SELECT 'ex:supplier/' || s_suppkey, 'ex:inNation', 'ex:nation/' || s_nationkey FROM supplier
  UNION ALL
  SELECT 'ex:supplier/' || s_suppkey, 'rdf:type', 'ex:Supplier' FROM supplier
  UNION ALL
  SELECT 'ex:supplier/' || s_suppkey, 'rdfs:label', s_name FROM supplier
  UNION ALL
  SELECT 'ex:nation/' || n_nationkey, 'ex:inRegion', 'ex:region/' || n_regionkey FROM nation
  UNION ALL
  SELECT 'ex:nation/' || n_nationkey, 'rdf:type', 'ex:Nation' FROM nation
  UNION ALL
  SELECT 'ex:nation/' || n_nationkey, 'rdfs:label', n_name FROM nation
  UNION ALL
  SELECT 'ex:part/' || p_partkey, 'rdf:type', 'ex:Part' FROM part
  UNION ALL
  SELECT 'ex:part/' || p_partkey, 'rdfs:label', p_name FROM part
  UNION ALL
  SELECT 'ex:region/' || r_regionkey, 'rdf:type', 'ex:Region' FROM region
  UNION ALL
  SELECT 'ex:region/' || r_regionkey, 'rdfs:label', r_name FROM region
)
"""
