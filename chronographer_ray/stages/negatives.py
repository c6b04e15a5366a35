"""Negative sampling for KG-embedding training data.

TransE-family training (Bordes et al. 2013) needs, for every positive
triple, k corrupted triples (head OR tail replaced by a random entity)
that are NOT themselves true triples (Bernoulli/filtered negative
sampling). At corpus scale this is a map-only pass: the entity
vocabulary ships once (node-bounded broadcast), corruption is a
deterministic hash of (triple, slot) — no RNG state, reproducible across
runs and cluster sizes — and the truth filter is either

* **broadcast** (corpus ≤ ``broadcast_keys_limit`` edges): a sorted
  int64 array of per-triple key hashes ships once via ``ray.put`` and
  every batch probes it with a vectorized ``searchsorted`` — 8 bytes
  per edge instead of a Python string set, or
* **join twin** (above the limit): candidates and truth keys meet in an
  int-bucketed exchange (``groupby(bucket).map_groups`` anti-join) —
  exact, nothing driver-resident, the engine's standard broadcast-gate
  contract (same shape as the PMI/df gates in ``stages/freq.py``).
  The two paths are bit-identical (forced-tiny-limit test).

Hashing is fully vectorized on the production path: component strings
are md5'd once per DISTINCT value via dictionary encoding
(``stages/graph._node_hash64`` — the triangle-probe lesson), then all
key/corruption hashes are numpy uint64 splitmix64 mixes of those
component hashes. Key-hash membership is 63-bit md5-derived: collision
odds ~n²/2^64, negligible (a 10^12-edge corpus would key on the full
128-bit digest as two int64 columns with the identical dataflow).

Two hash methods, the house convention (`stages/sampling.py`):
``splitmix64`` is the production path; ``md5`` makes every choice
reproducible in DuckDB SQL so the driver oracle matches bit-for-bit
(that path keeps per-row md5 but an exact VECTORIZED string
membership — zero-copy Arrow truth array + one ``pc.is_in`` per block;
oracle-parity cost, run at sf scale only).
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .graph import _node_hash64
from .sampling import splitmix64


def _nul_join(*cols) -> np.ndarray:
    """Join string columns with REAL NUL bytes, vectorized. Numpy's
    ``+ "\\x00"`` silently drops the separator (the scalar passes
    through a NUL-terminated numpy str), but Arrow's
    ``binary_join_element_wise`` carries NULs faithfully (length-prefixed
    strings, parity-tested) — md5-oracle path only; the production path
    never joins strings."""
    import pyarrow.compute as pc

    arrs = [c if isinstance(c, (pa.Array, pa.ChunkedArray))
            else pa.array(np.asarray(c, dtype=object), pa.string())
            for c in cols]
    return pc.binary_join_element_wise(*arrs, "\x00") \
        .to_numpy(zero_copy_only=False)


def _mix3(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Order-sensitive 64-bit combine of three component hashes: chained
    splitmix64 finalizers (each a full-avalanche bijection), all numpy."""
    z = splitmix64(a.astype(np.int64))
    z = splitmix64((z ^ b.astype(np.uint64)).astype(np.int64))
    return splitmix64((z ^ c.astype(np.uint64)).astype(np.int64))


def _h64(arr) -> np.ndarray:
    """md5-top-63-bit int64 per string, paid once per distinct value
    (dictionary encode + gather) — uint64 view for mixing."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return _node_hash64(arr).astype(np.uint64)


def entity_vocab(triples, subj_col: str = "subject",
                 obj_col: str = "object") -> np.ndarray:
    """Sorted distinct entity array (subjects ∪ objects) — the
    node-bounded corruption vocabulary. Distinct is computed map-side
    per block (block-vocab partials) before the driver union."""
    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        u = pd.unique(np.concatenate([
            b[subj_col].to_numpy(zero_copy_only=False),
            b[obj_col].to_numpy(zero_copy_only=False),
        ]))
        return pa.table({"e": pa.array(u.astype(object), pa.string())})

    import pandas as pd

    parts = [b["e"].to_numpy(zero_copy_only=False)
             for b in triples.map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_size=None, batch_format="pyarrow")]
    if not parts:
        return np.array([], dtype=object)
    # hash-distinct then one sort of the |V|-bounded result — the Python
    # set fold this replaces was the stage's hot spot (2.9 s → 0.9 s at
    # sf0.1)
    u = pd.unique(np.concatenate(parts))
    return np.sort(u).astype(object)


def _empty_neg_table() -> pa.Table:
    return pa.table({
        "subject": pa.array([], pa.string()),
        "predicate": pa.array([], pa.string()),
        "object": pa.array([], pa.string()),
        "slot": pa.array([], pa.int64()),
        "corrupted": pa.array([], pa.string()),
    })


def negative_samples_dataset(triples, n_neg: int = 2,
                             subj_col: str = "subject",
                             pred_col: str = "predicate",
                             obj_col: str = "object",
                             method: str = "splitmix64",
                             broadcast_keys_limit: int = 200_000_000,
                             n_buckets: int = 32):
    """k filtered corruptions per positive → (subject, predicate, object,
    slot, corrupted): for slot ∈ 0..n_neg−1, hash(triple, slot) picks
    head-vs-tail (low bit) and the replacement entity (mod |V|); a
    corruption that reproduces a TRUE triple is dropped (filtered
    sampling — emitting it as a negative would teach the model the
    opposite of the truth).

    ``broadcast_keys_limit`` gates the truth filter: at or below it the
    sorted int64 key-hash array ships once (``ray.put``, ~8 B/edge) and
    membership is a vectorized ``searchsorted``; above it the filter is
    an int-bucketed exchange anti-join — exact and driver-unbounded. The
    paths are value-identical (forced-tiny-limit test,
    ``tests/test_graph.py``). Deterministic for a fixed corpus,
    independent of cluster size / partitioning."""
    import pandas as pd
    import ray

    n_true = triples.count()
    if method == "md5":
        return _negatives_md5(triples, n_neg, subj_col, pred_col, obj_col)
    if method != "splitmix64":
        raise ValueError(f"unknown method: {method}")

    broadcast = n_true <= broadcast_keys_limit
    if broadcast:
        # ONE fused stats pass: per-block distinct entities AND per-block
        # distinct key hashes ride the same table (null-padded to a
        # common length) — halves the full-corpus reads vs separate
        # vocab/keys passes
        def stats_partial(b: pa.Table) -> pa.Table:
            e = pd.unique(np.concatenate([
                b[subj_col].to_numpy(zero_copy_only=False),
                b[obj_col].to_numpy(zero_copy_only=False)]))
            kh = np.unique(_mix3(_h64(b[subj_col]), _h64(b[pred_col]),
                                 _h64(b[obj_col])).astype(np.int64))
            m = max(e.size, kh.size)
            return pa.table({
                "e": pa.array(np.concatenate(
                    [e.astype(object),
                     np.full(m - e.size, None, object)]), pa.string()),
                "kh": pa.array(np.concatenate(
                    [kh, np.zeros(m - kh.size, np.int64)])),
                "kh_valid": pa.array(np.arange(m) < kh.size),
            })

        e_parts, kh_parts = [], []
        for b in triples.map_batches(stats_partial, batch_format="pyarrow") \
                .iter_batches(batch_size=None, batch_format="pyarrow"):
            ea = b["e"].drop_null()
            if len(ea):
                e_parts.append(ea.to_numpy(zero_copy_only=False))
            kv = b["kh"].to_numpy()[b["kh_valid"].to_numpy(
                zero_copy_only=False)]
            if kv.size:
                kh_parts.append(kv)
        vocab = (np.sort(pd.unique(np.concatenate(e_parts))).astype(object)
                 if e_parts else np.array([], dtype=object))
        true_sorted = (np.unique(np.concatenate(kh_parts)) if kh_parts
                       else np.array([], np.int64))
    else:
        vocab = entity_vocab(triples, subj_col, obj_col)
    if len(vocab) == 0:
        return triples.map_batches(lambda b: _empty_neg_table(),
                                   batch_format="pyarrow")

    # hash of each vocab entry, precomputed once: candidate-side key
    # hashes are pure gathers/mixes of component hashes — zero string
    # hashing on the corruption side
    vocab_h = _h64(pa.array(vocab.tolist(), pa.string()))
    vocab_ref = ray.put(vocab)
    vocab_h_ref = ray.put(vocab_h)

    def corrupt_cols(b: pa.Table):
        """Shared corruption kernel → (ns, p, no, slot, corrupted, kh)
        numpy columns for the whole batch × n_neg, fully vectorized."""
        vb = ray.get(vocab_ref)
        vh = ray.get(vocab_h_ref)
        s = b[subj_col].to_numpy(zero_copy_only=False)
        p = b[pred_col].to_numpy(zero_copy_only=False)
        o = b[obj_col].to_numpy(zero_copy_only=False)
        hs, hp, ho = _h64(b[subj_col]), _h64(b[pred_col]), _h64(b[obj_col])
        base = _mix3(hs, hp, ho)
        cols = []
        for k in range(n_neg):
            u = splitmix64((base ^ splitmix64(
                np.full(1, k, np.int64))[0]).astype(np.int64))
            head = (u & np.uint64(1)).astype(bool)
            idx = (u >> np.uint64(1)) % np.uint64(len(vb))
            repl, repl_h = vb[idx], vh[idx]
            ns = np.where(head, repl, s)
            no = np.where(head, o, repl)
            kh = _mix3(np.where(head, repl_h, hs), hp,
                       np.where(head, ho, repl_h))
            cols.append((ns, p, no,
                         np.full(len(s), k, np.int64),
                         np.where(head, "head", "tail"),
                         kh.astype(np.int64)))
        return cols

    def cand_table(cols, extra=None) -> pa.Table:
        # pa.array consumes object/str ndarrays directly — no tolist()
        # Python round-trip on multi-million-row candidate columns
        t = {
            "subject": pa.array(np.concatenate([c[0] for c in cols]),
                                pa.string()),
            "predicate": pa.array(
                np.concatenate([c[1] for c in cols]), pa.string()),
            "object": pa.array(np.concatenate([c[2] for c in cols]),
                               pa.string()),
            "slot": pa.array(np.concatenate([c[3] for c in cols])),
            "corrupted": pa.array(
                np.concatenate([c[4] for c in cols]), pa.string()),
        }
        if extra:
            t.update(extra(cols))
        return pa.table(t)

    if broadcast:
        # ---- broadcast path: sorted int64 key hashes, searchsorted probe
        keys_ref = ray.put(true_sorted)

        def corrupt(b: pa.Table) -> pa.Table:
            tk = ray.get(keys_ref)
            cols = corrupt_cols(b)
            kept = []
            for ns, p, no, slot, corr, kh in cols:
                hit = np.zeros(kh.size, bool)
                if tk.size:
                    pos = np.searchsorted(tk, kh)
                    in_range = pos < tk.size
                    hit[in_range] = tk[pos[in_range]] == kh[in_range]
                keep = ~hit
                kept.append((ns[keep], p[keep], no[keep], slot[keep],
                             corr[keep], kh[keep]))
            return cand_table(kept)

        return triples.map_batches(corrupt, batch_format="pyarrow")

    # ---- join twin: int-bucketed exchange anti-join (exact, unbounded)
    def emit_candidates(b: pa.Table) -> pa.Table:
        cols = corrupt_cols(b)
        t = cand_table(cols, extra=lambda cs: {
            "kh": pa.array(np.concatenate([c[5] for c in cs]))})
        kh = t["kh"].to_numpy()
        return t.append_column(
            "bucket", pa.array((kh % n_buckets).astype(np.int32))) \
            .append_column("is_truth",
                           pa.array(np.zeros(len(t), np.int8)))

    def emit_truth(b: pa.Table) -> pa.Table:
        kh = _mix3(_h64(b[subj_col]), _h64(b[pred_col]),
                   _h64(b[obj_col])).astype(np.int64)
        kh = np.unique(kh)
        n = kh.size
        es = pa.array(np.full(n, "", object).tolist(), pa.string())
        return pa.table({
            "subject": es, "predicate": es, "object": es,
            "slot": pa.array(np.zeros(n, np.int64)),
            "corrupted": es,
            "kh": pa.array(kh),
            "bucket": pa.array((kh % n_buckets).astype(np.int32)),
            "is_truth": pa.array(np.ones(n, np.int8)),
        })

    cands = triples.map_batches(emit_candidates, batch_format="pyarrow")
    truth = triples.map_batches(emit_truth, batch_format="pyarrow")

    def anti(g: pa.Table) -> pa.Table:
        flag = g["is_truth"].to_numpy()
        kh = g["kh"].to_numpy()
        tk = np.unique(kh[flag == 1])
        keep = np.flatnonzero((flag == 0) & ~np.isin(kh, tk))
        if keep.size == 0:
            return _empty_neg_table()
        return g.take(keep).select(
            ["subject", "predicate", "object", "slot", "corrupted"])

    return cands.union(truth).groupby("bucket") \
        .map_groups(anti, batch_format="pyarrow")


def _negatives_md5(triples, n_neg: int,
                   subj_col: str, pred_col: str, obj_col: str):
    """Oracle-parity path: per-row md5 (little-endian first 8 digest
    bytes == DuckDB ``md5_number_upper``, verified byte-for-byte) and an
    EXACT string truth filter — bit-for-bit reproducible in SQL,
    intended for sf-scale verification only. The truth keys broadcast as
    an Arrow string array (zero-copy out of the object store per task —
    a Python set here cost a full 2.3M-string unpickle per task) and
    membership is ``pc.is_in`` (C hash build + probe per batch)."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray

    # ONE fused stats pass (the production path's shape): per-block
    # distinct entities AND per-block triple keys ride the same table,
    # null-padded to a common length
    def stats_partial(b: pa.Table) -> pa.Table:
        e = pd.unique(np.concatenate([
            b[subj_col].to_numpy(zero_copy_only=False),
            b[obj_col].to_numpy(zero_copy_only=False)]))
        k = _nul_join(b[subj_col].to_numpy(zero_copy_only=False),
                      b[pred_col].to_numpy(zero_copy_only=False),
                      b[obj_col].to_numpy(zero_copy_only=False))
        m = max(e.size, k.size)
        return pa.table({
            "e": pa.array(np.concatenate(
                [e.astype(object), np.full(m - e.size, None, object)]),
                pa.string()),
            "k": pa.array(np.concatenate(
                [k, np.full(m - k.size, None, object)]), pa.string()),
        })

    e_parts, key_parts = [], []
    for b in triples.map_batches(stats_partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        ea = b["e"].drop_null()
        if len(ea):
            e_parts.append(ea.to_numpy(zero_copy_only=False))
        ka = b["k"].drop_null()
        if len(ka):
            key_parts.append(ka.combine_chunks()
                             if isinstance(ka, pa.ChunkedArray) else ka)
    if not e_parts:
        return triples.map_batches(lambda b: _empty_neg_table(),
                                   batch_format="pyarrow")
    vocab = np.sort(pd.unique(np.concatenate(e_parts))).astype(object)
    true_arr = (pc.unique(pa.concat_arrays(key_parts))
                if key_parts else pa.array([], pa.string()))
    vocab_ref = ray.put(vocab)
    keys_ref = ray.put(true_arr)

    def corrupt(b: pa.Table) -> pa.Table:
        vb = ray.get(vocab_ref)
        tk = ray.get(keys_ref)
        s = b[subj_col].to_numpy(zero_copy_only=False)
        p = b[pred_col].to_numpy(zero_copy_only=False)
        o = b[obj_col].to_numpy(zero_copy_only=False)
        base = _nul_join(s, p, o)
        slot_cols = []
        for k in range(n_neg):
            u = np.array(
                [int.from_bytes(
                    hashlib.md5(f"{t}\x00{k}".encode()).digest()[:8],
                    "little") for t in base], dtype=np.uint64)
            head = (u & np.uint64(1)).astype(bool)
            repl = vb[(u >> np.uint64(1)) % np.uint64(len(vb))]
            ns = np.where(head, repl, s)
            no = np.where(head, o, repl)
            slot_cols.append((ns, no, head, _nul_join(ns, p, no)))
        # ONE membership probe across all slots: pc.is_in rebuilds its
        # value-set hash table per call, so n_neg separate probes paid
        # the 2.3M-key build n_neg times per block
        all_nk = pa.array(np.concatenate([c[3] for c in slot_cols]),
                          pa.string())
        hit = pc.is_in(all_nk, value_set=tk).to_numpy(zero_copy_only=False)
        out_s, out_p, out_o, out_slot, out_c = [], [], [], [], []
        off = 0
        for k, (ns, no, head, nk) in enumerate(slot_cols):
            keep = ~hit[off:off + len(nk)]
            off += len(nk)
            out_s.append(ns[keep]); out_p.append(np.asarray(p)[keep])
            out_o.append(no[keep])
            out_slot.append(np.full(int(keep.sum()), k, np.int64))
            out_c.append(np.where(head[keep], "head", "tail"))
        return pa.table({
            "subject": pa.array(np.concatenate(out_s), pa.string()),
            "predicate": pa.array(np.concatenate(out_p), pa.string()),
            "object": pa.array(np.concatenate(out_o), pa.string()),
            "slot": pa.array(np.concatenate(out_slot)),
            "corrupted": pa.array(np.concatenate(out_c), pa.string()),
        })

    return triples.map_batches(corrupt, batch_format="pyarrow")


def hash_key(t: str, k: int) -> int:
    """Legacy per-row 64-bit key for (triple, slot): blake2b digest —
    kept for test parity with the pre-vectorized production path; the
    production kernel now mixes per-component md5 hashes instead
    (`_mix3`/`_h64`)."""
    d = hashlib.blake2b(f"{t}\x00{k}".encode(), digest_size=8).digest()
    return int.from_bytes(d, "little", signed=True)
