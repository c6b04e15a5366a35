"""Negative sampling for KG-embedding training data.

TransE-family training (Bordes et al. 2013) needs, for every positive
triple, k corrupted triples (head OR tail replaced by a random entity)
that are NOT themselves true triples (Bernoulli/filtered negative
sampling). At corpus scale this is a map-only pass: the entity
vocabulary ships once (node-bounded broadcast), corruption is a
deterministic hash of (triple, slot) — no RNG state, reproducible across
runs and cluster sizes — and the truth filter probes a broadcast of the
true-triple key set (exact set here; at 10^12 edges swap in the bloom
filter `stages/bloom.py` already provides, trading a tunable false-drop
rate for O(bits) memory — the decontam pipeline's documented pattern).

Two hash methods, the house convention (`stages/sampling.py`):
``splitmix64`` is the production path; ``md5`` makes every choice
reproducible in DuckDB SQL so the driver oracle matches bit-for-bit.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .sampling import splitmix64


def _nul_join(*cols) -> np.ndarray:
    """Join string columns with REAL NUL bytes. Vectorized ``+ "\\x00"``
    silently drops the separator (the scalar passes through a
    NUL-terminated numpy str), so this is a per-row f-string join —
    acceptable here because every caller follows it with a per-row
    hash anyway."""
    return np.array(["\x00".join(t) for t in zip(*cols)], dtype=object)


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
        return pa.table({"e": pa.array(u.tolist(), pa.string())})

    ents: set = set()
    for b in triples.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        ents.update(b["e"].to_pylist())
    return np.array(sorted(ents), dtype=object)


def negative_samples_dataset(triples, n_neg: int = 2,
                             subj_col: str = "subject",
                             pred_col: str = "predicate",
                             obj_col: str = "object",
                             method: str = "splitmix64"):
    """k filtered corruptions per positive → (subject, predicate, object,
    slot, corrupted): for slot ∈ 0..n_neg−1, hash(triple, slot) picks
    head-vs-tail (low bit) and the replacement entity (mod |V|); a
    corruption that reproduces a TRUE triple is dropped (filtered
    sampling — emitting it as a negative would teach the model the
    opposite of the truth). Map-only after two broadcast ``ray.put``s
    (entity vocab, true-key set); deterministic for a fixed corpus."""
    import ray

    vocab = entity_vocab(triples, subj_col, obj_col)
    v = len(vocab)
    if v == 0:
        return triples.map_batches(
            lambda b: pa.table({
                "subject": pa.array([], pa.string()),
                "predicate": pa.array([], pa.string()),
                "object": pa.array([], pa.string()),
                "slot": pa.array([], pa.int64()),
                "corrupted": pa.array([], pa.string()),
            }), batch_format="pyarrow")

    # true-key set: exact at sf scale (see module docstring for the
    # bloom swap at 10^12 edges)
    def key_rows(b: pa.Table) -> pa.Table:
        # REAL NUL separators (matching the oracle's chr(0)): vectorized
        # `+ "\x00"` silently drops the NUL in both numpy and pandas —
        # per-row f-strings are the only faithful join, and this pass is
        # hash-dominated anyway
        k = _nul_join(b[subj_col].to_numpy(zero_copy_only=False),
                      b[pred_col].to_numpy(zero_copy_only=False),
                      b[obj_col].to_numpy(zero_copy_only=False))
        return pa.table({"k": pa.array(k.tolist(), pa.string())})

    true_keys: set = set()
    for b in triples.map_batches(key_rows, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        true_keys.update(b["k"].to_pylist())
    vocab_ref = ray.put(vocab)
    keys_ref = ray.put(true_keys)

    def corrupt(b: pa.Table) -> pa.Table:
        vb = ray.get(vocab_ref)
        tk = ray.get(keys_ref)
        s = b[subj_col].to_numpy(zero_copy_only=False)
        p = b[pred_col].to_numpy(zero_copy_only=False)
        o = b[obj_col].to_numpy(zero_copy_only=False)
        out_s, out_p, out_o, out_slot, out_c = [], [], [], [], []
        base = _nul_join(s, p, o)
        for k in range(n_neg):
            if method == "md5":
                # little-endian of the FIRST 8 digest bytes == DuckDB's
                # md5_number_upper (verified byte-for-byte)
                u = np.array(
                    [int.from_bytes(
                        hashlib.md5(f"{t}\x00{k}".encode()).digest()[:8],
                        "little") for t in base], dtype=np.uint64)
            elif method == "splitmix64":
                crc = np.array([hash_key(t, k) for t in base], np.int64)
                u = splitmix64(crc)
            else:
                raise ValueError(f"unknown method: {method}")
            head = (u & np.uint64(1)).astype(bool)
            repl = vb[(u >> np.uint64(1)) % np.uint64(len(vb))]
            ns = np.where(head, repl, s)
            no = np.where(head, o, repl)
            nk = _nul_join(ns, p, no)
            keep = np.array([x not in tk for x in nk])
            out_s.append(ns[keep]); out_p.append(np.asarray(p)[keep])
            out_o.append(no[keep])
            out_slot.append(np.full(int(keep.sum()), k, np.int64))
            out_c.append(np.where(head[keep], "head", "tail"))
        return pa.table({
            "subject": pa.array(np.concatenate(out_s).tolist(), pa.string()),
            "predicate": pa.array(np.concatenate(out_p).tolist(),
                                  pa.string()),
            "object": pa.array(np.concatenate(out_o).tolist(), pa.string()),
            "slot": pa.array(np.concatenate(out_slot)),
            "corrupted": pa.array(np.concatenate(out_c).tolist(),
                                  pa.string()),
        })

    return triples.map_batches(corrupt, batch_format="pyarrow")


def hash_key(t: str, k: int) -> int:
    """Production-path 64-bit key for (triple, slot): blake2b digest —
    stable across processes (unlike built-in ``hash``), one call per
    (distinct triple, slot)."""
    d = hashlib.blake2b(f"{t}\x00{k}".encode(), digest_size=8).digest()
    return int.from_bytes(d, "little", signed=True)
