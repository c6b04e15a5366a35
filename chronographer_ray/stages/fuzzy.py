"""Fuzzy string self-join (edit distance <= 1) via deletion neighborhoods
— the entity-resolution primitive for label/name matching (the
approximate-string sibling of `graph.py::entity_similarity_dataset`'s
neighbor-set Jaccard).

Shape (SymSpell-style candidate generation, never all-pairs):

1. map: each distinct string emits its deletion neighborhood — itself plus
   every single-character deletion (len+1 variants, vectorized per batch);
2. ONE bucketed exchange on the variant: two strings within edit distance
   1 ALWAYS share a variant (equal; substitution -> share the deletion at
   the substituted position; insert/delete -> the longer's deletion equals
   the shorter), so candidate pairs are exactly the within-group pairs;
3. exact verify: a shared variant is NOT sufficient ("ab"/"ba" share "b"
   at distance 2), so candidates pass a vectorized lev<=1 check — equal
   length = hamming <= 1, length diff 1 = common_prefix + common_suffix
   >= shorter length (uint8 matrices per (len_a, len_b) byte-length
   group). Distance is BYTE-level over UTF-8 — identical to DuckDB's
   `levenshtein` (verified: 'éé' vs 'ee' = 4) and to char-level on
   ASCII. The char-level deletion neighborhood stays COMPLETE for
   byte-distance <= 1 on valid UTF-8: a one-byte edit inside a
   multibyte char is a char substitution (shares that char's deletion),
   and byte inserts/deletes that keep UTF-8 valid are ASCII-char
   inserts/deletes;
4. distinct (a, b) output (a pair can share several variants).

Cost: n*(avg_len+1) candidate rows move once, verify is O(candidates *
len) — no quadratic blowup unless the DATA has quadratically many true
near-matches. Hot variants (e.g. the deletion of a shared long prefix)
concentrate in one group; `group_cap` bounds any single group's pair
fanout and is part of the defined semantics when set (like
`entity_similarity_dataset`'s hub_cap; None = exact, the oracle default).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.shuffles import bucketed_group_apply


def _deletion_variants(names: list[str]) -> tuple[list[str], list[str]]:
    """(variant, original) rows for every name: itself + each single-char
    deletion. Python-level string slicing — ~len ops per DISTINCT name,
    the same budget as the tokenizers' per-distinct-token crc."""
    var, orig = [], []
    for s in names:
        vs = {s}
        for i in range(len(s)):
            vs.add(s[:i] + s[i + 1:])  # runs of equal chars dedup here
        var.extend(vs)
        orig.extend([s] * len(vs))
    return var, orig


def _lev_le1_mask(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact edit-distance<=1 for candidate pairs, vectorized per
    (len_a, len_b) byte-length group; assumes a != b elementwise."""
    enc_a = np.array([s.encode("utf-8") for s in a], dtype=object)
    enc_b = np.array([s.encode("utf-8") for s in b], dtype=object)
    la = np.array([len(x) for x in enc_a])
    lb = np.array([len(x) for x in enc_b])
    out = np.zeros(a.size, bool)
    # orient: x is the longer (or equal) side
    swap = la < lb
    ex = np.where(swap, enc_b, enc_a)
    ey = np.where(swap, enc_a, enc_b)
    lx = np.where(swap, lb, la)
    ly = np.where(swap, la, lb)
    for Lx in np.unique(lx):
        for Ly in np.unique(ly[lx == Lx]):
            if Lx - Ly > 1:
                continue
            sel = np.flatnonzero((lx == Lx) & (ly == Ly))
            if Ly == 0:
                out[sel] = Lx <= 1
                continue
            X = np.frombuffer(b"".join(ex[sel]), np.uint8).reshape(-1, int(Lx))
            Y = np.frombuffer(b"".join(ey[sel]), np.uint8).reshape(-1, int(Ly))
            if Lx == Ly:
                out[sel] = (X != Y).sum(1) <= 1
            else:  # Lx == Ly + 1: one deletion from X reaches Y iff
                # common_prefix + common_suffix covers all of Y
                eq_p = X[:, :int(Ly)] == Y
                prefix = np.cumprod(eq_p, 1).sum(1)
                eq_s = X[:, 1:] == Y
                suffix = np.cumprod(eq_s[:, ::-1], 1).sum(1)
                out[sel] = (prefix + suffix) >= Ly
    return out


def fuzzy_pairs_dataset(ds, col: str = "name", n_buckets: int = 16,
                        group_cap: int | None = None):
    """All string pairs within edit distance 1 → (name_a, name_b),
    name_a < name_b, distinct. See module docstring for the dataflow."""

    def variants(b: pa.Table) -> pa.Table:
        u = pc.unique(
            b[col].combine_chunks()
            if isinstance(b[col], pa.ChunkedArray) else b[col]
        )
        var, orig = _deletion_variants(u.to_pylist())
        return pa.table({
            "v": pa.array(var, pa.string()),
            "s": pa.array(orig, pa.string()),
        })

    def candidate_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # within each variant group: distinct originals, ordered pairs
        outs = []
        for _, grp in g.groupby("v", sort=False):
            names = np.sort(grp["s"].unique())
            n = names.size
            if n < 2:
                continue
            if group_cap is not None and n > group_cap:
                names = names[:group_cap]
                n = group_cap
            iu, ju = np.triu_indices(n, k=1)
            outs.append(pd.DataFrame({"a": names[iu], "b": names[ju]}))
        if not outs:
            return pd.DataFrame({"a": pd.Series([], dtype=str),
                                 "b": pd.Series([], dtype=str)})
        return pd.concat(outs, ignore_index=True).drop_duplicates()

    cands = bucketed_group_apply(
        ds.map_batches(variants, batch_format="pyarrow"),
        ["v"], candidate_pairs, n_buckets=n_buckets,
    )

    def verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"name_a": pa.array([], pa.string()),
                             "name_b": pa.array([], pa.string())})
        a = np.asarray(b["a"].to_pylist(), dtype=object)
        bb = np.asarray(b["b"].to_pylist(), dtype=object)
        keep = _lev_le1_mask(a, bb)
        return pa.table({
            "name_a": pa.array(a[keep].tolist(), pa.string()),
            "name_b": pa.array(bb[keep].tolist(), pa.string()),
        })

    verified = cands.map_batches(verify, batch_format="pyarrow")

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates()

    return bucketed_group_apply(verified, ["name_a", "name_b"], dedup,
                                n_buckets=n_buckets)


def entity_resolution_dataset(ds, col: str = "name", n_buckets: int = 16,
                              group_cap: int | None = None):
    """Entity resolution over a string column → (name, canonical): fuzzy
    pairs (edit distance ≤ 1, `fuzzy_pairs_dataset`) become equivalence
    edges, connected components cluster them, and every name maps to its
    cluster's lexicographic MIN name (singletons map to themselves).

    The scale form of the reference's referent canonicalization
    (`/root/reference/src/get_equivalent_url.py` maps redirect variants
    onto one canonical URI via a lookup file): here the equivalence
    relation is DISCOVERED from the data, and the canonical map is the
    min-name-per-component fold — the same contract the exact-dedup
    survivors use.

    Dataflow (string names never key an exchange unhashsed):
    1. `fuzzy_pairs_dataset` — deletion-neighborhood candidates, one
       bucketed exchange, vectorized verify (never all-pairs);
    2. pairs hash to int64 (`_node_hash64`) → `connected_components_dataset`
       (hash-min label propagation, driver-collapsed under its
       local_threshold, distributed fixpoint above);
    3. one h-keyed zip attaches names to component labels, a
       component-keyed bucketed min picks the canonical name, a second
       component-keyed zip maps every clustered name to it;
    4. singletons rejoin via one name-keyed anti-zip against the distinct
       input names (map-side per-batch dedup first).

    Canonical = MIN(name) within the component — independent of the
    int-hash component labels, so the recursive-CTE oracle (which walks
    on the names themselves) reproduces it exactly."""
    from .components import connected_components_dataset
    from .graph import _node_hash64

    pairs = fuzzy_pairs_dataset(
        ds, col=col, n_buckets=n_buckets, group_cap=group_cap
    ).materialize()

    def hash_pairs(b: pa.Table) -> pa.Table:
        return pa.table({
            "d1": pa.array(_node_hash64(b["name_a"].combine_chunks())),
            "d2": pa.array(_node_hash64(b["name_b"].combine_chunks())),
        })

    comps = connected_components_dataset(
        pairs.map_batches(hash_pairs, batch_format="pyarrow"),
        n_buckets=n_buckets)

    # (h, name) map of clustered names (both pair sides, exchange-deduped)
    def name_rows(b: pa.Table) -> pa.Table:
        u = pc.unique(pa.concat_arrays([
            b["name_a"].combine_chunks(), b["name_b"].combine_chunks()]))
        return pa.table({"h": pa.array(_node_hash64(u)), "name": u})

    names_h = pairs.map_batches(name_rows, batch_format="pyarrow")

    def c_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "h": b["node"], "component": b["component"],
            "name": pa.nulls(b.num_rows, pa.string()),
            "kind": pa.array(np.zeros(b.num_rows, np.int8)),
        })

    def n_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "h": b["h"],
            "component": pa.array(np.zeros(b.num_rows, np.int64)),
            "name": b["name"],
            "kind": pa.array(np.ones(b.num_rows, np.int8)),
        })

    def zip_name(g: pd.DataFrame) -> pa.Table:
        # explicit Arrow types: empty pandas object columns convert to
        # Arrow `null` and break the downstream block concat
        nm = g[g["kind"] == 1].drop_duplicates("h")
        c = g[g["kind"] == 0]
        m = c[["h", "component"]].merge(nm[["h", "name"]], on="h")
        return pa.table({
            "name": pa.array(m["name"].tolist(), pa.string()),
            "component": pa.array(m["component"].to_numpy(np.int64))})

    named = bucketed_group_apply(
        comps.map_batches(c_rows, batch_format="pyarrow").union(
            names_h.map_batches(n_rows, batch_format="pyarrow")),
        ["h"], zip_name, n_buckets=n_buckets,
    ).materialize()

    def canon_min(g: pd.DataFrame) -> pa.Table:
        out = g.groupby("component", as_index=False, sort=False)["name"].min()
        return pa.table({
            "component": pa.array(out["component"].to_numpy(np.int64)),
            "canonical": pa.array(out["name"].tolist(), pa.string())})

    canon = bucketed_group_apply(
        named, ["component"], canon_min, n_buckets=n_buckets)

    def m_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "component": b["component"], "name": b["name"],
            "canonical": pa.nulls(b.num_rows, pa.string()),
            "kind": pa.array(np.zeros(b.num_rows, np.int8)),
        })

    def k_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "component": b["component"],
            "name": pa.nulls(b.num_rows, pa.string()),
            "canonical": b["canonical"],
            "kind": pa.array(np.ones(b.num_rows, np.int8)),
        })

    def zip_canon(g: pd.DataFrame) -> pa.Table:
        k = g[g["kind"] == 1].drop_duplicates("component")
        mrows = g[g["kind"] == 0]
        m = mrows[["component", "name"]].merge(
            k[["component", "canonical"]], on="component")
        return pa.table({
            "name": pa.array(m["name"].tolist(), pa.string()),
            "canonical": pa.array(m["canonical"].tolist(), pa.string())})

    clustered = bucketed_group_apply(
        named.map_batches(m_rows, batch_format="pyarrow").union(
            canon.map_batches(k_rows, batch_format="pyarrow")),
        ["component"], zip_canon, n_buckets=n_buckets,
    )

    # singletons: distinct input names minus clustered names → self-map
    def all_names(b: pa.Table) -> pa.Table:
        u = pc.unique(
            b[col].combine_chunks()
            if isinstance(b[col], pa.ChunkedArray) else b[col])
        return pa.table({
            "name": u, "kind": pa.array(np.zeros(len(u), np.int8))})

    def clustered_names(b: pa.Table) -> pa.Table:
        return pa.table({
            "name": b["name"],
            "kind": pa.array(np.ones(b.num_rows, np.int8))})

    def anti_self(g: pd.DataFrame) -> pa.Table:
        have = set(g.loc[g["kind"] == 1, "name"])
        solo = g.loc[g["kind"] == 0, "name"].drop_duplicates()
        solo = solo[~solo.isin(have)].tolist()
        return pa.table({
            "name": pa.array(solo, pa.string()),
            "canonical": pa.array(solo, pa.string())})

    singles = bucketed_group_apply(
        ds.map_batches(all_names, batch_format="pyarrow").union(
            clustered.map_batches(clustered_names, batch_format="pyarrow")),
        ["name"], anti_self, n_buckets=n_buckets,
    )
    return clustered.union(singles)
