"""Stage 1 — the semantically-informed graph search as a driver-coordinated
loop of batched Ray/Arrow hops, with per-hop checkpoint manifests.

Reference lifecycle: ``src/framework.py:704-857`` (iterate: select → expand →
merge → rank → persist → stop-check). The rebuild keeps the hop loop on the
driver (the top-1 path choice is a global decision — SURVEY §7.5) but each
hop's heavy work is set-batched:

- selection: vectorized filter on the pending tables (J5)
- expansion: three partition-pruned semi-joins (J1/J2) + Arrow filters
- ordering: broadcast-map superclass annotation (M11)
- occurrence counting: grouped count per path key (A1) merged into the small
  driver dict (distinct paths ≪ edges)
- pending prune: anti-join vs the visited set (J4)

State after each hop is written to ``{checkpoint}/hop=NNNN/`` (parquet +
state.json + _SUCCESS marker), enabling mid-frontier resume (see
``state/checkpoint.py``).
"""
from __future__ import annotations

import random
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

from ..config import DatasetConfig, SearchConfig
from ..sources.triple_store import TripleStore
from ..stages import filters as F
from .expansion import NodeExpansion
from .metrics import prf
from .ordering import OccurrenceState, SuperclassAnnotator, path_keys
from .ranker import Ranker

PENDING_SCHEMA = pa.schema(
    [
        ("subject", pa.string()),
        ("predicate", pa.string()),
        ("object", pa.string()),
        ("superclass", pa.list_(pa.string())),
    ]
)
SUBGRAPH_SCHEMA = pa.schema(
    [
        ("subject", pa.string()),
        ("predicate", pa.string()),
        ("object", pa.string()),
        ("type_df", pa.string()),
        ("iteration", pa.int32()),
    ]
)


class GraphSearch:
    def __init__(
        self,
        store: TripleStore,
        dataset: DatasetConfig,
        config: SearchConfig,
        domain_map: dict[str, list[str]] | None = None,
        range_map: dict[str, list[str]] | None = None,
        superclasses: dict[str, list[str]] | None = None,
        gold_events: list[str] | None = None,
        referents: dict[str, str] | None = None,
        checkpoint_dir: Optional[str] = None,
    ):
        from ..search.ordering import build_pred_class_map

        self.store = store
        self.ds = dataset
        self.cfg = config
        self.expander = NodeExpansion(store, dataset, config)
        superclasses = superclasses or {}
        self.expander.set_superclasses(superclasses)
        self.annotator = SuperclassAnnotator(
            build_pred_class_map(domain_map or {}, superclasses),
            build_pred_class_map(range_map or {}, superclasses),
        )
        self.ranker = Ranker(config.type_ranking, config.low_threshold, config.high_threshold)
        self.gold_events = gold_events or []
        self.referents = referents or {}
        self.checkpoint_dir = checkpoint_dir
        self.targets = set(config.target_class_iris)

        # --- mutable search state (checkpointed per hop) -------------------
        self.subgraph: pa.Table = SUBGRAPH_SCHEMA.empty_table()
        self.pending_in: pa.Table = PENDING_SCHEMA.empty_table()
        self.pending_out: pa.Table = PENDING_SCHEMA.empty_table()
        self.occurrence = OccurrenceState()
        self.visited: list[str] = []
        self.to_expand: Optional[str] = None
        self.score_expansion: Optional[float] = None
        self.iteration = 0
        self.metrics_per_iter: dict[int, dict] = {}
        self.expanded_log: list[dict] = []
        self.discarded: list[str] = []
        self.random_paths: list[str] = []  # O5 labels (random-walk mode)

    # ------------------------------------------------------------- selection
    def _strip_priority(self, key: str) -> str:
        for p in ("1-", "2-", "3-"):
            if key.startswith(p):
                return key[len(p):]
        return key

    def select_nodes(self, iteration: int) -> list[str]:
        """J5 — frontier selection from the chosen best path."""
        if iteration == 1:
            return [self.cfg.start]
        if self.cfg.walk == "random":
            return self._select_random_walk()
        if not self.to_expand:
            return []
        path = self._strip_priority(self.to_expand)
        nodes: list[str] = []
        if ";" in path and path.startswith("ingoing-"):
            rest = path[len("ingoing-"):]
            pred, obj = rest.split(";", 1)
            t = self.pending_in
            m = pc.and_(pc.equal(t["predicate"], pred), pc.equal(t["object"], obj))
            nodes = t.filter(m)["subject"].to_pylist()
        elif ";" in path and path.startswith("outgoing-"):
            rest = path[len("outgoing-"):]
            subj, pred = rest.split(";", 1)
            t = self.pending_out
            m = pc.and_(pc.equal(t["predicate"], pred), pc.equal(t["subject"], subj))
            nodes = t.filter(m)["object"].to_pylist()
        else:
            nodes = (
                self.pending_in.filter(pc.equal(self.pending_in["predicate"], path))[
                    "subject"
                ].to_pylist()
                + self.pending_out.filter(pc.equal(self.pending_out["predicate"], path))[
                    "object"
                ].to_pylist()
            )
        visited = set(self.visited)
        nodes = [n for n in dict.fromkeys(nodes) if n not in visited]
        return self._cap_sample(nodes)

    def _select_random_walk(self) -> list[str]:
        cands = F.unique_strings(self.pending_in, "subject") + F.unique_strings(
            self.pending_out, "object"
        )
        visited = set(self.visited)
        cands = [n for n in dict.fromkeys(cands) if n not in visited]
        if isinstance(self.cfg.uri_limit, int) and len(cands) > self.cfg.uri_limit:
            random.seed(self.cfg.seed)
            cands = random.sample(cands, k=self.cfg.uri_limit)
        nodes = self._cap_sample(cands)
        self.random_paths = self.attribute_paths(nodes)
        return nodes

    def attribute_paths(self, nodes: list[str]) -> list[str]:
        """O5 — label each random-walk node with one of its pending edges
        (``src/framework.py:490-514``). The reference samples with an
        UNSEEDED pandas ``.sample()`` (nondeterministic) and its in/out coin
        flip compares a list to a string so the outgoing branch never fires;
        this rebuild makes the choice deterministic (seeded) and keeps the
        reference's effective behavior: ingoing edges win when present."""
        paths: list[str] = []
        random.seed(self.cfg.seed)
        for node in nodes:
            ing = self.pending_in.filter(pc.equal(self.pending_in["subject"], node))
            if ing.num_rows:
                k = random.randrange(ing.num_rows)
                paths.append(
                    f"ingoing-{ing['predicate'][k].as_py()};{ing['object'][k].as_py()}"
                )
                continue
            out = self.pending_out.filter(pc.equal(self.pending_out["object"], node))
            if out.num_rows:
                k = random.randrange(out.num_rows)
                paths.append(
                    f"outgoing-{out['subject'][k].as_py()};{out['predicate'][k].as_py()}"
                )
        return paths

    def _cap_sample(self, nodes: list[str]) -> list[str]:
        """O2 — deterministic seeded cap at max_uri (``src/framework.py:460-463``)."""
        budget = self.cfg.max_uri - len(self.visited)
        if len(nodes) > budget:
            random.seed(self.cfg.seed)
            nodes = random.sample(nodes, k=max(budget, 0))
        if self.cfg.node_selection == "random" and nodes:
            random.seed(self.cfg.seed)
            nodes = [random.choice(nodes)]
        return nodes

    # ------------------------------------------------------------------ hop
    def step(self) -> bool:
        """One hop. Returns False when the search should stop."""
        self.iteration += 1
        i = self.iteration
        nodes = self.select_nodes(i)
        # an empty frontier is NOT termination: the reference runs the
        # iteration empty, consumes the chosen path, and lets the ranker pick
        # the next one (src/framework.py:720-855 loops while `to_expand` is
        # truthy) — e.g. when every node of the best path is already visited
        if nodes:
            self.visited.extend(nodes)

            res = self.expander.expand(nodes)
            self.discarded.extend(res.to_discard)

            # subgraph accumulation (typed-target edges, iteration-tagged)
            for part in (res.subgraph_in, res.subgraph_out):
                if part.num_rows:
                    tagged = part.append_column(
                        "iteration", pa.array([i] * part.num_rows, pa.int32())
                    )
                    self.subgraph = pa.concat_tables([self.subgraph, tagged])

            # ordering: superclass annotation on the new pending edges
            pend_in = self.annotator.annotate(res.pending_in, "ingoing")
            pend_out = self.annotator.annotate(res.pending_out, "outgoing")

            # occurrence counting (A1) — registered per ORIGIN node, ingoing
            # then outgoing, matching the reference's serial per-node loop
            # (src/framework.py:546-556 → :571-597) so first-occurrence order
            # (the ranker tie-break) is origin-grouped. Counts themselves are
            # order-free; at scale the per-hop count is a grouped Ray
            # aggregate and only this small key-order registration stays on
            # the driver.
            if self.cfg.walk == "informed":
                for node in nodes:
                    in_n = pend_in.filter(pc.equal(pend_in["object"], node))
                    out_n = pend_out.filter(pc.equal(pend_out["subject"], node))
                    keys = path_keys(in_n, "ingoing", self.cfg.type_ranking, self.targets)
                    keys += path_keys(out_n, "outgoing", self.cfg.type_ranking, self.targets)
                    self.occurrence.add_keys(keys)

            self.pending_in = _concat_pending(self.pending_in, pend_in)
            self.pending_out = _concat_pending(self.pending_out, pend_out)
        elif i == 1 or self.cfg.walk != "informed":
            return False  # no seed / random-walk exhausted

        # rank (A2/A3) and consume the chosen path
        if self.cfg.walk == "informed":
            self.to_expand, self.score_expansion = self.ranker(self.occurrence.as_dict())
            if self.to_expand:
                self.occurrence.after_expansion(self.to_expand, self.cfg.node_selection)
                self.expanded_log.append(
                    {
                        "iteration": i,
                        "path_expanded": self.to_expand,
                        "nb_expanded": len(nodes),
                        "score": self.score_expansion,
                    }
                )

        # pending prune vs visited (J4)
        visited = set(self.visited)
        self.pending_in = F.is_in_filter(self.pending_in, "subject", visited, keep=False)
        self.pending_out = F.is_in_filter(self.pending_out, "object", visited, keep=False)

        # metrics (A4/A5)
        if self.gold_events:
            self.metrics_per_iter[i] = prf(
                self.found_events(), self.gold_events, self.referents
            ).as_dict()

        if self.checkpoint_dir:
            from ..state.checkpoint import save_hop

            save_hop(self, self.checkpoint_dir)

        if len(self.visited) >= self.cfg.max_uri:
            return False
        if self.cfg.walk == "informed" and not self.to_expand:
            return False
        return True

    def run(self) -> pa.Table:
        while self.iteration < self.cfg.iterations:
            if not self.step():
                break
        return self.subgraph

    # ------------------------------------------------------------- reporting
    def found_events(self) -> list[str]:
        """A4 — unique event nodes found so far (``src/framework.py:770-776``)."""
        t = self.subgraph
        if t.num_rows == 0:
            return []
        ing = t.filter(pc.equal(t["type_df"], "ingoing"))
        out = t.filter(pc.equal(t["type_df"], "outgoing"))
        return list(dict.fromkeys(F.unique_strings(ing, "subject") + F.unique_strings(out, "object")))

    def best_metrics(self) -> dict:
        best = {"f1": 0.0, "iteration": None}
        for it, m in self.metrics_per_iter.items():
            if m["f1"] > best["f1"]:
                best = {"f1": m["f1"], "precision": m["precision"], "recall": m["recall"], "iteration": it}
        return best


def _concat_pending(a: pa.Table, b: pa.Table) -> pa.Table:
    if b.num_rows == 0:
        return a
    cols = ["subject", "predicate", "object", "superclass"]
    b = b.select([c for c in cols if c in b.column_names])
    if a.num_rows == 0:
        return b
    return pa.concat_tables([a.select(b.column_names), b])
