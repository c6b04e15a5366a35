"""CLI — the reference's entry points, Ray-Data-native.

    python -m chronographer_ray search \
        --triples kg.parquet --dataset-yaml dbpedia.yaml --config exp.json \
        --out /tmp/exp1 [--checkpoint] [--resume]

    python -m chronographer_ray build-ng \
        --subgraph /tmp/exp1/subgraph.parquet --triples kg.parquet \
        --domain-range maps.json --start-d 1789-01-01 --end-d 1799-12-31 \
        --out /tmp/exp1/event_kg [--ttl event_kg.ttl]

Mirrors `python src/framework.py -j config.json` (search, S7/S8 artifacts)
and `python src/build_ng/generic_kb_to_ng.py ...` (stage 2, S9). The
experiment JSON accepts the reference's key names (start, iterations,
type_ranking, rdf_type as {name: uri}, predicate_filter, start_date,
end_date, filtering{what,where,when,who}, ordering{domain_range}, max_uri,
uri_limit) — a reference user's config ports by changing only paths.

Owns its Ray session (guarded init) per the driver contract.
"""
from __future__ import annotations

import argparse
import json
import os


def _load_search_config(path: str):
    from .config import SearchConfig

    with open(path, encoding="utf-8") as f:
        raw = json.load(f)
    rdf_type = raw.get("rdf_type", {})
    if isinstance(rdf_type, dict):
        rdf_type = list(rdf_type.items())
    filtering = raw.get("filtering", {})
    ordering = raw.get("ordering", {})
    return SearchConfig(
        start=raw["start"],
        iterations=raw.get("iterations", 10),
        type_ranking=raw.get("type_ranking", "entropy_pred_object_freq"),
        walk=raw.get("walk", "informed"),
        node_selection=raw.get("node_selection", "all"),
        domain_range=bool(ordering.get("domain_range", 1)),
        filter_what=bool(filtering.get("what", 1)),
        filter_where=bool(filtering.get("where", 1)),
        filter_when=bool(filtering.get("when", 1)),
        filter_who=bool(filtering.get("who", 0)),
        rdf_type=[tuple(t) for t in rdf_type],
        start_date=raw.get("start_date"),
        end_date=raw.get("end_date"),
        max_uri=raw.get("max_uri", 1_000_000),
        uri_limit=raw.get("uri_limit"),
    ), raw


def _store(path: str):
    import pyarrow.parquet as pq

    from .sources.triple_store import ArrowTripleStore, ParquetTripleStore

    if os.path.isdir(path):
        return ParquetTripleStore(path)
    return ArrowTripleStore(pq.read_table(path))


def _maps(path: str | None) -> dict:
    if not path:
        return {"domain": {}, "range": {}, "superclasses": {}}
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def cmd_search(args: argparse.Namespace) -> None:
    import pandas as pd
    import pyarrow.parquet as pq

    from .config import DatasetConfig
    from .search.frontier import GraphSearch

    dataset = (
        DatasetConfig.from_yaml(args.dataset_yaml)
        if args.dataset_yaml
        else DatasetConfig()
    )
    cfg, raw = _load_search_config(args.config)
    maps = _maps(args.domain_range)
    gold = []
    if raw.get("gold_standard"):
        gold = list(pd.read_csv(raw["gold_standard"])["linkDBpediaEn"].unique())
    referents = {}
    if raw.get("referents"):
        with open(raw["referents"], encoding="utf-8") as f:
            referents = json.load(f)

    os.makedirs(args.out, exist_ok=True)
    gs = GraphSearch(
        store=_store(args.triples),
        dataset=dataset,
        config=cfg,
        domain_map=maps.get("domain", {}),
        range_map=maps.get("range", {}),
        superclasses=maps.get("superclasses", {}),
        gold_events=gold,
        referents=referents,
        checkpoint_dir=os.path.join(args.out, "hops") if args.checkpoint else None,
    )
    if args.resume and args.checkpoint:
        from .state.checkpoint import resume

        resume(gs, os.path.join(args.out, "hops"))
    subgraph = gs.run()
    pq.write_table(subgraph, os.path.join(args.out, "subgraph.parquet"))
    with open(os.path.join(args.out, "config.json"), "w", encoding="utf-8") as f:
        json.dump(raw, f, indent=2)
    with open(os.path.join(args.out, "metrics.json"), "w", encoding="utf-8") as f:
        json.dump(gs.metrics_per_iter, f, indent=2, default=str)
    with open(os.path.join(args.out, "expanded.json"), "w", encoding="utf-8") as f:
        json.dump(gs.expanded_log, f, indent=2, default=str)  # S8 expanded.csv
    with open(os.path.join(args.out, "metadata.json"), "w", encoding="utf-8") as f:
        json.dump(
            {
                "iterations_run": gs.iteration,
                "nodes_expanded": len(gs.visited),
                "subgraph_rows": subgraph.num_rows,
                "best": gs.best_metrics() if gs.gold_events else None,
            },
            f, indent=2,
        )
    print(json.dumps({"out": args.out, "rows": subgraph.num_rows,
                      "expanded": len(gs.visited)}))


def cmd_build_ng(args: argparse.Namespace) -> None:
    import pyarrow.parquet as pq

    from .build_ng.event_kg import build_event_kg
    from .state.sink import write_partitioned_triples

    subgraph = pq.read_table(args.subgraph)
    maps = _maps(args.domain_range)
    kg = build_event_kg(
        subgraph,
        _store(args.triples),
        maps.get("domain", {}),
        maps.get("range", {}),
        maps.get("superclasses", {}),
        args.start_d,
        args.end_d,
    )
    manifest = write_partitioned_triples(kg, args.out, partitions=args.partitions)
    if args.ttl:
        from .functions.turtle import export_turtle

        export_turtle(kg, args.ttl)
    print(json.dumps({"out": args.out, "rows": kg.num_rows,
                      "partitions": manifest["partitions"]}))


def cmd_hygiene(args: argparse.Namespace) -> None:
    import ray.data as rd

    from .pipelines.hygiene import run_hygiene

    docs = rd.read_parquet(
        os.path.join(args.sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )
    counts = run_hygiene(
        docs, bench_mod=args.bench_mod, capacity=args.capacity,
        out_root=args.out,
    )
    print(json.dumps(counts))


def cmd_graph(args: argparse.Namespace) -> None:
    import ray.data as rd

    from .stages.graph import (
        assortativity_dataset,
        bfs_distance_dataset,
        degree_topk_dataset,
        hits_dataset,
        kcore_dataset,
        kg_components_dataset,
        label_propagation_dataset,
        pagerank_dataset,
    )

    triples = rd.read_parquet(args.triples)
    if args.op == "pagerank":
        out = pagerank_dataset(
            triples, iters=args.iters, mode=args.mode,
            personalization=tuple(args.seeds) if args.seeds else None)
    elif args.op == "degree":
        out = degree_topk_dataset(triples, k=args.k, mode=args.mode)
    elif args.op == "kcore":
        out = kcore_dataset(triples, k=args.kcore_k, rounds=args.iters,
                            mode=args.mode)
    elif args.op == "communities":
        out = label_propagation_dataset(triples, rounds=args.iters,
                                        mode=args.mode)
    elif args.op == "hits":
        out = hits_dataset(triples, rounds=args.iters, mode=args.mode)
    elif args.op == "assortativity":
        out = assortativity_dataset(triples)
    elif args.op == "bfs":
        out = bfs_distance_dataset(
            triples, seeds=args.seeds or [], max_hops=args.iters,
            mode=args.mode)
    else:  # components
        out = kg_components_dataset(
            triples, predicates=tuple(args.predicates)
        )
    if args.out:
        out.write_parquet(args.out)
        print(json.dumps({"out": args.out, "rows": out.count()}))
    else:
        df = out.to_pandas()
        if "rank" in df.columns:
            df = df.sort_values("rank", ascending=False)
        print(df.head(args.k).to_string(index=False))


def cmd_dedup(args: argparse.Namespace) -> None:
    import ray.data as rd

    cols = ([args.text_col] if args.op == "fuzzy"
            else [args.id_col, args.text_col])
    docs = rd.read_parquet(args.docs, columns=cols)
    if args.op == "exact":
        from .stages.dedup import exact_dedup_dataset

        out = exact_dedup_dataset(docs, text_col=args.text_col)
    elif args.op == "span-coverage":
        from .stages.dedup import dup_span_coverage_dataset

        out = dup_span_coverage_dataset(
            docs, n=args.n, min_count=args.min_count, text_col=args.text_col
        )
    elif args.op == "span-scrub":
        from .stages.dedup import span_scrub_dataset

        out = span_scrub_dataset(
            docs, n=args.n, min_count=args.min_count, text_col=args.text_col
        )
    elif args.op == "paragraph":
        from .stages.dedup import paragraph_dedup_dataset

        out = paragraph_dedup_dataset(docs, text_col=args.text_col,
                                      min_df=args.min_count)
    else:  # fuzzy
        from .stages.fuzzy import fuzzy_pairs_dataset

        def ren(b):
            import pyarrow as pa

            return pa.table({"name": b[args.text_col]})

        out = fuzzy_pairs_dataset(
            docs.map_batches(ren, batch_format="pyarrow")
        )
    if args.out:
        out.write_parquet(args.out)
        print(json.dumps({"out": args.out, "rows": out.count()}))
    else:
        print(out.to_pandas().head(args.head).to_string(index=False))


def cmd_index(args: argparse.Namespace) -> None:
    import ray.data as rd

    from .stages.invindex import (
        build_inverted_index,
        build_positional_index,
        phrase_search,
        search_index,
    )

    if args.op == "build":
        docs = rd.read_parquet(args.docs, columns=[args.id_col, args.text_col])
        m = build_inverted_index(docs, args.root, text_col=args.text_col,
                                 id_col=args.id_col, n_parts=args.parts)
        print(json.dumps(m))
    elif args.op == "build-pos":
        docs = rd.read_parquet(args.docs, columns=[args.id_col, args.text_col])
        m = build_positional_index(docs, args.root, text_col=args.text_col,
                                   id_col=args.id_col, n_parts=args.parts)
        print(json.dumps(m))
    elif args.op == "phrase":
        out = phrase_search(args.root, args.terms, id_col=args.id_col,
                            n_parts=args.parts)
        df = out.to_pandas()
        if len(df):
            df = df.sort_values(["n_matches", args.id_col],
                                ascending=[False, True])
        print(df.head(args.head).to_string(index=False))
    else:  # search
        out = search_index(args.root, args.terms, mode=args.mode,
                           id_col=args.id_col, n_parts=args.parts)
        df = out.to_pandas()
        if len(df):
            df = df.sort_values(["score", args.id_col],
                                ascending=[False, True])
        print(df.head(args.head).to_string(index=False))


def cmd_quality(args: argparse.Namespace) -> None:
    import ray.data as rd

    docs = rd.read_parquet(args.docs, columns=[args.id_col, args.text_col])
    if args.op == "classify":
        from .stages.quality import classifier_score_dataset

        out = classifier_score_dataset(docs, text_col=args.text_col)
    elif args.op == "df-score":
        from .stages.freq import doc_df_score_dataset

        out = doc_df_score_dataset(docs, text_col=args.text_col)
    elif args.op == "snippets":
        from .stages.text import kwic_snippets_dataset

        out = kwic_snippets_dataset(docs, term=args.term,
                                    window=args.window,
                                    text_col=args.text_col)
    elif args.op == "containment":
        from .stages.dedup import ngram_containment_dataset

        out = ngram_containment_dataset(docs, text_col=args.text_col,
                                        tau=args.tau)
    else:  # cross-decontam: eval side from --eval-docs
        from .stages.dedup import cross_corpus_neardup_dataset

        if not args.eval_docs:
            raise SystemExit("cross-decontam requires --eval-docs")
        ev = rd.read_parquet(args.eval_docs,
                             columns=[args.id_col, args.text_col])
        out = cross_corpus_neardup_dataset(docs, ev,
                                           text_col=args.text_col)
    if args.out:
        out.write_parquet(args.out)
        print(json.dumps({"out": args.out, "rows": out.count()}))
    else:
        print(out.to_pandas().head(args.head).to_string(index=False))


def cmd_explore(args: argparse.Namespace) -> None:
    from .pipelines.explorer import build_explorer

    out = build_explorer(args.run_dir, out_html=args.out,
                         max_nodes=args.max_nodes)
    print(json.dumps({"explorer": out}))


def main() -> None:
    ap = argparse.ArgumentParser(prog="chronographer_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("search", help="stage 1: semantically-informed graph search")
    s.add_argument("--triples", required=True,
                   help="triples parquet file OR role-partitioned store dir")
    s.add_argument("--dataset-yaml", help="reference-format dataset YAML")
    s.add_argument("--config", required=True, help="experiment JSON (reference keys)")
    s.add_argument("--domain-range",
                   help="JSON with {domain, range, superclasses} maps")
    s.add_argument("--out", required=True)
    s.add_argument("--checkpoint", action="store_true",
                   help="write per-hop checkpoints under <out>/hops")
    s.add_argument("--resume", action="store_true",
                   help="resume from the last complete hop checkpoint")
    s.set_defaults(fn=cmd_search)

    b = sub.add_parser("build-ng", help="stage 2: SEM event-KG population")
    b.add_argument("--subgraph", required=True, help="search output parquet")
    b.add_argument("--triples", required=True)
    b.add_argument("--domain-range")
    b.add_argument("--start-d", required=True)
    b.add_argument("--end-d", required=True)
    b.add_argument("--out", required=True, help="partitioned event-KG output dir")
    b.add_argument("--partitions", type=int, default=16)
    b.add_argument("--ttl", help="also export Turtle to this path")
    b.set_defaults(fn=cmd_build_ng)

    h = sub.add_parser(
        "hygiene",
        help="corpus hygiene chain: quality -> PII -> dedup -> decontam -> mix -> pack",
    )
    h.add_argument("--sf-dir", required=True, help="dir holding documents.parquet")
    h.add_argument("--out", help="resumable partitioned output root (optional)")
    h.add_argument("--bench-mod", type=int, default=1000,
                   help="doc_id %% mod == 7 marks the benchmark split")
    h.add_argument("--capacity", type=int, default=512,
                   help="context-window token capacity for packing")
    h.set_defaults(fn=cmd_hygiene)

    g = sub.add_parser(
        "graph",
        help="KG analytics: pagerank/ppr / degree / components / "
             "kcore / communities / hits",
    )
    g.add_argument("op", choices=["pagerank", "degree", "components",
                                  "kcore", "communities", "hits",
                                  "assortativity", "bfs"])
    g.add_argument("--triples", required=True, help="triples parquet path")
    g.add_argument("--out", help="write result parquet here (else print head)")
    g.add_argument("--iters", type=int, default=3)
    g.add_argument("--k", type=int, default=20)
    g.add_argument("--mode", choices=["auto", "broadcast", "shuffle"],
                   default="auto")
    g.add_argument("--predicates", nargs="+",
                   default=["ex:inNation", "ex:inRegion"],
                   help="equivalence predicates for components")
    g.add_argument("--kcore-k", type=int, default=3,
                   help="minimum degree for kcore")
    g.add_argument("--seeds", nargs="+", default=None,
                   help="seed IRIs: personalized pagerank restart set")
    g.set_defaults(fn=cmd_graph)

    d = sub.add_parser(
        "dedup",
        help="dedup family: exact / span-coverage / span-scrub / "
             "paragraph / fuzzy name pairs",
    )
    d.add_argument("op", choices=["exact", "span-coverage", "span-scrub",
                                  "paragraph", "fuzzy"])
    d.add_argument("--docs", required=True, help="documents parquet path")
    d.add_argument("--out", help="write result parquet here (else print head)")
    d.add_argument("--id-col", default="doc_id")
    d.add_argument("--text-col", default="text")
    d.add_argument("--n", type=int, default=5,
                   help="span window length (span ops)")
    d.add_argument("--min-count", type=int, default=2,
                   help="corpus duplication threshold")
    d.add_argument("--head", type=int, default=20)
    d.set_defaults(fn=cmd_dedup)

    ix = sub.add_parser(
        "index",
        help="inverted index: build partitioned postings / pruned search",
    )
    ix.add_argument("op", choices=["build", "search", "build-pos", "phrase"])
    ix.add_argument("--root", required=True, help="index root dir")
    ix.add_argument("--docs", help="documents parquet (build)")
    ix.add_argument("--terms", nargs="+", default=[], help="query terms")
    ix.add_argument("--mode", choices=["and", "or"], default="and")
    ix.add_argument("--id-col", default="doc_id")
    ix.add_argument("--text-col", default="text")
    ix.add_argument("--parts", type=int, default=32)
    ix.add_argument("--head", type=int, default=20)
    ix.set_defaults(fn=cmd_index)

    qa = sub.add_parser(
        "quality",
        help="corpus quality ops: classify / df-score / snippets / "
             "containment / cross-decontam",
    )
    qa.add_argument("op", choices=["classify", "df-score", "snippets",
                                   "containment", "cross-decontam"])
    qa.add_argument("--docs", required=True)
    qa.add_argument("--eval-docs", help="eval/benchmark parquet "
                                        "(cross-decontam)")
    qa.add_argument("--id-col", default="doc_id")
    qa.add_argument("--text-col", default="text")
    qa.add_argument("--term", default="the", help="snippets query term")
    qa.add_argument("--window", type=int, default=40)
    qa.add_argument("--tau", type=float, default=0.8)
    qa.add_argument("--out")
    qa.add_argument("--head", type=int, default=20)
    qa.set_defaults(fn=cmd_quality)

    ex = sub.add_parser(
        "explore",
        help="emit a self-contained interactive HTML replay (iteration "
             "slider: subgraph growth, expanded path, P/R/F1) of a "
             "`search` output dir — the reference's Streamlit per-"
             "iteration network views, dependency-free",
    )
    ex.add_argument("run_dir", help="a `search --out` directory")
    ex.add_argument("-o", "--out", help="output HTML path "
                                        "(default <run_dir>/explorer.html)")
    ex.add_argument("--max-nodes", type=int, default=400,
                    help="cap on rendered nodes (earliest-seen kept)")
    ex.set_defaults(fn=cmd_explore)

    args = ap.parse_args()
    if args.cmd == "explore":  # pure reporting — no Ray session needed
        args.fn(args)
        return
    import ray

    if not ray.is_initialized():
        # honor an ambient cluster (ray job submit sets RAY_ADDRESS in the
        # job runtime); fall back to a local session for standalone runs
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        args.fn(args)
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
