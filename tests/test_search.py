"""End-to-end stage-1 search on the synthetic KG: frontier selection,
per-origin discard semantics, determinism, checkpoint resume."""
import pyarrow.compute as pc

from chronographer_ray.data.fixtures import make_search
from chronographer_ray.data.synth import E, SEED_EVENT


def test_informed_search_reaches_perfect_f1():
    gs, side = make_search(iterations=8)
    gs.run()
    best = gs.best_metrics()
    assert best["f1"] == 1.0
    # dominant path chosen at iteration 1
    assert "isPartOfMilitaryConflict" in gs.expanded_log[0]["path_expanded"]


def test_out_of_window_nodes_discarded():
    gs, side = make_search(iterations=8)
    gs.run()
    found = set(gs.found_events())
    assert not any("Later_Battle" in f for f in found)
    assert not any("_Commemoration" in f for f in found)
    assert any("Later_Battle" in d for d in gs.discarded)


def test_search_is_deterministic():
    a, _ = make_search(iterations=6)
    b, _ = make_search(iterations=6)
    sa, sb = a.run(), b.run()
    assert sa.to_pylist() == sb.to_pylist()
    assert a.occurrence.as_dict() == b.occurrence.as_dict()
    assert a.visited == b.visited


def test_subgraph_rows_tag_iteration_and_direction():
    gs, _ = make_search(iterations=8)
    sub = gs.run()
    assert set(sub.column_names) >= {"subject", "predicate", "object", "type_df", "iteration"}
    iters = set(sub["iteration"].to_pylist())
    assert iters and min(iters) == 1
    assert set(sub["type_df"].to_pylist()) <= {"ingoing", "outgoing"}


def test_visited_nodes_pruned_from_pending():
    gs, _ = make_search(iterations=8)
    gs.run()
    visited = set(gs.visited)
    assert not visited & set(gs.pending_in["subject"].to_pylist())
    assert not visited & set(gs.pending_out["object"].to_pylist())


def test_seed_expanded_first():
    gs, _ = make_search(iterations=2)
    gs.step()
    assert gs.visited[0] == SEED_EVENT


def test_checkpoint_resume_identical(tmp_path):
    ck = str(tmp_path / "ck")
    full, _ = make_search(iterations=8)
    full.checkpoint_dir = ck
    full.run()

    # the last PRODUCTIVE hop is checkpointed (a final empty-selection hop
    # writes nothing — nothing happened)
    from chronographer_ray.state.checkpoint import latest_complete_hop, resume

    last = latest_complete_hop(ck)
    assert last is not None and last >= full.iteration - 1
    resumed, _ = make_search(iterations=8)
    resumed.checkpoint_dir = None
    assert resume(resumed, ck)
    resumed.run()  # continuing from the checkpoint reaches the same state
    assert resumed.subgraph.num_rows == full.subgraph.num_rows
    assert resumed.occurrence.as_dict() == full.occurrence.as_dict()
    assert resumed.visited == full.visited


def test_mid_search_resume_continues_equivalently(tmp_path):
    ck = str(tmp_path / "ck")
    # run 2 hops with checkpointing
    partial, _ = make_search(iterations=2)
    partial.checkpoint_dir = ck
    partial.run()

    # resume into a fresh instance configured for more hops
    resumed, _ = make_search(iterations=8)
    resumed.cfg.iterations = 2  # fingerprint must match the checkpointed config
    from chronographer_ray.state.checkpoint import resume

    assert resume(resumed, ck)
    resumed.cfg.iterations = 8
    resumed.run()

    # reference: uninterrupted 8-hop run
    full, _ = make_search(iterations=8)
    full.run()
    assert sorted(resumed.subgraph.to_pylist(), key=str) == sorted(
        full.subgraph.to_pylist(), key=str
    )
    assert resumed.visited == full.visited


def test_hub_entity_not_typed_target_stays_out():
    gs, _ = make_search(iterations=8)
    sub = gs.run()
    hub = E + "Hub_Entity"
    ing = sub.filter(pc.equal(sub["type_df"], "ingoing"))
    assert hub not in set(ing["subject"].to_pylist())


def test_random_walk_path_attribution_deterministic():
    """O5: every sampled random-walk node gets a pending-edge path label;
    ingoing edges win when present (reference effective behavior)."""
    from chronographer_ray.data.fixtures import make_search

    gs, _ = make_search(iterations=3)
    gs.cfg.walk = "random"
    gs.run()
    gs2, _ = make_search(iterations=3)
    gs2.cfg.walk = "random"
    gs2.run()
    assert gs.random_paths == gs2.random_paths
    for p in gs.random_paths:
        assert p.startswith(("ingoing-", "outgoing-")) and ";" in p


def test_keep_uri_objects_drops_literals():
    import pyarrow as pa

    from chronographer_ray.stages.filters import keep_uri_objects

    t = pa.table(
        {
            "subject": ["a", "b"],
            "predicate": ["p", "p"],
            "object": ["http://x.org/1", '"1789-01-01"'],
        }
    )
    assert keep_uri_objects(t)["object"].to_pylist() == ["http://x.org/1"]


def test_dataset_config_from_reference_yaml():
    """§2.10 extension surface: the reference's own dataset YAMLs load."""
    from chronographer_ray.config import DatasetConfig

    for name, regex in (("dbpedia", True), ("wikidata", False), ("yago", False)):
        cfg = DatasetConfig.from_yaml(f"/root/reference/dataset-config/{name}.yaml")
        assert cfg.config_type == name
        assert cfg.regex_year_filter is regex
        assert cfg.rdf_type
    db = DatasetConfig.from_yaml("/root/reference/dataset-config/dbpedia.yaml")
    assert "http://dbpedia.org/ontology/wikiPageWikiLink" in db.predicate_filter
    assert db.start_uri == "http://dbpedia"
    assert db.temporal_preds  # point_in_time + start + end


def test_cli_search_and_build_ng(ray_session, tmp_path):
    """The `python -m chronographer_ray` surface: search → artifacts →
    build-ng → partitioned KG + TTL (the reference's two CLI entry points)."""
    import json

    import pyarrow.parquet as pq
    import yaml

    from chronographer_ray.__main__ import cmd_build_ng, cmd_search
    from chronographer_ray.data.synth import CLS_EVENT, SEED_EVENT, WINDOW, synth_kg

    triples, side = synth_kg()
    pq.write_table(triples, str(tmp_path / "kg.parquet"))
    (tmp_path / "maps.json").write_text(json.dumps(
        {"domain": side["domain"], "range": side["range"],
         "superclasses": side["superclasses"]}))
    (tmp_path / "exp.json").write_text(json.dumps({
        "start": SEED_EVENT, "iterations": 4,
        "type_ranking": "entropy_pred_object_freq",
        "rdf_type": {"event": CLS_EVENT},
        "predicate_filter": side["predicate_filter"],
        "start_date": WINDOW[0], "end_date": WINDOW[1],
    }))
    (tmp_path / "ds.yaml").write_text(yaml.safe_dump({
        "config_type": "dbpedia",
        "rdf_type": "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "point_in_time": side["point_in_time"], "start_dates": side["start_dates"],
        "end_dates": side["end_dates"], "places": side["places"],
        "person": side["person"], "start_uri": "http://ex.org",
        "filter_out": side["filter_out_prefixes"],
    }))

    class A:  # argparse stand-in
        pass

    a = A()
    a.triples = str(tmp_path / "kg.parquet")
    a.dataset_yaml = str(tmp_path / "ds.yaml")
    a.config = str(tmp_path / "exp.json")
    a.domain_range = str(tmp_path / "maps.json")
    a.out = str(tmp_path / "exp1")
    a.checkpoint = True
    a.resume = False
    cmd_search(a)
    sub = pq.read_table(str(tmp_path / "exp1" / "subgraph.parquet"))
    assert sub.num_rows > 0

    b = A()
    b.subgraph = str(tmp_path / "exp1" / "subgraph.parquet")
    b.triples = a.triples
    b.domain_range = a.domain_range
    b.start_d, b.end_d = WINDOW
    b.out = str(tmp_path / "kg_out")
    b.partitions = 4
    b.ttl = str(tmp_path / "kg.ttl")
    cmd_build_ng(b)
    from chronographer_ray.state.sink import read_partitioned_triples

    kg = read_partitioned_triples(str(tmp_path / "kg_out"))
    assert kg.num_rows > 0
    assert (tmp_path / "kg.ttl").read_text().startswith("<")


def test_build_pred_class_map_wikidata_prefix_rewrite():
    """The wikidata ``prop/direct/`` → ``entity/`` IRI rewrite
    (``src/ordering.py:152``) applied once at map build."""
    from chronographer_ray.search.ordering import build_pred_class_map

    out = build_pred_class_map(
        {"http://www.wikidata.org/prop/direct/P361": ["wd:Q1190554"]},
        {"wd:Q1190554": ["wd:Q26907166"]},
        prefix_rewrite=(
            "http://www.wikidata.org/prop/direct/",
            "http://www.wikidata.org/entity/",
        ),
    )
    # both IRI forms resolve: the rewritten key is added, the raw KG form
    # kept, so lookups succeed whichever form an edge carries
    assert out["http://www.wikidata.org/entity/P361"] == [
        "wd:Q1190554", "wd:Q26907166"
    ]
    assert out["http://www.wikidata.org/prop/direct/P361"] == [
        "wd:Q1190554", "wd:Q26907166"
    ]


def test_prune_hops_keeps_resume_working(tmp_path):
    """S7 retention: old frontier snapshots are dropped, resume from the
    newest hop still reconstructs the full accumulated subgraph."""
    import os

    from chronographer_ray.data.fixtures import make_search
    from chronographer_ray.state.checkpoint import (
        latest_complete_hop,
        prune_hops,
        resume,
    )

    root = str(tmp_path / "hops")
    gs, _ = make_search(iterations=5)
    gs.checkpoint_dir = root
    gs.run()
    last = latest_complete_hop(root)
    removed = prune_hops(root)
    assert removed > 0
    assert not os.path.exists(root + f"/hop={1:04d}/pending_in.parquet")
    assert os.path.exists(root + f"/hop={last:04d}/pending_in.parquet")

    fresh, _ = make_search(iterations=5)
    fresh.checkpoint_dir = None
    assert resume(fresh, root)
    assert fresh.subgraph.num_rows == gs.subgraph.num_rows
    assert fresh.visited == gs.visited


def test_flagship_text_branch(ray_session):
    """SURVEY §7.2 item 6: the optional frame-semantics branch hangs off the
    linked documents and yields NIF/frame triples."""
    from chronographer_ray.pipelines.flagship import run_flagship

    res = run_flagship("/root/testdata/sf0.001", iterations=3, text_branch=True, concurrency=1)
    fk = res["frame_kg"].to_pandas()
    assert set(fk.columns) == {"subject", "predicate", "object"}
    assert len(fk) > 0
    assert (fk["predicate"].str.endswith("#sentence")).any() or (
        fk["predicate"].str.contains("nif-core#sentence")
    ).any()
