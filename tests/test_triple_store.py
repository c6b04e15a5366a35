"""Triple stores: role-partitioned Parquet lookups ≡ in-memory lookups;
partition pruning; Ray expand_dataset semi-join."""
import os

import pyarrow.compute as pc

from chronographer_ray.data.synth import E, SEED_EVENT, synth_kg
from chronographer_ray.sources.triple_store import (
    ArrowTripleStore,
    ParquetTripleStore,
    crc_bucket,
)


def _stores(tmp_path):
    triples, _ = synth_kg()
    mem = ArrowTripleStore(triples)
    disk = ParquetTripleStore.write(triples, str(tmp_path / "kg"), partitions=8)
    return triples, mem, disk


def _key(t):
    return sorted(
        zip(t["subject"].to_pylist(), t["predicate"].to_pylist(), t["object"].to_pylist())
    )


def test_parquet_equals_memory_lookups(tmp_path):
    _, mem, disk = _stores(tmp_path)
    ids = [SEED_EVENT, f"{E}Battle_0", f"{E}Person_3", "nonexistent"]
    assert _key(mem.triples_for_subjects(ids)) == _key(disk.triples_for_subjects(ids))
    assert _key(mem.triples_for_objects(ids)) == _key(disk.triples_for_objects(ids))


def test_partition_pruning_reads_subset(tmp_path):
    _, _, disk = _stores(tmp_path)
    paths = disk._paths_for("subject", [SEED_EVENT])
    assert len(paths) == 1
    assert f"part={crc_bucket(SEED_EVENT, 8)}" in paths[0]


def test_empty_frontier(tmp_path):
    _, _, disk = _stores(tmp_path)
    assert disk.triples_for_subjects([]).num_rows == 0


def test_manifest_written(tmp_path):
    triples, _, disk = _stores(tmp_path)
    assert disk.manifest["rows"] == triples.num_rows
    assert os.path.exists(os.path.join(disk.root, "_manifest.json"))


def test_expand_dataset_semi_join(ray_session, tmp_path):
    triples, mem, disk = _stores(tmp_path)
    ids = [SEED_EVENT]
    ds = disk.expand_dataset("object", ids)
    got = ds.to_pandas()
    want = mem.triples_for_objects(ids).to_pandas()
    assert sorted(map(tuple, got.values.tolist())) == sorted(map(tuple, want.values.tolist()))


def test_expand_dataset_pred_filter(ray_session, tmp_path):
    triples, _, disk = _stores(tmp_path)
    from chronographer_ray.data.synth import PRED_PART_OF

    ds = disk.expand_dataset("object", [SEED_EVENT], pred_filter=[PRED_PART_OF])
    got = ds.to_pandas()
    assert PRED_PART_OF not in set(got["predicate"])
    full = disk.expand_dataset("object", [SEED_EVENT]).to_pandas()
    assert len(full) > len(got)


def test_actor_store_equals_parquet_store(ray_session, tmp_path):
    """T4 — the actor-pool lookup store returns the same triples as the
    on-disk pruned store for every role/pattern."""
    from chronographer_ray.data.synth import SEED_EVENT, synth_kg
    from chronographer_ray.sources.triple_store import (
        ActorTripleStore,
        ParquetTripleStore,
    )

    triples, _ = synth_kg()
    disk = ParquetTripleStore.write(triples, str(tmp_path / "kg"), partitions=8)
    actors = ActorTripleStore(str(tmp_path / "kg"), actors_per_role=3)
    for role, ids in (
        ("object", [SEED_EVENT]),
        ("subject", [SEED_EVENT, "http://ex.org/resource/Battle_3"]),
        ("object", ["http://ex.org/resource/nope"]),
    ):
        want = disk.triples_for(role, ids)
        got = actors.triples_for(role, ids)
        key = lambda t: sorted(  # noqa: E731
            zip(t["subject"].to_pylist(), t["predicate"].to_pylist(),
                t["object"].to_pylist())
        )
        assert key(got) == key(want), (role, ids)


def test_search_over_actor_store_equals_arrow(ray_session, tmp_path):
    """Full search through the T4 actor store must equal the in-memory run."""
    from chronographer_ray.data.fixtures import make_search, synth_configs
    from chronographer_ray.data.synth import synth_kg
    from chronographer_ray.search.frontier import GraphSearch
    from chronographer_ray.sources.triple_store import (
        ActorTripleStore,
        ParquetTripleStore,
    )

    gs_mem, side = make_search(iterations=5)
    sub_mem = gs_mem.run()

    triples, side2 = synth_kg()
    ParquetTripleStore.write(triples, str(tmp_path / "kg"), partitions=8)
    ds_cfg, s_cfg = synth_configs(side2, iterations=5)
    gs_act = GraphSearch(
        store=ActorTripleStore(str(tmp_path / "kg"), actors_per_role=2),
        dataset=ds_cfg, config=s_cfg,
        domain_map=side2["domain"], range_map=side2["range"],
        superclasses=side2["superclasses"],
        gold_events=side2["gold_events"], referents=side2["referents"],
    )
    sub_act = gs_act.run()

    def key(t):
        return sorted(
            zip(t["subject"].to_pylist(), t["predicate"].to_pylist(),
                t["object"].to_pylist(), t["type_df"].to_pylist(),
                t["iteration"].to_pylist())
        )

    assert key(sub_act) == key(sub_mem)
    assert gs_act.visited == gs_mem.visited


def test_ray_write_path_roundtrip(ray_session, tmp_path):
    """The distributed (Ray-job) store builder produces a store whose
    lookups, pruning and lazy expand path all equal the single-process
    writer's — identical layout contract, multi-file partitions."""
    import ray.data as rd

    triples, _ = synth_kg()
    mem = ArrowTripleStore(triples)
    disk = ParquetTripleStore.write_ray(
        rd.from_arrow(triples).repartition(6), str(tmp_path / "kg_ray"), partitions=8
    )
    assert disk.manifest["rows"] == triples.num_rows
    ids = [SEED_EVENT, f"{E}Battle_0", f"{E}Person_3", "nonexistent"]
    assert _key(mem.triples_for_subjects(ids)) == _key(disk.triples_for_subjects(ids))
    assert _key(mem.triples_for_objects(ids)) == _key(disk.triples_for_objects(ids))
    # pruning still holds with hive-layout multi-file partitions
    paths = disk._paths_for("subject", [SEED_EVENT])
    assert paths and all(f"part={crc_bucket(SEED_EVENT, 8)}" in p for p in paths)
    got = disk.expand_dataset("object", [SEED_EVENT]).to_pandas()
    want = mem.triples_for_objects([SEED_EVENT]).to_pandas()
    assert sorted(map(tuple, got.values.tolist())) == sorted(
        map(tuple, want.values.tolist())
    )


def test_large_frontier_uses_dataset_path_and_matches(ray_session, tmp_path):
    """A frontier above the threshold expands via the lazy Dataset semi-join
    and yields exactly what the driver-side path yields."""
    from chronographer_ray.config import SearchConfig
    from chronographer_ray.data.fixtures import synth_configs
    from chronographer_ray.data.synth import synth_kg
    from chronographer_ray.search.expansion import NodeExpansion
    from chronographer_ray.sources.triple_store import ParquetTripleStore

    triples, side = synth_kg(n_battles=40)
    store = ParquetTripleStore.write(triples, str(tmp_path / "kg"), partitions=8)
    ds_cfg, s_cfg = synth_configs(side, iterations=2)

    frontier = sorted(set(triples["subject"].to_pylist()))[:50]
    ne = NodeExpansion(store, ds_cfg, s_cfg)
    ne.set_superclasses(side["superclasses"])

    via_driver = ne._edges(frontier, "outgoing")
    ne.DATASET_PATH_THRESHOLD = 10  # force the Dataset semi-join path
    via_dataset = ne._edges(frontier, "outgoing")

    def key(t):
        return sorted(
            zip(t["subject"].to_pylist(), t["predicate"].to_pylist(),
                t["object"].to_pylist())
        )

    assert key(via_dataset) == key(via_driver)
    assert via_dataset.num_rows > 0
