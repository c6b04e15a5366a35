"""End-to-end hygiene pipeline: funnel monotonicity, determinism, known
removals survive the composition."""
import pyarrow as pa


def _corpus():
    docs = []
    for i in range(60):
        if i == 50:
            text = "spam " * 40                      # quality drop
        elif i == 51:
            text = " ".join(f"w{j}" for j in range(30))  # dup of 52
        elif i == 52:
            text = " ".join(f"w{j}" for j in range(30))
        elif i % 10 == 7:
            text = f"benchmark probe text {i} alpha beta gamma"
        else:
            text = f"unique doc d{i} with its own content body b{i * 7}"
        docs.append({"doc_id": i, "text": text, "source": f"src{i % 4}"})
    # a training doc sharing a trigram with the benchmark split
    docs.append(
        {"doc_id": 100, "text": "contains alpha beta gamma overlap", "source": "src0"}
    )
    return docs


def test_hygiene_funnel(ray_session):
    import ray.data as rd

    from chronographer_ray.pipelines.hygiene import run_hygiene

    counts = run_hygiene(rd.from_items(_corpus()), bench_mod=10, bench_rem=7)
    assert counts["input"] == 61
    # spam doc dropped by quality; one of the twin docs dropped by dedup
    assert counts["after_quality_pii"] == 60
    assert counts["after_exact_dedup"] == 59
    # doc 100 shares 'alpha beta gamma' with benchmark docs
    assert counts["contaminated"] >= 1
    assert counts["after_mix"] <= counts["after_exact_dedup"]
    assert counts["packed_rows"] == counts["after_mix"]

    # deterministic end-to-end
    counts2 = run_hygiene(
        rd.from_items(_corpus()).repartition(5), bench_mod=10, bench_rem=7
    )
    assert counts2 == counts


def test_hygiene_writes_resumable(ray_session, tmp_path):
    import ray.data as rd

    from chronographer_ray.pipelines.hygiene import run_hygiene
    from chronographer_ray.state.dataset_sink import read_resumable

    root = str(tmp_path / "hyg")
    counts = run_hygiene(
        rd.from_items(_corpus()), bench_mod=10, bench_rem=7, out_root=root
    )
    rows = read_resumable(root).take_all()
    assert len(rows) == counts["packed_rows"]
    assert {"doc_id", "n_tokens", "tok_offset", "bin_id"} <= set(rows[0])
