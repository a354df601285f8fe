"""Checkpoint/lineage/resume semantics + the pipeline API/CLI surface."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from geo_inference_ray.checkpoint import PartitionedRun


def _mk(tmp_path):
    return PartitionedRun(str(tmp_path), "stage1")


def _ds_for(key: str):
    import ray.data as rd

    n = int(key) + 3
    return rd.from_pandas(pd.DataFrame({"k": [key] * n,
                                        "v": list(range(n))}))


def test_run_and_manifest(ray_session, tmp_path):
    run = _mk(tmp_path)
    res = run.run(["1", "2"], _ds_for, fingerprints={"1": "f1", "2": "f2"})
    assert res["computed"] == ["1", "2"]
    recs = run.records()
    assert len(recs) == 2
    assert {r["key"] for r in recs} == {"1", "2"}
    assert all(r["rows_out"] == int(r["key"]) + 3 for r in recs)
    assert all(r["wall_ms"] >= 0 for r in recs)
    assert all(r["input_fingerprint"].startswith("f") for r in recs)


def test_resume_skips_completed(ray_session, tmp_path):
    run = _mk(tmp_path)
    calls = []

    def make(key):
        calls.append(key)
        return _ds_for(key)

    run.run(["1", "2"], make)
    assert calls == ["1", "2"]
    res = run.run(["1", "2", "3"], make)
    assert calls == ["1", "2", "3"]  # only "3" recomputed
    assert res["skipped"] == ["1", "2"]
    assert res["computed"] == ["3"]


def test_resume_after_failure(ray_session, tmp_path):
    """Kill mid-run: completed partitions survive, pending recompute."""
    run = _mk(tmp_path)
    boom = {"armed": True}

    def make(key):
        if key == "2" and boom["armed"]:
            raise RuntimeError("killed")
        return _ds_for(key)

    with pytest.raises(RuntimeError):
        run.run(["1", "2", "3"], make)
    assert run.completed() == {"1"}
    boom["armed"] = False
    res = run.run(["1", "2", "3"], make)
    assert res["skipped"] == ["1"]
    assert sorted(res["computed"]) == ["2", "3"]
    # outputs readable and complete
    df = run.read().to_pandas()
    assert len(df) == 4 + 5 + 6


def test_single_pass_write_and_resume(ray_session, tmp_path):
    """run_single_pass writes all pending partitions in one dataset
    execution, records lineage per key, creates empty-key dirs, and a
    resume only rewrites the missing keys."""
    import pyarrow as pa
    import ray.data as rd

    run = _mk(tmp_path)
    df = pd.DataFrame({"k": ["a"] * 4 + ["b"] * 6, "v": range(10)})
    ds = rd.from_pandas(df)

    def key_fn(batch: pa.Table) -> pa.Table:
        return batch.append_column("part_key", batch["k"])

    res = run.run_single_pass(["a", "b", "empty"], ds, key_fn)
    assert sorted(res["computed"]) == ["a", "b", "empty"]
    recs = {r["key"]: r for r in run.records()}
    assert recs["a"]["rows_out"] == 4
    assert recs["b"]["rows_out"] == 6
    assert recs["empty"]["rows_out"] == 0
    assert os.path.isdir(os.path.join(str(tmp_path), "stage1", "key=empty"))
    # resume: nothing recomputed
    res2 = run.run_single_pass(["a", "b", "empty"], ds, key_fn)
    assert res2["computed"] == []
    assert sorted(res2["skipped"]) == ["a", "b", "empty"]
    # partial resume: drop one key dir -> only it is rewritten
    import shutil

    shutil.rmtree(os.path.join(str(tmp_path), "stage1", "key=b"))
    res3 = run.run_single_pass(["a", "b", "empty"], ds, key_fn)
    assert res3["computed"] == ["b"]
    got = run.read(["a", "b"]).to_pandas()
    assert len(got) == 10


def test_fingerprint_invalidation(ray_session, tmp_path):
    run = _mk(tmp_path)
    run.run(["1"], _ds_for, fingerprints={"1": "a"})
    res = run.run(["1"], _ds_for, fingerprints={"1": "b"})  # input changed
    assert res["computed"] == ["1"]


def test_pipeline_api_end_to_end(ray_session, sf_dir, tmp_path):
    from geo_inference_ray.pipeline import GeoInferenceRay

    gi = GeoInferenceRay(work_dir=str(tmp_path), mask_to_vec=True,
                         mask_to_yolo=True, mask_to_coco=True)
    out = gi(sf_dir, patch_size=16)
    assert os.path.exists(out["mask_tiles"])
    assert os.path.exists(out["polygons"])
    assert os.path.exists(out["yolo"])
    assert os.path.exists(out["coco"])
    gj = json.load(open(out["polygons"]))
    assert gj["type"] == "FeatureCollection"
    assert len(gj["features"]) > 0
    coco = json.load(open(out["coco"]))
    assert len(coco["annotations"]) > 0
    with open(out["yolo"]) as f:
        lines = [ln for ln in f.read().splitlines() if ln]
    assert all(len(ln.split()) == 5 for ln in lines)
    # checkpointed partitions + lineage present
    man = os.path.join(str(tmp_path), "run", "manifest.jsonl")
    assert os.path.exists(man)
    # 10 cluster deciles + the "geo" partition for geo-token rows
    assert len(open(man).read().splitlines()) == 11


def test_pipeline_bbox_crop(ray_session, sf_dir, tmp_path):
    from geo_inference_ray.pipeline import GeoInferenceRay

    gi = GeoInferenceRay(work_dir=str(tmp_path))
    out = gi(sf_dir, bbox=(-75.0, -75.0, -60.0, -60.0), run_name="crop")
    tiles = pd.read_parquet(out["mask_tiles"])
    # cluster 0 center is (-69.5, -169.5); bbox excludes it -> few tiles
    full = GeoInferenceRay(work_dir=str(tmp_path))(sf_dir, run_name="full")
    assert len(tiles) < len(pd.read_parquet(full["mask_tiles"]))


def test_cli_yaml(ray_session, sf_dir, tmp_path):
    from geo_inference_ray.pipeline import cmd_interface

    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "arguments:\n"
        f"  input: {sf_dir}\n"
        f"  work_dir: {tmp_path}/wd\n"
        "  mask_to_vec: True\n"
        "  patch_size: 8\n"
        "  num_classes: 3\n")
    ns = cmd_interface(["-a", str(cfg)])
    assert ns.input == sf_dir
    assert ns.mask_to_vec is True
    assert ns.patch_size == 8
    assert ns.work_dir == f"{tmp_path}/wd"


def test_cli_requires_input():
    from geo_inference_ray.pipeline import cmd_interface

    with pytest.raises(SystemExit):
        cmd_interface([])


def test_pipeline_geo_token_rows_partition(ray_session, tmp_path):
    """Regression (self-review r3): rows geocoded from an explicit
    geo:{lat},{lon} token get cluster = -1; before the 'geo' partition
    key existed they tripped run_single_pass's novel-key guard and
    aborted the whole run."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from geo_inference_ray.pipeline import GeoInferenceRay

    docs = pa.table({
        "doc_id": pa.array(list(range(20)), pa.int64()),
        "text": pa.array(
            ["see geo:12.5,-33.25 for details"] +
            [f"regular document number {i} with words" for i in range(19)]),
        "lang": pa.array(["en"] * 20),
        "source": pa.array(["src0"] * 20),
        "n_chars": pa.array([30] * 20, pa.int64()),
    })
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    pq.write_table(docs, corpus / "documents.parquet")
    gi = GeoInferenceRay(work_dir=str(tmp_path / "work"))
    out = gi(str(corpus), run_name="geo")  # must not raise
    assert out["mask_tiles"]
    geo_part = os.path.join(str(tmp_path / "work"), "geo", "key=geo")
    assert os.path.isdir(geo_part)
    rows = pd.read_parquet(geo_part)
    assert (rows["cluster"] == -1).all() and len(rows) == 1


def test_flagship_resume_after_kill_sf01(ray_session, tmp_path, monkeypatch):
    """North-rule resumability, end-to-end at sf0.1: the flagship run
    dies after 4 of its 11 partition commits; the re-run skips exactly
    the committed keys, recomputes the rest, and the final partition
    tree is value-identical to an uninterrupted control run."""
    import pytest

    from geo_inference_ray import checkpoint as cp
    from geo_inference_ray.pipeline import GeoInferenceRay

    sf = "/root/testdata/sf0.1"

    # control: uninterrupted run
    ctl = GeoInferenceRay(work_dir=str(tmp_path / "ctl"))(sf,
                                                          run_name="flag")

    # interrupted run: simulated driver death mid-commit-loop (after
    # the 4th lineage append; the 5th key's dir may exist without a
    # manifest record — the stale-partial crash window)
    orig_append = cp.PartitionedRun._append
    committed = []

    def dying(self, rec):
        if len(committed) >= 4:
            raise RuntimeError("simulated driver kill")
        orig_append(self, rec)
        committed.append(rec["key"])

    monkeypatch.setattr(cp.PartitionedRun, "_append", dying)
    with pytest.raises(RuntimeError, match="simulated driver kill"):
        GeoInferenceRay(work_dir=str(tmp_path / "res"))(sf,
                                                        run_name="flag")
    monkeypatch.setattr(cp.PartitionedRun, "_append", orig_append)

    out = GeoInferenceRay(work_dir=str(tmp_path / "res"))(sf,
                                                          run_name="flag")
    res = out["pages_partitions"]
    assert sorted(res["skipped"]) == sorted(committed)
    assert len(committed) == 4
    assert len(res["computed"]) == 11 - 4

    run_res = cp.PartitionedRun(str(tmp_path / "res"), "flag")
    run_ctl = cp.PartitionedRun(str(tmp_path / "ctl"), "flag")
    recs = run_res.records()
    assert len(recs) == 11  # 4 pre-kill + 7 resumed
    keys_ctl = {r["key"]: r for r in run_ctl.records()}
    for r in recs:
        assert r["rows_out"] == keys_ctl[r["key"]]["rows_out"]

    # value-identical partition tree (every key, resumed vs control;
    # rows_out==0 keys have an empty dir — nothing to read)
    for key, rec in keys_ctl.items():
        if rec["rows_out"] == 0:
            continue
        a = run_res.read([key]).to_pandas()
        b = run_ctl.read([key]).to_pandas()
        sort_cols = sorted(a.columns)
        a = a.sort_values(sort_cols).reset_index(drop=True)[sort_cols]
        b = b.sort_values(sort_cols).reset_index(drop=True)[sort_cols]
        assert a.equals(b), f"partition key={key} diverged after resume"

    # mask tiles artifact also value-identical
    t_res = pd.read_parquet(out["mask_tiles"]) \
        .sort_values(["oy", "ox"]).reset_index(drop=True)
    t_ctl = pd.read_parquet(ctl["mask_tiles"]) \
        .sort_values(["oy", "ox"]).reset_index(drop=True)
    assert t_res[["oy", "ox", "n_valid"]].equals(
        t_ctl[["oy", "ox", "n_valid"]])
    assert all((x == y).all() for x, y in
               zip(t_res["mask"], t_ctl["mask"]))


def test_pipeline_rerun_overwrites_mask_sink(ray_session, sf_dir, tmp_path):
    """Re-running the pipeline with the SAME work_dir/run_name must
    OVERWRITE the mask-tiles artifact, not append to it (Ray's
    write_parquet default is append: a second run silently doubled
    every tile before mode='overwrite')."""
    from geo_inference_ray.pipeline import GeoInferenceRay

    gi = GeoInferenceRay(work_dir=str(tmp_path))
    first = pd.read_parquet(gi(sf_dir, run_name="again")["mask_tiles"])
    second = pd.read_parquet(gi(sf_dir, run_name="again")["mask_tiles"])
    assert len(second) == len(first)
    a = first.sort_values(["oy", "ox"]).reset_index(drop=True)
    b = second.sort_values(["oy", "ox"]).reset_index(drop=True)
    assert a[["oy", "ox", "n_valid"]].equals(b[["oy", "ox", "n_valid"]])


def test_zonemap_prunes_files_and_preserves_results(ray_session, tmp_path):
    """Zone-map range read opens only intersecting files and returns
    exactly the rows an unpruned filter returns."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from geo_inference_ray.checkpoint import (ZONEMAP_NAME, build_zonemap,
                                              read_pruned)

    root = str(tmp_path / "zm")
    os.makedirs(root)
    # 8 range-partitioned files over key 0..799 (sorted layout)
    for i in range(8):
        keys = np.arange(i * 100, (i + 1) * 100, dtype=np.int64)
        pq.write_table(pa.table({"k": keys, "v": keys * 3}),
                       os.path.join(root, f"part-{i}.parquet"))
    zmap = build_zonemap(root, ["k"])
    assert len(zmap) == 8
    assert json.load(open(os.path.join(root, ZONEMAP_NAME)))

    ds, total, opened = read_pruned(root, "k", 150, 349)
    assert total == 8 and opened == 3  # files 1, 2, 3
    got = ds.to_pandas().sort_values("k")
    assert got["k"].tolist() == list(range(150, 350))
    assert (got["v"] == got["k"] * 3).all()

    # no-overlap range: zero files opened, empty result, schema intact
    ds0, total0, opened0 = read_pruned(root, "k", 5000, 6000)
    assert total0 == 8 and opened0 == 0
    assert ds0.count() == 0
    # Ray's to_pandas drops columns on ANY empty dataset; the Dataset
    # schema is the contract that must survive
    assert set(ds0.schema().names) == {"k", "v"}
