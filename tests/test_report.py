"""Offline accuracy-report tests (eval/report.py — the in-repo replacement
for the reference's MATLAB toolbox plotting step, SURVEY.md section 2 #14):
table/AUC consistency, JSON round-trip, figure rendering, and the
.mat-dump re-evaluation path matching the live run's distances."""

import json

import numpy as np
import jax
import pytest

from plr2_tpu.eval.metrics import compute_auc, success_rate
from plr2_tpu.eval.report import (
    accuracy_table, distances_from_mat_dir, format_accuracy_table,
    load_distance_report, plot_accuracy_curves, save_distance_report)


@pytest.fixture
def per_obj(rng):
    return {
        1: list(rng.uniform(0.0, 0.08, size=40)),
        2: list(rng.uniform(0.0, 0.15, size=25)),
        5: list(rng.uniform(0.0, 0.03, size=10)),
    }


def test_accuracy_table_matches_metrics(per_obj):
    diam = {1: 0.12, 2: 0.25, 5: 0.08}
    rows = accuracy_table(per_obj, diameters=diam)
    by_obj = {r["object"]: r for r in rows}
    for obj, d in per_obj.items():
        assert by_obj[obj]["count"] == len(d)
        assert by_obj[obj]["auc"] == pytest.approx(compute_auc(d))
        assert by_obj[obj]["under_2cm"] == pytest.approx(
            success_rate(d, 0.02))
        assert by_obj[obj]["success_01d"] == pytest.approx(
            success_rate(d, 0.1 * diam[obj]))
    all_d = [x for d in per_obj.values() for x in d]
    agg = by_obj["all"]
    assert agg["count"] == len(all_d)
    assert agg["auc"] == pytest.approx(compute_auc(all_d))
    # upstream prints the MEAN of per-object success rates, not the pooled rate
    assert agg["success_01d"] == pytest.approx(np.mean(
        [success_rate(d, 0.1 * diam[o]) for o, d in per_obj.items()]))
    # the text rendering carries every row
    txt = format_accuracy_table(rows, names={1: "ape"})
    assert "ape" in txt and "all" in txt
    assert len(txt.splitlines()) == len(rows) + 1


def test_distance_report_roundtrip(tmp_path, per_obj):
    path = str(tmp_path / "report.json")
    save_distance_report(path, per_obj, meta={"dataset": "test",
                                              "diameters": {1: 0.12}})
    loaded, meta = load_distance_report(path)
    assert set(loaded) == set(per_obj)
    for k in per_obj:
        np.testing.assert_allclose(loaded[k], per_obj[k])
    assert meta["dataset"] == "test"
    # plain JSON on disk (no pickles)
    with open(path) as f:
        json.load(f)


def test_plot_accuracy_curves_renders(tmp_path, per_obj, rng):
    out = plot_accuracy_curves(per_obj, str(tmp_path / "few.png"))
    import os
    assert os.path.getsize(out) > 1000
    # many-object mode (gray context lines + worst-object label)
    many = {i: list(rng.uniform(0.0, 0.1, size=8)) for i in range(1, 14)}
    out2 = plot_accuracy_curves(many, str(tmp_path / "many.svg"),
                                names={3: "glue"})
    assert os.path.getsize(out2) > 1000


def test_mat_dump_reevaluation_matches_live_run(tmp_path):
    """The toolbox workflow: eval saves per-frame pose .mat files, the
    offline step recomputes distances from them + GT. Must reproduce the
    live run's per-object distances."""
    from plr2_tpu.data.synthetic import make_scene
    from plr2_tpu.eval.full_pipeline import evaluate_full_pipeline
    from plr2_tpu.pipeline import DenseFusionPipeline

    frames, all_models = [], {}
    for s in range(2):
        frame, models = make_scene(num_objects=2, model_points=128, seed=s)
        frames.append(frame)
        all_models.update(models)

    pipe = DenseFusionPipeline(num_points=96, num_objects=4)
    variables = pipe.init(jax.random.key(0), crop_hw=80, batch=1)
    res = evaluate_full_pipeline(
        pipe, variables, frames, all_models, sym_list=(),
        refine_iterations=2, num_points=96,
        save_mat_dir=str(tmp_path / "mats"))
    assert res.per_object_distances
    assert sum(len(v) for v in res.per_object_distances.values()) == \
        res.num_objects

    recomputed = distances_from_mat_dir(
        str(tmp_path / "mats"), frames, all_models, sym_list=())
    assert set(recomputed) == set(res.per_object_distances)
    for obj in recomputed:
        np.testing.assert_allclose(
            sorted(recomputed[obj]), sorted(res.per_object_distances[obj]),
            rtol=1e-4, atol=1e-6)
