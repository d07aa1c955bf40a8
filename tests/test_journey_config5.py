"""Shrunk-scale pin of the config-5 journey chain (VERDICT r4 next-round
#1): tools/journey_config5.py composes library-scene data -> BatchTrainer
curriculum (both switches forced) -> SegNet -> predicted-mask full
pipeline with refine -> .mat export -> offline toolbox report, exactly
the full-scale script — only the scales shrink. Pins the CHAIN, not the
accuracy (the full-scale run's metrics are recorded in README)."""

import importlib.util
import json
import os
import sys

_TOOL = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "journey_config5.py")


def _load_tool():
    spec = importlib.util.spec_from_file_location("journey_config5", _TOOL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_journey_chain_shrunk_scale(tmp_path, capsys):
    mod = _load_tool()
    outf = tmp_path / "journey"
    summary = mod.main([
        "--objects", "3", "--sym", "2", "--train_frames", "6",
        "--test_frames", "2", "--per_frame", "2", "--num_points", "96",
        "--model_points", "128", "--batch", "4", "--epochs", "2",
        "--seg_epochs", "2", "--refine_iterations", "2",
        "--force_switches", "--cpu", "--outf", str(outf)])
    out = capsys.readouterr().out

    # both curriculum switches fired and the joint stage trained
    assert summary["decay_started"] and summary["refine_started"]
    assert summary["epochs"] == 2
    # the pipeline scored every GT object of every held-out frame
    # (lost detections count as scored-inf objects)
    assert summary["num_objects_scored"] == 2 * 2
    assert 0.0 <= summary["auc"] <= 100.0
    assert summary["segnet_pixel_acc"] > 0.5  # flat-color scenes: easy

    # artifacts: best+last checkpoints (stable msgpack), per-frame .mat
    # exports, distance report, summary
    assert (outf / "best.msgpack").exists()   # stable tracked export
    assert (outf / "last").is_dir()           # rolling Orbax crash-resume
    assert not (outf / "last.msgpack").exists()  # no per-epoch IO tax
    mats = sorted(os.listdir(outf / "mat"))
    assert mats == ["000000.mat", "000001.mat"]
    report = json.loads((outf / "distance_report.json").read_text())
    assert report["meta"]["lost_detections"] == summary["lost_detections"]
    assert (outf / "journey_summary.json").exists()
    # the offline toolbox table printed per-object rows
    assert "AUC" in out or "auc" in out
