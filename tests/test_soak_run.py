"""Shrunk-scale CI twin of the soak run (VERDICT r4 next-round #7):
tools/soak_run.py drives the REAL tools/train.py CLI through a SIGTERM
kill + auto-resume cycle and on to the epoch horizon — the same
orchestration as the real-chip soak, only the scales (and the backend)
shrink. Pins the robustness CONTRACT: graceful stop on SIGTERM, 'last'
checkpoint, unattended auto-resume, horizon reached; the real-chip run's
evidence lives in trained_models/soak/soak_summary.json + README."""

import importlib.util
import json
import os

_TOOL = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "soak_run.py")


def _load_tool():
    spec = importlib.util.spec_from_file_location("soak_run", _TOOL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_soak_kill_resume_horizon(tmp_path):
    mod = _load_tool()
    outf = tmp_path / "soak"
    logd = tmp_path / "logs"
    summary = mod.main([
        "--synthetic_frames", "4", "--nepoch", "6", "--kill_epochs", "2",
        "--num_points", "64", "--mesh_points", "64", "--mode", "persample",
        "--poll_s", "0.2", "--cpu",
        "--outf", str(outf), "--log_dir", str(logd),
        "--extra", "--batch_size", "2"])

    assert [l["kill_epoch"] for l in summary["legs"]] == [2, None]
    leg0, leg1 = summary["legs"]
    # leg 0 was SIGTERMed after logging epoch 2 and stopped gracefully
    # (exit 0 — run_leg raises otherwise) with at least that epoch saved
    assert leg0["graceful_stop"]
    assert leg0["epochs_logged"][1] >= 2
    # leg 1 auto-resumed from the killed leg's 'last' checkpoint — no
    # resume flags passed — and ran the full nepoch horizon from there
    # (fit() treats nepoch as a COUNT from the resumed state, so the
    # final absolute epoch is >= nepoch)
    assert leg1["resumed_from"] is not None
    assert leg1["resumed_from"] >= 2
    assert leg1["epochs_logged"][1] >= 6
    # resume REPLAYS from the saved epoch: the two legs' logged epoch
    # ranges overlap or abut, no epoch is skipped
    assert leg1["epochs_logged"][0] <= leg0["epochs_logged"][1] + 1

    on_disk = json.loads((outf / "soak_summary.json").read_text())
    assert on_disk["kill_epochs"] == [2]
    # per-leg captures kept for the evidence trail
    assert (logd / "soak_leg0.log").exists()
    assert (logd / "soak_leg1.log").exists()
