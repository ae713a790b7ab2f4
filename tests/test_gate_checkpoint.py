"""Checkpoint-gate decision plumbing (scripts/gate_checkpoint.py).

The gate protects auto-loading consumers (vfisr_tpu/models/registry.py)
from timeout-cut checkpoints; these tests stub the held-out eval and
exercise the file-moving decision logic, including the round-3
same-model resume gating (--incumbent-weights), where demotion must
RESTORE the incumbent snapshot to the auto-load path rather than leave
the model weightless.
"""

import importlib.util
import json
import sys
from pathlib import Path


def _load_mod():
    spec = importlib.util.spec_from_file_location(
        "gate_checkpoint",
        Path(__file__).resolve().parent.parent / "scripts" / "gate_checkpoint.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run_gate(mod, monkeypatch, argv, scores):
    """Run main() with heldout_psnr stubbed to pop from `scores`."""
    calls = []

    def fake_psnr(model_name, samples, crop, seed, weights_path=None):
        calls.append((model_name, weights_path))
        return scores.pop(0)

    monkeypatch.setattr(mod, "heldout_psnr", fake_psnr)
    monkeypatch.setattr(sys, "argv", ["gate_checkpoint.py"] + argv)
    rc = mod.main()
    assert rc == 0
    return calls


class TestCrossModelGate:
    def test_kept_when_candidate_wins(self, tmp_path, monkeypatch):
        mod = _load_mod()
        w = tmp_path / "cand.npz"
        w.write_bytes(b"candidate")
        rec = tmp_path / "rec.json"
        _run_gate(mod, monkeypatch, [
            "--candidate", "vfimamba", "--incumbent", "vfimamba_s",
            "--weights", str(w), "--demote-to", str(tmp_path / "aside.npz"),
            "--record", str(rec),
        ], scores=[29.8, 27.9])
        assert w.exists()
        data = json.loads(rec.read_text())
        assert data["decision"].startswith("kept")
        assert data["candidate_psnr_db"] == 29.8

    def test_demoted_when_candidate_loses(self, tmp_path, monkeypatch):
        mod = _load_mod()
        w = tmp_path / "cand.npz"
        w.write_bytes(b"candidate")
        aside = tmp_path / "aside.npz"
        _run_gate(mod, monkeypatch, [
            "--candidate", "vfimamba", "--incumbent", "vfimamba_s",
            "--weights", str(w), "--demote-to", str(aside),
        ], scores=[20.0, 27.9])
        assert not w.exists()
        assert aside.read_bytes() == b"candidate"

    def test_skip_when_no_checkpoint(self, tmp_path, monkeypatch):
        mod = _load_mod()
        rec = tmp_path / "rec.json"
        calls = _run_gate(mod, monkeypatch, [
            "--candidate", "vfimamba", "--incumbent", "vfimamba_s",
            "--weights", str(tmp_path / "missing.npz"),
            "--demote-to", str(tmp_path / "aside.npz"),
            "--record", str(rec),
        ], scores=[])
        assert calls == []
        assert "skip" in json.loads(rec.read_text())["decision"]


class TestSameModelResumeGate:
    def test_incumbent_weights_evaluated_as_candidate_model(
            self, tmp_path, monkeypatch):
        mod = _load_mod()
        w = tmp_path / "safa.npz"
        w.write_bytes(b"resumed-12k")
        snap = tmp_path / "safa_8k.npz"
        snap.write_bytes(b"snapshot-8k")
        calls = _run_gate(mod, monkeypatch, [
            "--candidate", "safa", "--incumbent", "safa",
            "--incumbent-weights", str(snap),
            "--weights", str(w), "--demote-to", str(tmp_path / "aside.npz"),
        ], scores=[30.0, 29.0])
        # candidate is scored from the exact --weights file it may move;
        # incumbent is scored as the CANDIDATE model with the snapshot file
        assert calls == [("safa", str(w)), ("safa", str(snap))]
        assert w.read_bytes() == b"resumed-12k"  # kept

    def test_demotion_restores_snapshot_to_autoload_path(
            self, tmp_path, monkeypatch):
        mod = _load_mod()
        w = tmp_path / "safa.npz"
        w.write_bytes(b"resumed-12k")
        snap = tmp_path / "safa_8k.npz"
        snap.write_bytes(b"snapshot-8k")
        aside = tmp_path / "aside.npz"
        rec = tmp_path / "rec.json"
        _run_gate(mod, monkeypatch, [
            "--candidate", "safa", "--incumbent", "safa",
            "--incumbent-weights", str(snap),
            "--weights", str(w), "--demote-to", str(aside),
            "--record", str(rec),
        ], scores=[25.0, 29.0])
        assert aside.read_bytes() == b"resumed-12k"
        # the auto-load path still holds the better (snapshot) weights
        assert w.read_bytes() == b"snapshot-8k"
        assert "restored incumbent" in json.loads(rec.read_text())["decision"]
